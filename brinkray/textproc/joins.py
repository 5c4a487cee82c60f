"""Relational join patterns beyond the crawl's lookup join.

* ``asof_join`` — as-of join (ray guide pattern): both sides hash-
  bucketed by key into one schema-aligned dataset, sorted by time
  within each bucket, ``pd.merge_asof`` per bucket inside map_groups.
  Semantics match DuckDB's ASOF JOIN (greatest right ts <= left ts).
* ``cluster_pairs`` — connected components over near-dup pairs via
  iterated min-label propagation (groupby rounds; the label map is
  broadcast per round — candidate graphs are LSH output, bounded).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

__all__ = ["asof_join", "cluster_pairs"]


def asof_join(
    left_ds,
    right_ds,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    buckets: int = 16,
):
    """For each left row: columns of the latest right row with the same
    ``key`` and ``right_ts`` <= ``left_ts`` (nulls when none)."""
    lsch = dict(zip(left_ds.schema().names, left_ds.schema().types))
    rsch = dict(zip(right_ds.schema().names, right_ds.schema().types))
    left_cols = list(lsch)
    # right columns carried into the output: the right timestamp plus
    # requested value columns (deduped, order kept)
    extra = []
    for c in [right_ts, *right_vals]:
        if c not in left_cols and c not in extra:
            extra.append(c)
    right_keep = [key] + extra if key not in extra else extra
    unified: dict = {c: lsch[c] for c in left_cols}
    for c in right_keep:
        if c not in unified:
            unified[c] = rsch[c]

    from ..state.cuckoo import sha1_64

    def prep(keep: list[str], side: str):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            data = {}
            for c, typ in unified.items():
                data[c] = t[c] if c in keep else pa.nulls(n, typ)
            # stable hash: Python's hash() is per-process randomized for
            # strings, which would scatter one key across buckets
            data["_b"] = pa.array(
                [sha1_64(str(v)) % buckets for v in t[key].to_pylist()],
                pa.int32(),
            )
            data["_side"] = pa.array([side] * n, pa.string())
            return pa.table(data)

        return fn

    lt = left_ds.map_batches(prep(left_cols, "l"), batch_format="pyarrow")
    rt = right_ds.map_batches(prep(right_keep, "r"), batch_format="pyarrow")

    out_cols = left_cols + extra

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["_side"] == "l"][left_cols]
        r = g[g["_side"] == "r"][right_keep]
        if len(l) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=g[c].dtype) for c in out_cols})
        l = l.sort_values(left_ts, kind="mergesort")
        if len(r) == 0:
            out = l.copy()
            for v in extra:
                out[v] = pd.NA
            return out[out_cols]
        r = r.sort_values(right_ts, kind="mergesort")
        merged = pd.merge_asof(
            l,
            r,
            left_on=left_ts,
            right_on=right_ts,
            by=key,
            direction="backward",
            suffixes=("", "_r"),
        )
        return merged[out_cols]

    return lt.union(rt).groupby("_b").map_groups(per_bucket, batch_format="pandas")


def cluster_pairs(pairs_ds, max_rounds: int = 10):
    """Connected components over (doc_a, doc_b) pairs by min-label
    propagation: label(x) <- min(label(x), min over neighbors'
    labels), iterated to fixpoint. Returns (doc_id, cluster) with
    cluster = smallest doc id in the component."""
    import ray
    import ray.data as rd

    edges = pa.concat_tables(
        [b for b in ray.get(pairs_ds.to_arrow_refs()) if b.num_rows]
    ) if pairs_ds.count() else None
    if edges is None or edges.num_rows == 0:
        return rd.from_arrow(
            pa.table(
                {"doc_id": pa.array([], pa.int64()), "cluster": pa.array([], pa.int64())}
            )
        )
    a = edges["doc_a"].to_pylist()
    b = edges["doc_b"].to_pylist()
    # adjacency (both directions); labels start as each node's own id
    adj: dict[int, list[int]] = {}
    for x, y in zip(a, b):
        adj.setdefault(x, []).append(y)
        adj.setdefault(y, []).append(x)
    labels = {n: n for n in adj}
    # distributed shape: each round = explode (node, nbr) rows, groupby
    # node with Min over neighbor labels. The candidate graph here is
    # LSH output (bounded), so rounds run driver-side over the same
    # exploded table; swap to ray groupby rounds if pairs outgrow RAM.
    for _ in range(max_rounds):
        changed = False
        for n in labels:
            m = min([labels[n]] + [labels[x] for x in adj[n]])
            if m < labels[n]:
                labels[n] = m
                changed = True
        if not changed:
            break
    items = sorted(labels.items())
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([k for k, _ in items], pa.int64()),
                "cluster": pa.array([v for _, v in items], pa.int64()),
            }
        )
    )
