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

import numpy as np
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
    buckets: int | None = None,
):
    """For each left row: columns of the latest right row with the same
    ``key`` and ``right_ts`` <= ``left_ts`` (nulls when none).

    ``buckets`` (the shuffle fan-out; each bucket is one in-memory
    pandas merge_asof) defaults to 4x the cluster CPU count — a fixed
    constant would cap join parallelism regardless of cluster size."""
    if buckets is None:
        import ray

        buckets = 4 * int(ray.cluster_resources().get("CPU", 8))
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


def cluster_pairs(pairs_ds, max_rounds: int = 30):
    """Connected components over (doc_a, doc_b) pairs, fully
    distributed: alternating large-star / small-star rounds (Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC 2014).
    Each round is one groupby(node).map_groups shuffle over the edge
    set with a vectorized numpy body — the pair graph never touches the
    driver (at 100-TB dedup scale it is billions of edges). Converges
    in O(log^2 n) rounds to star edges (node -> component minimum).
    Returns (doc_id, cluster) with cluster = smallest doc id in the
    component."""
    import ray.data as rd
    from ray.data.aggregate import Min

    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "cluster": pa.array([], pa.int64())}
    )
    pairs_ds = pairs_ds.materialize()
    if pairs_ds.count() == 0:
        return rd.from_arrow(empty)

    def both_dirs(t: pa.Table) -> pa.Table:
        u = pa.concat_arrays([t["u"].combine_chunks(), t["v"].combine_chunks()])
        v = pa.concat_arrays([t["v"].combine_chunks(), t["u"].combine_chunks()])
        return pa.table({"u": u, "v": v})

    def large_star(g: pd.DataFrame) -> pd.DataFrame:
        # N(u) from both directions; connect strictly-larger neighbors
        # to the minimum of N(u) + {u}
        u = int(g["u"].iloc[0])
        nbrs = g["v"].to_numpy()
        m = min(u, int(nbrs.min()))
        big = np.unique(nbrs[nbrs > u])
        return pd.DataFrame(
            {"u": pd.Series(big, dtype="int64"), "v": pd.Series([m] * len(big), dtype="int64")}
        )

    def to_max_min(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        hi = pc.max_element_wise(t["u"], t["v"])
        lo = pc.min_element_wise(t["u"], t["v"])
        return pa.table({"u": hi, "v": lo})

    def small_star(g: pd.DataFrame) -> pd.DataFrame:
        # neighbors all <= u here; hang everything off the minimum
        u = int(g["u"].iloc[0])
        nbrs = g["v"].to_numpy()
        m = int(nbrs.min())
        out = np.unique(np.append(nbrs[nbrs != m], u))
        out = out[out != m]
        return pd.DataFrame(
            {"u": pd.Series(out, dtype="int64"), "v": pd.Series([m] * len(out), dtype="int64")}
        )

    def edge_sums(ds) -> tuple:
        s = ds.sum(["u", "v"])
        return (int(s["sum(u)"]), int(s["sum(v)"]))

    edges = pairs_ds.map_batches(
        lambda t: pa.table({"u": t["doc_a"], "v": t["doc_b"]}), batch_format="pyarrow"
    ).materialize()
    prev_sums = None
    prev_n = None
    for _ in range(max_rounds):
        ls = (
            edges.map_batches(both_dirs, batch_format="pyarrow")
            .groupby("u")
            .map_groups(large_star, batch_format="pandas")
        )
        ss = (
            ls.map_batches(to_max_min, batch_format="pyarrow")
            .groupby("u")
            .map_groups(small_star, batch_format="pandas")
            .materialize()
        )
        edges = ss
        # convergence = identical (count, sum_u, sum_v) across rounds.
        # count() is free metadata after materialize; the sums cost a
        # distributed execution, so they are only computed once the
        # count has stabilized (a changed count alone proves the round
        # made progress)
        n = edges.count()
        if n == 0:
            break
        if n != prev_n:
            prev_n, prev_sums = n, None
            continue
        cur = edge_sums(edges)
        if cur == prev_sums:
            break
        prev_sums = cur

    # star edges: (node, root). Roots appear only as v — add (root, root)
    # rows and take the min per node (defensive if not fully converged).
    labels = (
        edges.map_batches(
            lambda t: pa.table(
                {
                    "doc_id": pa.concat_arrays(
                        [t["u"].combine_chunks(), t["v"].combine_chunks()]
                    ),
                    "cluster": pa.concat_arrays(
                        [t["v"].combine_chunks(), t["v"].combine_chunks()]
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("doc_id")
        .aggregate(Min("cluster", alias_name="cluster"))
        .materialize()
    )
    if labels.count() == 0:
        return rd.from_arrow(empty)
    # stays a Dataset end to end: the label table is corpus-scale on a
    # dup-heavy corpus (one row per clustered doc), so the sort is
    # distributed and the driver never gathers it — callers that want
    # pandas do their own to_pandas on the (typically small) result.
    return labels.sort("doc_id")
