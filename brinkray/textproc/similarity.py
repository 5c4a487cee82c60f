"""Similarity search over an embedding column (list<float>).

* ``cosine_topk``   — brute-force baseline: per-batch numpy matmul
  against a broadcast query vector, per-batch partial top-k, tiny
  driver-side merge (the only rows reaching the driver are k per
  batch).
* ``ivf_topk``      — the scale path: deterministic k-means coarse
  quantizer built on a sample, assignment as a map_batches stage, probe
  the ``nprobe`` nearest centroids only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

__all__ = ["cosine_topk", "ivf_topk", "build_ivf_centroids", "kmeans_labels",
           "label_centroids"]


def _as_matrix(col) -> np.ndarray:
    return np.array(col.to_pylist(), dtype=np.float64)


def _unit(v: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(v, axis=-1, keepdims=True)
    return v / np.maximum(n, 1e-12)


def cosine_topk(ds, query: np.ndarray, k: int = 10, vec_col="embedding", id_col="vec_id"):
    """Exact cosine top-k. Returns pa.Table (vec_id, cosine) sorted
    descending, ties broken by id (deterministic)."""
    q = _unit(np.asarray(query, dtype=np.float64))

    def partial(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
        cos = _unit(_as_matrix(t[vec_col])) @ q
        if len(ids) > k:
            idx = np.argpartition(-cos, k)[:k]
            ids, cos = ids[idx], cos[idx]
        return pa.table(
            {id_col: pa.array(ids, pa.int64()), "cosine": pa.array(cos, pa.float64())}
        )

    parts = pa.concat_tables(
        ray.get(ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs())
    )
    ids = np.asarray(parts[id_col].to_pylist(), dtype=np.int64)
    cos = np.asarray(parts["cosine"].to_pylist())
    order = np.lexsort((ids, -cos))[:k]
    return pa.table(
        {
            id_col: pa.array(ids[order], pa.int64()),
            "cosine": pa.array(cos[order], pa.float64()),
        }
    )


def build_ivf_centroids(
    ds, n_centroids: int = 16, iters: int = 5, vec_col="embedding", sample_mod: int = 1
) -> np.ndarray:
    """Deterministic k-means on a sampled, materialized slice (the
    coarse quantizer is tiny and reused; the corpus itself never leaves
    the cluster)."""
    sample = pa.concat_tables(
        ray.get(ds.limit(4096 * sample_mod).to_arrow_refs())
    )
    x = _unit(_as_matrix(sample[vec_col]))
    # deterministic init: evenly spaced sample rows
    step = max(1, len(x) // n_centroids)
    cents = x[::step][:n_centroids].copy()
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(len(cents)):
            m = x[assign == c]
            if len(m):
                cents[c] = _unit(m.mean(axis=0))
    return cents


def ivf_topk(
    ds,
    query: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    vec_col="embedding",
    id_col="vec_id",
):
    """IVF-style approximate top-k: search only the ``nprobe`` clusters
    nearest to the query. Recall < 1 by design; the candidate scan
    shrinks by ~n_centroids/nprobe."""
    cents = build_ivf_centroids(ds, n_centroids, vec_col=vec_col)
    q = _unit(np.asarray(query, dtype=np.float64))
    probe = set(np.argsort(-(cents @ q))[:nprobe].tolist())

    def partial(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
        unit = _unit(_as_matrix(t[vec_col]))
        assign = np.argmax(unit @ cents.T, axis=1)
        mask = np.isin(assign, list(probe))
        ids, unit = ids[mask], unit[mask]
        cos = unit @ q
        if len(ids) > k:
            idx = np.argpartition(-cos, k)[:k]
            ids, cos = ids[idx], cos[idx]
        return pa.table(
            {id_col: pa.array(ids, pa.int64()), "cosine": pa.array(cos, pa.float64())}
        )

    parts = pa.concat_tables(
        ray.get(ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs())
    )
    ids = np.asarray(parts[id_col].to_pylist(), dtype=np.int64)
    cos = np.asarray(parts["cosine"].to_pylist())
    order = np.lexsort((ids, -cos))[:k]
    return pa.table(
        {
            id_col: pa.array(ids[order], pa.int64()),
            "cosine": pa.array(cos[order], pa.float64()),
        }
    )


def kmeans_labels(ds, k: int = 8, iters: int = 10, vec_col="embedding",
                  id_col="vec_id"):
    """Fully DISTRIBUTED Lloyd's k-means over the whole embedding
    column (unit-normalized, cosine geometry) — unlike
    ``build_ivf_centroids`` (driver-side k-means on a bounded sample),
    every point participates in every round. Returns a Dataset of
    (``id_col``, cluster).

    Per round: centroids are broadcast once (``ray.put``); each batch
    assigns vectorized (one matmul) and emits <= k partial rows
    (cluster, count, sum-vector) — the combiner pattern, so the
    groupby(cluster).map_groups reduction moves k x n_blocks tiny rows
    and the driver sees exactly k rows per round regardless of corpus
    size. Iteration count is fixed (no data-dependent stopping), so
    results are bit-stable across runs, block layouts and cluster
    sizes. An emptied cluster keeps its previous centroid.

    Init is deterministic: the sample-based quantizer seed
    (``build_ivf_centroids`` with 0 refinement iterations).
    """
    cents = build_ivf_centroids(ds, n_centroids=k, iters=0, vec_col=vec_col)
    base = ds.select_columns([id_col, vec_col])

    import pandas as pd

    for _ in range(iters):
        ref = ray.put(cents)

        def partial(t: pa.Table) -> pa.Table:
            c = ray.get(ref)
            x = _unit(_as_matrix(t[vec_col]))
            a = np.argmax(x @ c.T, axis=1)
            out_c, out_n, out_s = [], [], []
            for ci in np.unique(a):
                m = x[a == ci]
                out_c.append(int(ci))
                out_n.append(len(m))
                out_s.append(m.sum(axis=0).tolist())
            return pa.table(
                {
                    "cluster": pa.array(out_c, pa.int64()),
                    "n": pa.array(out_n, pa.int64()),
                    "s": pa.array(out_s, pa.list_(pa.float64())),
                }
            )

        def reduce_group(g: pd.DataFrame) -> pd.DataFrame:
            s = np.sum(np.stack(g["s"].to_numpy()), axis=0)
            return pd.DataFrame(
                {
                    "cluster": [int(g["cluster"].iloc[0])],
                    "n": [int(g["n"].sum())],
                    "s": [s.tolist()],
                }
            )

        rows = (
            base.map_batches(partial, batch_format="pyarrow")
            .groupby("cluster")
            .map_groups(reduce_group, batch_format="pandas")
            .take_all()
        )  # exactly <= k rows
        new = cents.copy()
        for r in rows:
            if r["n"]:
                new[int(r["cluster"])] = _unit(
                    np.asarray(r["s"], dtype=np.float64) / r["n"]
                )
        cents = new

    ref = ray.put(cents)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        x = _unit(_as_matrix(t[vec_col]))
        a = np.argmax(x @ c.T, axis=1)
        return pa.table(
            {
                id_col: t[id_col],
                "cluster": pa.array(a.astype(np.int64), pa.int64()),
            }
        )

    return base.map_batches(assign, batch_format="pyarrow")


def label_centroids(ds, vec_col="embedding", label_col="label",
                    scale: int = 10**6):
    """Per-label centroid SUFFICIENT STATISTICS — (label, dim, s_micro,
    n) where s_micro is the exact fixed-point sum of that dimension
    (floor(v * scale) as int64, float32 widened to float64 first so
    the quantization matches SQL bit-for-bit) and n the vector count.
    The class-prototype primitive: the caller divides s_micro/n for the
    mean, keeping the distributed reduction associative and
    bit-reproducible. Per-batch partials pre-aggregate to
    |labels| x dims rows before the ONE small groupby — the vector
    payload never re-shuffles.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        labels = t[label_col].to_numpy(zero_copy_only=False)
        vecs = np.stack(t[vec_col].to_numpy(zero_copy_only=False))
        q = np.floor(vecs.astype(np.float64) * float(scale)).astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        dims = q.shape[1]
        sums = np.zeros((len(uniq), dims), dtype=np.int64)
        np.add.at(sums, inv, q)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                label_col: pa.array(np.repeat(uniq, dims)),
                "dim": pa.array(np.tile(np.arange(dims, dtype=np.int64), len(uniq))),
                "s_micro": pa.array(sums.reshape(-1), pa.int64()),
                "n": pa.array(np.repeat(counts, dims), pa.int64()),
            }
        )

    return (
        ds.select_columns([label_col, vec_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby([label_col, "dim"])
        .aggregate(Sum("s_micro", alias_name="s_micro"), Sum("n", alias_name="n"))
    )
