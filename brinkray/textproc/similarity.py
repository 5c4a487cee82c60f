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

__all__ = ["cosine_topk", "cosine_topk_multi", "ivf_topk", "ivf_topk_pruned",
           "build_ivf_centroids", "kmeans_labels", "label_centroids",
           "write_ivf_index", "read_ivf_index", "ivf_search_index"]


def _as_matrix(col) -> np.ndarray:
    """Zero-copy-ish list<float> -> (n, d) matrix: reshape the Arrow
    list array's flat values buffer instead of materializing a Python
    list-of-lists per row (``to_pylist`` was the per-row hot-path cost
    flagged in round 4). Ragged input falls back to the slow path."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    if pa.types.is_fixed_size_list(col.type):
        flat = col.flatten().to_numpy(zero_copy_only=False)
        return flat.astype(np.float64, copy=False).reshape(n, col.type.list_size)
    offs = col.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(offs)
    if np.all(widths == widths[0]):
        flat = col.flatten().to_numpy(zero_copy_only=False)
        return flat.astype(np.float64, copy=False).reshape(n, int(widths[0]))
    return np.array(col.to_pylist(), dtype=np.float64)


def _ids_of(col) -> np.ndarray:
    return col.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)


def _collect(mapped_ds, schema: pa.Schema) -> pa.Table:
    """Gather per-block partial tables to the driver, DROPPING the
    degenerate blocks Ray emits when an upstream filter leaves a block
    empty (those arrive as ZERO-COLUMN tables and make
    ``pa.concat_tables`` raise ArrowInvalid — the deterministic
    ann_filtered_topk crash of round 4). Always returns a table with
    ``schema`` even when every block was empty."""
    tabs = [
        t
        for t in ray.get(mapped_ds.to_arrow_refs())
        if t.num_columns > 0 and t.num_rows > 0
    ]
    if not tabs:
        return schema.empty_table()
    return pa.concat_tables([t.select(schema.names).cast(schema) for t in tabs])


def _unit(v: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(v, axis=-1, keepdims=True)
    return v / np.maximum(n, 1e-12)


def cosine_topk(ds, query: np.ndarray, k: int = 10, vec_col="embedding", id_col="vec_id"):
    """Exact cosine top-k. Returns pa.Table (vec_id, cosine) sorted
    descending, ties broken by id (deterministic)."""
    q = _unit(np.asarray(query, dtype=np.float64))

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}
            )
        ids = _ids_of(t[id_col])
        cos = _unit(_as_matrix(t[vec_col])) @ q
        if len(ids) > k:
            idx = np.argpartition(-cos, k)[:k]
            ids, cos = ids[idx], cos[idx]
        return pa.table(
            {id_col: pa.array(ids, pa.int64()), "cosine": pa.array(cos, pa.float64())}
        )

    schema = pa.schema([(id_col, pa.int64()), ("cosine", pa.float64())])
    parts = _collect(ds.map_batches(partial, batch_format="pyarrow"), schema)
    ids = _ids_of(parts[id_col])
    cos = parts["cosine"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -cos))[:k]
    return pa.table(
        {
            id_col: pa.array(ids[order], pa.int64()),
            "cosine": pa.array(cos[order], pa.float64()),
        }
    )


def cosine_topk_multi(ds, queries: np.ndarray, k: int = 10,
                      vec_col="embedding", id_col="vec_id"):
    """Exact cosine top-k for a BATCH of queries in ONE corpus pass —
    the broadcast-query-matrix shape: the (q, d) matrix ships once via
    the task closure, each batch does a single (n, d) @ (d, q) matmul
    and keeps its per-query partial top-k, so only q*k rows per batch
    reach the driver regardless of corpus size (vs q separate scans).
    Returns pa.Table (qid, vec_id, cosine) with qid = query row index,
    sorted by (qid, -cosine, vec_id)."""
    q = _unit(np.asarray(queries, dtype=np.float64))
    nq = q.shape[0]

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"qid": pa.array([], pa.int64()),
                 id_col: pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}
            )
        ids = _ids_of(t[id_col])
        cos = _unit(_as_matrix(t[vec_col])) @ q.T  # (n, nq)
        out_q, out_id, out_c = [], [], []
        for j in range(nq):
            c = cos[:, j]
            sel = (
                np.argpartition(-c, k)[:k] if len(ids) > k
                else np.arange(len(ids))
            )
            out_q.append(np.full(len(sel), j, dtype=np.int64))
            out_id.append(ids[sel])
            out_c.append(c[sel])
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q), pa.int64()),
                id_col: pa.array(np.concatenate(out_id), pa.int64()),
                "cosine": pa.array(np.concatenate(out_c), pa.float64()),
            }
        )

    schema = pa.schema(
        [("qid", pa.int64()), (id_col, pa.int64()), ("cosine", pa.float64())]
    )
    parts = _collect(ds.map_batches(partial, batch_format="pyarrow"), schema)
    qs = _ids_of(parts["qid"])
    ids = _ids_of(parts[id_col])
    cos = parts["cosine"].to_numpy(zero_copy_only=False)
    keep_q, keep_i, keep_c = [], [], []
    for j in range(nq):
        m = qs == j
        order = np.lexsort((ids[m], -cos[m]))[:k]
        keep_q.append(np.full(len(order), j, dtype=np.int64))
        keep_i.append(ids[m][order])
        keep_c.append(cos[m][order])
    return pa.table(
        {
            "qid": pa.array(np.concatenate(keep_q), pa.int64()),
            id_col: pa.array(np.concatenate(keep_i), pa.int64()),
            "cosine": pa.array(np.concatenate(keep_c), pa.float64()),
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
        if t.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}
            )
        ids = _ids_of(t[id_col])
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

    schema = pa.schema([(id_col, pa.int64()), ("cosine", pa.float64())])
    parts = _collect(ds.map_batches(partial, batch_format="pyarrow"), schema)
    ids = _ids_of(parts[id_col])
    cos = parts["cosine"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -cos))[:k]
    return pa.table(
        {
            id_col: pa.array(ids[order], pa.int64()),
            "cosine": pa.array(cos[order], pa.float64()),
        }
    )


def ivf_topk_pruned(
    ds,
    query: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    vec_col="embedding",
    id_col="vec_id",
):
    """EXACT top-k with IVF cell pruning — the scale path that still
    matches brute force row for row (and therefore a SQL oracle),
    unlike ``ivf_topk``'s fixed-nprobe approximation.

    Per-cell ANGULAR RADIUS bound: with unit vectors, any member x of
    cell c satisfies angle(q, x) >= angle(q, c) - r_c where
    r_c = max over members of angle(c, x), so the best cosine cell c
    can possibly contain is cos(max(0, theta_qc - r_c)). Cells are
    probed in descending bound order, ``nprobe`` at a time; after each
    round, every unprobed cell whose bound (plus a conservative float
    epsilon) still exceeds the current k-th best cosine must be — and
    is — probed next round. Terminates when no unprobed cell can beat
    the k-th best: the result provably equals the exhaustive scan.

    Cost model: one assignment/radius pass (per-batch partial maxima,
    <= n_centroids rows shuffled), then one filtered scan per probe
    round (typically a single round on clustered data; the worst case
    degrades gracefully to the exhaustive scan). Centroids and the
    probe set are broadcast per round, only k rows per batch reach
    the driver."""
    cents = build_ivf_centroids(ds, n_centroids, vec_col=vec_col)
    q = _unit(np.asarray(query, dtype=np.float64))
    base = ds.select_columns([id_col, vec_col])

    # pass 1: per-cell max member angle (the cell radius), reduced from
    # per-batch partial maxima — n_centroids tiny rows total
    def radius_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"cell": pa.array([], pa.int64()), "r": pa.array([], pa.float64())}
            )
        unit = _unit(_as_matrix(t[vec_col]))
        sim = unit @ cents.T
        assign = np.argmax(sim, axis=1)
        member_cos = sim[np.arange(len(unit)), assign]
        ang = np.arccos(np.clip(member_cos, -1.0, 1.0))
        cells, inv = np.unique(assign, return_inverse=True)
        rmax = np.zeros(len(cells))
        np.maximum.at(rmax, inv, ang)
        return pa.table(
            {
                "cell": pa.array(cells.astype(np.int64), pa.int64()),
                "r": pa.array(rmax, pa.float64()),
            }
        )

    from ray.data.aggregate import Max

    rad_rows = (
        base.map_batches(radius_partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Max("r", alias_name="r"))
        .take_all()
    )
    radius = np.zeros(len(cents))
    for r in rad_rows:
        radius[int(r["cell"])] = float(r["r"])

    theta_q = np.arccos(np.clip(cents @ q, -1.0, 1.0))
    # conservative epsilon absorbs arccos/matmul rounding so the bound
    # stays a true upper bound (over-probing is correct, under isn't)
    bound = np.cos(np.maximum(0.0, theta_q - radius - 1e-9)) + 1e-12

    def probe_scan(probe_cells: np.ndarray) -> pa.Table:
        probe_ref = ray.put(np.sort(probe_cells))

        def partial(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {id_col: pa.array([], pa.int64()),
                     "cosine": pa.array([], pa.float64())}
                )
            probe = ray.get(probe_ref)
            ids = _ids_of(t[id_col])
            unit = _unit(_as_matrix(t[vec_col]))
            assign = np.argmax(unit @ cents.T, axis=1)
            mask = np.isin(assign, probe)
            ids, unit = ids[mask], unit[mask]
            cos = unit @ q
            if len(ids) > k:
                idx = np.argpartition(-cos, k)[:k]
                ids, cos = ids[idx], cos[idx]
            return pa.table(
                {id_col: pa.array(ids, pa.int64()),
                 "cosine": pa.array(cos, pa.float64())}
            )

        return _collect(
            base.map_batches(partial, batch_format="pyarrow"),
            pa.schema([(id_col, pa.int64()), ("cosine", pa.float64())]),
        )

    order = np.argsort(-bound, kind="stable")
    probed = np.zeros(len(cents), dtype=bool)
    ids_acc = np.array([], dtype=np.int64)
    cos_acc = np.array([], dtype=np.float64)
    cursor = 0
    while True:
        todo = [int(c) for c in order[cursor:] if not probed[c]][:nprobe]
        if not todo:
            break
        cursor += len(todo)
        probed[np.asarray(todo)] = True
        part = probe_scan(np.asarray(todo, dtype=np.int64))
        ids_acc = np.concatenate([ids_acc, _ids_of(part[id_col])])
        cos_acc = np.concatenate(
            [cos_acc, part["cosine"].to_numpy(zero_copy_only=False)]
        )
        if len(ids_acc) >= k:
            kth = np.sort(cos_acc)[-k]
            remaining = bound[~probed]
            if len(remaining) == 0 or remaining.max() < kth:
                break
    sel = np.lexsort((ids_acc, -cos_acc))[:k]
    return pa.table(
        {
            id_col: pa.array(ids_acc[sel], pa.int64()),
            "cosine": pa.array(cos_acc[sel], pa.float64()),
        }
    )


def write_ivf_index(ds, out_dir: str, n_centroids: int = 16,
                    vec_col="embedding", id_col="vec_id") -> np.ndarray:
    """Persist a BUILD-ONCE IVF index artifact (round-4 gap: the
    quantizer was re-sampled and k-means re-run per query):

    * ``centroids.parquet`` — one row per cell: (cell, center
      list<float>, r) where r is the cell's exact angular radius (max
      member angle), the pruning bound ``ivf_topk_pruned`` derives per
      query today.
    * ``cells/cell=K/*.parquet`` — the corpus re-partitioned by cell
      (hive layout, written distributed): a probe of cell K reads ONLY
      that directory, so an nprobe-of-nlist search touches
      ~nprobe/nlist of the stored bytes instead of scanning the corpus
      and masking.

    Returns the centroid matrix. Deterministic: same corpus -> same
    artifact."""
    import os

    import pyarrow.parquet as pq

    cents = build_ivf_centroids(ds, n_centroids, vec_col=vec_col)
    base = ds.select_columns([id_col, vec_col])

    def assign_cell(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 vec_col: pa.array([], t.schema.field(vec_col).type),
                 "cell": pa.array([], pa.int64()),
                 "_ang": pa.array([], pa.float64())}
            )
        unit = _unit(_as_matrix(t[vec_col]))
        sim = unit @ cents.T
        a = np.argmax(sim, axis=1)
        member_cos = sim[np.arange(len(unit)), a]
        ang = np.arccos(np.clip(member_cos, -1.0, 1.0))
        return pa.table(
            {
                id_col: t[id_col],
                vec_col: t[vec_col],
                "cell": pa.array(a.astype(np.int64), pa.int64()),
                "_ang": pa.array(ang, pa.float64()),
            }
        )

    assigned = base.map_batches(assign_cell, batch_format="pyarrow").materialize()

    from ray.data.aggregate import Max

    rad_rows = (
        assigned.select_columns(["cell", "_ang"])
        .groupby("cell")
        .aggregate(Max("_ang", alias_name="r"))
        .take_all()
    )
    radius = {int(r["cell"]): float(r["r"]) for r in rad_rows}
    os.makedirs(out_dir, exist_ok=True)
    cells = sorted(radius)  # only cells with members exist on disk
    assigned.drop_columns(["_ang"]).write_parquet(
        f"{out_dir}/cells", partition_cols=["cell"]
    )
    # centroids.parquet LAST: it is the build-complete marker a reuser
    # checks, so a crashed partial build never looks finished
    pq.write_table(
        pa.table(
            {
                "cell": pa.array(cells, pa.int64()),
                "center": pa.array(
                    [cents[c].tolist() for c in cells], pa.list_(pa.float64())
                ),
                "r": pa.array([radius[c] for c in cells], pa.float64()),
            }
        ),
        f"{out_dir}/centroids.parquet",
    )
    return cents


def read_ivf_index(out_dir: str):
    """(cells, centers, radii) of a :func:`write_ivf_index` artifact."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{out_dir}/centroids.parquet")
    cells = t["cell"].to_numpy().astype(np.int64)
    centers = _as_matrix(t["center"])
    radii = t["r"].to_numpy().astype(np.float64)
    return cells, centers, radii


def ivf_search_index(index_dir: str, query: np.ndarray, k: int = 10,
                     nprobe: int = 4, vec_col="embedding", id_col="vec_id"):
    """EXACT top-k over a PERSISTED :func:`write_ivf_index` artifact —
    the same provably-exact angular-radius probe loop as
    ``ivf_topk_pruned``, but (a) the quantizer and radii load from the
    index (no per-query k-means, no radius pass) and (b) each probe
    round reads ONLY the probed ``cells/cell=K`` directories, so the
    bytes touched scale with the probed fraction of the corpus rather
    than a full scan + mask."""
    import ray.data as rd

    cells, centers, radii = read_ivf_index(index_dir)
    q = _unit(np.asarray(query, dtype=np.float64))
    theta_q = np.arccos(np.clip(centers @ q, -1.0, 1.0))
    bound = np.cos(np.maximum(0.0, theta_q - radii - 1e-9)) + 1e-12

    schema = pa.schema([(id_col, pa.int64()), ("cosine", pa.float64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        ids = _ids_of(t[id_col])
        cos = _unit(_as_matrix(t[vec_col])) @ q
        if len(ids) > k:
            idx = np.argpartition(-cos, k)[:k]
            ids, cos = ids[idx], cos[idx]
        return pa.table(
            {id_col: pa.array(ids, pa.int64()),
             "cosine": pa.array(cos, pa.float64())}
        )

    def probe_scan(todo: list[int]) -> pa.Table:
        import glob

        # a LIST of directories trips pyarrow's file reader — expand to
        # the concrete per-cell parquet files
        paths = sorted(
            f
            for i in todo
            for f in glob.glob(
                f"{index_dir}/cells/cell={int(cells[i])}/*.parquet"
            )
        )
        if not paths:
            return schema.empty_table()
        ds = rd.read_parquet(paths, columns=[id_col, vec_col])
        return _collect(ds.map_batches(partial, batch_format="pyarrow"), schema)

    order = np.argsort(-bound, kind="stable")
    probed = np.zeros(len(cells), dtype=bool)
    ids_acc = np.array([], dtype=np.int64)
    cos_acc = np.array([], dtype=np.float64)
    cursor = 0
    while True:
        todo = [int(i) for i in order[cursor:] if not probed[i]][:nprobe]
        if not todo:
            break
        cursor += len(todo)
        probed[np.asarray(todo)] = True
        part = probe_scan(todo)
        ids_acc = np.concatenate([ids_acc, _ids_of(part[id_col])])
        cos_acc = np.concatenate(
            [cos_acc, part["cosine"].to_numpy(zero_copy_only=False)]
        )
        if len(ids_acc) >= k:
            kth = np.sort(cos_acc)[-k]
            remaining = bound[~probed]
            if len(remaining) == 0 or remaining.max() < kth:
                break
    sel = np.lexsort((ids_acc, -cos_acc))[:k]
    return pa.table(
        {
            id_col: pa.array(ids_acc[sel], pa.int64()),
            "cosine": pa.array(cos_acc[sel], pa.float64()),
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
            if t.num_rows == 0:
                return pa.table(
                    {"cluster": pa.array([], pa.int64()),
                     "n": pa.array([], pa.int64()),
                     "s": pa.array([], pa.list_(pa.float64()))}
                )
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
        if t.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "cluster": pa.array([], pa.int64())}
            )
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


def ivf_search_index_multi(index_dir: str, queries: np.ndarray, k: int = 10,
                           nprobe: int = 4, vec_col="embedding",
                           id_col="vec_id", query_ids=None):
    """Batched EXACT top-k over a persisted :func:`write_ivf_index`
    artifact — the retrieval-stack amortization the per-query loop
    leaves on the table: within each probe round the UNION of the
    unfinished queries' next cells is read once and every cell batch is
    scored against all the queries probing it in one matmul, so a cell
    shared by m queries is read once per round instead of m times
    (round 1 covers each query's full nprobe set; later rounds fire
    only for queries whose radius bound is not yet beaten — rare).
    Per-query exactness is the same angular-radius argument as
    ``ivf_search_index``. Returns (qid, vec_id, cosine), k rows per
    query, ties broken by vec_id asc. ``query_ids`` defaults to
    0..m-1."""
    import glob

    import ray.data as rd

    cells, centers, radii = read_ivf_index(index_dir)
    Q = _unit(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    m = len(Q)
    qids = (np.arange(m, dtype=np.int64) if query_ids is None
            else np.asarray(list(query_ids), dtype=np.int64))
    theta = np.arccos(np.clip(centers @ Q.T, -1.0, 1.0))  # (n_cells, m)
    bound = np.cos(np.maximum(0.0, theta - radii[:, None] - 1e-9)) + 1e-12

    schema = pa.schema([("qi", pa.int64()), (id_col, pa.int64()),
                        ("cosine", pa.float64())])
    orders = [np.argsort(-bound[:, j], kind="stable") for j in range(m)]
    probed = np.zeros((len(cells), m), dtype=bool)
    cursors = np.zeros(m, dtype=np.int64)
    done = np.zeros(m, dtype=bool)
    acc_ids = [np.array([], dtype=np.int64) for _ in range(m)]
    acc_cos = [np.array([], dtype=np.float64) for _ in range(m)]

    while not done.all():
        round_cells: set[int] = set()
        live: list[int] = []
        for j in range(m):
            if done[j]:
                continue
            todo = [int(i) for i in orders[j][cursors[j]:]
                    if not probed[i, j]][:nprobe]
            if not todo:
                done[j] = True
                continue
            cursors[j] += len(todo)
            live.append(j)
            round_cells.update(todo)
        if not round_cells:
            break
        # ONE read over the round's cell union, every row scored against
        # every live query in one matmul — a cell shared by many queries
        # is read once per round, not once per query. Marking the whole
        # union probed for every live query is sound: each of those
        # cells was fully scanned and scored for each of them.
        for i in round_cells:
            probed[i, np.asarray(live)] = True
        js = live
        sub = Q[js]

        def partial(t: pa.Table, sub=sub, js=js) -> pa.Table:
            if t.num_rows == 0:
                return schema.empty_table()
            ids = _ids_of(t[id_col])
            cos = _unit(_as_matrix(t[vec_col])) @ sub.T  # (n, |js|)
            out_q, out_i, out_c = [], [], []
            for c, j in zip(cos.T, js):
                if len(ids) > k:
                    idx = np.argpartition(-c, k)[:k]
                else:
                    idx = np.arange(len(ids))
                out_q.append(np.full(len(idx), j, dtype=np.int64))
                out_i.append(ids[idx])
                out_c.append(c[idx])
            return pa.table({
                "qi": pa.array(np.concatenate(out_q), pa.int64()),
                id_col: pa.array(np.concatenate(out_i), pa.int64()),
                "cosine": pa.array(np.concatenate(out_c), pa.float64()),
            })

        paths = sorted(
            f
            for i in round_cells
            for f in glob.glob(
                f"{index_dir}/cells/cell={int(cells[i])}/*.parquet")
        )
        if paths:
            part = _collect(
                rd.read_parquet(paths, columns=[id_col, vec_col])
                .map_batches(partial, batch_format="pyarrow"),
                schema,
            )
            pq_j = part["qi"].to_numpy(zero_copy_only=False)
            pids = _ids_of(part[id_col])
            pcos = part["cosine"].to_numpy(zero_copy_only=False)
            for j in js:
                sel = pq_j == j
                acc_ids[j] = np.concatenate([acc_ids[j], pids[sel]])
                acc_cos[j] = np.concatenate([acc_cos[j], pcos[sel]])
                if len(acc_ids[j]):
                    # a cell can reach a query twice (re-read in a later
                    # round for ANOTHER query's probe while this one is
                    # still live) — dedup by id, keeping the max cosine,
                    # so the kth-bound termination never sees a double-
                    # counted candidate
                    uniq, inv = np.unique(acc_ids[j], return_inverse=True)
                    best = np.full(len(uniq), -np.inf)
                    np.maximum.at(best, inv, acc_cos[j])
                    acc_ids[j], acc_cos[j] = uniq, best
        for j in range(m):
            if done[j] or len(acc_cos[j]) < k:
                continue
            kth = np.sort(acc_cos[j])[-k]
            remaining = bound[~probed[:, j], j]
            if len(remaining) == 0 or remaining.max() < kth:
                done[j] = True

    out_q, out_i, out_c = [], [], []
    for j in range(m):
        sel = np.lexsort((acc_ids[j], -acc_cos[j]))[:k]
        out_q.append(np.full(len(sel), qids[j], dtype=np.int64))
        out_i.append(acc_ids[j][sel])
        out_c.append(acc_cos[j][sel])
    return pa.table({
        "qid": pa.array(np.concatenate(out_q), pa.int64()),
        id_col: pa.array(np.concatenate(out_i), pa.int64()),
        "cosine": pa.array(np.concatenate(out_c), pa.float64()),
    })
