"""Deduplication operators (exact + near-dup families).

All follow the same scale shape: vectorized per-batch signature
computation in map_batches, then ONE small groupby over
(signature/band) keys — never an O(n^2) driver loop. Pair emission
within a bucket is capped (star pattern) so a degenerate bucket of m
identical docs emits O(m) rather than O(m^2) candidate rows.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .hashing import (
    NUM_PERM,
    band_hashes,
    blake64,
    hamming64,
    minhash_signature,
    shingle_hashes,
    simhash64,
)

BANDS = 16
BUCKET_CAP = 256

_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (numpy<2 has no bitwise_count)."""
    if hasattr(np, "bitwise_count"):
        return np.bitwise_count(x).astype(np.int64)
    b = x.view(np.uint8).reshape(*x.shape, 8)
    return _POP8[b].sum(axis=-1).astype(np.int64)


def _pairs_frame(a, b, vals, val_name, val_dtype="float64"):
    """Typed pair frame: empty outputs must keep their schema so the
    downstream groupby sees consistent blocks."""
    return pd.DataFrame(
        {
            "doc_a": pd.Series(a, dtype="int64"),
            "doc_b": pd.Series(b, dtype="int64"),
            val_name: pd.Series(vals, dtype=val_dtype),
        }
    )


def _keep_colliding_buckets(rows_ds, keys: list[str]):
    """Two-pass bucket pruning: a native groupby-count finds the bucket
    keys with >= 2 members (the only ones that can emit pairs), the row
    set is filtered to those before any per-group Python runs. On a
    mostly-unique corpus this turns O(n_buckets) group callbacks into
    O(collisions)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    counts = rows_ds.groupby(keys).aggregate(Count(alias_name="_n"))
    hot_tbl = counts.map_batches(
        lambda t: t.filter(__import__("pyarrow.compute", fromlist=["greater"]).greater(t["_n"], 1)),
        batch_format="pyarrow",
    ).to_pandas()
    if len(hot_tbl) == 0:
        return None
    hot = set(zip(*(hot_tbl[k] for k in keys)))

    def keep(t: pa.Table) -> pa.Table:
        cols = [t[k].to_pylist() for k in keys]
        mask = pa.array([tup in hot for tup in zip(*cols)], pa.bool_())
        return t.filter(mask)

    return rows_ds.map_batches(keep, batch_format="pyarrow")


def _grouped_bucket_pairs(rows_ds, keys: list[str], coarse_fn, bucket_fn):
    """Run ``bucket_fn`` per exact bucket, but shuffle/group only by a
    64-way coarse key (each exact bucket maps wholly into one coarse
    group): per-group Ray overhead is paid ~64 times instead of once
    per bucket; the per-bucket loop is an in-process pandas groupby."""

    def add_cg(t: pa.Table) -> pa.Table:
        return t.append_column("_cg", pa.array(coarse_fn(t), pa.int32()))

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        outs = [bucket_fn(sub) for _, sub in df.groupby(keys, sort=True)]
        outs = [o for o in outs if len(o)]
        if not outs:
            return bucket_fn(df.iloc[0:0])
        return pd.concat(outs, ignore_index=True)

    with_cg = rows_ds.map_batches(add_cg, batch_format="pyarrow").materialize()
    # coalesce: the groupby sort costs O(blocks^2) scheduling; candidate
    # rows are few (collisions only), so a handful of blocks is right
    nb = max(4, min(64, with_cg.count() // 50_000 + 4))
    return (
        with_cg.repartition(nb)
        .groupby("_cg")
        .map_groups(per_group, batch_format="pandas")
    )


def _dedup_pairs(pairs_ds, val_name: str, how: str):
    """Global (doc_a, doc_b) dedup without Ray's per-group aggregate
    (which walks groups in Python — ~0.5 ms/group kills it at 10^4+
    pairs). Vectorized pandas partials per block, then one small final
    pass over the already-partially-deduped pairs. LSH candidate sets
    are bounded by construction (bucket cap), so the final single-block
    pass stays small; at extreme pair cardinality swap the tail for a
    hash-partitioned repeat of the partial."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        agg = getattr(df.groupby(["doc_a", "doc_b"], as_index=False)[val_name], how)
        return agg()

    return (
        pairs_ds.map_batches(partial, batch_format="pandas")
        .repartition(1)
        .map_batches(partial, batch_format="pandas")
    )


def _ensure_pair_schema(agg_ds, val_name, val_type):
    """A groupby-aggregate over zero rows comes back schemaless; give
    callers a stable (doc_a, doc_b, <val>) empty instead."""
    import ray.data as rd

    if agg_ds is not None:
        agg_ds = agg_ds.materialize()  # count() must not re-execute the run
    if agg_ds is None or agg_ds.count() == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    val_name: pa.array([], val_type),
                }
            )
        )
    return agg_ds


# ---------------------------------------------------------------- exact
def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup: hash-partition on md5(text), keep the smallest id
    per group. Returns (h, doc_id, n_dups). md5 hex matches DuckDB's
    md5() so the result is SQL-checkable."""
    from ray.data.aggregate import Count, Min

    def add_hash(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5(x.encode("utf-8")).hexdigest() for x in t[text_col].to_pylist()]
        return pa.table({"h": pa.array(hs, pa.string()), id_col: t[id_col]})

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min(id_col, alias_name=id_col), Count(alias_name="n_dups"))
    )


# ---------------------------------------------------------------- minhash
def minhash_rows(ds, text_col: str = "text", id_col: str = "doc_id", bands: int = BANDS):
    """Stage 1: per-doc signature, exploded to (band, band_hash, doc_id,
    sig) rows — the LSH bucketing input."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        texts = t[text_col].to_pylist()
        out_band, out_bh, out_id, out_sig = [], [], [], []
        for i, text in zip(ids, texts):
            sig = minhash_signature(shingle_hashes(text))
            sig_bytes = sig.tobytes()
            for b, bh in enumerate(band_hashes(sig, bands)):
                out_band.append(b)
                out_bh.append(bh)
                out_id.append(i)
                out_sig.append(sig_bytes)
        return pa.table(
            {
                "band": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_bh, pa.int64()),
                id_col: pa.array(out_id, pa.int64()),
                "sig": pa.array(out_sig, pa.binary()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def minhash_lsh_pairs(ds, text_col="text", id_col="doc_id", threshold=0.5, bands=BANDS):
    """MinHash+LSH near-dup candidates: bucket by (band, band_hash),
    estimate Jaccard from full signatures, keep pairs >= threshold.
    Returns (doc_a, doc_b, est_jaccard) with doc_a < doc_b, deduped
    across bands via a final groupby."""
    from ray.data.aggregate import Max

    rows = minhash_rows(ds, text_col, id_col, bands)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        n = len(g)
        if n < 2:
            return _pairs_frame([], [], [], "est_jaccard")
        if n > BUCKET_CAP:
            g = g.head(BUCKET_CAP)  # star-pattern cap, see module docstring
            n = BUCKET_CAP
        ids = g[id_col].to_numpy()
        sigs = np.stack(
            [np.frombuffer(s, dtype=np.uint64) for s in g["sig"]]
        )
        a_list, b_list, est_list = [], [], []
        for i in range(n - 1):
            est = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
            keep = np.nonzero(est >= threshold)[0]
            for j in keep:
                a_list.append(ids[i])
                b_list.append(ids[i + 1 + j])
                est_list.append(float(est[j]))
        return _pairs_frame(a_list, b_list, est_list, "est_jaccard")

    rows = rows.materialize()  # signatures are computed once, reused by both passes
    colliding = _keep_colliding_buckets(rows, ["band", "band_hash"])
    if colliding is None:
        return _ensure_pair_schema(None, "est_jaccard", pa.float64())
    pairs = _grouped_bucket_pairs(
        colliding,
        ["band", "band_hash"],
        lambda t: [
            (b * 64 + (bh & 63))
            for b, bh in zip(t["band"].to_pylist(), t["band_hash"].to_pylist())
        ],
        bucket_pairs,
    )
    agg = _dedup_pairs(pairs, "est_jaccard", "max")
    return _ensure_pair_schema(agg, "est_jaccard", pa.float64())


def ngram_jaccard_pairs(ds, text_col="text", id_col="doc_id", threshold=0.3, bands=BANDS):
    """Exact n-gram (token-shingle) Jaccard over LSH candidates: the
    MinHash stage proposes, this verifies with true set Jaccard.
    Candidate texts are joined back by broadcast of the candidate id
    set (small side), never the corpus."""
    import ray

    cand = minhash_lsh_pairs(ds, text_col, id_col, threshold=0.0, bands=bands)
    cand_tbl = cand.to_pandas()
    if len(cand_tbl) == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        )
    needed = set(cand_tbl["doc_a"]) | set(cand_tbl["doc_b"])

    def collect_shingles(t: pa.Table) -> pa.Table:
        ids, texts = t[id_col].to_pylist(), t[text_col].to_pylist()
        keep = [(i, x) for i, x in zip(ids, texts) if i in needed]
        return pa.table(
            {
                id_col: pa.array([i for i, _ in keep], pa.int64()),
                "shingles": pa.array(
                    [shingle_hashes(x).tobytes() for _, x in keep], pa.binary()
                ),
            }
        )

    sh_tbl = pa.concat_tables(
        ray.get(ds.map_batches(collect_shingles, batch_format="pyarrow").to_arrow_refs())
    )
    sh = {
        i: frozenset(np.frombuffer(b, dtype=np.uint64).tolist())
        for i, b in zip(sh_tbl[id_col].to_pylist(), sh_tbl["shingles"].to_pylist())
    }
    a = cand_tbl["doc_a"].to_numpy()
    b = cand_tbl["doc_b"].to_numpy()
    jac = np.array(
        [
            len(sh[x] & sh[y]) / max(1, len(sh[x] | sh[y]))
            for x, y in zip(a, b)
        ]
    )
    keep = jac >= threshold
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_a": pa.array(a[keep], pa.int64()),
                "doc_b": pa.array(b[keep], pa.int64()),
                "jaccard": pa.array(jac[keep], pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------- simhash
def simhash_pairs(ds, text_col="text", id_col="doc_id", max_hamming: int = 3):
    """SimHash near-dup: 64-bit signatures; candidates share one of 4
    16-bit chunks (pigeonhole guarantees recall for distance <= 3),
    verified by exact Hamming distance."""

    def sig_rows(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        sigs = [simhash64(x) for x in t[text_col].to_pylist()]
        out_chunk, out_val, out_id, out_sig = [], [], [], []
        for i, s in zip(ids, sigs):
            for c in range(4):
                out_chunk.append(c)
                out_val.append((s >> (16 * c)) & 0xFFFF)
                out_id.append(i)
                out_sig.append(s)
        return pa.table(
            {
                "chunk": pa.array(out_chunk, pa.int32()),
                "val": pa.array(out_val, pa.int32()),
                id_col: pa.array(out_id, pa.int64()),
                "sig": pa.array(out_sig, pa.uint64()),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col).head(BUCKET_CAP)
        n = len(g)
        if n < 2:
            return _pairs_frame([], [], [], "hamming", "int64")
        ids = g[id_col].to_numpy()
        sigs = g["sig"].to_numpy().astype(np.uint64)
        xor = sigs[:, None] ^ sigs[None, :]
        d = _popcount64(xor)
        iu = np.triu_indices(n, 1)
        dd = d[iu]
        keep = dd <= max_hamming
        return _pairs_frame(
            ids[iu[0]][keep], ids[iu[1]][keep], dd[keep], "hamming", "int64"
        )

    from ray.data.aggregate import Min

    rows = ds.map_batches(sig_rows, batch_format="pyarrow").materialize()
    colliding = _keep_colliding_buckets(rows, ["chunk", "val"])
    if colliding is None:
        return _ensure_pair_schema(None, "hamming", pa.int64())
    pairs = _grouped_bucket_pairs(
        colliding,
        ["chunk", "val"],
        lambda t: [
            (c * 64 + (v & 63))
            for c, v in zip(t["chunk"].to_pylist(), t["val"].to_pylist())
        ],
        bucket_pairs,
    )
    agg = _dedup_pairs(pairs, "hamming", "min")
    return _ensure_pair_schema(agg, "hamming", pa.int64())


# ---------------------------------------------------------------- embeddings
def embedding_dup_pairs(ds, vec_col="embedding", id_col="vec_id", threshold=0.98):
    """Embedding-cosine near-dup: 16-bit random-hyperplane LSH buckets
    (fixed seed), exact cosine verification within buckets."""
    def sig_rows(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        vecs = np.array(t[vec_col].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        unit = vecs / np.maximum(norms, 1e-12)
        # hyperplanes are a fixed function of the embedding dim: every
        # task derives the identical matrix (cluster-wide agreement)
        planes = np.random.default_rng(0xE5D).standard_normal((vecs.shape[1], 16))
        bits = (unit @ planes > 0).astype(np.uint32)
        bucket = (bits << np.arange(16, dtype=np.uint32)).sum(axis=1)
        return pa.table(
            {
                "bucket": pa.array(bucket, pa.int64()),
                id_col: pa.array(ids, pa.int64()),
                "unit": pa.array([v.tobytes() for v in unit], pa.binary()),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col).head(BUCKET_CAP)
        if len(g) < 2:
            return _pairs_frame([], [], [], "cosine")
        ids = g[id_col].to_numpy()
        units = np.stack([np.frombuffer(u, dtype=np.float64) for u in g["unit"]])
        a_list, b_list, c_list = [], [], []
        for i in range(len(g) - 1):
            cos = units[i + 1 :] @ units[i]
            keep = np.nonzero(cos >= threshold)[0]
            for j in keep:
                a_list.append(ids[i])
                b_list.append(ids[i + 1 + j])
                c_list.append(float(cos[j]))
        return _pairs_frame(a_list, b_list, c_list, "cosine")

    from ray.data.aggregate import Max

    rows = ds.map_batches(sig_rows, batch_format="pyarrow").materialize()
    colliding = _keep_colliding_buckets(rows, ["bucket"])
    if colliding is None:
        return _ensure_pair_schema(None, "cosine", pa.float64())
    pairs = _grouped_bucket_pairs(
        colliding,
        ["bucket"],
        lambda t: [b & 63 for b in t["bucket"].to_pylist()],
        bucket_pairs,
    )
    agg = _dedup_pairs(pairs, "cosine", "max")
    return _ensure_pair_schema(agg, "cosine", pa.float64())
