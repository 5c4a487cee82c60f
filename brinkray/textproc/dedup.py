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
    simhash64_md5 as _simhash64_md5,
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


_KEY_MIX = np.uint64(0x9E3779B97F4A7C15)


def _key_hash64(cols: list[np.ndarray]) -> np.ndarray:
    """Mix integer key columns into one uint64 per row (vectorized).
    Used for membership FILTERING only: a spurious collision keeps a
    cold bucket (harmless — downstream groups by the EXACT keys and a
    1-member bucket emits no pairs); it can never drop a hot one,
    because hot-set membership is computed with the same function."""
    with np.errstate(over="ignore"):
        acc = np.zeros(len(cols[0]), dtype=np.uint64)
        for c in cols:
            acc ^= c.astype(np.int64).astype(np.uint64)
            acc *= _KEY_MIX
            acc ^= acc >> np.uint64(29)
    return acc


def _keep_colliding_buckets(rows_ds, keys: list[str], cap: int = BUCKET_CAP):
    """Two-pass bucket pruning: a native groupby-count finds the bucket
    keys with >= 2 members (the only ones that can emit pairs), the row
    set is filtered to those before any per-group Python runs. On a
    mostly-unique corpus this turns O(n_buckets) group callbacks into
    O(collisions).

    The hot set travels as a SORTED uint64 hash array behind one
    ray.put (8 B/bucket — on a dup-heavy corpus the key-tuple set is
    large and would otherwise be pickled into every filter task), and
    the per-row probe is one vectorized np.isin — no per-row Python.

    No-silent-caps rule: rows beyond ``cap`` in a bucket are truncated
    by the star-pattern pair emission downstream — the count of rows
    that WILL be dropped is computed here (the counts are already on
    the driver) and logged, never swallowed."""
    import logging

    import ray

    from .relagg import bucketed_group_sums

    # count pass over the 64-bit key hash with per-batch partial
    # combine + ONE bucketed exchange (bucketed_group_sums) — the
    # sort-based groupby(keys).Count this replaces cost several
    # seconds of pure aggregate overhead per dedup query at sf0.1
    # (the measured Ray sort-aggregate tax; see relagg). Counting on
    # the HASH instead of the exact key tuple can only merge buckets
    # (spurious hot = a cold bucket kept, harmless per the membership
    # argument above), never drop a hot one.
    def count_partial(t: pa.Table) -> pa.Table:
        h = _key_hash64([t[k].to_numpy(zero_copy_only=False) for k in keys])
        u, c = np.unique(h, return_counts=True)
        return pa.table(
            {
                "h": pa.array(u.view(np.int64), pa.int64()),
                "_n": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    counts = bucketed_group_sums(
        rows_ds.map_batches(count_partial, batch_format="pyarrow"),
        key_col="h", sum_cols=["_n"],
    )
    hot_tbl = counts.map_batches(
        lambda t: t.filter(
            __import__("pyarrow.compute", fromlist=["greater"]).greater(
                t["_n"], 1
            )
        ),
        batch_format="pyarrow",
    ).to_pandas()
    if len(hot_tbl) == 0:
        return None
    dropped = int((hot_tbl["_n"] - cap).clip(lower=0).sum())
    if dropped > 0:
        logging.getLogger("brinkray.dedup").warning(
            "bucket cap %d truncates %d rows across %d oversize buckets "
            "(max bucket %d) — recall is reduced; raise the cap or the "
            "LSH bit width",
            cap,
            dropped,
            int((hot_tbl["_n"] > cap).sum()),
            int(hot_tbl["_n"].max()),
        )
    hot_hashes = np.unique(
        hot_tbl["h"].to_numpy().view(np.uint64)
    )  # sorted by construction
    hot_ref = ray.put(hot_hashes)

    def keep(t: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        h = _key_hash64([t[k].to_numpy(zero_copy_only=False) for k in keys])
        return t.filter(pa.array(np.isin(h, hot)))

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


def _dedup_pairs(pairs_ds, val_name: str, how: str, parts: int = 32):
    """Global (doc_a, doc_b) dedup without Ray's per-group aggregate
    (which walks groups in Python — ~0.5 ms/group kills it at 10^4+
    pairs). Vectorized pandas partials per block, then a HASH-
    PARTITIONED repeat: rows are keyed by hash(doc_a, doc_b) % parts
    and the final partial runs once per partition (groupby on the
    small int key, vectorized pandas body per group) — every copy of
    a pair lands in the same partition, and no stage ever runs as a
    single block (the round-2 repartition(1) tail serialized here on
    dup-heavy corpora)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        agg = getattr(df.groupby(["doc_a", "doc_b"], as_index=False)[val_name], how)
        return agg()

    def add_pk(t: pa.Table) -> pa.Table:
        h = _key_hash64(
            [
                t["doc_a"].to_numpy(zero_copy_only=False),
                t["doc_b"].to_numpy(zero_copy_only=False),
            ]
        )
        return t.append_column(
            "_pk", pa.array((h % np.uint64(parts)).astype(np.int32), pa.int32())
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return partial(df.drop(columns=["_pk"]))

    return (
        pairs_ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_pk, batch_format="pyarrow")
        .groupby("_pk")
        .map_groups(final, batch_format="pandas")
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


def dup_span_counts(ds, k: int = 12, text_col: str = "text",
                    id_col: str = "doc_id"):
    """Exact duplicated k-token-SPAN detection — the exact-substring
    dedup shape (suffix-array dedup literature, e.g. Lee et al. 2022,
    at k-token window granularity): a window of k consecutive
    lowercased-alnum tokens counts as duplicated if it occurs in >= 2
    distinct documents. Returns (doc_id, n_dup_windows) for docs with
    at least one duplicated span.

    Stages: (1) a stateless map_batches explodes each doc into its
    DISTINCT window md5 digests as TWO int64 halves (the full 128 bits
    ride the exchange — exact, no truncation collisions — and integer
    keys lexsort ~10x faster than 32-char strings); per-doc dedup
    happens in-task, so the exchange carries at most one row per
    (doc, window) and never window text. (2) ONE low-cardinality
    bucket exchange (bucket = high-half mod 4x cluster CPUs — window
    counts run to millions of distinct groups, where Ray's sort
    aggregate degrades; a run-length pass over the bucket's lexsorted
    digests keeps windows spanning >= 2 docs and pre-counts per doc).
    (3) one tiny groupby(doc_id) sum. md5 matches DuckDB's md5() so
    the whole operator is SQL-certifiable. At 100-TB scale, swap the
    md5 for a vectorized 64-bit rolling hash plus a verify pass on
    colliding spans; the stage shape is unchanged.
    """
    import re

    import ray
    from ray.data.aggregate import Sum

    tok = re.compile(r"[a-z0-9]+")
    n_buckets = 4 * int(ray.cluster_resources().get("CPU", 8))

    def explode(t: pa.Table) -> pa.Table:
        ids: list[int] = []
        w_hi: list[int] = []
        w_lo: list[int] = []
        for doc_id, text in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            toks = tok.findall(text.lower())
            if len(toks) < k:
                continue
            seen = {
                hashlib.md5(" ".join(toks[i:i + k]).encode()).digest()
                for i in range(len(toks) - k + 1)
            }
            for d in seen:
                v = int.from_bytes(d, "big")
                ids.append(doc_id)
                w_hi.append((v >> 64) - (1 << 63))   # signed int64
                w_lo.append((v & ((1 << 64) - 1)) - (1 << 63))
        hi = np.array(w_hi, dtype=np.int64)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "w_hi": pa.array(hi, pa.int64()),
                "w_lo": pa.array(np.array(w_lo, dtype=np.int64), pa.int64()),
                "_wb": pa.array(
                    (hi.view(np.uint64) % np.uint64(n_buckets)).astype(np.int32)
                ),
            }
        )

    def count_shared(g: pd.DataFrame) -> pd.DataFrame:
        hi = g["w_hi"].to_numpy()
        lo = g["w_lo"].to_numpy()
        docs = g[id_col].to_numpy()
        order = np.lexsort((lo, hi))
        hi, lo, docs = hi[order], lo[order], docs[order]
        new = np.concatenate(([True], (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])))
        run_id = np.cumsum(new) - 1
        run_len = np.bincount(run_id)
        shared = run_len[run_id] >= 2  # rows already distinct per (doc, window)
        d, c = np.unique(docs[shared], return_counts=True)
        return pd.DataFrame({id_col: d, "_n": c.astype(np.int64)})

    return (
        ds.select_columns([id_col, text_col])
        .map_batches(explode, batch_format="pyarrow")
        .groupby("_wb")
        .map_groups(count_shared, batch_format="pandas")
        .groupby(id_col)
        .aggregate(Sum("_n", alias_name="n_dup_windows"))
    )


def dup_span_scrub(ds, k: int = 12, text_col: str = "text",
                   id_col: str = "doc_id",
                   max_broadcast_windows: int = 5_000_000):
    """Exact-substring dedup with REMOVAL (the rewrite stage of
    Lee et al. 2022's suffix-array dedup, at k-token window
    granularity): every token covered by a k-token window that occurs
    in >= 2 distinct documents is dropped; the survivors are re-joined
    with single spaces. Returns (doc_id, n_tokens, n_removed,
    text_scrubbed) — md5-keyed like :func:`dup_span_counts`, so the
    whole rewrite is SQL-certifiable.

    Scale shape: the shared-window set is found exactly as in
    dup_span_counts (per-doc distinct digests, one low-cardinality
    bucket exchange, run-length >= 2-doc filter) and comes back as
    digest rows only (16 B/window). Up to ``max_broadcast_windows``
    it broadcasts once via ray.put into a stateless scrub pass (the
    common case — the set counts CROSS-DOC duplicated windows, small
    on a deduplicated corpus). On a boilerplate-heavy corpus whose
    shared set is corpus-proportional, the fallback keeps it
    DISTRIBUTED: per-occurrence window rows hash-join the shared set
    on the digest halves, covered start positions regroup per doc
    through a coarse exchange, and one left-outer join attaches the
    start lists back onto the docs for the rewrite (the
    paragraph_dedup_shuffled shape) — no driver state proportional to
    the corpus on any path."""
    import re

    import ray
    from ray.data.aggregate import Sum

    tok_re = re.compile(r"[a-z0-9]+")
    n_buckets = 4 * int(ray.cluster_resources().get("CPU", 8))

    def explode(t: pa.Table) -> pa.Table:
        ids: list[int] = []
        w_hi: list[int] = []
        w_lo: list[int] = []
        for doc_id, text in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            toks = tok_re.findall(text.lower())
            if len(toks) < k:
                continue
            seen = {
                hashlib.md5(" ".join(toks[i:i + k]).encode()).digest()
                for i in range(len(toks) - k + 1)
            }
            for d in seen:
                v = int.from_bytes(d, "big")
                ids.append(doc_id)
                w_hi.append((v >> 64) - (1 << 63))
                w_lo.append((v & ((1 << 64) - 1)) - (1 << 63))
        hi = np.array(w_hi, dtype=np.int64)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "w_hi": pa.array(hi, pa.int64()),
                "w_lo": pa.array(np.array(w_lo, dtype=np.int64), pa.int64()),
                "_wb": pa.array(
                    (hi.view(np.uint64) % np.uint64(n_buckets)).astype(np.int32)
                ),
            }
        )

    def shared_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        hi = g["w_hi"].to_numpy()
        lo = g["w_lo"].to_numpy()
        order = np.lexsort((lo, hi))
        hi, lo = hi[order], lo[order]
        new = np.concatenate(([True], (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])))
        run_id = np.cumsum(new) - 1
        run_len = np.bincount(run_id)
        keep = new & (run_len[run_id] >= 2)  # one row per shared window
        return pd.DataFrame(
            {"w_hi": pd.Series(hi[keep], dtype="int64"),
             "w_lo": pd.Series(lo[keep], dtype="int64")}
        )

    base = ds.select_columns([id_col, text_col])
    shared_ds = (
        base.map_batches(explode, batch_format="pyarrow")
        .groupby("_wb")
        .map_groups(shared_in_bucket, batch_format="pandas")
        .materialize()
    )
    n_shared = shared_ds.count()

    if n_shared <= max_broadcast_windows:
        shared_df = shared_ds.to_pandas()
        shared = {
            (int(h) + (1 << 63)).to_bytes(8, "big")
            + (int(l) + (1 << 63)).to_bytes(8, "big")
            for h, l in zip(shared_df["w_hi"], shared_df["w_lo"])
        }
        ref = ray.put(shared)

        def scrub(t: pa.Table) -> pa.Table:
            sh = ray.get(ref)
            ids = t[id_col].to_pylist()
            n_tok, n_rem, out_tx = [], [], []
            for text in t[text_col].to_pylist():
                toks = tok_re.findall(text.lower())
                n = len(toks)
                covered = np.zeros(n, dtype=bool)
                if n >= k and sh:
                    for i in range(n - k + 1):
                        d = hashlib.md5(
                            " ".join(toks[i:i + k]).encode()
                        ).digest()
                        if d in sh:
                            covered[i:i + k] = True
                kept = [tk for tk, c in zip(toks, covered) if not c]
                n_tok.append(n)
                n_rem.append(int(covered.sum()))
                out_tx.append(" ".join(kept))
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "n_tokens": pa.array(n_tok, pa.int64()),
                    "n_removed": pa.array(n_rem, pa.int64()),
                    "text_scrubbed": pa.array(out_tx, pa.string()),
                }
            )

        return base.map_batches(scrub, batch_format="pyarrow")

    # ---- distributed fallback: the shared-window set stays a dataset
    from .joins import default_join_partitions

    def occ_rows(t: pa.Table) -> pa.Table:
        ids: list[int] = []
        pos: list[int] = []
        w_hi: list[int] = []
        w_lo: list[int] = []
        for doc_id, text in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            toks = tok_re.findall(text.lower())
            if len(toks) < k:
                continue
            for i in range(len(toks) - k + 1):
                v = int.from_bytes(
                    hashlib.md5(" ".join(toks[i:i + k]).encode()).digest(),
                    "big",
                )
                ids.append(doc_id)
                pos.append(i)
                w_hi.append((v >> 64) - (1 << 63))
                w_lo.append((v & ((1 << 64) - 1)) - (1 << 63))
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "w_hi": pa.array(np.array(w_hi, dtype=np.int64), pa.int64()),
                "w_lo": pa.array(np.array(w_lo, dtype=np.int64), pa.int64()),
            }
        )

    hits = (
        base.map_batches(occ_rows, batch_format="pyarrow")
        .join(shared_ds, join_type="inner",
              num_partitions=default_join_partitions(),
              on=("w_hi", "w_lo"))
        .materialize()
    )

    def add_cg(t: pa.Table) -> pa.Table:
        d = t[id_col].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_cg", pa.array((d % 256).astype(np.int32), pa.int32())
        )

    def starts_per_doc(g: pd.DataFrame) -> pd.DataFrame:
        d = g[id_col].to_numpy().astype(np.int64)
        p = g["pos"].to_numpy().astype(np.int64)
        order = np.lexsort((p, d))
        d, p = d[order], p[order]
        bounds = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        # comma-joined string: Acero hash joins reject list<> payload
        # columns, and the per-doc start list is tiny
        return pd.DataFrame(
            {
                id_col: d[bounds],
                "starts": [
                    ",".join(map(str, x)) for x in np.split(p, bounds[1:])
                ],
            }
        )

    starts_ds = (
        hits.map_batches(add_cg, batch_format="pyarrow")
        .groupby("_cg")
        .map_groups(starts_per_doc, batch_format="pandas")
        .materialize()
    )

    joined = base.join(
        starts_ds, join_type="left_outer",
        num_partitions=default_join_partitions(), on=(id_col,),
    )

    def scrub_joined(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        n_tok, n_rem, out_tx = [], [], []
        for text, starts in zip(t[text_col].to_pylist(), t["starts"].to_pylist()):
            toks = tok_re.findall(text.lower())
            n = len(toks)
            covered = np.zeros(n, dtype=bool)
            for s in (starts.split(",") if starts else ()):
                i = int(s)
                covered[i:i + k] = True
            kept = [tk for tk, c in zip(toks, covered) if not c]
            n_tok.append(n)
            n_rem.append(int(covered.sum()))
            out_tx.append(" ".join(kept))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_removed": pa.array(n_rem, pa.int64()),
                "text_scrubbed": pa.array(out_tx, pa.string()),
            }
        )

    return joined.map_batches(scrub_joined, batch_format="pyarrow")


def dedup_incremental(new_docs, corpus_docs, prefix_tokens: int | None = None,
                      text_col: str = "text", id_col: str = "doc_id",
                      num_partitions: int = 16):
    """Incremental ingestion dedup — the continuous-crawl shape: keep
    only INCOMING docs whose fingerprint is absent from the existing
    corpus. Fingerprint = md5 of the whitespace-normalized text, or of
    just the first ``prefix_tokens`` tokens (boilerplate-prefix dedup).
    Scale shape: both sides fingerprint in stateless map_batches; the
    corpus side reduces to DISTINCT fingerprints (32-byte keys only —
    corpus text never re-shuffles on re-ingest), incoming docs
    anti-join on fp. Returns (doc_id, fp) of the docs to admit.
    """
    import re

    from .hashing import fingerprint
    from .joins import anti_join

    ws = re.compile(r"\s+")

    def fp_of(text: str) -> str:
        if prefix_tokens is None:
            return fingerprint(text)
        toks = ws.split(text.strip())[:prefix_tokens]
        return hashlib.md5(" ".join(toks).encode("utf-8")).hexdigest()

    def new_fp(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: t[id_col],
                "fp": pa.array([fp_of(x) for x in t[text_col].to_pylist()],
                               pa.string()),
            }
        )

    def corpus_fp(t: pa.Table) -> pa.Table:
        return pa.table(
            {"fp": pa.array([fp_of(x) for x in t[text_col].to_pylist()],
                            pa.string())}
        )

    return anti_join(
        new_docs.select_columns([id_col, text_col]).map_batches(
            new_fp, batch_format="pyarrow"
        ),
        corpus_docs.select_columns([text_col]).map_batches(
            corpus_fp, batch_format="pyarrow"
        ),
        on="fp",
        num_partitions=num_partitions,
    )


# ---------------------------------------------------------------- minhash
def minhash_rows(ds, text_col: str = "text", id_col: str = "doc_id",
                 bands: int = BANDS, with_sig: bool = True):
    """Stage 1: per-doc signature, exploded to (band, band_hash, doc_id
    [, sig]) rows — the LSH bucketing input. ``with_sig=False`` emits
    the SLIM 24-byte bucketing rows (the pair-generation exchange does
    not need the 8*NUM_PERM-byte signature payload — at bands=64 the
    blob dominated the shuffle ~20x)."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        texts = t[text_col].to_pylist()
        out_band, out_bh, out_id, out_sig = [], [], [], []
        for i, text in zip(ids, texts):
            sig = minhash_signature(shingle_hashes(text))
            sig_bytes = sig.tobytes() if with_sig else b""
            for b, bh in enumerate(band_hashes(sig, bands)):
                out_band.append(b)
                out_bh.append(bh)
                out_id.append(i)
                if with_sig:
                    out_sig.append(sig_bytes)
        cols = {
            "band": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_bh, pa.int64()),
            id_col: pa.array(out_id, pa.int64()),
        }
        if with_sig:
            cols["sig"] = pa.array(out_sig, pa.binary())
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def minhash_lsh_pairs(ds, text_col="text", id_col="doc_id", threshold=0.5,
                      bands=BANDS, bucket_cap: int = BUCKET_CAP,
                      max_broadcast_bytes: int = 128 << 20):
    """MinHash+LSH near-dup candidates: bucket by (band, band_hash),
    estimate Jaccard from full signatures, keep pairs >= threshold.
    Returns (doc_a, doc_b, est_jaccard) with doc_a < doc_b, deduped
    across bands via a final groupby.

    ``bands`` trades precision for recall: with NUM_PERM=64, bands=16
    gives 4-row bands (sharp, P(collide)=1-(1-s^4)^16), bands=64 gives
    1-row bands (P(collide)=1-(1-s)^64 — misses a true s>=0.5 pair
    with p<=5e-20, which makes an exact-verified result deterministic
    for all practical purposes). ``bucket_cap`` bounds quadratic
    bucket work at scale (truncation is logged, never silent);
    conformance-scale callers pass a cap above the corpus size."""
    import ray

    rows = minhash_rows(ds, text_col, id_col, bands, with_sig=False)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g[id_col].to_numpy())[:bucket_cap]
        n = len(ids)
        if n < 2:
            return _pairs_frame([], [], [], "est_jaccard")
        iu = np.triu_indices(n, 1)
        return _pairs_frame(
            ids[iu[0]], ids[iu[1]], np.zeros(len(iu[0])), "est_jaccard"
        )

    rows = rows.materialize()
    colliding = _keep_colliding_buckets(rows, ["band", "band_hash"], cap=bucket_cap)
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
    cand = _dedup_pairs(pairs, "est_jaccard", "max").materialize()
    if cand.count() == 0:
        return _ensure_pair_schema(None, "est_jaccard", pa.float64())

    # estimate ONCE per distinct candidate pair from the full per-doc
    # signatures (the signature blob never enters the bucket exchange).
    # Candidate docs' signatures broadcast via ray.put (8*NUM_PERM
    # bytes/doc; bounded by candidate docs, not the corpus) — beyond
    # max_broadcast_bytes a shuffle attach (the jaccard_verify shape)
    # would take over; candidates at that scale already go through the
    # exact-verify path, so the broadcast gate raises explicitly.
    ids_tbl = (
        cand.map_batches(
            lambda t: pa.table(
                {
                    id_col: pa.concat_arrays(
                        [t["doc_a"].combine_chunks(),
                         t["doc_b"].combine_chunks()]
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .unique(id_col)
    )
    needed = np.sort(np.asarray(ids_tbl, dtype=np.int64))
    if len(needed) * NUM_PERM * 8 > max_broadcast_bytes:
        raise ValueError(
            "minhash_lsh_pairs: candidate-doc signature payload "
            f"({len(needed)} docs) exceeds max_broadcast_bytes; raise "
            "the budget or run the exact-verify pipeline "
            "(ngram_jaccard_pairs) whose shuffle attach scales past it"
        )
    needed_ref = ray.put(needed)

    def sig_rows(t: pa.Table) -> pa.Table:
        need = ray.get(needed_ref)
        ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
        keep = np.nonzero(np.isin(ids, need))[0]
        texts = t[text_col].to_pylist()
        return pa.table(
            {
                id_col: pa.array(ids[keep], pa.int64()),
                "sig": pa.array(
                    [
                        minhash_signature(shingle_hashes(texts[i])).tobytes()
                        for i in keep
                    ],
                    pa.binary(),
                ),
            }
        )

    sets_tbl = pa.concat_tables(
        ray.get(
            ds.select_columns([id_col, text_col])
            .map_batches(sig_rows, batch_format="pyarrow")
            .to_arrow_refs()
        )
    )
    sig_ref = ray.put(
        dict(zip(sets_tbl[id_col].to_pylist(), sets_tbl["sig"].to_pylist()))
    )

    def estimate(t: pa.Table) -> pa.Table:
        sigs = ray.get(sig_ref)
        out_a, out_b, out_e = [], [], []
        for a, b in zip(t["doc_a"].to_pylist(), t["doc_b"].to_pylist()):
            sa, sb = sigs.get(a), sigs.get(b)
            if sa is None or sb is None:
                continue
            est = float(
                (np.frombuffer(sa, dtype=np.uint64)
                 == np.frombuffer(sb, dtype=np.uint64)).mean()
            )
            if est >= threshold:
                out_a.append(a)
                out_b.append(b)
                out_e.append(est)
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "est_jaccard": pa.array(out_e, pa.float64()),
            }
        )

    est = cand.map_batches(estimate, batch_format="pyarrow")
    return _ensure_pair_schema(est, "est_jaccard", pa.float64())


def ngram_jaccard_pairs(ds, text_col="text", id_col="doc_id", threshold=0.3, bands=BANDS):
    """Exact n-gram (token-shingle) Jaccard over LSH candidates: the
    MinHash stage proposes, ``jaccard_verify`` verifies with true set
    Jaccard — fully distributed."""
    import ray.data as rd

    cand = minhash_lsh_pairs(ds, text_col, id_col, threshold=0.0, bands=bands)
    cand = cand.materialize()
    if cand.count() == 0:
        return rd.from_arrow(_EMPTY_JACCARD)
    return jaccard_verify(ds, cand, text_col, id_col, threshold)


def _prefix_rows_dfattach(base, df_ds, keep_of, text_col, id_col,
                          emit_full: bool = False, n_coarse: int = 256):
    """Beyond-broadcast-scale prefix construction for the AllPairs
    family: each doc's distinct shingles attach their GLOBAL document
    frequency by a distributed hash join on ``sh`` (the df table never
    materializes on the driver — it grows with distinct shingles, i.e.
    ~linearly with corpus tokens), then docs regroup through a
    coarse-group exchange and a vectorized run-boundary pass selects
    each doc's df-ascending prefix (``keep_of(n)`` rarest shingles,
    ties by hash — the same total order as the broadcast path).
    ``emit_full=True`` additionally emits every distinct shingle as a
    side=1 FULL row (the asymmetric overlap-join shape)."""
    from .joins import default_join_partitions

    def doc_sh(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        sh_list = [
            np.unique(shingle_hashes(x)).view(np.int64)
            for x in t[text_col].to_pylist()
        ]
        if sh_list:
            sh = np.concatenate(sh_list)
            did = np.repeat(
                np.asarray(ids, dtype=np.int64),
                [len(s) for s in sh_list],
            )
        else:
            sh = np.array([], dtype=np.int64)
            did = np.array([], dtype=np.int64)
        return pa.table(
            {"sh": pa.array(sh, pa.int64()), id_col: pa.array(did, pa.int64())}
        )

    joined = (
        base.map_batches(doc_sh, batch_format="pyarrow")
        .join(df_ds, join_type="inner",
              num_partitions=default_join_partitions(), on=("sh",))
        .materialize()  # barrier before the groupby (chained-join rule)
    )

    def add_cg(t: pa.Table) -> pa.Table:
        d = t[id_col].to_numpy(zero_copy_only=False)
        cg = (d % n_coarse).astype(np.int32)
        return t.append_column("cg", pa.array(cg, pa.int32()))

    def per_cg(g: pd.DataFrame) -> pd.DataFrame:
        d = g[id_col].to_numpy().astype(np.int64)
        s = g["sh"].to_numpy().astype(np.int64)
        f = g["df"].to_numpy().astype(np.int64)
        order = np.lexsort((s, f, d))  # per doc: df asc, hash asc
        d, s = d[order], s[order]
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        counts = np.diff(np.append(starts, len(d)))
        keep = keep_of(counts)
        pos = np.arange(len(d)) - np.repeat(starts, counts)
        m = pos < np.repeat(keep, counts)
        if emit_full:
            return pd.DataFrame(
                {
                    "sh": np.concatenate([s[m], s]),
                    id_col: np.concatenate([d[m], d]),
                    "side": np.concatenate(
                        [np.zeros(int(m.sum()), np.int8),
                         np.ones(len(d), np.int8)]
                    ),
                }
            )
        return pd.DataFrame({"sh": s[m], id_col: d[m]})

    return (
        joined.map_batches(add_cg, batch_format="pyarrow")
        .groupby("cg")
        .map_groups(per_cg, batch_format="pandas")
    )


def shingle_join_pairs(ds, threshold: float = 0.5, text_col="text",
                       id_col="doc_id", bucket_cap: int = BUCKET_CAP,
                       max_broadcast_bytes: int = 128 << 20):
    """EXACT similarity self-join: every pair with shingle-set Jaccard
    >= ``threshold``, via an inverted shingle index with PREFIX
    FILTERING (the AllPairs/PPJoin bound — Bayardo et al., WWW'07;
    Xiao et al., WWW'08). Unlike the MinHash path this is
    deterministic with recall EXACTLY 1 by construction, so its output
    equals a brute-force SQL oracle row for row.

    Prefix bound: order each doc's distinct shingles by a GLOBAL total
    order and emit only the first ``n - ceil(t*n) + 1`` of its n
    shingles into the index. A pair with Jaccard >= t has
    |intersection| >= ceil(t*n) for BOTH side sizes n, so it must
    collide on at least one indexed prefix shingle — suffix-only
    overlap would cap the intersection at ceil(t*n) - 1. ANY order all
    docs agree on is correct; following AllPairs, the order used is
    DOCUMENT-FREQUENCY ASCENDING (ties by hash): prefixes then hold
    each doc's RAREST shingles, so hot boilerplate shingles almost
    never enter the index and candidate fan-out collapses from
    sum(C(df,2)) over hot shingles to near the true-pair count
    (measured 36 s -> ~7 s at sf0.1's 31-token vocab). Collision
    buckets then emit candidate pairs (star-capped per ``bucket_cap``;
    truncation is logged — conformance callers pass a cap above the
    corpus size to keep exactness) and ``jaccard_verify`` computes
    true set Jaccard fully distributed.

    Scale shape: the df pass is one pre-aggregated groupby over
    (hash, partial df) rows; the df table (|distinct shingles| x 16 B)
    broadcasts once via ray.put — beyond ~10^8 distinct shingles swap
    the broadcast for a hash-join attach + per-doc regroup (the
    ngram_novelty_shuffled pattern). The index holds a (1-t)-fraction
    of the corpus' shingles, buckets prune to colliding keys before
    any per-group Python, candidate pairs dedup through the
    hash-partitioned exchange, and verification shuffles shingle
    payloads only for docs that appear in some candidate pair."""
    import math

    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    base = ds.select_columns([id_col, text_col])

    def df_partial(t: pa.Table) -> pa.Table:
        per_doc = [np.unique(shingle_hashes(x)) for x in t[text_col].to_pylist()]
        if per_doc:
            u, c = np.unique(np.concatenate(per_doc), return_counts=True)
        else:
            u = np.array([], dtype=np.uint64)
            c = np.array([], dtype=np.int64)
        return pa.table(
            {
                "sh": pa.array(u.view(np.int64), pa.int64()),
                "df": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    df_ds = (
        base.map_batches(df_partial, batch_format="pyarrow")
        .groupby("sh")
        .aggregate(Sum("df", alias_name="df"))
        .materialize()
    )
    n_distinct = df_ds.count()
    total_df = int(df_ds.sum("df") or 0)

    if n_distinct * 16 <= max_broadcast_bytes:
        # small-vocabulary path: the (sh, df) table fits the broadcast
        # budget, ship it once via ray.put and build prefixes statelessly
        df_tbl = df_ds.to_pandas().sort_values("sh")
        df_ref = ray.put(
            (df_tbl["sh"].to_numpy(), df_tbl["df"].to_numpy().astype(np.int64))
        )

        def prefix_rows(t: pa.Table) -> pa.Table:
            sh_sorted, dfs = ray.get(df_ref)
            ids = t[id_col].to_pylist()
            out_sh, out_id = [], []
            for i, text in zip(ids, t[text_col].to_pylist()):
                sh = np.unique(shingle_hashes(text)).view(np.int64)
                n = len(sh)
                keep = n - math.ceil(threshold * n) + 1
                my_df = dfs[np.searchsorted(sh_sorted, sh)]
                order = np.lexsort((sh, my_df))  # df asc, hash asc
                pre = sh[order[:keep]]
                out_sh.extend(pre.tolist())
                out_id.extend([i] * len(pre))
            return pa.table(
                {
                    "sh": pa.array(out_sh, pa.int64()),
                    id_col: pa.array(out_id, pa.int64()),
                }
            )

        rows = base.map_batches(prefix_rows, batch_format="pyarrow").materialize()
    else:
        # corpus-scale vocabulary: distinct shingles grow ~linearly
        # with corpus tokens, so the df table must NOT land on the
        # driver — attach df by distributed hash join instead
        rows = _prefix_rows_dfattach(
            base, df_ds,
            keep_of=lambda n: n - np.ceil(threshold * n).astype(np.int64) + 1,
            text_col=text_col, id_col=id_col,
        ).materialize()

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col).head(bucket_cap)
        n = len(g)
        if n < 2:
            return _pairs_frame([], [], [], "jaccard")
        ids = g[id_col].to_numpy()
        iu = np.triu_indices(n, 1)
        return _pairs_frame(ids[iu[0]], ids[iu[1]], np.zeros(len(iu[0])), "jaccard")

    colliding = _keep_colliding_buckets(rows, ["sh"], cap=bucket_cap)
    if colliding is None:
        return rd.from_arrow(_EMPTY_JACCARD)
    cand = _grouped_bucket_pairs(
        colliding,
        ["sh"],
        lambda t: [int(v) & 63 for v in t["sh"].to_pylist()],
        bucket_pairs,
    )
    cand = _dedup_pairs(cand, "jaccard", "max").materialize()
    if cand.count() == 0:
        return rd.from_arrow(_EMPTY_JACCARD)
    # verify-mode gate: total_df (the distinct-(shingle, doc) payload)
    # came from one distributed aggregate — below the budget, broadcast
    # the doc shingle sets and verify in one stateless pass (no
    # per-pair group callbacks: 18.2 s -> ~2 s for 409k candidates at
    # sf0.1); above it, the per-pair shuffle verify keeps memory
    # bounded.
    if total_df * 8 <= max_broadcast_bytes:
        return jaccard_verify_broadcast(ds, cand, text_col, id_col, threshold)
    return jaccard_verify(ds, cand, text_col, id_col, threshold)


def overlap_dup_pairs(ds, threshold_num: int = 4, threshold_den: int = 5,
                      text_col="text", id_col="doc_id",
                      bucket_cap: int = BUCKET_CAP,
                      max_broadcast_bytes: int = 128 << 20):
    """EXACT overlap-coefficient (Szymkiewicz-Simpson) self-join: every
    pair with |A∩B| / min(|A|,|B|) >= num/den over 3-token shingle
    sets — the containment-style measure that catches SUBSET and
    quotation duplicates Jaccard misses (a short doc fully quoted
    inside a long one has overlap 1.0 but arbitrarily low Jaccard; the
    standard containment screen in crawl dedup, cf. Broder's
    containment companion to resemblance, STOC'98 / SEQUENCES'97).

    Candidate generation is an ASYMMETRIC prefix-filter join (the
    AllPairs bound adapted to the min-side): each doc emits its
    (n - ceil(t*n) + 1) RAREST distinct shingles as PREFIX rows
    (global-df-ascending order, ties by hash — all docs agree on the
    order) and every distinct shingle as a FULL row. For a qualifying
    pair, the smaller side S has |∩| >= ceil(t*|S|), so suffix-only
    overlap (capped at ceil(t*|S|) - 1 shingles) is impossible: S's
    prefix holds an intersecting shingle, which the other side carries
    in its FULL set — a (prefix x full) collision is guaranteed,
    recall exactly 1 by construction. Fan-out per shingle bucket is
    prefix_df x full_df: full_df can be corpus-sized for boilerplate
    shingles, but df-ascending prefixes keep those same shingles out
    of every doc's prefix, so prefix_df ~ 0 exactly where full_df is
    hot (the AllPairs argument, asymmetric version).

    Verification is exact and boundary-safe: the gate is the integer
    comparison den*|∩| >= num*min (no float threshold), the emitted
    overlap one IEEE division of exact ints — bit-identical to a SQL
    re-derivation. Scale shape matches shingle_join_pairs: one
    pre-aggregated df groupby, the df table broadcast once, one bucket
    exchange over collisions only, hash-partitioned pair dedup, and
    the verify path auto-switches broadcast -> per-pair shuffle past
    the payload budget."""
    import math

    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    _empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "overlap": pa.array([], pa.float64()),
        }
    )
    base = ds.select_columns([id_col, text_col])

    def df_partial(t: pa.Table) -> pa.Table:
        per_doc = [np.unique(shingle_hashes(x)) for x in t[text_col].to_pylist()]
        if per_doc:
            u, c = np.unique(np.concatenate(per_doc), return_counts=True)
        else:
            u = np.array([], dtype=np.uint64)
            c = np.array([], dtype=np.int64)
        return pa.table(
            {
                "sh": pa.array(u.view(np.int64), pa.int64()),
                "df": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    df_ds = (
        base.map_batches(df_partial, batch_format="pyarrow")
        .groupby("sh")
        .aggregate(Sum("df", alias_name="df"))
        .materialize()
    )
    n_distinct = df_ds.count()
    if n_distinct == 0:
        return rd.from_arrow(_empty)
    total_df = int(df_ds.sum("df") or 0)

    if n_distinct * 16 <= max_broadcast_bytes:
        df_tbl = df_ds.to_pandas().sort_values("sh")
        df_ref = ray.put(
            (df_tbl["sh"].to_numpy(), df_tbl["df"].to_numpy().astype(np.int64))
        )

        def index_rows(t: pa.Table) -> pa.Table:
            sh_sorted, dfs = ray.get(df_ref)
            ids = t[id_col].to_pylist()
            out_sh, out_id, out_side = [], [], []
            for i, text in zip(ids, t[text_col].to_pylist()):
                sh = np.unique(shingle_hashes(text)).view(np.int64)
                n = len(sh)
                # keep = n - ceil(t*n) + 1 with t = num/den, exact
                # integer ceil — a float t could round the prefix one
                # short at the boundary and silently lose recall
                keep = n - (-(-threshold_num * n // threshold_den)) + 1
                my_df = dfs[np.searchsorted(sh_sorted, sh)]
                order = np.lexsort((sh, my_df))  # df asc, hash asc
                pre = sh[order[:keep]]
                out_sh.extend(pre.tolist())
                out_id.extend([i] * len(pre))
                out_side.extend([0] * len(pre))
                out_sh.extend(sh.tolist())
                out_id.extend([i] * n)
                out_side.extend([1] * n)
            return pa.table(
                {
                    "sh": pa.array(out_sh, pa.int64()),
                    id_col: pa.array(out_id, pa.int64()),
                    "side": pa.array(out_side, pa.int8()),
                }
            )

        rows = base.map_batches(index_rows, batch_format="pyarrow").materialize()
    else:
        # beyond the broadcast budget: distributed df-attach (same
        # exact integer-ceil prefix bound, vectorized)
        rows = _prefix_rows_dfattach(
            base, df_ds,
            keep_of=lambda n: (
                n - (threshold_num * n + threshold_den - 1) // threshold_den + 1
            ),
            text_col=text_col, id_col=id_col, emit_full=True,
        ).materialize()

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        pdocs = np.unique(g.loc[g["side"] == 0, id_col].to_numpy())[:bucket_cap]
        fdocs = np.unique(g.loc[g["side"] == 1, id_col].to_numpy())[:bucket_cap]
        if len(pdocs) == 0 or len(fdocs) == 0:
            return _pairs_frame([], [], [], "overlap")
        a = np.repeat(pdocs, len(fdocs))
        b = np.tile(fdocs, len(pdocs))
        keep = a != b
        a, b = a[keep], b[keep]
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        pairs = np.unique(np.stack([lo, hi], axis=1), axis=0)
        return _pairs_frame(
            pairs[:, 0], pairs[:, 1], np.zeros(len(pairs)), "overlap"
        )

    colliding = _keep_colliding_buckets(rows, ["sh"], cap=bucket_cap)
    if colliding is None:
        return rd.from_arrow(_empty)
    cand = _grouped_bucket_pairs(
        colliding,
        ["sh"],
        lambda t: [int(v) & 63 for v in t["sh"].to_pylist()],
        bucket_pairs,
    )
    cand = _dedup_pairs(cand, "overlap", "max").materialize()
    if cand.count() == 0:
        return rd.from_arrow(_empty)
    if total_df * 8 <= max_broadcast_bytes:
        return jaccard_verify_broadcast(
            ds, cand, text_col, id_col, measure="overlap",
            num=threshold_num, den=threshold_den,
        )
    return jaccard_verify(
        ds, cand, text_col, id_col, measure="overlap",
        num=threshold_num, den=threshold_den,
    )


_EMPTY_JACCARD = pa.table(
    {
        "doc_a": pa.array([], pa.int64()),
        "doc_b": pa.array([], pa.int64()),
        "jaccard": pa.array([], pa.float64()),
    }
)


def jaccard_verify_broadcast(ds, cand, text_col="text", id_col="doc_id",
                             threshold=0.3, measure: str = "jaccard",
                             num: int = 0, den: int = 1):
    """Exact set-Jaccard verification with the needed docs' shingle
    sets BROADCAST (ray.put once) instead of shuffled per pair: one
    stateless map_batches over the candidate pairs, no per-pair group
    callbacks. The right shape when the candidate-side doc payload is
    small relative to worker memory (the usual case — candidates are
    collisions, not the corpus); the per-pair-shuffle
    :func:`jaccard_verify` is the fallback when it is not (see
    shingle_join_pairs' auto gate)."""
    import ray
    import ray.data as rd

    ids_tbl = (
        cand.map_batches(
            lambda t: pa.table(
                {
                    "doc_id": pa.concat_arrays(
                        [t["doc_a"].combine_chunks(), t["doc_b"].combine_chunks()]
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .unique("doc_id")
    )
    needed = np.sort(np.asarray(ids_tbl, dtype=np.int64))
    needed_ref = ray.put(needed)

    def set_rows(t: pa.Table) -> pa.Table:
        need = ray.get(needed_ref)
        ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
        keep = np.nonzero(np.isin(ids, need))[0]
        texts = t[text_col].to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "shingles": pa.array(
                    [np.unique(shingle_hashes(texts[i])).tobytes() for i in keep],
                    pa.large_binary(),
                ),
            }
        )

    sets_tbl = pa.concat_tables(
        ray.get(
            ds.select_columns([id_col, text_col])
            .map_batches(set_rows, batch_format="pyarrow")
            .to_arrow_refs()
        )
    )  # bounded by the candidate docs' shingle payload (the auto gate)
    sets_ref = ray.put(
        dict(zip(sets_tbl["doc_id"].to_pylist(), sets_tbl["shingles"].to_pylist()))
    )

    def verify(t: pa.Table) -> pa.Table:
        sets = ray.get(sets_ref)
        out_a, out_b, out_j = [], [], []
        for a, b in zip(t["doc_a"].to_pylist(), t["doc_b"].to_pylist()):
            sa, sb = sets.get(a), sets.get(b)
            if sa is None or sb is None:
                continue  # candidate doc absent from ds (mirrors shuffle path)
            s1 = np.frombuffer(sa, dtype=np.uint64)
            s2 = np.frombuffer(sb, dtype=np.uint64)
            inter = len(np.intersect1d(s1, s2))
            if measure == "overlap":
                # Szymkiewicz-Simpson: |A∩B| / min(|A|,|B|); the gate is
                # the EXACT rational den*inter >= num*min (no float
                # boundary), the emitted value one IEEE division
                m = max(1, min(len(s1), len(s2)))
                if den * inter < num * m:
                    continue
                out_a.append(a)
                out_b.append(b)
                out_j.append(inter / m)
                continue
            jac = inter / max(1, len(s1) + len(s2) - inter)
            if jac >= threshold:
                out_a.append(a)
                out_b.append(b)
                out_j.append(jac)
        val_name = "overlap" if measure == "overlap" else "jaccard"
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                val_name: pa.array(out_j, pa.float64()),
            }
        )

    verified = cand.map_batches(verify, batch_format="pyarrow").materialize()
    if verified.count() == 0:
        if measure == "overlap":
            return rd.from_arrow(
                pa.table(
                    {
                        "doc_a": pa.array([], pa.int64()),
                        "doc_b": pa.array([], pa.int64()),
                        "overlap": pa.array([], pa.float64()),
                    }
                )
            )
        return rd.from_arrow(_EMPTY_JACCARD)
    return verified


def jaccard_verify(ds, cand, text_col="text", id_col="doc_id", threshold=0.3,
                   measure: str = "jaccard", num: int = 0, den: int = 1):
    """Exact set-Jaccard over 3-token shingles for each candidate pair
    in ``cand`` (a Dataset of (doc_a, doc_b)) — fully distributed. The
    candidate ID ARRAY (8 B/id) is the only broadcast (ray.put once,
    np.isin per batch); the shingle sets themselves are hash-joined to
    the pairs with two groupby shuffles (doc_id to attach,
    (doc_a, doc_b) to verify) and never gathered to the driver — a
    dup-heavy corpus would otherwise OOM it."""
    import ray
    import ray.data as rd

    empty = _EMPTY_JACCARD
    if measure == "overlap":
        empty = pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "overlap": pa.array([], pa.float64()),
            }
        )

    # distinct candidate ids (distributed distinct, tiny result)
    ids_tbl = (
        cand.map_batches(
            lambda t: pa.table(
                {
                    "doc_id": pa.concat_arrays(
                        [t["doc_a"].combine_chunks(), t["doc_b"].combine_chunks()]
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .unique("doc_id")
    )
    needed_ref = ray.put(np.sort(np.asarray(ids_tbl, dtype=np.int64)))

    def shingle_rows(t: pa.Table) -> pa.Table:
        needed = ray.get(needed_ref)
        ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
        mask = np.isin(ids, needed)
        texts = t[text_col].to_pylist()
        keep = np.nonzero(mask)[0]
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "doc_a": pa.array([-1] * len(keep), pa.int64()),
                "doc_b": pa.array([-1] * len(keep), pa.int64()),
                "shingles": pa.array(
                    [shingle_hashes(texts[i]).tobytes() for i in keep],
                    pa.large_binary(),
                ),
            }
        )

    def side_rows(t: pa.Table) -> pa.Table:
        a = t["doc_a"].combine_chunks()
        b = t["doc_b"].combine_chunks()
        return pa.table(
            {
                "doc_id": pa.concat_arrays([a, b]),
                "doc_a": pa.concat_arrays([a, a]),
                "doc_b": pa.concat_arrays([b, b]),
                "shingles": pa.array([b""] * (len(a) + len(b)), pa.large_binary()),
            }
        )

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        # one 'have' row (doc_a == -1) + the pair sides needing it
        have = g[g["doc_a"] == -1]
        need = g[g["doc_a"] != -1]
        if len(have) == 0 or len(need) == 0:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series([], dtype="int64"),
                    "doc_b": pd.Series([], dtype="int64"),
                    "shingles": pd.Series([], dtype="object"),
                }
            )
        sh = have["shingles"].iloc[0]
        return pd.DataFrame(
            {
                "doc_a": need["doc_a"].to_numpy(),
                "doc_b": need["doc_b"].to_numpy(),
                "shingles": [sh] * len(need),
            }
        )

    val_name = "overlap" if measure == "overlap" else "jaccard"

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        out = {
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
            val_name: pd.Series([], dtype="float64"),
        }
        if len(g) != 2:
            # defensive: upstream _dedup_pairs emits unique pairs, so a
            # group is normally exactly the pair's two shingle sides. A
            # duplicated upstream pair (2 rows per side) is recovered by
            # row-dedup; 1 distinct row means both sides had IDENTICAL
            # shingles (true dup). Anything else (e.g. a candidate doc
            # absent from ds) is logged and skipped, never swallowed.
            import logging

            g2 = g.drop_duplicates()
            if len(g2) == 1 and len(g) >= 2:
                g = pd.concat([g2, g2], ignore_index=True)
            elif len(g2) == 2:
                g = g2
            else:
                if len(g) > 0:
                    logging.getLogger("brinkray.dedup").warning(
                        "ngram verify: pair (%d, %d) has %d shingle "
                        "sides after dedup (expected 2) — skipped",
                        int(g["doc_a"].iloc[0]),
                        int(g["doc_b"].iloc[0]),
                        len(g2),
                    )
                return pd.DataFrame(out)
        # the shipped arrays are raw (non-unique) shingle streams;
        # intersect1d/union1d dedupe internally, but overlap's
        # min-cardinality denominator must count DISTINCT shingles
        s1 = np.unique(np.frombuffer(g["shingles"].iloc[0], dtype=np.uint64))
        s2 = np.unique(np.frombuffer(g["shingles"].iloc[1], dtype=np.uint64))
        inter = len(np.intersect1d(s1, s2))
        if measure == "overlap":
            m = max(1, min(len(s1), len(s2)))
            if den * inter < num * m:  # exact rational gate
                return pd.DataFrame(out)
            val = inter / m
        else:
            union = len(np.union1d(s1, s2))
            val = inter / max(1, union)
            if val < threshold:
                return pd.DataFrame(out)
        return pd.DataFrame(
            {
                "doc_a": g["doc_a"].iloc[:1].astype("int64"),
                "doc_b": g["doc_b"].iloc[:1].astype("int64"),
                val_name: pd.Series([val], dtype="float64"),
            }
        )

    have = ds.map_batches(shingle_rows, batch_format="pyarrow")
    need = cand.map_batches(side_rows, batch_format="pyarrow")
    attached = (
        have.union(need)
        .groupby("doc_id")
        .map_groups(attach, batch_format="pandas")
    )
    verified = (
        attached.groupby(["doc_a", "doc_b"])
        .map_groups(verify, batch_format="pandas")
        .materialize()
    )
    if verified.count() == 0:
        return rd.from_arrow(empty)
    return verified


def winnowing_fingerprints(ds, k: int = 8, w: int = 4,
                           text_col="text", id_col="doc_id"):
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
    SIGMOD'03, the MOSS scheme): hash every character k-gram, slide a
    window of w consecutive k-gram hashes, and select the RIGHTMOST
    minimal hash per window; the distinct selected positions are the
    doc's fingerprints. Guarantees: any shared substring of length
    >= k + w - 1 contributes at least one IDENTICAL fingerprint to
    both docs (detection threshold), and fingerprint density is
    ~2/(w+1) regardless of doc length — position-robust local
    fingerprinting, unlike whole-doc hashes.

    Fully stateless map_batches: per doc the k-gram hashes are md5
    lower-64 (hashing.md5_lower64 == DuckDB md5_number_lower, so the
    whole scheme is SQL-twinnable verbatim), the window min + rightmost
    argmin is one numpy sliding_window_view pass (no per-window
    Python). Emits per doc: n_fingerprints (distinct selected
    positions) and fp_checksum = sum of selected hashes mod 1e9+7
    (order-independent exact-int certificate of the selected SET).
    Docs shorter than k + w - 1 chars have no complete window and emit
    no row (mirrored by the twin's length filter)."""
    from numpy.lib.stride_tricks import sliding_window_view

    from .hashing import md5_lower64

    MOD = 1_000_000_007

    def per_batch(t: pa.Table) -> pa.Table:
        ids_out, nfp_out, ck_out = [], [], []
        for i, s in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            n = len(s) - k + 1
            if n < w:
                continue
            hs = np.fromiter(
                (md5_lower64(s[p:p + k]) for p in range(n)),
                dtype=np.uint64,
                count=n,
            )
            sw = sliding_window_view(hs, w)
            # rightmost argmin: argmin over the reversed window
            arg = (w - 1) - sw[:, ::-1].argmin(axis=1)
            sel = np.unique(np.arange(n - w + 1) + arg)
            ids_out.append(i)
            nfp_out.append(len(sel))
            ck_out.append(int((hs[sel] % np.uint64(MOD)).sum()))
        return pa.table(
            {
                id_col: pa.array(ids_out, pa.int64()),
                "n_fingerprints": pa.array(nfp_out, pa.int64()),
                "fp_checksum": pa.array(ck_out, pa.int64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        per_batch, batch_format="pyarrow"
    )


# ---------------------------------------------------------------- simhash
def simhash_pairs(ds, text_col="text", id_col="doc_id", max_hamming: int = 3,
                  hash_kind: str = "blake", bucket_cap: int = BUCKET_CAP):
    """SimHash near-dup: 64-bit signatures; candidates share one of 4
    16-bit chunks (pigeonhole guarantees recall for distance <= 3),
    verified by exact Hamming distance.

    ``hash_kind="md5"`` switches the token hash to md5_lower64
    (DuckDB's md5_number_lower), making the signatures — and therefore
    the exact-Hamming result at max_hamming <= 3, where the pigeonhole
    recall guarantee holds — independently re-derivable by a SQL
    oracle. ``"blake"`` (default) keeps the faster keyed blake2b for
    scale runs. ``bucket_cap`` bounds quadratic chunk-bucket work
    (logged truncation); conformance callers pass a cap above the
    corpus size so recall stays exact."""
    sig_fn = simhash64 if hash_kind == "blake" else _simhash64_md5

    def sig_rows(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        sigs = [sig_fn(x) for x in t[text_col].to_pylist()]
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
                # int64 BIT VIEW of the uint64 signature: a uint64
                # column >= 2^63 trips Ray's shuffle-side Arrow
                # conversion (int overflow) and silently degrades the
                # whole block to pickled python objects; bucket_pairs'
                # astype(np.uint64) reinterprets the bits back
                "sig": pa.array(
                    np.array(out_sig, dtype=np.uint64).view(np.int64), pa.int64()
                ),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col).head(bucket_cap)
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
    colliding = _keep_colliding_buckets(rows, ["chunk", "val"], cap=bucket_cap)
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
def embedding_dup_pairs(
    ds,
    vec_col="embedding",
    id_col="vec_id",
    threshold=0.98,
    n_tables: int = 4,
    bits: int | None = None,
    bucket_cap: int = BUCKET_CAP,
):
    """Embedding-cosine near-dup: MULTI-TABLE random-hyperplane LSH
    (fixed seed), exact cosine verification within buckets.

    Scale shape: ``bits`` grows with corpus size (log2(n / 32), so
    expected bucket occupancy stays ~32 regardless of corpus — a fixed
    16-bit space saturates at 10^8+ vectors and silently collapses
    recall), and ``n_tables`` independent tables recover the recall a
    single sharper table loses: a pair at cosine c collides in one
    b-bit table with p = (1 - arccos(c)/pi)^b, and in >= 1 of L tables
    with 1 - (1 - p)^L. Truncation by the bucket cap is counted and
    logged (never silent)."""
    n = ds.count()
    if bits is None:
        bits = int(max(12, min(24, np.ceil(np.log2(max(n, 2) / 32)))))
    total_bits = n_tables * bits

    def sig_rows(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        vecs = np.array(t[vec_col].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        unit = vecs / np.maximum(norms, 1e-12)
        # hyperplanes are a fixed function of (dim, total_bits): every
        # task derives the identical matrix (cluster-wide agreement)
        planes = np.random.default_rng(0xE5D).standard_normal(
            (vecs.shape[1], total_bits)
        )
        bits_m = (unit @ planes > 0).astype(np.uint64)
        out_table, out_bucket, out_id, out_unit = [], [], [], []
        unit_bytes = [v.tobytes() for v in unit]
        for tbl_i in range(n_tables):
            chunk = bits_m[:, tbl_i * bits : (tbl_i + 1) * bits]
            bucket = (chunk << np.arange(bits, dtype=np.uint64)).sum(axis=1)
            out_table.extend([tbl_i] * len(ids))
            out_bucket.extend(bucket.tolist())
            out_id.extend(ids)
            out_unit.extend(unit_bytes)
        return pa.table(
            {
                "table": pa.array(out_table, pa.int32()),
                "bucket": pa.array(out_bucket, pa.int64()),
                id_col: pa.array(out_id, pa.int64()),
                "unit": pa.array(out_unit, pa.binary()),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col).head(bucket_cap)
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

    rows = ds.map_batches(sig_rows, batch_format="pyarrow").materialize()
    colliding = _keep_colliding_buckets(rows, ["table", "bucket"], cap=bucket_cap)
    if colliding is None:
        return _ensure_pair_schema(None, "cosine", pa.float64())
    pairs = _grouped_bucket_pairs(
        colliding,
        ["table", "bucket"],
        lambda t: [
            (tb * 16 + (b & 15))
            for tb, b in zip(t["table"].to_pylist(), t["bucket"].to_pylist())
        ],
        bucket_pairs,
    )
    agg = _dedup_pairs(pairs, "cosine", "max")
    return _ensure_pair_schema(agg, "cosine", pa.float64())


def cdc_chunk_dedup(ds, head_chars: int = 512, window: int = 12,
                    text_col: str = "text", id_col: str = "doc_id"):
    """Content-defined-chunking dedup statistics (the FastCDC / LBFS
    rolling-boundary family): each document's head is split at
    content-defined boundaries — a boundary falls after character
    ``i`` whenever the md5 of the trailing ``window`` characters
    starts with hex '0' (p = 1/16, mean chunk ~16 chars) — and a chunk
    counts as duplicated if its exact content occurs in >= 2 distinct
    documents. Unlike fixed k-token windows (dup_span_counts), CDC
    boundaries re-synchronize after insertions/deletions, so shared
    content is found at shifted offsets — the property dedup storage
    and crawl re-capture diffing rely on. Returns
    (doc_id, n_chunks, n_dup_chunks) per doc with a non-empty head.

    md5 as the boundary predicate AND the chunk fingerprint keeps the
    whole operator SQL-certifiable (DuckDB md5 over the identical
    substrings); a production run swaps in a vectorized gear/Rabin
    hash plus a verify pass — the stage shape is unchanged.
    ``head_chars`` bounds the per-doc boundary scan (the certifiable
    conformance surface; full-body chunking only changes the loop
    bound). Stages: (1) a stateless explode emits each doc's chunk
    digests as two int64 halves PER OCCURRENCE plus one per-doc
    (n_chunks) total row — both facts are row-local, no exchange
    builds them; totals rows spread across the SAME bucket space by
    doc hash (never one hot group). (2) digests bucket by high half;
    each bucket counts distinct docs per digest with one
    (hi, lo, doc)-lexsorted run pass and re-emits per-doc
    dup-occurrence counts; totals rows pass through. (3) one tiny
    groupby(doc) sums both counters."""
    import ray
    from ray.data.aggregate import Sum

    n_buckets = 4 * int(ray.cluster_resources().get("CPU", 8))

    def explode(t: pa.Table) -> pa.Table:
        ids: list[int] = []
        hi: list[int] = []
        lo: list[int] = []
        tot_doc: list[int] = []
        tot_n: list[int] = []
        for doc_id, text in zip(t[id_col].to_pylist(),
                                t[text_col].to_pylist()):
            head = text[:head_chars]
            if not head:
                continue
            cuts = [0]
            for i in range(window, len(head) + 1):
                if hashlib.md5(
                    head[i - window:i].encode()
                ).hexdigest()[0] == "0":
                    cuts.append(i)
            if cuts[-1] != len(head):
                cuts.append(len(head))
            tot_doc.append(doc_id)
            tot_n.append(len(cuts) - 1)
            for a, b in zip(cuts[:-1], cuts[1:]):
                v = int.from_bytes(
                    hashlib.md5(head[a:b].encode()).digest(), "big")
                ids.append(doc_id)
                hi.append((v >> 64) - (1 << 63))
                lo.append((v & ((1 << 64) - 1)) - (1 << 63))
        h = np.array(hi, dtype=np.int64)
        occ_ids = np.array(ids, dtype=np.int64)
        td = np.array(tot_doc, dtype=np.int64)
        return pa.table({
            id_col: pa.array(np.concatenate([occ_ids, td]), pa.int64()),
            "c_hi": pa.array(np.concatenate(
                [h, np.zeros(len(td), dtype=np.int64)]), pa.int64()),
            "c_lo": pa.array(np.concatenate(
                [np.array(lo, dtype=np.int64),
                 np.zeros(len(td), dtype=np.int64)]), pa.int64()),
            "_cb": pa.array(np.concatenate([
                (h.view(np.uint64) % np.uint64(n_buckets)).astype(np.int32),
                (td.view(np.uint64) % np.uint64(n_buckets)).astype(np.int32),
            ])),
            "_tot": pa.array(np.concatenate(
                [np.zeros(len(occ_ids), dtype=np.int8),
                 np.ones(len(td), dtype=np.int8)])),
            "n_chunks": pa.array(np.concatenate(
                [np.zeros(len(occ_ids), dtype=np.int64),
                 np.array(tot_n, dtype=np.int64)]), pa.int64()),
        })

    def bucket_dups(g: pd.DataFrame) -> pd.DataFrame:
        is_tot = g["_tot"].to_numpy() == 1
        out_doc = [g[id_col].to_numpy()[is_tot]]
        out_nc = [g["n_chunks"].to_numpy()[is_tot]]
        out_nd = [np.zeros(int(is_tot.sum()), dtype=np.int64)]
        occ = g[~is_tot]
        if len(occ):
            hi = occ["c_hi"].to_numpy()
            lo = occ["c_lo"].to_numpy()
            docs = occ[id_col].to_numpy()
            order = np.lexsort((docs, lo, hi))
            hi, lo, docs = hi[order], lo[order], docs[order]
            new = np.concatenate(
                ([True], (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])))
            run_id = np.cumsum(new) - 1
            pair_new = new | np.concatenate(([True], docs[1:] != docs[:-1]))
            n_docs = np.bincount(run_id[pair_new])
            dup = n_docs[run_id] >= 2
            d, c = np.unique(docs[dup], return_counts=True)
            out_doc.append(d)
            out_nc.append(np.zeros(len(d), dtype=np.int64))
            out_nd.append(c.astype(np.int64))
        return pd.DataFrame({
            id_col: np.concatenate(out_doc),
            "n_chunks": np.concatenate(out_nc),
            "n_dup_chunks": np.concatenate(out_nd),
        })

    return (
        ds.select_columns([id_col, text_col])
        .map_batches(explode, batch_format="pyarrow")
        .groupby("_cb")
        .map_groups(bucket_dups, batch_format="pandas")
        .groupby(id_col)
        .aggregate(Sum("n_chunks", alias_name="n_chunks"),
                   Sum("n_dup_chunks", alias_name="n_dup_chunks"))
    )
