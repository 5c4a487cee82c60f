"""Corpus-curation operators a training-data pipeline runs between
dedup and export: benchmark decontamination, repetition/diversity
signals, deterministic stratified sampling, corpus-wide heavy hitters,
and the exact embedding-pair verify kernel.

Scale shape shared by all of them: vectorized per-batch kernels in
``map_batches`` (numpy over exploded token arrays — no per-row Python
in the hot loop beyond the tokenizer regex), small sides broadcast
once via ``ray.put`` (the benchmark shingle set, the normalized
embedding matrix), and at most ONE small groupby/sort for the wide
step. Every operator here is DuckDB-twinned in ``__ray_entry__`` —
the exact-kernel counterpart of the LSH/ANN approximations lives
next to them in dedup.py / similarity.py.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from .hashing import SHINGLE_K, shingle_hashes, tokens_of

from ..engine.rayfix import apply as _apply_rayfix

_apply_rayfix()  # schema-broadcast fix for native hash-shuffle joins

__all__ = [
    "embedding_cosine_pairs_exact",
    "embedding_pairs_verify",
    "decontaminate",
    "repetition_signals",
    "stratified_sample",
    "top_k_per_group",
    "heavy_hitters",
    "pack_shards",
    "doc_chunks",
    "write_packed_shards",
    "write_jsonl_shards",
    "read_jsonl_manifest",
    "write_csv_shards",
    "read_csv_manifest",
    "ngram_novelty",
    "ngram_novelty_shuffled",
    "tf_df_scores",
    "inverted_index",
    "top_bigrams",
    "partitioned_write_pruned_read",
    "adjacent_edit_distances",
    "train_val_test_split",
    "sentence_stats",
    "snapshot_diff",
    "apply_changes",
    "write_text_shards",
    "read_text_manifest",
    "dsir_weights",
    "doc_similarity_tfidf",
    "bpe_merge_candidates",
    "mixture_weights",
    "unigram_surprisal",
    "phrase_search",
    "write_positional_index",
    "phrase_search_index",
]


# ---------------------------------------------------------- exact pairs
_EMPTY_COSINE_PAIRS = pa.table(
    {
        "vec_a": pa.array([], pa.int64()),
        "vec_b": pa.array([], pa.int64()),
        "cosine": pa.array([], pa.float64()),
    }
)


def _unit_matrix_of(col) -> np.ndarray:
    """list<float> column -> row-normalized (n, d) float64 matrix via
    the flat values buffer (no per-row Python)."""
    from .similarity import _as_matrix

    E = _as_matrix(col)
    return E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-30)


@ray.remote
def _assemble_unit_matrix(id_col: str, vec_col: str, *tabs):
    """Build the (sorted ids, unit matrix) broadcast INSIDE a task so
    the corpus matrix lives only in the object store (spillable), never
    in the driver's Python heap."""
    tabs = [t for t in tabs if t.num_columns and t.num_rows]
    if not tabs:
        return (np.array([], dtype=np.int64), np.empty((0, 0)))
    full = pa.concat_tables([t.select([id_col, vec_col]) for t in tabs])
    ids_all = full[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    En = _unit_matrix_of(full[vec_col])
    order = np.argsort(ids_all)
    return (ids_all[order], En[order])


def embedding_cosine_pairs_exact(ds, threshold: float, vec_col="embedding",
                                 id_col="vec_id",
                                 max_broadcast_bytes: int = 256 << 20):
    """ALL pairs (a < b) with cosine >= threshold — the exact
    brute-force baseline the LSH operator (dedup.embedding_dup_pairs)
    approximates, and the oracle for its recall tests.

    Distributed shape: the normalized matrix is assembled in a TASK
    (the driver heap never holds the corpus — round-4 finding) and
    every batch reads the same object-store copy (never re-shipped);
    each batch computes one (batch x corpus) float64 matmul and emits
    only the above-threshold (a, b) id pairs, so the full n^2
    similarity matrix never exists anywhere. O(n^2/p) flops per task
    is the honest cost of exactness, and the broadcast matrix is
    corpus-sized — so past ``max_broadcast_bytes`` this RAISES with a
    pointer to the scale paths: corpus-wide near-dup belongs to
    ``embedding_dup_pairs`` (LSH + in-bucket exact verify), and
    exact verification of ITS candidates to
    :func:`embedding_pairs_verify` (bounded by candidate docs)."""
    import ray.data as rd

    mat = ds.select_columns([id_col, vec_col]).materialize()
    n = mat.count()
    if n == 0:
        return rd.from_arrow(_EMPTY_COSINE_PAIRS)
    d = len(mat.take(1)[0][vec_col])
    need = n * (d * 8 + 8)
    if need > max_broadcast_bytes:
        raise ValueError(
            f"embedding_cosine_pairs_exact: corpus matrix ~{need >> 20} MiB "
            f"({n} x {d}) exceeds max_broadcast_bytes — brute force is the "
            "conformance oracle only; at corpus scale use "
            "embedding_dup_pairs (LSH + in-bucket exact verify) or verify "
            "its candidates with embedding_pairs_verify"
        )
    ref = _assemble_unit_matrix.remote(id_col, vec_col, *mat.to_arrow_refs())

    def batch_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EMPTY_COSINE_PAIRS
        ids_ref, mat_ref = ray.get(ref)
        ids_b = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        Vn = _unit_matrix_of(t[vec_col])
        sim = Vn @ mat_ref.T
        # emit only a < b: each unordered pair is produced by exactly
        # one batch row (the smaller id), independent of blocking
        mask = (sim >= threshold) & (ids_b[:, None] < ids_ref[None, :])
        bi, rj = np.nonzero(mask)
        return pa.table(
            {
                "vec_a": pa.array(ids_b[bi], pa.int64()),
                "vec_b": pa.array(ids_ref[rj], pa.int64()),
                "cosine": pa.array(sim[bi, rj], pa.float64()),
            }
        )

    out = ds.map_batches(batch_pairs, batch_format="pyarrow").materialize()
    if out.count() == 0:
        return rd.from_arrow(_EMPTY_COSINE_PAIRS)
    return out


def embedding_pairs_verify(ds, cand, threshold: float, vec_col="embedding",
                           id_col="vec_id",
                           max_broadcast_bytes: int = 256 << 20):
    """EXACT cosine verification of CANDIDATE pairs — the corpus-scale
    companion to :func:`embedding_cosine_pairs_exact`: instead of
    broadcasting the whole corpus matrix, gather only the vectors of
    docs that appear in some candidate pair (bounded by candidates,
    not corpus — the minhash signature-broadcast pattern, hard gate +
    raise past the budget) and score each pair with one vectorized
    gather-dot pass over the candidate dataset. Feeding it
    ``embedding_dup_pairs(..., threshold=-1)`` output (all in-bucket
    pairs) yields the LSH-candidate exact-verify pipeline whose output
    equals brute force whenever the LSH tables reach the pair (recall
    pinned in tests). Returns (vec_a, vec_b, cosine >= threshold),
    a < b, deduplicated."""
    import ray.data as rd

    names = cand.schema().names
    if "doc_a" in names:  # the dedup-family pair frame naming
        cand = cand.map_batches(
            lambda t: pa.table({"vec_a": t["doc_a"], "vec_b": t["doc_b"]}),
            batch_format="pyarrow",
        )
    cand = cand.select_columns(["vec_a", "vec_b"]).materialize()
    if cand.count() == 0:
        return rd.from_arrow(_EMPTY_COSINE_PAIRS)
    cand_tbl = pa.concat_tables(
        [t for t in ray.get(cand.to_arrow_refs()) if t.num_columns and t.num_rows]
    )
    a = cand_tbl["vec_a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = cand_tbl["vec_b"].to_numpy(zero_copy_only=False).astype(np.int64)
    needed = np.unique(np.concatenate([a, b]))
    d = len(ds.take(1)[0][vec_col])
    need_bytes = len(needed) * (d * 8 + 8)
    if need_bytes > max_broadcast_bytes:
        raise ValueError(
            f"embedding_pairs_verify: candidate-doc matrix ~"
            f"{need_bytes >> 20} MiB ({len(needed)} docs x {d}) exceeds "
            "max_broadcast_bytes — shard the candidate set (verify per "
            "LSH bucket / pair partition) and union the results"
        )
    nref = ray.put(needed)

    def keep_needed(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(np.isin(ids, ray.get(nref))))

    gathered = (
        ds.select_columns([id_col, vec_col])
        .map_batches(keep_needed, batch_format="pyarrow")
        .materialize()
    )
    ref = _assemble_unit_matrix.remote(
        id_col, vec_col, *gathered.to_arrow_refs()
    )

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EMPTY_COSINE_PAIRS
        ids_s, En = ray.get(ref)
        va = t["vec_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        vb = t["vec_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo, hi = np.minimum(va, vb), np.maximum(va, vb)
        pa_i = np.searchsorted(ids_s, lo)
        pb_i = np.searchsorted(ids_s, hi)
        # candidates referencing ids absent from ds are dropped (the
        # hit-check pattern), as are self-pairs
        ok = (
            (pa_i < len(ids_s)) & (pb_i < len(ids_s)) & (lo != hi)
        )
        ok &= (ids_s[np.minimum(pa_i, len(ids_s) - 1)] == lo)
        ok &= (ids_s[np.minimum(pb_i, len(ids_s) - 1)] == hi)
        lo, hi, pa_i, pb_i = lo[ok], hi[ok], pa_i[ok], pb_i[ok]
        cos = np.einsum("ij,ij->i", En[pa_i], En[pb_i])
        keep = cos >= threshold
        return pa.table(
            {
                "vec_a": pa.array(lo[keep], pa.int64()),
                "vec_b": pa.array(hi[keep], pa.int64()),
                "cosine": pa.array(cos[keep], pa.float64()),
            }
        )

    out = cand.map_batches(verify, batch_format="pyarrow")
    # dedup: a candidate pair can arrive from several buckets/tables
    # (the cosine is identical for every copy, Max is just the reducer)
    from ray.data.aggregate import Max

    return (
        out.groupby(["vec_a", "vec_b"])
        .aggregate(Max("cosine", alias_name="cosine"))
    )


# ------------------------------------------------------- decontamination
def decontaminate(
    docs,
    bench_ids: list[int],
    text_col="text",
    id_col="doc_id",
    k: int = SHINGLE_K,
):
    """Benchmark decontamination: flag corpus documents sharing >= 1
    k-token shingle with any benchmark document (the held-out set a
    trained model will be evaluated on). Returns (doc_id, n_overlap)
    for contaminated non-benchmark docs, n_overlap = DISTINCT shared
    shingles.

    Scale shape: the benchmark side is small by definition — its
    deduplicated shingle-hash array (8 B/shingle) is built once,
    sorted, ``ray.put`` ONCE, and probed per batch with searchsorted;
    the corpus streams through one stateless map_batches. Shingle
    hashing is the same uint64 kernel the MinHash family uses
    (hashing.py:44-66); a 64-bit collision inflating n_overlap is
    ~1e-13 per doc at these sizes.
    """
    import ray.data as rd

    bench_arr = np.asarray(sorted(bench_ids), dtype=np.int64)

    def bench_filter(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
        return t.filter(pa.array(np.isin(ids, bench_arr)))

    bench_tbl = (
        docs.select_columns([id_col, text_col])
        .map_batches(bench_filter, batch_format="pyarrow")
        .take_all()
    )  # small side: len(bench_ids) rows
    sh = [shingle_hashes(r[text_col], k) for r in bench_tbl]
    bench_sh = np.unique(np.concatenate(sh)) if sh else np.array([], dtype=np.uint64)
    ref = ray.put(bench_sh)

    def scan(t: pa.Table) -> pa.Table:
        bs = ray.get(ref)
        ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
        out_id, out_n = [], []
        for i, text in zip(ids, t[text_col].to_pylist()):
            if i in bench_arr:  # len(bench_arr) is tiny; fine per row
                continue
            u = np.unique(shingle_hashes(text, k))
            pos = np.searchsorted(bs, u)
            pos[pos == len(bs)] = 0
            n = int((bs[pos] == u).sum()) if len(bs) else 0
            if n > 0:
                out_id.append(int(i))
                out_n.append(n)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "n_overlap": pa.array(out_n, pa.int64()),
            }
        )

    out = docs.select_columns([id_col, text_col]).map_batches(
        scan, batch_format="pyarrow"
    ).materialize()
    if out.count() == 0:
        return rd.from_arrow(
            pa.table(
                {"doc_id": pa.array([], pa.int64()), "n_overlap": pa.array([], pa.int64())}
            )
        )
    return out


# --------------------------------------------------- repetition signals
def repetition_signals(docs, text_col="text", id_col="doc_id"):
    """Gopher-style repetition/diversity signals per document:
    n_tokens, n_distinct, distinct_ratio, top_token_frac (most frequent
    token's share). Docs with zero tokens are dropped (they have no
    defined ratios — and the SQL twin's unnest drops them identically).

    Vectorized per batch: ONE np.unique over (row, token-code) pairs
    for the whole batch — no per-document Counter loop. Each ratio is
    a single IEEE division of exact ints, so the distributed result is
    bit-identical to the DuckDB twin.
    """

    def fn(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
        toks_per_row = [tokens_of(x) for x in texts]
        lens = np.array([len(tk) for tk in toks_per_row], dtype=np.int64)
        keep = lens > 0
        flat = [tok for tk in toks_per_row for tok in tk]
        n_distinct = np.zeros(len(texts), dtype=np.int64)
        top = np.zeros(len(texts), dtype=np.int64)
        if flat:
            # token string -> int code, then one unique over (row, code)
            codes = pd.factorize(np.asarray(flat, dtype=object))[0].astype(np.int64)
            base = np.int64(codes.max() + 1)
            rows = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
            uniq_pair, counts = np.unique(rows * base + codes, return_counts=True)
            uniq_rows = uniq_pair // base
            n_distinct = np.bincount(uniq_rows, minlength=len(texts)).astype(np.int64)
            np.maximum.at(top, uniq_rows, counts)
        n_tok = lens[keep].astype(np.float64)
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "n_tokens": pa.array(lens[keep], pa.int64()),
                "n_distinct": pa.array(n_distinct[keep], pa.int64()),
                "distinct_ratio": pa.array(n_distinct[keep] / n_tok, pa.float64()),
                "top_token_frac": pa.array(top[keep] / n_tok, pa.float64()),
            }
        )

    return docs.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow"
    )


# --------------------------------------------------- stratified sampling
def stratified_sample(docs, k: int, by="lang", text_col="text", id_col="doc_id"):
    """Deterministic per-stratum sample: the k documents per ``by``
    value with the smallest (md5(text), doc_id) — reproducible across
    runs, block layouts and cluster sizes, unlike random_sample.

    Scale shape: each batch keeps only its LOCAL top-k per stratum
    (so the shuffle moves <= k * strata_per_batch rows, not the
    corpus), then one groupby(by).map_groups takes the global top-k.
    Strata counts are small (languages); hot-stratum skew is bounded
    by the per-batch pre-prune.
    """

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                id_col: t[id_col].to_pandas(),
                by: t[by].to_pandas(),
                "_h": [
                    hashlib.md5(x.encode("utf-8")).hexdigest()
                    for x in t[text_col].to_pylist()
                ],
            }
        )
        df = df.sort_values(["_h", id_col]).groupby(by, sort=False).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["_h", id_col]).head(k)
        return g[[by, id_col]]

    return (
        docs.select_columns([id_col, by, text_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(by)
        .map_groups(final, batch_format="pandas")
    )


# ------------------------------------------------------ group-wise top-k
def top_k_per_group(ds, by: str, score_col: str, k: int, id_col: str,
                    descending: bool = True):
    """The k rows per ``by`` group with the best ``score_col``
    (descending by default), ties broken by ascending ``id_col`` —
    fully deterministic, the curation primitive behind "keep the k
    highest-quality documents per domain/language".

    Scale shape (same as stratified_sample): each batch first keeps
    only its LOCAL top-k per group, so the one groupby shuffle moves
    <= k * groups_per_batch rows instead of the corpus; the final
    per-group take is a vectorized sort+head. Hot-group skew is
    bounded by the pre-prune: a group's shuffle share is k per input
    block no matter how many rows it has.
    """
    cols = [by, score_col, id_col]
    asc = [not descending, True]

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(cols).to_pandas()
        df = (
            df.sort_values([score_col, id_col], ascending=asc, kind="mergesort")
            .groupby(by, sort=False)
            .head(k)
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([score_col, id_col], ascending=asc, kind="mergesort")
        return g.head(k)[cols]

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(by)
        .map_groups(final, batch_format="pandas")
    )


# ------------------------------------------------------- doc chunking
def doc_chunks(docs, chunk_tokens: int = 64, text_col="text", id_col="doc_id"):
    """Split every document into fixed-token-window chunks — the
    context-length packing prep step before tokenized export. Tokens
    are whitespace runs over the trimmed text (``re.split(r'\\s+')``,
    the SQL-reproducible tokenizer); each chunk is identified by
    (doc_id, chunk_id) and carried as (n_tokens, md5-of-chunk-text)
    so the exploded table ships 48 B/chunk instead of re-shipping
    text. Purely per-document => embarrassingly parallel map_batches,
    no shuffle; string-bound per-batch body like the shingle stages
    (the regex is compiled once per process). Empty documents yield
    one empty-string chunk (matches DuckDB's regexp_split_to_array).
    """
    import re

    ws = re.compile(r"\s+")

    def explode(t: pa.Table) -> pa.Table:
        ids, cids, ntoks, md5s = [], [], [], []
        for did, txt in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            toks = ws.split(txt.strip())
            for i in range(0, len(toks), chunk_tokens):
                chunk = toks[i : i + chunk_tokens]
                ids.append(did)
                cids.append(i // chunk_tokens)
                ntoks.append(len(chunk))
                md5s.append(hashlib.md5(" ".join(chunk).encode()).hexdigest())
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "chunk_id": pa.array(cids, pa.int64()),
                "n_tokens": pa.array(ntoks, pa.int64()),
                "chunk_md5": pa.array(md5s, pa.string()),
            }
        )

    return docs.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow"
    )


# --------------------------------------------------------- shard packing
def pack_shards(docs, n_shards: int = 16, text_col="text", id_col="doc_id"):
    """Deterministic training-export sharding: assign each document to
    a shard (md5 first hex char mod n_shards) and compute its TOKEN
    OFFSET within the shard under the shard's canonical (md5, doc_id)
    order — the layout a packed-dataset writer needs to emit
    fixed-token-budget files resumably (re-running yields identical
    shard/offset for every doc, so finished shards can be skipped).

    Scale shape: shard assignment and token counts are stateless
    map_batches; the one shuffle is groupby(shard) with a vectorized
    cumulative sum per group. n_shards bounds the group size — at
    corpus scale you size n_shards so a shard's (id, n_tokens) pairs
    fit a task (the TEXT never moves: only ids, hashes and counts
    cross the shuffle).

    Capped at 16 distinct shard values by the single-hex-char hash
    (n_shards > 16 leaves shards 16.. empty) — enough for the export
    layout the conformance tests pin; a production corpus would take
    more md5 chars.
    """

    def assign(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        hs = [hashlib.md5(x.encode("utf-8")).hexdigest() for x in texts]
        return pa.table(
            {
                id_col: t[id_col],
                "h": pa.array(hs, pa.string()),
                "shard": pa.array(
                    [int(h[0], 16) % n_shards for h in hs], pa.int64()
                ),
                "n_tokens": pa.array(
                    [len(tokens_of(x)) for x in texts], pa.int64()
                ),
            }
        )

    def offsets(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", id_col])
        off = g["n_tokens"].cumsum() - g["n_tokens"]
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                "shard": g["shard"].to_numpy(),
                "token_offset": off.to_numpy().astype(np.int64),
            }
        )

    return (
        docs.select_columns([id_col, text_col])
        .map_batches(assign, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(offsets, batch_format="pandas")
    )


# ----------------------------------------------------- resumable export
def write_packed_shards(
    docs, out_dir: str, n_shards: int = 16, text_col="text", id_col="doc_id"
):
    """Materialize the ``pack_shards`` layout as PARTITIONED parquet —
    one ``out_dir/shard=NN/data.parquet`` per shard, rows in the
    shard's canonical (md5, doc_id) order with their token offsets —
    and return the per-shard manifest (shard, n_docs, n_tokens).

    RESUMABLE: a shard whose file already exists is skipped (the
    layout is deterministic, so the existing file is byte-correct);
    writes go through a ``.tmp`` + rename so a task killed mid-write
    never leaves a file that a resume would wrongly skip. At cluster
    scale ``out_dir`` is shared storage (the same contract
    ``write_parquet`` assumes); the one shuffle is groupby(shard) and
    this time the TEXT rides it — that is the export itself, there is
    no smaller payload that could move.
    """
    import os

    import pyarrow.parquet as pq

    def assign(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        hs = [hashlib.md5(x.encode("utf-8")).hexdigest() for x in texts]
        return pa.table(
            {
                id_col: t[id_col],
                text_col: t[text_col],
                "h": pa.array(hs, pa.string()),
                "shard": pa.array(
                    [int(h[0], 16) % n_shards for h in hs], pa.int64()
                ),
                "n_tokens": pa.array(
                    [len(tokens_of(x)) for x in texts], pa.int64()
                ),
            }
        )

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        shard = int(g["shard"].iloc[0])
        g = g.sort_values(["h", id_col])
        off = (g["n_tokens"].cumsum() - g["n_tokens"]).to_numpy().astype(np.int64)
        part_dir = os.path.join(out_dir, f"shard={shard:02d}")
        path = os.path.join(part_dir, "data.parquet")
        if not os.path.exists(path):
            os.makedirs(part_dir, exist_ok=True)
            tbl = pa.table(
                {
                    id_col: pa.array(g[id_col].to_numpy(), pa.int64()),
                    "token_offset": pa.array(off, pa.int64()),
                    "n_tokens": pa.array(
                        g["n_tokens"].to_numpy().astype(np.int64), pa.int64()
                    ),
                    text_col: pa.array(list(g[text_col]), pa.string()),
                }
            )
            tmp = path + ".tmp"
            pq.write_table(tbl, tmp)
            os.rename(tmp, path)
        return pd.DataFrame(
            {
                "shard": [shard],
                "n_docs": [len(g)],
                "n_tokens": [int(g["n_tokens"].sum())],
            }
        )

    return (
        docs.select_columns([id_col, text_col])
        .map_batches(assign, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(write_group, batch_format="pandas")
    )


def write_jsonl_shards(docs, out_dir: str, n_shards: int = 16,
                       text_col="text", id_col="doc_id"):
    """JSONL training-export sink with the same deterministic,
    RESUMABLE layout as :func:`write_packed_shards` — one
    ``out_dir/shard-NN.jsonl`` per md5-bucket shard, docs in the
    shard's canonical (md5, doc_id) order, skip-existing +
    tmp+rename atomicity — JSONL being the lingua-franca format LLM
    data pipelines exchange. Returns the per-shard manifest
    (shard, n_docs, n_chars)."""
    import json
    import os

    def assign(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        hs = [hashlib.md5(x.encode("utf-8")).hexdigest() for x in texts]
        return pa.table(
            {
                id_col: t[id_col],
                text_col: t[text_col],
                "h": pa.array(hs, pa.string()),
                "shard": pa.array(
                    [int(h[0], 16) % n_shards for h in hs], pa.int64()
                ),
            }
        )

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        shard = int(g["shard"].iloc[0])
        g = g.sort_values(["h", id_col])
        path = os.path.join(out_dir, f"shard-{shard:02d}.jsonl")
        if not os.path.exists(path):
            os.makedirs(out_dir, exist_ok=True)
            tmp = path + ".tmp"
            with open(tmp, "w", encoding="utf-8") as f:
                for did, txt in zip(g[id_col], g[text_col]):
                    f.write(json.dumps(
                        {id_col: int(did), text_col: txt},
                        ensure_ascii=False) + "\n")
            os.rename(tmp, path)
        return pd.DataFrame(
            {
                "shard": [shard],
                "n_docs": [len(g)],
                "n_chars": [int(sum(len(x) for x in g[text_col]))],
            }
        )

    return (
        docs.select_columns([id_col, text_col])
        .map_batches(assign, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(write_group, batch_format="pandas")
    )


def read_jsonl_manifest(in_dir: str, id_col="doc_id", text_col="text"):
    """JSONL source: read a ``write_jsonl_shards`` directory back as a
    Dataset (``ray.data.read_json`` — one task per shard file, the
    streaming-source shape) and reduce to the same per-shard manifest
    the writer returned, recomputing n_chars from the ROUND-TRIPPED
    text. Comparing this against the writer's manifest (or an oracle
    over the original table) certifies byte fidelity of the sink AND
    the source."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_json(
        in_dir, file_extensions=["jsonl"], include_paths=True
    )

    def prep(t: pa.Table) -> pa.Table:
        import re as _re

        shards = [
            int(_re.search(r"shard-(\d+)\.jsonl$", p).group(1))
            for p in t["path"].to_pylist()
        ]
        return pa.table(
            {
                "shard": pa.array(shards, pa.int64()),
                "n_chars": pa.array(
                    [len(x) for x in t[text_col].to_pylist()], pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("shard")
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="n_chars"))
    )


def write_csv_shards(docs, out_dir: str, n_shards: int = 16,
                     text_col="text", id_col="doc_id"):
    """CSV sibling of :func:`write_jsonl_shards` — same deterministic
    md5-bucket layout, canonical order, skip-existing + tmp+rename
    resume; one ``shard-NN.csv`` per shard with a header row and
    minimal quoting. Returns the same (shard, n_docs, n_chars)
    manifest."""
    import csv
    import os

    def assign(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        hs = [hashlib.md5(x.encode("utf-8")).hexdigest() for x in texts]
        return pa.table(
            {
                id_col: t[id_col],
                text_col: t[text_col],
                "h": pa.array(hs, pa.string()),
                "shard": pa.array(
                    [int(h[0], 16) % n_shards for h in hs], pa.int64()
                ),
            }
        )

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        shard = int(g["shard"].iloc[0])
        g = g.sort_values(["h", id_col])
        path = os.path.join(out_dir, f"shard-{shard:02d}.csv")
        if not os.path.exists(path):
            os.makedirs(out_dir, exist_ok=True)
            tmp = path + ".tmp"
            with open(tmp, "w", encoding="utf-8", newline="") as f:
                w = csv.writer(f)
                w.writerow([id_col, text_col])
                for did, txt in zip(g[id_col], g[text_col]):
                    w.writerow([int(did), txt])
            os.rename(tmp, path)
        return pd.DataFrame(
            {
                "shard": [shard],
                "n_docs": [len(g)],
                "n_chars": [int(sum(len(x) for x in g[text_col]))],
            }
        )

    return (
        docs.select_columns([id_col, text_col])
        .map_batches(assign, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(write_group, batch_format="pandas")
    )


def read_csv_manifest(in_dir: str, id_col="doc_id", text_col="text"):
    """CSV source: read a ``write_csv_shards`` directory back
    (``ray.data.read_csv`` — one task per shard file) and reduce to
    the writer's manifest, n_chars recomputed from the round-tripped
    text (the same fidelity certificate as the JSONL pair)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_csv(in_dir, file_extensions=["csv"], include_paths=True)

    def prep(t: pa.Table) -> pa.Table:
        import re as _re

        shards = [
            int(_re.search(r"shard-(\d+)\.csv$", p).group(1))
            for p in t["path"].to_pylist()
        ]
        return pa.table(
            {
                "shard": pa.array(shards, pa.int64()),
                "n_chars": pa.array(
                    [len(x) for x in t[text_col].to_pylist()], pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("shard")
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="n_chars"))
    )


# ------------------------------------------------------- n-gram novelty
def ngram_novelty(docs, k: int = SHINGLE_K, text_col="text", id_col="doc_id"):
    """Cross-document repetition signal: per document, how many of its
    DISTINCT k-token shingles also occur in at least one OTHER
    document — (doc_id, n_shingles, n_shared, shared_frac). High
    shared_frac marks boilerplate/templated docs that per-doc
    repetition signals (repetition_signals) cannot see; it is the
    corpus-self-referential sibling of ``decontaminate``.

    Scale shape: pass 1 explodes per-doc DISTINCT shingle hashes and
    pre-counts per batch, so the one groupby moves (hash, partial
    count) rows, never the token stream; the shingles seen in >= 2
    docs come back as ONE sorted uint64 array, ``ray.put`` once, and
    pass 2 probes it with a single searchsorted per batch. The shared
    set is small on a deduplicated corpus (run AFTER exact/near dedup
    — the intended order); its size is logged so a boilerplate-heavy
    corpus that bloats it is visible, not silent.
    """
    from ray.data.aggregate import Sum

    def explode(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
        per_doc = [np.unique(shingle_hashes(x, k)) for x in t[text_col].to_pylist()]
        if per_doc:
            h = np.concatenate(per_doc)
            # pre-aggregate within the batch: each row is already
            # distinct per doc, so the partial count of a hash here is
            # its distinct-doc count within this batch
            u, c = np.unique(h, return_counts=True)
        else:
            u = np.array([], dtype=np.uint64)
            c = np.array([], dtype=np.int64)
        # int64 bit view — uint64 >= 2^63 trips Ray's shuffle-side
        # Arrow conversion and pickles the block (equality-only use)
        return pa.table(
            {
                "h": pa.array(u.view(np.int64), pa.int64()),
                "nd": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    counts = (
        docs.select_columns([id_col, text_col])
        .map_batches(explode, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("nd", alias_name="nd"))
    )

    def keep_shared(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t["nd"], 2)).select(["h"])

    shared_tbl = counts.map_batches(keep_shared, batch_format="pyarrow").take_all()
    shared = np.sort(
        np.asarray([r["h"] for r in shared_tbl], dtype=np.int64)
    )
    import logging

    logging.getLogger(__name__).info(
        "ngram_novelty: %d shingles shared by >=2 docs", len(shared)
    )
    ref = ray.put(shared)

    def score(t: pa.Table) -> pa.Table:
        sh = ray.get(ref)
        ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
        per_doc = [np.unique(shingle_hashes(x, k)) for x in t[text_col].to_pylist()]
        n = np.array([len(u) for u in per_doc], dtype=np.int64)
        if per_doc and len(sh):
            flat = np.concatenate(per_doc).view(np.int64)  # shared is int64 bits
            pos = np.searchsorted(sh, flat)
            pos[pos == len(sh)] = 0
            hit = (sh[pos] == flat).astype(np.int64)
            bounds = np.concatenate([[0], np.cumsum(n)])
            ns = np.add.reduceat(hit, bounds[:-1]) if len(flat) else np.zeros(
                len(per_doc), dtype=np.int64
            )
        else:
            ns = np.zeros(len(per_doc), dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_shingles": pa.array(n, pa.int64()),
                "n_shared": pa.array(ns.astype(np.int64), pa.int64()),
                "shared_frac": pa.array(
                    ns / n.astype(np.float64), pa.float64()
                ),
            }
        )

    return docs.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow"
    )


def ngram_novelty_shuffled(docs, k: int = SHINGLE_K, text_col="text",
                           id_col="doc_id", num_partitions: int | None = None):
    """``ngram_novelty`` for boilerplate-heavy corpora where the
    shared-shingle set is too large to broadcast: the (doc_id, shingle
    hash) stream is hash-joined (Ray's native shuffle ``Dataset.join``)
    to the >=2-doc shingle set instead — nothing corpus-scale ever
    reaches the driver or a single task. Three exchanges total
    (count-per-hash, rows⋈shared, count-per-doc), each partitioned by
    ``num_partitions`` (size ~4x cluster CPUs at scale). Same output
    as ``ngram_novelty``; equality is pinned in pytest and both modes
    share the SQL twin.
    """

    def explode_pairs(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
        per_doc = [np.unique(shingle_hashes(x, k)) for x in t[text_col].to_pylist()]
        n = np.array([len(u) for u in per_doc], dtype=np.int64)
        h = np.concatenate(per_doc) if per_doc else np.array([], dtype=np.uint64)
        # int64 view: the native hash join mangles uint64 key columns
        # (one side arrives as a pickled-object extension type)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, n), pa.int64()),
                "h": pa.array(h.view(np.int64), pa.int64()),
            }
        )

    base = docs.select_columns([id_col, text_col])
    rows = base.map_batches(explode_pairs, batch_format="pyarrow")

    def keep_shared(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t["count()"], 2)).select(["h"])

    shared = rows.groupby("h").count().map_batches(
        keep_shared, batch_format="pyarrow"
    )
    n_shared = (
        rows.join(shared, join_type="inner", num_partitions=num_partitions,
                  on=("h",))
        .groupby("doc_id")
        .count()
    )

    def totals(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
        n = np.array(
            [len(np.unique(shingle_hashes(x, k))) for x in t[text_col].to_pylist()],
            dtype=np.int64,
        )
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "n_shingles": pa.array(n, pa.int64())}
        )

    out = base.map_batches(totals, batch_format="pyarrow").join(
        n_shared,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("doc_id",),
    )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ns = pc.cast(pc.coalesce(t["count()"], pa.scalar(0)), pa.int64())
        n = t["n_shingles"]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_shingles": n,
                "n_shared": ns,
                "shared_frac": pc.divide(
                    pc.cast(ns, pa.float64()), pc.cast(n, pa.float64())
                ),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


# ------------------------------------------------------------- tf / df
def tf_df_scores(docs, text_col="text", id_col="doc_id",
                 max_broadcast_bytes: int = 256 << 20,
                 num_partitions: int | None = None):
    """Per (document, distinct token): term frequency ``tf``, corpus
    document frequency ``df``, and ``tfidf_ppm = (tf * 1e6) // df`` —
    a rational-exact integer relevance score (monotone in tf/df, so
    rankings match a log-idf variant per fixed tf) chosen over
    float idf so distributed results are bit-reproducible and
    SQL-certifiable (cf. the fixed-point windowed sums).

    Scale shape (the ngram_novelty pattern): pass 1 pre-counts each
    token hash's distinct-doc count per batch, so the one groupby
    moves (hash, partial df) rows, never the token stream; the df
    table comes back as sorted uint64 + int64 arrays, ``ray.put``
    once, and pass 2 re-derives per-doc tf locally and probes df with
    one searchsorted per batch. The broadcast is gated at
    ``max_broadcast_bytes`` (vocab rows x 16 B); past it the df table
    stays a distributed dataset and attaches by one hash join on the
    token hash (both paths pinned equal in pytest). Token identity in
    the df table is the 64-bit blake2b hash: a collision would merge
    two tokens' dfs (birthday-bounded, ~2.7e-3 at 1e8 vocab) —
    deterministic, never silent row loss.
    """
    from ray.data.aggregate import Sum

    from .hashing import _token_hash

    def _tok_frame(t: pa.Table) -> pd.DataFrame:
        ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
        per_doc = [tokens_of(x) for x in t[text_col].to_pylist()]
        lens = np.array([len(p) for p in per_doc], dtype=np.int64)
        flat: list[str] = [tok for p in per_doc for tok in p]
        return pd.DataFrame({"i": np.repeat(ids, lens), "tok": flat})

    def df_partial(t: pa.Table) -> pa.Table:
        d = _tok_frame(t).drop_duplicates()
        codes, uniq = pd.factorize(d["tok"].to_numpy(), sort=False)
        hu = np.fromiter(
            (_token_hash(s) for s in uniq), dtype=np.uint64, count=len(uniq)
        )
        u, c = np.unique(hu[codes], return_counts=True)
        # int64 bit view (see ngram_novelty) — equality-only use
        return pa.table(
            {"h": pa.array(u.view(np.int64), pa.int64()),
             "nd": pa.array(c.astype(np.int64))}
        )

    df_ds = (
        docs.select_columns([id_col, text_col])
        .map_batches(df_partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("nd", alias_name="df"))
        .materialize()  # vocab-bounded; counted for the gate + reused
    )

    if df_ds.count() * 16 > max_broadcast_bytes:
        # join path: the df table stays distributed — per-doc
        # (doc_id, token, tf, h) rows inner-join it on the token hash.
        # The inner join can only drop a row if the two tokenizer
        # passes disagree, the exact condition the broadcast path's
        # missing-hash raise guards (deterministic tokenizer => never).
        if num_partitions is None:
            from .joins import default_join_partitions

            num_partitions = default_join_partitions()

        def explode(t: pa.Table) -> pa.Table:
            d = _tok_frame(t)
            g = d.groupby(["i", "tok"], sort=False).size()
            idx = g.index
            doc_ids = idx.get_level_values(0).to_numpy().astype(np.int64)
            toks = idx.get_level_values(1).to_numpy()
            tf = g.to_numpy().astype(np.int64)
            codes, uniq = pd.factorize(toks, sort=False)
            hu = np.fromiter(
                (_token_hash(s) for s in uniq), dtype=np.uint64,
                count=len(uniq),
            )
            return pa.table({
                "doc_id": pa.array(doc_ids, pa.int64()),
                "token": pa.array(toks, pa.string()),
                "tf": pa.array(tf, pa.int64()),
                "h": pa.array(hu[codes].view(np.int64), pa.int64()),
            })

        def project(t: pa.Table) -> pa.Table:
            tf = t["tf"].to_numpy(zero_copy_only=False)
            dfv = t["df"].to_numpy(zero_copy_only=False)
            return pa.table({
                "doc_id": t["doc_id"],
                "token": t["token"],
                "tf": t["tf"],
                "df": pa.array(dfv.astype(np.int64), pa.int64()),
                "tfidf_ppm": pa.array((tf * 1_000_000) // dfv, pa.int64()),
            })

        return (
            docs.select_columns([id_col, text_col])
            .map_batches(explode, batch_format="pyarrow")
            .join(df_ds, join_type="inner", num_partitions=num_partitions,
                  on=("h",))
            .map_batches(project, batch_format="pyarrow")
        )

    df_tbl = df_ds.to_pandas()
    hs = df_tbl["h"].to_numpy().astype(np.int64)
    order = np.argsort(hs)
    h_sorted = hs[order]
    df_sorted = df_tbl["df"].to_numpy().astype(np.int64)[order]
    ref = ray.put((h_sorted, df_sorted))

    def score(t: pa.Table) -> pa.Table:
        sh, sdf = ray.get(ref)
        d = _tok_frame(t)
        g = d.groupby(["i", "tok"], sort=False).size()
        idx = g.index
        doc_ids = idx.get_level_values(0).to_numpy().astype(np.int64)
        toks = idx.get_level_values(1).to_numpy()
        tf = g.to_numpy().astype(np.int64)
        codes, uniq = pd.factorize(toks, sort=False)
        hu = np.fromiter(
            (_token_hash(s) for s in uniq), dtype=np.uint64, count=len(uniq)
        )
        h = hu[codes].view(np.int64)  # df table is int64 bits
        pos = np.searchsorted(sh, h)
        if len(h) and (
            (pos >= len(sh)).any() or not (sh[np.minimum(pos, len(sh) - 1)] == h).all()
        ):
            raise RuntimeError(
                "tf_df_scores: token hash missing from the df table — "
                "passes disagree (non-deterministic tokenizer?)"
            )
        dfv = sdf[pos] if len(h) else np.array([], dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "token": pa.array(toks, pa.string()),
                "tf": pa.array(tf, pa.int64()),
                "df": pa.array(dfv, pa.int64()),
                "tfidf_ppm": pa.array((tf * 1_000_000) // dfv, pa.int64())
                if len(h)
                else pa.array([], pa.int64()),
            }
        )

    return docs.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow"
    )


# ------------------------------------------------------- heavy hitters
def heavy_hitters(docs, k: int = 20, text_col="text"):
    """Corpus-wide top-k most frequent tokens (token, n), ties broken
    by token asc — the vocabulary head a tokenizer-training or
    stopword-mining pass needs.

    Scale shape: pre-aggregation INSIDE map_batches (one np.unique per
    batch -> at most |batch vocabulary| partial rows leave each task),
    then groupby(token).sum — the all-to-all moves per-batch partials,
    never the exploded token stream. The final sort runs on the
    aggregated vocabulary table, and only k rows reach the caller.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        toks = [tok for x in t[text_col].to_pylist() for tok in tokens_of(x)]
        if not toks:
            return pa.table(
                {"token": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        u, c = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        return pa.table(
            {
                "token": pa.array(u, pa.string()),
                "n": pa.array(c, pa.int64()),
            }
        )

    agg = (
        docs.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )

    # top-k with (n desc, token asc) tie-break; Ray's sort is ascending
    # per-key-list here, so sort on (-n, token) via a negated column
    def neg(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column("_neg_n", pc.multiply(t["n"], -1))

    return (
        agg.map_batches(neg, batch_format="pyarrow")
        .sort(["_neg_n", "token"])
        .limit(k)
        .drop_columns(["_neg_n"])
    )


def inverted_index(docs, df_min: int = 2, df_max: int = 1000,
                   text_col="text", id_col="doc_id"):
    """Token -> posting-list index build over the corpus: for every
    token whose document frequency lies in [df_min, df_max], the sorted
    doc-id posting list (comma-joined) plus df. The df band is how a
    real index bounds posting length (stopwords explode above df_max;
    hapaxes below df_min are retrieval noise).

    Scale shape: each batch emits its DISTINCT (token, doc_id) pairs
    via one np.unique over (token-code, doc-id) pairs — no per-row
    Python beyond the tokenizer regex — then ONE groupby(token) with a
    vectorized map_groups renders each posting. The df filter runs
    inside the group body, so oversized postings never leave their
    task. Partitioning assumption: one token's posting list fits one
    task (guaranteed by df_max).
    """
    from ray.data.aggregate import Count

    def pairs(t: pa.Table) -> pa.Table:
        toks, ids = [], []
        for did, x in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            for tok in set(tokens_of(x)):
                toks.append(tok)
                ids.append(did)
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                id_col: pa.array(ids, pa.int64()),
            }
        )

    def posting(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g[id_col].to_numpy())
        if not (df_min <= len(ids) <= df_max):
            return pd.DataFrame(
                {
                    "token": pd.Series([], dtype=str),
                    "df": pd.Series([], dtype="int64"),
                    "postings": pd.Series([], dtype=str),
                }
            )
        return pd.DataFrame(
            {
                "token": [g["token"].iloc[0]],
                "df": np.array([len(ids)], np.int64),
                "postings": [",".join(str(i) for i in ids)],
            }
        )

    return (
        docs.select_columns([id_col, text_col])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby("token")
        .map_groups(posting, batch_format="pandas")
    )


def proportional_sample(docs, budget: int = 200,
                        strata=("lang", "source"),
                        text_col="text", id_col="doc_id"):
    """Stratified downsampling with PROPORTIONAL allocation under a
    total budget: each (lang, source) stratum gets
    floor(budget * c_s / C) rows plus largest-remainder (Hamilton)
    rounding for the leftover — the exact-integer apportionment rule,
    so the allocation is deterministic and SQL-twinnable — then the
    md5-first rows of each stratum fill its quota (the repo's standard
    deterministic sampler). Unlike stratified_sample_lang's fixed
    per-group k, the quota follows stratum SIZE, which is what a
    fixed-token-budget training mix actually needs.

    Scale shape: ONE small groupby for stratum counts (strata
    cardinality rows to the driver — allocation is exact integer
    arithmetic there), the quota dict broadcast in the group bodies,
    and one groupby(strata) exchange whose vectorized body sorts its
    stratum by (md5, id) and heads its quota. Partitioning assumption:
    one stratum fits a task (the same contract as every grouped-rank
    operator here)."""
    import hashlib

    from ray.data.aggregate import Count

    strata = list(strata)
    counts = (
        docs.groupby(strata)
        .aggregate(Count(alias_name="c"))
        .to_pandas()
        .sort_values(strata)
        .reset_index(drop=True)
    )
    C = int(counts["c"].sum())
    if C == 0:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    **{k: pa.array([], pa.string()) for k in strata},
                    id_col: pa.array([], pa.int64()),
                }
            )
        )
    counts["base"] = (budget * counts["c"]) // C
    counts["rem"] = (budget * counts["c"]) % C
    leftover = budget - int(counts["base"].sum())
    # largest remainder first; ties by stratum key ascending
    order = counts.sort_values(
        ["rem"] + strata, ascending=[False] + [True] * len(strata)
    ).index.to_numpy()
    counts["extra"] = 0
    counts.loc[order[:leftover], "extra"] = 1
    alloc = {
        tuple(r[k] for k in strata): int(r["base"] + r["extra"])
        for _, r in counts.iterrows()
    }

    def take_quota(g: pd.DataFrame) -> pd.DataFrame:
        k = alloc.get(tuple(g[s].iloc[0] for s in strata), 0)
        if k <= 0:
            return g.iloc[0:0][strata + [id_col]]
        g = g.assign(
            _h=[hashlib.md5(x.encode()).hexdigest() for x in g[text_col]]
        )
        g = g.sort_values(["_h", id_col], kind="mergesort").head(k)
        return g[strata + [id_col]]

    return (
        docs.select_columns(strata + [id_col, text_col])
        .groupby(strata)
        .map_groups(take_quota, batch_format="pandas")
    )


def vocab_growth(docs, text_col="text", id_col="doc_id",
                 min_exp: int = 7):
    """Heaps-law vocabulary-growth curve: for prefix sizes N = 2^k
    (k >= min_exp, N < corpus tokens) plus the full corpus, the number
    of DISTINCT tokens among the first N token occurrences of the
    doc_id-ordered token stream — the curve that sizes tokenizer
    vocabularies and predicts novel-token rates on corpus growth.

    Distributed shape: the doc-offset pass is the corpus-wide
    exclusive prefix sum (windows.global_prefix_sum — per-block
    metadata to the driver, never corpus rows); each doc then emits
    (token, global first position) for its DISTINCT tokens
    (np.unique(return_index) — vectorized); ONE groupby(token).Min
    finds corpus-first positions; and the curve reduces through
    per-batch histogram partials over the ~30-row threshold grid (a
    bounded exchange — token rows never reach the driver). Returns
    (n_prefix, vocab)."""
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    from .hashing import tokens_of
    from .windows import global_prefix_sum

    def with_counts(t: pa.Table) -> pa.Table:
        ns = [len(tokens_of(x)) for x in t[text_col].to_pylist()]
        return pa.table(
            {
                id_col: t[id_col],
                text_col: t[text_col],
                "n_tokens": pa.array(ns, pa.int64()),
            }
        )

    based = docs.select_columns([id_col, text_col]).map_batches(
        with_counts, batch_format="pyarrow"
    )
    pre = global_prefix_sum(based, order_col=id_col, val_col="n_tokens")

    def first_pos(t: pa.Table) -> pa.Table:
        toks_out, pos_out = [], []
        for x, off in zip(
            t[text_col].to_pylist(), t["prefix"].to_pylist()
        ):
            toks = tokens_of(x)
            if not toks:
                continue
            u, idx = np.unique(np.array(toks, dtype=object),
                               return_index=True)
            toks_out.extend(u.tolist())
            pos_out.extend((int(off) + idx).tolist())
        return pa.table(
            {
                "token": pa.array(toks_out, pa.string()),
                "fp": pa.array(pos_out, pa.int64()),
            }
        )

    firsts = (
        pre.map_batches(first_pos, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Min("fp", alias_name="fp"))
    )

    total = int(
        based.select_columns(["n_tokens"])
        .aggregate(Sum("n_tokens"))["sum(n_tokens)"]
        or 0
    )
    ths = []
    n = 1 << min_exp
    while n < total:
        ths.append(n)
        n <<= 1
    ths.append(total)
    th_arr = np.asarray(ths, dtype=np.int64)

    def partial_hist(t: pa.Table) -> pa.Table:
        fp = t["fp"].to_numpy(zero_copy_only=False)
        # token counts per first-covering-threshold bucket; the curve
        # is the suffix-cumulative of this histogram
        bucket = np.searchsorted(th_arr, fp, side="right")
        counts = np.bincount(bucket, minlength=len(th_arr))[: len(th_arr)]
        return pa.table(
            {
                "ti": pa.array(np.arange(len(th_arr)), pa.int64()),
                "c": pa.array(counts, pa.int64()),
            }
        )

    hist = (
        firsts.map_batches(partial_hist, batch_format="pyarrow")
        .groupby("ti")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values("ti")
    )
    full = np.zeros(len(th_arr), dtype=np.int64)
    full[hist["ti"].to_numpy()] = hist["c"].to_numpy()
    vocab = np.cumsum(full)
    return rd.from_arrow(
        pa.table(
            {
                "n_prefix": pa.array(th_arr, pa.int64()),
                "vocab": pa.array(vocab, pa.int64()),
            }
        )
    )


def postings_varint_bytes(docs, df_min: int = 2, df_max: int = 1000,
                          text_col="text", id_col="doc_id"):
    """Index-compression accounting: for every df-banded token, the
    byte size of its delta-gap VARINT-encoded posting list (first doc
    id, then successive gaps; LEB128-style 7-bit groups, so
    bytes(x) = max(1, ceil(bit_length(x)/7)) — the standard postings
    layout of Lucene-family indexes). A pure function of the posting
    SETS, so it certifies the distributed index build end to end while
    exercising the gap/bit arithmetic a real index writer runs.

    Scale shape = inverted_index verbatim: per-batch DISTINCT
    (token, doc_id) pairs, ONE groupby(token), vectorized group body
    (np.diff for gaps, np.frexp for exact bit lengths — frexp's
    exponent IS bit_length for positive ints < 2^53, no float-log
    boundary risk). df band bounds posting length per task. Returns
    (token, df, varint_bytes)."""
    from .hashing import tokens_of

    def pairs(t: pa.Table) -> pa.Table:
        toks, ids = [], []
        for did, x in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            for tok in set(tokens_of(x)):
                toks.append(tok)
                ids.append(did)
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                id_col: pa.array(ids, pa.int64()),
            }
        )

    def vbytes(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g[id_col].to_numpy())
        if not (df_min <= len(ids) <= df_max):
            return pd.DataFrame(
                {
                    "token": pd.Series([], dtype=str),
                    "df": pd.Series([], dtype="int64"),
                    "varint_bytes": pd.Series([], dtype="int64"),
                }
            )
        vals = np.concatenate(([ids[0]], np.diff(ids)))
        bits = np.where(vals > 0, np.frexp(vals.astype(np.float64))[1], 0)
        nb = int(np.maximum(1, (bits + 6) // 7).sum())
        return pd.DataFrame(
            {
                "token": [g["token"].iloc[0]],
                "df": np.array([len(ids)], np.int64),
                "varint_bytes": np.array([nb], np.int64),
            }
        )

    return (
        docs.select_columns([id_col, text_col])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby("token")
        .map_groups(vbytes, batch_format="pandas")
    )


def bigram_pmi(docs, min_count: int = 5, scale: int = 10**6,
               text_col="text", max_broadcast_bytes: int = 256 << 20,
               num_partitions: int | None = None):
    """Pointwise-mutual-information collocation scores for token
    bigrams, as the EXACT integer ratio

        pmi_ppm = floor(n_ab * U * U * scale / (B * n_a * n_b))

    (U = total token occurrences, B = total bigram occurrences) — the
    scaled argument of log-PMI, monotone in PMI, kept rational-exact so
    the distributed result is bit-reproducible and SQL-certifiable
    (the repo-wide fixed-point rule; intermediates exceed int64 so the
    finisher uses arbitrary-precision Python ints over the small
    distinct-bigram table, and the twin uses HUGEINT).

    Scale shape: bigram and unigram counts reduce through per-batch
    vocabulary partials + one groupby each (the heavy_hitters shape);
    the scorer runs distributed over the bigram dataset either way.
    Under ``max_broadcast_bytes`` (vocab rows x ~32 B) the unigram
    table broadcasts once via ray.put; past it it stays a distributed
    dataset and n_a / n_b attach by two hash joins on the split tokens
    (materialized between, the chained-join rule; both paths pinned
    equal in pytest). Returns (bigram, n_ab, pmi_ppm) for bigrams with
    n_ab >= min_count."""
    import ray
    from ray.data.aggregate import Sum

    def bigram_partial(t: pa.Table) -> pa.Table:
        grams = []
        for x in t[text_col].to_pylist():
            toks = tokens_of(x)
            grams.extend(f"{a} {b}" for a, b in zip(toks[:-1], toks[1:]))
        if not grams:
            return pa.table(
                {"bigram": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        u, c = np.unique(np.asarray(grams, dtype=object), return_counts=True)
        return pa.table(
            {"bigram": pa.array(u, pa.string()), "n": pa.array(c, pa.int64())}
        )

    def unigram_partial(t: pa.Table) -> pa.Table:
        toks: list[str] = []
        for x in t[text_col].to_pylist():
            toks.extend(tokens_of(x))
        if not toks:
            return pa.table(
                {"tok": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        u, c = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        return pa.table(
            {"tok": pa.array(u, pa.string()), "n": pa.array(c, pa.int64())}
        )

    base = docs.select_columns([text_col])
    uni_ds = (
        base.map_batches(unigram_partial, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("n", alias_name="n"))
        .materialize()  # vocab-bounded; gate-counted + reused below
    )
    u_total = int(uni_ds.sum("n") or 0)
    broadcast_uni = uni_ds.count() * 32 <= max_broadcast_bytes
    if broadcast_uni:
        uni = uni_ds.to_pandas()
        uni_ref = ray.put(dict(zip(uni["tok"], uni["n"].astype(int))))

    bg = (
        base.map_batches(bigram_partial, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="n"))
        .materialize()
    )
    agg = bg.aggregate(Sum("n", alias_name="n"))
    b_total = int(agg["n"]) if agg and agg.get("n") is not None else 0

    if broadcast_uni:

        def score(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            t = t.filter(pc.greater_equal(t["n"], min_count))
            udict = ray.get(uni_ref)
            out_pmi = []
            for bgram, n_ab in zip(t["bigram"].to_pylist(),
                                   t["n"].to_pylist()):
                a, b = bgram.split(" ", 1)
                # exact big-int arithmetic; result fits int64 by
                # construction
                out_pmi.append(
                    (int(n_ab) * u_total * u_total * scale)
                    // (b_total * udict[a] * udict[b])
                )
            return pa.table(
                {
                    "bigram": t["bigram"],
                    "n_ab": t["n"],
                    "pmi_ppm": pa.array(out_pmi, pa.int64()),
                }
            )

        return bg.map_batches(score, batch_format="pyarrow")

    # join path: the unigram table stays distributed — min_count
    # bigram rows split into their two tokens and attach n_a / n_b by
    # two hash joins (materialized between, the chained-join rule);
    # nothing vocab-proportional ever reaches the driver.
    if num_partitions is None:
        from .joins import default_join_partitions

        num_partitions = default_join_partitions()

    def split_tokens(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.greater_equal(t["n"], min_count))
        grams = t["bigram"].to_pylist()
        a = [g.split(" ", 1)[0] for g in grams]
        b = [g.split(" ", 1)[1] for g in grams]
        return pa.table({
            "bigram": t["bigram"],
            "n_ab": t["n"],
            "tok_a": pa.array(a, pa.string()),
            "tok_b": pa.array(b, pa.string()),
        })

    def rename_uni(name):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({"tok": t["tok"], name: t["n"]})

        return fn

    uni_a = uni_ds.map_batches(rename_uni("n_a"), batch_format="pyarrow")
    uni_b = uni_ds.map_batches(rename_uni("n_b"), batch_format="pyarrow")
    j1 = (
        bg.map_batches(split_tokens, batch_format="pyarrow")
        .join(uni_a, join_type="inner", num_partitions=num_partitions,
              on=("tok_a",), right_on=("tok",))
        .materialize()
    )
    j2 = j1.join(uni_b, join_type="inner", num_partitions=num_partitions,
                 on=("tok_b",), right_on=("tok",))

    def score_joined(t: pa.Table) -> pa.Table:
        out_pmi = [
            (int(n_ab) * u_total * u_total * scale)
            // (b_total * int(na) * int(nb))
            for n_ab, na, nb in zip(t["n_ab"].to_pylist(),
                                    t["n_a"].to_pylist(),
                                    t["n_b"].to_pylist())
        ]
        return pa.table({
            "bigram": t["bigram"],
            "n_ab": t["n_ab"],
            "pmi_ppm": pa.array(out_pmi, pa.int64()),
        })

    return j2.map_batches(score_joined, batch_format="pyarrow")


def top_bigrams(docs, k: int = 20, text_col="text"):
    """Corpus-wide top-k most frequent token BIGRAMS (the LM n-gram
    statistics pass), ties broken by bigram asc. Same shape as
    heavy_hitters (curation.py:933): consecutive-pair extraction and
    partial counts are vectorized per batch (np.unique over joined
    pair strings), the exchange carries per-batch vocabulary partials,
    and only k rows reach the caller after the aggregated sort.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        grams = []
        for x in t[text_col].to_pylist():
            toks = tokens_of(x)
            grams.extend(
                f"{a} {b}" for a, b in zip(toks[:-1], toks[1:])
            )
        if not grams:
            return pa.table(
                {"bigram": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        u, c = np.unique(np.asarray(grams, dtype=object), return_counts=True)
        return pa.table(
            {"bigram": pa.array(u, pa.string()), "n": pa.array(c, pa.int64())}
        )

    agg = (
        docs.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="n"))
    )

    def neg(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column("_neg_n", pc.multiply(t["n"], -1))

    return (
        agg.map_batches(neg, batch_format="pyarrow")
        .sort(["_neg_n", "bigram"])
        .limit(k)
        .drop_columns(["_neg_n"])
    )


def partitioned_write_pruned_read(docs, out_dir: str, langs: list[str],
                                  text_col="text", id_col="doc_id"):
    """Hive-partitioned parquet sink + PARTITION-PRUNED read-back: the
    corpus is written once via Ray's native ``write_parquet(...,
    partition_cols=['lang'])``, then ONLY the requested partitions'
    directories are read (path-level pruning — the other partitions'
    bytes never leave storage, the at-scale read discipline). Returns
    one manifest row per requested lang re-derived ENTIRELY from the
    round-tripped files — (lang, n_docs, n_chars, sum_doc_id), with
    n_chars recomputed from the read-back text — so a match against
    the original table certifies both the partitioned sink and the
    pruned read.
    """
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    docs.select_columns([id_col, text_col, "lang"]).write_parquet(
        out_dir, partition_cols=["lang"]
    )

    def stats(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_chars": pc.cast(pc.utf8_length(t[text_col]), pa.int64()),
                id_col: t[id_col],
            }
        )

    rows = []
    for lang in langs:
        agg = (
            rd.read_parquet(f"{out_dir}/lang={lang}")
            .map_batches(stats, batch_format="pyarrow")
            .aggregate(
                Count(alias_name="n_docs"),
                Sum("n_chars", alias_name="n_chars"),
                Sum(id_col, alias_name="sum_doc_id"),
            )
        )
        rows.append(
            {
                "lang": lang,
                "n_docs": int(agg["n_docs"]),
                "n_chars": int(agg["n_chars"]),
                "sum_doc_id": int(agg["sum_doc_id"]),
            }
        )
    return pd.DataFrame(rows)


def adjacent_edit_distances(docs, prefix_len: int = 200,
                            text_col="text", id_col="doc_id"):
    """Levenshtein distance between each doc and its id-successor
    (prefixes of ``prefix_len`` chars) — the fuzzy-match scalar a
    near-dup verify kernel uses, demonstrated over a deterministic
    pair set (id, id+1). ONE native hash join builds the pairs (each
    side ships only the truncated prefix), then a stateless map_batches
    computes the DP — vectorized over the second string per row (numpy
    row updates, no per-cell Python). Cost is O(prefix_len^2) per pair
    by construction; at corpus scale the pair set comes from LSH
    candidates, not adjacency.
    """
    import pyarrow.compute as pc

    def prep(shift: int, key_name: str, txt_name: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    key_name: pc.add(t[id_col], pa.scalar(shift)),
                    txt_name: pc.utf8_slice_codeunits(
                        t[text_col], 0, prefix_len
                    ),
                }
            )

        return fn

    left = docs.select_columns([id_col, text_col]).map_batches(
        prep(0, "pair_id", "text_a"), batch_format="pyarrow"
    )
    # doc i pairs with doc i+1: right side keyed at (its id - 1) = i
    right = docs.select_columns([id_col, text_col]).map_batches(
        prep(-1, "pair_id_r", "text_b"), batch_format="pyarrow"
    )
    pairs = left.join(
        right, join_type="inner", num_partitions=16,
        on=("pair_id",), right_on=("pair_id_r",),
    )

    def lev_row(a: str, b: str) -> int:
        if a == b:
            return 0
        bs = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
        idx = np.arange(len(bs) + 1, dtype=np.int64)
        prev = idx.copy()
        for i, ca in enumerate(a, 1):
            sub = prev[:-1] + (bs != np.uint32(ord(ca)))
            cur = np.empty(len(bs) + 1, dtype=np.int64)
            cur[0] = i
            np.minimum(prev[1:] + 1, sub, out=cur[1:])  # delete | substitute
            # insertion = min over k<=j of cur[k] + (j-k): one
            # accumulate-min pass instead of a per-cell loop
            cur = np.minimum(cur, np.minimum.accumulate(cur - idx) + idx)
            prev = cur
        return int(prev[-1])

    def dist(t: pa.Table) -> pa.Table:
        d = [
            lev_row(a, b)
            for a, b in zip(t["text_a"].to_pylist(), t["text_b"].to_pylist())
        ]
        return pa.table(
            {
                "doc_id": t["pair_id"],
                "edit_distance": pa.array(d, pa.int64()),
            }
        )

    return pairs.map_batches(dist, batch_format="pyarrow")


# ------------------------------------------------- deterministic split

_HEX = "0123456789abcdef"


def train_val_test_split(ds, id_col: str = "doc_id",
                         bounds: tuple[int, int] = (12, 14)):
    """Deterministic hash-based train/valid/test assignment — the
    standard way a training pipeline splits a corpus so the assignment
    is stable across runs, machines and partitionings (never
    row-position-based, which reshuffles under repartition). The split
    key is the LAST HEX NIBBLE of md5(str(id)): nibble < bounds[0] ->
    'train' (12/16 = 75%), < bounds[1] -> 'valid' (2/16), else 'test'
    (2/16). Stateless map_batches, no exchange; md5-of-varchar matches
    DuckDB so the whole assignment is SQL-certifiable.
    """

    def assign(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        nib = np.array(
            [int(hashlib.md5(str(i).encode()).hexdigest()[-1], 16) for i in ids],
            dtype=np.int64,
        )
        split = np.where(
            nib < bounds[0], "train", np.where(nib < bounds[1], "valid", "test")
        )
        return pa.table({id_col: t[id_col], "split": pa.array(split)})

    return ds.select_columns([id_col]).map_batches(assign, batch_format="pyarrow")


# ---------------------------------------------------- sentence explode

_SENT_SPLIT_RE = r"[.!?]+"


def sentence_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Sentence segmentation as a flat_map explode: split each doc on
    terminal-punctuation runs, drop whitespace-only fragments, and emit
    one row per surviving sentence — (doc_id, sent_idx, n_tokens) where
    sent_idx is the fragment's position in the RAW split array (stable
    under filtering, so the Ray and SQL sides agree) and n_tokens
    counts whitespace-delimited tokens in the trimmed sentence.

    Shape: a single stateless map_batches whose output is the exploded
    table (Ray treats a >1-row-per-input batch fn exactly like
    flat_map, without per-row Python dicts); no exchange. Downstream
    per-sentence ops (quality filters, chunk packing) consume the
    exploded stream directly.
    """
    import re

    tok = re.compile(r"\S+")

    def explode(t: pa.Table) -> pa.Table:
        ids, idxs, ntoks = [], [], []
        for doc_id, text in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            for i, frag in enumerate(re.split(_SENT_SPLIT_RE, text), start=1):
                frag = frag.strip()
                if not frag:
                    continue
                ids.append(doc_id)
                idxs.append(i)
                ntoks.append(len(tok.findall(frag)))
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "sent_idx": pa.array(idxs, pa.int64()),
                "n_tokens": pa.array(ntoks, pa.int64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow"
    )


# -------------------------------------------------------- snapshot diff


def snapshot_diff(a_ds, b_ds, id_col: str = "doc_id", text_col: str = "text"):
    """CDC-style diff between two corpus snapshots: one row per changed
    key — (id, change) with change in {'added', 'removed', 'modified'}
    (modified = same key, different content hash). Unchanged keys emit
    nothing.

    Shape: both sides map to (id, side-tagged md5 fingerprint) rows —
    content never crosses the exchange, only 32-char digests — then ONE
    union-tagged groupby(id) (the same single-exchange full-outer
    pattern joins.py documents for Ray 2.49's empty-partition
    full_outer bug) with Max aggregates: a missing side's slot stays ''
    (md5 hex is never empty), so the classifier is a vectorized
    per-batch map over the tiny aggregate table. Assumes each side has
    unique keys (snapshot semantics).
    """
    from ray.data.aggregate import Max

    def tag(side: str):
        def fn(t: pa.Table) -> pa.Table:
            fps = [
                hashlib.md5(x.encode()).hexdigest()
                for x in t[text_col].to_pylist()
            ]
            empty = [""] * t.num_rows
            return pa.table(
                {
                    id_col: t[id_col],
                    "a_fp": pa.array(fps if side == "a" else empty),
                    "b_fp": pa.array(fps if side == "b" else empty),
                }
            )

        return fn

    tagged = a_ds.select_columns([id_col, text_col]).map_batches(
        tag("a"), batch_format="pyarrow"
    ).union(
        b_ds.select_columns([id_col, text_col]).map_batches(
            tag("b"), batch_format="pyarrow"
        )
    )
    agg = tagged.groupby(id_col).aggregate(
        Max("a_fp", alias_name="a_fp"), Max("b_fp", alias_name="b_fp")
    )

    def classify(t: pa.Table) -> pa.Table:
        a = np.asarray(t["a_fp"].to_pylist())
        b = np.asarray(t["b_fp"].to_pylist())
        change = np.where(b == "", "removed", np.where(a == "", "added", "modified"))
        keep = (a == "") | (b == "") | (a != b)
        return pa.table(
            {id_col: t[id_col], "change": pa.array(change)}
        ).filter(pa.array(keep))

    return agg.map_batches(classify, batch_format="pyarrow")


def apply_changes(base_ds, changes_ds, id_col: str = "doc_id",
                  text_col: str = "text",
                  num_partitions: int | None = None):
    """CDC merge/upsert (the inverse of :func:`snapshot_diff`): apply a
    change stream — rows (id, op, text) with op in {'upsert','delete'};
    at most one change row per id, deletes win upstream — onto a base
    snapshot, producing the new snapshot.

    Shape: content moves ONCE — base LEFT OUTER JOINs the keyed change
    stream (native hash shuffle), a vectorized resolver keeps base rows
    untouched / replaces upserts / drops deletes; inserts (upserts
    whose key is absent from base) come from an anti-join of the
    changes against the base's distinct keys (keys only — base payload
    never moves twice). Assumes the change stream is small relative to
    the base (the CDC contract); base-key distinctness is snapshot
    semantics.
    """
    from .joins import default_join_partitions

    if num_partitions is None:
        num_partitions = default_join_partitions()
    import pyarrow.compute as pc

    from .joins import anti_join

    def ch_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"_cid": t[id_col], "_op": t["op"], "_ctext": t[text_col]}
        )

    ch = changes_ds.map_batches(ch_prep, batch_format="pyarrow")
    joined = base_ds.select_columns([id_col, text_col]).join(
        ch, join_type="left_outer", num_partitions=num_partitions,
        on=(id_col,), right_on=("_cid",),
    )

    def resolve(t: pa.Table) -> pa.Table:
        op = t["_op"]
        keep = pc.or_kleene(
            pc.is_null(op), pc.not_equal(op, pa.scalar("delete"))
        )
        t = t.filter(pc.fill_null(keep, True))
        txt = pc.if_else(
            pc.equal(pc.fill_null(t["_op"], ""), pa.scalar("upsert")),
            t["_ctext"],
            t[text_col],
        )
        return pa.table({id_col: t[id_col], text_col: txt})

    merged = joined.map_batches(resolve, batch_format="pyarrow")

    def ins_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["op"], pa.scalar("upsert")))
        return pa.table({id_col: t[id_col], text_col: t[text_col]})

    inserts = anti_join(
        changes_ds.map_batches(ins_prep, batch_format="pyarrow"),
        base_ds.select_columns([id_col]),
        on=id_col,
        num_partitions=num_partitions,
    )
    return merged.union(inserts)


def write_text_shards(docs, out_dir: str, n_shards: int = 16,
                      text_col="text", id_col="doc_id"):
    """Plain-text-lines sink (``<doc_id>\\t<text>`` per line) with the
    same deterministic resumable layout as the jsonl/csv/packed sinks:
    one ``out_dir/shard-NN.txt`` per md5-bucket shard, canonical
    (md5, doc_id) in-shard order, skip-existing + tmp+rename atomicity.
    Lines are the fourth interchange format next to parquet/jsonl/csv;
    the caller's text must be newline/tab-free (true of the corpus by
    construction — a violating row raises rather than corrupting the
    framing). Returns the per-shard manifest (shard, n_docs, n_chars).
    """
    import os

    def assign(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        hs = [hashlib.md5(x.encode("utf-8")).hexdigest() for x in texts]
        return pa.table(
            {
                id_col: t[id_col],
                text_col: t[text_col],
                "h": pa.array(hs, pa.string()),
                "shard": pa.array(
                    [int(h[0], 16) % n_shards for h in hs], pa.int64()
                ),
            }
        )

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        shard = int(g["shard"].iloc[0])
        g = g.sort_values(["h", id_col])
        path = os.path.join(out_dir, f"shard-{shard:02d}.txt")
        if not os.path.exists(path):
            os.makedirs(out_dir, exist_ok=True)
            tmp = path + ".tmp"
            with open(tmp, "w", encoding="utf-8") as f:
                for did, txt in zip(g[id_col], g[text_col]):
                    if "\n" in txt or "\t" in txt:
                        raise ValueError(
                            f"text of doc {did} contains framing chars; "
                            "use the jsonl sink for unrestricted text"
                        )
                    f.write(f"{int(did)}\t{txt}\n")
            os.rename(tmp, path)
        return pd.DataFrame(
            {
                "shard": [shard],
                "n_docs": [len(g)],
                "n_chars": [int(sum(len(x) for x in g[text_col]))],
            }
        )

    return (
        docs.select_columns([id_col, text_col])
        .map_batches(assign, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(write_group, batch_format="pandas")
    )


def read_text_manifest(in_dir: str):
    """Text-lines source: ``ray.data.read_text`` over a
    :func:`write_text_shards` directory (one task per shard file),
    reduced to the writer's manifest with n_chars recomputed from the
    ROUND-TRIPPED text — certifying sink + source byte fidelity."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_text(in_dir, file_extensions=["txt"], include_paths=True)

    def prep(t: pa.Table) -> pa.Table:
        import re as _re

        shards = [
            int(_re.search(r"shard-(\d+)\.txt$", p).group(1))
            for p in t["path"].to_pylist()
        ]
        texts = [line.split("\t", 1)[1] for line in t["text"].to_pylist()]
        return pa.table(
            {
                "shard": pa.array(shards, pa.int64()),
                "n_chars": pa.array(
                    [len(x) for x in texts], pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("shard")
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="n_chars"))
    )


def write_warcish_shards(pages, out_dir: str, n_shards: int = 8):
    """WARC-like binary capture container sink: length-prefixed records

        b"WRC1" | u32le url_len | url utf-8 | i32le status
               | u64le body_len | body bytes

    — the fifth interchange format next to parquet/jsonl/csv/text, and
    the only BINARY-framed one (bodies are raw bytes, no text escaping
    needed). Layout matches the other sinks: one
    ``out_dir/capture-NN.wrc`` per md5(url)-bucket shard, canonical
    (md5, url) in-shard order, tmp+rename atomicity, skip-existing
    resume. Input rows: url (string), status (int), body (binary).
    Returns the per-shard manifest (shard, n_records, n_bytes,
    checksum) where checksum = sum of md5-lower-64(body) mod 1e9+7 —
    an order-independent exact certificate of the payload BYTES."""
    import os
    import struct

    from .hashing import md5_lower64_bytes

    MOD = 1_000_000_007

    def assign(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        urls = t["url"].to_pylist()
        hs = [hashlib.md5(u.encode("utf-8")).hexdigest() for u in urls]
        return pa.table(
            {
                "url": t["url"],
                "status": pc.cast(t["status"], pa.int32()),
                "body": t["body"],
                "h": pa.array(hs, pa.string()),
                "shard": pa.array(
                    [int(h[0], 16) % n_shards for h in hs], pa.int64()
                ),
            }
        )

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        shard = int(g["shard"].iloc[0])
        g = g.sort_values(["h", "url"])
        path = os.path.join(out_dir, f"capture-{shard:02d}.wrc")
        n_bytes = 0
        ck = 0
        if not os.path.exists(path):
            os.makedirs(out_dir, exist_ok=True)
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                for u, st, body in zip(g["url"], g["status"], g["body"]):
                    ub = u.encode("utf-8")
                    b = bytes(body)
                    f.write(b"WRC1")
                    f.write(struct.pack("<I", len(ub)))
                    f.write(ub)
                    f.write(struct.pack("<i", int(st)))
                    f.write(struct.pack("<Q", len(b)))
                    f.write(b)
            os.rename(tmp, path)
        for body in g["body"]:
            b = bytes(body)
            n_bytes += len(b)
            # raw-byte checksum: the container is binary-framed, so the
            # payload need not be UTF-8 (gzip/image bodies hash fine)
            ck += md5_lower64_bytes(b) % MOD
        return pd.DataFrame(
            {
                "shard": [shard],
                "n_records": [len(g)],
                "n_bytes": [n_bytes],
                "status_sum": [int(g["status"].sum())],
                "checksum": [ck],
            }
        )

    return (
        pages.map_batches(assign, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(write_group, batch_format="pandas")
    )


def read_warcish_manifest(in_dir: str):
    """WARC-ish source: ``ray.data.read_binary_files`` over a
    :func:`write_warcish_shards` directory (one task per capture
    file), records re-parsed from the binary framing, reduced to the
    writer's manifest with every field recomputed from the
    ROUND-TRIPPED records — certifying binary sink + source fidelity
    byte for byte (the checksum re-hashes the parsed bodies). A
    malformed magic raises rather than silently resyncing."""
    import re as _re
    import struct

    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from .hashing import md5_lower64_bytes

    MOD = 1_000_000_007
    ds = rd.read_binary_files(
        in_dir, file_extensions=["wrc"], include_paths=True
    )

    def parse(t: pa.Table) -> pa.Table:
        shards, nb, sts, ck = [], [], [], []
        for p, blob in zip(t["path"].to_pylist(), t["bytes"].to_pylist()):
            shard = int(_re.search(r"capture-(\d+)\.wrc$", p).group(1))
            off = 0
            mv = memoryview(blob)
            while off < len(mv):
                if bytes(mv[off:off + 4]) != b"WRC1":
                    raise ValueError(f"bad magic at {p}:{off}")
                off += 4
                (ul,) = struct.unpack_from("<I", mv, off)
                off += 4 + ul  # url (framing only; not re-emitted)
                (st,) = struct.unpack_from("<i", mv, off)
                off += 4
                (bl,) = struct.unpack_from("<Q", mv, off)
                off += 8
                body = bytes(mv[off:off + bl])
                off += bl
                shards.append(shard)
                nb.append(bl)
                sts.append(st)
                ck.append(md5_lower64_bytes(body) % MOD)
        return pa.table(
            {
                "shard": pa.array(shards, pa.int64()),
                "n_bytes": pa.array(nb, pa.int64()),
                "status": pa.array(sts, pa.int64()),
                "ck": pa.array(ck, pa.int64()),
            }
        )

    out = (
        ds.map_batches(parse, batch_format="pyarrow")
        .groupby("shard")
        .aggregate(
            Count(alias_name="n_records"),
            Sum("n_bytes", alias_name="n_bytes"),
            Sum("status", alias_name="status_sum"),
            Sum("ck", alias_name="checksum"),
        )
    )
    return out


def dsir_weights(docs, target_col: str = "lang", target_value: str = "en",
                 scale: int = 10**6, text_col="text", id_col="doc_id",
                 max_broadcast_bytes: int = 256 << 20,
                 num_partitions: int | None = None):
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling") on exact integer
    n-gram statistics: each bigram gets a target-affinity ratio
    ``floor(scale * n_target / n_all)`` (occurrence counts over the
    target slice vs the whole corpus), and a document's weight is the
    SUM of its bigram occurrences' ratios — the hashed-ngram importance
    score, kept rational-exact (ppm ints) instead of log-likelihood
    floats so the distributed result is bit-reproducible and
    SQL-certifiable (the repo-wide fixed-point rule; monotone-enough
    proxy for reweighting/resampling).

    Scale shape: one groupby builds the (bigram, n_all, n_target)
    table via per-batch vocabulary partials. Under
    ``max_broadcast_bytes`` (distinct bigrams x ~48 B) the ratio table
    broadcasts once via ray.put and the scoring pass is stateless
    map_batches; past the gate the ratio table stays distributed —
    per-doc (doc_id, bigram, occ) rows hash-join it, one
    groupby(doc_id) sums the contributions, and a left-outer join from
    the per-doc totals restores zero-bigram docs (the
    ngram_novelty_shuffled shape; both paths pinned equal in pytest).
    Returns (doc_id, n_bigrams, weight_ppm)."""
    import ray
    from ray.data.aggregate import Sum

    def pair_counts(t: pa.Table) -> pa.Table:
        grams: dict[str, list[int]] = {}
        is_t = [v == target_value for v in t[target_col].to_pylist()]
        for flag, x in zip(is_t, t[text_col].to_pylist()):
            toks = tokens_of(x)
            for a, b in zip(toks[:-1], toks[1:]):
                g = grams.setdefault(f"{a} {b}", [0, 0])
                g[0] += 1
                g[1] += int(flag)
        if not grams:
            return pa.table(
                {"bigram": pa.array([], pa.string()),
                 "n_all": pa.array([], pa.int64()),
                 "n_t": pa.array([], pa.int64())}
            )
        ks = list(grams)
        return pa.table(
            {
                "bigram": pa.array(ks, pa.string()),
                "n_all": pa.array([grams[k][0] for k in ks], pa.int64()),
                "n_t": pa.array([grams[k][1] for k in ks], pa.int64()),
            }
        )

    ratio_ds = (
        docs.select_columns([target_col, text_col])
        .map_batches(pair_counts, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("n_all", alias_name="n_all"),
                   Sum("n_t", alias_name="n_t"))
        .materialize()  # vocab^2-bounded, consumed twice below
    )

    if ratio_ds.count() * 48 <= max_broadcast_bytes:
        ratios = ratio_ds.to_pandas()
        ratio = {
            b: (int(nt) * scale) // int(na)
            for b, na, nt in zip(ratios["bigram"], ratios["n_all"],
                                 ratios["n_t"])
        }
        ref = ray.put(ratio)

        def score(t: pa.Table) -> pa.Table:
            r = ray.get(ref)
            ids = t[id_col].to_pylist()
            n_bg, w = [], []
            for x in t[text_col].to_pylist():
                toks = tokens_of(x)
                pairs = [f"{a} {b}" for a, b in zip(toks[:-1], toks[1:])]
                n_bg.append(len(pairs))
                w.append(sum(r[p] for p in pairs))
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "n_bigrams": pa.array(n_bg, pa.int64()),
                    "weight_ppm": pa.array(w, pa.int64()),
                }
            )

        return docs.select_columns([id_col, target_col, text_col]).map_batches(
            score, batch_format="pyarrow"
        )

    # join path: nothing vocab-proportional reaches the driver. Per-doc
    # (bigram, occ) rows ⋈ the distributed ratio table, one
    # groupby(doc_id) sums occ * ratio, and a left-outer join from the
    # per-doc totals restores zero-bigram docs.
    if num_partitions is None:
        from .joins import default_join_partitions

        num_partitions = default_join_partitions()
    base = docs.select_columns([id_col, text_col])

    def explode(t: pa.Table) -> pa.Table:
        ids, grams, occ = [], [], []
        for did, x in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            toks = tokens_of(x)
            cnt: dict[str, int] = {}
            for a, b in zip(toks[:-1], toks[1:]):
                g = f"{a} {b}"
                cnt[g] = cnt.get(g, 0) + 1
            for g, k in cnt.items():
                ids.append(did)
                grams.append(g)
                occ.append(k)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "bigram": pa.array(grams, pa.string()),
            "occ": pa.array(occ, pa.int64()),
        })

    def contrib(t: pa.Table) -> pa.Table:
        na = t["n_all"].to_numpy(zero_copy_only=False).astype(object)
        nt = t["n_t"].to_numpy(zero_copy_only=False).astype(object)
        occ = t["occ"].to_numpy(zero_copy_only=False).astype(object)
        # per-bigram ratio floor-divides BEFORE the occurrence multiply
        # (matching the broadcast LUT); object ints dodge int64 overflow
        # in nt * scale for hot bigrams at corpus scale
        w = occ * (nt * scale // na)
        return pa.table({
            id_col: t[id_col],
            "w": pa.array(w.astype(np.int64), pa.int64()),
        })

    weights = (
        base.map_batches(explode, batch_format="pyarrow")
        .join(ratio_ds, join_type="inner", num_partitions=num_partitions,
              on=("bigram",))
        .map_batches(contrib, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(Sum("w", alias_name="weight_ppm"))
        .materialize()  # chained-join rule: break before the next join
    )

    def totals(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        n_bg = [max(0, len(tokens_of(x)) - 1) for x in t[text_col].to_pylist()]
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_bigrams": pa.array(n_bg, pa.int64()),
        })

    joined = base.map_batches(totals, batch_format="pyarrow").join(
        weights, join_type="left_outer", num_partitions=num_partitions,
        on=(id_col,),
    )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "doc_id": t[id_col],
            "n_bigrams": t["n_bigrams"],
            "weight_ppm": pc.fill_null(
                pc.cast(t["weight_ppm"], pa.int64()), 0),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


def doc_similarity_tfidf(docs, threshold_cos2_ppm: int = 90_000,
                         df_min: int = 2, df_max: int = 100,
                         scale: int = 10_000, broadcast_cap: int = 5_000_000,
                         text_col="text", id_col="doc_id",
                         norms: str = "auto"):
    """Sparse TF-IDF cosine document-similarity self-join — the exact
    all-pairs similarity search shape (Bayardo et al. 2007 "Scaling Up
    All Pairs Similarity Search"): every unordered doc pair sharing at
    least one df-banded token, scored by the cosine of their
    integer-weighted tf-idf vectors and kept when
    ``cos^2 * 1e6 >= threshold_cos2_ppm``. Weights are the repo's
    rational-exact integers ``w = (tf * scale) // df`` restricted to
    tokens with ``df_min <= df <= df_max`` (the df band is BOTH the
    idf-meaningfulness filter and the blocking bound: a token
    contributes at most C(df_max, 2) pairs, so pair fan-out is
    corpus-linear, never corpus-quadratic). Returns
    (doc_a, doc_b, dot_w, cos2_ppm), doc_a < doc_b.

    Stages: (1) the tf_df_scores df pass (token-hash partials, ONE
    groupby, sorted-array broadcast); (2) a stateless posting/norm pass
    — each doc's banded weights and its norm are fully determined by
    its own row plus the broadcast df table, so NO exchange builds
    norms; (3) postings bucket by token hash, each bucket emits
    per-token triu pair dot-contributions (vectorized np.add.at
    combine) packed as ``a << 32 | b`` int64 keys into ONE
    bucketed_group_sums exchange — dot products are exact int64;
    (4) norms attach by sorted-array broadcast when the doc count is
    under ``broadcast_cap``, else by two native hash joins
    (materialized between, the chained-join rule) — ``norms=`` forces
    either path, both pinned equal in pytest; (5) the threshold
    compare is exact big-int arithmetic (dot^2 * 1e6 vs t * na * nb
    overflows int64 by design — Python ints here, HUGEINT in the
    DuckDB twin). Token identity through the pipeline is the 64-bit
    blake2b hash (collision birthday-bounded, same contract as
    tf_df_scores).
    """
    import ray
    from .hashing import _token_hash
    from .relagg import bucketed_group_sums

    if norms not in ("auto", "broadcast", "join"):
        raise ValueError(f"norms must be auto|broadcast|join, got {norms!r}")
    from ray.data.aggregate import Sum

    n_buckets = 4 * int(ray.cluster_resources().get("CPU", 8))

    def _doc_vectors(t: pa.Table):
        """(doc_id, token-hash, tf) triples for every doc in the batch."""
        ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
        per_doc = [tokens_of(x) for x in t[text_col].to_pylist()]
        out_i, out_h, out_tf = [], [], []
        for i, toks in zip(ids, per_doc):
            if not toks:
                continue
            codes, uniq = pd.factorize(np.asarray(toks, dtype=object),
                                       sort=False)
            hu = np.fromiter((_token_hash(s) for s in uniq),
                             dtype=np.uint64, count=len(uniq))
            tf = np.bincount(codes).astype(np.int64)
            out_i.append(np.full(len(uniq), i, dtype=np.int64))
            out_h.append(hu)
            out_tf.append(tf)
        if not out_i:
            z = np.array([], dtype=np.int64)
            return z, z.view(np.uint64), z
        return (np.concatenate(out_i), np.concatenate(out_h),
                np.concatenate(out_tf))

    def df_partial(t: pa.Table) -> pa.Table:
        _, h, _ = _doc_vectors(t)
        u, c = np.unique(h, return_counts=True)
        return pa.table({"h": pa.array(u.view(np.int64), pa.int64()),
                         "nd": pa.array(c.astype(np.int64))})

    def keep_band(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.and_(pc.greater_equal(t["df"], df_min),
                    pc.less_equal(t["df"], df_max))
        return t.filter(m)

    # band filter pushed into the distributed aggregate: only banded
    # rows (the exact broadcast payload) ever reach the driver — the
    # full-vocab df table never does
    df_tbl = (
        docs.select_columns([id_col, text_col])
        .map_batches(df_partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("nd", alias_name="df"))
        .map_batches(keep_band, batch_format="pyarrow")
        .to_pandas()
    )
    if len(df_tbl) == 0:
        # band matched no token corpus-wide (hit at sf0.1: the 10x
        # corpus pushes every df past df_max) — an all-empty dataset
        # comes back COLUMN-LESS from to_pandas, so index nothing
        hs = np.array([], dtype=np.int64)
        dfv = np.array([], dtype=np.int64)
    else:
        dfv = df_tbl["df"].to_numpy().astype(np.int64)
        hs = df_tbl["h"].to_numpy().astype(np.int64)
    order = np.argsort(hs)
    ref = ray.put((hs[order], dfv[order]))

    def _banded_weights(t: pa.Table):
        sh, sdf = ray.get(ref)
        i, h, tf = _doc_vectors(t)
        hi = h.view(np.int64)
        pos = np.searchsorted(sh, hi)
        pos_c = np.minimum(pos, max(len(sh) - 1, 0))
        hit = (sh[pos_c] == hi) if len(sh) else np.zeros(len(hi), bool)
        i, hi, tf, pos_c = i[hit], hi[hit], tf[hit], pos_c[hit]
        w = (tf * scale) // sdf[pos_c] if len(hi) else tf
        return i, hi, w

    def postings(t: pa.Table) -> pa.Table:
        i, hi, w = _banded_weights(t)
        if len(i) and ((i < 0).any() or i.max() >= (1 << 31)):
            # pairs pack as (a << 32) | b into SIGNED int64 and unpack
            # with an arithmetic >> 32, so ids in [2^31, 2^32) would
            # silently produce negative keys / sign-extended doc_a —
            # the guard must stop at 2^31, not 2^32
            raise ValueError("doc ids must fit in 31 bits for pair packing")
        b = (hi.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             >> np.uint64(33)) % np.uint64(n_buckets)
        return pa.table({"h": pa.array(hi, pa.int64()),
                         "i": pa.array(i, pa.int64()),
                         "w": pa.array(w, pa.int64()),
                         "_b": pa.array(b.astype(np.int32))})

    def norm_rows(t: pa.Table) -> pa.Table:
        i, _, w = _banded_weights(t)
        if len(i):
            order_ = np.argsort(i, kind="stable")
            i_s, w_s = i[order_], w[order_]
            new = np.concatenate(([True], i_s[1:] != i_s[:-1]))
            rid = np.cumsum(new) - 1
            nn = np.zeros(int(rid[-1]) + 1, dtype=np.int64)
            np.add.at(nn, rid, w_s * w_s)
            return pa.table({"doc": pa.array(i_s[new], pa.int64()),
                             "nn": pa.array(nn, pa.int64())})
        return pa.table({"doc": pa.array([], pa.int64()),
                         "nn": pa.array([], pa.int64())})

    base = docs.select_columns([id_col, text_col])
    post_ds = base.map_batches(postings, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        h = g["h"].to_numpy()
        i = g["i"].to_numpy()
        w = g["w"].to_numpy()
        order_ = np.lexsort((i, h))
        h, i, w = h[order_], i[order_], w[order_]
        new = np.concatenate(([True], h[1:] != h[:-1])) if len(h) else \
            np.zeros(0, dtype=bool)
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(h))
        keys, dots = [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            ii, ww = i[s:e], w[s:e]
            a_idx, b_idx = np.triu_indices(m, k=1)
            keys.append((ii[a_idx] << np.int64(32)) | ii[b_idx])
            dots.append(ww[a_idx] * ww[b_idx])
        if not keys:
            return pd.DataFrame({"pk": np.array([], dtype=np.int64),
                                 "dot": np.array([], dtype=np.int64)})
        pk = np.concatenate(keys)
        dot = np.concatenate(dots)
        u, inv = np.unique(pk, return_inverse=True)
        acc = np.zeros(len(u), dtype=np.int64)
        np.add.at(acc, inv, dot)
        return pd.DataFrame({"pk": u, "dot": acc})

    pair_dots = bucketed_group_sums(
        post_ds.groupby("_b").map_groups(bucket_pairs,
                                         batch_format="pandas"),
        key_col="pk", sum_cols=["dot"],
    ).materialize()
    if pair_dots.count() == 0:
        # e.g. the df band matched no token corpus-wide (a 10x corpus
        # with the same vocab pushes every df past df_max): no pairs.
        # Without this gate the all-empty norm/pair datasets come back
        # SCHEMALESS from Ray and the attach paths KeyError (hit at
        # sf0.1 in the bench sweep).
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "dot_w": pa.array([], pa.int64()),
            "cos2_ppm": pa.array([], pa.int64()),
        }))

    norm_ds = base.map_batches(norm_rows, batch_format="pyarrow")
    n_docs = base.count()
    use_broadcast = norms == "broadcast" or (
        norms == "auto" and n_docs <= broadcast_cap
    )

    def _emit(df: pd.DataFrame, na: np.ndarray, nb: np.ndarray
              ) -> pd.DataFrame:
        a = (df["pk"].to_numpy() >> np.int64(32)).astype(np.int64)
        b = (df["pk"].to_numpy() & np.int64((1 << 32) - 1)).astype(np.int64)
        dot = df["dot"].to_numpy()
        keep, cos2 = [], []
        t = int(threshold_cos2_ppm)
        for d, x, y in zip(dot.tolist(), na.tolist(), nb.tolist()):
            num = d * d * 1_000_000
            den = x * y
            ok = num >= t * den
            keep.append(ok)
            cos2.append(num // den if ok else 0)
        keep = np.asarray(keep, dtype=bool)
        out = pd.DataFrame({
            "doc_a": a[keep], "doc_b": b[keep],
            "dot_w": dot[keep],
            "cos2_ppm": np.asarray(cos2, dtype=np.int64)[keep],
        })
        return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)

    if use_broadcast:
        nt = norm_ds.to_pandas()
        dn = nt["doc"].to_numpy().astype(np.int64)
        nn = nt["nn"].to_numpy().astype(np.int64)
        order_ = np.argsort(dn)
        dn, nn = dn[order_], nn[order_]
        nref = ray.put((dn, nn))

        def attach(t: pa.Table) -> pd.DataFrame:
            d_s, n_s = ray.get(nref)
            df = t.to_pandas()
            a = (df["pk"].to_numpy() >> np.int64(32)).astype(np.int64)
            b = (df["pk"].to_numpy() & np.int64((1 << 32) - 1)).astype(np.int64)
            na = n_s[np.searchsorted(d_s, a)]
            nb = n_s[np.searchsorted(d_s, b)]
            return _emit(df, na, nb)

        return pair_dots.map_batches(attach, batch_format="pyarrow")

    # join path: pairs ⋈ norms on doc_a, materialize, ⋈ norms on doc_b
    def split_key(t: pa.Table) -> pa.Table:
        pk = np.asarray(t["pk"].to_pylist(), dtype=np.int64)
        return pa.table({
            "pk": t["pk"], "dot": t["dot"],
            "doc_a": pa.array(pk >> np.int64(32), pa.int64()),
            "doc_b": pa.array(pk & np.int64((1 << 32) - 1), pa.int64()),
        })

    from .joins import default_join_partitions
    np_parts = default_join_partitions()
    norm_a = norm_ds.map_batches(
        lambda t: pa.table({"doc": t["doc"], "na": t["nn"]}),
        batch_format="pyarrow")
    norm_b = norm_ds.map_batches(
        lambda t: pa.table({"doc": t["doc"], "nb": t["nn"]}),
        batch_format="pyarrow")
    j1 = pair_dots.map_batches(split_key, batch_format="pyarrow").join(
        norm_a, join_type="inner", num_partitions=np_parts,
        on=("doc_a",), right_on=("doc",),
    ).materialize()
    j2 = j1.join(
        norm_b, join_type="inner", num_partitions=np_parts,
        on=("doc_b",), right_on=("doc",),
    )

    def finish(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "pk": t["pk"].to_pandas(), "dot": t["dot"].to_pandas()})
        na = t["na"].to_numpy(zero_copy_only=False).astype(np.int64)
        nb = t["nb"].to_numpy(zero_copy_only=False).astype(np.int64)
        return _emit(df, na, nb)

    return j2.map_batches(finish, batch_format="pyarrow")


def bpe_merge_candidates(docs, k: int = 30, text_col="text"):
    """First-iteration BPE merge statistics (Sennrich et al. 2016):
    the corpus-wide count of every adjacent character pair INSIDE the
    canonical ``[a-z0-9]+`` words (pairs never span a word boundary —
    exactly the word-internal merges byte-pair tokenizer training
    counts on its first step). Returns the top ``k`` (pair, n) merge
    candidates, ties broken by pair text.

    Vectorized end-to-end: each batch NUL-joins its words into one
    string, views the UTF-32 encoding as a uint32 codepoint array, and
    counts boundary-masked adjacent pairs with one np.unique — no
    per-character Python. The exchange carries per-batch (pair, n)
    partials bounded by the pair alphabet (36^2 for the canonical
    word charset), ONE tiny groupby sums them, and only k rows reach
    the driver. Later BPE iterations re-run the same count with the
    winning pair collapsed — the stage shape is iteration-invariant.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        words: list[str] = []
        for x in t[text_col].to_pylist():
            words.extend(tokens_of(x))
        if not words:
            return pa.table({"pk": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        blob = "\x00" + "\x00".join(words)
        cp = np.frombuffer(blob.encode("utf-32-le"), dtype=np.uint32)
        a, b = cp[:-1].astype(np.int64), cp[1:].astype(np.int64)
        m = (a != 0) & (b != 0)
        pk = (a[m] << np.int64(21)) | b[m]
        u, c = np.unique(pk, return_counts=True)
        return pa.table({"pk": pa.array(u, pa.int64()),
                         "n": pa.array(c.astype(np.int64))})

    agg = (
        docs.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("pk")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    pk = agg["pk"].to_numpy().astype(np.int64)
    pairs = [chr(int(x) >> 21) + chr(int(x) & ((1 << 21) - 1)) for x in pk]
    out = pd.DataFrame({"pair": pairs, "n": agg["n"].astype("int64")})
    out = out.sort_values(["n", "pair"], ascending=[False, True],
                          kind="mergesort").head(k)
    return out.reset_index(drop=True)


def mixture_weights(docs, alpha_sqrt: bool = True, by: str = "source",
                    text_col="text"):
    """Domain-mixture sampling weights for multi-source training-data
    blending (the temperature-resampling step of multilingual /
    multi-domain corpus recipes, e.g. the T=2 sampling in mC4/PaLM
    data mixes): per-source token totals, an alpha=0.5 temperature
    weight — kept EXACT as ``isqrt(n_tokens)`` integers rather than a
    float pow — and the normalized sampling share in ppm
    (``w * 1e6 // sum(w)``). Returns (source, n_tokens, w_isqrt,
    share_ppm) ordered by source.

    One streaming pass: per-batch (source, token-count) partials, ONE
    |sources|-bounded groupby, and the isqrt/share arithmetic runs on
    the driver over |sources| rows. ``alpha_sqrt=False`` degenerates
    to proportional weights (w = n_tokens) for an alpha=1 mix.
    """
    import math

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        src = t[by].to_pylist()
        n = np.fromiter((len(tokens_of(x)) for x in t[text_col].to_pylist()),
                        dtype=np.int64, count=t.num_rows)
        d = pd.DataFrame({by: src, "n": n}).groupby(by, sort=False)["n"].sum()
        return pa.table({by: pa.array(d.index.to_list(), pa.string()),
                         "n_tokens": pa.array(d.to_numpy(), pa.int64())})

    agg = (
        docs.select_columns([by, text_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(by)
        .aggregate(Sum("n_tokens", alias_name="n_tokens"))
        .to_pandas()
    )
    n = agg["n_tokens"].astype("int64")
    w = (np.fromiter((math.isqrt(int(x)) for x in n), dtype=np.int64,
                     count=len(n))
         if alpha_sqrt else n.to_numpy())
    tot = int(w.sum())
    share = (w.astype(object) * 1_000_000 // tot).astype(np.int64) \
        if tot else np.zeros(len(w), dtype=np.int64)
    out = pd.DataFrame({by: agg[by], "n_tokens": n,
                        "w_isqrt": w, "share_ppm": share})
    return out.sort_values(by).reset_index(drop=True)


def unigram_surprisal(docs, scale: int = 1000, text_col="text",
                      id_col="doc_id",
                      max_broadcast_bytes: int = 256 << 20,
                      num_partitions: int | None = None):
    """CCNet-style corpus-LM quality score per document (Wenzek et al.
    2019 filter on LM perplexity), kept exact-integer: each token
    occurrence contributes ``bit_length(U) - bit_length(c)`` (U = total
    corpus token occurrences, c = corpus count of the token) — the
    integer log2 band of the occurrence's surprisal ``-log2 p(token)``,
    within 1 bit of the float value, so the distributed result is
    bit-reproducible and SQL-certifiable (the repo-wide fixed-point
    rule; float ``ln`` differs between numpy and DuckDB libms, measured
    this round). High mean surprisal = rare-token / low-LM-likelihood
    text, the tail CCNet's head/middle/tail split discards.

    Scale shape: token counts reduce through per-batch vocabulary
    partials + one ``groupby(token)`` (the heavy_hitters shape); U is
    one tiny aggregate over the vocab table. Under
    ``max_broadcast_bytes`` (vocab rows x ~32 B) the count table
    broadcasts once via ``ray.put`` and scoring is a stateless
    map_batches; past the gate NOTHING corpus-proportional reaches the
    driver — per-doc (doc_id, token, occ) rows hash-join the
    distributed count table and one ``groupby(doc_id)`` sums the
    contributions (the ngram_novelty_shuffled shape). Both paths are
    pinned equal in pytest. Returns
    (doc_id, n_tokens, surprisal_bits, mean_surprisal_milli) for docs
    with >= 1 token; mean is ``surprisal_bits * scale // n_tokens``
    (non-negative, so floor == truncate and the DuckDB ``//`` twin is
    exact)."""
    from ray.data.aggregate import Sum

    base = docs.select_columns([id_col, text_col])

    def count_partial(t: pa.Table) -> pa.Table:
        cnt: dict[str, int] = {}
        for x in t[text_col].to_pylist():
            for tok in tokens_of(x):
                cnt[tok] = cnt.get(tok, 0) + 1
        ks = list(cnt)
        return pa.table({
            "token": pa.array(ks, pa.string()),
            "n": pa.array([cnt[k] for k in ks], pa.int64()),
        })

    counts = (
        base.map_batches(count_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="c"))
        .materialize()  # vocab-bounded; consumed twice (U + attach)
    )
    total = counts.sum("c") or 0
    if total == 0:
        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "surprisal_bits": pa.array([], pa.int64()),
            "mean_surprisal_milli": pa.array([], pa.int64()),
        }))
    bit_u = int(total).bit_length()
    n_vocab = counts.count()

    if n_vocab * 32 <= max_broadcast_bytes:
        # broadcast path: one (token -> bit_length(count)) dict per node
        pdf = counts.to_pandas()
        bits = {t: int(c).bit_length()
                for t, c in zip(pdf["token"], pdf["c"])}
        ref = ray.put(bits)

        def score(t: pa.Table) -> pa.Table:
            lut = ray.get(ref)
            ids, nt, sb = [], [], []
            for did, x in zip(t[id_col].to_pylist(),
                              t[text_col].to_pylist()):
                toks = tokens_of(x)
                if not toks:
                    continue
                ids.append(did)
                nt.append(len(toks))
                sb.append(sum(bit_u - lut[tok] for tok in toks))
            nta = np.asarray(nt, dtype=np.int64)
            sba = np.asarray(sb, dtype=np.int64)
            return pa.table({
                id_col: pa.array(ids, pa.int64()),
                "n_tokens": pa.array(nta, pa.int64()),
                "surprisal_bits": pa.array(sba, pa.int64()),
                "mean_surprisal_milli": pa.array(
                    sba * scale // np.maximum(nta, 1), pa.int64()),
            })

        return base.map_batches(score, batch_format="pyarrow")

    # join path: per-doc (token, occ) rows ⋈ counts, then one
    # groupby(doc_id) — token rows never leave the cluster
    if num_partitions is None:
        from .joins import default_join_partitions

        num_partitions = default_join_partitions()

    def explode(t: pa.Table) -> pa.Table:
        ids, toks, occ, nt = [], [], [], []
        for did, x in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            cnt: dict[str, int] = {}
            for tok in tokens_of(x):
                cnt[tok] = cnt.get(tok, 0) + 1
            n = sum(cnt.values())
            for tok, k in cnt.items():
                ids.append(did)
                toks.append(tok)
                occ.append(k)
                nt.append(n)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "token": pa.array(toks, pa.string()),
            "occ": pa.array(occ, pa.int64()),
            "n_tokens": pa.array(nt, pa.int64()),
        })

    rows = base.map_batches(explode, batch_format="pyarrow")
    joined = rows.join(counts, join_type="inner",
                       num_partitions=num_partitions, on=("token",))

    def contrib(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        occ = t["occ"].to_numpy(zero_copy_only=False)
        # vectorized bit_length for positive int64 < 2^53 via frexp
        bits = np.frexp(c.astype(np.float64))[1].astype(np.int64)
        return pa.table({
            id_col: t[id_col],
            "n_tokens": t["n_tokens"],
            "sb": pa.array((bit_u - bits) * occ, pa.int64()),
        })

    # n_tokens repeats identically on every (doc, token) row; Max
    # recovers it (Sum would multiply by the distinct-token count).
    from ray.data.aggregate import Max

    agg = (
        joined.map_batches(contrib, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(Sum("sb", alias_name="surprisal_bits"),
                   Max("n_tokens", alias_name="n_tokens"))
    )

    def project(t: pa.Table) -> pa.Table:
        sb = t["surprisal_bits"].to_numpy(zero_copy_only=False)
        nt = t["n_tokens"].to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: t[id_col],
            "n_tokens": pa.array(nt, pa.int64()),
            "surprisal_bits": pa.array(sb, pa.int64()),
            "mean_surprisal_milli": pa.array(
                sb * scale // np.maximum(nt, 1), pa.int64()),
        })

    return agg.map_batches(project, batch_format="pyarrow")


def phrase_search(docs, phrase, text_col="text", id_col="doc_id"):
    """Exact token-phrase search over the corpus: for every document
    containing the phrase as a CONSECUTIVE token run (tokens_of
    tokenization, overlapping matches counted — "a a a" contains
    "a a" twice), returns (doc_id, n_matches, first_pos) with first_pos
    the 1-based token position of the earliest match — the positional
    posting-list query of a Lucene-family index, evaluated here as one
    stateless scan.

    Scale shape: a single stateless map_batches with a vectorized
    per-doc window compare (numpy sliding equality over the token
    array; no exchange, no driver state) — the right one-off shape.
    A standing query workload amortizes this through a PERSISTED
    positional index instead (the postings_varint_bytes layout plus a
    position column, bucketed by token like write_ivf_index buckets by
    cell); this scan is also that index's build-side verifier."""
    phrase = [p.lower() for p in phrase]
    if len(phrase) < 1:
        raise ValueError("phrase must have at least one token")
    k = len(phrase)

    def scan(t: pa.Table) -> pa.Table:
        ids, nm, fp = [], [], []
        for did, x in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            toks = tokens_of(x)
            n = len(toks)
            if n < k:
                continue
            arr = np.asarray(toks, dtype=object)
            mask = arr[: n - k + 1] == phrase[0]
            for j in range(1, k):
                mask &= arr[j: n - k + 1 + j] == phrase[j]
            c = int(mask.sum())
            if c:
                ids.append(did)
                nm.append(c)
                fp.append(int(np.argmax(mask)) + 1)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_matches": pa.array(nm, pa.int64()),
            "first_pos": pa.array(fp, pa.int64()),
        })

    return docs.select_columns([id_col, text_col]).map_batches(
        scan, batch_format="pyarrow"
    )


def write_positional_index(docs, out_dir: str, num_buckets: int = 64,
                           text_col="text", id_col="doc_id") -> int:
    """Persist a BUILD-ONCE positional inverted index — the amortized
    standing-query path phrase_search's one-off scan names:

    * ``postings/bucket=B/*.parquet`` — (doc_id, token, pos) rows
      (1-based token positions), hive-partitioned by
      ``bucket = blake64(token) % num_buckets`` and written
      DISTRIBUTED via partition_cols: a query for a phrase touches
      only its tokens' bucket directories, so bytes read scale with
      the probed fraction, never the corpus.
    * ``manifest.parquet`` — (num_buckets, n_docs, n_postings),
      written LAST as the build-complete marker (a crashed partial
      build never looks finished — the write_ivf_index discipline).

    Deterministic: same corpus -> same artifact. Returns n_postings."""
    import os

    import pyarrow.parquet as pq

    from .hashing import _token_hash

    base = docs.select_columns([id_col, text_col])

    def explode(t: pa.Table) -> pa.Table:
        ids, toks, pos, bks = [], [], [], []
        for did, x in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            for p, tok in enumerate(tokens_of(x), start=1):
                ids.append(did)
                toks.append(tok)
                pos.append(p)
                bks.append(int(_token_hash(tok)) % num_buckets)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "token": pa.array(toks, pa.string()),
            "pos": pa.array(pos, pa.int64()),
            "bucket": pa.array(bks, pa.int64()),
        })

    rows = base.map_batches(explode, batch_format="pyarrow").materialize()
    n_postings = rows.count()
    n_docs = docs.count()
    os.makedirs(out_dir, exist_ok=True)
    rows.write_parquet(f"{out_dir}/postings", partition_cols=["bucket"])
    pq.write_table(
        pa.table({
            "num_buckets": pa.array([num_buckets], pa.int64()),
            "n_docs": pa.array([n_docs], pa.int64()),
            "n_postings": pa.array([n_postings], pa.int64()),
        }),
        f"{out_dir}/manifest.parquet",
    )
    return int(n_postings)


def phrase_search_index(index_dir: str, phrase, id_col="doc_id"):
    """Phrase query against a write_positional_index artifact: reads
    ONLY the phrase tokens' bucket directories, with the token-set row
    filter pushed into the parquet scan (row groups whose token
    statistics exclude the phrase never leave storage). Same output
    contract as phrase_search (overlap-counted n_matches, 1-based
    first_pos); equality is pinned in pytest.

    Match logic: a posting (doc, tok, pos) serves every phrase slot j
    with ``phrase[j] == tok`` as a vote for base position ``pos - j``;
    a base with votes from all k DISTINCT slots is a match ((doc, pos)
    rows are unique per slot, so votes are distinct by construction —
    one groupby((doc, base)) count == k, then one tiny groupby(doc)).
    Both exchanges carry only the phrase's posting rows."""
    import os

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    import ray.data as rd
    from ray.data.aggregate import Count, Min

    from .hashing import _token_hash

    man_path = f"{index_dir}/manifest.parquet"
    if not os.path.exists(man_path):
        raise FileNotFoundError(
            f"no completed positional index at {index_dir} (manifest "
            "missing — build with write_positional_index)"
        )
    man = pq.read_table(man_path)
    num_buckets = int(man["num_buckets"][0].as_py())

    phrase = [p.lower() for p in phrase]
    if len(phrase) < 1:
        raise ValueError("phrase must have at least one token")
    k = len(phrase)
    slots: dict[str, list[int]] = {}
    for j, tok in enumerate(phrase):
        slots.setdefault(tok, []).append(j)
    dirs = sorted({
        f"{index_dir}/postings/bucket={int(_token_hash(t)) % num_buckets}"
        for t in slots
    })
    import glob

    files = sorted(
        f for d in dirs if os.path.isdir(d)
        for f in glob.glob(f"{d}/*.parquet")
    )
    if not files:
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "n_matches": pa.array([], pa.int64()),
            "first_pos": pa.array([], pa.int64()),
        }))
    postings = rd.read_parquet(
        files,
        columns=[id_col, "token", "pos"],
        filter=pads.field("token").isin(list(slots)),
    )

    def votes(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        pos = t["pos"].to_numpy(zero_copy_only=False)
        toks = t["token"].to_pylist()
        vi, vb = [], []
        for i in range(len(toks)):
            for j in slots.get(toks[i], ()):
                b = int(pos[i]) - j
                if b >= 1:
                    vi.append(int(ids[i]))
                    vb.append(b)
        return pa.table({
            id_col: pa.array(vi, pa.int64()),
            "base": pa.array(vb, pa.int64()),
        })

    vote_rows = postings.map_batches(votes, batch_format="pyarrow").materialize()
    if vote_rows.count() == 0:
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "n_matches": pa.array([], pa.int64()),
            "first_pos": pa.array([], pa.int64()),
        }))
    full = vote_rows.groupby([id_col, "base"]).aggregate(
        Count(alias_name="nv"))

    def keep_full(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.equal(t["nv"], k)).select([id_col, "base"])

    matched = full.map_batches(keep_full, batch_format="pyarrow").materialize()
    if matched.count() == 0:
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "n_matches": pa.array([], pa.int64()),
            "first_pos": pa.array([], pa.int64()),
        }))
    agg = matched.groupby(id_col).aggregate(
        Count(alias_name="n_matches"), Min("base", alias_name="first_pos"),
    )

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: t[id_col],
            "n_matches": pa.array(
                t["n_matches"].to_numpy(zero_copy_only=False).astype(np.int64),
                pa.int64()),
            "first_pos": pa.array(
                t["first_pos"].to_numpy(zero_copy_only=False).astype(np.int64),
                pa.int64()),
        })

    return agg.map_batches(project, batch_format="pyarrow")


def embedding_semantic_decontaminate(ds, bench_ids, threshold: float = 0.4,
                                     vec_col="embedding", id_col="vec_id"):
    """Semantic eval-set decontamination — the embedding-side sibling
    of the n-gram ``decontaminate``: corpus vectors whose cosine
    against ANY benchmark vector reaches ``threshold`` are flagged
    (the contamination e.g. paraphrased eval questions leave when
    n-gram overlap misses them). Returns (vec_id, max_cos) for flagged
    non-bench vectors.

    Scale shape: the benchmark matrix is |bench|-bounded (gathered via
    a distributed filter, broadcast ONCE via ray.put), and the corpus
    pass is one stateless map_batches matmul — no exchange, no driver
    state proportional to the corpus. The ANN/IVF artifact is the
    amortized path when the bench set itself is huge."""
    import ray

    bench_ids = sorted(int(b) for b in bench_ids)
    bset = set(bench_ids)

    def keep_bench(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t[id_col], pa.array(bench_ids, pa.int64())))

    bench_tbl = (
        ds.select_columns([id_col, vec_col])
        .map_batches(keep_bench, batch_format="pyarrow")
        .to_pandas()  # |bench|-bounded by construction
    )
    if len(bench_tbl) == 0:
        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "max_cos": pa.array([], pa.float64()),
        }))
    from .similarity import _as_matrix, _unit

    bm = _unit(_as_matrix(pa.array(list(bench_tbl[vec_col]))))
    ref = ray.put(bm)

    def scan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "max_cos": pa.array([], pa.float64()),
            })
        b = ray.get(ref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        unit = _unit(_as_matrix(t[vec_col]))
        mx = (unit @ b.T).max(axis=1)
        keep = (mx >= threshold) & ~np.isin(ids, list(bset))
        return pa.table({
            id_col: pa.array(ids[keep].astype(np.int64), pa.int64()),
            "max_cos": pa.array(mx[keep], pa.float64()),
        })

    return ds.select_columns([id_col, vec_col]).map_batches(
        scan, batch_format="pyarrow"
    )
