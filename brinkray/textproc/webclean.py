"""Web-corpus cleaning operators: paragraph-level (line-level) exact
dedup a la CCNet/RefinedWeb, PII redaction, and exact token-length
percentiles. All three are SQL-twinnable (driver-certifiable against
DuckDB) by construction:

- ``paragraph_dedup`` matches paragraphs by EXACT raw string equality
  (engine side: 64-bit blake2b of the raw bytes; the SQL twin groups
  the strings themselves), so both sides compute the same removal set.
- ``pii_scrub`` uses RE2 via ``pyarrow.compute`` and DuckDB's regex
  functions are also RE2 — the identical pattern strings produce
  byte-identical redactions (validated in tests).
- ``token_length_percentiles`` reproduces DuckDB's ``quantile_disc``
  semantics exactly (1-based rank ``max(1, ceil(q*n))``) from a
  distributed histogram.

Scale shapes mirror the rest of the textproc family (see
``curation.ngram_novelty``): wide state crosses the cluster only as
(uint64 hash, partial count) rows through ONE groupby; the surviving
duplicate-paragraph hash set is broadcast once with ``ray.put`` and
probed per batch with a single ``np.searchsorted``. No corpus-scale
driver materialization anywhere: the percentile histogram is bounded by
the distinct token-count values (a few thousand rows), and the shared
paragraph set is bounded by the number of CROSS-DOC duplicated
paragraphs (small on a deduplicated corpus; its size is logged so a
boilerplate-heavy corpus is visible, not silent).

Reference parity note: the reference engine (djavorszky/brink) has no
corpus-cleaning operators — these extend the engine for the
LLM-training-data pipeline the north rule targets, alongside
textproc/dedup.py and textproc/curation.py.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

import ray

from .hashing import blake64

__all__ = [
    "paragraph_dedup",
    "paragraph_dedup_shuffled",
    "pii_scrub",
    "token_length_percentiles",
    "grouped_token_quantiles",
    "int_quantile_disc",
    "EMAIL_RE",
    "IPV4_RE",
]

log = logging.getLogger(__name__)

# RE2 syntax, shared verbatim with the DuckDB twins (both engines are
# RE2, so the pattern STRING is the single source of truth).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def _para_hashes(text: str) -> tuple[list[str], np.ndarray]:
    """Split on '\\n' (keeping empty segments, matching both
    ``str.split`` and DuckDB ``string_split``) and hash each segment's
    raw bytes. Empty segments get a sentinel that never enters the
    duplicate set."""
    paras = text.split("\n")
    h = np.fromiter(
        (blake64(p.encode()) if p else 0 for p in paras),
        dtype=np.uint64,
        count=len(paras),
    )
    return paras, h


def paragraph_dedup(docs, min_docs: int = 2, text_col="text", id_col="doc_id"):
    """CCNet-style paragraph-level exact dedup: a paragraph (a
    '\\n'-separated segment) that occurs in >= ``min_docs`` DISTINCT
    documents is boilerplate — remove ALL its occurrences everywhere.
    Returns (doc_id, n_paras, n_removed, text_clean) where
    ``text_clean`` is the kept segments rejoined with '\\n'.

    Empty segments never participate (they are kept verbatim — a blank
    line is structure, not content).

    Scale: pass 1 ships only (hash, partial distinct-doc count) rows
    into one groupby (per-batch pre-aggregation, the combiner pattern);
    the duplicated-hash set comes back as one sorted uint64 array,
    ``ray.put`` once, searchsorted per batch in pass 2. The full token
    stream never crosses the cluster and never reaches the driver.
    """
    from ray.data.aggregate import Sum

    def explode(t: pa.Table) -> pa.Table:
        per_doc = []
        for x in t[text_col].to_pylist():
            _, h = _para_hashes(x)
            hh = h[h != 0]
            if len(hh):
                per_doc.append(np.unique(hh))
        if per_doc:
            u, c = np.unique(np.concatenate(per_doc), return_counts=True)
        else:
            u = np.array([], dtype=np.uint64)
            c = np.array([], dtype=np.int64)
        # int64 bit view: uint64 >= 2^63 trips Ray's shuffle-side Arrow
        # conversion and silently pickles the block (equality-only use,
        # so the reinterpretation is free)
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

    def keep_dup(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t["nd"], min_docs)).select(["h"])

    dup_rows = counts.map_batches(keep_dup, batch_format="pyarrow").take_all()
    dup = np.sort(np.asarray([r["h"] for r in dup_rows], dtype=np.int64))
    log.info("paragraph_dedup: %d paragraphs shared by >=%d docs", len(dup), min_docs)
    ref = ray.put(dup)

    def scrub(t: pa.Table) -> pa.Table:
        shared = ray.get(ref)
        ids = t[id_col].to_pylist()
        n_paras, n_removed, cleaned = [], [], []
        for x in t[text_col].to_pylist():
            paras, h = _para_hashes(x)
            hv = h.view(np.int64)  # probe in the same int64 bit space
            if len(shared):
                pos = np.searchsorted(shared, hv)
                pos[pos == len(shared)] = 0
                hit = (shared[pos] == hv) & (hv != 0)
            else:
                hit = np.zeros(len(h), dtype=bool)
            kept = [p for p, bad in zip(paras, hit) if not bad]
            n_paras.append(len(paras))
            n_removed.append(len(paras) - len(kept))
            cleaned.append("\n".join(kept))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_paras": pa.array(n_paras, pa.int64()),
                "n_removed": pa.array(n_removed, pa.int64()),
                "text_clean": pa.array(cleaned, pa.string()),
            }
        )

    return docs.select_columns([id_col, text_col]).map_batches(
        scrub, batch_format="pyarrow"
    )


def paragraph_dedup_shuffled(docs, min_docs: int = 2, text_col="text",
                             id_col="doc_id",
                             num_partitions: int | None = None):
    """``paragraph_dedup`` for boilerplate-heavy corpora where the
    shared-paragraph set is corpus-proportional and too large to
    ``take_all()`` + broadcast (the VERDICT-flagged 100-TB failure of
    the broadcast path): the duplicated-hash set stays distributed and
    reaches each document through Ray's native hash-shuffle join
    instead — nothing corpus-scale ever reaches the driver or a single
    task.

    Shape: (doc_id, h) paragraph-hash rows -> groupby(h) distinct-doc
    counts (per-batch pre-aggregated) -> filter to >= min_docs ->
    inner-join back to the hash rows (hash-partitioned) -> per-doc hit
    LISTS via groupby(doc_id) -> one left join onto the docs (text
    moves exactly once) -> vectorized scrub. Same output as
    ``paragraph_dedup``; equality is pinned in pytest and both modes
    share the SQL twin.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    from .joins import default_join_partitions

    if num_partitions is None:
        num_partitions = default_join_partitions()

    base = docs.select_columns([id_col, text_col])

    def explode_pairs(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
        out_id, out_h = [], []
        for i, x in zip(ids, t[text_col].to_pylist()):
            _, h = _para_hashes(x)
            hh = np.unique(h[h != 0])
            out_id.append(np.full(len(hh), i, dtype=np.int64))
            out_h.append(hh.view(np.int64))  # int64 view: join-safe keys
        return pa.table(
            {
                id_col: pa.array(
                    np.concatenate(out_id) if out_id else [], pa.int64()
                ),
                "h": pa.array(np.concatenate(out_h) if out_h else [], pa.int64()),
            }
        )

    rows = base.map_batches(explode_pairs, batch_format="pyarrow").materialize()

    def hash_partials(t: pa.Table) -> pa.Table:
        h = t["h"].to_numpy(zero_copy_only=False)
        u, c = np.unique(h, return_counts=True)  # rows are doc-distinct
        return pa.table(
            {"h": pa.array(u, pa.int64()), "nd": pa.array(c, pa.int64())}
        )

    def keep_dup(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t["nd"], min_docs)).select(["h"])

    shared = (
        rows.map_batches(hash_partials, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("nd", alias_name="nd"))
        .map_batches(keep_dup, batch_format="pyarrow")
    )

    hits = rows.join(
        shared, join_type="inner", num_partitions=num_partitions, on=("h",)
    ).materialize()  # barrier: two native joins in one streaming
    # execution deadlock small clusters (rayfix/NOTES — aggregator
    # pools reserve each other's CPUs)

    def collect(g: pd.DataFrame) -> pd.DataFrame:
        # bytes, not list<int64>: Ray's native join rejects list-typed
        # payload columns ("not supported in join non-key field")
        return pd.DataFrame(
            {
                id_col: [int(g[id_col].iloc[0])],
                "hs": [np.sort(g["h"].to_numpy().astype(np.int64)).tobytes()],
            }
        )

    per_doc = hits.groupby(id_col).map_groups(collect, batch_format="pandas")
    joined = base.join(
        per_doc, join_type="left_outer", num_partitions=num_partitions,
        on=(id_col,),
    )

    def scrub(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        hs_col = t["hs"].to_pylist()
        n_paras, n_removed, cleaned = [], [], []
        for x, hs in zip(t[text_col].to_pylist(), hs_col):
            paras, h = _para_hashes(x)
            if hs:
                shared_a = np.frombuffer(hs, dtype=np.int64)
                hv = h.view(np.int64)
                pos = np.searchsorted(shared_a, hv)
                pos[pos == len(shared_a)] = 0
                hit = (shared_a[pos] == hv) & (hv != 0)
            else:
                hit = np.zeros(len(h), dtype=bool)
            kept = [p for p, bad in zip(paras, hit) if not bad]
            n_paras.append(len(paras))
            n_removed.append(len(paras) - len(kept))
            cleaned.append("\n".join(kept))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_paras": pa.array(n_paras, pa.int64()),
                "n_removed": pa.array(n_removed, pa.int64()),
                "text_clean": pa.array(cleaned, pa.string()),
            }
        )

    return joined.map_batches(scrub, batch_format="pyarrow")


def pii_scrub(docs, text_col="text", id_col="doc_id"):
    """Detect + redact emails then IPv4 addresses (in that order — the
    IP pass runs on the email-redacted text so an IP-shaped mail host
    is counted once, as an email). Returns
    (doc_id, n_emails, n_ipv4, text_redacted).

    Fully Arrow-native: ``pc.count_substring_regex`` /
    ``pc.replace_substring_regex`` kernels, zero Python in the loop —
    a stateless map_batches stage that streams at 100 TB.
    """

    def fn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        txt = t[text_col]
        n_em = pc.count_substring_regex(txt, EMAIL_RE)
        t1 = pc.replace_substring_regex(txt, EMAIL_RE, "<EMAIL>")
        n_ip = pc.count_substring_regex(t1, IPV4_RE)
        red = pc.replace_substring_regex(t1, IPV4_RE, "<IP>")
        return pa.table(
            {
                "doc_id": t[id_col],
                "n_emails": pc.cast(n_em, pa.int64()),
                "n_ipv4": pc.cast(n_ip, pa.int64()),
                "text_redacted": red,
            }
        )

    return docs.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow"
    )


def token_length_percentiles(docs, qs=(0.25, 0.5, 0.75, 0.9, 0.99), text_col="text"):
    """EXACT corpus-wide percentiles of the whitespace token count
    (same kernel as quality.add_token_counts: ``len(text.split())``),
    computed from a distributed histogram — returns a pandas DataFrame
    of (q:float64, n_tokens:int64), matching DuckDB ``quantile_disc``
    bit-for-bit (1-based rank ``max(1, ceil(q*n))`` over the sorted
    multiset).

    Scale: token counts are bounded small integers, so per-batch
    ``np.unique`` partials + one groupby sum move only (value, count)
    rows; the driver sees the merged histogram (thousands of rows at
    most), never the corpus. This is the exact-sibling pattern the
    repo uses elsewhere (hll vs distinct_tokens_exact): an exact
    answer whose driver-side state is CONSTANT in corpus size.
    """
    import math

    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        n = np.array([len(x.split()) for x in t[text_col].to_pylist()], dtype=np.int64)
        u, c = np.unique(n, return_counts=True)
        return pa.table(
            {
                "n_tokens": pa.array(u, pa.int64()),
                "cnt": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    hist_rows = (
        docs.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("n_tokens")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .take_all()
    )
    vals = np.array([r["n_tokens"] for r in hist_rows], dtype=np.int64)
    cnts = np.array([r["cnt"] for r in hist_rows], dtype=np.int64)
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    cum = np.cumsum(cnts)
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        rank = max(1, math.ceil(q * n))  # quantile_disc: 1-based rank
        idx = int(np.searchsorted(cum, rank))
        out_q.append(float(q))
        out_v.append(int(vals[idx]))
    return pd.DataFrame({"q": np.array(out_q, dtype=np.float64), "n_tokens": np.array(out_v, dtype=np.int64)})


def grouped_token_quantiles(docs, by="lang", qs=(0.5, 0.9), text_col="text"):
    """EXACT per-group percentiles of the whitespace token count —
    ``token_length_percentiles`` partitioned by ``by`` (per-language
    length medians are the standard corpus-mix diagnostic). Same
    distributed-histogram shape: per-batch (group, value, count)
    partials, ONE groupby sum, and a driver-side rank walk over the
    merged histogram, whose size is bounded by groups x distinct
    values (languages x plausible doc lengths), never the corpus.
    Returns (``by``, q, n_tokens) with DuckDB quantile_disc rank
    semantics (1-based ``max(1, ceil(q*n))``)."""
    import math

    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        n = np.array([len(x.split()) for x in t[text_col].to_pylist()], dtype=np.int64)
        df = pd.DataFrame({by: t[by].to_pandas(), "n_tokens": n})
        g = df.groupby([by, "n_tokens"], sort=False).size().reset_index(name="cnt")
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = (
        docs.select_columns([by, text_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby([by, "n_tokens"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    out_g, out_q, out_v = [], [], []
    for gval, sub in hist.groupby(by, sort=True):
        sub = sub.sort_values("n_tokens")
        cum = sub["cnt"].cumsum().to_numpy()
        vals = sub["n_tokens"].to_numpy()
        n = int(cum[-1])
        for q in qs:
            rank = max(1, math.ceil(q * n))
            out_g.append(gval)
            out_q.append(float(q))
            out_v.append(int(vals[int(np.searchsorted(cum, rank))]))
    return pd.DataFrame(
        {
            by: out_g,
            "q": np.array(out_q, np.float64),
            "n_tokens": np.array(out_v, np.int64),
        }
    )


def int_quantile_disc(ds, col: str, qs=(0.99,)):
    """EXACT quantile_disc over an INT column via the distributed
    (value, count) histogram: per-batch np.unique partials, ONE
    groupby sum, driver-side rank walk (1-based ``max(1, ceil(q*n))``
    — DuckDB semantics). Driver state is bounded by |distinct values|,
    never the corpus; for ~all-distinct float columns use
    sketch.exact_float_quantiles instead. Returns {q: value}.
    """
    import math

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(v, return_counts=True)
        return pa.table(
            {"v": pa.array(u, pa.int64()),
             "cnt": pa.array(c.astype(np.int64), pa.int64())}
        )

    hist_rows = (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .take_all()
    )
    vals = np.array([r["v"] for r in hist_rows], dtype=np.int64)
    cnts = np.array([r["cnt"] for r in hist_rows], dtype=np.int64)
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    cum = np.cumsum(cnts)
    n = int(cum[-1]) if len(cum) else 0
    out = {}
    for q in qs:
        rank = max(1, math.ceil(q * n))
        out[float(q)] = int(vals[int(np.searchsorted(cum, rank))])
    return out
