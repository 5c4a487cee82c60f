"""Text analysis: language-ID, quality signals, token counts,
document fingerprints. All vectorized-per-batch map_batches stages;
the per-doc scalar work uses compiled regexes bound at import."""

from __future__ import annotations

import re

import pyarrow as pa

from .hashing import fingerprint, tokens_of

__all__ = [
    "add_token_counts",
    "add_quality_signals",
    "add_lang_id",
    "add_fingerprint",
    "LinearQualityScorer",
    "score_documents_linear",
    "STOPWORDS",
]

_WORD_OR_PUNCT = re.compile(r"\w+|[^\w\s]")
_PUNCT = re.compile(r"[^\w\s]")
_ALPHA = re.compile(r"[A-Za-z]")

STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "for", "on", "with"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "mit", "von"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "du", "dans", "pour"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "de", "en", "por"},
}


def add_token_counts(ds, text_col="text"):
    """n_tokens = whitespace tokens (== len(text.split()));
    n_bpe_ish = words + punctuation marks (a BPE-shaped proxy)."""

    def fn(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        ws = [len(x.split()) for x in texts]
        bpe = [len(_WORD_OR_PUNCT.findall(x)) for x in texts]
        return t.append_column("n_tokens", pa.array(ws, pa.int64())).append_column(
            "n_bpe_ish", pa.array(bpe, pa.int64())
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def add_quality_signals(ds, text_col="text"):
    """Length / punctuation / stopword / alpha ratios plus a combined
    [0,1] quality score (monotone in the signals, fixed weights)."""
    en = STOPWORDS["en"]

    def fn(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        n_chars, punct_r, stop_r, alpha_r, mean_len, score = [], [], [], [], [], []
        for x in texts:
            n = len(x)
            toks = tokens_of(x)
            nt = len(toks)
            pr = len(_PUNCT.findall(x)) / n if n else 0.0
            sr = (sum(1 for w in toks if w in en) / nt) if nt else 0.0
            ar = len(_ALPHA.findall(x)) / n if n else 0.0
            ml = (sum(map(len, toks)) / nt) if nt else 0.0
            s = max(
                0.0,
                min(
                    1.0,
                    0.3 * min(1.0, nt / 50)
                    + 0.3 * ar
                    + 0.2 * min(1.0, sr * 5)
                    + 0.2 * (1.0 - min(1.0, pr * 5)),
                ),
            )
            n_chars.append(n)
            punct_r.append(pr)
            stop_r.append(sr)
            alpha_r.append(ar)
            mean_len.append(ml)
            score.append(s)
        return (
            t.append_column("q_chars", pa.array(n_chars, pa.int64()))
            .append_column("punct_ratio", pa.array(punct_r, pa.float64()))
            .append_column("stopword_ratio", pa.array(stop_r, pa.float64()))
            .append_column("alpha_ratio", pa.array(alpha_r, pa.float64()))
            .append_column("mean_token_len", pa.array(mean_len, pa.float64()))
            .append_column("quality", pa.array(score, pa.float64()))
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def add_lang_id(ds, text_col="text"):
    """Stopword-profile language ID: argmax profile-hit ratio, ties and
    no-hits -> 'und'. Deterministic (profiles sorted)."""
    profiles = sorted(STOPWORDS.items())

    def fn(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        langs = []
        for x in texts:
            toks = tokens_of(x)
            if not toks:
                langs.append("und")
                continue
            best_lang, best = "und", 0.0
            for lang, words in profiles:
                r = sum(1 for w in toks if w in words) / len(toks)
                if r > best:
                    best_lang, best = lang, r
            langs.append(best_lang if best > 0 else "und")
        return t.append_column("lang_pred", pa.array(langs, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def add_fingerprint(ds, text_col="text"):
    def fn(t: pa.Table) -> pa.Table:
        fps = [fingerprint(x) for x in t[text_col].to_pylist()]
        return t.append_column("fp", pa.array(fps, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


# integer feature weights for the linear quality model (a stand-in for
# a trained fastText/logreg quality classifier; integer so the score is
# exact and SQL-twinnable). score = bias + w . [n_tokens, n_chars,
# n_punct, n_digits]; passes = score > 0.
LINEAR_MODEL_WEIGHTS = {
    "bias": 500,
    "n_tokens": 3,
    "n_chars": -1,
    "n_punct": 20,
    "n_digits": -5,
}


class LinearQualityScorer:
    """Actor-pool model-scoring stage: the weight vector is loaded ONCE
    per actor in ``__init__`` (the model-load slot — a real deployment
    would mmap a fastText/ONNX model here), each ``__call__`` scores a
    batch with one numpy integer matmul. Integer features + integer
    weights => the score is exact (no float summation order), so the
    whole inference stage is DuckDB-certifiable.

    Use via ``ds.map_batches(LinearQualityScorer, concurrency=N,
    batch_size=B)``; see ``score_documents_linear``.
    """

    _TOKEN = re.compile(r"\S+")
    _SENT_PUNCT = re.compile(r"[.!?]")
    _DIGIT = re.compile(r"[0-9]")

    def __init__(self, weights: dict | None = None):
        import numpy as np

        w = dict(LINEAR_MODEL_WEIGHTS if weights is None else weights)
        self.bias = int(w.pop("bias", 0))
        self.names = ["n_tokens", "n_chars", "n_punct", "n_digits"]
        self.w = np.array([w[n] for n in self.names], dtype=np.int64)

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np

        texts = t["text"].to_pylist()
        feats = np.empty((len(texts), 4), dtype=np.int64)
        feats[:, 0] = [len(self._TOKEN.findall(x)) for x in texts]
        feats[:, 1] = t["n_chars"].to_numpy(zero_copy_only=False)
        feats[:, 2] = [len(self._SENT_PUNCT.findall(x)) for x in texts]
        feats[:, 3] = [len(self._DIGIT.findall(x)) for x in texts]
        score = self.bias + feats @ self.w
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "score": pa.array(score, pa.int64()),
                "passes": pa.array(score > 0),
            }
        )


def score_documents_linear(docs_ds, concurrency: int = 4, batch_size: int = 256):
    """Score every document with the linear quality model on an actor
    pool (weights loaded once per actor). Returns (doc_id, score,
    passes)."""
    return docs_ds.select_columns(["doc_id", "text", "n_chars"]).map_batches(
        LinearQualityScorer,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


GOPHER_STOPWORDS = ("the", "a", "and", "of", "to")


def gopher_quality_flags(docs, min_words: int = 50, max_words: int = 100_000,
                         min_mean_len: int = 4, max_mean_len: int = 10,
                         min_stopwords: int = 2,
                         text_col="text", id_col="doc_id"):
    """Gopher-style document quality RULES (Rae et al. 2021, A1.1 —
    adapted to this corpus's ranges so every rule discriminates): word
    count in [min_words, max_words], mean word length in
    [min_mean_len, max_mean_len], and >= min_stopwords distinct
    common-word hits (the English-likeness gate). All evidence is kept
    integer (word counts, summed word lengths, mean bounds via integer
    cross-multiplication `lo*n <= sum_len <= hi*n`) so the flags are
    bit-reproducible and SQL-certifiable. One stateless vectorized
    map_batches — streams at corpus scale. Returns (doc_id, n_words,
    sum_word_len, n_stop, ok_words, ok_mean_len, ok_stopwords, keep).
    """
    import numpy as np

    stop = set(GOPHER_STOPWORDS)

    def flags(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        n_w, s_l, n_s = [], [], []
        for x in t[text_col].to_pylist():
            words = x.split()
            n_w.append(len(words))
            s_l.append(sum(len(w) for w in words))
            n_s.append(len(stop.intersection(words)))
        n = np.asarray(n_w, dtype=np.int64)
        s = np.asarray(s_l, dtype=np.int64)
        ns = np.asarray(n_s, dtype=np.int64)
        ok_w = (n >= min_words) & (n <= max_words)
        ok_m = (min_mean_len * n <= s) & (s <= max_mean_len * n) & (n > 0)
        ok_s = ns >= min_stopwords
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_words": pa.array(n, pa.int64()),
                "sum_word_len": pa.array(s, pa.int64()),
                "n_stop": pa.array(ns, pa.int64()),
                "ok_words": pa.array(ok_w),
                "ok_mean_len": pa.array(ok_m),
                "ok_stopwords": pa.array(ok_s),
                "keep": pa.array(ok_w & ok_m & ok_s),
            }
        )

    return docs.select_columns([id_col, text_col]).map_batches(
        flags, batch_format="pyarrow"
    )


def script_ratios(docs, text_col="text", id_col="doc_id"):
    """Unicode script composition per doc — the multilingual-pipeline
    routing signal (ASCII-letter / digit / whitespace / non-ASCII
    counts; a Latin-script doc claiming lang=zh, or a mostly-non-ASCII
    doc in an English corpus, is a mislabel flag). Vectorized over
    UTF-32 codepoint views (np.frombuffer — no per-char Python, the
    bpe_merge_candidates idiom); every output is an exact int64
    count."""

    import numpy as np

    def fn(t: pa.Table) -> pa.Table:
        n_alpha, n_digit, n_space, n_non_ascii = [], [], [], []
        for s in t[text_col].to_pylist():
            cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
            lower = (cp >= 0x61) & (cp <= 0x7A)
            upper = (cp >= 0x41) & (cp <= 0x5A)
            n_alpha.append(int((lower | upper).sum()))
            n_digit.append(int(((cp >= 0x30) & (cp <= 0x39)).sum()))
            # RE2 \s: [ \t\n\r\f\v]
            n_space.append(
                int(np.isin(cp, (0x20, 0x09, 0x0A, 0x0D, 0x0C, 0x0B)).sum())
            )
            n_non_ascii.append(int((cp > 0x7F).sum()))
        return pa.table(
            {
                id_col: t[id_col],
                "n_chars": pa.array(
                    [len(s) for s in t[text_col].to_pylist()], pa.int64()
                ),
                "n_ascii_alpha": pa.array(n_alpha, pa.int64()),
                "n_digit": pa.array(n_digit, pa.int64()),
                "n_space": pa.array(n_space, pa.int64()),
                "n_non_ascii": pa.array(n_non_ascii, pa.int64()),
            }
        )

    return docs.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow"
    )
