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
