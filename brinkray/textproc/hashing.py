"""Stable hashing + tokenization shared by the dedup/quality operators.

Everything is deterministic across processes and runs (blake2b, fixed
seeds) — a cluster-wide shuffle keyed on these hashes must agree
between tasks.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

TOKEN_RE = re.compile(r"[a-z0-9]+")
MERSENNE61 = np.uint64((1 << 61) - 1)
NUM_PERM = 64
SHINGLE_K = 3

_rng = np.random.default_rng(0xB81C)  # fixed: permutation params are part of the format
MINHASH_A = _rng.integers(1, 1 << 61, size=NUM_PERM, dtype=np.uint64) | np.uint64(1)
MINHASH_B = _rng.integers(0, 1 << 61, size=NUM_PERM, dtype=np.uint64)


def blake64(data: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "big")


def tokens_of(text: str) -> list[str]:
    return TOKEN_RE.findall(text.lower())


from functools import lru_cache


@lru_cache(maxsize=1 << 17)
def _token_hash(tok: str) -> int:
    return blake64(tok.encode())


_SHINGLE_MIX = np.uint64(0x9E3779B97F4A7C15)


def shingle_hashes(text: str, k: int = SHINGLE_K) -> np.ndarray:
    """k-token shingles -> uint64 hashes (short docs: one whole-text
    shingle). Token hashes are memoized and shingle hashes combined
    arithmetically (position-weighted mix) — no per-shingle string
    building, no per-shingle blake2b."""
    toks = tokens_of(text)
    if len(toks) < k:
        return np.array([blake64(" ".join(toks).encode())], dtype=np.uint64)
    th = np.fromiter(
        (_token_hash(t) for t in toks), dtype=np.uint64, count=len(toks)
    )
    n = len(toks) - k + 1
    with np.errstate(over="ignore"):
        out = np.zeros(n, dtype=np.uint64)
        w = np.uint64(1)
        for j in range(k - 1, -1, -1):
            out += th[j : j + n] * w
            w *= _SHINGLE_MIX
    return out


def minhash_signature(sh: np.ndarray) -> np.ndarray:
    """NUM_PERM-wide signature via universal hashing mod 2^61-1."""
    x = sh.astype(np.uint64)[:, None]
    with np.errstate(over="ignore"):
        hashed = (x * MINHASH_A[None, :] + MINHASH_B[None, :]) % MERSENNE61
    return hashed.min(axis=0)


def band_hashes(sig: np.ndarray, bands: int) -> list[int]:
    rows = len(sig) // bands
    return [
        blake64(sig[b * rows : (b + 1) * rows].tobytes()) & ((1 << 62) - 1)
        for b in range(bands)
    ]


def simhash64(text: str) -> int:
    toks = tokens_of(text)
    if not toks:
        return 0
    h = np.fromiter((blake64(t.encode()) for t in toks), dtype=np.uint64, count=len(toks))
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).sum(
        axis=0
    )
    sig = (2 * bits > len(toks)).astype(np.uint64)
    return int((sig << np.arange(64, dtype=np.uint64)).sum())


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def md5_lower64(data: str) -> int:
    """Little-endian uint64 of the LAST 8 md5 bytes — bit-identical to
    DuckDB's ``md5_number_lower()`` (verified against DuckDB 1.0), so
    any operator keyed on this hash is SQL-twinnable end to end."""
    return int.from_bytes(hashlib.md5(data.encode("utf-8")).digest()[8:], "little")


def md5_lower64_bytes(data: bytes) -> int:
    """md5_lower64 over RAW bytes — for binary payloads (gzip, image
    blobs) that need not be valid UTF-8. Matches DuckDB's
    ``md5_number_lower(blob)``, which accepts BLOB directly."""
    return int.from_bytes(hashlib.md5(data).digest()[8:], "little")


@lru_cache(maxsize=1 << 17)
def _token_hash_md5(tok: str) -> int:
    return md5_lower64(tok)


def simhash64_md5(text: str) -> int:
    """SimHash over md5_lower64 token hashes — same construction as
    :func:`simhash64` but with the DuckDB-reproducible token hash, so
    the signature (and any Hamming-distance predicate on it) can be
    re-derived independently by a SQL oracle. Token-less text returns
    0 (callers that need SQL parity must exclude those docs: SQL's
    per-token aggregation produces no row for them)."""
    toks = tokens_of(text)
    if not toks:
        return 0
    h = np.fromiter(
        (_token_hash_md5(t) for t in toks), dtype=np.uint64, count=len(toks)
    )
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).sum(
        axis=0
    )
    sig = (2 * bits > len(toks)).astype(np.uint64)
    return int((sig << np.arange(64, dtype=np.uint64)).sum())


# explicit ASCII whitespace class: Python's \s and RE2's \s (DuckDB)
# disagree on \v — the explicit class makes the Python operator and its
# SQL twin (regexp_replace(lower(text), '[ \t\n\f\r]+', ' ', 'g'))
# byte-identical by construction
_WS_RE = re.compile(r"[ \t\n\f\r]+")


def fingerprint(text: str) -> str:
    """md5 hex of the whitespace-normalized lowercase text — a stable
    document fingerprint that is SQL-reproducible, so the operator is
    driver-certifiable against DuckDB (the earlier bespoke polynomial
    hash computed the same normalization but had no SQL twin)."""
    norm = _WS_RE.sub(" ", text.lower()).strip(" ")
    return hashlib.md5(norm.encode("utf-8")).hexdigest()
