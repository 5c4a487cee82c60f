"""Cuckoo filter: the memory-bounded negative-lookup structure backing
the sharded URL-seen set (BASELINE.json north_star: "sharded
cuckoo-filter URL-seen set keyed by canonicalized+SHA1-hashed URLs").

Standard 4-slot-bucket, 16-bit-fingerprint design (Fan, Andersen,
Kaminsky, Mitzenmacher: "Cuckoo Filter: Practically Better Than Bloom",
CoNEXT 2014): ~2.1 bytes/key at 95% load with <0.1% false positives.
At the 10^10-URL design point that is ~21 GB of filter state total,
hash-sharded across seen-set actors (brinkray.state.seen); each shard's
bucket array is one numpy uint16 matrix, serialized wholesale for
checkpoints.

The filter answers "definitely novel" cheaply; the exact status dict
behind it answers replays. A full filter falls back to an overflow set
(never a false negative).
"""

from __future__ import annotations

import hashlib

import numpy as np

__all__ = ["CuckooFilter", "sha1_64", "sha1_16"]

_FP_MUL = np.uint64(0x5BD1E995)  # odd multiplier for partial-key hashing


def sha1_64(key: str | bytes) -> int:
    """First 8 bytes of SHA1(key) as an unsigned int — the canonical
    URL hash used for sharding, fingerprints and bucket choice."""
    if isinstance(key, str):
        key = key.encode("utf-8", "surrogateescape")
    return int.from_bytes(hashlib.sha1(key).digest()[:8], "big")


def sha1_16(key: str | bytes) -> bytes:
    """First 16 bytes of SHA1(key): the wire key for seen-shard RPCs.
    128 bits keeps the collision expectation ~1e-19 even at the
    10^10-URL design point (64-bit digests would already expect ~3
    collisions there); 16 bytes vs a ~70-byte URL cuts RPC pickle
    volume ~5x. The leading 8 bytes equal sha1_64 (shard routing and
    cuckoo fingerprints are unchanged)."""
    if isinstance(key, str):
        key = key.encode("utf-8", "surrogateescape")
    return hashlib.sha1(key).digest()[:16]


class CuckooFilter:
    """4-way buckets, 16-bit fingerprints, numpy-backed."""

    MAX_KICKS = 500

    def __init__(self, capacity: int = 1 << 16, seed: int = 0):
        # bucket count: next power of two of capacity/4 (load target <1)
        n = max(1, int(capacity) // 4)
        nbuckets = 1
        while nbuckets < n:
            nbuckets <<= 1
        self.nbuckets = nbuckets
        self.mask = np.uint64(nbuckets - 1)
        self.buckets = np.zeros((nbuckets, 4), dtype=np.uint16)
        self.overflow: set[int] = set()
        self.count = 0

    # -- key math (plain int arithmetic: the single-key path runs once
    # per marked URL inside the shard actors — numpy scalar ops there
    # cost ~25us/key and become the crawl's serial floor) -------------
    _FP_MUL_INT = 0x5BD1E995

    def _fp_and_buckets(self, h: int) -> tuple[int, int, int]:
        mask = self.nbuckets - 1
        fp = (h >> 48) % 65535 + 1  # 1..65535; 0 means empty
        i1 = h & mask
        i2 = (i1 ^ ((fp * self._FP_MUL_INT) & 0xFFFFFFFFFFFFFFFF)) & mask
        return fp, i1, i2

    def _alt(self, i: int, fp: int) -> int:
        mask = self.nbuckets - 1
        return (i ^ ((fp * self._FP_MUL_INT) & 0xFFFFFFFFFFFFFFFF)) & mask

    # -- single-key ops ----------------------------------------------------
    def add_hash(self, h: int) -> None:
        fp, i1, i2 = self._fp_and_buckets(h)
        b = self.buckets
        for i in (i1, i2):
            for slot in range(4):
                if b[i, slot] == 0:
                    b[i, slot] = fp
                    self.count += 1
                    return
        # evict loop (deterministic per key)
        state = h & 0xFFFFFFFF or 1
        i = i1
        for _ in range(self.MAX_KICKS):
            state = (state * 1103515245 + 12345) & 0x7FFFFFFF
            slot = state & 3
            fp, b[i, slot] = int(b[i, slot]), fp
            i = self._alt(i, fp)
            for s in range(4):
                if b[i, s] == 0:
                    b[i, s] = fp
                    self.count += 1
                    return
        self.overflow.add(fp << 32 | i)  # full: spill, keep correctness
        self.count += 1

    def contains_hash(self, h: int) -> bool:
        fp, i1, i2 = self._fp_and_buckets(h)
        b = self.buckets
        for i in (i1, i2):
            for slot in range(4):
                if b[i, slot] == fp:
                    return True
        return (fp << 32 | i1) in self.overflow or (fp << 32 | i2) in self.overflow

    def add(self, key: str | bytes) -> None:
        self.add_hash(sha1_64(key))

    def __contains__(self, key: str | bytes) -> bool:
        return self.contains_hash(sha1_64(key))

    # -- batch ops (hot path from the seen-shard actors) -------------------
    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership for an array of uint64 hashes."""
        h = hashes.astype(np.uint64, copy=False)
        fp = ((h >> np.uint64(48)) % np.uint64(65535) + np.uint64(1)).astype(np.uint16)
        i1 = (h & self.mask).astype(np.int64)
        i2 = ((i1.astype(np.uint64) ^ (fp.astype(np.uint64) * _FP_MUL)) & self.mask).astype(np.int64)
        hit = (self.buckets[i1] == fp[:, None]).any(axis=1) | (
            self.buckets[i2] == fp[:, None]
        ).any(axis=1)
        if self.overflow:
            for j in np.nonzero(~hit)[0]:
                k1 = int(fp[j]) << 32 | int(i1[j])
                k2 = int(fp[j]) << 32 | int(i2[j])
                if k1 in self.overflow or k2 in self.overflow:
                    hit[j] = True
        return hit

    # -- checkpointing -----------------------------------------------------
    def dump(self) -> dict:
        return {
            "buckets": self.buckets,
            "overflow": np.array(sorted(self.overflow), dtype=np.uint64),
            "count": self.count,
        }

    @classmethod
    def restore(cls, state: dict) -> "CuckooFilter":
        f = cls.__new__(cls)
        # force a writable copy: arrays arriving via ray.get are backed
        # by the read-only object store
        f.buckets = np.array(state["buckets"], dtype=np.uint16, copy=True)
        f.nbuckets = f.buckets.shape[0]
        f.mask = np.uint64(f.nbuckets - 1)
        f.overflow = set(int(x) for x in state["overflow"])
        f.count = int(state["count"])
        return f
