"""Sharded URL-seen set: Ray actors holding one hash partition each.

The reference keeps the whole seen set in one mutex-guarded in-RAM map
(store/store.go:9-19, crawler.go:40) — a single-node ceiling. Here the
set is hash-partitioned by SHA1(canon_url) across K actors, each
holding a cuckoo filter (fast, ~2 B/key negative checks) plus the exact
digest->status dict needed for cached-status replay (brink.go:83-93).

Wire protocol: all hot-path RPCs (check / reserve / release) carry
16-byte SHA1 digests, not URL strings — at 10^10 URLs the reserve
stream is the engine's biggest serialized payload, and 16 B/key is
~5x smaller than the canon text while keeping the collision
expectation ~1e-19 (64-bit keys would already expect collisions at
that scale). `mark` additionally carries the canon string once per
NOVEL page so the conformance surface (`all_items`: canon -> status)
survives; that stream is bounded by unique pages, not frontier
occurrences.

Atomicity note: the reference's check/fetch/store window is non-atomic
and can double-fetch under races (brink.go:83-103); the engine
eliminates the race structurally — within a wave each canon has exactly
one "winner" row (intra-wave dedup), and `mark` completes before the
next wave's `check` (the wave barrier).

Scale design: K ≈ 2x node count; a shard's state is one numpy matrix +
two dicts, checkpointed per wave via dump()/restore(). Skewed shards
can be rebalanced by moving whole shards to other nodes (shard id ->
actor placement), not by re-hashing keys.
"""

from __future__ import annotations

import numpy as np
import ray

from .cuckoo import CuckooFilter, sha1_16

__all__ = ["SeenShard", "ShardedSeenSet", "shard_of", "digests_of"]


def shard_of(canon: str, nshards: int) -> int:
    return int.from_bytes(sha1_16(canon)[:8], "big") % nshards


def digests_of(canons: list[str]) -> list[bytes]:
    return [sha1_16(c) for c in canons]


def _u64(digest: bytes) -> int:
    return int.from_bytes(digest[:8], "big")


@ray.remote(num_cpus=0)
class SeenShard:
    """One hash partition of the seen set (digest-keyed)."""

    def __init__(self, shard_id: int, capacity: int = 1 << 17,
                 retain_canon: bool = True, track_body: bool = False):
        self.shard_id = shard_id
        self.filter = CuckooFilter(capacity)
        self.status: dict[bytes, int] = {}
        # conditional-GET support (recrawl revalidation): when tracking,
        # mark() stores each url's 16-byte body md5; a SOFT expire
        # (forget(keep_body=True)) keeps it, and the re-mark after the
        # re-fetch compares — unchanged content counts as REVALIDATED
        # (the 304-Not-Modified outcome an If-None-Match request would
        # get), changed content as MODIFIED. +16 B/URL shard memory,
        # so scale runs leave it off unless running refresh passes.
        self.track_body = track_body
        self.body: dict[bytes, bytes] = {}
        # digest -> outcome of the re-mark after a soft expire:
        # False = revalidated (content unchanged), True = modified.
        # Bounded by the refresh pass's expired set, not the corpus.
        self.reval: dict[bytes, bool] = {}
        # digest -> canon string, populated on mark. This is the
        # CONFORMANCE surface only (all_items / items): at 10^10 URLs
        # the canon text (~80 B/URL) dominates shard memory ~40x over
        # the cuckoo+status state, so scale runs set retain_canon=False
        # and the shard stores digests only (items() then raises with a
        # pointer — the crawl's outputs flow through the events sink).
        self.retain_canon = retain_canon
        self.canon: dict[bytes, str] = {}
        # in-flight reservations (scale ordering mode): digest -> the
        # GENERATION (execution counter) that took it. Generation tags
        # make the orphan sweep safe under cross-wave pipelining: the
        # engine sweeps only generations whose execution has fully
        # completed, so a sweep can never kill a reservation held by an
        # in-flight task of a newer execution (an untagged clear-all
        # would double-fetch exactly there).
        self.reserved: dict[bytes, int] = {}

    def check(self, digests: list[bytes]) -> list[int]:
        """Status per digest; -1 = novel. Filter-negative short-circuits
        the dict probe (the common case on a growing crawl)."""
        if not digests:
            return []
        hashes = np.fromiter(
            (_u64(d) for d in digests), dtype=np.uint64, count=len(digests)
        )
        maybe = self.filter.contains_many(hashes)
        return [
            self.status.get(d, -1) if m else -1
            for d, m in zip(digests, maybe)
        ]

    def mark(self, digests: list[bytes], canons: list[str],
             statuses: list[int], body_md5s: list[bytes] | None = None) -> int:
        """Idempotent first-write-wins insert (brink.go:103). With
        ``track_body`` on and ``body_md5s`` given, a first-write whose
        digest still carries a soft-expired body hash is classified
        revalidated (hash unchanged) or modified (hash changed)."""
        n = 0
        retain = self.retain_canon
        track = self.track_body and body_md5s is not None
        for k, (d, c, s) in enumerate(zip(digests, canons, statuses)):
            if d not in self.status:
                self.status[d] = int(s)
                if retain:
                    self.canon[d] = c
                if track:
                    b = body_md5s[k]
                    old = self.body.get(d)
                    if old is not None:
                        self.reval[d] = old != b
                    self.body[d] = b
                self.filter.add_hash(_u64(d))
                n += 1
            self.reserved.pop(d, None)
        return n

    def reval_stats(self) -> tuple[int, int]:
        """(n_revalidated, n_modified) across this shard's re-marks."""
        nm = sum(self.reval.values())
        return len(self.reval) - nm, nm

    def reval_items(self) -> dict[str, bool]:
        """canon -> modified? for every classified re-mark — the
        per-url conformance surface (requires retain_canon)."""
        if not self.retain_canon:
            raise RuntimeError(
                "reval_items() needs retain_canon=True (canon strings "
                "are not kept in scale mode; use reval_stats())"
            )
        # a digest soft-expired (keep_body=True) after its classified
        # re-mark has no canon until the refetch re-marks it — skip it
        # rather than KeyError while it is in flight
        return {
            self.canon[d]: m
            for d, m in self.reval.items()
            if self.canon.get(d) is not None
        }

    def reserve(self, digests: list[bytes], gen: int = 0) -> list[int]:
        """Atomic claim for scale-ordering dedup: per digest, returns the
        stored status (>=0), -1 = caller now owns the fetch, or -2 =
        another in-flight batch owns it (resolve by requeueing).
        ``gen`` tags the claim with the caller's execution generation
        (see ``reserved``)."""
        out = []
        for d in digests:
            st = self.status.get(d)
            if st is not None:
                out.append(st)
            elif d in self.reserved:
                out.append(-2)
            else:
                self.reserved[d] = gen
                out.append(-1)
        return out

    def release(self, digests: list[bytes]) -> None:
        """Drop reservations whose fetch errored (the silent-drop
        branch, brink.go:95-101): the canon stays novel and will be
        re-fetched on rediscovery, like the reference."""
        for d in digests:
            self.reserved.pop(d, None)

    def clear_reservations(self, before_gen: int | None = None) -> int:
        """Orphan sweep: a reservation still held from a COMPLETED
        execution belongs to a task that died between reserve and
        mark/release; clearing lets requeued rows claim it. With
        ``before_gen`` only reservations tagged with an older
        generation are swept — reservations of in-flight executions
        survive (cross-wave pipelining safety). ``None`` sweeps all
        (legacy full-barrier callers)."""
        if before_gen is None:
            n = len(self.reserved)
            self.reserved.clear()
            return n
        stale = [d for d, g in self.reserved.items() if g < before_gen]
        for d in stale:
            del self.reserved[d]
        return len(stale)

    def forget(self, digests: list[bytes], keep_body: bool = False) -> int:
        """Expire entries (recrawl/refresh): the url becomes novel again
        and the next discovery re-fetches it. The cuckoo fingerprint is
        deliberately left in place — cuckoo deletes can evict a
        DIFFERENT key's identical fingerprint (correctness hazard);
        a stale fingerprint only costs the dict probe that already
        backs every filter hit (``check``), and re-marking re-adds at
        most one duplicate fingerprint. ``keep_body=True`` is the SOFT
        expire behind revalidation: the stored body md5 survives so the
        re-mark can classify the re-fetch as revalidated vs modified."""
        n = 0
        for d in digests:
            if self.status.pop(d, None) is not None:
                self.canon.pop(d, None)
                n += 1
            if not keep_body:
                self.body.pop(d, None)
                # a HARD forget erases the revalidation history too:
                # leaving the reval entry behind with canon popped made
                # a later reval_items() KeyError on the orphaned digest
                self.reval.pop(d, None)
            self.reserved.pop(d, None)
        return n

    def size(self) -> int:
        return len(self.status)

    def items(self) -> list[tuple[str, int]]:
        if not self.retain_canon and self.status:
            raise RuntimeError(
                "canon strings were not retained (retain_canon=False "
                "scale mode); use size()/the events sink instead"
            )
        return sorted((self.canon[d], s) for d, s in self.status.items())

    def dump(self) -> dict:
        return {
            "shard_id": self.shard_id,
            "filter": self.filter.dump(),
            "status": dict(self.status),
            "canon": dict(self.canon),
            "retain_canon": self.retain_canon,
            "track_body": self.track_body,
            "body": dict(self.body),
            "reval": dict(self.reval),
        }

    def restore(self, state: dict) -> None:
        if state["status"] and "canon" not in state:
            # pre-digest-protocol dump (canon-keyed status): restoring it
            # silently would treat every URL as novel — fail loudly
            raise ValueError(
                "incompatible seen-shard checkpoint (pre-digest format)"
            )
        self.shard_id = state["shard_id"]
        self.filter = CuckooFilter.restore(state["filter"])
        self.status = dict(state["status"])
        self.canon = dict(state.get("canon", {}))
        self.retain_canon = bool(state.get("retain_canon", True))
        self.track_body = bool(state.get("track_body", False))
        self.body = dict(state.get("body", {}))
        self.reval = dict(state.get("reval", {}))


class ShardedSeenSet:
    """Driver/task-side client over the K shard actors. The handle list
    is cheap to serialize into map_batches closures; calls are batched
    per shard. The public API is canon-based (digests are computed once
    here and reused for routing + wire keys); `*_digests` variants let
    the fetch hot path hash each canon exactly once per batch."""

    def __init__(self, nshards: int = 4, capacity_per_shard: int = 1 << 17,
                 actors=None, retain_canon: bool = True,
                 track_body: bool = False):
        self.nshards = nshards
        if actors is not None:
            self.actors = list(actors)
        else:
            self.actors = [
                SeenShard.remote(i, capacity_per_shard, retain_canon,
                                 track_body)
                for i in range(nshards)
            ]

    def _group(self, digests: list[bytes]) -> dict[int, list[int]]:
        groups: dict[int, list[int]] = {}
        n = self.nshards
        for idx, d in enumerate(digests):
            groups.setdefault(_u64(d) % n, []).append(idx)
        return groups

    # -- digest-native hot path -------------------------------------------
    def check_digests(self, digests: list[bytes]) -> list[int]:
        out = [-1] * len(digests)
        groups = self._group(digests)
        futs = {
            s: self.actors[s].check.remote([digests[i] for i in idxs])
            for s, idxs in groups.items()
        }
        for s, idxs in groups.items():
            for i, st in zip(idxs, ray.get(futs[s])):
                out[i] = st
        return out

    def reserve_digests(self, digests: list[bytes], gen: int = 0) -> list[int]:
        out = [-1] * len(digests)
        groups = self._group(digests)
        futs = {
            s: self.actors[s].reserve.remote([digests[i] for i in idxs], gen)
            for s, idxs in groups.items()
        }
        for s, idxs in groups.items():
            for i, st in zip(idxs, ray.get(futs[s])):
                out[i] = st
        return out

    def mark_digests_async(
        self, digests: list[bytes], canons: list[str], statuses: list[int],
        body_md5s: list[bytes] | None = None,
    ) -> list:
        """Issue the mark RPCs without blocking; the caller MUST
        ray.get() the returned futures before its task returns (the
        wave barrier is what makes marks visible to the next wave) —
        this lets the fetch stage overlap marking with extraction."""
        groups = self._group(digests)
        return [
            self.actors[s].mark.remote(
                [digests[i] for i in idxs],
                [canons[i] for i in idxs],
                [statuses[i] for i in idxs],
                [body_md5s[i] for i in idxs] if body_md5s is not None
                else None,
            )
            for s, idxs in groups.items()
        ]

    def mark_digests(
        self, digests: list[bytes], canons: list[str], statuses: list[int],
        body_md5s: list[bytes] | None = None,
    ) -> None:
        ray.get(self.mark_digests_async(digests, canons, statuses, body_md5s))

    def release_digests(self, digests: list[bytes]) -> None:
        groups = self._group(digests)
        ray.get(
            [
                self.actors[s].release.remote([digests[i] for i in idxs])
                for s, idxs in groups.items()
            ]
        )

    def forget_digests(self, digests: list[bytes],
                       keep_body: bool = False) -> int:
        """Expire entries shard-wise (recrawl/refresh); returns the
        number that existed. ``keep_body=True`` = soft expire (the
        revalidation path)."""
        groups = self._group(digests)
        return sum(
            ray.get(
                [
                    self.actors[s].forget.remote(
                        [digests[i] for i in idxs], keep_body)
                    for s, idxs in groups.items()
                ]
            )
        )

    def reval_stats(self) -> tuple[int, int]:
        """Summed (n_revalidated, n_modified) across shards."""
        pairs = ray.get([a.reval_stats.remote() for a in self.actors])
        return (sum(p[0] for p in pairs), sum(p[1] for p in pairs))

    def reval_items(self) -> dict[str, bool]:
        """Merged canon -> modified? classification across shards
        (conformance surface; scale runs read reval_stats())."""
        out: dict[str, bool] = {}
        for d in ray.get([a.reval_items.remote() for a in self.actors]):
            out.update(d)
        return out

    # -- canon-based API ---------------------------------------------------
    def check(self, canons: list[str]) -> list[int]:
        """Batched status lookup; -1 = novel."""
        return self.check_digests(digests_of(canons))

    def mark(self, canons: list[str], statuses: list[int],
             body_md5s: list[bytes] | None = None) -> None:
        self.mark_digests(digests_of(canons), canons, statuses, body_md5s)

    def reserve(self, canons: list[str], gen: int = 0) -> list[int]:
        return self.reserve_digests(digests_of(canons), gen)

    def release(self, canons: list[str]) -> None:
        self.release_digests(digests_of(canons))

    def forget(self, canons: list[str], keep_body: bool = False) -> int:
        return self.forget_digests(digests_of(canons), keep_body)

    def size(self) -> int:
        return sum(ray.get([a.size.remote() for a in self.actors]))

    def all_items(self) -> dict[str, int]:
        out: dict[str, int] = {}
        for items in ray.get([a.items.remote() for a in self.actors]):
            out.update(items)
        return out

    def shard_sizes(self) -> list[int]:
        return ray.get([a.size.remote() for a in self.actors])

    def rebalance_shard(self, shard_id: int, **actor_options) -> None:
        """Skew-aware rebalancing: move one whole shard's state to a
        fresh actor — on a real cluster ``actor_options`` carries
        scheduling hints (e.g. a node-affinity strategy) to land the
        hot shard on an underloaded node. Key routing is untouched
        (hash % nshards); this is a wave-boundary operation — the
        engine rebuilds its stage closures from the live actor list
        every run/wave, so in-flight tasks never see the old handle."""
        state = ray.get(self.actors[shard_id].dump.remote())
        new = (
            SeenShard.options(**actor_options).remote(shard_id)
            if actor_options
            else SeenShard.remote(shard_id)
        )
        ray.get(new.restore.remote(state))
        old = self.actors[shard_id]
        self.actors[shard_id] = new
        ray.kill(old)

    def dump(self) -> list[dict]:
        return ray.get([a.dump.remote() for a in self.actors])

    def restore(self, states: list[dict]) -> None:
        ray.get([a.restore.remote(s) for a, s in zip(self.actors, states)])
