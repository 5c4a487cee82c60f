"""Sharded URL-seen set: Ray actors holding one hash partition each.

The reference keeps the whole seen set in one mutex-guarded in-RAM map
(store/store.go:9-19, crawler.go:40) — a single-node ceiling. Here the
set is hash-partitioned by SHA1(canon_url) across K actors, each
holding a cuckoo filter (fast, ~2 B/key negative checks) plus the exact
canon->status dict needed for cached-status replay (brink.go:83-93).

Atomicity note: the reference's check/fetch/store window is non-atomic
and can double-fetch under races (brink.go:83-103); the engine
eliminates the race structurally — within a wave each canon has exactly
one "winner" row (intra-wave dedup), and `mark` completes before the
next wave's `check` (the wave barrier).

Scale design: K ≈ 2x node count; a shard's state is one numpy matrix +
one dict, checkpointed per wave via dump()/restore(). Skewed shards can
be rebalanced by moving whole shards to other nodes (shard id -> actor
placement), not by re-hashing keys.
"""

from __future__ import annotations

import numpy as np
import ray

from .cuckoo import CuckooFilter, sha1_64

__all__ = ["SeenShard", "ShardedSeenSet", "shard_of"]


def shard_of(canon: str, nshards: int) -> int:
    return sha1_64(canon) % nshards


@ray.remote(num_cpus=0)
class SeenShard:
    """One hash partition of the seen set."""

    def __init__(self, shard_id: int, capacity: int = 1 << 17):
        self.shard_id = shard_id
        self.filter = CuckooFilter(capacity)
        self.status: dict[str, int] = {}
        # in-flight reservations (scale ordering mode): canon -> owner
        self.reserved: set[str] = set()

    def check(self, canons: list[str]) -> list[int]:
        """Status per canon; -1 = novel. Filter-negative short-circuits
        the dict probe (the common case on a growing crawl)."""
        if not canons:
            return []
        hashes = np.fromiter((sha1_64(c) for c in canons), dtype=np.uint64, count=len(canons))
        maybe = self.filter.contains_many(hashes)
        return [
            self.status.get(c, -1) if m else -1
            for c, m in zip(canons, maybe)
        ]

    def mark(self, canons: list[str], statuses: list[int]) -> int:
        """Idempotent first-write-wins insert (brink.go:103)."""
        n = 0
        for c, s in zip(canons, statuses):
            if c not in self.status:
                self.status[c] = int(s)
                self.filter.add(c)
                n += 1
            self.reserved.discard(c)
        return n

    def reserve(self, canons: list[str]) -> list[int]:
        """Atomic claim for scale-ordering dedup: per canon, returns the
        stored status (>=0), -1 = caller now owns the fetch, or -2 =
        another in-flight batch owns it (resolve post-barrier)."""
        out = []
        for c in canons:
            st = self.status.get(c)
            if st is not None:
                out.append(st)
            elif c in self.reserved:
                out.append(-2)
            else:
                self.reserved.add(c)
                out.append(-1)
        return out

    def release(self, canons: list[str]) -> None:
        """Drop reservations whose fetch errored (the silent-drop
        branch, brink.go:95-101): the canon stays novel and will be
        re-fetched on rediscovery, like the reference."""
        for c in canons:
            self.reserved.discard(c)

    def clear_reservations(self) -> int:
        """Wave-boundary sweep: any reservation still held here belongs
        to a task that died between reserve and mark/release; clearing
        lets the requeued rows claim it next wave."""
        n = len(self.reserved)
        self.reserved.clear()
        return n

    def size(self) -> int:
        return len(self.status)

    def items(self) -> list[tuple[str, int]]:
        return sorted(self.status.items())

    def dump(self) -> dict:
        return {
            "shard_id": self.shard_id,
            "filter": self.filter.dump(),
            "status": dict(self.status),
        }

    def restore(self, state: dict) -> None:
        self.shard_id = state["shard_id"]
        self.filter = CuckooFilter.restore(state["filter"])
        self.status = dict(state["status"])


class ShardedSeenSet:
    """Driver/task-side client over the K shard actors. The handle list
    is cheap to serialize into map_batches closures; calls are batched
    per shard."""

    def __init__(self, nshards: int = 4, capacity_per_shard: int = 1 << 17, actors=None):
        self.nshards = nshards
        if actors is not None:
            self.actors = list(actors)
        else:
            self.actors = [SeenShard.remote(i, capacity_per_shard) for i in range(nshards)]

    def _group(self, canons: list[str]) -> dict[int, list[int]]:
        groups: dict[int, list[int]] = {}
        for idx, c in enumerate(canons):
            groups.setdefault(shard_of(c, self.nshards), []).append(idx)
        return groups

    def check(self, canons: list[str]) -> list[int]:
        """Batched status lookup; -1 = novel."""
        out = [-1] * len(canons)
        groups = self._group(canons)
        futs = {
            s: self.actors[s].check.remote([canons[i] for i in idxs])
            for s, idxs in groups.items()
        }
        for s, idxs in groups.items():
            for i, st in zip(idxs, ray.get(futs[s])):
                out[i] = st
        return out

    def mark(self, canons: list[str], statuses: list[int]) -> None:
        groups = self._group(canons)
        futs = [
            self.actors[s].mark.remote(
                [canons[i] for i in idxs], [statuses[i] for i in idxs]
            )
            for s, idxs in groups.items()
        ]
        ray.get(futs)

    def reserve(self, canons: list[str]) -> list[int]:
        out = [-1] * len(canons)
        groups = self._group(canons)
        futs = {
            s: self.actors[s].reserve.remote([canons[i] for i in idxs])
            for s, idxs in groups.items()
        }
        for s, idxs in groups.items():
            for i, st in zip(idxs, ray.get(futs[s])):
                out[i] = st
        return out

    def release(self, canons: list[str]) -> None:
        groups = self._group(canons)
        ray.get(
            [
                self.actors[s].release.remote([canons[i] for i in idxs])
                for s, idxs in groups.items()
            ]
        )

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
