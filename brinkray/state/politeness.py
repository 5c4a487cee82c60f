"""Per-host politeness: fetch budgets and wave-rate token buckets.

The reference's only global throttle is WorkerCount (crawler.go:56-57);
the north rule adds per-host scheduling. Two independent knobs, both
default-off (off == pure reference behavior):

* ``per_host_budget`` — a hard cap on Fetch *attempts* per domain over
  the whole crawl. Exhausted => the URL is silently dropped (never
  marked seen, never handled), deterministically in frontier order —
  mirrored by the oracle's budget extension (ref/oracle.py).
* ``per_host_wave_limit`` — a politeness rate stand-in: at most L
  fetches per domain per wave; the surplus is *deferred* to the next
  wave (ordering shifts, the final seen SET is unchanged — tested).

Domains are hash-sharded across K actors; admission happens inside the
engine's ``groupby(domain)`` stage with ONE actor call per domain per
wave, in frontier order — so token consumption is deterministic and
race-free.
"""

from __future__ import annotations

import ray

from .cuckoo import sha1_64

__all__ = ["PolitenessShard", "PolitenessClient"]


@ray.remote(num_cpus=0)
class PolitenessShard:
    def __init__(self, per_host_budget: int | None = None):
        self.per_host_budget = per_host_budget
        self.used: dict[str, int] = {}

    def take(self, domain: str, n: int) -> int:
        """Consume up to n budget tokens for domain; returns admitted
        count (the first k of the wave's frontier-ordered requests)."""
        if self.per_host_budget is None:
            return n
        used = self.used.get(domain, 0)
        k = max(0, min(n, self.per_host_budget - used))
        self.used[domain] = used + k
        return k

    def usage(self) -> dict[str, int]:
        return dict(self.used)

    def dump(self) -> dict:
        return {"per_host_budget": self.per_host_budget, "used": dict(self.used)}

    def restore(self, state: dict) -> None:
        self.per_host_budget = state["per_host_budget"]
        self.used = dict(state["used"])


class PolitenessClient:
    def __init__(self, nshards: int = 2, per_host_budget: int | None = None, actors=None):
        self.nshards = nshards
        self.per_host_budget = per_host_budget
        if actors is not None:
            self.actors = list(actors)
        else:
            self.actors = [PolitenessShard.remote(per_host_budget) for _ in range(nshards)]

    def actor_for(self, domain: str):
        return self.actors[sha1_64(domain) % self.nshards]

    def take(self, domain: str, n: int) -> int:
        return ray.get(self.actor_for(domain).take.remote(domain, n))

    def usage(self) -> dict[str, int]:
        out: dict[str, int] = {}
        for u in ray.get([a.usage.remote() for a in self.actors]):
            out.update(u)
        return out

    def dump(self) -> list[dict]:
        return ray.get([a.dump.remote() for a in self.actors])

    def restore(self, states: list[dict]) -> None:
        ray.get([a.restore.remote(s) for a, s in zip(self.actors, states)])
