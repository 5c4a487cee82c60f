"""Single-process oracle: a literal transcription of the reference's
worker loop (brink.go:72-138) over the sandbox world model.

This is the conformance yardstick every distributed run is diffed
against. It models the ``WorkerCount=1`` degenerate case, where the
bounded channel is an exact FIFO queue — the only configuration in
which the reference's ordering is well-defined (with N racing workers
the interleave is nondeterministic). The engine's BFS-wave canonical
order reproduces exactly this FIFO order (see engine.crawl docstring
for the proof sketch).

Every quirk of the loop is preserved:
  1 normalize; failure => silent drop                  (brink.go:75-81)
  2 seen => handler replay, cached=true, empty body    (brink.go:83-93)
  3 Fetch; ANY error => silent drop, NOT marked seen   (brink.go:95-101)
  4 mark visited canon -> status                       (brink.go:103)
  5 handler fires for every status, BEFORE the
    expansion gate                                     (brink.go:105-109)
  6 expand only when status==200 and path not
    forbidden                                          (brink.go:111-114)
  7 link base is the RAW pre-normalization href        (brink.go:117)
  8 empty hrefs skipped at enqueue                     (brink.go:125-128)

Politeness-budget extension (north rule; absent from the reference):
when ``per_host_budget`` is set, each Fetch attempt consumes one token
for its domain; exhausted => silent drop (no mark, no handler).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from .config import CrawlConfig
from .errors import CrawlError
from .gourl import URLError
from .urls import Link, absolute_links_in, normalize_url, path_forbidden, scheme_and_host
from .world import Web

__all__ = ["HandlerEvent", "OracleResult", "crawl_oracle"]


@dataclass
class HandlerEvent:
    """One handler invocation: (linkedFrom, url, status, body, cached)
    plus the BFS depth (wave) of the frontier record that produced it."""

    linked_from: str
    url: str
    status: int
    body: bytes
    cached: bool
    wave: int

    def key(self) -> tuple:
        return (self.linked_from, self.url, self.status, self.body, self.cached)


@dataclass
class OracleResult:
    events: list[HandlerEvent] = field(default_factory=list)
    seen: dict[str, int] = field(default_factory=dict)
    fetch_attempts: int = 0
    budget_drops: int = 0


def crawl_oracle(
    web: Web,
    cfg: CrawlConfig,
    per_host_budget: int | None = None,
    fast_extract: bool = False,
    robots=None,
) -> OracleResult:
    """``robots``: an engine.robots.RobotsPolicy — applied right after
    normalization, before the seen check (same placement as the
    engine's filter, keeping robots-enabled runs diffable)."""
    from .urls import get_path

    res = OracleResult()
    tokens: dict[str, int] = {}
    q: deque[tuple[Link, int]] = deque()
    q.append((Link(linked_from="start", href=cfg.root_domain), 0))  # brink.go:33

    while q:
        link, depth = q.popleft()
        # 1 normalize
        try:
            canon = normalize_url(link.href, cfg.ignored_get_params, cfg.fuzzy)
        except URLError:
            continue
        # robots gate (engine extension, default off)
        if robots is not None:
            try:
                scheme, host = scheme_and_host(canon)
                path = get_path(canon)
            except URLError:
                scheme, host, path = "", "", ""
            if not robots.allowed(f"{scheme}://{host}", path):
                continue
        # 2 seen => cached replay
        if canon in res.seen:
            res.events.append(
                HandlerEvent(link.linked_from, canon, res.seen[canon], b"", True, depth)
            )
            continue
        # politeness budget (engine extension, default off)
        if per_host_budget is not None:
            try:
                scheme, host = scheme_and_host(canon)
                domain = f"{scheme}://{host}"
            except URLError:
                domain = ""
            left = tokens.setdefault(domain, per_host_budget)
            if left <= 0:
                res.budget_drops += 1
                continue
            tokens[domain] = left - 1
        # 3 fetch; any error is a silent drop
        res.fetch_attempts += 1
        try:
            status, body = web.fetch(canon, cfg)
        except CrawlError:
            continue
        # 4 mark visited
        res.seen[canon] = status
        # 5 handler before the expansion gate
        res.events.append(HandlerEvent(link.linked_from, canon, status, body, False, depth))
        # 6 expansion gate
        if status != 200 or path_forbidden(canon, cfg.forbidden_paths):
            continue
        # 7 extract + absolutize with the RAW href as base
        try:
            links = absolute_links_in(link.href, link.href, body, True, fast=fast_extract)
        except URLError:
            continue
        # 8 enqueue
        for l in links:
            if l.href == "":
                continue
            q.append((l, depth + 1))

    return res
