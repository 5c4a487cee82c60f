"""The BFS-wave crawl driver: the reference's worker loop
(brink.go:72-138) restated as per-wave Ray Data pipelines.

Ordering model
--------------
The reference's ordering is only well-defined at WorkerCount=1, where
the bounded channel is a FIFO queue. In FIFO order, every wave-k item
is dequeued before any wave-(k+1) item (children enqueue behind the
remaining wave-k items), and within wave k items appear in
(parent-order, document-position) order. The engine encodes that as an
``order_key`` path label: the seed is "000000", a child is
``parent_key + "/" + zero-padded position``. Within a wave all keys
have equal segment count, so lexicographic order of (wave, order_key)
IS the FIFO order — no global sequence counter, no coordination;
the intra-wave dedup winner is simply min(order_key), i.e. the
occurrence the FIFO loop would have fetched.

Strict-mode wave anatomy (each phase one Ray Data execution):
  A map_batches(normalize) -> sort(canon, order_key) with vectorized
    run-boundary winner marking        [the ONLY shuffle: intra-wave dedup]
  B winners -> seen-shard check -> fetch (lookup-join + gates + mark;
    seen winners pass through as cached replays) -> text extraction;
    materialize = the wave barrier
  C duplicate occurrences -> post-barrier shard lookup -> cached rows
  D expansion gate -> flat-map links -> next frontier
  (politeness adds a groupby(domain) admission execution when enabled)

Scale mode (`ordering="scale"`, see _scale_wave): sort-free — dedup via
atomic shard reservations inside the fetch stage, link+text extraction
inline, 2 executions per wave; set-exact, ordering approximate.

Quirk preservation: errors are dropped inside the fetch stage without
marking (so rediscoveries re-fetch); cached replays of a canon whose
winner errored find no mark and drop too — exactly the FIFO outcome;
handlers (the results table) receive non-200 and forbidden-path pages,
which are then excluded only from expansion.
"""

from __future__ import annotations

import json
import os
import pickle
import time
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..ref.config import CrawlConfig
from ..state.politeness import PolitenessClient, PolitenessShard
from ..state.seen import SeenShard, ShardedSeenSet
from .fetch import Fetcher
from .index import PageIndex, build_page_index
from .stages import (
    FRONTIER_SCHEMA,
    extract_text_stage,
    make_extract_links_fn,
    make_forbidden_filter,
    make_normalize_fn,
)

__all__ = ["EngineOptions", "CrawlEngine", "CrawlResult"]

RESULT_COLS = ["wave", "order_key", "linked_from", "url", "status", "cached", "body", "text"]

RESULT_SCHEMA = pa.schema(
    [
        ("wave", pa.int32()),
        ("order_key", pa.string()),
        ("linked_from", pa.string()),
        ("url", pa.string()),
        ("status", pa.int32()),
        ("cached", pa.bool_()),
        ("body", pa.binary()),
        ("text", pa.string()),
    ]
)


@dataclass
class EngineOptions:
    seen_shards: int = 4
    seen_capacity_per_shard: int = 1 << 17
    # scale-run memory switch: False stops the seen shards from
    # retaining canon STRINGS (~80 B/URL — ~40x the 2 B/URL cuckoo +
    # digest/status state at 10^10 URLs); CrawlResult.seen /
    # all_items() then raise with a pointer and results flow through
    # the events sink. Default True keeps the conformance surface.
    retain_canon: bool = True
    # Conditional-GET / recrawl-revalidation support: seen shards also
    # store each url's 16-byte body md5 at mark time. A SOFT expire
    # (expire_urls(..., keep_body=True)) keeps the hash; the re-fetch's
    # re-mark compares — unchanged content classifies REVALIDATED (the
    # 304-Not-Modified outcome an If-None-Match request would get),
    # changed content MODIFIED (reval_stats / reval_items). +16 B/URL
    # shard memory, so default off outside refresh passes.
    track_body_hashes: bool = False
    politeness_shards: int = 2
    per_host_budget: int | None = None
    per_host_wave_limit: int | None = None
    fetch_concurrency: int = 2
    fetch_batch_size: int = 1024
    fetch_num_cpus: float = 0.5
    # "tasks": stateless tasks with per-worker-process cached state
    # (fast: no per-wave pool startup); "actors": a map_batches actor
    # pool per wave (the canonical stateful-stage shape)
    fetch_mode: str = "tasks"
    # "strict": FIFO-exact ordering (sort-based intra-wave dedup) —
    # byte/order-identical to the oracle. "scale": sort-free dedup via
    # atomic shard reservations — identical final seen SET and fetched
    # pages, approximate ordering, 2 executions per wave instead of 4.
    ordering: str = "strict"
    # "broadcast": one zero-copy Arrow index in the object store;
    # "partitioned": hash-partitioned parquet shards, loaded lazily by
    # fetch workers (corpora beyond object-store size)
    index_mode: str = "broadcast"
    index_dir: str | None = None  # partitioned-mode shard root
    index_nparts: int = 8
    robots_enabled: bool = False
    robots_agent: str = "*"
    # Honor robots.txt Crawl-delay as a per-host WAVE-rate limit: host
    # h with delay d gets at most max(1, floor(crawl_delay_wave_seconds
    # / d)) NOVEL fetches per wave, surplus deferred to the next wave
    # (the per_host_wave_limit machinery with per-host values — final
    # seen SET unchanged, ordering shifts). A batch-BFS engine has no
    # per-request pacing clock, so the honest mapping is requests per
    # wave-period; crawl_delay_wave_seconds is that period estimate.
    # Requires robots_enabled and ordering='strict' (deterministic
    # frontier-ordered admission).
    respect_crawl_delay: bool = False
    crawl_delay_wave_seconds: float = 1.0
    # Fault-injection hook (chaos tests / failure drills): a marker
    # path; the first fetch task to atomically claim it hard-kills its
    # worker process mid-batch (os._exit) — exactly once per marker.
    # Production runs leave this None.
    chaos_kill_marker: str | None = None
    extract_fast: bool = True
    store_body: bool = True
    store_text: bool = True  # bench/huge runs can drop the text column
    checkpoint_dir: str | None = None
    max_waves: int | None = None
    # bounded runs (SURVEY §2.6): keep only the FIFO-first k frontier
    # rows per wave (lexicographic order_key = FIFO order); the rest
    # are discarded — a breadth cap for sampling crawls. Default off.
    per_wave_limit: int | None = None
    # PRIORITY-ordered frontier (north rule: "depth/priority-ordered
    # frontier"): how per_wave_limit picks its k rows.
    #   "fifo"      — lexicographic order_key (reference-faithful).
    #   "domain_rr" — host-fair round-robin: every host's FIFO-first
    #     URL before any host's second (rank-within-host, then FIFO
    #     across equal ranks) — a skewed host can no longer monopolize
    #     a bounded wave. Selection is a groupby(host) rank shuffle +
    #     one sort over the frontier (the groupby(host)-aggregate-sort
    #     shape the north star names); set-validity is unchanged
    #     (selected rows crawl exactly as in fifo mode).
    frontier_order: str = "fifo"
    # one crawl-wide cookie jar actor (reference: crawler.go:36); only
    # instantiated when the config carries cookies
    shared_cookie_jar: bool = True
    # spin up worker processes + per-worker fetcher state at set_pages
    # time (steady-state amortized on a long crawl; makes the first
    # sizeable wave pay compute, not process spawns)
    prewarm_workers: bool = False
    # Cross-wave pipelining (fused scale mode only): unroll up to this
    # many BFS waves into ONE streaming execution — wave k+1's
    # normalize+fetch starts on wave k's early output blocks while wave
    # k's stragglers are still running, so the wave-tail idle (the
    # dominant scaling loss at the large cluster level) overlaps with
    # next-wave ramp. Dedup stays exact: reservations are atomic and
    # generation-tagged (seen.py), and the orphan sweep only clears
    # generations whose execution has completed. 1 = one wave per
    # execution (round-2 behavior). Depth 3 measured fastest at the
    # 16/32-CPU levels (more wave tail hidden: 32-CPU headline mean
    # 21.3 s vs 24.5 s at depth 2, interleaved A/B); at a pinned-4
    # "cluster" depth 3 over-subscribes the tiny node (~15% slower) —
    # deeper pipelines pay off as the cluster grows, which is the
    # deployment this engine targets.
    pipeline_waves: int = 3
    # only pipeline once the frontier is at least this big: tiny ramp
    # waves benefit more from exact per-wave adaptive batch sizing than
    # from overlap, and a FIXED threshold (not cpu-dependent) keeps the
    # wave pairing identical across cluster sizes (scaling pairs must
    # compare the same execution plan).
    pipeline_min_frontier: int = 4096
    # Deep-crawl key-width control (NOTES gap 3): order_key is a path
    # label growing ~7 B per wave of depth (~3.5 KB at depth 500).
    # With rebase_order_keys=True:
    #   * strict mode RE-BASES per wave: each expansion parent's label
    #     is replaced by its dense rank in the wave's FIFO order
    #     (order-preserving, so the encoding stays FIFO-EXACT — proven
    #     equal to the unrebased run on a deep chain in tests), and
    #     child keys are a constant 17 bytes at any depth. Costs one
    #     extra sort of the wave's FETCHED pages (not the frontier).
    #   * scale mode (sort-free; no global rank exists) instead CAPS
    #     growth: past ~96 B, children inherit the parent's label.
    #     Set semantics are untouched (scale dedup is atomic shard
    #     reservations, never key comparison); ordering — already
    #     approximate in scale mode — degrades only below the cap
    #     depth (~13 waves).
    # Default False keeps byte-identical conformance keys.
    rebase_order_keys: bool = False
    # Streaming events sink: when set, every executed wave's results
    # are written as parquet under {events_sink_dir}/wave_XXXX/
    # DIRECTLY from the cluster (Dataset.write_parquet — blocks never
    # concatenate on the driver), with a sibling wave_XXXX._SUNK
    # marker making each wave's sink atomic and resume-skippable. This
    # is the default result surface for large runs; the in-memory
    # CrawlResult.events_table() remains the small-run/conformance
    # surface.
    events_sink_dir: str | None = None
    # Large-run switch: drop each wave's result Dataset after sinking
    # (requires events_sink_dir) so the object store can free result
    # blocks as the crawl streams — CrawlResult.events_table() is then
    # gated off and CrawlResult.events_dataset() (a lazy read of the
    # sink) is the way to consume events. Default True preserves the
    # conformance behavior.
    retain_results: bool = True
    # Ray Data target block size for this crawl (bytes). Frontier rows
    # are ~200 B but carry ~0.5 ms of fetch+extract work each, so the
    # default 128 MiB blocks make task granularity far too coarse and
    # let link-fanout skew snowball wave over wave (one 1.1M-row block
    # = one 40 s task). ~2 MiB keeps tasks ~1 s and bounds skew without
    # any repartition barrier.
    target_block_bytes: int | None = 2 * 1024 * 1024


@dataclass
class CrawlResult:
    waves: int
    results: list  # one materialized Dataset per wave
    metrics: list[dict] = field(default_factory=list)
    seen_client: "ShardedSeenSet | None" = None
    _seen_cache: dict | None = None
    events_sink_dir: str | None = None
    results_retained: bool = True

    @property
    def seen(self) -> dict[str, int]:
        """Final canon->status map, gathered from the shards lazily
        (pulling 10^6+ strings to the driver is not part of the crawl)."""
        if self._seen_cache is None:
            self._seen_cache = self.seen_client.all_items() if self.seen_client else {}
        return self._seen_cache

    def seen_count(self) -> int:
        return self.seen_client.size() if self.seen_client else 0

    def events_dataset(self):
        """Streaming read-back of the sunk events — the scale-safe
        result surface: a LAZY Dataset over the per-wave parquet the
        crawl wrote from the cluster, so consuming events (filter,
        aggregate, re-sink) never concatenates them on the driver.
        Requires the crawl to have run with
        ``EngineOptions.events_sink_dir``."""
        if not self.events_sink_dir:
            raise RuntimeError(
                "crawl ran without EngineOptions.events_sink_dir; use "
                "events_table() (small runs) or re-run with a sink"
            )
        import ray.data as rd

        return rd.read_parquet(self.events_sink_dir, file_extensions=["parquet"])

    def events_table(self) -> pa.Table:
        """All handler events in FIFO-equivalent order, concatenated on
        the DRIVER — the small-run/conformance surface only. Large runs
        set ``EngineOptions.retain_results=False`` + a sink and consume
        ``events_dataset()`` instead; this method is gated off there (a
        100-TB crawl's events cannot live in one driver table)."""
        if not self.results_retained:
            raise RuntimeError(
                "results were not retained (EngineOptions.retain_results="
                "False); consume events via events_dataset()"
            )
        tables = []
        for ds in self.results:
            blocks = [
                b.select(RESULT_COLS).cast(RESULT_SCHEMA)
                for b in ray.get(ds.to_arrow_refs())
                if b.num_rows
            ]
            if blocks:
                tables.append(pa.concat_tables(blocks))
        if not tables:
            return RESULT_SCHEMA.empty_table()
        t = pa.concat_tables(tables)
        return t.sort_by([("wave", "ascending"), ("order_key", "ascending")])


def _empty_frontier() -> pa.Table:
    return FRONTIER_SCHEMA.empty_table()


def _seed_frontier(seeds: list[str]) -> pa.Table:
    return pa.table(
        {
            "href": pa.array(seeds, pa.string()),
            "linked_from": pa.array(["start"] * len(seeds), pa.string()),
            "target": pa.array([""] * len(seeds), pa.string()),
            "order_key": pa.array([f"{i:06d}" for i in range(len(seeds))], pa.string()),
            "wave": pa.array([0] * len(seeds), pa.int32()),
        }
    )


@ray.remote
def _block_ends(tbl: pa.Table):
    if tbl.num_rows == 0:
        return None
    return tbl["canon"][0].as_py(), tbl["canon"][-1].as_py()


@ray.remote
def _block_mark_winners(tbl: pa.Table, first_is_winner: bool) -> pa.Table:
    n = tbl.num_rows
    if n == 0:
        return tbl.append_column("is_winner", pa.array([], pa.bool_()))
    c = tbl["canon"].combine_chunks()
    if n == 1:
        flags = pa.array([first_is_winner])
    else:
        same_as_prev = pc.equal(c.slice(1), c.slice(0, n - 1))
        rest = pc.invert(same_as_prev)
        if isinstance(rest, pa.ChunkedArray):
            rest = rest.combine_chunks()
        flags = pa.concat_arrays([pa.array([first_is_winner]), rest])
    return tbl.append_column("is_winner", flags)


def _mark_winners(norm_ds, target_blocks: int | None) -> "rd.Dataset":
    """Intra-wave dedup (D2): the FIFO-first occurrence of each canon
    (min order_key) is the winner; the rest become cached-replay
    candidates. Implemented as ONE native sort by (canon, order_key)
    followed by vectorized run-boundary marking per block (a
    per-group Python callback would not survive million-row waves).
    ``target_blocks`` (when set) repartitions first so everything
    downstream (seen check, fetch, extract) gets block parallelism —
    only needed when the incoming frontier is under-partitioned; the
    extra all-to-all is skipped otherwise."""
    if target_blocks is not None:
        norm_ds = norm_ds.repartition(target_blocks)
    s = norm_ds.sort(["canon", "order_key"])
    refs = s.to_arrow_refs()
    ends = ray.get([_block_ends.remote(r) for r in refs])
    flags = []
    prev_last = None
    for e in ends:
        if e is None:
            flags.append(True)
            continue
        first, last = e
        flags.append(first != prev_last)
        prev_last = last
    marked = [
        _block_mark_winners.remote(r, f) for r, f in zip(refs, flags)
    ]
    return rd.from_arrow_refs(marked)


def _frontier_take(frontier, k: int, mode: str) -> "rd.Dataset":
    """Select the k frontier rows a bounded wave will process.

    ``fifo``: global lexicographic order_key (the reference's queue
    order). ``domain_rr``: host-fair round-robin — rank rows FIFO
    within each host (groupby(host).map_groups, host derived from the
    raw href; unparseable hrefs rank in their own '' bucket and die at
    normalize exactly as unbounded), then one sort by
    (rank, order_key): every host's first URL precedes any host's
    second, FIFO breaking ties within a rank."""
    if mode == "fifo":
        return frontier.sort("order_key").limit(k).materialize()
    if mode != "domain_rr":
        raise ValueError(f"unknown frontier_order: {mode!r}")

    import pandas as pd

    from ..ref.gourl import URLError
    from ..ref.urls import scheme_and_host

    def add_host(t: pa.Table) -> pa.Table:
        hosts = []
        for u in t["href"].to_pylist():
            try:
                hosts.append("://".join(scheme_and_host(u)))
            except URLError:
                hosts.append("")
        return t.append_column("_host", pa.array(hosts, pa.string()))

    def rank_in_host(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("order_key", kind="mergesort").reset_index(drop=True)
        g["_rank"] = pd.Series(range(len(g)), dtype="int64")
        return g

    ranked = (
        frontier.map_batches(add_host, batch_format="pyarrow")
        .groupby("_host")
        .map_groups(rank_in_host, batch_format="pandas")
    )
    return (
        ranked.sort(["_rank", "order_key"])
        .limit(k)
        .drop_columns(["_host", "_rank"])
        .materialize()
    )


def _rank_rebase(expandable) -> "rd.Dataset":
    """Strict-mode per-wave order_key re-basing: sort the wave's
    expansion parents by order_key and rewrite each label to its dense
    rank, fixed-width (10 digits). Rank order == key order, so every
    downstream comparison (child FIFO order, dedup winner selection) is
    unchanged while child keys stop growing with depth.

    Distributed rank assignment without gathering rows: after the sort,
    blocks hold disjoint key ranges; a metadata pass ships one
    (first_key, num_rows) row per block to the driver, which prefix-sums
    the counts into per-block offsets keyed by first_key (keys are
    unique path labels, so first_key identifies its block); the relabel
    pass then numbers each block's rows from its offset."""
    s = expandable.sort("order_key").materialize()

    def head_row(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"k": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "k": pa.array([t["order_key"][0].as_py()], pa.string()),
                "n": pa.array([t.num_rows], pa.int64()),
            }
        )

    head = (
        s.map_batches(head_row, batch_size=None, batch_format="pyarrow")
        .to_pandas()
        .sort_values("k")
    )
    counts = head["n"].to_numpy()
    offsets = dict(
        zip(head["k"], (counts.cumsum() - counts).astype(int))
    )

    def relabel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        off = offsets[t["order_key"][0].as_py()]
        ranks = pa.array(
            [f"{off + i:010d}" for i in range(t.num_rows)], pa.string()
        )
        return t.set_column(
            t.schema.get_field_index("order_key"), "order_key", ranks
        )

    return s.map_batches(relabel, batch_size=None, batch_format="pyarrow")


def _make_seen_check_fn(actors: list, nshards: int):
    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("seen_status", pa.array([], pa.int32()))
        seen = ShardedSeenSet(nshards, actors=actors)
        statuses = seen.check(t["canon"].to_pylist())
        return t.append_column("seen_status", pa.array(statuses, pa.int32()))

    return fn


def _make_politeness_fn(actors: list, nshards: int, wave_limit: int | None,
                        host_limits: dict[str, int] | None = None):
    """Per-domain admission in frontier order; one actor call per
    domain per wave => deterministic token consumption. ``host_limits``
    (robots Crawl-delay) overrides the global ``wave_limit`` for the
    hosts it names."""

    def fn(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return group.append_column("disposition", pa.array([], pa.string()))
        g = group.sort_by("order_key")
        domain = g["domain"][0].as_py()
        n = g.num_rows
        lim = (host_limits or {}).get(domain, wave_limit)
        n_now = n if lim is None else min(n, lim)
        client = PolitenessClient(nshards, actors=actors)
        k = client.take(domain, n_now)
        disposition = ["admit"] * k + ["drop"] * (n_now - k) + ["defer"] * (n - n_now)
        return g.append_column("disposition", pa.array(disposition, pa.string()))

    return fn


def _make_project_result_fetched(store_body: bool):
    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "wave": t["wave"],
                "order_key": t["order_key"],
                "linked_from": t["linked_from"],
                "url": t["canon"],
                "status": t["status"],
                "cached": t["cached"],
                # store_body=False keeps results lean (bench / huge runs);
                # the text column remains the conformance surface. Cached
                # rows already carry b"" bodies (brink.go:86-88).
                "body": t["body"]
                if store_body
                else pa.array([b""] * t.num_rows, pa.binary()),
                "text": t["text"],
            }
        )

    return project


def _project_result_cached(t: pa.Table) -> pa.Table:
    """Cached replay: stored status, EMPTY body (brink.go:86-88)."""
    return pa.table(
        {
            "wave": t["wave"],
            "order_key": t["order_key"],
            "linked_from": t["linked_from"],
            "url": t["canon"],
            "status": t["seen_status"],
            "cached": pa.array([True] * t.num_rows, pa.bool_()),
            "body": pa.array([b""] * t.num_rows, pa.binary()),
            "text": pa.array([""] * t.num_rows, pa.string()),
        }
    )


def _frontier_project(keep: pa.Table) -> pa.Table:
    """Project already-filtered link/pending rows to the frontier
    schema; requeued pendings move to the next wave."""
    wave_col = pc.if_else(
        pc.equal(keep["kind"], "pending"),
        pc.add(keep["wave"], 1),
        keep["wave"],
    ).cast(pa.int32())
    return pa.table(
        {
            "href": keep["href"],
            "linked_from": keep["linked_from"],
            "target": keep["target"],
            "order_key": keep["order_key"],
            "wave": wave_col,
        }
    )


def _make_wave_step(normalize_fn, robots_gate, fetch_fn):
    """One PIPELINED inner wave as a single map_batches callable over
    the PREVIOUS wave's fetch-output schema: link/pending rows are
    projected to frontier rows, normalized and fetched in place; every
    other row (the previous wave's results) passes through untouched.
    Chaining these after the first wave's fetch keeps all unrolled
    waves inside ONE streaming execution — Ray Data starts this stage
    on each upstream block as it lands, overlapping wave k's stragglers
    with wave k+1's ramp."""

    def step(t: pa.Table) -> pa.Table:
        is_front = pc.or_(pc.equal(t["kind"], "link"), pc.equal(t["kind"], "pending"))
        keep = t.filter(is_front)
        done = t.filter(pc.invert(is_front))
        if keep.num_rows == 0:
            return done
        n = normalize_fn(_frontier_project(keep))
        if robots_gate is not None:
            n = robots_gate(n)
        out = fetch_fn(n)
        if done.num_rows == 0:
            return out
        return pa.concat_tables([done, out.select(done.column_names).cast(done.schema)])

    return step


def _filter_batches(ds, predicate):
    return ds.map_batches(
        lambda t: t.filter(predicate(t)), batch_format="pyarrow"
    )


class CrawlEngine:
    """One crawl run: holds the actors, the page index and the config."""

    def __init__(self, cfg: CrawlConfig, options: EngineOptions | None = None):
        self.cfg = cfg
        self.opts = options or EngineOptions()
        self.seen = ShardedSeenSet(
            self.opts.seen_shards, self.opts.seen_capacity_per_shard,
            retain_canon=self.opts.retain_canon,
            track_body=self.opts.track_body_hashes,
        )
        if self.opts.respect_crawl_delay:
            if not self.opts.robots_enabled:
                raise ValueError("respect_crawl_delay requires robots_enabled")
            if self.opts.ordering != "strict":
                raise ValueError(
                    "respect_crawl_delay requires ordering='strict' "
                    "(deterministic frontier-ordered admission)"
                )
        # Crawl-delay limits are derived per run from the robots policy
        # (the bodies live in the pages index) — see _run_waves
        self._crawl_delay_limits: dict[str, int] | None = None
        self._politeness_on = (
            self.opts.per_host_budget is not None
            or self.opts.per_host_wave_limit is not None
        )
        self.politeness_actors = [
            PolitenessShard.remote(self.opts.per_host_budget)
            for i in range(self.opts.politeness_shards)
        ]
        # THE shared cookie jar (reference: one jar across all workers,
        # crawler.go:36) — created only when cookies are configured, so
        # cookie-free crawls pay zero RPCs
        self.cookie_jar = None
        if self.opts.shared_cookie_jar and cfg.opts.cookies:
            from .fetch import SharedCookieJar

            self.cookie_jar = SharedCookieJar.remote(cfg)
        self.index: PageIndex | None = None
        # execution-generation counter for reservation tagging (one
        # generation per scale-wave streaming execution; the orphan
        # sweep clears only completed generations)
        self._reserve_gen = 0

    def cookie_jar_state(self) -> dict | None:
        """Observable session state (cookies + headers) of the shared
        jar — the oracle-diffable surface for brink.go:173-185."""
        return ray.get(self.cookie_jar.state.remote()) if self.cookie_jar else None

    @property
    def seen_actors(self) -> list:
        """Live shard handles — always read through the client so
        wave-boundary rebalancing (seen.rebalance_shard) is visible."""
        return self.seen.actors

    def expire_urls(self, urls: list[str], keep_body: bool = False) -> int:
        """Recrawl/refresh primitive: expire the given urls from the
        seen state so the NEXT ``run()`` — seeding them directly, or
        rediscovering them through links — fetches them fresh while
        everything else replays cached. Urls normalize to the same
        canonical keys the crawl marks; unparseable entries are
        skipped (they can never have been marked). Returns how many
        existed. Works with ``retain_canon=False`` (digest-keyed).

        ``keep_body=True`` is the SOFT expire behind conditional-GET
        revalidation (requires ``track_body_hashes``): the stored body
        md5 survives, and the refresh run's re-mark classifies each
        re-fetch revalidated vs modified — read ``reval_stats()`` /
        ``reval_items()`` afterwards."""
        from ..ref.gourl import URLError
        from ..ref.urls import normalize_url

        canons = []
        for u in urls:
            try:
                canons.append(
                    normalize_url(u, self.cfg.ignored_get_params, self.cfg.fuzzy)
                )
            except URLError:
                continue
        return self.seen.forget(canons, keep_body) if canons else 0

    def reval_stats(self) -> tuple[int, int]:
        """(n_revalidated, n_modified) across all refresh re-marks so
        far (requires ``track_body_hashes``; both 0 otherwise)."""
        return self.seen.reval_stats()

    def reval_items(self) -> dict[str, bool]:
        """Per-url revalidation outcome (canon -> modified?) — the
        conformance surface; needs ``retain_canon``."""
        return self.seen.reval_items()

    # ---------------------------------------------------------------- setup
    def set_pages(self, pages) -> None:
        """Build the page index (Dataset or pyarrow Table in)."""
        if self.opts.index_mode == "partitioned":
            import tempfile

            from .index import build_partitioned_index

            out = self.opts.index_dir or tempfile.mkdtemp(prefix="brinkray_pidx_")
            self.index = build_partitioned_index(
                pages, self.cfg, out, self.opts.index_nparts
            )
        elif not isinstance(pages, pa.Table):
            # Dataset input = corpus scale: distributed build — map +
            # distributed sort by h; blocks stay in the object store,
            # the driver holds only refs + ranges (a driver-concat'd
            # table would bound the corpus by the driver heap)
            from .index import build_page_index_distributed

            self.index = build_page_index_distributed(pages, self.cfg)
        else:
            self.index = build_page_index(pages, self.cfg)
        if self.opts.prewarm_workers:
            self._prewarm()

    def _prewarm(self) -> None:
        """Spin up the worker-process pool and build each worker's
        Fetcher state (zero-copy index map, session, shard handles)
        BEFORE the first wave: on a fresh cluster the first sizeable
        wave otherwise pays ~n_workers process spawns + state builds
        mid-crawl. The warm rows target an unknown domain, so they take
        the transport-error silent-drop path — reserve is released,
        nothing is marked, the seen set stays empty."""
        from .fetch import make_fetcher_fn
        from .stages import make_normalize_fn

        ncpus = int(ray.cluster_resources().get("CPU", 8))
        n = 4 * ncpus
        warm = pa.table(
            {
                "href": pa.array(
                    [f"https://warmup.invalid/{i}" for i in range(n)], pa.string()
                ),
                "linked_from": pa.array(["warm"] * n, pa.string()),
                "target": pa.array([""] * n, pa.string()),
                "order_key": pa.array([f"{i:06d}" for i in range(n)], pa.string()),
                "wave": pa.array([0] * n, pa.int32()),
            }
        )
        (
            rd.from_arrow(warm)
            .repartition(n)
            .map_batches(make_normalize_fn(self.cfg), batch_format="pyarrow")
            .map_batches(
                make_fetcher_fn(
                    self.cfg,
                    self.index,
                    self.seen_actors,
                    self.opts.seen_shards,
                    scale=True,
                    # same constructor wiring as the real waves: the
                    # warm fetcher is cached under the same worker key
                    politeness_actors=(
                        self.politeness_actors
                        if self.opts.per_host_budget is not None
                        else None
                    ),
                    politeness_shards=self.opts.politeness_shards,
                    cookie_jar=self.cookie_jar,
                    track_body=self.opts.track_body_hashes,
                ),
                batch_format="pyarrow",
                batch_size=self.opts.fetch_batch_size,
            )
            .materialize()
        )

    # ---------------------------------------------------------------- run
    def run(self, seeds: list[str] | None = None, resume: bool = False) -> CrawlResult:
        assert self.index is not None, "call set_pages() first"
        opts = self.opts
        ckpt = opts.checkpoint_dir
        # scoped block-size override: scale crawls want ~2 MiB blocks,
        # but the setting is process-global DataContext state — restore
        # it in the finally below so pipelines run AFTER the crawl
        # (e.g. bench queries in the same process) keep the default
        # (mirrors build_page_index_distributed's save/restore).
        _ctx = _prev_block_size = None
        if opts.ordering == "scale" and opts.target_block_bytes:
            from ray.data import DataContext

            _ctx = DataContext.get_current()
            _prev_block_size = _ctx.target_max_block_size
            _ctx.target_max_block_size = opts.target_block_bytes
        try:
            return self._run_waves(seeds, resume)
        finally:
            if _ctx is not None:
                _ctx.target_max_block_size = _prev_block_size

    def _run_waves(self, seeds: list[str] | None, resume: bool) -> CrawlResult:
        opts = self.opts
        ckpt = opts.checkpoint_dir
        if not opts.retain_results and not opts.events_sink_dir:
            raise ValueError(
                "retain_results=False requires events_sink_dir (the sink "
                "becomes the only result surface)"
            )
        start_wave = 0
        frontier_tbl = _seed_frontier(seeds or [self.cfg.root_domain])
        results: list = []
        metrics: list[dict] = []

        if resume and ckpt:
            state = self._load_latest_checkpoint(ckpt)
            if state is not None:
                start_wave, frontier_tbl, results, metrics = state
                if opts.events_sink_dir:
                    # backfill the sink for checkpointed waves the prior
                    # run completed but did not sink (crash between
                    # _COMPLETE and _SUNK); already-sunk waves skip on
                    # their marker
                    for name in sorted(os.listdir(ckpt)):
                        if not name.startswith("wave_"):
                            continue
                        wdir = os.path.join(ckpt, name)
                        rdir = os.path.join(wdir, "results")
                        if os.path.exists(os.path.join(wdir, "_COMPLETE")) \
                                and os.path.isdir(rdir):
                            self._sink_wave(
                                int(name.split("_")[1]), rd.read_parquet(rdir)
                            )
                if not opts.retain_results:
                    results = []

        frontier = rd.from_arrow(frontier_tbl)
        wave = start_wave
        # fused scale mode: the frontier projection is left LAZY and
        # fuses into the NEXT wave's normalize+fetch execution — ONE
        # streaming execution per wave instead of two. Checkpointing
        # needs a materialized frontier (and per-wave-limit an exact
        # count), so those paths keep the two-execution shape.
        fused = (
            opts.ordering == "scale" and ckpt is None and opts.per_wave_limit is None
        )
        frontier_est: int | None = None  # upper bound when fused (lazy frontier)
        robots_gate = None
        if opts.robots_enabled:
            from .robots import RobotsPolicy
            from .stages import make_robots_filter

            policy = RobotsPolicy.from_pages(
                self.index.robots_bodies or {}, opts.robots_agent
            )
            robots_gate = make_robots_filter(policy)
            if opts.respect_crawl_delay and policy.crawl_delays:
                self._crawl_delay_limits = {
                    d: max(1, int(opts.crawl_delay_wave_seconds // delay))
                    for d, delay in policy.crawl_delays.items()
                }
                self._politeness_on = True
        normalize_fn = make_normalize_fn(self.cfg)
        extract_links_fn = make_extract_links_fn(fast=opts.extract_fast)
        forbidden_gate = make_forbidden_filter(self.cfg)
        while True:
            if opts.max_waves is not None and wave >= opts.max_waves:
                break
            if getattr(self, "stopping", False):
                # Stop() semantics (brink.go:145-149): finish the
                # completed wave, stop pulling new frontier work
                break
            t0 = time.monotonic()
            if fused and frontier_est is not None:
                # counting a lazy frontier would trigger the execution
                # the fusion exists to avoid; the estimate only sizes
                # batches, exactness is not needed
                frontier_n = frontier_est
            else:
                frontier_n = frontier.count()
                if frontier_n == 0:
                    break
            if opts.per_wave_limit is not None and frontier_n > opts.per_wave_limit:
                frontier = _frontier_take(
                    frontier, opts.per_wave_limit, opts.frontier_order
                )
                frontier_n = opts.per_wave_limit
            if opts.ordering == "scale":
                steps = 1
                if (
                    fused
                    and opts.pipeline_waves > 1
                    and frontier_n >= opts.pipeline_min_frontier
                    # the per-wave frontier cap is applied at execution
                    # start only; inner pipelined waves would bypass it
                    and opts.per_wave_limit is None
                ):
                    steps = opts.pipeline_waves
                    if opts.max_waves is not None:
                        steps = max(1, min(steps, opts.max_waves - wave))
                frontier, wave_results, m = self._scale_wave(
                    frontier,
                    frontier_n,
                    wave,
                    t0,
                    normalize_fn,
                    extract_links_fn,
                    forbidden_gate,
                    robots_gate,
                    fused=fused,
                    steps=steps,
                )
                if opts.events_sink_dir:
                    self._sink_wave(wave, wave_results)
                if opts.retain_results:
                    results.append(wave_results)
                metrics.append(m)
                if ckpt:
                    self._write_checkpoint(ckpt, wave, wave_results, frontier, m)
                wave += steps
                if fused:
                    if m["processed"] == 0:
                        break  # the wave consumed an exhausted frontier
                    frontier_est = m["processed"]
                continue

            # rebuilt per wave: picks up rebalanced shard handles
            # (strict path only; scale dedup is the shards' atomic
            # reserve inside the fetch stage)
            seen_check_fn = _make_seen_check_fn(self.seen_actors, opts.seen_shards)

            # 1+2 normalize then intra-wave dedup (ONE all-to-all exec;
            # the repartition sets downstream block parallelism)
            # block-width policy: enough blocks for downstream
            # parallelism, few enough that the sort's O(blocks^2)
            # scheduling stays negligible
            target_blocks = max(1, min(frontier_n // (2 * opts.fetch_batch_size) + 1, 24))
            norm = frontier.map_batches(normalize_fn, batch_format="pyarrow")
            if robots_gate is not None:
                norm = norm.map_batches(robots_gate, batch_format="pyarrow")
            # repartition fused into the normalize execution (cheap
            # split), then materialize before the sort: Ray's sort
            # executes its upstream again for boundary sampling, which
            # would otherwise run the normalize stage twice
            norm = norm.repartition(target_blocks).materialize()
            grouped = _mark_winners(norm, None)  # concrete blocks
            t_a = time.monotonic()

            # 3 winners -> seen check, fused straight into the fetch pool
            winners = _filter_batches(grouped, lambda t: t["is_winner"])
            winners_checked = winners.map_batches(seen_check_fn, batch_format="pyarrow")

            # 4 politeness / budget (shuffle on domain, only when enabled;
            # conformance default is off => zero extra executions)
            deferred = None
            if self._politeness_on:
                winners_checked = winners_checked.materialize()
                novel = _filter_batches(
                    winners_checked, lambda t: pc.equal(t["seen_status"], -1)
                )
                cached_w = _filter_batches(
                    winners_checked, lambda t: pc.not_equal(t["seen_status"], -1)
                )
                admit_fn = _make_politeness_fn(
                    self.politeness_actors,
                    opts.politeness_shards,
                    opts.per_host_wave_limit,
                    self._crawl_delay_limits,
                )
                disp = novel.groupby("domain").map_groups(
                    admit_fn, batch_format="pyarrow"
                ).materialize()
                admitted = _filter_batches(
                    disp, lambda t: pc.equal(t["disposition"], "admit")
                ).drop_columns(["disposition"])
                deferred = _filter_batches(
                    disp, lambda t: pc.equal(t["disposition"], "defer")
                )
                fetch_input = admitted.union(cached_w)
            else:
                fetch_input = winners_checked

            # 5+6 fetch (actor pool; seen winners pass through as cached
            # replays) + text extraction; materialize = the wave barrier
            # after which all marks are visible
            if opts.fetch_mode == "actors":
                from .fetch import BlockRefFetcher, PartitionedFetcher
                from .index import BlockPageIndex, PartitionedPageIndex

                if isinstance(self.index, PartitionedPageIndex):
                    fetch_cls = PartitionedFetcher
                elif isinstance(self.index, BlockPageIndex):
                    fetch_cls = BlockRefFetcher
                else:
                    fetch_cls = Fetcher
                processed = fetch_input.map_batches(
                    fetch_cls,
                    fn_constructor_args=(
                        self.cfg,
                        self.index,
                        self.seen_actors,
                        opts.seen_shards,
                    ),
                    fn_constructor_kwargs={
                        "cookie_jar": self.cookie_jar,
                        "track_body": opts.track_body_hashes,
                    },
                    batch_format="pyarrow",
                    batch_size=opts.fetch_batch_size,
                    concurrency=opts.fetch_concurrency,
                    num_cpus=opts.fetch_num_cpus,
                )
            else:
                from .fetch import make_fetcher_fn

                processed = fetch_input.map_batches(
                    make_fetcher_fn(
                        self.cfg,
                        self.index,
                        self.seen_actors,
                        opts.seen_shards,
                        cookie_jar=self.cookie_jar,
                        chaos_marker=opts.chaos_kill_marker,
                        track_body=opts.track_body_hashes,
                    ),
                    batch_format="pyarrow",
                    batch_size=opts.fetch_batch_size,
                )
            processed = processed.map_batches(
                extract_text_stage, batch_format="pyarrow"
            ).materialize()
            t_b = time.monotonic()

            # 7 cached replays for duplicate occurrences (post-barrier
            # lookup; misses drop — exactly the FIFO outcome for
            # duplicates of error or budget-dropped URLs)
            dups = _filter_batches(grouped, lambda t: pc.invert(t["is_winner"]))
            dup_checked = dups.map_batches(seen_check_fn, batch_format="pyarrow")
            dup_cached = _filter_batches(
                dup_checked, lambda t: pc.not_equal(t["seen_status"], -1)
            )

            # 8 results table for the wave. The dup replays MUST resolve
            # now (post-barrier, pre-next-wave); the projections are pure
            # functions of already-materialized parents, so without a
            # checkpoint they can stay lazy (saves one execution/wave).
            dup_cached = dup_cached.materialize()
            res_main = processed.map_batches(
                _make_project_result_fetched(opts.store_body), batch_format="pyarrow"
            )
            res_dup = dup_cached.map_batches(
                _project_result_cached, batch_format="pyarrow"
            )
            wave_results = res_main.union(res_dup)
            if ckpt or opts.events_sink_dir:
                wave_results = wave_results.materialize()
            if opts.events_sink_dir:
                self._sink_wave(wave, wave_results)
            if opts.retain_results:
                results.append(wave_results)
            t_c = time.monotonic()

            # expansion -> next frontier (cached replays never expand)
            fetched = _filter_batches(processed, lambda t: pc.invert(t["cached"]))
            expandable = fetched.map_batches(forbidden_gate, batch_format="pyarrow")
            if opts.rebase_order_keys:
                expandable = _rank_rebase(expandable)
            links = expandable.map_batches(
                extract_links_fn, batch_format="pyarrow"
            )
            if deferred is not None:
                links = links.union(
                    deferred.map_batches(
                        lambda t: pa.table(
                            {
                                "href": t["href"],
                                "linked_from": t["linked_from"],
                                "target": t["target"],
                                # deferred rows precede new discoveries
                                "order_key": pc.binary_join_element_wise(
                                    pa.array(["!"] * t.num_rows), t["order_key"], ""
                                ),
                                "wave": pc.add(t["wave"], 1).cast(pa.int32()),
                            }
                        ),
                        batch_format="pyarrow",
                    )
                )
            next_frontier = links.materialize()
            t_d = time.monotonic()

            processed_n = processed.count()
            m = {
                "wave": wave,
                "frontier": frontier_n,
                "processed": processed_n,
                "results": processed_n + dup_cached.count(),
                "next_frontier": next_frontier.count(),
                "seen_total": self.seen.size(),
                "wall_sec": round(time.monotonic() - t0, 3),
                "phase_sec": [
                    round(t_a - t0, 3),
                    round(t_b - t_a, 3),
                    round(t_c - t_b, 3),
                    round(t_d - t_c, 3),
                ],
            }
            metrics.append(m)

            if ckpt:
                self._write_checkpoint(ckpt, wave, wave_results, next_frontier, m)

            frontier = next_frontier
            wave += 1

        if ckpt:
            os.makedirs(ckpt, exist_ok=True)
            with open(os.path.join(ckpt, "_DONE"), "w") as f:
                f.write(json.dumps({"waves": wave}))

        return CrawlResult(
            waves=wave, results=results, metrics=metrics, seen_client=self.seen,
            events_sink_dir=opts.events_sink_dir,
            results_retained=opts.retain_results,
        )

    # ---------------------------------------------------------------- scale
    def _scale_wave(
        self,
        frontier,
        frontier_n: int,
        wave: int,
        t0: float,
        normalize_fn,
        extract_links_fn,
        forbidden_gate,
        robots_gate,
        fused: bool = False,
        steps: int = 1,
    ):
        """Sort-free wave (ordering='scale'): TWO executions total.
        Dedup is the shards' atomic reserve inside the fetch stage;
        duplicate occurrences whose owner is another in-flight batch
        come out as 'pending' rows and are requeued into the next
        frontier, where the next wave's reserve resolves them (owner
        marked => cached replay, owner errored => re-fetch) — no
        dedicated resolution barrier. Invariants vs strict/oracle:
        identical final seen set and fetched (url, status, body)
        multiset; ordering approximate.

        ``steps`` > 1 (cross-wave pipelining) unrolls that many BFS
        waves into the SAME streaming execution by chaining
        _make_wave_step map stages after the first wave's fetch: the
        streaming executor feeds wave k+1's normalize+fetch each wave-k
        output block as it completes, so wave tails overlap next-wave
        ramps (the residual idle the round-2 scaling runs measured at
        the large level). Dedup invariants hold unchanged — reserve is
        atomic across ALL in-flight batches regardless of wave, a
        pending whose owner is still in flight re-emits as pending for
        the next execution, and the orphan sweep below only clears
        generations whose execution has completed (all reservations in
        it were resolved, released, or orphaned by task death)."""
        from .fetch import make_fetcher_fn

        opts = self.opts
        if opts.per_host_wave_limit is not None:
            # wave-rate deferral needs deterministic frontier-ordered
            # admission; budgets (below) only need token accounting
            raise ValueError(
                "per_host_wave_limit requires ordering='strict' "
                "(deterministic frontier-ordered admission)"
            )
        pol_actors = self.politeness_actors if opts.per_host_budget is not None else None
        # no sort in this mode, so width can track the cluster. The
        # frontier from a previous scale wave already arrives as ~one
        # block per upstream fetch task (the single-pass frontier
        # projection below) — repartition ONLY when under-partitioned
        # (seeds, resume loads): the AllToAll repartition barrier over a
        # many-block frontier costs more than the whole fetch map (r02
        # measurement: 7.9s repartition vs 7.2s fetch at 1.1M rows) and
        # blocks streaming start.
        ncpus = int(ray.cluster_resources().get("CPU", 8))
        floor_blocks = min(frontier_n, ncpus)
        # a lazy (fused) frontier has no block count without executing;
        # its parent blocks are already 2MB-bounded, so skip the check
        if not (fused and wave > 0) and frontier.num_blocks() < floor_blocks:
            target_blocks = max(
                floor_blocks,
                min(frontier_n // opts.fetch_batch_size + 1, 8 * ncpus),
            )
            frontier = frontier.repartition(target_blocks)
        # per-wave batch size: Ray bundles small input blocks up to
        # batch_size rows per TASK, so a fixed 4096 collapses a small
        # wave (e.g. 4k urls) into 1-2 serial tasks on an idle cluster.
        # Target ~2 tasks/cpu; big waves keep the configured batch (the
        # shard-RPC amortization point).
        eff_batch = max(8, min(opts.fetch_batch_size, frontier_n // (2 * ncpus) + 1))
        norm = frontier.map_batches(normalize_fn, batch_format="pyarrow")
        if robots_gate is not None:
            norm = norm.map_batches(robots_gate, batch_format="pyarrow")

        gen = self._reserve_gen
        fetch_fn = make_fetcher_fn(
            self.cfg,
            self.index,
            self.seen_actors,
            opts.seen_shards,
            scale=True,
            scale_opts={
                "store_body": opts.store_body,
                "store_text": opts.store_text,
                "fast_extract": opts.extract_fast,
                "gen": gen,
                "key_cap": 96 if opts.rebase_order_keys else None,
            },
            politeness_actors=pol_actors,
            politeness_shards=opts.politeness_shards,
            cookie_jar=self.cookie_jar,
            chaos_marker=opts.chaos_kill_marker,
            track_body=opts.track_body_hashes,
        )
        # exec 1: normalize -> reserve/fetch/mark -> inline text + link
        # extraction, then (steps-1) chained inner waves — ONE streaming
        # execution for all of them (the barrier is the materialize).
        # Bodies never cross the barrier unless store_body is on: the
        # materialized blocks are result rows + link rows, not the
        # corpus.
        proc = norm.map_batches(
            fetch_fn,
            batch_format="pyarrow",
            batch_size=eff_batch,
        )
        for _ in range(1, steps):
            # inner waves are wide by construction (the pipeline
            # threshold admits only sizeable frontiers), so the
            # configured batch size — the shard-RPC amortization
            # point — is the right granularity.
            # ray_remote_args_fn={} blocks OPERATOR FUSION with the
            # upstream fetch (Ray fuses compatible MapBatches chains
            # into single tasks): fused, each wave-k task would run
            # wave k+1's fetch for ALL its extracted links serially
            # in-task — link fanout amplifies one task's work ~64x and
            # parallelism collapses (measured: 16-CPU headline 59.6 s
            # fused vs ~26 s unfused). Unfused, the streaming executor
            # re-blocks fetch output to the target block size and
            # schedules inner-wave tasks on blocks as they land — the
            # actual overlap pipelining exists for.
            proc = proc.map_batches(
                _make_wave_step(normalize_fn, robots_gate, fetch_fn),
                batch_format="pyarrow",
                batch_size=opts.fetch_batch_size,
                ray_remote_args_fn=lambda: {},
            )
        processed = proc.materialize()
        t_a = time.monotonic()
        if os.environ.get("BRINKRAY_STATS"):
            import sys

            print(f"=== wave {wave} exec1 stats ===", file=sys.stderr)
            print(processed.stats(), file=sys.stderr)

        # post-barrier: pendings (duplicate occurrences whose canon was
        # owned by another in-flight batch) are REQUEUED to the next
        # wave rather than resolved here — wave k+1's atomic reserve
        # yields the identical outcome (owner marked => cached replay;
        # owner errored => the requeued row claims and re-fetches), so
        # the dedicated resolution execution (a full extra barrier per
        # wave) is unnecessary. Only the cached row's wave number
        # shifts by one; the seen SET and fetched multiset — the
        # scale-mode invariants — are untouched.
        done = _filter_batches(
            processed,
            lambda t: pc.and_(
                pc.not_equal(t["kind"], "pending"), pc.not_equal(t["kind"], "link")
            ),
        )
        wave_results = done.map_batches(
            _make_project_result_fetched(opts.store_body), batch_format="pyarrow"
        )

        # exec 2: ONE pass over the materialized wave output building
        # the next frontier — inline-extracted 'link' rows plus requeued
        # pendings (wave+1) — so the frontier comes out as one
        # well-sized block per upstream fetch task (a union of two
        # filter branches would double the block count with skewed /
        # empty blocks and force a repartition barrier next wave).
        def to_frontier(t: pa.Table) -> pa.Table:
            return _frontier_project(
                t.filter(
                    pc.or_(pc.equal(t["kind"], "link"), pc.equal(t["kind"], "pending"))
                )
            )

        next_frontier = processed.map_batches(to_frontier, batch_format="pyarrow")
        if not fused:
            # checkpoint / exact-count paths materialize the frontier;
            # fused mode leaves it lazy so the projection runs INSIDE
            # the next wave's normalize+fetch execution (one streaming
            # execution per wave)
            next_frontier = next_frontier.materialize()
        t_b = time.monotonic()

        if self.opts.checkpoint_dir:
            wave_results = wave_results.materialize()

        # sweep orphaned reservations (died tasks) so requeues can
        # claim — generation-scoped: this execution (gen) has fully
        # completed at this point (materialize above is its barrier),
        # so sweeping generations < gen+1 can only touch reservations
        # whose owner task is dead, never an in-flight one
        self._reserve_gen = gen + 1
        ray.get(
            [a.clear_reservations.remote(gen + 1) for a in self.seen_actors]
        )

        m = {
            "wave": wave,
            "steps": steps,
            "frontier": frontier_n,
            # includes the inline-extracted 'link' rows
            "processed": processed.count(),
            "results": -1,  # lazy in scale mode; -1 = not counted
            # fused: counting the lazy frontier would trigger the very
            # execution the fusion avoids; -1 = not counted
            "next_frontier": -1 if fused else next_frontier.count(),
            "seen_total": self.seen.size(),
            "wall_sec": round(time.monotonic() - t0, 3),
            "phase_sec": [round(t_a - t0, 3), round(t_b - t_a, 3)],
        }
        return next_frontier, wave_results, m

    # ---------------------------------------------------------------- ckpt
    def _wave_dir(self, ckpt: str, wave: int) -> str:
        return os.path.join(ckpt, f"wave_{wave:04d}")

    def _sink_wave(self, wave: int, wave_results) -> None:
        """Write one wave's results to the events sink as parquet,
        straight from the cluster: schema-normalize per block
        (select+cast — the strict path unions two projections) and
        ``write_parquet`` into a tmp dir, then atomically rename and
        drop a sibling ``wave_XXXX._SUNK`` marker. A marker that
        already exists means a resumed run sank this wave before — the
        write is skipped (partition-level resumable output, same rule
        as the checkpoint's _COMPLETE)."""
        import shutil

        sink = self.opts.events_sink_dir
        os.makedirs(sink, exist_ok=True)
        d = os.path.join(sink, f"wave_{wave:04d}")
        marker = d + "._SUNK"
        if os.path.exists(marker):
            return
        tmp = d + "._tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        if os.path.isdir(d):
            shutil.rmtree(d)
        if wave_results.count() > 0:
            (
                wave_results.map_batches(
                    lambda t: t.select(RESULT_COLS).cast(RESULT_SCHEMA),
                    batch_format="pyarrow",
                )
                .write_parquet(tmp)
            )
            os.rename(tmp, d)
        with open(marker, "w") as f:
            f.write("ok")

    def _write_checkpoint(self, ckpt, wave, wave_results, next_frontier, m) -> None:
        """Per-wave layout: results + next frontier parquet, serialized
        actor state, metrics + lineage, then an atomic _COMPLETE marker
        — resume loads the latest complete wave and skips all finished
        work (partition-level resumability)."""
        d = self._wave_dir(ckpt, wave)
        os.makedirs(os.path.join(d, "state"), exist_ok=True)
        if wave_results.count() > 0:
            wave_results.write_parquet(os.path.join(d, "results"))
        if next_frontier.count() > 0:
            next_frontier.write_parquet(os.path.join(d, "next_frontier"))
        for i, dump in enumerate(self.seen.dump()):
            with open(os.path.join(d, "state", f"seen_shard_{i}.pkl"), "wb") as f:
                pickle.dump(dump, f)
        pol = PolitenessClient(
            self.opts.politeness_shards, actors=self.politeness_actors
        )
        with open(os.path.join(d, "state", "politeness.pkl"), "wb") as f:
            pickle.dump(pol.dump(), f)
        with open(os.path.join(d, "metrics.json"), "w") as f:
            # per-partition metrics (north rule): seen-set size per
            # shard — the skew signal rebalance_shard acts on
            json.dump(dict(m, seen_shard_sizes=self.seen.shard_sizes()), f)
        lineage = {
            "wave": wave,
            "in_frontier_rows": m["frontier"],
            "out_results_rows": m["results"],
            "out_frontier_rows": m["next_frontier"],
            "seen_total": m["seen_total"],
        }
        with open(os.path.join(d, "lineage.json"), "w") as f:
            json.dump(lineage, f)
        with open(os.path.join(d, "_COMPLETE"), "w") as f:
            f.write("ok")

    def _load_latest_checkpoint(self, ckpt: str):
        if not os.path.isdir(ckpt):
            return None
        waves = sorted(
            int(name.split("_")[1])
            for name in os.listdir(ckpt)
            if name.startswith("wave_")
            and os.path.exists(os.path.join(ckpt, name, "_COMPLETE"))
        )
        if not waves:
            return None
        last = waves[-1]
        d = self._wave_dir(ckpt, last)
        # restore actor state
        states = []
        for i in range(self.opts.seen_shards):
            with open(os.path.join(d, "state", f"seen_shard_{i}.pkl"), "rb") as f:
                states.append(pickle.load(f))
        self.seen.restore(states)
        with open(os.path.join(d, "state", "politeness.pkl"), "rb") as f:
            PolitenessClient(
                self.opts.politeness_shards, actors=self.politeness_actors
            ).restore(pickle.load(f))
        # earlier results re-loaded lazily from parquet
        results = []
        metrics = []
        for w in waves:
            rdir = os.path.join(self._wave_dir(ckpt, w), "results")
            if os.path.isdir(rdir):
                results.append(rd.read_parquet(rdir).materialize())
            with open(os.path.join(self._wave_dir(ckpt, w), "metrics.json")) as f:
                metrics.append(json.load(f))
        fdir = os.path.join(d, "next_frontier")
        if os.path.isdir(fdir):
            frontier_tbl = pa.concat_tables(
                ray.get(rd.read_parquet(fdir).to_arrow_refs())
            ).select([f.name for f in FRONTIER_SCHEMA])
            frontier_tbl = frontier_tbl.cast(FRONTIER_SCHEMA)
        else:
            frontier_tbl = _empty_frontier()
        return last + 1, frontier_tbl, results, metrics
