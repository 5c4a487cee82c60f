"""Page index: the sandbox stand-in for "the web" (fetch-as-join, J1).

Builds a canon-keyed Arrow index over the pages table and broadcasts it
through the object store: ONE ``ray.put`` of an Arrow table whose
buffers are then mapped zero-copy by every fetcher actor (`ray.get` of
an Arrow object does not copy page data), instead of re-shipping a
Python dict per task.

Scale path: broadcast works while the corpus fits a node's object store
(~100 GB). Beyond that the engine switches to ``index_mode=
"partitioned"`` (see fetch.py): pages are hash-partitioned by canon
into parquet shards once, and each wave's fetch joins frontier shard k
against pages shard k (a co-partitioned hash join). On a real crawl the
index disappears entirely — the fetcher actor does HTTP.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import ray

from ..ref.config import CrawlConfig
from ..ref.gourl import URLError
from ..ref.urls import normalize_parts
from ..ref.world import page_status_for_path

__all__ = [
    "PageIndex",
    "BlockPageIndex",
    "build_page_index",
    "build_page_index_distributed",
    "index_batch_fn",
]


@dataclass
class PageIndex:
    """Handles shipped into fetcher closures (all cheap to serialize)."""

    table_ref: "ray.ObjectRef"  # pa.Table(canon, status, html)
    known_hosts: frozenset[str]
    n_pages: int
    robots_bodies: dict[str, str] = None  # domain -> robots.txt text


def index_batch_fn(cfg: CrawlConfig):
    """map_batches fn: pages(url, html) -> (canon, domain, status, html)."""
    ignored = cfg.ignored_get_params
    fuzzy = cfg.fuzzy

    def fn(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        keep, canons, domains, statuses = [], [], [], []
        for i, u in enumerate(urls):
            try:
                canon, scheme, host, _ = normalize_parts(u, ignored, fuzzy)
            except URLError:
                continue  # unfetchable table row
            try:
                from ..ref.urls import get_path

                path = get_path(canon)
            except URLError:
                path = ""
            keep.append(i)
            canons.append(canon)
            domains.append(f"{scheme}://{host}")
            statuses.append(page_status_for_path(path))
        return pa.table(
            {
                "canon": pa.array(canons, pa.string()),
                "domain": pa.array(domains, pa.string()),
                "status": pa.array(statuses, pa.int32()),
                # large_binary: 64-bit offsets — a broadcast corpus
                # column easily exceeds the 2 GB int32 offset limit
                "html": pa.array([t["html"][i].as_py() for i in keep], pa.large_binary()),
            }
        )

    return fn


@dataclass
class PartitionedPageIndex:
    """Disk-partitioned variant for corpora beyond broadcast size:
    pages hash-partitioned by sha1(canon) % nparts into parquet shard
    dirs; fetcher tasks load only the shards their rows hash to, held
    in a per-worker LRU auto-sized to a memory budget (frontier blocks
    are NOT shard-ranged — see PartitionedFetcher's docstring for the
    sizing rationale and the 100-TB follow-up)."""

    root: str
    nparts: int
    known_hosts: frozenset[str]
    n_pages: int
    robots_bodies: dict[str, str] = None


def build_partitioned_index(
    pages, cfg: CrawlConfig, out_dir: str, nparts: int = 16
) -> PartitionedPageIndex:
    """One distributed pass: normalize + hash-partition + write."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from ..state.cuckoo import sha1_64

    if isinstance(pages, pa.Table):
        ds = rd.from_arrow(pages.select(["url", "html"]))
    else:
        ds = pages.select_columns(["url", "html"])

    for p in range(nparts):
        os.makedirs(os.path.join(out_dir, f"pshard={p}"), exist_ok=True)

    base_fn = index_batch_fn(cfg)

    def write_shards(t: pa.Table) -> pa.Table:
        t = base_fn(t)
        canons = t["canon"].to_pylist()
        # the 64-bit canon hash is computed ONCE here and persisted as a
        # shard column: fetchers then probe with np.searchsorted against
        # the load-time-sorted h instead of rebuilding hash tables or
        # hashing strings per batch (mirrors build_page_index's layout)
        hs = [sha1_64(c) for c in canons]
        shards = [h % nparts for h in hs]
        t2 = t.append_column("pshard", pa.array(shards, pa.int32())).append_column(
            "h", pa.array(hs, pa.uint64())
        )
        # deterministic filename per block content: Ray may run a map
        # UDF more than once (schema inference, retries) — the rewrite
        # must land on the same file, not duplicate rows
        part_id = f"{sha1_64(''.join(canons[:50]) + str(len(canons))):016x}"
        for p in sorted(set(shards)):
            sub = t2.filter(pa.array([s == p for s in shards]))
            pq.write_table(
                sub.select(["canon", "status", "html", "h"]),
                os.path.join(out_dir, f"pshard={p}", f"part-{part_id}.parquet"),
            )
        doms = sorted(set(t["domain"].to_pylist()))
        robots_map = {d: "" for d in doms}
        for canon, dom, html in zip(
            canons, t["domain"].to_pylist(), t["html"].to_pylist()
        ):
            if canon == f"{dom}/robots.txt":
                robots_map[dom] = bytes(html).decode("utf-8", "replace")
        return pa.table(
            {
                "domain": pa.array(doms, pa.string()),
                "robots_txt": pa.array([robots_map[d] for d in doms], pa.string()),
            }
        )

    summary = pa.concat_tables(
        ray.get(ds.map_batches(write_shards, batch_format="pyarrow").to_arrow_refs())
    )
    known_hosts = frozenset(summary["domain"].to_pylist())
    robots_bodies = {
        d: txt
        for d, txt in zip(
            summary["domain"].to_pylist(), summary["robots_txt"].to_pylist()
        )
        if txt
    }
    # n_pages: sum of one n per input block is inexact; count shard rows
    n_pages = sum(
        pq.ParquetFile(os.path.join(out_dir, f"pshard={p}", f)).metadata.num_rows
        for p in range(nparts)
        for f in os.listdir(os.path.join(out_dir, f"pshard={p}"))
    )
    return PartitionedPageIndex(
        root=out_dir,
        nparts=nparts,
        known_hosts=known_hosts,
        n_pages=n_pages,
        robots_bodies=robots_bodies,
    )


@dataclass
class BlockPageIndex:
    """Distributed broadcast index: the corpus lives as h-sorted Arrow
    blocks in the object store (the output blocks of a DISTRIBUTED
    sort), with only (block ref, h-range) metadata on the driver.
    Unlike ``PageIndex`` (one driver-concat'd table), nothing
    corpus-sized ever touches the driver heap — the 100-TB build path.
    ``bounds`` carries the per-block [min_h, max_h] ranges; the build
    uses them to detect duplicate-hash runs that straddle block cuts,
    and BlockRefFetcher probes by zero-copy-mapping all blocks and
    searchsorting ONE concatenated h array (cheaper per batch than a
    per-row bounds bisection; the ranges would route block-granular
    loads on a cluster whose workers can't map every block)."""

    block_refs: list  # ObjectRef[pa.Table(canon, status, html, h)], h-sorted
    bounds: "object"  # np.ndarray (nblocks, 2) uint64 [min_h, max_h]
    known_hosts: frozenset
    n_pages: int
    robots_bodies: dict = None


@ray.remote
def _block_meta(tbl: pa.Table):
    """Per-block metadata for the distributed index build: h range,
    hosts, robots bodies, rows, duplicate-h count (zero-copy read)."""
    n = tbl.num_rows
    if n == 0:
        return None
    h = tbl["h"].to_numpy(zero_copy_only=False)
    hosts = set()
    robots = {}
    doms = tbl["domain"].to_pylist()
    canons = tbl["canon"].to_pylist()
    hosts.update(doms)
    for canon, dom, html in zip(canons, doms, tbl["html"].to_pylist()):
        if canon == f"{dom}/robots.txt":
            robots[dom] = bytes(html).decode("utf-8", "replace")
    n_dup_h = int(n - len(set(h.tolist())))
    return (int(h[0]), int(h[-1]), hosts, robots, n, n_dup_h)


def build_page_index_distributed(ds, cfg: CrawlConfig) -> BlockPageIndex:
    """Dataset in -> distributed normalize/hash -> DISTRIBUTED sort by
    h -> sorted blocks stay in the object store; the driver sees only
    refs + ranges. Canon-collision note: the table-input build keeps
    the reference's exact first-occurrence-wins; a distributed build
    has no global row order, so duplicate canons (which do not occur
    in generated corpora; duplicate detection is logged) resolve to an
    arbitrary winner."""
    import logging

    import numpy as np

    from ..state.cuckoo import sha1_64

    base_fn = index_batch_fn(cfg)

    def with_h(t: pa.Table) -> pa.Table:
        t = base_fn(t)
        hs = np.fromiter(
            (sha1_64(c) for c in t["canon"].to_pylist()),
            dtype=np.uint64,
            count=t.num_rows,
        )
        return t.append_column("h", pa.array(hs, pa.uint64()))

    # big sort blocks: the fetchers gather per chunk, so fewer/larger
    # chunks amortize the per-chunk probe overhead (the crawl itself
    # re-tightens target_max_block_size for its own frontier blocks)
    from ray.data import DataContext

    ctx = DataContext.get_current()
    prev_target = ctx.target_max_block_size
    ctx.target_max_block_size = 256 * 1024 * 1024
    try:
        s = (
            ds.select_columns(["url", "html"])
            .map_batches(with_h, batch_format="pyarrow")
            .sort("h")
            .materialize()
        )
    finally:
        ctx.target_max_block_size = prev_target
    refs = s.to_arrow_refs()
    metas_all = ray.get([_block_meta.remote(r) for r in refs])
    keep = [r for r, m in zip(refs, metas_all) if m]
    metas = [m for m in metas_all if m]
    if not metas:
        return BlockPageIndex([], np.zeros((0, 2), np.uint64), frozenset(), 0, {})
    bounds = np.array([[m[0], m[1]] for m in metas], dtype=np.uint64)
    hosts = frozenset().union(*[m[2] for m in metas])
    robots = {}
    for m in metas:
        robots.update(m[3])
    n_pages = sum(m[4] for m in metas)
    n_dup = sum(m[5] for m in metas)
    # _block_meta counts duplicate hashes only WITHIN each sorted
    # block; a duplicate run straddling a block boundary shows up here
    # instead, as equal boundary hashes of adjacent blocks (blocks are
    # globally h-sorted, so block i's max == block i+1's min iff the
    # run crosses the cut) — without this the no-silent-caps warning
    # below would miss exactly those
    n_dup += int(np.sum(bounds[:-1, 1] == bounds[1:, 0])) if len(bounds) > 1 else 0
    if n_dup:
        logging.getLogger("brinkray.index").warning(
            "distributed index build found %d duplicate canon hashes; "
            "winner choice is arbitrary (table-input build preserves "
            "exact first-occurrence-wins)",
            n_dup,
        )
    return BlockPageIndex(
        block_refs=keep,
        bounds=bounds,
        known_hosts=hosts,
        n_pages=n_pages,
        robots_bodies=robots,
    )


def build_page_index(pages, cfg: CrawlConfig) -> PageIndex:
    """``pages``: a ray.data.Dataset or a pyarrow Table with (url, html).

    First occurrence wins on canon collisions (Web.build semantics).
    """
    import ray.data as rd

    if isinstance(pages, pa.Table):
        ds = rd.from_arrow(pages.select(["url", "html"]))
    else:
        ds = pages.select_columns(["url", "html"])

    mapped = ds.map_batches(index_batch_fn(cfg), batch_format="pyarrow")
    tbl = pa.concat_tables(ray.get(mapped.to_arrow_refs()))

    # first-occurrence-wins dedup (driver-side single pass over canons;
    # at broadcast scale the canon column fits the driver comfortably)
    canons = tbl["canon"].to_pylist()
    first: dict[str, int] = {}
    for i, c in enumerate(canons):
        if c not in first:
            first[c] = i
    if len(first) != len(canons):
        tbl = tbl.take(pa.array(sorted(first.values()), pa.int64()))

    known_hosts = frozenset(tbl["domain"].to_pylist())
    index_tbl = tbl.select(["canon", "status", "html"]).combine_chunks()

    # sorted-hash lookup column: fetchers probe with np.searchsorted
    # (vectorized, zero allocation) instead of pc.index_in, whose
    # per-call hash-table build over a multi-million-row value_set costs
    # ~100 ms and hundreds of MB of allocation PER BATCH
    import numpy as np

    from ..state.cuckoo import sha1_64

    hashes = np.fromiter(
        (sha1_64(c) for c in index_tbl["canon"].to_pylist()),
        dtype=np.uint64,
        count=index_tbl.num_rows,
    )
    order = np.argsort(hashes, kind="stable")
    index_tbl = index_tbl.take(pa.array(order, pa.int64())).combine_chunks()
    index_tbl = index_tbl.append_column(
        "h", pa.array(hashes[order], pa.uint64())
    )

    # robots.txt bodies, straight from the table (the sandbox web)
    robots_bodies: dict[str, str] = {}
    robots_canons = {f"{d}/robots.txt": d for d in known_hosts}
    for canon, html in zip(index_tbl["canon"].to_pylist(), index_tbl["html"].to_pylist()):
        d = robots_canons.get(canon)
        if d is not None:
            robots_bodies[d] = bytes(html).decode("utf-8", "replace")

    return PageIndex(
        table_ref=ray.put(index_tbl),
        known_hosts=known_hosts,
        n_pages=index_tbl.num_rows,
        robots_bodies=robots_bodies,
    )
