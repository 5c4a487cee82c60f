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

__all__ = ["PageIndex", "build_page_index", "index_batch_fn"]


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
                "html": pa.array([t["html"][i].as_py() for i in keep], pa.binary()),
            }
        )

    return fn


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
