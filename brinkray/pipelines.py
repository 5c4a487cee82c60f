"""High-level pipelines shared by __ray_entry__, bench.py and the CLI.

The flagship pipeline synthesizes a deterministic Common-Crawl-shaped
web from a testdata ``documents`` table (the text payloads), then runs
the full BFS-wave crawl engine over it.
"""

from __future__ import annotations

import pyarrow as pa

from .engine.crawl import CrawlEngine, CrawlResult, EngineOptions
from .fixtures import build_site, site_config
from .ref.config import CrawlConfig


def pages_from_documents(
    sf_dir: str, pages_per_doc: float = 2.0, cap: int | None = None, fanout: int = 3
):
    """Deterministic pages table seeded with the sf documents' texts."""
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    texts = docs["text"].to_pylist()
    n = int(len(texts) * pages_per_doc)
    if cap is not None:
        n = min(n, cap)
    return build_site(n, texts=texts, fanout=fanout)


def run_crawl(
    pages: pa.Table,
    cfg: CrawlConfig | None = None,
    options: EngineOptions | None = None,
    seeds: list[str] | None = None,
) -> CrawlResult:
    cfg = cfg or site_config()
    eng = CrawlEngine(cfg, options or EngineOptions())
    eng.set_pages(pages)
    return eng.run(seeds=seeds)


def crawl_documents_site(
    sf_dir: str,
    pages_per_doc: float = 2.0,
    cap: int | None = None,
    options: EngineOptions | None = None,
) -> CrawlResult:
    return run_crawl(pages_from_documents(sf_dir, pages_per_doc, cap), options=options)


def host_stats(result: CrawlResult):
    """Per-host crawl accounting (SURVEY §2.5): events grouped by
    domain -> (n_events, n_cached, n_fetched). A map_batches partial
    (host projection) feeding one small groupby — the frontier-budget
    bookkeeping shape used by the politeness layer."""
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from .ref.gourl import URLError
    from .ref.urls import scheme_and_host

    def add_host(t: pa.Table) -> pa.Table:
        hosts = []
        for u in t["url"].to_pylist():
            try:
                s, h = scheme_and_host(u)
                hosts.append(f"{s}://{h}")
            except URLError:
                hosts.append("")
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "cached_i": pc.cast(t["cached"], pa.int64()),
            }
        )

    parts = [ds.map_batches(add_host, batch_format="pyarrow") for ds in result.results]
    if not parts:
        return pa.table(
            {
                "host": pa.array([], pa.string()),
                "n_events": pa.array([], pa.int64()),
                "n_cached": pa.array([], pa.int64()),
            }
        )
    ds = parts[0]
    if len(parts) > 1:
        ds = ds.union(*parts[1:])
    agg = ds.groupby("host").aggregate(
        Count(alias_name="n_events"), Sum("cached_i", alias_name="n_cached")
    )
    t = pa.concat_tables(
        [b for b in __import__("ray").get(agg.to_arrow_refs()) if b.num_rows]
    )
    return t.append_column(
        "n_fetched",
        pc.subtract(t["n_events"].cast(pa.int64()), t["n_cached"].cast(pa.int64())),
    )
