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
