"""User-facing facade with the reference's library API surface.

Maps the reference's embedding API (factory.go constructors, handler
registration brink.go:235-244, AllowDomains brink.go:158-162, Start
brink.go:19-56) onto the Ray engine. A reference user writes:

    c = Crawler.from_toml("brink.toml")        # NewCrawlerFromToml
    c.handle_default_func(handler)             # HandleDefaultFunc
    c.handle_func(404, not_found_handler)      # HandleFunc
    c.set_pages("pages.parquet")               # the sandbox web
    result = c.start()                         # Start

Handlers keep the reference's row-wise callback signature
``(linked_from, url, status, body, cached)`` and fire in
FIFO-equivalent order after each run; later registrations silently
overwrite (brink.go:240-244). For distributed (vectorized) processing
register batch hooks with ``handle_batches_func`` instead — those run
inside map_batches over the per-wave results, which is what actually
scales; row handlers exist for API parity.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa

from .engine.crawl import CrawlEngine, CrawlResult, EngineOptions
from .ref.config import (
    CrawlConfig,
    CrawlOptions,
    from_toml,
    new_config,
    new_config_with_opts,
)

Handler = Callable[[str, str, int, str, bool], None]

__all__ = ["Crawler", "Handler"]


class Crawler:
    def __init__(self, cfg: CrawlConfig, options: EngineOptions | None = None):
        self.cfg = cfg
        self.options = options or EngineOptions()
        self.default_handler: Handler | None = None
        self.handlers: dict[int, Handler] = {}
        self.batch_handlers: dict[int | None, Callable[[pa.Table], None]] = {}
        self._engine: CrawlEngine | None = None
        self._pages = None
        self.stopping = False

    # ------------------------------------------------------ constructors
    @classmethod
    def new(cls, root_domain: str, options: EngineOptions | None = None) -> "Crawler":
        """NewCrawler (factory.go:25-57)."""
        return cls(new_config(root_domain), options)

    @classmethod
    def with_opts(
        cls,
        root_domain: str,
        opts: CrawlOptions,
        options: EngineOptions | None = None,
    ) -> "Crawler":
        """NewCrawlerWithOpts (factory.go:61-131)."""
        return cls(new_config_with_opts(root_domain, opts), options)

    @classmethod
    def from_toml(cls, path: str, options: EngineOptions | None = None) -> "Crawler":
        """NewCrawlerFromToml (factory.go:133-147)."""
        return cls(from_toml(path), options)

    # ------------------------------------------------------ registration
    def handle_func(self, status: int, h: Handler) -> None:
        """brink.go:239-244 — silently overwrites."""
        self.handlers[status] = h

    def handle_default_func(self, h: Handler) -> None:
        """brink.go:231-237."""
        self.default_handler = h

    def handle_batches_func(
        self, status: int | None, fn: Callable[[pa.Table], None]
    ) -> None:
        """Distributed handler: fn(results_batch) applied via
        map_batches per wave; status=None matches every status."""
        self.batch_handlers[status] = fn

    def allow_domains(self, *domains: str) -> None:
        """brink.go:158-162 — stored VERBATIM (the reference does not
        normalize here, unlike the factory's allowed-domains option)."""
        self.cfg.allow_domains(*domains)

    def stop(self) -> None:
        """brink.go:145-149 — the wave loop checks this between waves."""
        self.stopping = True
        if self._engine is not None:
            self._engine.stopping = True

    # ------------------------------------------------------ input
    def set_pages(self, pages) -> None:
        """The sandbox web: a parquet path, ray Dataset or Arrow table."""
        self._pages = pages

    # ------------------------------------------------------ run
    def start(self, seeds: list[str] | None = None, resume: bool = False) -> CrawlResult:
        """Start (brink.go:19-56): preflight checks, then the BFS-wave
        run, then handler dispatch in FIFO-equivalent order."""
        if not self.cfg.root_domain:
            raise ValueError("root domain not specified")
        if self.default_handler is None and not self.handlers and not self.batch_handlers:
            raise ValueError("no handlers specified")
        if self._pages is None:
            raise ValueError("no pages table: call set_pages() first")

        engine = CrawlEngine(self.cfg, self.options)
        self._engine = engine
        pages = self._pages
        if isinstance(pages, str):
            import ray.data as rd

            pages = rd.read_parquet(pages)
        engine.set_pages(pages)
        result = engine.run(seeds=seeds, resume=resume)

        self._dispatch(result)
        return result

    def _dispatch(self, result: CrawlResult) -> None:
        if self.batch_handlers:
            import pyarrow.compute as pc

            for ds in result.results:
                for status, fn in self.batch_handlers.items():
                    for batch in ds.iter_batches(batch_format="pyarrow"):
                        t = (
                            batch
                            if status is None
                            else batch.filter(pc.equal(batch["status"], status))
                        )
                        if t.num_rows:
                            fn(t)
        if self.default_handler is None and not self.handlers:
            return
        t = result.events_table()
        for lf, url, status, body, cached in zip(
            t["linked_from"].to_pylist(),
            t["url"].to_pylist(),
            t["status"].to_pylist(),
            t["body"].to_pylist(),
            t["cached"].to_pylist(),
        ):
            h = self.handlers.get(status, self.default_handler)
            if h is None:
                continue  # no default + unmatched status: not delivered
            h(lf, url, status, body.decode("utf-8", "surrogateescape"), cached)
