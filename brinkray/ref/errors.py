"""Typed fetch errors (reference: errors.go:1-23).

In the worker loop every one of these is a *silent drop*: the URL is
neither marked visited nor delivered to a handler (brink.go:95-101), so
it is re-fetched on every rediscovery. The engine preserves that
semantic distinction (semantic drop, never an infra retry).
"""

from __future__ import annotations


class CrawlError(Exception):
    """Base for all semantic fetch errors."""


class NotAllowed(CrawlError):
    """Domain not in the allowed set (errors.go:8-13); the request is
    made and its status then discarded (brink.go:206-215)."""

    def __init__(self, domain: str):
        self.domain = domain
        super().__init__(f"domain not allowed: {domain}")


class ContentTooLarge(CrawlError):
    """Declared content length exceeds max-content-length
    (errors.go:16-23, brink.go:219-221). Unknown length passes."""

    def __init__(self, url: str):
        self.url = url
        super().__init__(f"content too large: {url}")


class TransportError(CrawlError):
    """client.Do failure (unresolvable host, reset, ...) — brink.go:194-197."""


class NormalizeError(CrawlError):
    """normalizeURL failure — the URL never enters the pipeline
    (brink.go:76-81)."""
