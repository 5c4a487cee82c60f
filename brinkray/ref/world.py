"""The sandbox "web": deterministic fetch semantics over a pages table.

The reference fetches live HTTP (brink.go:166-229). In this sandbox the
web IS the Common-Crawl-style pages table (BASELINE.json input_hint),
so ``Fetch`` becomes a deterministic lookup — shared, gate-for-gate, by
the single-process oracle and the distributed engine so their results
can be diffed exactly.

World-model conventions (fixed, documented here once):

* a URL's *domain* is ``scheme://host``; a domain is *known* iff some
  page in the table lives on it. Unknown domain => transport error
  (client.Do fails on an unresolvable host, brink.go:194-197).
* a path starting with ``/err/`` on a known host => transport error
  (simulated connection reset), regardless of the table.
* a path starting with ``/status/NNN`` serves its table row with HTTP
  status NNN (lets fixtures exercise non-200 handler routing).
* a canon URL absent from the table on a known host => 404, empty body
  (a real server's not-found page).
* gate order is Fetch's (brink.go:206-228): the request happens first,
  THEN the allowed-domain check (NotAllowed discards the status), THEN
  the content-length check (len(body) > max => ContentTooLarge; the
  reference checks the declared header and lets unknown lengths pass —
  in the sandbox every length is known).

Every ``CrawlError`` raised here is a *semantic drop* in the worker
loop: not marked visited, not handled, re-fetched on rediscovery
(brink.go:95-101).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .config import CrawlConfig
from .errors import ContentTooLarge, NotAllowed, TransportError
from .gourl import URLError
from .redirects import is_redirect_path, resolve_chain
from .urls import normalize_url, scheme_and_host

_STATUS_RE = re.compile(r"^/status/(\d{3})(?:/|$)")

__all__ = ["Web", "page_status_for_path", "fetch"]


def page_status_for_path(path: str) -> int:
    """The /status/NNN path convention; everything else serves 200."""
    m = _STATUS_RE.match(path)
    return int(m.group(1)) if m else 200


@dataclass
class Web:
    """Canon-keyed page index + the set of known (resolvable) domains."""

    index: dict[str, tuple[int, bytes]] = field(default_factory=dict)
    known_hosts: set[str] = field(default_factory=set)

    @classmethod
    def build(cls, urls, htmls, cfg: CrawlConfig) -> "Web":
        """Index pages by their canonical URL under ``cfg``'s
        normalization (first occurrence wins)."""
        web = cls()
        for url, html in zip(urls, htmls):
            try:
                canon = normalize_url(url, cfg.ignored_get_params, cfg.fuzzy)
                scheme, host = scheme_and_host(url)
            except URLError:
                continue
            web.known_hosts.add(f"{scheme}://{host}")
            if canon not in web.index:
                try:
                    path = _path_of(canon)
                except URLError:
                    path = ""
                web.index[canon] = (page_status_for_path(path), bytes(html))
        return web

    def fetch(self, canon: str, cfg: CrawlConfig) -> tuple[int, bytes]:
        return fetch(self.index, self.known_hosts, canon, cfg)


def _path_of(url: str) -> str:
    from .urls import get_path

    return get_path(url)


def fetch(
    index: dict[str, tuple[int, bytes]],
    known_hosts: set[str],
    canon: str,
    cfg: CrawlConfig,
) -> tuple[int, bytes]:
    """The sandbox Fetch (brink.go:166-229 gate order). Raises a
    CrawlError subclass for every silent-drop branch."""
    try:
        scheme, host = scheme_and_host(canon)
    except URLError as e:
        raise TransportError(f"failed creating new request: {e}") from None
    domain = f"{scheme}://{host}"

    # (a) the request itself — transport failures
    if domain not in known_hosts:
        raise TransportError(f"get failed: no such host {domain}")
    try:
        path = _path_of(canon)
    except URLError:
        path = ""

    # (b) redirect chains happen INSIDE the request (Go client.Do
    # follows them; ref/redirects.py conventions + request budget).
    # The lookup key becomes the FINAL url's canon; every later gate
    # except content-length stays on the ORIGINAL url.
    lookup = canon
    if is_redirect_path(path):
        f_scheme, f_host, f_path = resolve_chain(scheme, host, path, known_hosts)
        qsuffix = canon[len(f"{scheme}://{host}{path}"):]
        lookup = f"{f_scheme}://{f_host}{f_path}{qsuffix}"
        path = f_path
    if path.startswith("/err/"):
        raise TransportError(f"get failed: connection reset {canon}")

    entry = index.get(lookup)
    if entry is None:
        status, body = 404, b""
    else:
        status, body = entry

    # (e) domain gate AFTER the request (brink.go:206-215)
    if not cfg.domain_allowed(domain):
        raise NotAllowed(domain)

    # (f) content-length gate (brink.go:219-221)
    if len(body) > cfg.max_content_length:
        raise ContentTooLarge(canon)

    return status, body
