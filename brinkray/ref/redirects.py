"""HTTP redirect-following semantics (Go net/http default client).

The reference fetches with ``&http.Client{}`` (factory.go:42), whose
default ``CheckRedirect`` follows redirects silently and refuses a hop
once 10 requests have been made ("stopped after 10 redirects",
net/http defaultCheckRedirect): the initial request plus up to NINE
followed redirects succeed; needing a tenth redirect turns the whole
fetch into an error, which brink's worker loop treats as a silent drop
(brink.go:95-101) — no seen-set entry, no handler, no links, re-fetched
on every rediscovery.

Successful follows are INVISIBLE to brink. It records the ORIGINAL
requested url with the FINAL response's status (brink.go:104), handlers
receive the FINAL body, links in that body are absolutized against the
ORIGINAL url (brink.go:116: ``AbsoluteLinksIn(link.Href, link.Href,
bod, true)``) — so a relative link served by the redirect target
resolves against the host the crawler asked for — and the
allowed-domain gate checks only the ORIGINAL url's domain
(brink.go:205-215): an allowed url redirecting off-domain serves the
off-domain body. A hop to an unresolvable host fails the whole fetch
(client.Do errors mid-chain).

Sandbox conventions (same spirit as world.py's ``/status/NNN``; the
"server" is a path rule, so intermediate hop urls need no table rows):

* ``/redir/{n}/{rest}``   — a chain of ``n`` same-host 301 hops
  (``/redir/{n-1}/{rest}`` ... ``/redir/1/{rest}``) landing on
  ``/{rest}``; resolvable iff ``n <= 9``.
* ``/xredir/{host}/{rest}`` — ONE hop to ``{scheme}://{host}/{rest}``
  (scheme preserved); ``host`` must be resolvable.

Conventions compose: a chain may land on another redirect path and the
request budget keeps counting. A query string on the redirect url
survives the chain (the sandbox server's Location echoes it), matching
the canon's normalized suffix. Redirect paths shadow table rows the way
``/err/`` does — a table page AT a redirect path is never served.
"""

from __future__ import annotations

import re

from .errors import TransportError

__all__ = ["MAX_REQUESTS", "is_redirect_path", "resolve_chain"]

# Go's defaultCheckRedirect: refuse when len(via) >= 10 — via holds the
# requests already made, so requests 1..10 happen and the hop that
# would be request 11 (the 10th redirect) errors the fetch.
MAX_REQUESTS = 10

_REDIR_RE = re.compile(r"^/redir/(\d+)(/.*)$")
_XREDIR_RE = re.compile(r"^/xredir/([^/]+)(/.*)$")


def is_redirect_path(path: str) -> bool:
    return path.startswith("/redir/") or path.startswith("/xredir/")


def resolve_chain(
    scheme: str, host: str, path: str, known_hosts
) -> tuple[str, str, str]:
    """Follow the path-encoded redirect chain from ``path`` on
    ``scheme://host``; returns the final (scheme, host, path).

    Raises TransportError when the chain needs more than
    ``MAX_REQUESTS`` total requests (Go: "stopped after 10 redirects")
    or when a hop's target host is not resolvable (client.Do fails
    mid-chain). The caller keeps gating — allowed-domain, /err/ landing,
    content length — exactly as for a direct fetch.
    """
    requests = 1  # the initial request
    while True:
        m = _REDIR_RE.match(path)
        x = None if m else _XREDIR_RE.match(path)
        if m is None and x is None:
            return scheme, host, path
        if requests >= MAX_REQUESTS:
            raise TransportError(
                f"get failed: Get {scheme}://{host}{path}: "
                "stopped after 10 redirects"
            )
        requests += 1
        if m is not None:
            n = int(m.group(1))
            rest = m.group(2)
            path = f"/redir/{n - 1}{rest}" if n > 1 else rest
        else:
            host = x.group(1)
            path = x.group(2)
            if f"{scheme}://{host}" not in known_hosts:
                raise TransportError(
                    f"get failed: no such host {scheme}://{host}"
                )
