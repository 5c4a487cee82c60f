"""URL scalar functions and HTML link extraction — reference semantics.

Every function here reproduces, observable-behavior-for-observable-
behavior, a function of the reference engine (djavorszky/brink):

* ``scheme_and_host``      <- urls.go:14-21
* ``links_in``             <- urls.go:73-106   (exact tokenizer path)
* ``links_in_fast``        same contract, regex fast path for hot stages
* ``absolute_links_in``    <- urls.go:47-67   (incl. the ``//``-prefix quirk)
* ``normalize_url``        <- urls.go:111-155 (the seen-set key function)
* ``get_path``             <- urls.go:157-164
* ``path_forbidden``       <- urls.go:166-175

All are pure and per-record; the engine wraps them in vectorized
``map_batches`` stages (brinkray.engine.stages).
"""

from __future__ import annotations

import html as _htmlmod
import re
from dataclasses import dataclass
from html.parser import HTMLParser

from .gourl import URLError, parse_query, parse_request_uri

__all__ = [
    "Link",
    "scheme_and_host",
    "get_scheme",
    "links_in",
    "links_in_fast",
    "absolute_links_in",
    "normalize_url",
    "get_path",
    "path_forbidden",
]


@dataclass
class Link:
    """A discovered anchor (reference: urls.go:34-38)."""

    linked_from: str
    href: str = ""
    target: str = ""


def scheme_and_host(url: str) -> tuple[str, str]:
    """Parse scheme + host; error when the scheme is missing (urls.go:14-21)."""
    try:
        u = parse_request_uri(url)
    except URLError as e:
        raise URLError(f"failed parsing url: {e}") from None
    return u.scheme, u.host


def get_scheme(url: str) -> str:
    """urls.go:23-30."""
    try:
        u = parse_request_uri(url)
    except URLError as e:
        raise URLError(f"failed parsing url: {e}") from None
    return u.scheme


# --------------------------------------------------------------------------
# Link extraction
# --------------------------------------------------------------------------


class _AnchorParser(HTMLParser):
    """Collects <a> start tags in document order.

    Matches the reference tokenizer loop (urls.go:85-103): only
    StartTagToken with tag "a" counts — a self-closing ``<a/>`` is a
    SelfClosingTagToken in x/net/html and is NOT matched, hence
    ``handle_startendtag`` is a no-op here.

    ``CDATA_CONTENT_ELEMENTS`` is widened to the x/net/html
    tokenizer's full raw-text/RCDATA list (tokenizer.go readStartTag:
    iframe, noembed, noframes, noscript, plaintext, script, style,
    textarea, title, xmp) — Python's default covers only script/style,
    which leaked anchors out of ``<textarea>``/``<title>``/... bodies
    that the Go tokenizer treats as text.

    Two further readStartTag rules Python's HTMLParser lacks:
    - ``z.rawTag`` is set BEFORE the self-closing check, so
      ``<script/>`` still swallows raw text up to ``</script`` —
      replicated by entering cdata mode from ``handle_startendtag``.
    - ``rawTag == "plaintext"`` reads to EOF unconditionally (there is
      no end tag), while Python's cdata mode would resume at a literal
      ``</plaintext>`` — replicated by a sticky flag that drops every
      later anchor.
    """

    CDATA_CONTENT_ELEMENTS = (
        "script", "style", "title", "textarea", "iframe",
        "noembed", "noframes", "noscript", "plaintext", "xmp",
    )

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.anchors: list[list[tuple[str, str | None]]] = []
        self._plaintext = False

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if tag == "plaintext":
            self._plaintext = True
        elif tag == "a" and not self._plaintext:
            self.anchors.append(attrs)

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if tag == "plaintext":
            self._plaintext = True
        if tag in self.CDATA_CONTENT_ELEMENTS:
            self.set_cdata_mode(tag)


def _anchors_to_links(
    anchors: list[list[tuple[str, str | None]]], linked_from: str, ignore_anchors: bool
) -> list[Link]:
    links: list[Link] = []
    for attrs in anchors:
        href = ""
        target = ""
        for k, v in attrs:  # later duplicate attrs win, like the Go attr loop
            if k == "href":
                href = v or ""
            elif k == "target":
                target = v or ""
        # checks happen BEFORE the trim (urls.go:96-101)
        if href == "javascript:;" or (ignore_anchors and href.startswith("#")):
            continue
        href = href.strip(" ")  # strings.Trim(href, " ") — ASCII space only
        links.append(Link(linked_from=linked_from, href=href, target=target))
    return links


def links_in(linked_from: str, body: bytes | str, ignore_anchors: bool) -> list[Link]:
    """Extract anchors (urls.go:73-106). Malformed HTML never errors."""
    if isinstance(body, bytes):
        body = body.decode("utf-8", "surrogateescape")
    # WHATWG tokenizer NUL rule (implemented by x/net/html): U+0000 in
    # tag-name/attribute states becomes U+FFFD; data-state NULs never
    # reach an anchor, so a whole-body replacement reproduces the
    # attribute-value behavior exactly
    if "\x00" in body:
        body = body.replace("\x00", "�")
    p = _AnchorParser()
    try:
        p.feed(body)
        p.close()
    except Exception:
        # the reference tokenizer recovers from anything; EOF == success
        pass
    return _anchors_to_links(p.anchors, linked_from, ignore_anchors)


# Fast path: a single compiled scan that skips comments and raw-text
# elements, then matches <a ...> start tags. Equivalent to ``links_in``
# on the engine's HTML envelope; tests/test_extract_equivalence.py pins
# the two implementations against each other over the fixture corpus.
_TOKEN_RE = re.compile(
    rb"(?:<!--.*?(?:-->|$))"
    rb"|(?:<script\b.*?(?:</script\s*>|$))"
    rb"|(?:<style\b.*?(?:</style\s*>|$))"
    rb"|(?:<title\b.*?(?:</title\s*>|$))"
    rb"|(?:<textarea\b.*?(?:</textarea\s*>|$))"
    rb"|(?:<iframe\b.*?(?:</iframe\s*>|$))"
    rb"|(?:<noembed\b.*?(?:</noembed\s*>|$))"
    rb"|(?:<noframes\b.*?(?:</noframes\s*>|$))"
    rb"|(?:<noscript\b.*?(?:</noscript\s*>|$))"
    rb"|(?:<xmp\b.*?(?:</xmp\s*>|$))"
    rb"|(?:<plaintext\b.*$)"
    rb"|<a(?=[\s/>])(?P<tag>[^>]*)>",
    re.IGNORECASE | re.DOTALL,
)
_ATTR_RE = re.compile(
    rb"""([a-zA-Z_:][-a-zA-Z0-9_:.]*)(?:\s*=\s*("[^"]*"|'[^']*'|[^\s>]*))?""",
)


def links_in_fast(linked_from: str, body: bytes, ignore_anchors: bool) -> list[Link]:
    """Regex-based twin of ``links_in`` for hot map_batches stages."""
    anchors: list[list[tuple[str, str | None]]] = []
    for m in _TOKEN_RE.finditer(body):
        tag = m.group("tag")
        if tag is None:
            continue  # comment / raw-text block
        if tag.rstrip().endswith(b"/"):
            continue  # self-closing: SelfClosingTagToken, not matched
        attrs: list[tuple[str, str | None]] = []
        for am in _ATTR_RE.finditer(tag):
            key = am.group(1).lower().decode("utf-8", "surrogateescape")
            raw_val = am.group(2)
            if raw_val is None:
                attrs.append((key, None))
                continue
            if raw_val[:1] in (b'"', b"'"):
                raw_val = raw_val[1:-1]
            val = _htmlmod.unescape(raw_val.decode("utf-8", "surrogateescape"))
            attrs.append((key, val))
        anchors.append(attrs)
    return _anchors_to_links(anchors, linked_from, ignore_anchors)


def absolute_links_in(
    host_url: str,
    linked_from: str,
    body: bytes | str,
    ignore_anchors: bool,
    *,
    fast: bool = False,
) -> list[Link]:
    """urls.go:47-67 — including the ``//``-prefix reproduction.

    A protocol-relative ``//host/p`` href becomes the malformed
    ``scheme:////host/p`` (Sprintf("%s://%s", scheme, href) at
    urls.go:55-58); a root-relative ``/p`` href becomes
    ``scheme://host/p``; every other relative href is left verbatim and
    will later fail normalization (and be silently dropped by the
    worker loop, brink.go:76-81).
    """
    scheme, host = scheme_and_host(host_url)  # raises on parse failure
    extract = links_in_fast if fast else links_in
    if isinstance(body, str):
        body = body.encode("utf-8", "surrogateescape")
    links = extract(linked_from, body, ignore_anchors)
    for l in links:
        if l.href.startswith("//"):
            l.href = f"{scheme}://{l.href}"
        if l.href.startswith("/"):
            l.href = f"{scheme}://{host}{l.href}"
    return links


# --------------------------------------------------------------------------
# Normalization (the seen-set key function) and path predicates
# --------------------------------------------------------------------------


def normalize_parts(
    url: str, ignored_params: frozenset[str] | set[str] = frozenset(), fuzzy: bool = False
) -> tuple[str, str, str, str]:
    """``normalize_url`` plus its parse by-products in one pass:
    returns (canon, scheme, host, path) — the engine's normalize stage
    needs the domain and path columns anyway."""
    u = parse_request_uri(url.strip())  # strings.TrimSpace
    params = parse_query(u.raw_query)

    ignore = len(ignored_params) > 0
    result: list[str] = []
    for key, vals in params.items():
        if ignore:
            if key in ignored_params:
                continue
            if fuzzy and any(p in key for p in ignored_params):
                continue
        for val in vals:
            result.append(key if val == "" else f"{key}={val}")

    if not result:
        return f"{u.scheme}://{u.host}{u.path}", u.scheme, u.host, u.path
    result.sort()
    return (
        f"{u.scheme}://{u.host}{u.path}?{'&'.join(result)}",
        u.scheme,
        u.host,
        u.path,
    )


def normalize_url(
    url: str, ignored_params: frozenset[str] | set[str] = frozenset(), fuzzy: bool = False
) -> str:
    """urls.go:111-155 — canonical form keyed into the seen set.

    Trim; parse (error => caller drops the URL); drop ignored GET params
    (exact, plus substring match when ``fuzzy``); render ``k=v`` (bare
    ``k`` for empty values); sort the *rendered strings*
    lexicographically; rebuild ``scheme://host+path[?joined]``.
    """
    return normalize_parts(url, ignored_params, fuzzy)[0]


def get_path(url: str) -> str:
    """urls.go:157-164."""
    try:
        u = parse_request_uri(url.strip())
    except URLError as e:
        raise URLError(f"getPath: {e}") from None
    return u.path


def path_forbidden(url: str, forbidden: frozenset[str] | set[str]) -> bool:
    """urls.go:166-175 — substring-of-path; parse failure => False."""
    try:
        p = get_path(url)
    except URLError:
        return False
    return any(f in p for f in forbidden)
