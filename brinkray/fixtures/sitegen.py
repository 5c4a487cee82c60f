"""Deterministic synthetic-web generator (FIXTURES.md §B).

Emits a Common-Crawl-shaped pages table
``(url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string)`` whose link graph exercises every cited reference
behavior: seen-set collapse of GET-param variants, anchors /
``javascript:;`` / empty / padded hrefs, protocol-relative links (the
``https:////`` reproduction), bare relative links that die at
normalization, dangling 404s, transport-error paths, oversized pages,
non-200 pages, forbidden paths, a disallowed-but-resolvable host and an
unresolvable host.

Everything is a pure function of (n_pages, seed, texts); no wall clock,
no randomness beyond a seeded generator. The ``text`` column is derived
from ``html`` with brinkray.ref.text.extract_text, which is also what
the engine's extract stage computes — byte-identity by construction,
verified end-to-end by the tests.

HTML stays inside the pinned tokenizer envelope (double-quoted
attributes, no ``>`` inside attribute values) so the exact and fast
link extractors agree (tests/test_extract_equivalence.py).
"""

from __future__ import annotations

import html as _htmlmod
import zlib

import pyarrow as pa

from ..ref.config import CrawlConfig, CrawlOptions, new_config_with_opts
from ..ref.text import extract_text

HOST_A = "https://site-a.test"
HOST_B = "https://site-b.test"
HOST_BLOCKED = "https://blocked.test"  # resolvable but not allowed
HOST_UNKNOWN = "https://nowhere.invalid"  # unresolvable => transport error

MAX_CONTENT_LENGTH = 8192  # fixture config cap; /big pages exceed it

_WORDS = (
    "frontier crawl wave arrow batch shard actor filter token bucket "
    "stream page link anchor host path query param status body cache"
).split()

_WARC_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in micros


def site_config(fuzzy: bool = False) -> CrawlConfig:
    """The fixture crawl config matching the generated site."""
    opts = CrawlOptions(
        allowed_domains=[HOST_B],
        ignore_get_parameters=["session"],
        fuzzy_get_parameter_checks=fuzzy,
        forbidden_paths=["admin/"],
        max_content_length=MAX_CONTENT_LENGTH,
    )
    return new_config_with_opts(HOST_A, opts)


def _host_of(i: int) -> str:
    # 2:1 skew toward host A — exercises per-host imbalance
    return HOST_B if i % 3 == 2 else HOST_A


def _text_for(i: int, texts: list[str] | None) -> str:
    if texts:
        t = texts[i % len(texts)]
        return t[:1500]
    return " ".join(_WORDS[(i * 7 + j * 3) % len(_WORDS)] for j in range(12)) + f" page {i}"


def _warc_ts(url: str) -> int:
    return _WARC_EPOCH_US + (zlib.crc32(url.encode()) % 10_000_000) * 1_000_000


def _page(url: str, body_html: str, lang: str, rows: dict) -> None:
    html_bytes = body_html.encode("utf-8")
    rows["url"].append(url)
    rows["warc_ts"].append(_warc_ts(url))
    rows["html"].append(html_bytes)
    rows["text"].append(extract_text(html_bytes))
    rows["lang"].append(lang)


def _doc(i: int, title: str, text: str, anchors: list[str], extra: str = "") -> str:
    items = "".join(f"<li>{a}</li>" for a in anchors)
    return (
        f"<html><head><title>{title}</title></head><body>"
        f"<h1>{_htmlmod.escape(title)}</h1>"
        f"<p>{_htmlmod.escape(text)}</p>"
        f"<!-- generated page {i} -->"
        f"{extra}"
        f"<ul>{items}</ul>"
        "</body></html>"
    )


def _a(href: str, label: str, target: str = "") -> str:
    t = f' target="{target}"' if target else ""
    return f'<a href="{href}"{t}>{_htmlmod.escape(label)}</a>'


ROBOTS_A = (
    "# robots for site-a\n"
    "User-agent: evilbot\n"
    "Disallow: /\n"
    "\n"
    "User-agent: *\n"
    "Disallow: /missing/\n"
    "Disallow: /p/13\n"
    "Allow: /p/13/deeper\n"
)
ROBOTS_B = "User-agent: *\nDisallow: /status/\n"


def build_site(
    n_pages: int,
    seed: int = 42,
    texts: list[str] | None = None,
    fanout: int = 3,
    with_robots: bool = False,
    with_redirects: bool = False,
    row_range: tuple[int, int] | None = None,
) -> pa.Table:
    """Build the pages table. Page 0 is the root (path-less URL on
    HOST_A); pages 1..n-1 live at /p/{i}; the tree fanout link
    structure (i -> fanout*i+1 .. fanout*i+fanout) makes every page
    reachable in ~log_fanout(n) waves. Conformance fixtures use the
    default fanout=3; the bench uses a wider fanout so wave width (real
    work) dominates the per-wave fixed cost."""
    rows: dict[str, list] = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}

    n_blocked = max(2, n_pages // 50)
    lo, hi = row_range if row_range is not None else (0, n_pages)

    def _start(step: int) -> int:
        return ((lo + step - 1) // step) * step

    for i in range(lo, hi):
        host = HOST_A if i == 0 else _host_of(i)
        url = HOST_A if i == 0 else f"{host}/p/{i}"
        anchors: list[str] = []

        # fanout-3 tree + one cross link: the reachable core.
        # Root-relative hrefs resolve against the PARENT's host
        # (urls.go:60-63), so a child on the other host needs an
        # absolute href to be reachable at its real URL.
        for c in range(fanout * i + 1, fanout * i + fanout + 1):
            if c < n_pages:
                ch = _host_of(c)
                href = f"/p/{c}" if ch == host else f"{ch}/p/{c}"
                anchors.append(_a(href, f"child {c}"))
        cross = (i * 7 + 3) % n_pages
        if cross != i and cross != 0:
            ch = _host_of(cross)
            anchors.append(_a(f"{ch}/p/{cross}", f"cross {cross}", target="_blank"))

        t = (i * 11 + 5) % n_pages  # quirk-link target

        if i % 5 == 0:
            # ignored GET param: collapses onto /p/{t}'s canon (urls.go:129)
            anchors.append(_a(f"/p/{t}?session=s{i}", "session variant"))
        if i % 7 == 0:
            # param-order variants: both normalize identically (urls.go:152)
            anchors.append(_a(f"/p/{t}?b=2&a=1", "params ba"))
            anchors.append(_a(f"/p/{t}?a=1&b=2", "params ab"))
            anchors.append(_a(f"/p/{t}?flag", "valueless"))
        if i % 11 == 0:
            anchors.append(_a("#top", "anchor link"))
            anchors.append(_a("javascript:;", "js link"))
            anchors.append("<a>no href</a>")
            anchors.append(_a(f" /p/{t} ", "padded href"))
        if i % 13 == 0:
            # protocol-relative => https:////... => dropped (urls.go:55-58)
            anchors.append(_a(f"//site-b.test/p/{t}", "protocol relative"))
            # bare relative => dies at normalize (brink.go:76-81)
            anchors.append(_a("page.html", "bare relative"))
        if i % 17 == 0:
            anchors.append(_a(f"/missing/{i}", "dangling 404"))
            anchors.append(_a(f"/err/{i}", "transport error"))
        if i % 19 == 0:
            anchors.append(_a(f"{HOST_BLOCKED}/p/{i % n_blocked}", "blocked host"))
            anchors.append(_a(f"{HOST_UNKNOWN}/x/{i}", "unknown host"))
        if i % 23 == 0:
            anchors.append(_a(f"/big/{i}", "oversized"))
        if i % 29 == 0:
            anchors.append(_a(f"/status/503/{i}", "unavailable"))
        if i % 31 == 0:
            anchors.append(_a(f"/admin/{i}", "forbidden path"))
        if with_redirects:
            # path-encoded redirect chains (ref/redirects.py conventions;
            # opt-in so the redirect-free conformance fixtures and their
            # SQL twins are untouched)
            other = HOST_B if host == HOST_A else HOST_A
            if i % 41 == 0:
                # 2 same-host hops; lands on /p/{t} — which 404s when
                # t's real page lives on the other host
                anchors.append(_a(f"/redir/2/p/{t}", "redirect chain"))
            if i % 43 == 0:
                # needs 12 hops > Go's request budget => silent drop
                anchors.append(_a(f"/redir/12/p/{t}", "redirect too deep"))
            if i % 47 == 0:
                # cross-host hop: final body served from the OTHER host,
                # links in it absolutized against THIS url (brink quirk)
                anchors.append(_a(f"/xredir/{other[8:]}/p/{t}", "cross redirect"))
            if i % 53 == 0:
                # allowed-domain gate checks the ORIGINAL url only =>
                # the blocked host's body leaks through the redirect
                anchors.append(
                    _a(f"/xredir/blocked.test/p/{i % n_blocked}", "blocked leak")
                )
                # unresolvable hop host => client.Do fails => drop
                anchors.append(
                    _a(f"/xredir/nowhere.invalid/x/{i}", "redirect unknown host")
                )
            if i % 59 == 0:
                # exactly at the budget boundary: 9 hops = 10 requests, OK
                anchors.append(_a(f"/redir/9/p/{t}", "nine hops"))
            if i % 61 == 0:
                # composed: 2 same-host hops landing on a cross-host hop
                anchors.append(
                    _a(f"/redir/2/xredir/{other[8:]}/p/{t}", "composed redirect")
                )

        extra = "<script>var x = 1 < 2;</script>" if i % 37 == 0 else ""
        lang = "de" if i % 31 == 7 else "en"
        _page(url, _doc(i, f"Page {i}", _text_for(i, texts), anchors, extra), lang, rows)

    # satellite pages (linked above): oversized, non-200, forbidden
    for i in range(_start(23), hi, 23):
        host = HOST_A if i == 0 else _host_of(i)
        filler = "x" * (MAX_CONTENT_LENGTH + 4000)
        _page(f"{host}/big/{i}", _doc(i, f"Big {i}", filler, []), "en", rows)
    for i in range(_start(29), hi, 29):
        host = HOST_A if i == 0 else _host_of(i)
        body = _doc(i, f"Unavailable {i}", "service unavailable", [_a("/p/1", "not followed")])
        _page(f"{host}/status/503/{i}", body, "en", rows)
    for i in range(_start(31), hi, 31):
        host = HOST_A if i == 0 else _host_of(i)
        body = _doc(i, f"Admin {i}", "admin console", [_a("/p/2", "not followed either")])
        _page(f"{host}/admin/{i}", body, "en", rows)
    if with_robots and lo == 0:
        for host, body in ((HOST_A, ROBOTS_A), (HOST_B, ROBOTS_B)):
            _page(f"{host}/robots.txt", body, "en", rows)

    # blocked-host pages: resolvable, never traversed
    for j in range(n_blocked if lo == 0 else 0):
        _page(f"{HOST_BLOCKED}/p/{j}", _doc(j, f"Blocked {j}", "blocked content", []), "en", rows)

    return pa.table(
        {
            "url": pa.array(rows["url"], pa.string()),
            "warc_ts": pa.array(rows["warc_ts"], pa.timestamp("us")),
            "html": pa.array(rows["html"], pa.binary()),
            "text": pa.array(rows["text"], pa.string()),
            "lang": pa.array(rows["lang"], pa.string()),
        }
    )
