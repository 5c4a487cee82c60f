"""Web-graph / web-corpus operators over Common-Crawl-shaped pages
tables ``(url, warc_ts, html, text, lang)`` — the anchor-text index,
the pay-level-domain (PLD) link graph, and recrawl capture
consolidation.

These are the corpus-construction steps downstream of the crawl loop
itself (reference scope: the crawler in /root/reference/brink.go stops
at per-page link extraction — urls.go:31-109; everything here is the
north-rule training-data extension built on the same parse semantics).

Scale shapes
------------
* Anchor extraction is a stateless ``map_batches`` over zero-copy
  Arrow pages; regexes compile once per actor/task closure, never per
  batch.
* Every aggregation pre-combines inside the batch before the exchange
  (one row per (key, block)); the only all-to-all moves the combined
  partials, not the pair stream. At 10^10-URL scale the href keys are
  corpus-cardinality — swap the final ``groupby`` for
  ``relagg.bucketed_group_sums`` keyed on a 64-bit href hash with a
  canonical-string column, same combiner bodies.
* Capture consolidation (keep-latest per url) rides
  ``windows.latest_per_key``: at most one candidate row per (url,
  block) enters the exchange.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa

# one <a ...>text</a> element: tag gate matches the crawl extractor's
# RE2 twin (<a> or <a[ \t\n]...>), anchor text is the entity-escaped
# run up to the closing tag (the fixture escapes all label text, so
# [^<]* is exact). Kept RE2-compatible so the DuckDB oracle can run
# the SAME pattern.
ANCHOR_ELEM_RE = re.compile(r"<a(?:>|[ \t\n][^>]*>)[^<]*</a>")
HREF_RE = re.compile(r'href="([^"]*)"')
TEXT_RE = re.compile(r">([^<]*)</a>$")
HOST_RE = re.compile(r"^(https?://[^/]+)")


def _absolutize(href: str, hostpfx: str) -> str | None:
    """The reference absolutizer's gate order (urls.go:96-101 then
    47-67, as already oracle-pinned by crawl_extract_links): the
    javascript:;/#anchor checks run BEFORE the ASCII-space trim, the
    empty drop after; '//' wins over '/' (the https://// quirk)."""
    if href == "javascript:;" or href.startswith("#"):
        return None
    href = href.strip(" ")
    if not href:
        return None
    if href.startswith("//"):
        return "https://" + href
    if href.startswith("/"):
        return hostpfx + href
    return href


def _anchor_pairs(urls: list[str], htmls: list[bytes]):
    """Yield (page_url, abs_href, anchor_text) per <a> element."""
    for url, html in zip(urls, htmls):
        m = HOST_RE.match(url)
        hostpfx = m.group(1) if m else ""
        for elem in ANCHOR_ELEM_RE.findall(html.decode("utf-8", "replace")):
            hm = HREF_RE.search(elem)
            href = _absolutize(hm.group(1) if hm else "", hostpfx)
            if href is None:
                continue
            tm = TEXT_RE.search(elem)
            yield url, href, tm.group(1) if tm else ""


def anchor_text_stats(pages_ds):
    """Anchor-text index: for every link TARGET href across the corpus,
    how many references point at it, how many DISTINCT anchor texts
    describe it, and the lexicographically first anchor (the
    deterministic representative). The classic web-corpus signal for
    target-page titling / query-independent relevance.

    Two-level exact distinct: each batch first reduces its pair stream
    to distinct (href, anchor) rows with a local multiplicity count, so
    the exchange carries distinct pairs (not references); ONE
    groupby(href) then folds counts, distinct-anchor cardinality and
    the min anchor in a vectorized map_groups body.
    """

    def pairs(t: pa.Table) -> pa.Table:
        rows = list(
            _anchor_pairs(t["url"].to_pylist(), t["html"].to_pylist())
        )
        df = pd.DataFrame(rows, columns=["page", "href", "anchor"])
        part = (
            df.groupby(["href", "anchor"], sort=False)
            .size()
            .reset_index(name="n")
        )
        # explicit schema: an empty object-dtype frame would otherwise
        # convert to null-typed arrow columns and break block unification
        return pa.table(
            {
                "href": pa.array(part["href"], pa.string()),
                "anchor": pa.array(part["anchor"], pa.string()),
                "n": pa.array(part["n"], pa.int64()),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        per_anchor = g.groupby("anchor", sort=True)["n"].sum()
        return pd.DataFrame(
            {
                "href": [g["href"].iloc[0]],
                "n_refs": [int(per_anchor.sum())],
                "n_anchor_texts": [len(per_anchor)],
                "first_anchor": [per_anchor.index[0]],
            }
        )

    return (
        pages_ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("href")
        .map_groups(fold, batch_format="pandas")
    )


def pld_of_host(host: str) -> str:
    """Pay-level-domain heuristic: the registrable suffix is the last
    TWO dot labels, except known two-label public suffixes (co.uk
    style) where it is three. A real deployment ships the full public
    suffix list as a broadcast frozenset — same lookup shape."""
    parts = host.split(".")
    if len(parts) <= 2:
        return host
    two = ".".join(parts[-2:])
    take = 3 if two in _TWO_LABEL_SUFFIXES else 2
    return ".".join(parts[-take:])


_TWO_LABEL_SUFFIXES = frozenset(
    {"co.uk", "org.uk", "ac.uk", "com.au", "co.jp", "com.br", "co.in"}
)


def pld_link_graph(pages_ds):
    """The PLD-level link graph: every in-page link becomes a
    (src_pld, dst_pld) edge; output exact edge weights. This is the
    Common-Crawl host/PLD-graph aggregation — the grouping that turns
    10^10 page-level edges into the ~10^7-node domain graph every
    ranking/seeding pipeline consumes.

    Per-batch combine: one (src_pld, dst_pld, partial n) row per edge
    per block enters the single exchange.
    """

    def edges(t: pa.Table) -> pa.Table:
        rows = []
        for page, href, _ in _anchor_pairs(
            t["url"].to_pylist(), t["html"].to_pylist()
        ):
            dm = HOST_RE.match(href)
            if dm is None:
                continue
            rows.append(
                (
                    pld_of_host(HOST_RE.match(page).group(1).split("://", 1)[1]),
                    pld_of_host(dm.group(1).split("://", 1)[1]),
                )
            )
        df = pd.DataFrame(rows, columns=["src_pld", "dst_pld"])
        part = (
            df.groupby(["src_pld", "dst_pld"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.table(
            {
                "src_pld": pa.array(part["src_pld"], pa.string()),
                "dst_pld": pa.array(part["dst_pld"], pa.string()),
                "n": pa.array(part["n"], pa.int64()),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.iloc[:1][["src_pld", "dst_pld"]].copy()
        out["n_links"] = int(g["n"].sum())
        return out

    return (
        pages_ds.map_batches(edges, batch_format="pyarrow")
        .groupby(["src_pld", "dst_pld"])
        .map_groups(fold, batch_format="pandas")
    )


def consolidate_captures(captures_ds, ts_col: str = "warc_ts",
                         seq_col: str = "capture"):
    """Recrawl consolidation: keep each url's LATEST capture by
    (warc_ts, capture-sequence) — the WARC-dedup step that turns a
    multi-snapshot crawl archive into the one-row-per-url corpus.
    Ties on timestamp break by the capture sequence number, so the
    result is deterministic whatever the block order. Exchange-bounded
    by ``latest_per_key``'s per-(url, block) candidate reduction."""
    from .windows import latest_per_key

    return latest_per_key(
        captures_ds,
        key="url",
        order_cols=[ts_col, seq_col],
        payload_cols=["text"],
    )
