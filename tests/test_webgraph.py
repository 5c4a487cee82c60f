"""Unit tests for the web-graph operators (anchor-text index, PLD link
graph, recrawl capture consolidation). The SQL-twin equality of the
driver queries is covered by test_driver_contract.py; these pin the
kernel semantics the fixture data cannot reach (multi-label PLDs,
timestamp tie-breaks, gate-order edges)."""

import pandas as pd
import pyarrow as pa
import pytest

from brinkray.textproc.webgraph import (
    _absolutize,
    _anchor_pairs,
    anchor_text_stats,
    consolidate_captures,
    pld_link_graph,
    pld_of_host,
)


def _page(url: str, body: str) -> tuple[str, bytes]:
    return url, f"<html><body>{body}</body></html>".encode()


class TestPldOfHost:
    def test_two_label_identity(self):
        assert pld_of_host("site-a.test") == "site-a.test"

    def test_subdomain_reduces(self):
        assert pld_of_host("www.news.example.com") == "example.com"

    def test_cc_sld_takes_three(self):
        assert pld_of_host("www.bbc.co.uk") == "bbc.co.uk"
        assert pld_of_host("shop.example.com.au") == "example.com.au"

    def test_bare_label(self):
        assert pld_of_host("localhost") == "localhost"


class TestAbsolutize:
    def test_gate_order_matches_extractor(self):
        # javascript/# gates run BEFORE the space trim (urls.go:96-101)
        assert _absolutize("javascript:;", "https://h.test") is None
        assert _absolutize("#top", "https://h.test") is None
        assert _absolutize("  ", "https://h.test") is None
        # '//' wins over '/' => the https://// quirk reproduction
        assert (
            _absolutize("//other.test/p", "https://h.test")
            == "https:////other.test/p"
        )
        assert _absolutize("/p/1", "https://h.test") == "https://h.test/p/1"
        assert _absolutize(" /p/1 ", "https://h.test") == "https://h.test/p/1"
        assert _absolutize("page.html", "https://h.test") == "page.html"


class TestAnchorPairs:
    def test_pairs_and_edge_cases(self):
        url, html = _page(
            "https://h.test/p/0",
            '<a href="/p/1">one</a>'
            '<a href="/p/1" target="_blank">uno</a>'
            "<a>no href</a>"
            '<a href="#top">skip</a>'
            '<a href="javascript:;">skip</a>',
        )
        got = list(_anchor_pairs([url], [html]))
        assert got == [
            ("https://h.test/p/0", "https://h.test/p/1", "one"),
            ("https://h.test/p/0", "https://h.test/p/1", "uno"),
        ]


@pytest.mark.usefixtures("ray_session")
class TestDatasets:
    def test_anchor_text_stats(self):
        import ray.data as rd

        pages = [
            _page("https://a.test/p/0", '<a href="/x">alpha</a><a href="/x">beta</a>'),
            _page("https://a.test/p/1", '<a href="/x">alpha</a><a href="https://b.test/y">other</a>'),
        ]
        t = pa.table(
            {
                "url": pa.array([u for u, _ in pages], pa.string()),
                "html": pa.array([h for _, h in pages], pa.binary()),
            }
        )
        out = (
            anchor_text_stats(rd.from_arrow(t))
            .to_pandas()
            .sort_values("href")
            .reset_index(drop=True)
        )
        x = out[out["href"] == "https://a.test/x"].iloc[0]
        assert int(x["n_refs"]) == 3
        assert int(x["n_anchor_texts"]) == 2
        assert x["first_anchor"] == "alpha"
        y = out[out["href"] == "https://b.test/y"].iloc[0]
        assert (int(y["n_refs"]), int(y["n_anchor_texts"])) == (1, 1)

    def test_pld_link_graph_reduces_subdomains(self):
        import ray.data as rd

        pages = [
            _page(
                "https://www.news.example.com/a",
                '<a href="https://cdn.example.com/x">s</a>'
                '<a href="https://other.test/y">o</a>'
                '<a href="/z">rel</a>',
            ),
        ]
        t = pa.table(
            {
                "url": pa.array([u for u, _ in pages], pa.string()),
                "html": pa.array([h for _, h in pages], pa.binary()),
            }
        )
        out = (
            pld_link_graph(rd.from_arrow(t))
            .to_pandas()
            .sort_values(["src_pld", "dst_pld"])
            .reset_index(drop=True)
        )
        got = {
            (r.src_pld, r.dst_pld): int(r.n_links)
            for r in out.itertuples()
        }
        # self-edge: both the cdn link AND the root-relative /z resolve
        # under example.com
        assert got[("example.com", "example.com")] == 2
        assert got[("example.com", "other.test")] == 1

    def test_consolidate_captures_latest_wins_and_ties(self):
        import ray.data as rd

        ts = pd.Timestamp("2024-01-01").value // 1000  # us
        t = pa.table(
            {
                "url": pa.array(["u", "u", "v", "v"], pa.string()),
                "warc_ts": pa.array(
                    [ts, ts + 5, ts, ts], pa.timestamp("us")
                ),
                "capture": pa.array([0, 1, 0, 1], pa.int64()),
                "text": pa.array(["old", "new", "t0", "t1"], pa.string()),
            }
        )
        out = (
            consolidate_captures(rd.from_arrow(t).repartition(2))
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        assert list(out["url"]) == ["u", "v"]
        assert list(out["text"]) == ["new", "t1"]  # ts wins; tie -> capture
