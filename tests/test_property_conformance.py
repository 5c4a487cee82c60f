"""Property-based conformance: random small link graphs (hypothesis)
must produce oracle-identical crawls — beyond the handcrafted fixture
coverage, this fuzzes href shapes, cross-host edges and quirk links."""

import html as _htmlmod

import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from brinkray.engine.crawl import CrawlEngine, EngineOptions
from brinkray.fixtures.sitegen import HOST_A, HOST_B, site_config
from brinkray.ref.oracle import crawl_oracle
from brinkray.ref.text import extract_text
from brinkray.ref.world import Web

HREF_MAKERS = [
    lambda j, h: f"/p/{j}",
    lambda j, h: f"{h}/p/{j}",
    lambda j, h: f"/p/{j}?b=2&a=1",
    lambda j, h: f"/p/{j}?a=1&b=2",
    lambda j, h: f"/p/{j}?session=s{j}",
    lambda j, h: f" /p/{j} ",
    lambda j, h: f"/missing/{j}",
    lambda j, h: f"/err/{j}",
    lambda j, h: f"//site-b.test/p/{j}",
    lambda j, h: "page.html",
    lambda j, h: "#frag",
    lambda j, h: "javascript:;",
    lambda j, h: "",
    lambda j, h: f"/admin/{j}",
    lambda j, h: f"/status/503/{j}",
]


@st.composite
def site_spec(draw):
    n = draw(st.integers(min_value=3, max_value=18))
    pages = []
    for i in range(n):
        host = HOST_A if i == 0 else draw(st.sampled_from([HOST_A, HOST_B]))
        n_links = draw(st.integers(min_value=0, max_value=6))
        links = [
            (
                draw(st.integers(min_value=0, max_value=n - 1)),
                draw(st.integers(min_value=0, max_value=len(HREF_MAKERS) - 1)),
            )
            for _ in range(n_links)
        ]
        pages.append((host, links))
    return pages


def _build(spec) -> pa.Table:
    rows = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
    for i, (host, links) in enumerate(spec):
        url = HOST_A if i == 0 else f"{host}/p/{i}"
        anchors = "".join(
            f'<a href="{_htmlmod.escape(HREF_MAKERS[m](j, host), quote=True)}">l</a>'
            for j, m in links
        )
        body = f"<html><body><p>page {i}</p>{anchors}</body></html>".encode()
        rows["url"].append(url)
        rows["warc_ts"].append(1_700_000_000_000_000 + i)
        rows["html"].append(body)
        rows["text"].append(extract_text(body))
        rows["lang"].append("en")
    return pa.table(
        {
            "url": pa.array(rows["url"], pa.string()),
            "warc_ts": pa.array(rows["warc_ts"], pa.timestamp("us")),
            "html": pa.array(rows["html"], pa.binary()),
            "text": pa.array(rows["text"], pa.string()),
            "lang": pa.array(rows["lang"], pa.string()),
        }
    )


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,  # the driver's verify run must be deterministic
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(spec=site_spec())
def test_random_sites_match_oracle(ray_session, spec):
    cfg = site_config()
    table = _build(spec)
    web = Web.build(table["url"].to_pylist(), table["html"].to_pylist(), cfg)
    oracle = crawl_oracle(web, cfg)

    eng = CrawlEngine(cfg, EngineOptions(seen_shards=2))
    eng.set_pages(table)
    result = eng.run()
    t = result.events_table()
    got = list(
        zip(
            t["linked_from"].to_pylist(),
            t["url"].to_pylist(),
            t["status"].to_pylist(),
            t["body"].to_pylist(),
            t["cached"].to_pylist(),
        )
    )
    want = [(e.linked_from, e.url, e.status, e.body, e.cached) for e in oracle.events]
    assert got == want
    assert result.seen == oracle.seen
