"""Oracle sanity: the single-process literal worker loop over the
fixture site must exhibit every cited reference behavior."""

import pytest

from brinkray.fixtures import build_site, site_config
from brinkray.ref.oracle import crawl_oracle
from brinkray.ref.world import Web


@pytest.fixture(scope="module")
def site():
    cfg = site_config()
    table = build_site(60)
    web = Web.build(table["url"].to_pylist(), table["html"].to_pylist(), cfg)
    res = crawl_oracle(web, cfg)
    return cfg, table, web, res


def test_root_is_first_event(site):
    cfg, table, web, res = site
    assert res.events[0].linked_from == "start"
    assert res.events[0].url == "https://site-a.test"
    assert res.events[0].status == 200
    assert res.events[0].cached is False


def test_core_pages_all_reached(site):
    cfg, table, web, res = site
    for i in range(1, 60):
        host = "https://site-b.test" if i % 3 == 2 else "https://site-a.test"
        assert f"{host}/p/{i}" in res.seen, f"core page {i} unreached"


def test_drops_never_marked_visited(site):
    """NotAllowed / TooLarge / transport-error URLs are never in the
    seen set (brink.go:95-101)."""
    cfg, table, web, res = site
    for canon in res.seen:
        assert not canon.startswith("https://blocked.test"), canon
        assert not canon.startswith("https://nowhere.invalid"), canon
        assert "/err/" not in canon, canon
        assert "/big/" not in canon, canon
        assert "https:////" not in canon, canon


def test_non200_handled_but_not_expanded(site):
    cfg, table, web, res = site
    # 503 pages are in the seen set with their status...
    status_pages = [u for u in res.seen if "/status/503/" in u]
    assert status_pages
    for u in status_pages:
        assert res.seen[u] == 503
    # ...but their outbound link target /p/1 was reached only via the tree,
    # never via a 503 page: the 503 body link says "not followed"
    ev_from_503 = [e for e in res.events if "/status/503/" in e.linked_from]
    assert ev_from_503 == []


def test_forbidden_path_handled_but_not_expanded(site):
    cfg, table, web, res = site
    admin_pages = [u for u in res.seen if "/admin/" in u]
    assert admin_pages
    for u in admin_pages:
        assert res.seen[u] == 200
    ev_from_admin = [e for e in res.events if "/admin/" in e.linked_from]
    assert ev_from_admin == []


def test_dangling_links_are_404(site):
    cfg, table, web, res = site
    missing = [u for u in res.seen if "/missing/" in u]
    assert missing
    for u in missing:
        assert res.seen[u] == 404


def test_ignored_param_collapses(site):
    """?session=... variants collapse onto the plain canon: no seen key
    contains a session param."""
    cfg, table, web, res = site
    assert not any("session=" in u for u in res.seen)


def test_param_order_variants_collapse_to_sorted(site):
    cfg, table, web, res = site
    qs = [u for u in res.seen if "a=1&b=2" in u]
    assert qs  # sorted rendering present
    assert not any("b=2&a=1" in u for u in res.seen)


def test_cached_replays_emitted(site):
    cfg, table, web, res = site
    cached = [e for e in res.events if e.cached]
    assert cached
    for e in cached:
        assert e.body == b""
        assert res.seen[e.url] == e.status


def test_valueless_param_kept(site):
    cfg, table, web, res = site
    assert any(u.endswith("?flag") for u in res.seen)


def test_error_urls_refetched_every_time(site):
    """/err/ URLs are fetch attempts on every rediscovery (no memo)."""
    cfg, table, web, res = site
    # events never include them, but attempts exceed |seen ∪ cached|
    handled = len(res.events)
    assert res.fetch_attempts > len(res.seen)
    assert handled == sum(1 for e in res.events)


def test_budget_caps_per_host(site):
    cfg, table, web, _ = site
    res_b = crawl_oracle(web, cfg, per_host_budget=10)
    from brinkray.ref.urls import scheme_and_host

    per_host = {}
    for u in res_b.seen:
        s, h = scheme_and_host(u)
        per_host[f"{s}://{h}"] = per_host.get(f"{s}://{h}", 0) + 1
    assert all(v <= 10 for v in per_host.values())
    assert res_b.budget_drops > 0


def test_text_column_matches_extractor(site):
    from brinkray.ref.text import extract_text

    cfg, table, web, res = site
    urls = table["url"].to_pylist()
    htmls = table["html"].to_pylist()
    texts = table["text"].to_pylist()
    for u, h, t in zip(urls, htmls, texts):
        assert extract_text(h) == t


def test_determinism():
    cfg = site_config()
    t1 = build_site(40)
    t2 = build_site(40)
    assert t1.equals(t2)
    web = Web.build(t1["url"].to_pylist(), t1["html"].to_pylist(), cfg)
    r1 = crawl_oracle(web, cfg)
    r2 = crawl_oracle(web, cfg)
    assert [e.key() for e in r1.events] == [e.key() for e in r2.events]
    assert r1.seen == r2.seen


def test_fast_extractor_equivalent_on_fixture():
    cfg = site_config()
    t = build_site(80)
    web = Web.build(t["url"].to_pylist(), t["html"].to_pylist(), cfg)
    r_exact = crawl_oracle(web, cfg, fast_extract=False)
    r_fast = crawl_oracle(web, cfg, fast_extract=True)
    assert [e.key() for e in r_exact.events] == [e.key() for e in r_fast.events]
    assert r_exact.seen == r_fast.seen
