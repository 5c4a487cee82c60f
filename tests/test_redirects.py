"""Redirect-following conformance (ref/redirects.py).

The reference fetches with Go's default http.Client (factory.go:42),
which follows redirects silently inside client.Do and errors the whole
fetch after 10 requests ("stopped after 10 redirects").  brink records
the ORIGINAL url with the FINAL status, absolutizes the final body's
links against the ORIGINAL url (brink.go:116), and domain-gates only
the ORIGINAL url (brink.go:205-215).  These tests pin the chain
resolver, the world-model fetch, and the distributed engine (strict
FIFO byte-identity + scale-mode set identity) on a redirect-bearing
fixture site.
"""

import pytest

from brinkray.engine.crawl import CrawlEngine, EngineOptions
from brinkray.fixtures import build_site, site_config
from brinkray.ref.errors import TransportError
from brinkray.ref.oracle import crawl_oracle
from brinkray.ref.redirects import MAX_REQUESTS, is_redirect_path, resolve_chain
from brinkray.ref.world import Web, fetch

KNOWN = {"https://site-a.test", "https://site-b.test", "https://blocked.test"}


# ---------------------------------------------------------------- resolver


def test_plain_path_passes_through():
    assert resolve_chain("https", "site-a.test", "/p/5", KNOWN) == (
        "https",
        "site-a.test",
        "/p/5",
    )


def test_same_host_chain_unwinds():
    assert resolve_chain("https", "site-a.test", "/redir/3/p/5", KNOWN) == (
        "https",
        "site-a.test",
        "/p/5",
    )


def test_nine_hops_is_exactly_the_budget():
    # initial request + 9 redirects = 10 requests: Go allows it
    assert resolve_chain("https", "site-a.test", "/redir/9/p/1", KNOWN)[2] == "/p/1"


def test_ten_hops_exceeds_the_budget():
    with pytest.raises(TransportError, match="stopped after 10 redirects"):
        resolve_chain("https", "site-a.test", "/redir/10/p/1", KNOWN)


def test_cross_host_hop_switches_host():
    assert resolve_chain(
        "https", "site-a.test", "/xredir/site-b.test/p/7", KNOWN
    ) == ("https", "site-b.test", "/p/7")


def test_cross_host_hop_to_unknown_host_fails():
    with pytest.raises(TransportError, match="no such host"):
        resolve_chain("https", "site-a.test", "/xredir/nowhere.invalid/p/1", KNOWN)


def test_composed_chain_keeps_counting():
    # 8 same-host hops + 1 cross-host hop = 9 redirects: allowed...
    assert resolve_chain(
        "https", "site-a.test", "/redir/8/xredir/site-b.test/p/2", KNOWN
    ) == ("https", "site-b.test", "/p/2")
    # ...but 9 + 1 = 10 redirects is one too many
    with pytest.raises(TransportError, match="stopped after 10 redirects"):
        resolve_chain(
            "https", "site-a.test", "/redir/9/xredir/site-b.test/p/2", KNOWN
        )


def test_is_redirect_path():
    assert is_redirect_path("/redir/3/p/1")
    assert is_redirect_path("/xredir/site-b.test/p/1")
    assert not is_redirect_path("/p/redir/1")
    assert MAX_REQUESTS == 10


# ---------------------------------------------------------------- world


@pytest.fixture(scope="module")
def redirect_world():
    cfg = site_config()
    table = build_site(80, with_redirects=True)
    web = Web.build(table["url"].to_pylist(), table["html"].to_pylist(), cfg)
    return cfg, table, web


def test_world_fetch_serves_final_body(redirect_world):
    cfg, table, web = redirect_world
    direct = fetch(web.index, web.known_hosts, "https://site-a.test/p/3", cfg)
    via = fetch(web.index, web.known_hosts, "https://site-a.test/redir/2/p/3", cfg)
    assert direct == via
    assert direct[0] == 200


def test_world_fetch_query_survives_chain(redirect_world):
    """The Location echo keeps the query string: the lookup key is the
    final url WITH the original canon's normalized query suffix."""
    cfg, table, web = redirect_world
    index = dict(web.index)
    index["https://site-a.test/p/3?a=1&b=2"] = (200, b"<html>query page</html>")
    status, body = fetch(
        index, web.known_hosts, "https://site-a.test/redir/2/p/3?a=1&b=2", cfg
    )
    assert (status, body) == (200, b"<html>query page</html>")
    # without the query-variant entry the suffixed lookup is a miss
    status2, body2 = fetch(
        web.index, web.known_hosts, "https://site-a.test/redir/2/p/3?a=1&b=2", cfg
    )
    assert (status2, body2) == (404, b"")


def test_world_fetch_deep_chain_is_transport_error(redirect_world):
    cfg, table, web = redirect_world
    with pytest.raises(TransportError):
        fetch(web.index, web.known_hosts, "https://site-a.test/redir/12/p/1", cfg)


def test_world_fetch_err_landing_fails(redirect_world):
    cfg, table, web = redirect_world
    with pytest.raises(TransportError):
        fetch(web.index, web.known_hosts, "https://site-a.test/redir/2/err/1", cfg)


def test_world_fetch_blocked_leak(redirect_world):
    """An allowed url redirecting to the disallowed host serves the
    blocked body: the domain gate sees only the ORIGINAL url."""
    cfg, table, web = redirect_world
    status, body = fetch(
        web.index, web.known_hosts, "https://site-a.test/xredir/blocked.test/p/0", cfg
    )
    assert status == 200
    assert b"blocked content" in body


def test_world_fetch_redirect_to_missing_is_404(redirect_world):
    cfg, table, web = redirect_world
    status, body = fetch(
        web.index, web.known_hosts, "https://site-a.test/redir/1/missing/xyz", cfg
    )
    assert status == 404 and body == b""


# ---------------------------------------------------------------- oracle


@pytest.fixture(scope="module")
def redirect_oracle(redirect_world):
    cfg, table, web = redirect_world
    return crawl_oracle(web, cfg)


def test_oracle_reaches_redirect_urls(redirect_oracle):
    res = redirect_oracle
    chains = [u for u in res.seen if "/redir/2/p/" in u]
    assert chains, "no 2-hop chain in seen set"
    deep = [u for u in res.seen if "/redir/12/" in u]
    assert deep == [], "over-budget chain must be silently dropped"
    nine = [u for u in res.seen if "/redir/9/p/" in u]
    assert nine, "9-hop chain (exactly at budget) must succeed"


def test_oracle_blocked_leak_in_seen(redirect_oracle):
    res = redirect_oracle
    leaks = [u for u in res.seen if "/xredir/blocked.test/" in u]
    assert leaks
    for u in leaks:
        assert res.seen[u] == 200


def test_oracle_seen_keys_are_original_urls(redirect_oracle):
    """brink marks the ORIGINAL requested url (brink.go:104): the chain
    urls stay in the seen set under their redirect path, and the final
    landing page is a SEPARATE seen entry only if discovered directly."""
    res = redirect_oracle
    assert any("/xredir/" in u for u in res.seen)
    assert not any("nowhere.invalid" in u for u in res.seen)


def test_oracle_cross_host_links_absolutized_against_original(redirect_oracle):
    """The final body's relative links resolve against the ORIGINAL url
    (brink.go:116): a cross-redirect to host B serving links like /p/k
    yields site-A urls linked_from the redirect url."""
    res = redirect_oracle
    # relative links in site-B bodies served through a site-A xredir
    # must come out as site-A urls (absolute hrefs stay absolute)
    rel_on_orig = [
        e
        for e in res.events
        if "https://site-a.test/xredir/site-b.test/" in e.linked_from
        and e.url.startswith("https://site-a.test/p/")
    ]
    assert rel_on_orig, "no relative link resolved against the original host"


# ---------------------------------------------------------------- engine


def test_engine_strict_matches_oracle(ray_session, redirect_world, redirect_oracle):
    cfg, table, web = redirect_world
    eng = CrawlEngine(cfg, EngineOptions(seen_shards=2, fetch_concurrency=2))
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
    want = [
        (e.linked_from, e.url, e.status, e.body, e.cached)
        for e in redirect_oracle.events
    ]
    assert got == want
    assert result.seen == redirect_oracle.seen


def test_engine_scale_matches_oracle_sets(ray_session, redirect_world, redirect_oracle):
    cfg, table, web = redirect_world
    eng = CrawlEngine(
        cfg, EngineOptions(seen_shards=2, ordering="scale", fetch_concurrency=2)
    )
    eng.set_pages(table)
    result = eng.run()
    assert result.seen == redirect_oracle.seen
