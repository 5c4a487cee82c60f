"""Shared-cookie-jar conformance (closes SURVEY §7.4): one jar actor
serves every fetcher, reproducing the reference's single jar across
all workers (crawler.go:36) and the one-way Authorization drop
(brink.go:173-185) — observable via CrawlEngine.cookie_jar_state()."""

from brinkray.engine.crawl import CrawlEngine, EngineOptions
from brinkray.fixtures import build_site, site_config
from brinkray.ref import AUTH_BASIC, Cookie, CrawlOptions, new_config_with_opts
from brinkray.ref.oracle import crawl_oracle
from brinkray.ref.world import Web
from brinkray.fixtures.sitegen import HOST_A, HOST_B, MAX_CONTENT_LENGTH


def _cookie_cfg(session: bool):
    opts = CrawlOptions(
        allowed_domains=[HOST_B],
        ignore_get_parameters=["session"],
        forbidden_paths=["admin/"],
        max_content_length=MAX_CONTENT_LENGTH,
        auth_type=AUTH_BASIC,
        user="u",
        password="p",
        cookies={"JSESSIONID": Cookie(name="JSESSIONID", value="abc")},
        session_cookie_names=["jsessionid"] if session else [],
    )
    return new_config_with_opts(HOST_A, opts)


def test_cookie_crawl_matches_oracle_and_drops_auth(ray_session):
    """Cookie-enabled strict crawl: events byte-identical to the oracle
    (cookies have no response effect on the sandbox world) AND the ONE
    shared jar shows the permanent auth drop after the crawl."""
    cfg = _cookie_cfg(session=True)
    table = build_site(40)
    web = Web.build(table["url"].to_pylist(), table["html"].to_pylist(), cfg)
    oracle = crawl_oracle(web, cfg)

    eng = CrawlEngine(cfg, EngineOptions(seen_shards=2))
    eng.set_pages(table)
    result = eng.run()
    assert result.seen == oracle.seen
    t = result.events_table()
    got = list(zip(t["url"].to_pylist(), t["status"].to_pylist(), t["body"].to_pylist()))
    want = [(e.url, e.status, e.body) for e in oracle.events]
    assert got == want

    state = eng.cookie_jar_state()
    assert state is not None
    # brink.go:178-183: session cookie => Authorization deleted forever
    assert "Authorization" not in state["headers"]
    assert state["cookies"] == {"JSESSIONID": "abc"}


def test_cookie_crawl_non_session_keeps_auth(ray_session):
    cfg = _cookie_cfg(session=False)
    eng = CrawlEngine(cfg, EngineOptions(seen_shards=2))
    eng.set_pages(build_site(25))
    eng.run()
    state = eng.cookie_jar_state()
    assert state["headers"].get("Authorization", "").startswith("Basic ")
    assert state["cookies"] == {"JSESSIONID": "abc"}


def test_cookie_jar_shared_in_scale_mode(ray_session):
    """The same single jar serves the scale-ordering fetch tasks."""
    cfg = _cookie_cfg(session=True)
    eng = CrawlEngine(cfg, EngineOptions(seen_shards=2, ordering="scale"))
    eng.set_pages(build_site(40))
    eng.run()
    state = eng.cookie_jar_state()
    assert "Authorization" not in state["headers"]
