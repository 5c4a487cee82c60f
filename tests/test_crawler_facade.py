"""Facade parity: handler registration/dispatch semantics (S7, M9, M10)."""

import pytest

from brinkray.crawler import Crawler
from brinkray.engine.crawl import EngineOptions
from brinkray.fixtures import build_site, site_config
from brinkray.ref.config import CrawlOptions
from brinkray.ref.oracle import crawl_oracle
from brinkray.ref.world import Web


def test_start_requires_handlers(ray_session):
    c = Crawler(site_config())
    c.set_pages(build_site(10))
    with pytest.raises(ValueError, match="no handlers"):
        c.start()


def test_handler_overwrite_is_silent():
    c = Crawler(site_config())
    first, second = (lambda *a: None), (lambda *a: None)
    c.handle_func(200, first)
    c.handle_func(200, second)
    assert c.handlers[200] is second  # brink.go:240-244


def test_handlers_fire_in_fifo_order(ray_session):
    cfg = site_config()
    table = build_site(40)
    web = Web.build(table["url"].to_pylist(), table["html"].to_pylist(), cfg)
    oracle = crawl_oracle(web, cfg)

    c = Crawler(cfg, EngineOptions(seen_shards=2))
    calls = []
    four_oh_fours = []
    c.handle_default_func(lambda lf, u, st, b, ca: calls.append((lf, u, st, b, ca)))
    c.handle_func(404, lambda lf, u, st, b, ca: four_oh_fours.append((lf, u)))
    c.set_pages(table)
    c.start()

    want = [
        (e.linked_from, e.url, e.status, e.body.decode(), e.cached)
        for e in oracle.events
        if e.status != 404
    ]
    assert calls == want
    want_404 = [(e.linked_from, e.url) for e in oracle.events if e.status == 404]
    assert four_oh_fours == want_404


def test_batch_handler_receives_batches(ray_session):
    cfg = site_config()
    c = Crawler(cfg, EngineOptions(seen_shards=2))
    seen_rows = {"n": 0}
    c.handle_batches_func(None, lambda t: seen_rows.__setitem__("n", seen_rows["n"] + t.num_rows))
    c.set_pages(build_site(30))
    result = c.start()
    assert seen_rows["n"] == result.events_table().num_rows


def test_factory_classmethods(ray_session, tmp_path):
    toml = tmp_path / "c.toml"
    toml.write_text(
        'entrypoint = "https://site-a.test"\n'
        'allowed-domains = ["https://site-b.test"]\n'
        'ignore-get-parameters = ["session"]\n'
        'ignore-path-visits = ["admin/"]\n'
        "max-content-length = 8192\n"
    )
    c = Crawler.from_toml(str(toml), EngineOptions(seen_shards=2))
    assert c.cfg.root_domain == "https://site-a.test"
    assert c.cfg.domain_allowed("https://site-b.test")

    # equivalent to site_config(): same crawl outcome
    table = build_site(30)
    web = Web.build(table["url"].to_pylist(), table["html"].to_pylist(), c.cfg)
    oracle = crawl_oracle(web, c.cfg)
    c.handle_default_func(lambda *a: None)
    c.set_pages(table)
    result = c.start()
    assert result.seen == oracle.seen


def test_allow_domains_runtime_addition():
    c = Crawler.new("https://a.test")
    c.allow_domains("https://extra.test")
    assert c.cfg.domain_allowed("https://extra.test")
    # stored verbatim (brink.go:160 StoreKey) — no normalization
    c.allow_domains("https://x.test/path")
    assert c.cfg.domain_allowed("https://x.test/path")
    assert not c.cfg.domain_allowed("https://x.test")
