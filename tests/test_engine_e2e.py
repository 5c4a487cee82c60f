"""End-to-end conformance: the distributed BFS-wave engine must produce
the exact handler-event sequence, seen set and byte-identical text of
the single-process oracle (the literal reference worker loop)."""

import pytest

from brinkray.engine.crawl import CrawlEngine, EngineOptions
from brinkray.fixtures import build_site, site_config
from brinkray.ref.oracle import crawl_oracle
from brinkray.ref.world import Web


def _oracle_for(table, cfg, **kw):
    web = Web.build(table["url"].to_pylist(), table["html"].to_pylist(), cfg)
    return crawl_oracle(web, cfg, **kw)


def _engine_events(result):
    t = result.events_table()
    return list(
        zip(
            t["linked_from"].to_pylist(),
            t["url"].to_pylist(),
            t["status"].to_pylist(),
            t["body"].to_pylist(),
            t["cached"].to_pylist(),
        )
    )


def _oracle_events(res):
    return [(e.linked_from, e.url, e.status, e.body, e.cached) for e in res.events]


@pytest.fixture(scope="module")
def engine_run(ray_session):
    cfg = site_config()
    table = build_site(60)
    oracle = _oracle_for(table, cfg)
    eng = CrawlEngine(cfg, EngineOptions(seen_shards=2, fetch_concurrency=2))
    eng.set_pages(table)
    result = eng.run()
    return cfg, table, oracle, result


def test_event_sequence_matches_oracle(engine_run):
    cfg, table, oracle, result = engine_run
    got = _engine_events(result)
    want = _oracle_events(oracle)
    assert len(got) == len(want)
    assert got == want


def test_seen_set_matches_oracle(engine_run):
    cfg, table, oracle, result = engine_run
    assert result.seen == oracle.seen


def test_extracted_text_byte_identical(engine_run):
    """Fetched pages' extracted text must equal the pages table's text
    column byte-for-byte (BASELINE.json per-row invariant)."""
    cfg, table, oracle, result = engine_run
    expected = dict(zip(table["url"].to_pylist(), table["text"].to_pylist()))
    t = result.events_table()
    checked = 0
    for url, text, cached in zip(
        t["url"].to_pylist(), t["text"].to_pylist(), t["cached"].to_pylist()
    ):
        if cached:
            continue
        if url in expected:  # miss-404s have no table row
            assert text == expected[url], url
            checked += 1
    assert checked > 40


def test_budget_matches_oracle(ray_session):
    cfg = site_config()
    table = build_site(45)
    oracle = _oracle_for(table, cfg, per_host_budget=12)
    eng = CrawlEngine(
        cfg, EngineOptions(seen_shards=2, per_host_budget=12, politeness_shards=2)
    )
    eng.set_pages(table)
    result = eng.run()
    assert _engine_events(result) == _oracle_events(oracle)
    assert result.seen == oracle.seen


def test_wave_limit_preserves_seen_set(ray_session):
    """Deferral shifts ordering but must keep the final seen SET."""
    cfg = site_config()
    table = build_site(45)
    oracle = _oracle_for(table, cfg)
    eng = CrawlEngine(cfg, EngineOptions(seen_shards=2, per_host_wave_limit=7))
    eng.set_pages(table)
    result = eng.run()
    assert result.seen == oracle.seen
    # every page fetched exactly once, same status+body; ordering and
    # the cached-replay multiset legitimately shift under deferral
    # (a duplicate of a deferred winner drops instead of replaying)
    got_fetched = sorted(
        (u, s, b) for (_, u, s, b, cached) in _engine_events(result) if not cached
    )
    want_fetched = sorted(
        (e.url, e.status, e.body) for e in oracle.events if not e.cached
    )
    assert got_fetched == want_fetched


def test_actor_pool_fetch_mode_matches_oracle(ray_session):
    cfg = site_config()
    table = build_site(40)
    oracle = _oracle_for(table, cfg)
    eng = CrawlEngine(cfg, EngineOptions(seen_shards=2, fetch_mode="actors"))
    eng.set_pages(table)
    result = eng.run()
    assert _engine_events(result) == _oracle_events(oracle)
    assert result.seen == oracle.seen


def test_fuzzy_config_matches_oracle(ray_session):
    cfg = site_config(fuzzy=True)
    table = build_site(40)
    oracle = _oracle_for(table, cfg)
    eng = CrawlEngine(cfg, EngineOptions(seen_shards=2))
    eng.set_pages(table)
    result = eng.run()
    assert _engine_events(result) == _oracle_events(oracle)
    assert result.seen == oracle.seen
