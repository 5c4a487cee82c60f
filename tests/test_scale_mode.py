"""Scale ordering mode: sort-free reservation dedup must keep the final
seen SET and the fetched-page multiset identical to the oracle."""

import pytest

from brinkray.engine.crawl import CrawlEngine, EngineOptions
from brinkray.fixtures import build_site, site_config
from brinkray.ref.oracle import crawl_oracle
from brinkray.ref.world import Web


def _run(cfg, table, **opt_kw):
    eng = CrawlEngine(cfg, EngineOptions(seen_shards=2, ordering="scale", **opt_kw))
    eng.set_pages(table)
    return eng.run()


def test_scale_mode_set_exact(ray_session):
    cfg = site_config()
    table = build_site(60)
    web = Web.build(table["url"].to_pylist(), table["html"].to_pylist(), cfg)
    oracle = crawl_oracle(web, cfg)
    result = _run(cfg, table)

    assert result.seen == oracle.seen
    t = result.events_table()
    got_fetched = sorted(
        (u, s, b)
        for u, s, b, c in zip(
            t["url"].to_pylist(),
            t["status"].to_pylist(),
            t["body"].to_pylist(),
            t["cached"].to_pylist(),
        )
        if not c
    )
    want_fetched = sorted(
        (e.url, e.status, e.body) for e in oracle.events if not e.cached
    )
    assert got_fetched == want_fetched


def test_scale_mode_text_byte_identical(ray_session):
    cfg = site_config()
    table = build_site(45)
    result = _run(cfg, table)
    expected = dict(zip(table["url"].to_pylist(), table["text"].to_pylist()))
    t = result.events_table()
    checked = 0
    for url, text, cached in zip(
        t["url"].to_pylist(), t["text"].to_pylist(), t["cached"].to_pylist()
    ):
        if not cached and url in expected:
            assert text == expected[url], url
            checked += 1
    assert checked > 30


def test_scale_mode_with_small_batches_forces_pendings(ray_session):
    """Tiny fetch batches maximize cross-batch duplicate races — the
    reservation protocol must still converge to the exact seen set."""
    cfg = site_config()
    table = build_site(45)
    web = Web.build(table["url"].to_pylist(), table["html"].to_pylist(), cfg)
    oracle = crawl_oracle(web, cfg)
    result = _run(cfg, table, fetch_batch_size=16)
    assert result.seen == oracle.seen


def test_per_wave_limit_bounds_breadth(ray_session):
    """SURVEY §2.6: per-wave frontier cap keeps the FIFO-first k rows;
    the crawl still terminates and sees strictly fewer URLs."""
    cfg = site_config()
    table = build_site(60)
    full = _run(cfg, table)
    capped_eng = CrawlEngine(
        cfg, EngineOptions(seen_shards=2, ordering="scale", per_wave_limit=10)
    )
    capped_eng.set_pages(table)
    capped = capped_eng.run()
    assert 0 < capped.seen_count() < full.seen_count()
    # the seed wave is within every cap: the root must always be seen
    assert any(u.endswith("site-a.test") for u in capped.seen)


def test_scale_mode_rejects_wave_limit(ray_session):
    """Wave-rate deferral needs frontier-exact ordering; budgets don't."""
    cfg = site_config()
    eng = CrawlEngine(
        cfg, EngineOptions(seen_shards=2, ordering="scale", per_host_wave_limit=5)
    )
    eng.set_pages(build_site(10))
    with pytest.raises(ValueError, match="per_host_wave_limit"):
        eng.run()


def test_scale_mode_budget_matches_oracle(ray_session):
    """Budget-only politeness in scale mode: tokens are taken inside
    the fetch stage (reservation-style). WHICH urls land inside a
    binding budget is admission-order approximate (batches race for
    tokens), but the per-host token ACCOUNTING — how many fetches each
    host got — must equal the oracle's; a non-binding budget must
    reproduce the oracle's exact seen set."""
    from brinkray.state.politeness import PolitenessClient

    cfg = site_config()
    table = build_site(45)
    web = Web.build(table["url"].to_pylist(), table["html"].to_pylist(), cfg)

    # binding budget: WHICH pages are dropped races across batches, and
    # a dropped page's subtree goes undiscovered — so membership AND
    # per-host counts are run-dependent. The race-free invariant is the
    # token bucket itself: both hosts have far more reachable attempts
    # than 12 under every drop choice, so usage must be EXACTLY 12.
    eng = CrawlEngine(
        cfg, EngineOptions(seen_shards=2, ordering="scale", per_host_budget=12)
    )
    eng.set_pages(table)
    result = eng.run()
    usage = PolitenessClient(
        eng.opts.politeness_shards, actors=eng.politeness_actors
    ).usage()
    assert usage["https://site-a.test"] == 12
    assert usage["https://site-b.test"] == 12
    assert 0 < result.seen_count() <= 24

    # non-binding budget: must reproduce the oracle's exact seen set
    oracle_big = crawl_oracle(web, cfg, per_host_budget=1000)
    eng2 = CrawlEngine(
        cfg, EngineOptions(seen_shards=2, ordering="scale", per_host_budget=1000)
    )
    eng2.set_pages(table)
    assert eng2.run().seen == oracle_big.seen


def test_scale_mode_robots(ray_session):
    cfg = site_config()
    table = build_site(45, with_robots=True)
    from brinkray.engine.robots import RobotsPolicy

    urls = table["url"].to_pylist()
    policy = RobotsPolicy.from_pages(
        {
            h: table["html"][urls.index(f"{h}/robots.txt")].as_py().decode()
            for h in ("https://site-a.test", "https://site-b.test")
        }
    )
    web = Web.build(urls, table["html"].to_pylist(), cfg)
    oracle = crawl_oracle(web, cfg, robots=policy)
    result = _run(cfg, table, robots_enabled=True)
    assert result.seen == oracle.seen


def test_pipelined_waves_set_exact(ray_session):
    """Cross-wave pipelining (steps>1, one streaming execution for
    several BFS waves) must preserve the scale-mode invariants: the
    exact oracle seen set and fetched-page multiset. Forced on from
    wave 0 via pipeline_min_frontier=1."""
    cfg = site_config()
    table = build_site(60)
    web = Web.build(table["url"].to_pylist(), table["html"].to_pylist(), cfg)
    oracle = crawl_oracle(web, cfg)
    for nsteps in (2, 3):
        result = _run(cfg, table, pipeline_waves=nsteps, pipeline_min_frontier=1)
        assert result.seen == oracle.seen, f"steps={nsteps}"
        # the loop actually pipelined (an execution spanned >1 wave)
        assert any(m.get("steps", 1) > 1 for m in result.metrics)
        t = result.events_table()
        got_fetched = sorted(
            (u, s, b)
            for u, s, b, c in zip(
                t["url"].to_pylist(),
                t["status"].to_pylist(),
                t["body"].to_pylist(),
                t["cached"].to_pylist(),
            )
            if not c
        )
        want_fetched = sorted(
            (e.url, e.status, e.body) for e in oracle.events if not e.cached
        )
        assert got_fetched == want_fetched, f"steps={nsteps}"


def test_pipelined_waves_with_pending_races(ray_session):
    """Pipelining + tiny fetch batches: wave-k pendings are requeued
    INSIDE the same execution (the inner wave re-reserves while the
    owner batch may still be in flight) — the generation-tagged
    reservation protocol must still converge to the exact seen set."""
    cfg = site_config()
    table = build_site(45)
    web = Web.build(table["url"].to_pylist(), table["html"].to_pylist(), cfg)
    oracle = crawl_oracle(web, cfg)
    result = _run(
        cfg,
        table,
        fetch_batch_size=16,
        pipeline_waves=3,
        pipeline_min_frontier=1,
    )
    assert result.seen == oracle.seen
