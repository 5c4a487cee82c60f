"""Skew-aware shard rebalancing: a hot seen-set shard moves wholesale
to a fresh actor (at scale: onto another node via scheduling options)
without losing state or changing key routing."""


def test_rebalance_shard_preserves_state(ray_session):
    from brinkray.state.seen import ShardedSeenSet

    s = ShardedSeenSet(4)
    canons = [f"https://h{i % 7}.test/p/{i}" for i in range(500)]
    s.mark(canons, [200] * 500)
    before = s.check(canons)
    sizes = s.shard_sizes()
    assert sum(sizes) == len(set(canons))

    hot = sizes.index(max(sizes))
    old_actor = s.actors[hot]
    s.rebalance_shard(hot)
    assert s.actors[hot] is not old_actor
    # routing unchanged (hash % nshards), state fully carried over
    assert s.check(canons) == before
    assert s.shard_sizes() == sizes


def test_rebalance_between_checkpointed_waves(ray_session, tmp_path):
    """Rebalance a shard at a wave boundary, then resume: the crawl
    outcome must equal the oracle exactly (the engine reads the live
    actor list each run, so the moved shard just works)."""
    from brinkray.engine.crawl import CrawlEngine, EngineOptions
    from brinkray.fixtures import build_site, site_config
    from brinkray.ref.oracle import crawl_oracle
    from brinkray.ref.world import Web

    cfg = site_config()
    table = build_site(40)
    web = Web.build(table["url"].to_pylist(), table["html"].to_pylist(), cfg)
    oracle = crawl_oracle(web, cfg)

    ckpt = str(tmp_path / "ckpt")
    eng = CrawlEngine(
        cfg, EngineOptions(seen_shards=2, checkpoint_dir=ckpt, max_waves=2)
    )
    eng.set_pages(table)
    eng.run()
    eng.seen.rebalance_shard(0)  # move a shard between waves
    eng.opts.max_waves = None
    result = eng.run(resume=True)
    got = list(
        zip(
            result.events_table()["url"].to_pylist(),
            result.events_table()["status"].to_pylist(),
            result.events_table()["cached"].to_pylist(),
        )
    )
    want = [(e.url, e.status, e.cached) for e in oracle.events]
    assert got == want
    assert result.seen == oracle.seen
