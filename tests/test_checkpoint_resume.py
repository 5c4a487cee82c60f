"""Resume-equivalence: kill after wave k, resume in a fresh engine,
final state identical to an uninterrupted run (and to the oracle)."""

import os

from brinkray.engine.crawl import CrawlEngine, EngineOptions
from brinkray.fixtures import build_site, site_config
from brinkray.ref.oracle import crawl_oracle
from brinkray.ref.world import Web


def _events(result):
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


def test_kill_and_resume_matches_oracle(ray_session, tmp_path):
    cfg = site_config()
    table = build_site(50)
    web = Web.build(table["url"].to_pylist(), table["html"].to_pylist(), cfg)
    oracle = crawl_oracle(web, cfg)

    ckpt = str(tmp_path / "ckpt")

    # phase 1: crash after 3 waves
    eng1 = CrawlEngine(cfg, EngineOptions(seen_shards=2, checkpoint_dir=ckpt, max_waves=3))
    eng1.set_pages(table)
    partial = eng1.run()
    assert partial.waves == 3
    assert os.path.exists(os.path.join(ckpt, "wave_0002", "_COMPLETE"))
    assert os.path.exists(os.path.join(ckpt, "wave_0002", "lineage.json"))

    # phase 2: fresh engine (fresh actors), resume from checkpoint
    eng2 = CrawlEngine(cfg, EngineOptions(seen_shards=2, checkpoint_dir=ckpt))
    eng2.set_pages(table)
    full = eng2.run(resume=True)

    assert _events(full) == [
        (e.linked_from, e.url, e.status, e.body, e.cached) for e in oracle.events
    ]
    assert full.seen == oracle.seen
    assert os.path.exists(os.path.join(ckpt, "_DONE"))


def test_resume_with_budget_state(ray_session, tmp_path):
    """Politeness token usage must survive the checkpoint too."""
    cfg = site_config()
    table = build_site(45)
    web = Web.build(table["url"].to_pylist(), table["html"].to_pylist(), cfg)
    oracle = crawl_oracle(web, cfg, per_host_budget=12)

    ckpt = str(tmp_path / "ckpt_b")
    eng1 = CrawlEngine(
        cfg,
        EngineOptions(seen_shards=2, per_host_budget=12, checkpoint_dir=ckpt, max_waves=2),
    )
    eng1.set_pages(table)
    eng1.run()

    eng2 = CrawlEngine(
        cfg, EngineOptions(seen_shards=2, per_host_budget=12, checkpoint_dir=ckpt)
    )
    eng2.set_pages(table)
    full = eng2.run(resume=True)
    assert full.seen == oracle.seen


def test_checkpoint_metrics_carry_per_partition_sizes(ray_session, tmp_path):
    """Every completed wave's metrics.json records the per-shard seen
    sizes (the skew signal rebalance_shard acts on), and their sum
    equals the wave's seen_total."""
    import json
    import os

    from brinkray.engine.crawl import CrawlEngine, EngineOptions
    from brinkray.fixtures import build_site, site_config

    ckpt = str(tmp_path / "ckpt_m")
    eng = CrawlEngine(
        site_config(), EngineOptions(seen_shards=3, checkpoint_dir=ckpt)
    )
    eng.set_pages(build_site(40))
    eng.run()

    waves = [n for n in sorted(os.listdir(ckpt)) if n.startswith("wave_")]
    assert waves
    for name in waves:
        with open(os.path.join(ckpt, name, "metrics.json")) as f:
            m = json.load(f)
        sizes = m["seen_shard_sizes"]
        assert len(sizes) == 3
        assert sum(sizes) == m["seen_total"]
