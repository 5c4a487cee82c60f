"""Checkpoint/resume in scale ordering mode."""

import os

from brinkray.engine.crawl import CrawlEngine, EngineOptions
from brinkray.fixtures import build_site, site_config
from brinkray.ref.oracle import crawl_oracle
from brinkray.ref.world import Web


def test_scale_mode_kill_and_resume(ray_session, tmp_path):
    cfg = site_config()
    table = build_site(50)
    web = Web.build(table["url"].to_pylist(), table["html"].to_pylist(), cfg)
    oracle = crawl_oracle(web, cfg)

    ckpt = str(tmp_path / "ckpt_scale")
    eng1 = CrawlEngine(
        cfg,
        EngineOptions(
            seen_shards=2, ordering="scale", checkpoint_dir=ckpt, max_waves=3
        ),
    )
    eng1.set_pages(table)
    eng1.run()
    assert os.path.exists(os.path.join(ckpt, "wave_0002", "_COMPLETE"))

    eng2 = CrawlEngine(
        cfg, EngineOptions(seen_shards=2, ordering="scale", checkpoint_dir=ckpt)
    )
    eng2.set_pages(table)
    full = eng2.run(resume=True)
    assert full.seen == oracle.seen
    t = full.events_table()
    got_fetched = sorted(
        (u, s)
        for u, s, c in zip(
            t["url"].to_pylist(), t["status"].to_pylist(), t["cached"].to_pylist()
        )
        if not c
    )
    want_fetched = sorted((e.url, e.status) for e in oracle.events if not e.cached)
    assert got_fetched == want_fetched
