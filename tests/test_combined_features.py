"""All north-rule features enabled at once (robots + budget + fuzzy +
checkpointing) must still diff exactly against the oracle."""

from brinkray.engine.crawl import CrawlEngine, EngineOptions
from brinkray.engine.robots import RobotsPolicy
from brinkray.fixtures import build_site, site_config
from brinkray.ref.oracle import crawl_oracle
from brinkray.ref.world import Web


def test_robots_budget_fuzzy_combined(ray_session, tmp_path):
    cfg = site_config(fuzzy=True)
    table = build_site(45, with_robots=True)
    urls = table["url"].to_pylist()
    policy = RobotsPolicy.from_pages(
        {
            h: table["html"][urls.index(f"{h}/robots.txt")].as_py().decode()
            for h in ("https://site-a.test", "https://site-b.test")
        }
    )
    web = Web.build(urls, table["html"].to_pylist(), cfg)
    oracle = crawl_oracle(web, cfg, per_host_budget=15, robots=policy)

    eng = CrawlEngine(
        cfg,
        EngineOptions(
            seen_shards=2,
            per_host_budget=15,
            robots_enabled=True,
            checkpoint_dir=str(tmp_path / "ckpt"),
        ),
    )
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
    assert oracle.budget_drops > 0  # the budget actually bit
