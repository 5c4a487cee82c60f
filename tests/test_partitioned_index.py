"""Partitioned-index fetch (the co-partitioned join path, SURVEY J1):
must be event-identical to the broadcast path and the oracle."""

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


def test_partitioned_index_matches_oracle(ray_session, tmp_path):
    cfg = site_config()
    table = build_site(50)
    web = Web.build(table["url"].to_pylist(), table["html"].to_pylist(), cfg)
    oracle = crawl_oracle(web, cfg)

    eng = CrawlEngine(
        cfg,
        EngineOptions(
            seen_shards=2,
            index_mode="partitioned",
            index_dir=str(tmp_path / "pidx"),
            index_nparts=4,
        ),
    )
    eng.set_pages(table)
    assert eng.index.n_pages == table.num_rows
    result = eng.run()
    assert _events(result) == [
        (e.linked_from, e.url, e.status, e.body, e.cached) for e in oracle.events
    ]
    assert result.seen == oracle.seen


def test_partitioned_equals_broadcast(ray_session, tmp_path):
    """The co-partitioned join and the broadcast join are the same
    operator: event-for-event identical output on the same site."""
    cfg = site_config()
    table = build_site(80)
    eb = CrawlEngine(cfg, EngineOptions(seen_shards=2))
    eb.set_pages(table)
    rb = eb.run()
    ep = CrawlEngine(
        cfg,
        EngineOptions(
            seen_shards=2,
            index_mode="partitioned",
            index_dir=str(tmp_path / "pidx_eq"),
            index_nparts=4,
        ),
    )
    ep.set_pages(table)
    rp = ep.run()
    assert _events(rb) == _events(rp)
    assert rb.seen == rp.seen


def test_blockref_index_matches_table_build(ray_session):
    """Dataset input triggers the distributed (sorted-block-ref) index
    build; the crawl must be event-identical to the table-input
    (driver-built broadcast) path."""
    import ray.data as rd

    from brinkray.engine.index import BlockPageIndex

    cfg = site_config()
    table = build_site(80)
    eb = CrawlEngine(cfg, EngineOptions(seen_shards=2))
    eb.set_pages(table)
    rb = eb.run()

    ed = CrawlEngine(cfg, EngineOptions(seen_shards=2))
    ed.set_pages(rd.from_arrow(table))
    assert isinstance(ed.index, BlockPageIndex)
    assert ed.index.n_pages == table.num_rows
    rd_ = ed.run()
    assert _events(rb) == _events(rd_)
    assert rb.seen == rd_.seen


def test_blockref_index_scale_mode(ray_session):
    import ray.data as rd

    cfg = site_config()
    table = build_site(45)
    web = Web.build(table["url"].to_pylist(), table["html"].to_pylist(), cfg)
    oracle = crawl_oracle(web, cfg)
    eng = CrawlEngine(cfg, EngineOptions(seen_shards=2, ordering="scale"))
    eng.set_pages(rd.from_arrow(table))
    result = eng.run()
    assert result.seen == oracle.seen


def test_partitioned_index_scale_mode(ray_session, tmp_path):
    cfg = site_config()
    table = build_site(45)
    web = Web.build(table["url"].to_pylist(), table["html"].to_pylist(), cfg)
    oracle = crawl_oracle(web, cfg)
    eng = CrawlEngine(
        cfg,
        EngineOptions(
            seen_shards=2,
            ordering="scale",
            index_mode="partitioned",
            index_dir=str(tmp_path / "pidx2"),
            index_nparts=4,
        ),
    )
    eng.set_pages(table)
    result = eng.run()
    assert result.seen == oracle.seen


def test_partitioned_lru_autosizes_no_reload_storm(ray_session, tmp_path):
    """nparts >> a fixed LRU cap used to thrash: frontier blocks are
    not shard-ranged, so each mixed-shard batch cycles through up to
    nparts shards — sequential cyclic access is LRU's worst case, and
    with cap=8 vs nparts=32 EVERY probe reloads its shard's parquet.
    The auto-sized cache (cache_cap=None, budget-driven) must hold the
    whole working set here and load each shard at most once across
    many batches."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from brinkray.engine.fetch import PartitionedFetcher
    from brinkray.engine.index import build_partitioned_index

    cfg = site_config()
    table = build_site(120)
    pidx = build_partitioned_index(table, cfg, str(tmp_path / "pidx32"), nparts=32)

    # mixed-shard probe batches straight from the persisted shards
    import os

    canons = []
    for p in range(32):
        d = os.path.join(pidx.root, f"pshard={p}")
        for f in sorted(os.listdir(d)):
            canons.extend(
                pq.read_table(os.path.join(d, f), columns=["canon"])["canon"].to_pylist()
            )
    rng = np.random.default_rng(7)
    canons = [canons[i] for i in rng.permutation(len(canons))]
    batches = [
        pa.table({"canon": pa.array(canons[i : i + 24], pa.string())})
        for i in range(0, len(canons), 24)
    ]
    assert len(batches) >= 6

    auto = PartitionedFetcher(cfg, pidx, None, 1)
    assert auto._cache_cap == 32  # tiny corpus: budget holds every shard
    for b in batches:
        auto._join(b)
    assert auto._shard_loads <= 32  # each shard loaded at most once

    storm = PartitionedFetcher(cfg, pidx, None, 1, cache_cap=8)
    for b in batches:
        storm._join(b)
    # the storm the auto-sizing removes: far more loads than shards
    assert storm._shard_loads > 32
