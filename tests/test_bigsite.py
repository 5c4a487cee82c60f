"""Sharded big-site generation must equal the single-shot build."""

import pyarrow as pa

from brinkray.fixtures.sitegen import build_site


def test_row_range_sharding_equivalence():
    whole = build_site(120, fanout=7, with_robots=True)
    parts = [
        build_site(120, fanout=7, with_robots=True, row_range=(lo, min(lo + 41, 120)))
        for lo in range(0, 120, 41)
    ]
    merged = pa.concat_tables(parts)
    assert whole.num_rows == merged.num_rows
    assert whole.sort_by("url").equals(merged.sort_by("url"))


def test_ensure_big_site_cached(ray_session, tmp_path, monkeypatch):
    import brinkray.fixtures.bigsite as bigsite

    monkeypatch.setattr(bigsite, "CACHE_ROOT", str(tmp_path))
    d1 = bigsite.ensure_big_site(
        "/root/testdata/sf0.001", n_pages=300, fanout=9, text_pad=500, shards=4
    )
    import pyarrow.parquet as pq

    t1 = pq.read_table(d1)
    assert t1.num_rows > 300  # core + satellites
    # second call: cache hit, identical content
    d2 = bigsite.ensure_big_site(
        "/root/testdata/sf0.001", n_pages=300, fanout=9, text_pad=500, shards=4
    )
    assert d1 == d2
    # matches the single-shot generator row-for-row
    from brinkray.fixtures.bigsite import _padded_texts

    whole = build_site(300, texts=_padded_texts("/root/testdata/sf0.001", 500), fanout=9)
    assert t1.sort_by("url").equals(whole.sort_by("url"))


def _chain_site(depth: int, fanout: int = 2):
    """Deep-chain fixture: page i links to page i+1 (plus a leaf), so a
    crawl reaches wave ~depth — the order_key width stress case."""
    import pyarrow as pa

    from brinkray.fixtures.sitegen import site_config

    cfg = site_config()
    host = cfg.root_domain
    urls, htmls = [], []
    for i in range(depth):
        links = [f'<a href="{host}/chain/{i + 1}">next</a>'] if i + 1 < depth else []
        for f in range(fanout - 1):
            links.append(f'<a href="{host}/leaf/{i}/{f}">leaf</a>')
        urls.append(f"{host}/chain/{i}" if i else host)
        htmls.append(f"<html><body>{''.join(links)}</body></html>")
        for f in range(fanout - 1):
            urls.append(f"{host}/leaf/{i}/{f}")
            htmls.append("<html><body>leaf</body></html>")
    return cfg, pa.table(
        {"url": pa.array(urls, pa.string()), "html": pa.array(htmls, pa.string())}
    )


def test_rebase_order_keys_depth100_fifo_exact(ray_session):
    """Strict mode at depth 100: rebased keys stay <= 17 B while the
    event SEQUENCE (the FIFO conformance surface) is byte-identical to
    the unrebased run whose keys grow ~7 B/wave."""
    from brinkray.engine.crawl import CrawlEngine, EngineOptions

    cfg, table = _chain_site(100)

    def run(rebase):
        eng = CrawlEngine(
            cfg, EngineOptions(seen_shards=2, rebase_order_keys=rebase)
        )
        eng.set_pages(table)
        t = eng.run().events_table()
        seq = list(zip(t["linked_from"].to_pylist(), t["url"].to_pylist(),
                       t["status"].to_pylist(), t["cached"].to_pylist()))
        return seq, max(len(k) for k in t["order_key"].to_pylist())

    seq_rb, width_rb = run(True)
    seq_plain, width_plain = run(False)
    assert seq_rb == seq_plain
    assert len(seq_rb) >= 100  # the chain was actually walked
    assert width_rb <= 17  # rank/pos, constant at any depth
    assert width_plain > 300  # what the rebase saves


def test_rebase_order_keys_scale_cap(ray_session):
    """Scale mode at depth 100: the growth cap bounds keys (~96 B) and
    the seen SET (scale mode's contract) matches the strict run."""
    from brinkray.engine.crawl import CrawlEngine, EngineOptions

    cfg, table = _chain_site(100)
    strict = CrawlEngine(cfg, EngineOptions(seen_shards=2))
    strict.set_pages(table)
    want = strict.run().seen

    eng = CrawlEngine(
        cfg,
        EngineOptions(seen_shards=2, ordering="scale", rebase_order_keys=True),
    )
    eng.set_pages(table)
    res = eng.run()
    assert res.seen == want
    width = max(
        len(k)
        for ds in res.results
        for df in [ds.to_pandas()]
        if "order_key" in df.columns
        for k in df["order_key"].tolist()
    )
    assert width <= 103  # 96-byte cap + one final /NNNNNN segment
