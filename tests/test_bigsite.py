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
