"""Replicates the driver's verification: every queries() entry with an
oracle_sql() twin must match DuckDB on the same parquet views
(row count + schema + order-insensitive values)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import __ray_entry__ as entrymod

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

SF = "/root/testdata/sf0.01"


def duck(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.sql(sql).df()


def canon(df) -> pd.DataFrame:
    if isinstance(df, pa.Table):
        df = df.to_pandas()
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            # the driver hash is unit-insensitive for datetimes (r01
            # evidence: [s] vs [us] matched) but int/float-sensitive
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True)


SQL_KEYS = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("key", SQL_KEYS)
def test_query_matches_duckdb(ray_session, key):
    q = entrymod.queries()[key]
    got = canon(q(SF))
    want = canon(duck(SF, entrymod.oracle_sql()[key]))
    assert list(got.columns) == list(want.columns), key
    assert len(got) == len(want), key
    # the driver's value hash is dtype-sensitive (this caught the r01
    # asof float64-promotion miss) — compare dtypes exactly post-canon
    assert [str(d) for d in got.dtypes] == [str(d) for d in want.dtypes], key
    pd.testing.assert_frame_equal(got, want, check_dtype=True, check_exact=True)


ROWS_ONLY = sorted(set(entrymod.queries()) - set(SQL_KEYS) - {"crawl_seen_set", "crawl_events"})


@pytest.mark.parametrize("key", ROWS_ONLY)
def test_rows_only_queries_run(ray_session, key):
    q = entrymod.queries()[key]
    out = q("/root/testdata/sf0.001")
    df = out.to_pandas() if isinstance(out, pa.Table) else out
    assert df is not None
    assert len(df.columns) > 0


def test_crawl_queries_and_entry(ray_session):
    ev = entrymod.queries()["crawl_events"]("/root/testdata/sf0.001")
    seen = entrymod.queries()["crawl_seen_set"]("/root/testdata/sf0.001")
    assert len(seen) > 100
    df = ev.to_pandas() if isinstance(ev, pa.Table) else ev
    assert len(df) >= len(seen)
    out = entrymod.entry()
    out_df = out.to_pandas() if isinstance(out, pa.Table) else out
    assert len(out_df) > 100
    assert set(out_df.columns) == {
        "wave",
        "order_key",
        "linked_from",
        "url",
        "status",
        "cached",
    }


def test_crawl_sql_oracle_other_site_size(ray_session, tmp_path):
    """The recursive-CTE crawl oracle must hold at a site size the
    driver never exercises (both testdata SFs synthesize 500 pages) —
    a different n changes the link graph's quirk-page placement, wave
    count and 404-variant population."""
    import pyarrow.parquet as pq

    from brinkray.fixtures import build_site
    from brinkray.pipelines import host_stats, run_crawl

    pages = build_site(150)
    res = run_crawl(pages)
    dump = str(tmp_path / "pages.parquet")
    pq.write_table(pages.select(["url", "html"]), dump)

    sqls = entrymod.oracle_sql()
    con = duckdb.connect()
    seen_sql = sqls["crawl_seen_set"].replace(entrymod._CRAWL_PAGES_PATH, dump)
    got = con.sql(seen_sql).df()
    items = sorted(res.seen.items())
    want = pd.DataFrame(
        {"url": [u for u, _ in items], "status": [s for _, s in items]}
    )
    pd.testing.assert_frame_equal(
        canon(got), canon(want), check_dtype=False, check_exact=True
    )

    hs_sql = sqls["crawl_host_stats"].replace(entrymod._CRAWL_PAGES_PATH, dump)
    got_hs = con.sql(hs_sql).df()
    want_hs = host_stats(res).to_pandas()
    pd.testing.assert_frame_equal(
        canon(got_hs), canon(want_hs), check_dtype=False, check_exact=True
    )
