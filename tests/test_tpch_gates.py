"""TPC-H dimension-broadcast gate: every gated query must produce the
IDENTICAL result through its broadcast path (default) and its native
hash-join fallback (max_broadcast_dim_rows=0), on a star fixture with
enough key skew / misses to exercise the probe edges (lineitems whose
partkey has no part row, parts no lineitem references)."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _star_fixture():
    import ray.data as rd

    rng = np.random.default_rng(5)
    n_part, n_supp, n_li = 40, 8, 400
    part = pa.table(
        {
            "p_partkey": pa.array(np.arange(1, n_part + 1), pa.int64()),
            "p_name": pa.array(
                [
                    ("green widget item %d" % i) if i % 3 == 0
                    else ("blue gadget item %d" % i)
                    for i in range(1, n_part + 1)
                ],
                pa.string(),
            ),
            "p_brand": pa.array(
                ["Brand#13" if i % 4 == 0 else "Brand#19" if i % 4 == 1
                 else "Brand#8" for i in range(1, n_part + 1)],
                pa.string(),
            ),
            "p_type": pa.array(
                ["PROMO" if i % 5 == 0 else "STD" for i in range(1, n_part + 1)],
                pa.string(),
            ),
            "p_size": pa.array(
                (np.arange(1, n_part + 1) % 23 + 1).astype(np.int32)
            ),
        }
    )
    supplier = pa.table(
        {
            "s_suppkey": pa.array(np.arange(1, n_supp + 1), pa.int64()),
            "s_name": pa.array(
                [f"Supplier#{i:03d}" for i in range(1, n_supp + 1)], pa.string()
            ),
            "s_nationkey": pa.array(
                (np.arange(1, n_supp + 1) % 3).astype(np.int32)
            ),
        }
    )
    nation = pa.table(
        {
            "n_nationkey": pa.array([0, 1, 2], pa.int64()),
            "n_name": pa.array(["ALPHA", "BETA", "GAMMA"], pa.string()),
            "n_regionkey": pa.array([0, 0, 1], pa.int64()),
        }
    )
    # partkeys 1..n_part+5: the +5 tail has NO part row (probe miss)
    lp = rng.integers(1, n_part + 6, size=n_li)
    ls = rng.integers(1, n_supp + 1, size=n_li)
    days = rng.integers(0, 365, size=n_li)
    dates = np.datetime64("1997-01-01", "us") + days * np.timedelta64(
        86400_000_000, "us"
    )
    lineitem = pa.table(
        {
            "l_partkey": pa.array(lp, pa.int64()),
            "l_suppkey": pa.array(ls, pa.int64()),
            "l_shipdate": pa.array(dates, pa.timestamp("us")),
            "l_quantity": pa.array(
                rng.integers(1, 9, size=n_li).astype(np.float64)
            ),
            "l_extendedprice": pa.array(
                np.round(rng.uniform(10, 2000, size=n_li), 2)
            ),
            "l_discount": pa.array(
                np.round(rng.integers(0, 11, size=n_li) / 100.0, 2)
            ),
        }
    )
    return (
        rd.from_arrow(lineitem).repartition(4),
        rd.from_arrow(part).repartition(2),
        rd.from_arrow(supplier).repartition(2),
        rd.from_arrow(nation),
    )


def test_profit_by_nation_year_gate(ray_session):
    from brinkray.textproc.tpch import profit_by_nation_year

    li, part, supp, nat = _star_fixture()
    a = profit_by_nation_year(li, part, supp, nat, name_substr="widget")
    b = profit_by_nation_year(li, part, supp, nat, name_substr="widget",
                              max_broadcast_dim_rows=0)
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b)


def test_promo_revenue_share_gate(ray_session):
    from brinkray.textproc.tpch import promo_revenue_share

    li, part, _, _ = _star_fixture()
    a = promo_revenue_share(li, part, month="1997-09")
    b = promo_revenue_share(li, part, month="1997-09",
                            max_broadcast_dim_rows=0)
    assert int(a.loc[0, "total_cc"]) > 0
    pd.testing.assert_frame_equal(a, b)


def test_disjunctive_brand_revenue_gate(ray_session):
    from brinkray.textproc.tpch import disjunctive_brand_revenue

    li, part, _, _ = _star_fixture()
    a = disjunctive_brand_revenue(li, part)
    b = disjunctive_brand_revenue(li, part, max_broadcast_dim_rows=0)
    assert int(a.loc[0, "rev_cc"]) > 0
    pd.testing.assert_frame_equal(a, b)


def test_min_cost_supplier_gate(ray_session):
    from brinkray.textproc.tpch import min_cost_supplier_per_part

    li, part, supp, _ = _star_fixture()
    a = min_cost_supplier_per_part(li, part, supp, size=10)
    b = min_cost_supplier_per_part(li, part, supp, size=10,
                                   max_broadcast_dim_rows=0)
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b)
