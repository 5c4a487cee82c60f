"""TPC-H-shaped relational pipelines adapted to the reduced star schema
(no partsupp, no commit/receipt dates) — each function is one classic
query SHAPE expressed Ray-Data-first:

* revenue is exact integer fixed point: ``rev_cc = round(ep*100) *
  (100 - round(disc*100))`` (centi-cents) — both factors are exact for
  2-decimal inputs, so distributed sums are associative and
  bit-reproducible, and the DuckDB twin mirrors the same integers.
* dimension tables that are genuinely small (part, supplier, nation,
  region) broadcast ONCE via ``ray.put`` and probe with searchsorted
  inside ``map_batches`` — never shuffled.
* big⋈big edges (lineitem⋈orders, x⋈customer) use Ray's native
  hash-shuffle ``Dataset.join``; when a pipeline chains two of them we
  ``materialize()`` between (two join aggregator pools in one
  streaming execution deadlock a small cluster — NOTES/rayfix).
* per-key pre-aggregation uses ``relagg.bucketed_group_sums`` (the
  high-cardinality combiner kernel) so the widest table never ships
  line-level rows into a join.
* top-k outputs pre-prune per batch (k rows/batch reach the driver).

Scale note: rev_cc sums are bounded by 1e9/row; int64 holds ~9.2e18,
so a single group stays exact past 10^9 rows — at 100-TB corpus scale
group sums stay far under the bound because every query below groups
by a key (order, part, supplier, nation) before summing globally.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..engine.rayfix import apply as _apply_rayfix

_apply_rayfix()  # schema-broadcast fix for native hash-shuffle joins

__all__ = [
    "top_unshipped_orders",
    "forecast_revenue_delta",
    "nation_trade_volumes",
    "market_share_yearly",
    "profit_by_nation_year",
    "important_parts",
    "returnflag_priority_counts",
    "promo_revenue_share",
    "top_supplier_revenue",
    "large_volume_customers",
    "disjunctive_brand_revenue",
    "dominant_part_suppliers",
    "waiting_order_suppliers",
    "returned_item_customers",
    "min_cost_supplier_per_part",
    "late_order_priority_counts",
    "local_supplier_volume",
    "customer_order_distribution",
]

_PAIR_BITS = 24  # suppkey fits 2^24 alongside orderkey/partkey in int64


def _cents(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    return pc.cast(pc.round(pc.multiply(col, 100.0)), pa.int64())


def _rev_cc(t: pa.Table) -> pa.Array:
    """round(ep*100) * (100 - round(disc*100)) — exact int64 centi-cents."""
    ep = _cents(t["l_extendedprice"])
    dp = _cents(t["l_discount"])
    return pc.multiply(ep, pc.subtract(pa.scalar(100, pa.int64()), dp))


def _ts(s: str) -> np.datetime64:
    return np.datetime64(s, "us")


def _year_i64(col) -> pa.Array:
    return pc.cast(pc.year(col), pa.int64())


def _lookup_i64(sorted_keys: np.ndarray, probe: np.ndarray):
    """(hit_mask, positions) of probe in sorted_keys via searchsorted."""
    pos = np.searchsorted(sorted_keys, probe)
    pos_c = np.minimum(pos, max(len(sorted_keys) - 1, 0))
    if len(sorted_keys) == 0:
        return np.zeros(len(probe), dtype=bool), pos_c
    return sorted_keys[pos_c] == probe, pos_c


def _np(col, dtype=np.int64) -> np.ndarray:
    return col.to_numpy(zero_copy_only=False).astype(dtype)


# broadcast gate for SF-proportional dimension tables (part is SF x
# 200k rows, supplier SF x 10k): under the cap the dim ships once via
# ray.put and probes via searchsorted; past it the query falls back to
# its native hash-join shape (both paths pinned equal in tests)
MAX_BROADCAST_DIM_ROWS = 5_000_000


def _supplier_maps(supplier_ds, nation_ds):
    """suppkey-sorted arrays: (suppkeys, nationkey, s_name) + nation name
    list. SF-proportional broadcast — callers with a join fallback gate
    on ``MAX_BROADCAST_DIM_ROWS`` before calling this."""
    sup = supplier_ds.select_columns(["s_suppkey", "s_nationkey", "s_name"]) \
        .to_pandas().sort_values("s_suppkey")
    nat = {
        int(r["n_nationkey"]): (r["n_name"], int(r["n_regionkey"]))
        for r in nation_ds.take_all()
    }
    return (
        sup["s_suppkey"].to_numpy(dtype=np.int64),
        sup["s_nationkey"].to_numpy(dtype=np.int64),
        sup["s_name"].to_numpy(),
        nat,
    )


def _gather_dim_filtered(dim_ds, key_col: str, keys: np.ndarray,
                         cols: list[str]) -> pd.DataFrame:
    """Gather ONLY the dim rows whose key is in ``keys`` — the
    result-bounded replacement for gathering a whole SF-proportional
    dimension to the driver just to attach names to a small result:
    the key set (already on the driver, bounded by the result)
    broadcasts once and the dim filters distributed; what reaches the
    driver is |result| rows, never |dim|."""
    import ray

    kref = ray.put(np.sort(np.asarray(keys, dtype=np.int64)))

    def probe(t: pa.Table) -> pa.Table:
        hit, _ = _lookup_i64(ray.get(kref), _np(t[key_col]))
        return t.filter(pa.array(hit)).select(cols)

    return (
        dim_ds.select_columns(cols)
        .map_batches(probe, batch_format="pyarrow")
        .to_pandas()
    )


def _bucket_apply(ds, key_col: str, body, n_buckets: int | None = None):
    """Hash-bucket exchange keyed on ``key_col`` + per-bucket pandas body:
    every row of a key lands in ONE bucket, so ``body`` sees complete
    key groups (the low-cardinality exchange shape — the native sort
    aggregate collapses at high group cardinality, NOTES)."""
    import ray

    if n_buckets is None:
        n_buckets = 4 * int(ray.cluster_resources().get("CPU", 8))

    def tag(t: pa.Table) -> pa.Table:
        k = _np(t[key_col]).view(np.uint64)
        h = (k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        return t.append_column(
            "_b", pa.array((h % np.uint64(n_buckets)).astype(np.int32))
        )

    def run(g: pd.DataFrame) -> pd.DataFrame:
        return body(g.drop(columns=["_b"]))

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(run, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Q3: shipping-priority top-k
# ---------------------------------------------------------------------------


def top_unshipped_orders(lineitem_ds, orders_ds, cutoff: str = "1998-01-01",
                         k: int = 10, num_partitions: int | None = None):
    """TPC-H Q3 shape: top-k orders by outstanding revenue — orders
    placed before ``cutoff`` with lines shipping after it. Lineitem is
    pre-aggregated to one int64 row per order BEFORE the join; the
    top-k pre-prunes per batch so only k rows/batch reach the driver.
    Returns pandas (l_orderkey, rev_cc, o_orderdate, o_orderpriority).
    """
    from .joins import default_join_partitions
    from .relagg import bucketed_group_sums

    if num_partitions is None:
        num_partitions = default_join_partitions()
    cut = _ts(cutoff)

    def li_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], pa.scalar(cut)))
        return pa.table({"l_orderkey": t["l_orderkey"], "rev_cc": _rev_cc(t)})

    per_order = bucketed_group_sums(
        lineitem_ds.select_columns(
            ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
        ).map_batches(li_prep, batch_format="pyarrow"),
        key_col="l_orderkey",
        sum_cols=["rev_cc"],
    )

    def o_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["o_orderdate"], pa.scalar(cut)))
        return t.select(["o_orderkey", "o_orderdate", "o_orderpriority"])

    joined = per_order.join(
        orders_ds.select_columns(
            ["o_orderkey", "o_orderdate", "o_orderpriority"]
        ).map_batches(o_prep, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["rev_cc", "l_orderkey"], ascending=[False, True]
        ).head(k)

    cand = joined.map_batches(prune, batch_format="pandas").to_pandas()
    out = cand.sort_values(["rev_cc", "l_orderkey"], ascending=[False, True]) \
        .head(k).reset_index(drop=True)
    return out[["l_orderkey", "rev_cc", "o_orderdate", "o_orderpriority"]]


# ---------------------------------------------------------------------------
# Q6: forecast revenue delta (scalar filter-sum)
# ---------------------------------------------------------------------------


def forecast_revenue_delta(lineitem_ds, year: int = 1997,
                           disc_lo: int = 5, disc_hi: int = 7,
                           qty_below: float = 5.0) -> pd.DataFrame:
    """TPC-H Q6: one filtered sum — ``sum(ep_cents * disc_pct)`` over a
    ship-year, a discount band and a quantity cap. Pure map-side
    partial sums; ONE scalar crosses the cluster."""
    from ray.data.aggregate import Sum

    lo, hi = _ts(f"{year}-01-01"), _ts(f"{year + 1}-01-01")

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                    pc.less(t["l_shipdate"], pa.scalar(hi))),
            pc.less(t["l_quantity"], pa.scalar(qty_below)),
        )
        t = t.filter(m)
        dp = _cents(t["l_discount"])
        t = t.filter(pc.and_(pc.greater_equal(dp, pa.scalar(disc_lo, pa.int64())),
                             pc.less_equal(dp, pa.scalar(disc_hi, pa.int64()))))
        ep = _cents(t["l_extendedprice"])
        dp = _cents(t["l_discount"])
        part = pc.sum(pc.multiply(ep, dp)).as_py() or 0
        return pa.table({"p": pa.array([part], pa.int64())})

    agg = (
        lineitem_ds.select_columns(
            ["l_shipdate", "l_quantity", "l_extendedprice", "l_discount"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .aggregate(Sum("p", alias_name="revenue_delta"))
    )
    return pd.DataFrame({"revenue_delta": [int(agg["revenue_delta"])]})


# ---------------------------------------------------------------------------
# Q7: trade volumes between two nations
# ---------------------------------------------------------------------------


def nation_trade_volumes(lineitem_ds, orders_ds, customer_ds, supplier_ds,
                         nation_ds, nation_a: str, nation_b: str,
                         ship_lo: str = "1996-01-01", ship_hi: str = "1998-01-01",
                         num_partitions: int | None = None):
    """TPC-H Q7 shape: revenue between two nations per direction per
    ship-year. Supplier nation resolves by broadcast (and filters to
    the two nations EARLY, before any shuffle); the two big joins
    (⋈orders, ⋈customer) run in separate executions."""
    from ray.data.aggregate import Sum

    from .joins import default_join_partitions

    if num_partitions is None:
        num_partitions = default_join_partitions()
    lo, hi = _ts(ship_lo), _ts(ship_hi)
    sk, snat, _, nat = _supplier_maps(supplier_ds, nation_ds)
    name_of = {k: v[0] for k, v in nat.items()}
    keep_keys = {k for k, v in name_of.items() if v in (nation_a, nation_b)}
    import ray
    ref = ray.put((sk, snat))

    def li_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                             pc.less(t["l_shipdate"], pa.scalar(hi))))
        keys, nk = ray.get(ref)
        ls = _np(t["l_suppkey"])
        hit, pos = _lookup_i64(keys, ls)
        snk = np.where(hit, nk[np.minimum(pos, len(nk) - 1)], -1)
        keep = np.isin(snk, np.fromiter(keep_keys, dtype=np.int64))
        t2 = t.filter(pa.array(keep))
        return pa.table({
            "l_orderkey": t2["l_orderkey"],
            "supp_nk": pa.array(snk[keep], pa.int64()),
            "l_year": _year_i64(t2["l_shipdate"]),
            "rev_cc": _rev_cc(t2),
        })

    li = lineitem_ds.select_columns(
        ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"]
    ).map_batches(li_prep, batch_format="pyarrow")

    j1 = li.join(
        orders_ds.select_columns(["o_orderkey", "o_custkey"]),
        join_type="inner", num_partitions=num_partitions,
        on=("l_orderkey",), right_on=("o_orderkey",),
    ).materialize()

    j2 = j1.join(
        customer_ds.select_columns(["c_custkey", "c_nationkey"]),
        join_type="inner", num_partitions=num_partitions,
        on=("o_custkey",), right_on=("c_custkey",),
    )

    def pair_filter(t: pa.Table) -> pa.Table:
        cnk = _np(t["c_nationkey"])
        snk = _np(t["supp_nk"])
        sn = np.array([name_of.get(int(x), "") for x in snk])
        cn = np.array([name_of.get(int(x), "") for x in cnk])
        keep = ((sn == nation_a) & (cn == nation_b)) | \
               ((sn == nation_b) & (cn == nation_a))
        return pa.table({
            "supp_nation": pa.array(sn[keep], pa.string()),
            "cust_nation": pa.array(cn[keep], pa.string()),
            "l_year": pa.array(_np(t["l_year"])[keep], pa.int64()),
            "rev_cc": pa.array(_np(t["rev_cc"])[keep], pa.int64()),
        })

    out = (
        j2.map_batches(pair_filter, batch_format="pyarrow")
        .groupby(["supp_nation", "cust_nation", "l_year"])
        .aggregate(Sum("rev_cc", alias_name="rev_cc"))
        .to_pandas()
    )
    return out.sort_values(["supp_nation", "cust_nation", "l_year"]) \
        .reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q8: national market share per order-year
# ---------------------------------------------------------------------------


def market_share_yearly(lineitem_ds, orders_ds, customer_ds, supplier_ds,
                        nation_ds, region_ds, nation: str, region: str,
                        num_partitions: int | None = None):
    """TPC-H Q8 shape: the share of ``nation``'s suppliers in revenue
    sold to ``region``'s customers, per order-year. Integer numerator
    and denominator summed distributed; the final share is one float
    division per year row."""
    from ray.data.aggregate import Sum

    from .joins import default_join_partitions

    if num_partitions is None:
        num_partitions = default_join_partitions()
    sk, snat, _, nat = _supplier_maps(supplier_ds, nation_ds)
    region_keys = {
        int(r["r_regionkey"]): r["r_name"] for r in region_ds.take_all()
    }
    nation_in_region = np.array(sorted(
        k for k, (nm, rk) in nat.items() if region_keys[rk] == region
    ), dtype=np.int64)
    target_nk = {k for k, (nm, _) in nat.items() if nm == nation}
    import ray
    ref = ray.put((sk, snat))

    def li_prep(t: pa.Table) -> pa.Table:
        keys, nk = ray.get(ref)
        ls = _np(t["l_suppkey"])
        hit, pos = _lookup_i64(keys, ls)
        snk = np.where(hit, nk[np.minimum(pos, len(nk) - 1)], -1)
        rev = _np(_rev_cc(t))
        is_n = np.isin(snk, np.fromiter(target_nk, dtype=np.int64))
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "rev": pa.array(rev, pa.int64()),
            "nrev": pa.array(np.where(is_n, rev, 0), pa.int64()),
        })

    li = lineitem_ds.select_columns(
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(li_prep, batch_format="pyarrow")

    def o_prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_custkey": t["o_custkey"],
            "o_year": _year_i64(t["o_orderdate"]),
        })

    j1 = li.join(
        orders_ds.select_columns(["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(o_prep, batch_format="pyarrow"),
        join_type="inner", num_partitions=num_partitions,
        on=("l_orderkey",), right_on=("o_orderkey",),
    ).materialize()

    j2 = j1.join(
        customer_ds.select_columns(["c_custkey", "c_nationkey"]),
        join_type="inner", num_partitions=num_partitions,
        on=("o_custkey",), right_on=("c_custkey",),
    )

    def reg_filter(t: pa.Table) -> pa.Table:
        keep = np.isin(_np(t["c_nationkey"]), nation_in_region)
        return pa.table({
            "o_year": pa.array(_np(t["o_year"])[keep], pa.int64()),
            "rev": pa.array(_np(t["rev"])[keep], pa.int64()),
            "nrev": pa.array(_np(t["nrev"])[keep], pa.int64()),
        })

    agg = (
        j2.map_batches(reg_filter, batch_format="pyarrow")
        .groupby("o_year")
        .aggregate(Sum("nrev", alias_name="nation_cc"),
                   Sum("rev", alias_name="total_cc"))
        .to_pandas()
    )
    agg = agg.sort_values("o_year").reset_index(drop=True)
    agg["share"] = agg["nation_cc"].astype("float64") / agg["total_cc"].astype(
        "float64")
    return agg[["o_year", "nation_cc", "total_cc", "share"]]


# ---------------------------------------------------------------------------
# Q9 adapted: revenue by supplier nation x ship-year over a part family
# ---------------------------------------------------------------------------


def profit_by_nation_year(lineitem_ds, part_ds, supplier_ds, nation_ds,
                          name_substr: str = "widget",
                          max_broadcast_dim_rows: int | None = None):
    """TPC-H Q9 shape (minus partsupp cost): revenue by supplier nation
    and ship-year restricted to parts whose name contains a token.
    Under ``max_broadcast_dim_rows`` both dimension probes broadcast
    and the ONLY exchange is the tiny (nation x year) groupby; past it
    (part is SF x 200k rows — driver-sized only at conformance scale)
    the part filter becomes a distributed semi-join and the supplier
    nation attaches by native hash join. Both paths are bit-equal
    (pinned in tests)."""
    from ray.data.aggregate import Sum

    if max_broadcast_dim_rows is None:
        max_broadcast_dim_rows = MAX_BROADCAST_DIM_ROWS
    li = lineitem_ds.select_columns(
        ["l_partkey", "l_suppkey", "l_shipdate",
         "l_extendedprice", "l_discount"]
    )
    nat = {
        int(r["n_nationkey"]): r["n_name"] for r in nation_ds.take_all()
    }

    if max(part_ds.count(), supplier_ds.count()) <= max_broadcast_dim_rows:
        part = part_ds.select_columns(["p_partkey", "p_name"]).to_pandas()
        keep_parts = np.sort(part.loc[
            part["p_name"].str.contains(name_substr), "p_partkey"
        ].to_numpy(dtype=np.int64))
        sk, snat, _, _nat_full = _supplier_maps(supplier_ds, nation_ds)
        import ray
        ref = ray.put((keep_parts, sk, snat))

        def probe(t: pa.Table) -> pa.Table:
            kp, keys, nk = ray.get(ref)
            lp = _np(t["l_partkey"])
            hit_p, _ = _lookup_i64(kp, lp)
            t = t.filter(pa.array(hit_p))
            ls = _np(t["l_suppkey"])
            hit_s, pos = _lookup_i64(keys, ls)
            snk = nk[np.minimum(pos, len(nk) - 1)]
            names = np.array([nat[int(x)] for x in snk])
            return pa.table({
                "n_name": pa.array(names, pa.string()),
                "l_year": _year_i64(t["l_shipdate"]),
                "rev_cc": _rev_cc(t),
            })

        grouped = li.map_batches(probe, batch_format="pyarrow")
    else:
        # join path: part keys semi-join the fact; supplier rows carry
        # their nation name (nation itself is a fixed 25-row table —
        # always broadcastable) and attach by hash join
        from .joins import default_join_partitions, semi_join

        nparts = default_join_partitions()

        def part_keys(t: pa.Table) -> pa.Table:
            m = pc.match_substring(t["p_name"], name_substr)
            return pa.table(
                {"l_partkey": pc.cast(t.filter(m)["p_partkey"], pa.int64())}
            )

        kp_ds = part_ds.select_columns(["p_partkey", "p_name"]).map_batches(
            part_keys, batch_format="pyarrow"
        )
        li_f = semi_join(li, kp_ds, on="l_partkey",
                         num_partitions=nparts).materialize()

        def sup_rows(t: pa.Table) -> pa.Table:
            names = np.array(
                [nat[int(x)] for x in _np(t["s_nationkey"])]
            )
            return pa.table({
                "l_suppkey": pc.cast(t["s_suppkey"], pa.int64()),
                "n_name": pa.array(names, pa.string()),
            })

        sup_ds = supplier_ds.select_columns(
            ["s_suppkey", "s_nationkey"]
        ).map_batches(sup_rows, batch_format="pyarrow")
        joined = li_f.join(sup_ds, join_type="inner",
                           num_partitions=nparts, on=("l_suppkey",))

        def finish(t: pa.Table) -> pa.Table:
            return pa.table({
                "n_name": t["n_name"],
                "l_year": _year_i64(t["l_shipdate"]),
                "rev_cc": _rev_cc(t),
            })

        grouped = joined.map_batches(finish, batch_format="pyarrow")

    out = (
        grouped.groupby(["n_name", "l_year"])
        .aggregate(Sum("rev_cc", alias_name="rev_cc"))
        .to_pandas()
    )
    return out.sort_values(["n_name", "l_year"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q11 adapted: parts above 1.5x the mean part value
# ---------------------------------------------------------------------------


def important_parts(lineitem_ds):
    """TPC-H Q11 shape: per-part total value filtered against a global
    scalar — kept exact with the integer cross-multiply
    ``2 * value * n_parts > 3 * total`` (value > 1.5x mean). The
    per-part table is |parts| rows (the small side by construction);
    the scalar pair (total, n) is one streaming aggregate."""
    from ray.data.aggregate import Count, Sum

    from .relagg import bucketed_group_sums

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": t["l_partkey"],
            "value_cents": _cents(t["l_extendedprice"]),
        })

    v = bucketed_group_sums(
        lineitem_ds.select_columns(["l_partkey", "l_extendedprice"])
        .map_batches(prep, batch_format="pyarrow"),
        key_col="l_partkey",
        sum_cols=["value_cents"],
    ).materialize()
    tot = v.aggregate(Sum("value_cents", alias_name="s"), Count(alias_name="n"))
    s, n = int(tot["s"]), int(tot["n"])

    def keep(t: pa.Table) -> pa.Table:
        val = _np(t["value_cents"])
        m = 2 * val * n > 3 * s
        return t.filter(pa.array(m))

    out = v.map_batches(keep, batch_format="pyarrow").to_pandas()
    return out.sort_values(
        ["value_cents", "l_partkey"], ascending=[False, True]
    ).reset_index(drop=True)[["l_partkey", "value_cents"]]


# ---------------------------------------------------------------------------
# Q12 adapted: returnflag x order-priority class counts
# ---------------------------------------------------------------------------


def returnflag_priority_counts(lineitem_ds, orders_ds, year: int = 1997,
                               num_partitions: int | None = None):
    """TPC-H Q12 shape (returnflag standing in for shipmode): per flag,
    CASE-split counts of high- vs low-priority order lines shipped in
    ``year``. One native join, one 3-row groupby."""
    from ray.data.aggregate import Sum

    from .joins import default_join_partitions

    if num_partitions is None:
        num_partitions = default_join_partitions()
    lo, hi = _ts(f"{year}-01-01"), _ts(f"{year + 1}-01-01")

    def li_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                             pc.less(t["l_shipdate"], pa.scalar(hi))))
        return t.select(["l_orderkey", "l_returnflag"])

    joined = (
        lineitem_ds.select_columns(["l_orderkey", "l_returnflag", "l_shipdate"])
        .map_batches(li_prep, batch_format="pyarrow")
        .join(
            orders_ds.select_columns(["o_orderkey", "o_orderpriority"]),
            join_type="inner", num_partitions=num_partitions,
            on=("l_orderkey",), right_on=("o_orderkey",),
        )
    )

    def classify(t: pa.Table) -> pa.Table:
        high = pc.is_in(t["o_orderpriority"],
                        value_set=pa.array(["1-URGENT", "2-HIGH"]))
        h = pc.cast(high, pa.int64())
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "high_line_count": h,
            "low_line_count": pc.subtract(pa.scalar(1, pa.int64()), h),
        })

    out = (
        joined.map_batches(classify, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(Sum("high_line_count", alias_name="high_line_count"),
                   Sum("low_line_count", alias_name="low_line_count"))
        .to_pandas()
    )
    return out.sort_values("l_returnflag").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q14: promo revenue share (one month)
# ---------------------------------------------------------------------------


def promo_revenue_share(lineitem_ds, part_ds, month: str = "1997-09",
                        max_broadcast_dim_rows: int | None = None):
    """TPC-H Q14: the PROMO-part share of one month's revenue. Under
    the dim gate, part type broadcasts as a sorted (partkey, is_promo)
    pair and the month's lines probe map-side; past it, the
    month-filtered (partkey, rev) rows hash-join the (partkey,
    is_promo) dim natively. Either way the exchange carries partial
    (promo, total) int sums; one float division at the end
    (``100.0 * promo / total``, the twin's association order)."""
    from ray.data.aggregate import Sum

    if max_broadcast_dim_rows is None:
        max_broadcast_dim_rows = MAX_BROADCAST_DIM_ROWS
    y, m = (int(x) for x in month.split("-"))
    lo = _ts(f"{y}-{m:02d}-01")
    hi = _ts(f"{y + (m == 12)}-{(m % 12) + 1:02d}-01")
    li = lineitem_ds.select_columns(
        ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"]
    )

    if part_ds.count() <= max_broadcast_dim_rows:
        part = part_ds.select_columns(["p_partkey", "p_type"]).to_pandas() \
            .sort_values("p_partkey")
        pk = part["p_partkey"].to_numpy(dtype=np.int64)
        promo = (part["p_type"] == "PROMO").to_numpy()
        import ray
        ref = ray.put((pk, promo))

        def partial(t: pa.Table) -> pa.Table:
            t = t.filter(
                pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                        pc.less(t["l_shipdate"], pa.scalar(hi)))
            )
            keys, isp = ray.get(ref)
            lp = _np(t["l_partkey"])
            hit, pos = _lookup_i64(keys, lp)
            rev = _np(_rev_cc(t))
            rev = rev[hit]
            p = isp[pos[hit]] if len(keys) else np.zeros(0, dtype=bool)
            return pa.table({
                "promo_cc": pa.array([int(rev[p].sum())], pa.int64()),
                "total_cc": pa.array([int(rev.sum())], pa.int64()),
            })

        partials = li.map_batches(partial, batch_format="pyarrow")
    else:
        from .joins import default_join_partitions

        def li_prep(t: pa.Table) -> pa.Table:
            t = t.filter(
                pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                        pc.less(t["l_shipdate"], pa.scalar(hi)))
            )
            return pa.table(
                {"l_partkey": t["l_partkey"], "rev_cc": _rev_cc(t)}
            )

        dim = part_ds.select_columns(["p_partkey", "p_type"]).map_batches(
            lambda t: pa.table({
                "l_partkey": pc.cast(t["p_partkey"], pa.int64()),
                "isp": pc.cast(pc.equal(t["p_type"], pa.scalar("PROMO")),
                               pa.int64()),
            }),
            batch_format="pyarrow",
        )
        joined = li.map_batches(li_prep, batch_format="pyarrow").join(
            dim, join_type="inner",
            num_partitions=default_join_partitions(), on=("l_partkey",),
        )

        def post(t: pa.Table) -> pa.Table:
            rev = _np(t["rev_cc"])
            isp = _np(t["isp"]).astype(bool)
            return pa.table({
                "promo_cc": pa.array([int(rev[isp].sum())], pa.int64()),
                "total_cc": pa.array([int(rev.sum())], pa.int64()),
            })

        partials = joined.map_batches(post, batch_format="pyarrow")

    agg = partials.aggregate(Sum("promo_cc", alias_name="promo_cc"),
                             Sum("total_cc", alias_name="total_cc"))
    p, t = int(agg["promo_cc"] or 0), int(agg["total_cc"] or 0)
    return pd.DataFrame({
        "promo_cc": [p],
        "total_cc": [t],
        "promo_share": [100.0 * float(p) / float(t)],
    })


# ---------------------------------------------------------------------------
# Q15: top supplier(s) by windowed revenue
# ---------------------------------------------------------------------------


def top_supplier_revenue(lineitem_ds, supplier_ds,
                         lo: str = "1997-01-01", hi: str = "1997-04-01"):
    """TPC-H Q15: the supplier(s) achieving max revenue over a quarter.
    Per-supplier sums are |suppliers| rows (small side); names resolve
    by broadcast. Returns every argmax row (ties preserved, like the
    view-based original)."""
    from .relagg import bucketed_group_sums

    lo_, hi_ = _ts(lo), _ts(hi)

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(lo_)),
                             pc.less(t["l_shipdate"], pa.scalar(hi_))))
        return pa.table({"l_suppkey": t["l_suppkey"], "total_rev": _rev_cc(t)})

    per_supp = bucketed_group_sums(
        lineitem_ds.select_columns(
            ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"]
        ).map_batches(prep, batch_format="pyarrow"),
        key_col="l_suppkey",
        sum_cols=["total_rev"],
    ).to_pandas()
    best = per_supp["total_rev"].max()
    win = per_supp[per_supp["total_rev"] == best]
    names = _gather_dim_filtered(
        supplier_ds, "s_suppkey",
        win["l_suppkey"].to_numpy(dtype=np.int64), ["s_suppkey", "s_name"],
    )
    out = win.merge(names, left_on="l_suppkey", right_on="s_suppkey")
    return out.sort_values("s_suppkey").reset_index(drop=True)[
        ["s_suppkey", "s_name", "total_rev"]
    ]


# ---------------------------------------------------------------------------
# Q18: large-volume customers
# ---------------------------------------------------------------------------


def large_volume_customers(lineitem_ds, orders_ds, customer_ds,
                           min_qty: int = 300):
    """TPC-H Q18: orders whose total quantity exceeds ``min_qty``, with
    customer names. The HAVING is intrinsically high-selectivity (the
    query reports outlier orders), so the qualifying (orderkey, qty)
    set is gathered once and broadcast as a filter into orders, then
    the matched custkeys into customer — no corpus-scale join ships."""
    import ray

    from .relagg import bucketed_group_sums

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "sum_qty": pc.cast(t["l_quantity"], pa.int64()),
        })

    per_order = bucketed_group_sums(
        lineitem_ds.select_columns(["l_orderkey", "l_quantity"])
        .map_batches(prep, batch_format="pyarrow"),
        key_col="l_orderkey",
        sum_cols=["sum_qty"],
    )
    big = per_order.filter(expr=f"sum_qty > {int(min_qty)}").to_pandas()
    okeys = np.sort(big["l_orderkey"].to_numpy(dtype=np.int64))
    ref = ray.put(okeys)

    def o_probe(t: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        hit, _ = _lookup_i64(keys, _np(t["o_orderkey"]))
        t = t.filter(pa.array(hit))
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_custkey": t["o_custkey"],
            "o_orderdate": t["o_orderdate"],
            "o_total_cents": _cents(t["o_totalprice"]),
        })

    ords = orders_ds.select_columns(
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    ).map_batches(o_probe, batch_format="pyarrow").to_pandas()
    ckeys = np.sort(ords["o_custkey"].unique().astype(np.int64))
    cref = ray.put(ckeys)

    def c_probe(t: pa.Table) -> pa.Table:
        keys = ray.get(cref)
        hit, _ = _lookup_i64(keys, _np(t["c_custkey"]))
        return t.filter(pa.array(hit)).select(["c_custkey", "c_name"])

    cust = customer_ds.select_columns(["c_custkey", "c_name"]) \
        .map_batches(c_probe, batch_format="pyarrow").to_pandas()
    out = (
        ords.merge(big, left_on="o_orderkey", right_on="l_orderkey")
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
    )
    out = out.sort_values(["o_total_cents", "o_orderkey"],
                          ascending=[False, True]).reset_index(drop=True)
    return out[["c_custkey", "c_name", "o_orderkey", "o_orderdate",
                "o_total_cents", "sum_qty"]]


# ---------------------------------------------------------------------------
# Q19: disjunctive brand/size/quantity revenue
# ---------------------------------------------------------------------------


def disjunctive_brand_revenue(lineitem_ds, part_ds,
                              clauses: list[tuple[str, int, float, float]] | None = None,
                              max_broadcast_dim_rows: int | None = None):
    """TPC-H Q19: revenue under an OR of (brand, max size, qty band)
    clauses — the disjunctive-predicate-pushdown shape. Under the dim
    gate, part attrs broadcast once as parallel arrays and the whole
    predicate evaluates vectorized per batch (ONE int crosses the
    cluster); past it, the qty-band-prefiltered lines hash-join the
    clause-qualifying part rows natively."""
    from ray.data.aggregate import Sum

    if max_broadcast_dim_rows is None:
        max_broadcast_dim_rows = MAX_BROADCAST_DIM_ROWS
    if clauses is None:
        clauses = [("Brand#13", 10, 1.0, 3.0),
                   ("Brand#19", 15, 2.0, 5.0),
                   ("Brand#8", 20, 4.0, 8.0)]
    li = lineitem_ds.select_columns(
        ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]
    )

    if part_ds.count() <= max_broadcast_dim_rows:
        part = part_ds.select_columns(["p_partkey", "p_brand", "p_size"]) \
            .to_pandas().sort_values("p_partkey")
        pk = part["p_partkey"].to_numpy(dtype=np.int64)
        brand = part["p_brand"].to_numpy()
        size = part["p_size"].to_numpy(dtype=np.int64)
        import ray
        ref = ray.put((pk, brand, size))

        def partial(t: pa.Table) -> pa.Table:
            keys, br, sz = ray.get(ref)
            lp = _np(t["l_partkey"])
            qty = t["l_quantity"].to_numpy(zero_copy_only=False)
            hit, pos = _lookup_i64(keys, lp)
            pos = np.minimum(pos, max(len(keys) - 1, 0))
            m = np.zeros(len(lp), dtype=bool)
            for b, smax, qlo, qhi in clauses:
                m |= (hit & (br[pos] == b) & (sz[pos] >= 1) & (sz[pos] <= smax)
                      & (qty >= qlo) & (qty <= qhi))
            rev = _np(_rev_cc(t))
            return pa.table({"p": pa.array([int(rev[m].sum())], pa.int64())})

        partials = li.map_batches(partial, batch_format="pyarrow")
    else:
        from .joins import default_join_partitions

        def dim_rows(t: pa.Table) -> pa.Table:
            br = t["p_brand"].to_numpy(zero_copy_only=False)
            sz = _np(t["p_size"])
            keep = np.zeros(t.num_rows, dtype=bool)
            for b, smax, _, _ in clauses:
                keep |= (br == b) & (sz >= 1) & (sz <= smax)
            t = t.filter(pa.array(keep))
            return pa.table({
                "l_partkey": pc.cast(t["p_partkey"], pa.int64()),
                "p_brand": t["p_brand"],
                "p_size": pc.cast(t["p_size"], pa.int64()),
            })

        dim = part_ds.select_columns(
            ["p_partkey", "p_brand", "p_size"]
        ).map_batches(dim_rows, batch_format="pyarrow")
        joined = li.join(
            dim, join_type="inner",
            num_partitions=default_join_partitions(), on=("l_partkey",),
        )

        def post(t: pa.Table) -> pa.Table:
            br = t["p_brand"].to_numpy(zero_copy_only=False)
            sz = _np(t["p_size"])
            qty = t["l_quantity"].to_numpy(zero_copy_only=False)
            m = np.zeros(t.num_rows, dtype=bool)
            for b, smax, qlo, qhi in clauses:
                m |= ((br == b) & (sz >= 1) & (sz <= smax)
                      & (qty >= qlo) & (qty <= qhi))
            rev = _np(_rev_cc(t))
            return pa.table({"p": pa.array([int(rev[m].sum())], pa.int64())})

        partials = joined.map_batches(post, batch_format="pyarrow")

    agg = partials.aggregate(Sum("p", alias_name="rev_cc"))
    return pd.DataFrame({"rev_cc": [int(agg["rev_cc"] or 0)]})


# ---------------------------------------------------------------------------
# Q20 adapted: dominant suppliers per part
# ---------------------------------------------------------------------------


def dominant_part_suppliers(lineitem_ds, supplier_ds):
    """TPC-H Q20 shape (quantity share standing in for excess stock):
    suppliers who shipped more than 2x a part's mean per-supplier
    quantity, counted per supplier. Two bounded exchanges: packed
    (part,supp) bucketed sums, then a part-keyed bucket pass whose
    body computes each part's total/supplier-count vectorized."""
    from ray.data.aggregate import Count

    from .relagg import bucketed_group_sums

    def prep(t: pa.Table) -> pa.Table:
        key = pc.add(
            pc.multiply(pc.cast(t["l_partkey"], pa.int64()),
                        pa.scalar(1 << _PAIR_BITS, pa.int64())),
            pc.cast(t["l_suppkey"], pa.int64()),
        )
        return pa.table({"pk": key, "qty": pc.cast(t["l_quantity"], pa.int64())})

    pairs = bucketed_group_sums(
        lineitem_ds.select_columns(["l_partkey", "l_suppkey", "l_quantity"])
        .map_batches(prep, batch_format="pyarrow"),
        key_col="pk",
        sum_cols=["qty"],
    )

    def unpack(t: pa.Table) -> pa.Table:
        k = _np(t["pk"])
        return pa.table({
            "l_partkey": pa.array(k >> _PAIR_BITS, pa.int64()),
            "l_suppkey": pa.array(k & ((1 << _PAIR_BITS) - 1), pa.int64()),
            "qty": t["qty"],
        })

    def body(g: pd.DataFrame) -> pd.DataFrame:
        p = g["l_partkey"].to_numpy()
        order = np.argsort(p, kind="stable")
        g = g.iloc[order]
        p = g["l_partkey"].to_numpy()
        q = g["qty"].to_numpy()
        new = np.concatenate(([True], p[1:] != p[:-1])) if len(p) else \
            np.zeros(0, dtype=bool)
        rid = np.cumsum(new) - 1
        ngrp = int(rid[-1]) + 1 if len(rid) else 0
        tq = np.zeros(ngrp, dtype=np.int64)
        ns = np.zeros(ngrp, dtype=np.int64)
        np.add.at(tq, rid, q)
        np.add.at(ns, rid, 1)
        keep = q * ns[rid] > 2 * tq[rid]
        return g.loc[keep, ["l_suppkey"]]

    winners = _bucket_apply(
        pairs.map_batches(unpack, batch_format="pyarrow"),
        key_col="l_partkey", body=body,
    )
    counts = winners.groupby("l_suppkey").aggregate(
        Count(alias_name="n_parts_dominated")
    ).to_pandas()
    names = _gather_dim_filtered(
        supplier_ds, "s_suppkey",
        counts["l_suppkey"].to_numpy(dtype=np.int64), ["s_suppkey", "s_name"],
    )
    out = counts.merge(names, left_on="l_suppkey", right_on="s_suppkey")
    return out.sort_values("s_suppkey").reset_index(drop=True)[
        ["s_suppkey", "s_name", "n_parts_dominated"]
    ]


# ---------------------------------------------------------------------------
# Q21 adapted: sole-return suppliers on multi-supplier orders
# ---------------------------------------------------------------------------


def waiting_order_suppliers(lineitem_ds, supplier_ds):
    """TPC-H Q21 shape (returnflag standing in for the late-delivery
    predicate): on orders touching >1 supplier where EXACTLY ONE
    supplier has a returned line, blame that supplier — the
    multi-EXISTS/NOT-EXISTS composition, done as two bounded bucket
    exchanges over packed keys instead of four self-joins."""
    from ray.data.aggregate import Count

    from .relagg import bucketed_group_sums

    def prep(t: pa.Table) -> pa.Table:
        key = pc.add(
            pc.multiply(pc.cast(t["l_orderkey"], pa.int64()),
                        pa.scalar(1 << _PAIR_BITS, pa.int64())),
            pc.cast(t["l_suppkey"], pa.int64()),
        )
        r = pc.cast(pc.equal(t["l_returnflag"], pa.scalar("R")), pa.int64())
        return pa.table({"pk": key, "r": r})

    # per (order, supplier): r > 0  <=>  has a returned line
    pairs = bucketed_group_sums(
        lineitem_ds.select_columns(["l_orderkey", "l_suppkey", "l_returnflag"])
        .map_batches(prep, batch_format="pyarrow"),
        key_col="pk",
        sum_cols=["r"],
    )

    def unpack(t: pa.Table) -> pa.Table:
        k = _np(t["pk"])
        return pa.table({
            "l_orderkey": pa.array(k >> _PAIR_BITS, pa.int64()),
            "l_suppkey": pa.array(k & ((1 << _PAIR_BITS) - 1), pa.int64()),
            "has_r": pc.cast(pc.greater(t["r"], pa.scalar(0, pa.int64())),
                             pa.int64()),
        })

    def body(g: pd.DataFrame) -> pd.DataFrame:
        o = g["l_orderkey"].to_numpy()
        order = np.argsort(o, kind="stable")
        g = g.iloc[order]
        o = g["l_orderkey"].to_numpy()
        hr = g["has_r"].to_numpy()
        new = np.concatenate(([True], o[1:] != o[:-1])) if len(o) else \
            np.zeros(0, dtype=bool)
        rid = np.cumsum(new) - 1
        ngrp = int(rid[-1]) + 1 if len(rid) else 0
        nsupp = np.zeros(ngrp, dtype=np.int64)
        nr = np.zeros(ngrp, dtype=np.int64)
        np.add.at(nsupp, rid, 1)
        np.add.at(nr, rid, hr)
        keep = (nsupp[rid] > 1) & (nr[rid] == 1) & (hr == 1)
        return g.loc[keep, ["l_suppkey"]]

    blamed = _bucket_apply(pairs.map_batches(unpack, batch_format="pyarrow"),
                           key_col="l_orderkey", body=body)
    counts = blamed.groupby("l_suppkey").aggregate(
        Count(alias_name="numwait")
    ).to_pandas()
    names = _gather_dim_filtered(
        supplier_ds, "s_suppkey",
        counts["l_suppkey"].to_numpy(dtype=np.int64), ["s_suppkey", "s_name"],
    )
    out = counts.merge(names, left_on="l_suppkey", right_on="s_suppkey")
    return out.sort_values(["numwait", "s_suppkey"],
                           ascending=[False, True]).reset_index(drop=True)[
        ["s_suppkey", "s_name", "numwait"]
    ]


# ---------------------------------------------------------------------------
# Q10: returned-item revenue per customer (top-k)
# ---------------------------------------------------------------------------


def returned_item_customers(lineitem_ds, orders_ds, customer_ds, nation_ds,
                            lo: str = "1997-10-01", hi: str = "1998-01-01",
                            k: int = 20, num_partitions: int | None = None):
    """TPC-H Q10: top-k customers by revenue lost to returned lines on
    one quarter's orders. Returned-line revenue pre-aggregates per
    order; one native join against the date-filtered orders; per-
    customer bucketed sums; per-batch top-k pre-prune; the k winners'
    names resolve by broadcast filter."""
    import ray

    from .joins import default_join_partitions
    from .relagg import bucketed_group_sums

    if num_partitions is None:
        num_partitions = default_join_partitions()
    lo_, hi_ = _ts(lo), _ts(hi)

    def li_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], pa.scalar("R")))
        return pa.table({"l_orderkey": t["l_orderkey"], "rev_cc": _rev_cc(t)})

    per_order = bucketed_group_sums(
        lineitem_ds.select_columns(
            ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"]
        ).map_batches(li_prep, batch_format="pyarrow"),
        key_col="l_orderkey",
        sum_cols=["rev_cc"],
    )

    def o_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["o_orderdate"], pa.scalar(lo_)),
                             pc.less(t["o_orderdate"], pa.scalar(hi_))))
        return t.select(["o_orderkey", "o_custkey"])

    joined = per_order.join(
        orders_ds.select_columns(["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(o_prep, batch_format="pyarrow"),
        join_type="inner", num_partitions=num_partitions,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    per_cust = bucketed_group_sums(
        joined.map_batches(
            lambda t: pa.table({"c_custkey": t["o_custkey"],
                                "rev_cc": t["rev_cc"]}),
            batch_format="pyarrow",
        ),
        key_col="c_custkey",
        sum_cols=["rev_cc"],
    )

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["rev_cc", "c_custkey"],
                              ascending=[False, True]).head(k)

    cand = per_cust.map_batches(prune, batch_format="pandas").to_pandas()
    top = cand.sort_values(["rev_cc", "c_custkey"],
                           ascending=[False, True]).head(k)
    ckeys = np.sort(top["c_custkey"].to_numpy(dtype=np.int64))
    cref = ray.put(ckeys)

    def c_probe(t: pa.Table) -> pa.Table:
        keys = ray.get(cref)
        hit, _ = _lookup_i64(keys, _np(t["c_custkey"]))
        return t.filter(pa.array(hit)).select(
            ["c_custkey", "c_name", "c_nationkey"])

    cust = customer_ds.select_columns(["c_custkey", "c_name", "c_nationkey"]) \
        .map_batches(c_probe, batch_format="pyarrow").to_pandas()
    nat = {int(r["n_nationkey"]): r["n_name"] for r in nation_ds.take_all()}
    out = top.merge(cust, on="c_custkey")
    out["n_name"] = out["c_nationkey"].map(nat)
    out = out.sort_values(["rev_cc", "c_custkey"],
                          ascending=[False, True]).reset_index(drop=True)
    return out[["c_custkey", "c_name", "n_name", "rev_cc"]]


# ---------------------------------------------------------------------------
# Q2 adapted: min-unit-cost supplier per part
# ---------------------------------------------------------------------------


def min_cost_supplier_per_part(lineitem_ds, part_ds, supplier_ds,
                               size: int = 10,
                               max_broadcast_dim_rows: int | None = None):
    """TPC-H Q2 shape: per part (of one size), the supplier with the
    lowest unit price, smallest suppkey on ties. Unit price compares
    EXACTLY as ``ep_cents * 840 / qty`` (840 = lcm(1..8) so the int
    division is always exact). Argmin is associative: each block
    pre-reduces to one candidate per part before the bucket exchange.
    Under the dim gate the size-filtered part keys broadcast; past it
    they semi-join the fact. Names (part AND supplier) always attach
    by result-bounded filtered gathers, never whole-dim pulls.
    """
    if max_broadcast_dim_rows is None:
        max_broadcast_dim_rows = MAX_BROADCAST_DIM_ROWS
    li = lineitem_ds.select_columns(
        ["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"]
    )

    def argmin_cols(t: pa.Table, hit=None) -> pa.Table:
        lp = _np(t["l_partkey"])
        ls = _np(t["l_suppkey"])
        ep = _np(_cents(t["l_extendedprice"]))
        qty = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        if hit is not None:
            lp, ls, ep, qty = lp[hit], ls[hit], ep[hit], qty[hit]
        unit = ep * 840 // qty
        order = np.lexsort((ls, unit, lp))
        lp, ls, unit = lp[order], ls[order], unit[order]
        first = np.concatenate(([True], lp[1:] != lp[:-1])) if len(lp) else \
            np.zeros(0, dtype=bool)
        return pa.table({
            "l_partkey": pa.array(lp[first], pa.int64()),
            "s_suppkey": pa.array(ls[first], pa.int64()),
            "unit_scaled": pa.array(unit[first], pa.int64()),
        })

    if part_ds.count() <= max_broadcast_dim_rows:
        import ray

        keep = (
            part_ds.select_columns(["p_partkey", "p_size"])
            .filter(expr=f"p_size == {int(size)}")
            .to_pandas()
        )
        pk = np.sort(keep["p_partkey"].to_numpy(dtype=np.int64))
        ref = ray.put(pk)

        def local_argmin(t: pa.Table) -> pa.Table:
            hit, _ = _lookup_i64(ray.get(ref), _np(t["l_partkey"]))
            return argmin_cols(t, hit)

        reduced = li.map_batches(local_argmin, batch_format="pyarrow")
    else:
        from .joins import semi_join

        kp_ds = part_ds.select_columns(["p_partkey", "p_size"]).map_batches(
            lambda t: pa.table({
                "l_partkey": pc.cast(
                    t.filter(pc.equal(t["p_size"],
                                      pa.scalar(size, t["p_size"].type)))
                    ["p_partkey"], pa.int64()),
            }),
            batch_format="pyarrow",
        )
        li_f = semi_join(li, kp_ds, on="l_partkey").materialize()
        reduced = li_f.map_batches(
            lambda t: argmin_cols(t), batch_format="pyarrow"
        )

    def body(g: pd.DataFrame) -> pd.DataFrame:
        lp = g["l_partkey"].to_numpy()
        order = np.lexsort((g["s_suppkey"].to_numpy(),
                            g["unit_scaled"].to_numpy(), lp))
        g = g.iloc[order]
        lp = g["l_partkey"].to_numpy()
        first = np.concatenate(([True], lp[1:] != lp[:-1])) if len(lp) else \
            np.zeros(0, dtype=bool)
        return g.loc[first]

    best = _bucket_apply(reduced, key_col="l_partkey", body=body).to_pandas()
    if len(best) == 0:
        return pd.DataFrame(columns=["l_partkey", "p_name", "s_suppkey",
                                     "s_name", "unit_scaled"])
    names = _gather_dim_filtered(
        supplier_ds, "s_suppkey",
        best["s_suppkey"].to_numpy(dtype=np.int64), ["s_suppkey", "s_name"],
    )
    pnames = _gather_dim_filtered(
        part_ds, "p_partkey",
        best["l_partkey"].to_numpy(dtype=np.int64), ["p_partkey", "p_name"],
    )
    pname = dict(zip(pnames["p_partkey"], pnames["p_name"]))
    out = best.merge(names, on="s_suppkey")
    out["p_name"] = out["l_partkey"].map(pname)
    out = out.sort_values("l_partkey").reset_index(drop=True)
    return out[["l_partkey", "p_name", "s_suppkey", "s_name", "unit_scaled"]]


# ---------------------------------------------------------------------------
# Q4: order-priority checking (EXISTS late-line semi-join)
# ---------------------------------------------------------------------------


def late_order_priority_counts(lineitem_ds, orders_ds,
                               lo: str = "1997-07-01", hi: str = "1997-10-01",
                               late_days: int = 30,
                               num_partitions: int | None = None):
    """TPC-H Q4 shape (no commit/receipt dates in the reduced schema,
    so "late" = any line shipped more than ``late_days`` after the
    order date): count one quarter's orders per priority where EXISTS
    a late lineitem. The EXISTS collapses to per-order MAX(l_shipdate)
    — one bucketed max-combine exchange over lineitem (never ships
    line-level rows into the join), ONE native hash join against the
    date-filtered orders, then a tiny priority groupby."""
    from ray.data.aggregate import Count

    from .joins import default_join_partitions
    from .relagg import bucketed_group_maxes

    if num_partitions is None:
        num_partitions = default_join_partitions()
    lo_ts, hi_ts = _ts(lo), _ts(hi)

    def li_prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "ship_us": pc.cast(t["l_shipdate"], pa.int64()),
        })

    per_order = bucketed_group_maxes(
        lineitem_ds.select_columns(["l_orderkey", "l_shipdate"])
        .map_batches(li_prep, batch_format="pyarrow"),
        key_col="l_orderkey",
        max_cols=["ship_us"],
    )

    def o_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo_ts)),
            pc.less(t["o_orderdate"], pa.scalar(hi_ts)),
        ))
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "od_us": pc.cast(t["o_orderdate"], pa.int64()),
            "o_orderpriority": t["o_orderpriority"],
        })

    ords = orders_ds.select_columns(
        ["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(o_prep, batch_format="pyarrow")

    joined = ords.join(
        per_order, join_type="inner", num_partitions=num_partitions,
        on=("o_orderkey",), right_on=("l_orderkey",),
    )
    late_us = np.int64(late_days) * np.int64(86_400_000_000)

    def late_filter(t: pa.Table) -> pa.Table:
        keep = pc.greater(t["ship_us"],
                          pc.add(t["od_us"], pa.scalar(late_us, pa.int64())))
        return t.filter(keep).select(["o_orderpriority"])

    out = (
        joined.map_batches(late_filter, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Count(alias_name="order_count"))
        .to_pandas()
    )
    return out.sort_values("o_orderpriority").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q5: local-supplier volume (customer and supplier in the same nation)
# ---------------------------------------------------------------------------


def local_supplier_volume(lineitem_ds, orders_ds, customer_ds, supplier_ds,
                          nation_ds, region_ds, region: str = "EUROPE",
                          lo: str = "1997-01-01", hi: str = "1998-01-01",
                          num_partitions: int | None = None):
    """TPC-H Q5 shape: revenue per nation from lines where the customer
    and the supplier share the nation, customers in ``region``, one
    order-year. Supplier nation resolves by broadcast and PRE-FILTERS
    lineitem to the region's nations before any shuffle; the two big
    joins (⋈orders date-filtered, ⋈customer) run in separate
    executions per the chained-join rule; the final groupby is
    |nations|-sized."""
    from ray.data.aggregate import Sum

    from .joins import default_join_partitions

    if num_partitions is None:
        num_partitions = default_join_partitions()
    lo_ts, hi_ts = _ts(lo), _ts(hi)
    sk, snat, _, nat = _supplier_maps(supplier_ds, nation_ds)
    region_keys = {
        int(r["r_regionkey"]) for r in region_ds.take_all()
        if r["r_name"] == region
    }
    name_of = {k: v[0] for k, v in nat.items()}
    keep_keys = np.fromiter(
        (k for k, v in nat.items() if v[1] in region_keys),
        dtype=np.int64,
    )
    import ray
    ref = ray.put((sk, snat))

    def li_prep(t: pa.Table) -> pa.Table:
        keys, nk = ray.get(ref)
        ls = _np(t["l_suppkey"])
        hit, pos = _lookup_i64(keys, ls)
        snk = np.where(hit, nk[np.minimum(pos, max(len(nk) - 1, 0))], -1)
        keep = np.isin(snk, keep_keys)
        t2 = t.filter(pa.array(keep))
        return pa.table({
            "l_orderkey": t2["l_orderkey"],
            "supp_nk": pa.array(snk[keep], pa.int64()),
            "rev_cc": _rev_cc(t2),
        })

    li = lineitem_ds.select_columns(
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(li_prep, batch_format="pyarrow")

    def o_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo_ts)),
            pc.less(t["o_orderdate"], pa.scalar(hi_ts)),
        ))
        return t.select(["o_orderkey", "o_custkey"])

    ords = orders_ds.select_columns(
        ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(o_prep, batch_format="pyarrow")

    j1 = li.join(
        ords, join_type="inner", num_partitions=num_partitions,
        on=("l_orderkey",), right_on=("o_orderkey",),
    ).materialize()

    j2 = j1.join(
        customer_ds.select_columns(["c_custkey", "c_nationkey"]),
        join_type="inner", num_partitions=num_partitions,
        on=("o_custkey",), right_on=("c_custkey",),
    )

    def local_filter(t: pa.Table) -> pa.Table:
        keep = pc.equal(pc.cast(t["c_nationkey"], pa.int64()), t["supp_nk"])
        t = t.filter(keep)
        return t.select(["supp_nk", "rev_cc"])

    agg = (
        j2.map_batches(local_filter, batch_format="pyarrow")
        .groupby("supp_nk")
        .aggregate(Sum("rev_cc", alias_name="rev_cc"))
        .to_pandas()
    )
    agg["n_name"] = [name_of[int(k)] for k in agg["supp_nk"]]
    out = agg[["n_name", "rev_cc"]].sort_values(
        ["rev_cc", "n_name"], ascending=[False, True]
    ).reset_index(drop=True)
    return out


# ---------------------------------------------------------------------------
# Q13: customer order-count distribution (LEFT OUTER count-of-counts)
# ---------------------------------------------------------------------------


def customer_order_distribution(orders_ds, customer_ds,
                                exclude_priority: str = "1-URGENT",
                                num_partitions: int | None = None):
    """TPC-H Q13 shape (``o_orderpriority <> x`` standing in for the
    NOT-LIKE comment filter): how many customers placed exactly N
    qualifying orders, INCLUDING the zero-order customers the LEFT
    OUTER join preserves. Orders pre-aggregate per custkey in one
    bucketed combine (the only corpus-scale exchange over orders),
    customer⋈per-cust is ONE native left-outer hash join, and the
    count-of-counts groupby is |distinct N|-sized."""
    from ray.data.aggregate import Count

    from .joins import default_join_partitions
    from .relagg import bucketed_group_sums

    if num_partitions is None:
        num_partitions = default_join_partitions()

    def o_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["o_orderpriority"],
                                  pa.scalar(exclude_priority)))
        return pa.table({
            "o_custkey": t["o_custkey"],
            "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        })

    per_cust = bucketed_group_sums(
        orders_ds.select_columns(["o_custkey", "o_orderpriority"])
        .map_batches(o_prep, batch_format="pyarrow"),
        key_col="o_custkey",
        sum_cols=["one"],
    )

    joined = customer_ds.select_columns(["c_custkey"]).join(
        per_cust, join_type="left_outer", num_partitions=num_partitions,
        on=("c_custkey",), right_on=("o_custkey",),
    )

    def fill(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_count": pc.cast(pc.fill_null(t["one"], 0), pa.int64()),
        })

    out = (
        joined.map_batches(fill, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Count(alias_name="custdist"))
        .to_pandas()
    )
    return out.sort_values(["custdist", "c_count"],
                           ascending=[False, False]).reset_index(drop=True)
