"""Relational aggregation shapes beyond a single flat groupby:
multi-measure scan aggregates (the TPC-H Q1 / pricing-summary shape)
and ROLLUP/grouping-sets, both built so the only corpus-scale exchange
is ONE fine-level groupby — coarser levels re-aggregate the already
tiny fine result.

Float policy matches the engine-wide rule (windows.py): every summed
measure is fixed-point int64 (floor at the row level, identical IEEE
expression order to the SQL twin) so the distributed Sum is
associative and bit-reproducible.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..engine.rayfix import apply as _apply_rayfix

_apply_rayfix()  # schema-broadcast fix for native hash-shuffle joins

__all__ = [
    "range_rank",
    "set_op_bag",
    "grouped_string_agg",
    "pricing_summary",
    "rollup_counts",
    "fixed_width_histogram",
    "count_of_counts",
    "cube_counts",
    "grouped_corr_stats",
    "group_shares",
    "above_group_avg",
    "pair_cooccurrence",
    "table_profile",
    "bucketed_group_sums",
    "bucketed_group_maxes",
]


def pricing_summary(lineitem_ds, cutoff: str = "1998-09-01"):
    """The classic pricing-summary report (TPC-H Q1 shape) over
    lineitem: per (returnflag, linestatus), row count plus four exact
    fixed-point sums — quantity, base price, discounted price
    ``ep*(1-disc)``, and charge ``ep*(1-disc)*(1+tax)``. One
    vectorized prep stage computes int64 cents per row with the SAME
    left-associated IEEE expression order as the SQL twin (so floor()
    agrees bit-for-bit), then ONE groupby over a handful of groups;
    per-block partial aggregation means only ~|groups| rows per block
    enter the exchange. The date predicate is applied in the prep
    stage (at scale: pushed into the parquet row-group filter).
    """
    from ray.data.aggregate import Count, Sum

    cut = np.datetime64(cutoff, "us")

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(cut)))
        ep = t["l_extendedprice"]
        one_minus_d = pc.subtract(pa.scalar(1.0), t["l_discount"])
        one_plus_t = pc.add(pa.scalar(1.0), t["l_tax"])
        disc_price = pc.multiply(ep, one_minus_d)
        charge = pc.multiply(disc_price, one_plus_t)

        def cents(arr):
            return pc.cast(pc.floor(pc.multiply(arr, pa.scalar(100.0))), pa.int64())

        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty_cents": cents(t["l_quantity"]),
                "base_cents": cents(ep),
                "disc_cents": cents(disc_price),
                "charge_cents": cents(charge),
            }
        )

    return (
        lineitem_ds.select_columns(
            [
                "l_returnflag",
                "l_linestatus",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
                "l_tax",
                "l_shipdate",
            ]
        )
        .map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Count(alias_name="n_rows"),
            Sum("qty_cents", alias_name="sum_qty_cents"),
            Sum("base_cents", alias_name="sum_base_cents"),
            Sum("disc_cents", alias_name="sum_disc_cents"),
            Sum("charge_cents", alias_name="sum_charge_cents"),
        )
    )


def rollup_counts(ds, keys: list[str]):
    """Counts at every ROLLUP level of ``keys`` (SQL ``GROUP BY
    ROLLUP(k1, k2, ...)``): the full key tuple, each prefix, and the
    grand total, with rolled-up columns NULL. The corpus only moves
    once — the fine-level groupby; every coarser level is a
    re-aggregation of that already small result (|distinct combos|
    rows), and the grand total is a driver-side scalar fold of the
    same small table. Key columns must be strings (nullable string is
    the rolled-up-slot type).
    """
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    # materialize: the fine result is |distinct combos| rows (tiny by
    # construction), and every coarser level re-reads it — without this
    # Ray re-executes the corpus-scale groupby once per level
    fine = (
        ds.select_columns(keys)
        .groupby(keys)
        .aggregate(Count(alias_name="n"))
        .materialize()
    )

    def with_nulls(level: int):
        # pad keys[level:] with NULL so every level shares one schema
        def pad(t: pa.Table) -> pa.Table:
            cols = {k: t[k] for k in keys[:level]}
            for k in keys[level:]:
                cols[k] = pa.nulls(t.num_rows, pa.string())
            cols["n"] = t["n"]
            return pa.table(cols)

        return pad

    levels = [fine.map_batches(with_nulls(len(keys)), batch_format="pyarrow")]
    for i in range(len(keys) - 1, 0, -1):
        lvl = (
            fine.groupby(keys[:i])
            .aggregate(Sum("n", alias_name="n"))
            .map_batches(with_nulls(i), batch_format="pyarrow")
        )
        levels.append(lvl)

    agg = fine.aggregate(Sum("n", alias_name="n"))
    total = int(agg["n"]) if agg and agg.get("n") is not None else 0
    grand = rd.from_arrow(
        pa.table(
            {**{k: pa.nulls(1, pa.string()) for k in keys},
             "n": pa.array([total], pa.int64())}
        )
    )
    levels.append(grand)

    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def global_rank(ds, key_col: str, id_col: str, n_buckets: int = 0):
    """Corpus-wide EXACT row ranking by (key, id) — SQL's
    ``row_number() OVER (ORDER BY key, id) - 1`` — without a global
    sort barrier: the key histogram (one small groupby over DISTINCT
    key values) is broadcast as a cumulative-count table, within-key
    order comes from one groupby(key) with an id-mergesort body, and
    rank = cum_below[key] + within_rank. With ``n_buckets > 0`` an
    NTILE-style bucket column is added (``rank * n_buckets // total``).

    Partitioning assumption (documented per the custom-operator rule):
    the ORDER KEY is low-cardinality (the distinct-key count table must
    broadcast, and one key's rows must fit one task) — the
    length-quantile / score-band shape. A high-cardinality float key
    should go through the exact-quantile range-refinement operator
    instead (webclean.token_length_percentiles) or a range-partitioned
    prefix sum.
    """
    import ray
    from ray.data.aggregate import Count

    hist = (
        ds.select_columns([key_col])
        .groupby(key_col)
        .aggregate(Count(alias_name="c"))
        .to_pandas()
        .sort_values(key_col)
    )
    keys = hist[key_col].to_numpy()
    counts = hist["c"].to_numpy().astype(np.int64)
    cum_below = np.concatenate(([0], np.cumsum(counts)[:-1]))
    total = int(counts.sum())
    bcast = ray.put((keys, cum_below))

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        ks, cb = ray.get(bcast)
        g = g.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        base = int(cb[np.searchsorted(ks, g[key_col].iloc[0])])
        g["rank"] = base + np.arange(len(g), dtype=np.int64)
        if n_buckets > 0:
            g["bucket"] = g["rank"].to_numpy() * n_buckets // total
        return g

    return (
        ds.select_columns([key_col, id_col])
        .groupby(key_col)
        .map_groups(per_key, batch_format="pandas")
    )


def range_rank(ds, key_col: str, id_col: str, n_buckets: int = 0,
               npartitions: int = 0):
    """Corpus-wide EXACT row ranking by ``(key, id)`` over a
    HIGH-CARDINALITY key — SQL's ``row_number() OVER (ORDER BY key, id)
    - 1`` — via range partitioning plus a driver-side prefix sum over
    per-range counts (the classic distributed sort-rank; this is the
    high-cardinality path that ``global_rank``'s low-cardinality
    broadcast-CDF contract explicitly excludes).

    1. boundary candidates: each block contributes its local evenly
       spaced key quantiles (33 values, one tiny column scan) — the
       driver merges them into ``npartitions - 1`` range boundaries.
       Boundary quality affects only BALANCE, never correctness;
    2. every row gets ``pid = searchsorted(boundaries, key,
       side='right')`` — ties on a boundary value all land in one
       range, so ranges respect the total order by construction;
    3. per-range counts: ONE tiny groupby (``npartitions`` rows) →
       prefix sum on the driver, broadcast once via ``ray.put``;
    4. ``groupby(pid).map_groups``: mergesort by ``(key, id)``, local
       ``arange`` + the range's offset.

    With ``n_buckets > 0`` an SQL ``NTILE(n_buckets)`` column is added
    (the first ``N % k`` buckets get ``ceil(N / k)`` rows, 1-based —
    exact window-function semantics, unlike ``global_rank``'s
    proportional ``rank * k // N`` bucketing).

    Partitioning assumption: one key RANGE (~N / npartitions rows)
    fits a task; ``npartitions`` defaults to 4 × cluster CPUs so the
    range size shrinks as the cluster grows.
    """
    import ray
    from ray.data.aggregate import Count

    if npartitions <= 0:
        npartitions = 4 * int(ray.cluster_resources().get("CPU", 8))

    def block_candidates(t: pa.Table) -> pa.Table:
        k = np.sort(t[key_col].to_numpy(zero_copy_only=False))
        if len(k) == 0:
            return pa.table({"cand": pa.array([], type=pa.float64())})
        idx = np.linspace(0, len(k) - 1, num=min(33, len(k))).astype(np.int64)
        return pa.table({"cand": pa.array(k[idx].astype(np.float64))})

    cands = np.sort(
        ds.select_columns([key_col])
        .map_batches(block_candidates, batch_format="pyarrow")
        .to_pandas()["cand"]
        .to_numpy()
    )
    if len(cands) == 0:
        return ds.select_columns([key_col, id_col]).map_batches(
            lambda t: t.append_column("rank", pa.array([], type=pa.int64())),
            batch_format="pyarrow",
        )
    bidx = np.linspace(0, len(cands) - 1, num=npartitions + 1)[1:-1]
    boundaries = np.unique(cands[bidx.astype(np.int64)])

    def assign_pid(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.float64)
        pid = np.searchsorted(boundaries, k, side="right").astype(np.int64)
        return pa.table(
            {key_col: t[key_col], id_col: t[id_col], "pid": pa.array(pid)}
        )

    keyed = ds.select_columns([key_col, id_col]).map_batches(
        assign_pid, batch_format="pyarrow"
    )
    counts = (
        keyed.groupby("pid").aggregate(Count(alias_name="c")).to_pandas()
        .sort_values("pid")
    )
    pids = counts["pid"].to_numpy()
    cs = counts["c"].to_numpy().astype(np.int64)
    offsets = np.zeros(int(boundaries.size) + 1, dtype=np.int64)
    np.add.at(offsets, pids, cs)
    total = int(offsets.sum())
    offsets = np.concatenate(([0], np.cumsum(offsets)[:-1]))
    bcast = ray.put(offsets)

    if n_buckets > 0:
        q, rem = divmod(total, n_buckets)
        cut = rem * (q + 1)

    def per_range(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(bcast)
        g = g.sort_values([key_col, id_col], kind="mergesort").reset_index(
            drop=True
        )
        base = int(off[int(g["pid"].iloc[0])])
        rank = base + np.arange(len(g), dtype=np.int64)
        g["rank"] = rank
        if n_buckets > 0:
            r1 = rank + 1  # 1-based row_number for NTILE arithmetic
            if q == 0:
                g["bucket"] = r1
            else:
                g["bucket"] = np.where(
                    r1 <= cut,
                    rank // (q + 1) + 1,
                    rem + (rank - cut) // q + 1,
                ).astype(np.int64)
        return g.drop(columns=["pid"])

    return keyed.groupby("pid").map_groups(per_range, batch_format="pandas")


def set_op_bag(left_ds, right_ds, on: list[str], op: str = "except_all"):
    """Distributed EXCEPT ALL / INTERSECT ALL (BAG semantics — SQL's
    multiset operators, vs :func:`set_op_distinct`'s set semantics):
    result multiplicity per key is max(0, l - r) for ``except_all`` and
    min(l, r) for ``intersect_all``. Returned as (key..., n) rows with
    n >= 1 — the compact encoding of the duplicated-row multiset.

    Same exchange shape as the distinct variant, carrying COUNTS:
    each side pre-counts its keys per batch (pyarrow group_by), one
    groupby over the tagged union sums per-side multiplicities, and a
    vectorized finisher computes the bag arithmetic. Payloads never
    shuffle — key columns and two int64 partial counts only."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    if op not in ("except_all", "intersect_all"):
        raise ValueError(f"unknown bag op: {op!r}")

    def tag(side: str):
        other = "_r" if side == "_l" else "_l"

        def fn(t: pa.Table) -> pa.Table:
            d = t.select(on).group_by(on).aggregate([([], "count_all")])
            d = d.rename_columns(on + [side])
            return d.append_column(
                other, pa.array(np.zeros(d.num_rows, dtype=np.int64))
            )

        return fn

    tagged = left_ds.map_batches(tag("_l"), batch_format="pyarrow").union(
        right_ds.map_batches(tag("_r"), batch_format="pyarrow")
    )
    agg = tagged.groupby(on).aggregate(
        Sum("_l", alias_name="_l"), Sum("_r", alias_name="_r")
    )

    def finish(t: pa.Table) -> pa.Table:
        left = t["_l"].to_numpy(zero_copy_only=False)
        right = t["_r"].to_numpy(zero_copy_only=False)
        n = (
            np.maximum(0, left - right)
            if op == "except_all"
            else np.minimum(left, right)
        )
        keep = n > 0
        out = t.select(on).append_column("n", pa.array(n, pa.int64()))
        return out if bool(keep.all()) else out.filter(pa.array(keep))

    return agg.map_batches(finish, batch_format="pyarrow")


def grouped_string_agg(ds, by: str, val_col: str, order_cols: list[str],
                       sep: str = ">"):
    """Ordered per-group string aggregation (SQL's
    ``string_agg(val, sep ORDER BY ...)``): one groupby(by).map_groups
    with an in-group vectorized sort — the sequence-building shape
    (user event journeys, per-doc span assembly). Only the key, order
    and value columns shuffle. Returns (by, seq)."""
    import pandas as pd

    def build(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="mergesort")
        return pd.DataFrame(
            {by: [g[by].iloc[0]], "seq": [sep.join(g[val_col].astype(str))]}
        )

    return (
        ds.select_columns([by, val_col] + order_cols)
        .groupby(by)
        .map_groups(build, batch_format="pandas")
    )


def set_op_distinct(left_ds, right_ds, on: list[str], op: str = "intersect"):
    """Distributed INTERSECT / EXCEPT (distinct set semantics) over the
    key columns ``on``: each side first collapses to its DISTINCT keys
    per batch (local pre-dedup — pyarrow group_by — so the exchange
    carries at most one row per (key, block, side)), a side flag tags
    the rows, ONE groupby over the tagged union aggregates per-side
    presence, and a vectorized filter keeps keys present in both sides
    (``intersect``) or in the left only (``except``). Payloads never
    shuffle — only the key columns and two int8 flags.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Max

    if op not in ("intersect", "except"):
        raise ValueError(f"unknown set op: {op!r}")

    def tag(in_l: int, in_r: int):
        def fn(t: pa.Table) -> pa.Table:
            d = t.select(on).group_by(on).aggregate([])
            n = d.num_rows
            return d.append_column(
                "_l", pa.array(np.full(n, in_l, dtype=np.int8))
            ).append_column("_r", pa.array(np.full(n, in_r, dtype=np.int8)))

        return fn

    both = left_ds.select_columns(on).map_batches(
        tag(1, 0), batch_format="pyarrow"
    ).union(
        right_ds.select_columns(on).map_batches(tag(0, 1), batch_format="pyarrow")
    )
    agg = both.groupby(on).aggregate(
        Max("_l", alias_name="_l"), Max("_r", alias_name="_r")
    )

    def keep(t: pa.Table) -> pa.Table:
        if op == "intersect":
            mask = pc.and_(pc.equal(t["_l"], 1), pc.equal(t["_r"], 1))
        else:
            mask = pc.and_(pc.equal(t["_l"], 1), pc.equal(t["_r"], 0))
        return t.filter(mask).drop_columns(["_l", "_r"])

    return agg.map_batches(keep, batch_format="pyarrow")

def fixed_width_histogram(ds, col: str, width: float):
    """Fixed-width histogram of a numeric column: bucket =
    ``floor(col / width)`` as int64. The bucketing is one vectorized
    pyarrow stage; per-block partial counts mean the ONE exchange moves
    <= |buckets| rows per block (a histogram's bucket count is tiny by
    construction, so the shuffle is metadata-sized no matter the corpus).
    Exact integer buckets + int64 counts => hash-stable vs the SQL twin.
    """
    from ray.data.aggregate import Sum

    w = float(width)

    def partial(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.floor(pc.divide(t[col], pa.scalar(w))), pa.int64())
        g = pa.table({"bucket": b}).group_by(["bucket"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "bucket": g["bucket"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    return (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
    )


def count_of_counts(ds, key_col: str, out_key: str = "n_events",
                    out_count: str = "n_keys"):
    """Aggregation-of-aggregation (the activity-histogram shape):
    per-key row counts, then how many keys share each count. The first
    groupby is the only corpus-scale exchange (per-block combiners make
    it |keys|-bounded); the second operates on one small row per key and
    is itself pre-reduced per block before its (tiny) exchange.
    """
    from ray.data.aggregate import Count, Sum

    per_key = (
        ds.select_columns([key_col])
        .groupby(key_col)
        .aggregate(Count(alias_name=out_key))
    )

    def partial(t: pa.Table) -> pa.Table:
        g = (
            t.select([out_key])
            .group_by([out_key])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                out_key: pc.cast(g[out_key], pa.int64()),
                out_count: pc.cast(g["count_all"], pa.int64()),
            }
        )

    return (
        per_key.map_batches(partial, batch_format="pyarrow")
        .groupby(out_key)
        .aggregate(Sum(out_count, alias_name=out_count))
    )


def cube_counts(ds, keys: list[str]):
    """Counts at every CUBE level of ``keys`` (SQL ``GROUP BY
    CUBE(k1, ...)``): all 2^len(keys) grouping sets, rolled-up slots
    NULL. Same one-exchange shape as rollup_counts (relagg.py:88): the
    corpus moves once in the fine-level groupby; every other grouping
    set re-aggregates that already tiny result, and the grand total is
    a driver-side scalar fold. Key columns must be strings.
    """
    from itertools import combinations

    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    # materialized for the same reason as rollup_counts: 2^k grouping
    # sets each re-read the tiny fine table; the corpus shuffles ONCE
    fine = (
        ds.select_columns(keys)
        .groupby(keys)
        .aggregate(Count(alias_name="n"))
        .materialize()
    )

    def with_nulls(kept: tuple[str, ...]):
        def pad(t: pa.Table) -> pa.Table:
            cols = {
                k: (t[k] if k in kept else pa.nulls(t.num_rows, pa.string()))
                for k in keys
            }
            cols["n"] = t["n"]
            return pa.table(cols)

        return pad

    levels = [fine.map_batches(with_nulls(tuple(keys)), batch_format="pyarrow")]
    for r in range(len(keys) - 1, 0, -1):
        for kept in combinations(keys, r):
            lvl = (
                fine.groupby(list(kept))
                .aggregate(Sum("n", alias_name="n"))
                .map_batches(with_nulls(kept), batch_format="pyarrow")
            )
            levels.append(lvl)

    agg = fine.aggregate(Sum("n", alias_name="n"))
    total = int(agg["n"]) if agg and agg.get("n") is not None else 0
    grand = rd.from_arrow(
        pa.table(
            {**{k: pa.nulls(1, pa.string()) for k in keys},
             "n": pa.array([total], pa.int64())}
        )
    )
    levels.append(grand)

    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def grouped_corr_stats(ds, key: str, xcol: str, ycol: str):
    """Per-group sufficient statistics for covariance/correlation —
    n, sum(x), sum(y), sum(x*x), sum(y*y), sum(x*y) — with x and y
    floored to int64 at the row level so every distributed Sum is
    associative and bit-reproducible (the engine-wide fixed-point
    policy; the caller derives corr from the stats). One vectorized
    prep stage + ONE groupby; per-block combiners bound the exchange at
    |groups| rows per block. Overflow headroom: with |x|,|y| <= ~1e5
    the squared sums hold ~9e8 rows per group in int64 — at larger
    scale split each sum into (hi, lo) int64 pairs or widen the floor
    unit.
    """
    from ray.data.aggregate import Count, Sum

    def prep(t: pa.Table) -> pa.Table:
        x = pc.cast(pc.floor(t[xcol]), pa.int64())
        y = pc.cast(pc.floor(t[ycol]), pa.int64())
        return pa.table(
            {
                key: t[key],
                "sum_x": x,
                "sum_y": y,
                "sum_xx": pc.multiply(x, x),
                "sum_yy": pc.multiply(y, y),
                "sum_xy": pc.multiply(x, y),
            }
        )

    return (
        ds.select_columns([key, xcol, ycol])
        .map_batches(prep, batch_format="pyarrow")
        .groupby(key)
        .aggregate(
            Count(alias_name="n"),
            Sum("sum_x", alias_name="sum_x"),
            Sum("sum_y", alias_name="sum_y"),
            Sum("sum_xx", alias_name="sum_xx"),
            Sum("sum_yy", alias_name="sum_yy"),
            Sum("sum_xy", alias_name="sum_xy"),
        )
    )


def group_shares(ds, key: str):
    """Per-group row counts plus each group's share of the corpus
    (percent-of-total). The share is ONE IEEE division of two exact
    int64s per group — deterministic across runs and block layouts.
    One |groups|-bounded exchange; the total is a metadata-cheap
    driver-side fold of the already tiny result.
    """
    from ray.data.aggregate import Count

    counts = ds.select_columns([key]).groupby(key).aggregate(Count(alias_name="n"))

    def add_share(total: int):
        def fn(t: pa.Table) -> pa.Table:
            share = pc.divide(
                pc.cast(t["n"], pa.float64()), pa.scalar(float(total))
            )
            return pa.table({key: t[key], "n": t["n"], "share": share})

        return fn

    counts = counts.materialize()  # |groups| rows — tiny by definition
    total = sum(r["n"] for r in counts.take_all())
    return counts.map_batches(add_share(total), batch_format="pyarrow")


def above_group_avg(ds, key: str, id_col: str, val_col: str,
                    num_partitions: int | None = None):
    """Rows whose value exceeds their GROUP's average — the correlated
    subquery (``WHERE v > (SELECT AVG(v) ... WHERE key = outer.key)``)
    decorrelated into aggregate + join, with the comparison kept EXACT:
    the average is never materialized as a float; the filter
    cross-multiplies integers (``v_cents * n > sum_cents``), so there
    is no rounding boundary to disagree with the SQL twin.

    Scale shape: the per-key (sum, n) comes from the bucket-vectorized
    sum kernel (the key is high-cardinality — every customer), then
    ONE native hash-shuffle join against the small aggregate and a
    vectorized filter. Returns (id_col, key, v_cents).
    """
    from .joins import default_join_partitions

    if num_partitions is None:
        num_partitions = default_join_partitions()
    import pyarrow.compute as pc

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.multiply(t[val_col], pa.scalar(100.0))), pa.int64()
        )
        return pa.table({key: t[key], id_col: t[id_col], "v_cents": cents})

    rows = ds.select_columns([key, id_col, val_col]).map_batches(
        prep, batch_format="pyarrow"
    )

    def agg_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                key: t[key],
                "_sum": t["v_cents"],
                "_n": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
            }
        )

    agg = bucketed_group_sums(
        rows.map_batches(agg_prep, batch_format="pyarrow"),
        key_col=key,
        sum_cols=["_sum", "_n"],
    )

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns([f"{key}__a", "_sum", "_n"])

    joined = rows.join(
        agg.map_batches(rename, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=num_partitions,
        on=(key,),
        right_on=(f"{key}__a",),
    )

    def keep(t: pa.Table) -> pa.Table:
        mask = pc.greater(
            pc.multiply(t["v_cents"], t["_n"]), t["_sum"]
        )
        return t.filter(mask).select([id_col, key, "v_cents"])

    return joined.map_batches(keep, batch_format="pyarrow")


def pair_cooccurrence(ds, group_col: str, item_col: str,
                      min_count: int = 2, max_items: int = 256,
                      on_oversize: str = "raise"):
    """Market-basket pair co-occurrence (the self-join shape of TPC-H
    Q18-style basket analysis): for every unordered pair of distinct
    items that appear together in the same group, count the number of
    groups containing both. Returns (item_a, item_b, n_groups) with
    item_a < item_b and n_groups >= min_count.

    Shape: TWO low-cardinality bucket exchanges (4x cluster CPUs
    each), never a corpus x corpus self-join and never a
    million-distinct-group aggregate: (1) rows bucket by group hash
    and each bucket emits its groups' C(k,2) pairs via a numpy loop
    over group slices (np.triu_indices — no per-group DataFrames);
    (2) pairs bucket by pair hash and each bucket counts its pairs
    with one lexsort + run-length pass. Pair fan-out is quadratic in
    basket size, so groups larger than ``max_items`` RAISE by default
    (``on_oversize="raise"``, mirroring interval_join's max_span
    contract — a truncated result would silently diverge from any SQL
    oracle); pass ``on_oversize="truncate"`` to instead keep each
    oversized group's smallest ``max_items`` items with a LOGGED
    warning. TPC-H-shaped baskets are <= ~7 items so the cap never
    fires on the testdata.
    """
    if on_oversize not in ("raise", "truncate"):
        raise ValueError(f"on_oversize must be raise|truncate, got {on_oversize!r}")
    import logging

    import ray

    log = logging.getLogger("brinkray.relagg")
    # groups are tiny and numerous (one per order/basket): map_groups
    # per GROUP would pay pandas overhead per basket, so the exchange
    # key is a hash BUCKET (4x cluster CPUs) and the per-bucket body
    # runs a numpy loop over its groups' slices — no per-group
    # DataFrames, one task per bucket.
    n_buckets = 4 * int(ray.cluster_resources().get("CPU", 8))

    def add_bucket(t: pa.Table) -> pa.Table:
        g = t[group_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (g.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        return t.append_column(
            "_b", pa.array((h % np.uint64(n_buckets)).astype(np.int32))
        )

    def emit_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket[group_col].to_numpy()
        it = bucket[item_col].to_numpy()
        # distinct (group, item), items sorted within group
        order = np.lexsort((it, g))
        g, it = g[order], it[order]
        keep = np.concatenate(([True], (g[1:] != g[:-1]) | (it[1:] != it[:-1])))
        g, it = g[keep], it[keep]
        starts = np.concatenate(
            ([0], np.flatnonzero(g[1:] != g[:-1]) + 1, [len(g)])
        )
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for s, e in zip(starts[:-1], starts[1:]):
            k = e - s
            if k < 2:
                continue
            if k > max_items:
                if on_oversize == "raise":
                    raise ValueError(
                        f"pair_cooccurrence: group of {k} items exceeds "
                        f"max_items={max_items}; pair fan-out is C(k,2). "
                        "Raise max_items or pass on_oversize='truncate' "
                        "(truncation diverges from a capless SQL oracle)."
                    )
                log.warning(
                    "pair_cooccurrence: group truncated %d -> %d items",
                    k, max_items,
                )
                k = max_items
            i, j = np.triu_indices(k, k=1)
            out_a.append(it[s + i])
            out_b.append(it[s + j])
        if not out_a:
            a = it[:0]
            b = it[:0]
        else:
            a = np.concatenate(out_a)
            b = np.concatenate(out_b)
        # pair bucket for the COUNT exchange: Ray's sort aggregate
        # degrades badly at millions of distinct groups (measured 141 s
        # for 1.2M two-key groups vs ~2 s bucketed), so pair counting
        # uses the same low-cardinality-bucket shape as pair emission
        pb = (
            (a.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
            ^ (b.view(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F))
        ) >> np.uint64(33)
        return pd.DataFrame(
            {
                "item_a": a,
                "item_b": b,
                "_pb": (pb % np.uint64(n_buckets)).astype(np.int32),
            }
        )

    def count_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        a = g["item_a"].to_numpy()
        b = g["item_b"].to_numpy()
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        new = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
        starts = np.flatnonzero(new)
        counts = np.diff(np.concatenate((starts, [len(a)])))
        keep = counts >= min_count
        return pd.DataFrame(
            {
                "item_a": a[starts][keep],
                "item_b": b[starts][keep],
                "n_groups": counts[keep].astype(np.int64),
            }
        )

    return (
        ds.select_columns([group_col, item_col])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(emit_pairs, batch_format="pandas")
        .groupby("_pb")
        .map_groups(count_in_bucket, batch_format="pandas")
    )


def table_profile(ds, cols: list[str]):
    """Data-profiling operator (the Deequ/dbt-test shape): per column,
    NULL count and exact distinct count. Returns (col, n_nulls,
    n_distinct) sorted by column name.

    Shape: null counts come from ONE streaming pass (a vectorized
    per-batch partial summed by a tiny aggregate); each distinct count
    is its own keys-only groupby exchange — c columns => c exchanges,
    the honest cost of EXACT per-column cardinality (the approximate
    alternative is the HLL sketch operator, sketch.py). Values never
    move with payloads attached: each exchange carries only the one
    column it counts.
    """
    from ray.data.aggregate import Sum

    def null_partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {f"_n_{c}": pa.array(
                [t.column(c).null_count], pa.int64()
            ) for c in cols}
        )

    agg = ds.select_columns(cols).map_batches(
        null_partial, batch_format="pyarrow"
    ).aggregate(*[Sum(f"_n_{c}", alias_name=f"_n_{c}") for c in cols])
    nulls = {c: int(agg[f"_n_{c}"]) for c in cols}

    distinct = {}
    for c in cols:
        # keys-only distinct: groupby(col).count emits one row per value.
        # NULLs are dropped first — Ray's groupby gives NULL its own
        # group, while SQL's COUNT(DISTINCT col) ignores NULLs.
        def drop_nulls(t: pa.Table, col=c) -> pa.Table:
            return t.filter(pc.is_valid(t[col]))

        distinct[c] = (
            ds.select_columns([c])
            .map_batches(drop_nulls, batch_format="pyarrow")
            .groupby(c)
            .count()
            .count()
        )

    out = pa.table(
        {
            "col": pa.array(sorted(cols)),
            "n_nulls": pa.array([nulls[c] for c in sorted(cols)], pa.int64()),
            "n_distinct": pa.array(
                [distinct[c] for c in sorted(cols)], pa.int64()
            ),
        }
    )
    import ray.data as rd

    return rd.from_arrow(out)


def bucketed_group_sums(ds, key_col: str, sum_cols: list[str],
                        n_buckets: int | None = None):
    """Exact int64 per-key sums for HIGH-cardinality integer keys —
    the drop-in replacement for ``groupby(key).aggregate(Sum(...))``
    where the distinct-key count runs to the corpus scale (Ray's
    sort-based aggregate measured 7.3 s for 147k groups where this
    shape costs 0.9 s; 141 s at 1.2M groups).

    Two-level: (1) each block locally combines to one row per (key,
    block) — np.add.at over stable-argsort run ids, the combiner step
    Ray's aggregate would do — and tags a hash bucket; (2) ONE
    low-cardinality groupby(bucket) whose body repeats the same
    vectorized reduction. Integer sums are associative, so the result
    is bit-exact regardless of block order.
    """
    import ray

    if n_buckets is None:
        n_buckets = 4 * int(ray.cluster_resources().get("CPU", 8))

    def _combine(k: np.ndarray, vals: list[np.ndarray]):
        order = np.argsort(k, kind="stable")
        k = k[order]
        new = np.concatenate(([True], k[1:] != k[:-1])) if len(k) else \
            np.zeros(0, dtype=bool)
        rid = np.cumsum(new) - 1
        n_groups = int(rid[-1]) + 1 if len(rid) else 0
        outs = []
        for v in vals:
            acc = np.zeros(n_groups, dtype=np.int64)
            np.add.at(acc, rid, v[order])
            outs.append(acc)
        return k[new], outs

    def local(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = [t[c].to_numpy(zero_copy_only=False).astype(np.int64)
                for c in sum_cols]
        ku, accs = _combine(k, vals)
        h = (ku.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        cols = {key_col: pa.array(ku, pa.int64())}
        for c, acc in zip(sum_cols, accs):
            cols[c] = pa.array(acc, pa.int64())
        cols["_b"] = pa.array((h % np.uint64(n_buckets)).astype(np.int32))
        return pa.table(cols)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        k = g[key_col].to_numpy()
        vals = [g[c].to_numpy() for c in sum_cols]
        ku, accs = _combine(k, vals)
        out = {key_col: ku}
        for c, acc in zip(sum_cols, accs):
            out[c] = acc
        return pd.DataFrame(out)

    return (
        ds.select_columns([key_col, *sum_cols])
        .map_batches(local, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(final, batch_format="pandas")
    )


def bucketed_group_maxes(ds, key_col: str, max_cols: list[str],
                         n_buckets: int | None = None):
    """``bucketed_group_sums``'s MAX sibling: exact int64 per-key
    maxima for HIGH-cardinality integer keys (per-order max shipdate,
    per-host latest capture...). Same two-level shape — per-block
    np.maximum.at combiner over stable-argsort run ids, then ONE
    low-cardinality bucket groupby — max is associative/idempotent, so
    the result is exact regardless of block order or retry replays.
    """
    import ray

    if n_buckets is None:
        n_buckets = 4 * int(ray.cluster_resources().get("CPU", 8))

    _NEG = np.int64(-(1 << 62))

    def _combine(k: np.ndarray, vals: list[np.ndarray]):
        order = np.argsort(k, kind="stable")
        k = k[order]
        new = np.concatenate(([True], k[1:] != k[:-1])) if len(k) else \
            np.zeros(0, dtype=bool)
        rid = np.cumsum(new) - 1
        n_groups = int(rid[-1]) + 1 if len(rid) else 0
        outs = []
        for v in vals:
            acc = np.full(n_groups, _NEG, dtype=np.int64)
            np.maximum.at(acc, rid, v[order])
            outs.append(acc)
        return k[new], outs

    def local(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = [t[c].to_numpy(zero_copy_only=False).astype(np.int64)
                for c in max_cols]
        ku, accs = _combine(k, vals)
        h = (ku.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        cols = {key_col: pa.array(ku, pa.int64())}
        for c, acc in zip(max_cols, accs):
            cols[c] = pa.array(acc, pa.int64())
        cols["_b"] = pa.array((h % np.uint64(n_buckets)).astype(np.int32))
        return pa.table(cols)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        k = g[key_col].to_numpy()
        vals = [g[c].to_numpy() for c in max_cols]
        ku, accs = _combine(k, vals)
        out = {key_col: ku}
        for c, acc in zip(max_cols, accs):
            out[c] = acc
        return pd.DataFrame(out)

    return (
        ds.select_columns([key_col, *max_cols])
        .map_batches(local, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(final, batch_format="pandas")
    )
