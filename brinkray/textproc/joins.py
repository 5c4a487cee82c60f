"""Relational join patterns beyond the crawl's lookup join.

* ``asof_join`` — as-of join (ray guide pattern): both sides hash-
  bucketed by key into one schema-aligned dataset, sorted by time
  within each bucket, ``pd.merge_asof`` per bucket inside map_groups.
  Semantics match DuckDB's ASOF JOIN (greatest right ts <= left ts).
* ``interval_join`` — key-equal range join (all right rows whose
  [lo, hi] interval contains the left timestamp), same hash-bucket
  shuffle shape as ``asof_join``; in-bucket probe is two vectorized
  searchsorteds over the lo-sorted right side, made O(window) per left
  row by the declared ``max_span`` bound on interval length.
* ``cluster_pairs`` — connected components over near-dup pairs via
  iterated min-label propagation (groupby rounds; the label map is
  broadcast per round — candidate graphs are LSH output, bounded).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..engine.rayfix import apply as _apply_rayfix

_apply_rayfix()  # schema-broadcast fix for native hash-shuffle joins

__all__ = [
    "asof_join",
    "hits",
    "interval_join",
    "revenue_by_nation",
    "anti_join",
    "semi_join",
    "pagerank",
    "cluster_pairs",
    "left_outer_totals",
    "full_outer_counts",
    "cross_join_small",
    "enumerate_triangles",
    "bfs_distances",
    "default_join_partitions",
]


def default_join_partitions() -> int:
    """Hash-shuffle join partition default, derived from the cluster:
    each partition costs an aggregator-actor spawn, so a fixed 32
    measured ~2x slower than 8 on a 32-CPU node at sf0.1 (actor spawn
    dominates at conformance scale), while a fixed small number would
    cap parallelism on a big cluster. CPUs/4, floor 2."""
    import ray

    return max(2, int(ray.cluster_resources().get("CPU", 8)) // 4)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized over uint64 (public-domain
    constant mixing; used for Bloom double-hashing)."""
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _bloom_positions(keys: np.ndarray, n_hashes: int, m_bits: int):
    """k double-hashed bit positions per int64 key (Kirsch–Mitzenmacher:
    idx_j = h1 + j*h2 mod m). Yields (word_index, bit_mask) pairs."""
    u = keys.astype(np.int64).view(np.uint64)
    h1 = _mix64(u)
    h2 = _mix64(u ^ np.uint64(0xA5A5A5A5A5A5A5A5)) | np.uint64(1)
    m = np.uint64(m_bits)
    for j in range(n_hashes):
        idx = (h1 + np.uint64(j) * h2) % m
        yield (idx >> np.uint64(6)).astype(np.int64), np.uint64(1) << (idx & np.uint64(63))


def semi_join(left_ds, right_ds, on: str, right_on: str | None = None,
              num_partitions: int | None = None, bloom_bits: int = 0,
              bloom_hashes: int = 4):
    """Left rows WITH a match in ``right_ds`` (SQL EXISTS) — the dual
    of :func:`anti_join`: the right side reduces to its distinct keys
    (one shuffle over keys only, never right payloads), then a native
    hash-shuffle INNER ``Dataset.join`` keeps exactly the matching left
    rows (distinct keys => no fan-out duplication).

    ``bloom_bits > 0`` adds the at-scale shuffle-volume reducer: a
    Bloom bitmap over the right keys is built by a distributed
    ``AggregateFn`` tree reduction (constant-size uint64 accumulator
    per task, OR-merged — only ``bloom_bits/8`` bytes ever reach the
    driver), broadcast once via ``ray.put``, and definitely-absent
    left rows are dropped inside map_batches BEFORE the exchange.
    Bloom false positives are removed by the exact join, so the result
    is exact for any sizing; keys must be integers.
    """
    import ray
    import pyarrow.compute as pc
    from ray.data.aggregate import AggregateFn

    right_on = right_on or on
    if num_partitions is None:
        num_partitions = default_join_partitions()
    keys = (
        right_ds.select_columns([right_on])
        .groupby(right_on)
        .count()
        .map_batches(
            lambda t: pa.table({on: t[right_on]}), batch_format="pyarrow"
        )
    )

    if bloom_bits > 0:
        m_bits = ((bloom_bits + 63) // 64) * 64
        n_words = m_bits // 64

        def acc(bitmap: np.ndarray, block: pa.Table) -> np.ndarray:
            k = block[right_on].to_numpy(zero_copy_only=False)
            for w_idx, mask in _bloom_positions(k, bloom_hashes, m_bits):
                np.bitwise_or.at(bitmap, w_idx, mask)
            return bitmap

        agg = right_ds.select_columns([right_on]).aggregate(
            AggregateFn(
                init=lambda k: np.zeros(n_words, dtype=np.uint64),
                merge=np.bitwise_or,
                accumulate_block=acc,
                name="bloom",
            )
        )
        # empty right side => no bitmap; the exact join below yields
        # the (empty) result on its own
        bloom = agg.get("bloom") if agg else None
        bloom_ref = ray.put(bloom) if bloom is not None else None

        def prefilter(t: pa.Table) -> pa.Table:
            bm = ray.get(bloom_ref)
            k = t[on].to_numpy(zero_copy_only=False)
            keep = np.ones(len(k), dtype=bool)
            for w_idx, mask in _bloom_positions(k, bloom_hashes, m_bits):
                keep &= (bm[w_idx] & mask) != 0
            return t.filter(pa.array(keep))

        if bloom_ref is not None:
            left_ds = left_ds.map_batches(prefilter, batch_format="pyarrow")

    return left_ds.join(
        keys, join_type="inner", num_partitions=num_partitions, on=(on,)
    )


def asof_join(
    left_ds,
    right_ds,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    buckets: int | None = None,
    direction: str = "backward",
):
    """For each left row: columns of the latest right row with the same
    ``key`` and ``right_ts`` <= ``left_ts`` (nulls when none).
    ``direction="forward"`` flips the semantics to the EARLIEST right
    row with ``right_ts`` >= ``left_ts`` — the "next appointment"
    shape (DuckDB's ASOF JOIN is backward-only; the forward twin is
    the decorrelated MIN join).

    ``buckets`` (the shuffle fan-out; each bucket is one in-memory
    pandas merge_asof) defaults to 4x the cluster CPU count — a fixed
    constant would cap join parallelism regardless of cluster size."""
    if buckets is None:
        import ray

        buckets = 4 * int(ray.cluster_resources().get("CPU", 8))
    lsch = dict(zip(left_ds.schema().names, left_ds.schema().types))
    rsch = dict(zip(right_ds.schema().names, right_ds.schema().types))
    left_cols = list(lsch)
    # right columns carried into the output: the right timestamp plus
    # requested value columns (deduped, order kept)
    extra = []
    for c in [right_ts, *right_vals]:
        if c not in left_cols and c not in extra:
            extra.append(c)
    right_keep = [key] + extra if key not in extra else extra
    unified: dict = {c: lsch[c] for c in left_cols}
    for c in right_keep:
        if c not in unified:
            unified[c] = rsch[c]

    from ..state.cuckoo import sha1_64

    def prep(keep: list[str], side: str):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            data = {}
            for c, typ in unified.items():
                data[c] = t[c] if c in keep else pa.nulls(n, typ)
            # stable hash: Python's hash() is per-process randomized for
            # strings, which would scatter one key across buckets
            data["_b"] = pa.array(
                [sha1_64(str(v)) % buckets for v in t[key].to_pylist()],
                pa.int32(),
            )
            data["_side"] = pa.array([side] * n, pa.string())
            return pa.table(data)

        return fn

    lt = left_ds.map_batches(prep(left_cols, "l"), batch_format="pyarrow")
    rt = right_ds.map_batches(prep(right_keep, "r"), batch_format="pyarrow")

    out_cols = left_cols + extra

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["_side"] == "l"][left_cols]
        r = g[g["_side"] == "r"][right_keep]
        if len(l) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=g[c].dtype) for c in out_cols})
        l = l.sort_values(left_ts, kind="mergesort")
        if len(r) == 0:
            out = l.copy()
            for v in extra:
                out[v] = pd.NA
            return out[out_cols]
        r = r.sort_values(right_ts, kind="mergesort")
        merged = pd.merge_asof(
            l,
            r,
            left_on=left_ts,
            right_on=right_ts,
            by=key,
            direction=direction,
            suffixes=("", "_r"),
        )
        return merged[out_cols]

    return lt.union(rt).groupby("_b").map_groups(per_bucket, batch_format="pandas")


def _ts_i64(arr: np.ndarray) -> np.ndarray:
    """Timestamps (any datetime64 unit) or integers -> comparable int64
    microseconds. Intervals must be passed in the same clock."""
    a = np.asarray(arr)
    if a.dtype.kind == "M":
        return a.astype("datetime64[us]").view("int64")
    return a.astype("int64")


def interval_join(
    left_ds,
    right_ds,
    key: str,
    left_ts: str,
    right_lo: str,
    right_hi: str,
    right_vals: list[str],
    max_span,
    buckets: int | None = None,
):
    """Inner range join: every (left, right) pair with equal ``key``
    and ``right_lo <= left_ts <= right_hi`` (closed interval).

    Distribution shape: both sides are hash-bucketed on ``key`` into
    one schema-aligned dataset (the asof_join shuffle) so each bucket
    joins independently. In-bucket the right side is sorted once by
    ``lo``; for each left timestamp the candidate window is
    ``lo in [ts - max_span, ts]`` (two searchsorteds), exploded with
    np.repeat/cumsum and filtered by ``hi >= ts`` — fully vectorized,
    no per-row Python.

    ``max_span`` is the PARTITIONING ASSUMPTION this operator relies
    on (cf. the custom-operator contract): it must upper-bound every
    right interval's length (``hi - lo``); intervals longer than it
    would fall outside the probe window and be silently missed, so
    violations raise. Datetime columns are compared in microseconds —
    pass ``max_span`` as ``np.timedelta64``/``pd.Timedelta`` (or int
    microseconds) accordingly.

    Reference parity note: the reference engine has no relational
    range join; this extends the fetch-as-join family (SURVEY.md
    §2 J1-J3) to the windowed-attribution shape a training-data
    pipeline needs (event -> all orders within N days).
    """
    if buckets is None:
        import ray

        buckets = 4 * int(ray.cluster_resources().get("CPU", 8))
    # NB: np.timedelta64 subclasses np.signedinteger — test it FIRST
    if isinstance(max_span, np.timedelta64) or not isinstance(
        max_span, (int, np.integer)
    ):
        span_us = int(np.timedelta64(max_span, "us").view("int64"))
    else:
        span_us = int(max_span)
    lsch = dict(zip(left_ds.schema().names, left_ds.schema().types))
    rsch = dict(zip(right_ds.schema().names, right_ds.schema().types))
    left_cols = list(lsch)
    extra = []
    for c in [right_lo, right_hi, *right_vals]:
        if c not in left_cols and c not in extra:
            extra.append(c)
    right_keep = [key] + extra if key not in extra else extra
    unified: dict = {c: lsch[c] for c in left_cols}
    for c in right_keep:
        if c not in unified:
            unified[c] = rsch[c]

    from ..state.cuckoo import sha1_64

    def prep(keep: list[str], side: str):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            data = {}
            for c, typ in unified.items():
                data[c] = t[c] if c in keep else pa.nulls(n, typ)
            data["_b"] = pa.array(
                [sha1_64(str(v)) % buckets for v in t[key].to_pylist()],
                pa.int32(),
            )
            data["_side"] = pa.array([side] * n, pa.string())
            return pa.table(data)

        return fn

    lt = left_ds.map_batches(prep(left_cols, "l"), batch_format="pyarrow")
    rt = right_ds.map_batches(prep(right_keep, "r"), batch_format="pyarrow")
    out_cols = left_cols + extra

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lmask = (g["_side"] == "l").to_numpy()
        # factorize over the WHOLE bucket so left and right rows of the
        # same key share a code — the probe is on (key_code, time), so
        # key equality is exact (buckets hold many hash-sharing keys)
        codes, _ = pd.factorize(g[key], sort=False)
        l = g[lmask][left_cols]
        r = g[~lmask][right_keep]
        # the schema-aligned union null-pads each side's missing columns,
        # which promotes ints to float64 in pandas; restore the unified
        # Arrow dtypes on the (NA-free, inner-join) output
        dtypes = {c: unified[c].to_pandas_dtype() for c in out_cols}
        empty = pd.DataFrame(
            {c: pd.Series([], dtype=dtypes[c]) for c in out_cols}
        )
        if len(l) == 0 or len(r) == 0:
            return empty
        lo = _ts_i64(r[right_lo].to_numpy())
        hi = _ts_i64(r[right_hi].to_numpy())
        if (hi - lo).max() > span_us:
            raise ValueError(
                f"interval_join: right interval longer than max_span "
                f"({int((hi - lo).max())} us > {span_us} us) — pairs "
                "would be silently missed; raise max_span"
            )
        kdt = np.dtype([("k", "i8"), ("t", "i8")])
        rcode = codes[~lmask]
        order = np.lexsort((lo, rcode))
        r = r.iloc[order]
        lo, hi, rcode = lo[order], hi[order], rcode[order]
        r_rec = np.empty(len(r), kdt)
        r_rec["k"], r_rec["t"] = rcode, lo
        ts = _ts_i64(l[left_ts].to_numpy())
        lcode = codes[lmask]
        q = np.empty(len(l), kdt)
        q["k"] = lcode
        q["t"] = ts - span_us
        start = np.searchsorted(r_rec, q, side="left")
        q["t"] = ts
        end = np.searchsorted(r_rec, q, side="right")
        counts = end - start
        total = int(counts.sum())
        if total == 0:
            return empty
        li = np.repeat(np.arange(len(l)), counts)
        offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
        ri = np.arange(total) - np.repeat(offs, counts) + np.repeat(start, counts)
        keep = hi[ri] >= ts[li]
        li, ri = li[keep], ri[keep]
        out = l.iloc[li].reset_index(drop=True)
        rsel = r.iloc[ri].reset_index(drop=True)
        for c in extra:
            out[c] = rsel[c]
        return out[out_cols].astype(dtypes)

    return lt.union(rt).groupby("_b").map_groups(per_bucket, batch_format="pandas")


def revenue_by_nation(orders_ds, customer_ds, nation_ds, num_partitions: int | None = None):
    """Total order revenue per nation — the classic star-schema
    aggregation, built on Ray Data's NATIVE hash-shuffle join
    (``Dataset.join``, hash-partitioned on the key) for the big⋈big
    side and a broadcast map for the tiny dimension:

    * orders ⋈ customer on custkey — both sides corpus-scale, so this
      is the genuine shuffle join (``num_partitions`` sizes the
      exchange; at cluster scale set it ~4x cluster CPUs);
    * revenue is summed as int64 CENTS before the groupby (fixed-point
      => associative => bit-reproducible distributed Sum, the
      windowed-sums rule);
    * nation (25 rows) is joined by broadcast dict inside map_batches,
      never shuffled.

    Returns (n_name, total_cents), one row per nation with orders.
    """
    if num_partitions is None:
        num_partitions = default_join_partitions()
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def orders_prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64())
        return pa.table({"custkey": t["o_custkey"], "cents": cents})

    def cust_prep(t: pa.Table) -> pa.Table:
        return pa.table({"custkey": t["c_custkey"], "nationkey": t["c_nationkey"]})

    joined = orders_ds.map_batches(orders_prep, batch_format="pyarrow").join(
        customer_ds.map_batches(cust_prep, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=num_partitions,
        on=("custkey",),
    )
    per_nation = joined.groupby("nationkey").aggregate(
        Sum("cents", alias_name="total_cents")
    )
    names = {
        int(r["n_nationkey"]): r["n_name"]
        for r in nation_ds.select_columns(["n_nationkey", "n_name"]).take_all()
    }

    def add_name(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_name": pa.array(
                    [names[int(k)] for k in t["nationkey"].to_pylist()], pa.string()
                ),
                "total_cents": t["total_cents"],
            }
        )

    return per_nation.map_batches(add_name, batch_format="pyarrow")


def anti_join(left_ds, right_ds, on: str, right_on: str | None = None,
              num_partitions: int | None = None):
    """Left rows with NO match in ``right_ds`` (SQL NOT EXISTS) —
    distributed: the right side is reduced to its distinct keys plus a
    presence marker (``unique`` — one shuffle over keys only, never
    right payloads), hash-joined LEFT OUTER via the native
    ``Dataset.join``, and rows whose marker survived are dropped.
    The decontamination/"not yet crawled" primitive as a standalone
    relational operator."""
    import pyarrow.compute as pc

    right_on = right_on or on
    if num_partitions is None:
        num_partitions = default_join_partitions()

    def mark(t: pa.Table) -> pa.Table:
        return pa.table(
            {on: t[right_on], "_present": pa.array([1] * t.num_rows, pa.int8())}
        )

    # distributed distinct (groupby — never a driver-side unique())
    keys = (
        right_ds.select_columns([right_on])
        .groupby(right_on)
        .count()
        .map_batches(mark, batch_format="pyarrow")
    )
    joined = left_ds.join(
        keys, join_type="left_outer", num_partitions=num_partitions, on=(on,)
    )

    def only_missing(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t["_present"])).drop_columns(["_present"])

    return joined.map_batches(only_missing, batch_format="pyarrow")


def pagerank(nodes_ds, edges_ds, iters: int = 5, scale: int = 10**12,
             num_partitions: int = 16,
             max_broadcast_nodes: int = 2_000_000):
    """Distributed PageRank over a web-link graph — ``nodes_ds`` has one
    ``node`` (string url) per vertex, ``edges_ds`` DISTINCT
    (``parent``, ``child``) rows. Exact integer fixed-point arithmetic
    so a distributed run is bit-reproducible AND SQL-twinnable:

        r0       = scale // N                       (for every node)
        r_{t+1}(v) = (15 * r0) // 100
                   + (85 * sum_{(u,v)} (r_t(u) // outdeg(u))) // 100

    i.e. damping 0.85 as the rational 85/100, per-edge contributions
    floor-divided, dangling mass evaporating (rank mass is NOT
    conserved — the comparison-friendly variant; both sides of the
    oracle do the same). Every step is the corpus-scale shape: the
    out-degree table is hash-joined onto the edge list ONCE; each
    iteration is one native ranks⋈edges hash join, a vectorized
    per-edge floor-div, one groupby(child).Sum, and one left-outer
    join back onto nodes (null -> base). Ranks are materialized per
    iteration (the iterative-algorithm checkpoint pattern, as in
    kmeans_labels) so the plan does not deepen with ``iters``.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    n = nodes_ds.count()
    if n == 0:
        import ray.data as rd

        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.string()),
                      "r": pa.array([], pa.int64())})
        )
    r0 = scale // n
    base = (15 * r0) // 100
    if n <= max_broadcast_nodes:
        # broadcast-ranks path (the _hits_broadcast shape): rank/outdeg
        # live as dense driver arrays keyed by a sorted node index and
        # ship per iteration via ray.put; the EDGE LIST stays
        # distributed, each iteration = one stateless partial-sum map
        # + one bucketed exchange (node-bounded rows) instead of two
        # native hash joins + a sort-aggregate. Identical arithmetic:
        # per-edge floor r//od, then exact int sums — bit-equal to the
        # join path (pinned in tests). Beyond the cap the join path
        # below scales without any node-proportional driver state.
        return _pagerank_broadcast(nodes_ds, edges_ds, iters, scale)

    od = edges_ds.groupby("parent").aggregate(Count(alias_name="od"))
    edges_od = (
        edges_ds.join(od, join_type="inner", num_partitions=num_partitions,
                      on=("parent",))
        .map_batches(
            lambda t: pa.table(
                {"node": t["parent"], "child": t["child"], "od": t["od"]}
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def init(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": t["node"],
             "r": pa.array(np.full(t.num_rows, r0, dtype=np.int64))}
        )

    ranks = nodes_ds.map_batches(init, batch_format="pyarrow").materialize()

    def contrib(t: pa.Table) -> pa.Table:
        r = t["r"].to_numpy(zero_copy_only=False)
        d = t["od"].to_numpy(zero_copy_only=False)
        return pa.table({"node": t["child"], "c": pa.array(r // d, pa.int64())})

    def new_rank(t: pa.Table) -> pa.Table:
        s = pc.fill_null(t["s"], 0).to_numpy(zero_copy_only=False)
        return pa.table(
            {"node": t["node"],
             "r": pa.array(base + (85 * s) // 100, pa.int64())}
        )

    for _ in range(iters):
        sums = (
            edges_od.join(ranks, join_type="inner",
                          num_partitions=num_partitions, on=("node",))
            .map_batches(contrib, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("c", alias_name="s"))
        )
        ranks = (
            nodes_ds.join(sums, join_type="left_outer",
                          num_partitions=num_partitions, on=("node",))
            .map_batches(new_rank, batch_format="pyarrow")
            .materialize()
        )
    return ranks


def hits(nodes_ds, edges_ds, iters: int = 2, num_partitions: int | None = None,
         max_broadcast_nodes: int = 2_000_000):
    """Distributed HITS (Kleinberg, JACM 1999) hubs/authorities over a
    link graph — ``nodes_ds`` one (``node``) per vertex, ``edges_ds``
    DISTINCT (``parent``, ``child``) rows, both endpoints in nodes.
    UNNORMALIZED exact-integer iterations (h0 = 1):

        a_t(v) = sum over edges (u,v) of h_{t-1}(u)
        h_t(u) = sum over edges (u,v) of a_t(v)

    Skipping the usual L2 normalization keeps every value an exact
    int64 (bit-reproducible across block layouts AND SQL-twinnable);
    rankings are identical since normalization is a positive scalar.
    Values grow ~ (max degree)^(2t) x n, so iterations are bounded
    (default 2) and each half-step RAISES past 2^61 instead of silently
    wrapping. Scale shape per half-step: one native scores⋈edges hash
    join + one groupby(Sum) + one left join back onto nodes (absent ->
    0); scores materialize per iteration so the plan stays flat.
    Returns (node, auth, hub)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    import ray.data as rd

    if nodes_ds.count() == 0:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.string()),
                      "auth": pa.array([], pa.int64()),
                      "hub": pa.array([], pa.int64())})
        )
    if num_partitions is None:
        num_partitions = default_join_partitions()
    edges = edges_ds.materialize()

    # small-graph fast path: score vectors are node-bounded, so up to
    # ~10^7 nodes they can live on the driver and broadcast via
    # ray.put — each half-step is then ONE map_batches over the edge
    # list + one groupby(Sum) + a node-bounded take_all, instead of
    # two native hash joins with their aggregator-pool spawns
    # (measured 18.5 s -> ~5 s on the crawl graph). The join path
    # below is the arbitrarily-large-graph shape.
    n_nodes = nodes_ds.count()
    if n_nodes <= max_broadcast_nodes:
        return _hits_broadcast(nodes_ds, edges, iters)

    def const_scores(val_col: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {"node": t["node"],
                 val_col: pa.array(np.ones(t.num_rows, dtype=np.int64))}
            )

        return fn

    def half_step(scores, score_col: str, key: str, other: str, out_col: str):
        """out(x) = sum over edges of score(key side) grouped by the
        other side; nodes without incident edges get 0."""
        contrib = (
            edges.join(
                scores.map_batches(
                    lambda t: pa.table({key: t["node"], "s": t[score_col]}),
                    batch_format="pyarrow",
                ),
                join_type="inner", num_partitions=num_partitions, on=(key,),
            )
            .groupby(other)
            .aggregate(Sum("s", alias_name="s"))
            .materialize()  # barrier: two native joins in one streaming
            # execution deadlock small clusters (NOTES / rayfix)
        )
        out = nodes_ds.join(
            contrib.map_batches(
                lambda t: pa.table({"node": t[other], "s": t["s"]}),
                batch_format="pyarrow",
            ),
            join_type="left_outer", num_partitions=num_partitions, on=("node",),
        ).map_batches(
            lambda t: pa.table(
                {"node": t["node"],
                 out_col: pc.cast(pc.coalesce(t["s"], pa.scalar(0)), pa.int64())}
            ),
            batch_format="pyarrow",
        ).materialize()
        mx = out.map_batches(
            lambda t: pa.table(
                {"m": pa.array([int(pc.max(t[out_col]).as_py() or 0)], pa.int64())}
            ),
            batch_format="pyarrow",
        ).to_pandas()["m"].max()
        if int(mx) >= (1 << 61):
            raise OverflowError(
                f"hits: {out_col} exceeded 2^61 — lower iters (unnormalized "
                "integer scores grow ~degree^(2t))"
            )
        return out

    hub = nodes_ds.map_batches(const_scores("hub"), batch_format="pyarrow").materialize()
    auth = None
    for _ in range(iters):
        auth = half_step(hub, "hub", "parent", "child", "auth")
        hub = half_step(auth, "auth", "child", "parent", "hub")
    merged = auth.join(hub, join_type="inner", num_partitions=num_partitions,
                       on=("node",))
    return merged


def _pagerank_broadcast(nodes_ds, edges_ds, iters: int,
                        scale: int) -> "rd.Dataset":
    """Broadcast-ranks PageRank (see :func:`pagerank`): dense rank and
    out-degree arrays on the driver keyed by a sorted node index; the
    distributed edge list reduces per-batch floor-div contributions
    through one bucketed exchange per iteration."""
    import ray
    import ray.data as rd

    from .relagg import bucketed_group_sums

    nodes = np.sort(
        np.asarray(
            [r["node"] for r in nodes_ds.select_columns(["node"]).take_all()],
            dtype=object,
        )
    )
    n = len(nodes)
    r0 = scale // n
    base = (15 * r0) // 100
    idx_ref = ray.put(nodes)

    def gather(score_ref) -> np.ndarray:
        def partial(t: pa.Table) -> pa.Table:
            ns = ray.get(idx_ref)
            r, od = ray.get(score_ref)
            pv = np.asarray(t["parent"].to_pylist(), dtype=object)
            cv = np.asarray(t["child"].to_pylist(), dtype=object)
            # hit check (the _banded_weights pattern): an edge endpoint
            # absent from nodes_ds must be DROPPED, exactly like the
            # join path's inner join on parent / left-outer on child —
            # unmasked searchsorted would credit the lexicographic
            # neighbor (or IndexError past the last node)
            src = np.minimum(np.searchsorted(ns, pv), n - 1)
            dst = np.minimum(np.searchsorted(ns, cv), n - 1)
            ok = (ns[src] == pv) & (ns[dst] == cv)
            src, dst = src[ok], dst[ok]
            acc = np.zeros(n, dtype=np.int64)
            np.add.at(acc, dst, r[src] // od[src])
            nz = np.nonzero(acc)[0]
            return pa.table(
                {
                    "i": pa.array(nz.astype(np.int64), pa.int64()),
                    "c": pa.array(acc[nz], pa.int64()),
                }
            )

        rows = bucketed_group_sums(
            edges_ds.map_batches(partial, batch_format="pyarrow"),
            key_col="i", sum_cols=["c"],
        ).to_pandas()
        out = np.zeros(n, dtype=np.int64)
        if len(rows):
            out[rows["i"].to_numpy()] = rows["c"].to_numpy()
        return out

    # out-degree: one distributed pass (same partial shape, r=1, od=1
    # would count — use a direct bincount partial for clarity)
    def od_partial(t: pa.Table) -> pa.Table:
        ns = ray.get(idx_ref)
        pv = np.asarray(t["parent"].to_pylist(), dtype=object)
        # out-degree counts EVERY edge of a known parent (even one to a
        # missing child — matching the join path, where od is grouped
        # from the raw edge list before any node join); an unknown
        # parent's edges are dropped like the inner join drops them
        src = np.minimum(np.searchsorted(ns, pv), n - 1)
        src = src[ns[src] == pv]
        acc = np.bincount(src, minlength=n).astype(np.int64)
        nz = np.nonzero(acc)[0]
        return pa.table(
            {
                "i": pa.array(nz.astype(np.int64), pa.int64()),
                "c": pa.array(acc[nz], pa.int64()),
            }
        )

    od_rows = bucketed_group_sums(
        edges_ds.map_batches(od_partial, batch_format="pyarrow"),
        key_col="i", sum_cols=["c"],
    ).to_pandas()
    od = np.ones(n, dtype=np.int64)  # never divides a contributing edge
    if len(od_rows):
        nz = od_rows["i"].to_numpy()
        od[nz] = np.maximum(1, od_rows["c"].to_numpy())

    r = np.full(n, r0, dtype=np.int64)
    for _ in range(iters):
        s = gather(ray.put((r, od)))
        r = base + (85 * s) // 100
    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(list(nodes), pa.string()),
                "r": pa.array(r, pa.int64()),
            }
        )
    )


def _hits_broadcast(nodes_ds, edges, iters: int) -> "rd.Dataset":
    """Broadcast-scores HITS (see :func:`hits`): node scores held on
    the driver as dense arrays keyed by a sorted node index, shipped
    per half-step via ray.put; the edge list stays distributed and
    each half-step reduces per-batch partial sums through one
    groupby."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    nodes = np.sort(
        np.asarray(
            [r["node"] for r in nodes_ds.select_columns(["node"]).take_all()],
            dtype=object,
        )
    )
    idx_ref = ray.put(nodes)

    def half(scores: np.ndarray, key: str, other: str) -> np.ndarray:
        sref = ray.put(scores)

        def partial(t: pa.Table) -> pa.Table:
            ns = ray.get(idx_ref)
            s = ray.get(sref)
            src_i = np.searchsorted(ns, np.asarray(t[key].to_pylist(), dtype=object))
            dst_i = np.searchsorted(ns, np.asarray(t[other].to_pylist(), dtype=object))
            acc = np.zeros(len(ns), dtype=np.int64)
            np.add.at(acc, dst_i, s[src_i])
            nz = np.nonzero(acc)[0]
            return pa.table(
                {"i": pa.array(nz.astype(np.int64), pa.int64()),
                 "c": pa.array(acc[nz], pa.int64())}
            )

        rows = (
            edges.map_batches(partial, batch_format="pyarrow")
            .groupby("i")
            .aggregate(Sum("c", alias_name="c"))
            .take_all()
        )  # node-bounded
        out = np.zeros(len(nodes), dtype=np.int64)
        for r in rows:
            out[int(r["i"])] = int(r["c"])
        if out.max(initial=0) >= (1 << 61):
            raise OverflowError(
                "hits: score exceeded 2^61 — lower iters (unnormalized "
                "integer scores grow ~degree^(2t))"
            )
        return out

    hub = np.ones(len(nodes), dtype=np.int64)
    auth = np.zeros(len(nodes), dtype=np.int64)
    for _ in range(iters):
        auth = half(hub, "parent", "child")
        hub = half(auth, "child", "parent")
    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(list(nodes), pa.string()),
                "auth": pa.array(auth, pa.int64()),
                "hub": pa.array(hub, pa.int64()),
            }
        )
    )


def random_walks(edges_ds, steps: int = 3,
                 num_partitions: int | None = None):
    """Deterministic 'random' walks over a link graph (the DeepWalk /
    node2vec positive-pair sampler made exact): from EVERY node with
    out-edges, walk ``steps`` hops; at node u on step s the next hop is
    argmin over out-neighbors v of md5(u || '#s#' || v) — a fixed hash
    in place of the RNG, so the walk set is repartition-stable,
    bit-reproducible, and SQL-twinnable (the standard derandomization
    under the repo's no-RNG rule; the hash varies per (node, step,
    neighbor) so revisits don't cycle identically). Emits
    (start, step, node) rows — the skip-gram positive pairs a graph-
    embedding trainer consumes. Dead ends stop the walk early.

    Scale shape: per hop, ONE native frontier⋈edges hash join, a
    vectorized-loop md5 scorer over candidate rows only, and one
    groupby(start) argmin (pandas idxmin group body). The frontier is
    |nodes| rows max; walks advance together so the plan stays flat
    (materialize per hop, like pagerank's iteration checkpoint)."""
    import hashlib

    import pyarrow.compute as pc

    import ray.data as rd

    if num_partitions is None:
        num_partitions = default_join_partitions()

    frontier = edges_ds.groupby("parent").count().map_batches(
        lambda t: pa.table({"start": t["parent"], "cur": t["parent"]}),
        batch_format="pyarrow",
    ).materialize()
    outs = []
    for s in range(1, steps + 1):
        cand = frontier.join(
            edges_ds.map_batches(
                lambda t: pa.table({"cur": t["parent"], "nxt": t["child"]}),
                batch_format="pyarrow",
            ),
            join_type="inner",
            num_partitions=num_partitions,
            on=("cur",),
        )

        def score(t: pa.Table, _s=s) -> pa.Table:
            hs = [
                hashlib.md5(f"{c}#{_s}#{n}".encode()).hexdigest()
                for c, n in zip(t["cur"].to_pylist(), t["nxt"].to_pylist())
            ]
            return pa.table(
                {
                    "start": t["start"],
                    "nxt": t["nxt"],
                    "h": pa.array(hs, pa.string()),
                }
            )

        # argmin per start, vectorized: hash-partition on start (16
        # coarse groups instead of one Python callback per start),
        # sort + drop_duplicates inside each partition. Per-batch
        # partial argmin first, so the exchange carries <= one
        # candidate row per (block, start).
        def partial_argmin(df: "pd.DataFrame") -> "pd.DataFrame":
            if len(df) == 0:
                return df[["start", "nxt", "h"]]
            df = df.sort_values(["start", "h", "nxt"], kind="mergesort")
            return df.drop_duplicates("start")[["start", "nxt", "h"]]

        def add_pk(t: pa.Table) -> pa.Table:
            # deterministic partition key (Python's str hash is
            # seed-randomized PER PROCESS — it would split one start's
            # candidates across partitions)
            hs = np.array(
                [
                    hashlib.md5(x.encode()).digest()[0] & 15
                    for x in t["start"].to_pylist()
                ],
                dtype=np.int32,
            )
            return t.append_column("_pk", pa.array(hs, pa.int32()))

        def final_argmin(df: "pd.DataFrame") -> "pd.DataFrame":
            df = df.sort_values(["start", "h", "nxt"], kind="mergesort")
            return df.drop_duplicates("start")[["start", "nxt"]]

        stepped = (
            cand.map_batches(score, batch_format="pyarrow")
            .map_batches(partial_argmin, batch_format="pandas")
            .map_batches(add_pk, batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(final_argmin, batch_format="pandas")
            .materialize()
        )
        outs.append(
            stepped.map_batches(
                lambda t, _s=s: pa.table(
                    {
                        "start": t["start"],
                        "step": pa.array(
                            np.full(t.num_rows, _s, dtype=np.int64)
                        ),
                        "node": t["nxt"],
                    }
                ),
                batch_format="pyarrow",
            )
        )
        frontier = stepped.map_batches(
            lambda t: pa.table({"start": t["start"], "cur": t["nxt"]}),
            batch_format="pyarrow",
        ).materialize()
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out


def cluster_pairs(pairs_ds, max_rounds: int = 30):
    """Connected components over (doc_a, doc_b) pairs, fully
    distributed: alternating large-star / small-star rounds (Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC 2014).
    Each round is one groupby(node).map_groups shuffle over the edge
    set with a vectorized numpy body — the pair graph never touches the
    driver (at 100-TB dedup scale it is billions of edges). Converges
    in O(log^2 n) rounds to star edges (node -> component minimum).
    Returns (doc_id, cluster) with cluster = smallest doc id in the
    component."""
    import ray.data as rd
    from ray.data.aggregate import Min

    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "cluster": pa.array([], pa.int64())}
    )
    pairs_ds = pairs_ds.materialize()
    if pairs_ds.count() == 0:
        return rd.from_arrow(empty)

    def both_dirs(t: pa.Table) -> pa.Table:
        u = pa.concat_arrays([t["u"].combine_chunks(), t["v"].combine_chunks()])
        v = pa.concat_arrays([t["v"].combine_chunks(), t["u"].combine_chunks()])
        return pa.table({"u": u, "v": v})

    def large_star(g: pd.DataFrame) -> pd.DataFrame:
        # N(u) from both directions; connect strictly-larger neighbors
        # to the minimum of N(u) + {u}
        u = int(g["u"].iloc[0])
        nbrs = g["v"].to_numpy()
        m = min(u, int(nbrs.min()))
        big = np.unique(nbrs[nbrs > u])
        return pd.DataFrame(
            {"u": pd.Series(big, dtype="int64"), "v": pd.Series([m] * len(big), dtype="int64")}
        )

    def to_max_min(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        hi = pc.max_element_wise(t["u"], t["v"])
        lo = pc.min_element_wise(t["u"], t["v"])
        return pa.table({"u": hi, "v": lo})

    def small_star(g: pd.DataFrame) -> pd.DataFrame:
        # neighbors all <= u here; hang everything off the minimum
        u = int(g["u"].iloc[0])
        nbrs = g["v"].to_numpy()
        m = int(nbrs.min())
        out = np.unique(np.append(nbrs[nbrs != m], u))
        out = out[out != m]
        return pd.DataFrame(
            {"u": pd.Series(out, dtype="int64"), "v": pd.Series([m] * len(out), dtype="int64")}
        )

    def edge_sums(ds) -> tuple:
        s = ds.sum(["u", "v"])
        return (int(s["sum(u)"]), int(s["sum(v)"]))

    edges = pairs_ds.map_batches(
        lambda t: pa.table({"u": t["doc_a"], "v": t["doc_b"]}), batch_format="pyarrow"
    ).materialize()
    prev_sums = None
    prev_n = None
    for _ in range(max_rounds):
        ls = (
            edges.map_batches(both_dirs, batch_format="pyarrow")
            .groupby("u")
            .map_groups(large_star, batch_format="pandas")
        )
        ss = (
            ls.map_batches(to_max_min, batch_format="pyarrow")
            .groupby("u")
            .map_groups(small_star, batch_format="pandas")
            .materialize()
        )
        edges = ss
        # convergence = identical (count, sum_u, sum_v) across rounds.
        # count() is free metadata after materialize; the sums cost a
        # distributed execution, so they are only computed once the
        # count has stabilized (a changed count alone proves the round
        # made progress)
        n = edges.count()
        if n == 0:
            break
        if n != prev_n:
            prev_n, prev_sums = n, None
            continue
        cur = edge_sums(edges)
        if cur == prev_sums:
            break
        prev_sums = cur

    # star edges: (node, root). Roots appear only as v — add (root, root)
    # rows and take the min per node (defensive if not fully converged).
    labels = (
        edges.map_batches(
            lambda t: pa.table(
                {
                    "doc_id": pa.concat_arrays(
                        [t["u"].combine_chunks(), t["v"].combine_chunks()]
                    ),
                    "cluster": pa.concat_arrays(
                        [t["v"].combine_chunks(), t["v"].combine_chunks()]
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("doc_id")
        .aggregate(Min("cluster", alias_name="cluster"))
        .materialize()
    )
    if labels.count() == 0:
        return rd.from_arrow(empty)
    # stays a Dataset end to end: the label table is corpus-scale on a
    # dup-heavy corpus (one row per clustered doc), so the sort is
    # distributed and the driver never gathers it — callers that want
    # pandas do their own to_pandas on the (typically small) result.
    return labels.sort("doc_id")


def revenue_chain(lineitem_ds, orders_ds, customer_ds, nation_ds,
                  num_partitions: int | None = None):
    """Three-table star-join chain with aggregation pushdown — revenue
    per (order priority, nation): lineitem revenue is PRE-AGGREGATED to
    one int64-cents row per orderkey BEFORE any join (the combiner
    rule: the widest table never ships line-level rows), then two
    native hash-shuffle joins walk the key chain
    (orderkey -> custkey -> nationkey), one small groupby sums per
    (priority, nationkey), and the 25-row nation dimension is a
    broadcast dict. Returns (o_orderpriority, n_name, rev_cents).
    """
    if num_partitions is None:
        num_partitions = default_join_partitions()
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def li_prep(t: pa.Table) -> pa.Table:
        rev = pc.cast(
            pc.floor(
                pc.multiply(
                    pc.multiply(
                        t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"]),
                    ),
                    pa.scalar(100.0),
                )
            ),
            pa.int64(),
        )
        return pa.table({"orderkey": t["l_orderkey"], "rev_cents": rev})

    # per-order pre-agg is a HIGH-cardinality (|orders|) integer-key
    # sum — the bucket-vectorized kernel, not the native sort
    # aggregate, which measured 7.3 s vs 0.9 s at 147k groups
    from .relagg import bucketed_group_sums

    per_order = bucketed_group_sums(
        lineitem_ds.select_columns(
            ["l_orderkey", "l_extendedprice", "l_discount"]
        ).map_batches(li_prep, batch_format="pyarrow"),
        key_col="orderkey",
        sum_cols=["rev_cents"],
    )

    orders_k = orders_ds.select_columns(
        ["o_orderkey", "o_custkey", "o_orderpriority"]
    ).map_batches(
        lambda t: pa.table(
            {
                "orderkey": t["o_orderkey"],
                "custkey": t["o_custkey"],
                "o_orderpriority": t["o_orderpriority"],
            }
        ),
        batch_format="pyarrow",
    )
    cust_k = customer_ds.select_columns(["c_custkey", "c_nationkey"]).map_batches(
        lambda t: pa.table(
            {"custkey": t["c_custkey"], "nationkey": t["c_nationkey"]}
        ),
        batch_format="pyarrow",
    )

    joined = per_order.join(
        orders_k, join_type="inner", num_partitions=num_partitions,
        on=("orderkey",),
    ).join(cust_k, join_type="inner", num_partitions=num_partitions,
           on=("custkey",))
    per_group = joined.groupby(["o_orderpriority", "nationkey"]).aggregate(
        Sum("rev_cents", alias_name="rev_cents")
    )

    names = {
        int(r["n_nationkey"]): r["n_name"]
        for r in nation_ds.select_columns(["n_nationkey", "n_name"]).take_all()
    }

    def add_name(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "n_name": pa.array(
                    [names[int(k)] for k in t["nationkey"].to_pylist()],
                    pa.string(),
                ),
                "rev_cents": t["rev_cents"],
            }
        )

    return per_group.map_batches(add_name, batch_format="pyarrow")


def left_outer_totals(customer_ds, orders_ds, num_partitions: int | None = None):
    """LEFT OUTER enrichment: every customer with their order count and
    fixed-point total spend; customers with no orders keep a row with
    zeros (the join type anti_join/semi_join can't express — the
    preserved-side null-fill).

    Scale shape: orders are pre-aggregated per custkey FIRST (the
    corpus moves once in that groupby, and the join's right side
    shrinks to |customers-with-orders| rows), then ONE native
    hash-shuffle ``Dataset.join(join_type='left_outer')``; null-fill is
    a vectorized pyarrow stage. Spend is int64 cents at the row level
    (associative Sum, the engine-wide fixed-point rule).
    """
    if num_partitions is None:
        num_partitions = default_join_partitions()
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    def orders_prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.multiply(t["o_totalprice"], 100.0)), pa.int64())
        return pa.table({"o_custkey": t["o_custkey"], "cents": cents})

    per_cust = (
        orders_ds.select_columns(["o_custkey", "o_totalprice"])
        .map_batches(orders_prep, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Count(alias_name="n_orders"), Sum("cents", alias_name="spend_cents"))
    )

    joined = customer_ds.select_columns(["c_custkey", "c_name"]).join(
        per_cust,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def fill(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_name": t["c_name"],
                "n_orders": pc.cast(
                    pc.fill_null(t["n_orders"], 0), pa.int64()
                ),
                "spend_cents": pc.cast(
                    pc.fill_null(t["spend_cents"], 0), pa.int64()
                ),
            }
        )

    return joined.map_batches(fill, batch_format="pyarrow")


def full_outer_counts(left_ds, right_ds, key: str):
    """FULL OUTER join of two per-key COUNT aggregates: keys present on
    either side survive, the missing side zero-fills — completing the
    engine's join-type coverage next to inner / left_outer / semi /
    anti / asof / interval.

    Implementation note: Ray 2.49's native
    ``Dataset.join(join_type='full_outer')`` raises ``ArrowInvalid``
    ("No match ... for key field reference") whenever a hash partition
    receives an EMPTY left side (reproduced on a 3-row table), so this
    operator expresses the same semantics the union-tagged way — each
    side emits per-batch (key, n_left, n_right) count partials with the
    other side's column zeroed, and ONE groupby(key) sums both. That is
    also the cheaper plan: one combiner-bounded exchange, no join
    barrier, and the zero-fill falls out of the Sum identity instead of
    a COALESCE pass.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partials(side: int):
        def fn(t: pa.Table) -> pa.Table:
            g = (
                t.select([key])
                .group_by([key])
                .aggregate([([], "count_all")])
            )
            n = pc.cast(g["count_all"], pa.int64())
            zero = pa.array(np.zeros(g.num_rows, dtype=np.int64))
            return pa.table(
                {
                    key: g[key],
                    "n_left": n if side == 0 else zero,
                    "n_right": zero if side == 0 else n,
                }
            )

        return fn

    tagged = left_ds.select_columns([key]).map_batches(
        partials(0), batch_format="pyarrow"
    ).union(
        right_ds.select_columns([key]).map_batches(partials(1), batch_format="pyarrow")
    )
    return tagged.groupby(key).aggregate(
        Sum("n_left", alias_name="n_left"), Sum("n_right", alias_name="n_right")
    )


def cross_join_small(left_ds, right_ds, columns_left: list[str],
                     columns_right: list[str]):
    """Cartesian product against a SMALL right side: the right table is
    gathered once, ``ray.put`` once, and every left batch emits the
    vectorized product (np.repeat x np.tile) — the dimension-expansion
    shape (calendar x entity scaffolds, grid builds). No shuffle at
    all; output size is |left| x |right| by definition, so the right
    side must be broadcast-small (asserted at 10^5 rows).
    """
    import ray

    right = right_ds.select_columns(columns_right).to_pandas()
    assert len(right) <= 100_000, "cross_join_small: right side too large"
    right_ref = ray.put(right)

    def per_batch(t: pa.Table) -> pa.Table:
        r = ray.get(right_ref)
        n, m = t.num_rows, len(r)
        cols = {}
        for c in columns_left:
            cols[c] = t[c].take(pa.array(np.repeat(np.arange(n), m)))
        for c in columns_right:
            cols[c] = pa.array(np.tile(r[c].to_numpy(), n))
        return pa.table(cols)

    return left_ds.select_columns(columns_left).map_batches(
        per_batch, batch_format="pyarrow"
    )


def enumerate_triangles(edges_ds, a_col: str = "item_a", b_col: str = "item_b",
                        num_partitions: int | None = None):
    """Distributed triangle enumeration over an undirected edge set
    given in canonical a < b orientation: emit every (a, b, c) with
    a < b < c and all three edges present.

    The standard two-join plan (e.g. Suri & Vassilvitskii, WWW 2011's
    MapReduce formulation): (1) wedges = edges ⋈ edges on b1 = a2 —
    each length-2 path a-b-c with a < b < c; (2) wedges ⋈ edges on the
    closing (a, c) pair — both are native hash-shuffle ``Dataset.join``
    exchanges, so no side is ever gathered. Wedge volume is
    sum-over-mid-nodes of in-deg*out-deg — the canonical orientation
    caps it at the count of (smaller, larger) neighbor pairs, the same
    bound that makes this plan viable at web scale (hub nodes
    contribute only their HIGHER-id neighbor pairs).

    The wedge table is MATERIALIZED between the two joins: each native
    hash-shuffle join reserves an aggregator-actor pool sized with
    ``num_partitions``, and two joins sharing one streaming execution
    can reserve every CPU of a small cluster while the map stage that
    feeds them holds the remaining demand — a scheduling deadlock
    (observed at num_cpus=4). The barrier splits them into one
    execution per join; wedge blocks spill to the object store, so the
    barrier costs latency, not memory. ``num_partitions`` defaults to
    half the cluster CPUs (>= 2) for the same reason.
    """
    if num_partitions is None:
        import ray

        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)

    def rename(suffix: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.select([a_col, b_col]).rename_columns(
                [f"a{suffix}", f"b{suffix}"]
            )

        return fn

    e1 = edges_ds.map_batches(rename("1"), batch_format="pyarrow")
    e2 = edges_ds.map_batches(rename("2"), batch_format="pyarrow")
    wedges = e1.join(
        e2, join_type="inner", num_partitions=num_partitions,
        on=("b1",), right_on=("a2",),
    )

    def wedge_cols(t: pa.Table) -> pa.Table:
        # (a, b, c) = (a1, b1, b2); needs the closing edge (a, c)
        return pa.table({"w_a": t["a1"], "w_b": t["b1"], "w_c": t["b2"]})

    closing = edges_ds.map_batches(rename("3"), batch_format="pyarrow")
    wedges = wedges.map_batches(wedge_cols, batch_format="pyarrow").materialize()
    tri = wedges.join(
        closing, join_type="inner", num_partitions=num_partitions,
        on=("w_a", "w_c"), right_on=("a3", "b3"),
    )

    def out_cols(t: pa.Table) -> pa.Table:
        return pa.table({"a": t["w_a"], "b": t["w_b"], "c": t["w_c"]})

    return tri.map_batches(out_cols, batch_format="pyarrow")


def bfs_distances(edges_ds, seed_nodes: list[int], max_depth: int = 6,
                  a_col: str = "item_a", b_col: str = "item_b",
                  num_partitions: int | None = None):
    """Multi-source BFS shortest-path distances (hop counts) over an
    undirected edge set — the iterative-join graph shape (one
    frontier ⋈ edges native hash join + one distinct per wave, the
    Pregel/GraphX pattern expressed in Dataset ops). Returns (node,
    dist) for every node within ``max_depth`` hops of any seed.

    Each wave's new frontier is anti-joined against the accumulated
    distance table, so a node's distance is fixed the first wave it
    appears (BFS optimality) and the frontier only carries NEWLY
    discovered nodes. Waves are materialized (tiny: one row per node)
    both to terminate on an empty frontier via free count() metadata
    and to keep each wave's joins in separate executions (see
    enumerate_triangles' small-cluster deadlock note).
    """
    import ray
    import ray.data as rd

    if num_partitions is None:
        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)

    def both_dirs(t: pa.Table) -> pa.Table:
        src = pa.concat_arrays(
            [t[a_col].combine_chunks(), t[b_col].combine_chunks()]
        )
        dst = pa.concat_arrays(
            [t[b_col].combine_chunks(), t[a_col].combine_chunks()]
        )
        return pa.table({"src": src, "dst": dst})

    edges = edges_ds.map_batches(both_dirs, batch_format="pyarrow").materialize()

    dist = rd.from_arrow(
        pa.table(
            {
                "node": pa.array(sorted(set(seed_nodes)), pa.int64()),
                "dist": pa.array([0] * len(set(seed_nodes)), pa.int64()),
            }
        )
    ).materialize()
    frontier = dist

    for d in range(1, max_depth + 1):
        nbrs = frontier.select_columns(["node"]).join(
            edges, join_type="inner", num_partitions=num_partitions,
            on=("node",), right_on=("src",),
        )

        def as_node(t: pa.Table) -> pa.Table:
            return pa.table({"node": t["dst"]})

        # distinct over keys only, then drop already-labeled nodes
        cand = (
            nbrs.map_batches(as_node, batch_format="pyarrow")
            .groupby("node")
            .count()
            .select_columns(["node"])
        )
        new = anti_join(
            cand, dist.select_columns(["node"]), on="node",
            num_partitions=num_partitions,
        )

        def with_d(t: pa.Table) -> pa.Table:
            return pa.table(
                {"node": t["node"],
                 "dist": pa.array([d] * t.num_rows, pa.int64())}
            )

        new = new.map_batches(with_d, batch_format="pyarrow").materialize()
        if new.count() == 0:
            break
        dist = dist.union(new).materialize()
        frontier = new

    return dist


def salted_join(big_ds, small_ds, on: str, salts: int | None = None,
                num_partitions: int | None = None):
    """Skew-defeating equi-join (INNER, small side must be unique on
    ``on``): a plain hash join sends EVERY row of a hot key to one
    partition — one straggler aggregator does all the work. Salting
    spreads it: each big-side row gets a deterministic salt in
    [0, salts), the small side is replicated once per salt value, and
    the join runs on the composite (key, salt) — a key with 10^9
    occurrences now occupies ``salts`` partitions instead of one.

    Use when BOTH sides are too large to broadcast and the key
    distribution is skewed; when the small side fits in the object
    store, a ``ray.put`` broadcast lookup (the repo-wide default) beats
    any shuffle join. Result equality to the unsalted join is exact:
    every big row matches exactly its own salt's replica. Salts default
    to the cluster CPU count (one straggler's work split across the
    whole cluster).
    """
    import ray

    if salts is None:
        salts = max(2, int(ray.cluster_resources().get("CPU", 8)))
    if num_partitions is None:
        num_partitions = default_join_partitions()

    def salt_big(t: pa.Table) -> pa.Table:
        # deterministic per-block: block content is deterministic under
        # task retries, so the salt assignment (and thus the join
        # output) is reproducible
        return t.append_column(
            "_salt", pa.array(np.arange(t.num_rows, dtype=np.int64) % salts)
        )

    def replicate_small(t: pa.Table) -> pa.Table:
        reps = [
            t.append_column(
                "_salt", pa.array(np.full(t.num_rows, s, dtype=np.int64))
            )
            for s in range(salts)
        ]
        return pa.concat_tables(reps)

    joined = big_ds.map_batches(salt_big, batch_format="pyarrow").join(
        small_ds.map_batches(replicate_small, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=num_partitions,
        on=(on, "_salt"),
    )
    return joined.drop_columns(["_salt"])
