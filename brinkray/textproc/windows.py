"""Stream-shaped operators over the events table.

Ray Data has no event-time windows; per the engine's streaming model
(SURVEY §2.9) the input is treated as a partitioned log: windows are
computed by bucketing the timestamp in a vectorized map_batches and
aggregating per (key, window) — exactly the partial-then-small-groupby
shape. Session windows need per-key ordering, so they run inside
``groupby(key).map_groups`` over ts-sorted groups.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "global_prefix_sum",
    "sequence_packing",
    "tumbling_counts",
    "tumbling_sums_fixed",
    "hopping_counts",
    "sessionize",
    "running_totals",
    "collect_ordered",
    "lag_deltas",
    "rolling_sums",
    "latest_per_key",
    "funnel_attribution",
    "pivot_counts",
    "daily_counts_gapfill",
    "dow_aggregate",
    "transition_counts",
    "active_days_per_key",
    "distinct_per_bucket",
    "pivot_sums",
    "trailing_window_sums",
    "debounce_events",
    "unpivot",
    "sliding_distinct_counts",
    "longest_streaks",
    "funnel_steps",
    "late_events",
]


def tumbling_counts(events_ds, window: str = "hour", key: str = "event_type"):
    """Tumbling-window counts + value sums per key.

    ``window``: 'hour' | 'day' | 'minute' — the bucket is the truncated
    timestamp (matches SQL date_trunc for exact oracle comparison).
    """
    from ray.data.aggregate import Count, Sum

    def bucket(t: pa.Table) -> pa.Table:
        w = pc.floor_temporal(t["ts"], unit=window)
        return pa.table(
            {
                key: t[key],
                "window_start": w,
                "value": t["value"],
            }
        )

    return (
        events_ds.map_batches(bucket, batch_format="pyarrow")
        .groupby([key, "window_start"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="value_sum"))
    )


def tumbling_sums_fixed(
    events_ds, window: str = "hour", key: str = "event_type", scale: int = 100
):
    """Tumbling-window counts + EXACT value sums.

    Float sums are not associative, so a distributed reduction's result
    depends on block order — unacceptable for a reproducible pipeline at
    100-TB scale. The value is scaled to fixed-point integer units
    (``floor(value * scale)``, int64) inside the vectorized bucket stage,
    making the shuffle-side Sum associative and bit-reproducible (and
    SQL-twinnable: ``SUM(CAST(floor(value*scale) AS BIGINT))``).
    """
    from ray.data.aggregate import Count, Sum

    def bucket(t: pa.Table) -> pa.Table:
        w = pc.floor_temporal(t["ts"], unit=window)
        cents = pc.cast(
            pc.floor(pc.multiply(t["value"], pa.scalar(float(scale)))), pa.int64()
        )
        return pa.table({key: t[key], "window_start": w, "value_cents": cents})

    return (
        events_ds.map_batches(bucket, batch_format="pyarrow")
        .groupby([key, "window_start"])
        .aggregate(Count(alias_name="n"), Sum("value_cents", alias_name="value_cents"))
    )


def hopping_counts(
    events_ds,
    window_minutes: int = 60,
    hop_minutes: int = 30,
    key: str = "event_type",
):
    """Hopping (sliding) windows: each event lands in
    ``window/hop`` overlapping windows; emission is a vectorized
    per-batch explode (numpy repeat) feeding ONE small groupby — the
    same partial-then-aggregate shape as tumbling windows, just with a
    bounded fan-out factor. Windows are aligned to the hop grid, so
    the result is SQL-twinnable as a union of shifted date_truncs."""
    from ray.data.aggregate import Count

    assert window_minutes % hop_minutes == 0
    k = window_minutes // hop_minutes
    hop_us = np.int64(hop_minutes * 60 * 1_000_000)

    def explode(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        grid = (ts // hop_us) * hop_us  # hop-aligned bucket of the event
        n = len(ts)
        keys = t[key].to_numpy(zero_copy_only=False)
        out_ws = np.empty(n * k, dtype=np.int64)
        for j in range(k):
            # window starting j hops back still contains the event
            out_ws[j * n : (j + 1) * n] = grid - j * hop_us
        out_keys = np.tile(keys, k)
        return pa.table(
            {
                key: pa.array(out_keys),
                "window_start": pa.array(out_ws, pa.int64()).cast(
                    pa.timestamp("us")
                ),
            }
        )

    return (
        events_ds.map_batches(explode, batch_format="pyarrow")
        .groupby([key, "window_start"])
        .aggregate(Count(alias_name="n"))
    )


def sessionize(events_ds, gap_minutes: float = 30.0, key: str = "user_id"):
    """Session windows per key: events sorted by ts; a gap larger than
    ``gap_minutes`` starts a new session. Returns one row per session:
    (key, session_start, session_end, n_events).

    Per-key state needs ordering, so this is the map_groups shape; the
    per-group body is vectorized (numpy diff over the sorted ts)."""
    gap = np.timedelta64(int(gap_minutes * 60), "s")

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        ts = g["ts"].to_numpy()
        if len(ts) == 0:
            return pd.DataFrame(
                {
                    key: pd.Series([], dtype="int64"),
                    "session_start": pd.Series([], dtype="datetime64[us]"),
                    "session_end": pd.Series([], dtype="datetime64[us]"),
                    "n_events": pd.Series([], dtype="int64"),
                }
            )
        new_session = np.concatenate(([True], np.diff(ts) > gap))
        sid = np.cumsum(new_session)
        df = pd.DataFrame({"sid": sid, "ts": ts})
        agg = df.groupby("sid")["ts"].agg(["min", "max", "count"]).reset_index()
        return pd.DataFrame(
            {
                key: np.repeat(g[key].iloc[0], len(agg)),
                "session_start": agg["min"],
                "session_end": agg["max"],
                "n_events": agg["count"].astype("int64"),
            }
        )

    return events_ds.select_columns([key, "ts"]).groupby(key).map_groups(
        per_key, batch_format="pandas"
    )


def running_totals(ds, key: str, ts_col: str, val_col: str, id_col: str,
                   scale: int = 100):
    """Per-key ORDERED cumulative sum — SQL's
    ``SUM(v) OVER (PARTITION BY key ORDER BY ts, id)`` as a distributed
    operator: one groupby(key) shuffle, then a vectorized
    mergesort + cumsum per group (ties broken by ``id_col`` so the
    running order — and therefore every intermediate total — is fully
    deterministic). Values are fixed-point int64 (floor(v*scale)):
    associative, bit-reproducible, SQL-twinnable.

    Scale note: a group's rows must fit one task (the per-customer /
    per-host order-history shape — bounded in practice); corpus-wide
    running totals (ONE giant key) are a different operator and would
    need a prefix-sum pass over sorted blocks.
    """

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.multiply(t[val_col], pa.scalar(float(scale)))), pa.int64()
        )
        return pa.table(
            {key: t[key], ts_col: t[ts_col], id_col: t[id_col], "v_cents": cents}
        )

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col], kind="mergesort")
        g = g.reset_index(drop=True)
        g["running_cents"] = g["v_cents"].cumsum()
        return g[[key, ts_col, id_col, "v_cents", "running_cents"]]

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(key)
        .map_groups(per_key, batch_format="pandas")
    )


def global_prefix_sum(ds, order_col: str, val_col: str):
    """Corpus-WIDE exclusive prefix sum over ``order_col`` order — the
    one-giant-key running total the per-key operator (running_totals)
    explicitly does not cover. SQL:
    ``SUM(v) OVER (ORDER BY order_col ROWS UNBOUNDED PRECEDING AND 1
    PRECEDING)``.

    Distributed shape (no single-task bottleneck): sort by
    ``order_col`` (range-partitioned blocks), one metadata pass ships
    (first_key, block_sum) per block to the driver, the driver
    prefix-sums those into per-block offsets (block count rows, not
    corpus rows), and a relabel pass adds offset + within-block
    exclusive cumsum. Appends ``prefix`` to the row schema."""
    import ray

    s = ds.sort(order_col).materialize()

    def block_meta(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"k": pa.array([], pa.int64()), "s": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "k": pa.array([t[order_col][0].as_py()], pa.int64()),
                "s": pa.array(
                    [int(pc.sum(t[val_col]).as_py() or 0)], pa.int64()
                ),
            }
        )

    meta = (
        s.map_batches(block_meta, batch_size=None, batch_format="pyarrow")
        .to_pandas()
        .sort_values("k")
    )
    sums = meta["s"].to_numpy()
    offsets = dict(zip(meta["k"], (sums.cumsum() - sums).astype(int)))
    off_ref = ray.put(offsets)

    def relabel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("prefix", pa.array([], pa.int64()))
        offs = ray.get(off_ref)
        base = offs[t[order_col][0].as_py()]
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pre = base + np.concatenate(([0], np.cumsum(v)[:-1]))
        return t.append_column("prefix", pa.array(pre, pa.int64()))

    return s.map_batches(relabel, batch_size=None, batch_format="pyarrow")


def sequence_packing(docs, window: int = 512, text_col="text",
                     id_col="doc_id"):
    """Training-sequence PACKING layout: stream the corpus in doc_id
    order, concatenate token streams, and cut fixed ``window``-token
    training sequences — each doc gets the bin it STARTS in and its
    token offset inside that bin (docs may span bins; the writer that
    materializes the packed shards follows this layout). Built on the
    corpus-wide exclusive prefix sum over whitespace token counts, so
    the layout is exact, deterministic, and SQL-twinnable (a window
    SUM). Returns (doc_id, n_tokens, bin, offset)."""

    def count_tokens(t: pa.Table) -> pa.Table:
        n = pa.array(
            [len(x.split()) for x in t[text_col].to_pylist()], pa.int64()
        )
        return pa.table({id_col: t[id_col], "n_tokens": n})

    counted = docs.select_columns([id_col, text_col]).map_batches(
        count_tokens, batch_format="pyarrow"
    )
    with_prefix = global_prefix_sum(counted, order_col=id_col,
                                    val_col="n_tokens")

    def finish(t: pa.Table) -> pa.Table:
        pre = t["prefix"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": t["n_tokens"],
                "bin": pa.array(pre // window, pa.int64()),
                "offset": pa.array(pre % window, pa.int64()),
            }
        )

    return with_prefix.map_batches(finish, batch_format="pyarrow")


def collect_ordered(ds, key: str, ts_col: str, id_col: str, val_col: str,
                    sep: str = ","):
    """Per-key ORDERED value concatenation — SQL's
    ``string_agg(v, sep ORDER BY ts, id)`` as a distributed operator
    (the build-a-prompt-per-session / event-history shape). One
    groupby(key) shuffle; per group a vectorized mergesort + join,
    ties broken by ``id_col`` so the string is deterministic.
    Returns (key, n_events, history). Same scale note as
    running_totals: one key's rows must fit one task.
    """

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col], kind="mergesort")
        return pd.DataFrame(
            {
                key: [g[key].iloc[0]],
                "n_events": [len(g)],
                "history": [sep.join(map(str, g[val_col]))],
            }
        )

    return (
        ds.select_columns([key, ts_col, id_col, val_col])
        .groupby(key)
        .map_groups(per_key, batch_format="pandas")
    )


def lag_deltas(ds, key: str, ts_col: str, id_col: str):
    """Per-key LAG: microseconds since the key's PREVIOUS event — SQL's
    ``ts - lag(ts) OVER (PARTITION BY key ORDER BY ts, id)`` as a
    distributed operator (the inter-arrival-time / session-feature
    shape). One groupby(key) shuffle; per group a vectorized
    mergesort + ``np.diff`` over int64 microseconds. The first event of
    a key gets delta_us = -1 (NULL-free => stable int64 schema across
    blocks). Same scale note as running_totals: one key's rows must
    fit one task.
    """

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col], kind="mergesort")
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        delta = np.empty(len(us), dtype=np.int64)
        delta[0] = -1
        if len(us) > 1:
            delta[1:] = np.diff(us)
        return pd.DataFrame(
            {
                key: g[key].to_numpy(),
                id_col: g[id_col].to_numpy(),
                "delta_us": delta,
            }
        )

    return (
        ds.select_columns([key, ts_col, id_col])
        .groupby(key)
        .map_groups(per_key, batch_format="pandas")
    )


def rolling_sums(ds, key: str, ts_col: str, id_col: str, val_col: str,
                 window_rows: int = 3, scale: int = 100):
    """Per-key moving-window sum over the last ``window_rows`` rows
    (current row inclusive) — SQL's ``SUM(v) OVER (PARTITION BY key
    ORDER BY ts, id ROWS BETWEEN N-1 PRECEDING AND CURRENT ROW)``.
    One groupby(key) shuffle; the per-group body is the O(n) cumsum
    difference trick (``cs[i] - cs[i-N]``), never a per-row window
    loop. Fixed-point int64 cents => associative, bit-reproducible,
    SQL-twinnable. Same scale note as running_totals.
    """

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.multiply(t[val_col], pa.scalar(float(scale)))), pa.int64()
        )
        return pa.table(
            {key: t[key], ts_col: t[ts_col], id_col: t[id_col], "v_cents": cents}
        )

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col], kind="mergesort").reset_index(drop=True)
        v = g["v_cents"].to_numpy()
        cs = np.concatenate(([0], np.cumsum(v)))
        lo = np.maximum(np.arange(len(v)) - (window_rows - 1), 0)
        g["rolling_cents"] = cs[1:] - cs[lo]
        return g[[key, id_col, "v_cents", "rolling_cents"]]

    return (
        ds.select_columns([key, ts_col, id_col, val_col])
        .map_batches(prep, batch_format="pyarrow")
        .groupby(key)
        .map_groups(per_key, batch_format="pandas")
    )


def latest_per_key(ds, key: str, order_cols: list[str], payload_cols: list[str]):
    """Keep each key's LAST row under ``order_cols`` ordering — the
    CDC-compaction / state-table primitive (SQL: ``row_number() OVER
    (PARTITION BY key ORDER BY ... DESC) = 1``). Two-level: each batch
    first reduces to one candidate row per key it sees (vectorized
    sort + drop_duplicates — so at most one row per (key, block)
    enters the exchange, the pre-aggregation rule), then ONE
    groupby(key) picks the global winner the same way. Ties must be
    broken by the caller including a unique id as the last order col.
    """
    cols = [key, *order_cols, *payload_cols]

    def best_in(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, *order_cols], kind="mergesort")
        return df.drop_duplicates(subset=[key], keep="last")[cols]

    return (
        ds.select_columns(cols)
        .map_batches(best_in, batch_format="pandas")
        .groupby(key)
        .map_groups(best_in, batch_format="pandas")
    )


def pivot_counts(ds, row_key: str, col_key: str, col_values: list[str]):
    """Long -> wide count pivot: one row per ``row_key``, one int64
    column per value in ``col_values`` (fixed, declared up front — a
    data-dependent column set is not a stable schema), counting rows
    with that ``col_key`` value. Per-batch vectorized crosstab
    partials, ONE groupby(row_key) sum — the conditional-aggregation
    shape (SQL: COUNT(*) FILTER (WHERE ...)).
    """
    from ray.data.aggregate import Sum

    cols = list(col_values)

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({row_key: t[row_key].to_pandas(),
                           "_c": t[col_key].to_pandas()})
        ct = pd.crosstab(df[row_key], df["_c"])
        out = {row_key: ct.index.to_numpy()}
        for c in cols:
            out["n_" + c] = (
                ct[c].to_numpy().astype(np.int64)
                if c in ct.columns
                else np.zeros(len(ct), dtype=np.int64)
            )
        return pa.Table.from_pydict(out)

    return (
        ds.select_columns([row_key, col_key])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(row_key)
        .aggregate(*[Sum("n_" + c, alias_name="n_" + c) for c in cols])
    )


def funnel_attribution(ds, key: str, ts_col: str, id_col: str, type_col: str,
                       first_type: str, then_type: str,
                       within_minutes: float = 60.0):
    """Funnel / attribution join — for every ``then_type`` event, the
    most recent preceding ``first_type`` event by the same key within
    the window (the click->purchase attribution primitive; a
    stream-stream interval join with last-wins semantics). One
    groupby(key) shuffle; per group both event streams are split and
    the probe is ONE vectorized searchsorted over the (ts, id)-sorted
    first-event stream — no per-row scanning. Unattributed events get
    source id -1 (NULL-free stable int64 schema). Ties at the same
    timestamp resolve to the highest id, deterministically.
    """
    window = np.timedelta64(int(within_minutes * 60 * 1_000_000), "us")

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col], kind="mergesort")
        srcs = g[g[type_col] == first_type]
        dsts = g[g[type_col] == then_type]
        out_src = np.full(len(dsts), -1, dtype=np.int64)
        if len(srcs) and len(dsts):
            s_ts = srcs[ts_col].to_numpy().astype("datetime64[us]")
            d_ts = dsts[ts_col].to_numpy().astype("datetime64[us]")
            idx = np.searchsorted(s_ts, d_ts, side="right") - 1
            ok = idx >= 0
            safe = np.maximum(idx, 0)
            ok &= s_ts[safe] >= (d_ts - window)
            out_src[ok] = srcs[id_col].to_numpy()[safe[ok]]
        return pd.DataFrame(
            {
                key: dsts[key].to_numpy(),
                "dst_id": dsts[id_col].to_numpy(),
                "src_id": out_src,
            }
        )

    return (
        ds.select_columns([key, ts_col, id_col, type_col])
        .groupby(key)
        .map_groups(per_key, batch_format="pandas")
    )


def daily_counts_gapfill(events_ds, ts_col: str = "ts"):
    """Daily event counts with empty days zero-filled over the [min, max]
    day range. The corpus-scale work is one vectorized day-truncate +
    per-block partial counts; the exchange carries <= |days| rows per
    block, and the gap fill runs on the driver over the result, whose
    size is bounded by the DATE RANGE (not the corpus) by construction.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        d = pc.floor_temporal(t[ts_col], unit="day")
        g = pa.table({"day": d}).group_by(["day"]).aggregate([([], "count_all")])
        return pa.table(
            {"day": g["day"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    got = (
        events_ds.select_columns([ts_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    got["day"] = pd.to_datetime(got["day"])
    full = pd.DataFrame(
        {"day": pd.date_range(got["day"].min(), got["day"].max(), freq="D")}
    )
    out = full.merge(got, on="day", how="left")
    out["n"] = out["n"].fillna(0).astype("int64")
    return out.sort_values("day").reset_index(drop=True)


def dow_aggregate(ds, ts_col: str, val_col: str):
    """Counts + exact fixed-point value sums per ISO day-of-week
    (1=Monday..7) — the date-scalar aggregation shape. pyarrow's
    day_of_week (0=Monday) + 1 matches SQL isodow exactly; one
    vectorized prep stage, ONE 7-row-bounded exchange.
    """
    from ray.data.aggregate import Count, Sum

    def prep(t: pa.Table) -> pa.Table:
        dow = pc.add(pc.day_of_week(t[ts_col]), pa.scalar(1))
        cents = pc.cast(
            pc.floor(pc.multiply(t[val_col], pa.scalar(100.0))), pa.int64()
        )
        return pa.table(
            {"dow": pc.cast(dow, pa.int64()), "cents": cents}
        )

    return (
        ds.select_columns([ts_col, val_col])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("dow")
        .aggregate(Count(alias_name="n"), Sum("cents", alias_name="total_cents"))
    )


def transition_counts(ds, key: str, ts_col: str, id_col: str, state_col: str):
    """Markov transition counts: how often state A is immediately
    followed by state B within a key's (ts, id)-ordered stream — SQL's
    LAG + pair GROUP BY, as the user-behavior transition-matrix
    operator. One groupby(key) shuffle; each group emits its PARTIAL
    pair counts (vectorized zip + value_counts), so the second exchange
    moves <= |states|^2 rows per key, and the final groupby sums them.
    Same partitioning note as lag_deltas: one key's rows fit one task.
    """
    from ray.data.aggregate import Sum

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col], kind="mergesort")
        s = g[state_col].to_numpy()
        if len(s) < 2:
            return pd.DataFrame(
                {
                    "prev_type": pd.Series([], dtype=str),
                    "next_type": pd.Series([], dtype=str),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        part = (
            pd.DataFrame({"prev_type": s[:-1], "next_type": s[1:]})
            .value_counts()
            .reset_index(name="n")
        )
        part["n"] = part["n"].astype("int64")
        return part

    return (
        ds.select_columns([key, ts_col, id_col, state_col])
        .groupby(key)
        .map_groups(per_key, batch_format="pandas")
        .groupby(["prev_type", "next_type"])
        .aggregate(Sum("n", alias_name="n"))
    )


def active_days_per_key(ds, key: str, ts_col: str):
    """Distinct active DAYS per key (computed-key COUNT DISTINCT):
    day-truncate is vectorized, each batch pre-dedups its (key, day)
    pairs, one groupby(key, day) collapses global duplicates, and a
    second |keys|-bounded groupby counts. Neither exchange carries
    more than one row per (key, day, block).
    """
    from ray.data.aggregate import Count

    def prep(t: pa.Table) -> pa.Table:
        d = pc.floor_temporal(t[ts_col], unit="day")
        return (
            pa.table({key: t[key], "day": d})
            .group_by([key, "day"])
            .aggregate([])
        )

    return (
        ds.select_columns([key, ts_col])
        .map_batches(prep, batch_format="pyarrow")
        .groupby([key, "day"])
        .aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
        .groupby(key)
        .aggregate(Count(alias_name="n_days"))
    )


def distinct_per_bucket(ds, ts_col: str, val_col: str):
    """Distinct values per DAY (e.g. daily active users) — the bucketed
    COUNT DISTINCT dual of active_days_per_key: vectorized
    day-truncate, per-block (day, value) pre-dedup, one global (day,
    value) collapse, then a |days|-bounded count. Neither exchange
    carries more than one row per (day, value, block).
    """
    from ray.data.aggregate import Count

    def prep(t: pa.Table) -> pa.Table:
        d = pc.floor_temporal(t[ts_col], unit="day")
        return (
            pa.table({"day": d, val_col: t[val_col]})
            .group_by(["day", val_col])
            .aggregate([])
        )

    return (
        ds.select_columns([ts_col, val_col])
        .map_batches(prep, batch_format="pyarrow")
        .groupby(["day", val_col])
        .aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
        .groupby("day")
        .aggregate(Count(alias_name="n_distinct"))
    )


def pivot_sums(ds, row_key: str, col_key: str, val_col: str,
               col_values: list[str], scale: int = 100):
    """Long -> wide SUM pivot (the value-aggregating sibling of
    pivot_counts): one row per ``row_key``, one int64 fixed-point sum
    column per declared ``col_values`` entry — SQL's ``SUM(v) FILTER
    (WHERE ...)``. Values floor to int64 units at the row level
    (associative => bit-reproducible); per-batch vectorized pivot_table
    partials feed ONE groupby(row_key) sum.
    """
    from ray.data.aggregate import Sum

    cols = list(col_values)

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.multiply(t[val_col], pa.scalar(float(scale)))),
            pa.int64(),
        )
        df = pd.DataFrame(
            {
                row_key: t[row_key].to_pandas(),
                "_c": t[col_key].to_pandas(),
                "_v": cents.to_pandas(),
            }
        )
        pt = df.pivot_table(index=row_key, columns="_c", values="_v",
                            aggfunc="sum", fill_value=0)
        out = {row_key: pt.index.to_numpy()}
        for c in cols:
            out["sum_" + c] = (
                pt[c].to_numpy().astype(np.int64)
                if c in pt.columns
                else np.zeros(len(pt), dtype=np.int64)
            )
        return pa.Table.from_pydict(out)

    return (
        ds.select_columns([row_key, col_key, val_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(row_key)
        .aggregate(*[Sum("sum_" + c, alias_name="sum_" + c) for c in cols])
    )


def trailing_window_sums(ds, key: str, ts_col: str, id_col: str,
                         val_col: str, window_minutes: float = 60.0,
                         scale: int = 100):
    """Per-key trailing TIME-window sum — SQL's ``SUM(v) OVER
    (PARTITION BY key ORDER BY ts RANGE BETWEEN INTERVAL w PRECEDING
    AND CURRENT ROW)`` — the RANGE-frame sibling of rolling_sums'
    ROWS frame. One groupby(key) shuffle; per group the window sum is
    cumsum[i] - cumsum[lo-1] with lo found by ONE vectorized
    searchsorted of (ts - w) over the sorted ts array — O(n log n) per
    group, no per-row scanning. RANGE semantics: ALL rows sharing the
    current timestamp are inside the frame (peers included), which the
    implementation gets by bucketing the cumsum at timestamp
    boundaries. Values fixed-point int64 => bit-reproducible.
    """

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.multiply(t[val_col], pa.scalar(float(scale)))), pa.int64()
        )
        return pa.table(
            {key: t[key], ts_col: t[ts_col], id_col: t[id_col],
             "v_cents": cents}
        )

    win = np.timedelta64(int(window_minutes * 60 * 1_000_000), "us")

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col], kind="mergesort").reset_index(drop=True)
        ts = g[ts_col].to_numpy().astype("datetime64[us]")
        v = g["v_cents"].to_numpy()
        cum = np.cumsum(v)
        # frame start: first index with ts >= current - window
        lo = np.searchsorted(ts, ts - win, side="left")
        # frame end: RANGE includes ALL peers of the current ts
        hi = np.searchsorted(ts, ts, side="right")  # exclusive
        sums = cum[hi - 1] - np.where(lo > 0, cum[lo - 1], 0)
        g["trailing_cents"] = sums.astype(np.int64)
        return g[[key, ts_col, id_col, "v_cents", "trailing_cents"]]

    return (
        ds.select_columns([key, ts_col, id_col, val_col])
        .map_batches(prep, batch_format="pyarrow")
        .groupby(key)
        .map_groups(per_key, batch_format="pandas")
    )


def debounce_events(ds, keys: list[str], ts_col: str, id_col: str,
                    window_minutes: float = 60.0):
    """Event debouncing: keep an event only if the PREVIOUS event with
    the same key tuple is more than ``window_minutes`` older (or there
    is none) — the stream-dedup primitive that collapses bursts
    (retry storms, double-clicks) to their leading edge. SQL: QUALIFY
    lag(ts) IS NULL OR ts - lag(ts) > INTERVAL w. One groupby(keys)
    shuffle; the per-group body is a vectorized diff over the
    (ts, id)-sorted stream. Note the lag chain compares each event to
    its immediate predecessor (kept or not) — this is LAG semantics,
    not a tumbling suppression window.
    """
    win = np.timedelta64(int(window_minutes * 60 * 1_000_000), "us")

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col], kind="mergesort").reset_index(drop=True)
        ts = g[ts_col].to_numpy().astype("datetime64[us]")
        keep = np.empty(len(ts), dtype=bool)
        keep[0] = True
        if len(ts) > 1:
            keep[1:] = np.diff(ts) > win
        return g.loc[keep, [*keys, ts_col, id_col]]

    return (
        ds.select_columns([*keys, ts_col, id_col])
        .groupby(keys)
        .map_groups(per_key, batch_format="pandas")
    )


def unpivot(ds, row_key: str, value_cols: list[str], name_col: str = "name",
            value_name: str = "n", strip_prefix: str = ""):
    """Wide -> long UNPIVOT: one output row per (row, value column),
    melting the declared ``value_cols`` into (name, value) pairs — the
    inverse of pivot_counts/pivot_sums. Pure vectorized map_batches
    (numpy repeat + concatenate), no shuffle; row count multiplies by
    len(value_cols) by definition.
    """

    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        keys = t[row_key].to_numpy(zero_copy_only=False)
        out_keys = np.repeat(keys, len(value_cols))
        names = np.tile(
            np.array(
                [c[len(strip_prefix):] if c.startswith(strip_prefix) else c
                 for c in value_cols],
                dtype=object,
            ),
            n,
        )
        vals = np.empty(n * len(value_cols), dtype=np.int64)
        for j, c in enumerate(value_cols):
            vals[j::len(value_cols)] = t[c].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                row_key: pa.array(out_keys),
                name_col: pa.array(names, pa.string()),
                value_name: pa.array(vals, pa.int64()),
            }
        )

    return ds.map_batches(melt, batch_format="pyarrow")


def sliding_distinct_counts(ds, ts_col: str, val_col: str,
                            window_days: int = 7):
    """Sliding-window COUNT DISTINCT — distinct values per trailing
    ``window_days`` ending on each day (the WAU curve): per-block
    (day, value) pre-dedup, a bounded explode of each pair into the
    window_days window-ends it belongs to (numpy repeat — fan-out is
    the window length, a constant), one global (window_end, value)
    collapse, then a |days|-bounded count. Window-ends run over
    day + 0..window_days-1 for every observed day (mirrors the SQL
    twin exactly; trailing ends beyond the data range carry partial
    windows by construction).
    """
    from ray.data.aggregate import Count

    day_us = np.int64(86_400_000_000)

    def explode(t: pa.Table) -> pa.Table:
        d = pc.floor_temporal(t[ts_col], unit="day")
        pairs = (
            pa.table({"day": d, val_col: t[val_col]})
            .group_by(["day", val_col])
            .aggregate([])
        )
        days = pairs["day"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        vals = pairs[val_col].to_numpy(zero_copy_only=False)
        k = window_days
        wend = np.repeat(days, k) + np.tile(
            np.arange(k, dtype=np.int64) * day_us, len(days)
        )
        return pa.table(
            {
                "window_end": pa.array(wend, pa.int64()).cast(pa.timestamp("us")),
                val_col: pa.array(np.repeat(vals, k)),
            }
        )

    return (
        ds.select_columns([ts_col, val_col])
        .map_batches(explode, batch_format="pyarrow")
        .groupby(["window_end", val_col])
        .aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
        .groupby("window_end")
        .aggregate(Count(alias_name="n_distinct"))
    )


def longest_streaks(events_ds, key: str = "user_id", ts_col: str = "ts"):
    """Longest run of CONSECUTIVE active days per key — the
    gaps-and-islands shape at day granularity (SQL: day - row_number()
    island trick over the per-key distinct days). Returns (key,
    streak).

    Shape: per-batch (key, day) projection, ONE groupby(key) whose
    vectorized body takes unique sorted day ordinals and finds the
    longest diff==1 run — per-key distinct-day state is bounded by the
    calendar, never by event volume, so even a hot key's group is tiny.
    """

    def to_days(t: pa.Table) -> pa.Table:
        days = t[ts_col].to_numpy().astype("datetime64[D]").astype(np.int64)
        return pa.table({key: t[key], "day": pa.array(days, pa.int64())})

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        days = np.unique(g["day"].to_numpy())
        # boundaries where the next day is NOT consecutive
        brk = np.concatenate(([0], np.flatnonzero(np.diff(days) != 1) + 1,
                              [len(days)]))
        streak = int(np.max(np.diff(brk)))
        return pd.DataFrame({key: [g[key].iloc[0]], "streak": [streak]})

    return (
        events_ds.select_columns([key, ts_col])
        .map_batches(to_days, batch_format="pyarrow")
        .groupby(key)
        .map_groups(per_key, batch_format="pandas")
    )


def funnel_steps(events_ds, steps: list[str], key: str = "user_id",
                 ts_col: str = "ts", type_col: str = "event_type"):
    """Ordered multi-step funnel: per key, the furthest step reached
    where step i+1 must occur AT OR AFTER the first qualifying
    occurrence of step i (the chained-MIN semantics:
    t1 = min ts of step1, t2 = min ts >= t1 of step2, ...). Returns
    (key, max_step) for keys that reached step 1; max_step in
    [1, len(steps)].

    Shape: the type filter prunes the stream to funnel events before
    the exchange, then ONE groupby(key) whose body is a handful of
    vectorized masked mins per key — per-key state is the funnel
    events of one user, bounded in practice.
    """
    wanted = list(steps)

    def prune(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t[type_col], value_set=pa.array(wanted))
        t = t.filter(mask)
        return pa.table(
            {key: t[key], type_col: t[type_col],
             "ts_us": t[ts_col].cast(pa.int64())}
        )

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts_us"].to_numpy()
        et = g[type_col].to_numpy()
        cur = np.int64(-(2**62))
        reached = 0
        for s in wanted:
            m = (et == s) & (ts >= cur)
            if not m.any():
                break
            cur = ts[m].min()
            reached += 1
        if reached == 0:
            return pd.DataFrame({key: g[key].iloc[:0],
                                 "max_step": pd.Series([], dtype="int64")})
        return pd.DataFrame({key: [g[key].iloc[0]],
                             "max_step": np.array([reached], dtype=np.int64)})

    return (
        events_ds.select_columns([key, type_col, ts_col])
        .map_batches(prune, batch_format="pyarrow")
        .groupby(key)
        .map_groups(per_key, batch_format="pandas")
    )


def late_events(events_ds, lateness_minutes: int = 60, key: str = "user_id",
                ts_col: str = "ts", seq_col: str = "event_id"):
    """Watermark / late-data detection (the streaming-semantics shape):
    an event is LATE if its event time trails the per-key watermark —
    the max event time seen earlier in ARRIVAL order (``seq_col``) —
    by more than the allowed lateness. Returns the late rows
    (key, seq, ts, lag_us).

    Shape: one groupby(key); the per-key body is a vectorized
    running-max over the arrival-sorted timestamps (np.maximum
    .accumulate) — the same bounded-per-key-state contract as the
    other window operators. A corpus-wide single watermark would
    instead need the range-partitioned prefix pass (range_rank's
    shape); per-key is the semantics real pipelines shard by.
    """
    lateness_us = np.int64(lateness_minutes) * 60 * 1_000_000

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                key: t[key],
                seq_col: t[seq_col],
                "ts_us": t[ts_col].cast(pa.int64()),
            }
        )

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(seq_col, kind="mergesort").reset_index(drop=True)
        ts = g["ts_us"].to_numpy()
        # watermark BEFORE each event: running max over the prefix
        wm = np.concatenate(([np.int64(-(2**62))],
                             np.maximum.accumulate(ts)[:-1]))
        lag = wm - ts
        late = lag > lateness_us
        out = g[late].copy()
        out["lag_us"] = lag[late]
        return out

    return (
        events_ds.select_columns([key, seq_col, ts_col])
        .map_batches(prep, batch_format="pyarrow")
        .groupby(key)
        .map_groups(per_key, batch_format="pandas")
    )
