"""Windowed aggregates, sessionization, as-of join, pair clustering."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _events_ds(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "value": pa.array([r[3] for r in rows], pa.float64()),
            }
        )
    )


TS = pd.Timestamp("2024-01-01 10:00:00")


def test_tumbling_counts(ray_session):
    from brinkray.textproc.windows import tumbling_counts

    rows = [
        (TS, 1, "click", 1.0),
        (TS + pd.Timedelta(minutes=10), 1, "click", 2.0),
        (TS + pd.Timedelta(hours=1), 2, "click", 3.0),
        (TS + pd.Timedelta(hours=1, minutes=5), 2, "view", 4.0),
    ]
    out = tumbling_counts(_events_ds(rows), window="hour").to_pandas()
    out = out.sort_values(["event_type", "window_start"]).reset_index(drop=True)
    assert len(out) == 3
    first = out[(out["event_type"] == "click")].reset_index(drop=True)
    assert list(first["n"]) == [2, 1]
    assert first["value_sum"].tolist() == [3.0, 3.0]


def test_tumbling_counts_matches_duckdb(ray_session):
    """Windowed aggregate vs SQL date_trunc on the real events table."""
    import duckdb

    import ray.data as rd
    from brinkray.textproc.windows import tumbling_counts

    sf = "/root/testdata/sf0.01"
    ds = rd.read_parquet(f"{sf}/events.parquet")
    got = (
        tumbling_counts(ds, window="hour")
        .to_pandas()
        .sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(
            f"""SELECT event_type, date_trunc('hour', ts) AS window_start,
                   COUNT(*) AS n, SUM(value) AS value_sum
            FROM read_parquet('{sf}/events.parquet')
            GROUP BY 1, 2 ORDER BY 1, 2"""
        )
        .df()
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert list(got["n"]) == list(want["n"])
    assert np.allclose(got["value_sum"], want["value_sum"])


def test_sessionize(ray_session):
    from brinkray.textproc.windows import sessionize

    rows = [
        (TS, 7, "c", 0.0),
        (TS + pd.Timedelta(minutes=5), 7, "c", 0.0),
        (TS + pd.Timedelta(hours=2), 7, "c", 0.0),  # gap > 30min: new session
        (TS, 8, "c", 0.0),
    ]
    out = sessionize(_events_ds(rows), gap_minutes=30).to_pandas()
    u7 = out[out["user_id"] == 7].sort_values("session_start")
    assert list(u7["n_events"]) == [2, 1]
    assert len(out[out["user_id"] == 8]) == 1


def test_asof_join_matches_pandas(ray_session):
    import ray.data as rd
    from brinkray.textproc.joins import asof_join

    rng = np.random.default_rng(5)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 60),
            "lts": pd.to_datetime(rng.integers(0, 10**6, 60), unit="s"),
            "lval": np.arange(60),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 40),
            "rts": pd.to_datetime(rng.integers(0, 10**6, 40), unit="s"),
            "price": rng.standard_normal(40).round(3),
        }
    )
    got = (
        asof_join(
            rd.from_pandas(left),
            rd.from_pandas(right),
            key="k",
            left_ts="lts",
            right_ts="rts",
            right_vals=["price"],
        )
        .to_pandas()
        .sort_values("lval")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("lts", kind="mergesort"),
        right.sort_values("rts", kind="mergesort"),
        left_on="lts",
        right_on="rts",
        by="k",
        direction="backward",
    ).sort_values("lval").reset_index(drop=True)[["k", "lts", "lval", "price"]]
    assert len(got) == len(want) == 60
    pd.testing.assert_frame_equal(
        got[["k", "lval", "price"]].astype({"price": "float64"}),
        want[["k", "lval", "price"]].astype({"price": "float64"}),
        check_dtype=False,
    )


def test_hopping_counts(ray_session):
    from brinkray.textproc.windows import hopping_counts

    rows = [
        (TS, 1, "click", 1.0),                               # 10:00
        (TS + pd.Timedelta(minutes=40), 1, "click", 1.0),    # 10:40
    ]
    out = hopping_counts(_events_ds(rows), window_minutes=60, hop_minutes=30)
    out = out.to_pandas().sort_values("window_start").reset_index(drop=True)
    # event@10:00 -> windows [09:30, 10:00]; event@10:40 -> [10:00, 10:30]
    got = {
        (str(r["window_start"]), int(r["n"])) for _, r in out.iterrows()
    }
    assert got == {
        ("2024-01-01 09:30:00", 1),
        ("2024-01-01 10:00:00", 2),
        ("2024-01-01 10:30:00", 1),
    }


def test_cluster_pairs(ray_session):
    import ray.data as rd
    from brinkray.textproc.joins import cluster_pairs

    pairs = rd.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([1, 2, 5, 9], pa.int64()),
                "doc_b": pa.array([2, 3, 6, 1], pa.int64()),
            }
        )
    )
    out = cluster_pairs(pairs).to_pandas().set_index("doc_id")["cluster"].to_dict()
    # components: {1,2,3,9} -> 1 and {5,6} -> 5
    assert out == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5}


def test_cluster_pairs_empty(ray_session):
    import ray.data as rd
    from brinkray.textproc.joins import cluster_pairs

    empty = rd.from_arrow(
        pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
        )
    )
    assert cluster_pairs(empty).count() == 0


def _ij_frames(seed=7, nl=120, nr=80, nk=6):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, nk, nl),
            "lts": pd.to_datetime(rng.integers(0, 10**6, nl), unit="s"),
            "lval": np.arange(nl),
        }
    )
    lo = rng.integers(0, 10**6, nr)
    span = rng.integers(0, 50_000, nr)  # seconds, < max_span below
    right = pd.DataFrame(
        {
            "k": rng.integers(0, nk, nr),
            "lo": pd.to_datetime(lo, unit="s"),
            "hi": pd.to_datetime(lo + span, unit="s"),
            "rval": np.arange(nr) + 1000,
        }
    )
    return left, right


def test_interval_join_matches_bruteforce(ray_session):
    import ray.data as rd
    from brinkray.textproc.joins import interval_join

    left, right = _ij_frames()
    got = (
        interval_join(
            rd.from_pandas(left),
            rd.from_pandas(right),
            key="k",
            left_ts="lts",
            right_lo="lo",
            right_hi="hi",
            right_vals=["rval"],
            max_span=np.timedelta64(50_000, "s"),
        )
        .to_pandas()
        .sort_values(["lval", "rval"])
        .reset_index(drop=True)
    )
    # brute force: cross join per key, closed-interval containment
    bf = left.merge(right, on="k")
    bf = bf[(bf["lts"] >= bf["lo"]) & (bf["lts"] <= bf["hi"])]
    bf = bf.sort_values(["lval", "rval"]).reset_index(drop=True)
    assert len(got) == len(bf) > 0
    pd.testing.assert_frame_equal(
        got[["k", "lval", "rval"]].astype("int64"),
        bf[["k", "lval", "rval"]].astype("int64"),
    )
    # dtype stability despite the null-padded union (the r01 asof miss)
    assert str(got["lval"].dtype) == "int64"
    assert str(got["rval"].dtype) == "int64"


def test_interval_join_max_span_violation_raises(ray_session):
    import ray.data as rd
    from brinkray.textproc.joins import interval_join

    left, right = _ij_frames()
    with pytest.raises(Exception, match="max_span"):
        interval_join(
            rd.from_pandas(left),
            rd.from_pandas(right),
            key="k",
            left_ts="lts",
            right_lo="lo",
            right_hi="hi",
            right_vals=["rval"],
            max_span=np.timedelta64(10, "s"),  # << real spans
        ).to_pandas()


def test_interval_join_empty_right(ray_session):
    import ray.data as rd
    from brinkray.textproc.joins import interval_join

    left, right = _ij_frames()
    out = interval_join(
        rd.from_pandas(left),
        rd.from_pandas(right.iloc[:0]),
        key="k",
        left_ts="lts",
        right_lo="lo",
        right_hi="hi",
        right_vals=["rval"],
        max_span=np.timedelta64(50_000, "s"),
    ).to_pandas()
    assert len(out) == 0
    # Ray drops the pandas schema when every output block is empty, so
    # the column set is either absent entirely or the full output schema
    assert set(out.columns) in (set(), {"k", "lts", "lval", "lo", "hi", "rval"})


def test_revenue_by_nation_matches_pandas(ray_session):
    import pandas as pd
    import ray.data as rd

    from brinkray.textproc.joins import revenue_by_nation

    rng = np.random.default_rng(9)
    orders = pd.DataFrame(
        {
            "o_custkey": rng.integers(1, 30, 200),
            "o_totalprice": (rng.integers(100, 10**6, 200) / 100.0),
        }
    )
    customer = pd.DataFrame(
        {"c_custkey": np.arange(1, 30), "c_nationkey": np.arange(1, 30) % 5}
    )
    nation = pd.DataFrame(
        {"n_nationkey": np.arange(5), "n_name": [f"NATION_{i}" for i in range(5)]}
    )
    got = (
        revenue_by_nation(
            rd.from_pandas(orders).repartition(4),
            rd.from_pandas(customer),
            rd.from_arrow(pa.Table.from_pandas(nation)),
            num_partitions=4,
        )
        .to_pandas()
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    merged = orders.merge(customer, left_on="o_custkey", right_on="c_custkey")
    merged["cents"] = (merged["o_totalprice"] * 100).round().astype("int64")
    want = (
        merged.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
        .groupby("n_name", as_index=False)["cents"]
        .sum()
        .rename(columns={"cents": "total_cents"})
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"total_cents": "int64"}), want.astype({"total_cents": "int64"})
    )


def test_anti_join_matches_pandas(ray_session):
    import ray.data as rd

    from brinkray.textproc.joins import anti_join

    left = pd.DataFrame({"k": np.arange(20, dtype=np.int64), "val": np.arange(20) * 2})
    right = pd.DataFrame({"rk": np.array([1, 3, 3, 5, 17, 99], dtype=np.int64)})
    got = (
        anti_join(
            rd.from_pandas(left).repartition(4),
            rd.from_pandas(right),
            on="k",
            right_on="rk",
            num_partitions=4,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = left[~left["k"].isin(right["rk"])].sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_running_totals_ties_and_order(ray_session):
    import ray.data as rd

    from brinkray.textproc.windows import running_totals

    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 2],
            "ts": pd.to_datetime(["2024-01-02", "2024-01-01", "2024-01-01", "2024-01-01"]),
            "id": [10, 11, 9, 1],
            "v": [1.5, 2.25, 4.0, 7.0],
        }
    )
    out = (
        running_totals(rd.from_pandas(df).repartition(3), key="k", ts_col="ts",
                       val_col="v", id_col="id")
        .to_pandas()
        .sort_values(["k", "ts", "id"])
        .reset_index(drop=True)
    )
    # k=1 order: (01-01, id 9, 400) -> (01-01, id 11, +225) -> (01-02, id 10, +150)
    assert out[out["k"] == 1]["running_cents"].tolist() == [400, 625, 775]
    assert out[out["k"] == 2]["running_cents"].tolist() == [700]


def test_pivot_counts_missing_value_fills_zero(ray_session):
    import ray.data as rd

    from brinkray.textproc.windows import pivot_counts

    df = pd.DataFrame({"u": [1, 1, 2], "e": ["a", "b", "a"]})
    out = (
        pivot_counts(rd.from_pandas(df).repartition(3), row_key="u", col_key="e",
                     col_values=["a", "b", "zzz"])
        .to_pandas()
        .sort_values("u")
        .reset_index(drop=True)
    )
    assert out["n_a"].tolist() == [1, 1]
    assert out["n_b"].tolist() == [1, 0]
    assert out["n_zzz"].tolist() == [0, 0]


def test_collect_ordered_deterministic_ties(ray_session):
    import ray.data as rd

    from brinkray.textproc.windows import collect_ordered

    df = pd.DataFrame(
        {
            "u": [1, 1, 1, 2],
            "ts": pd.to_datetime(
                ["2024-01-01", "2024-01-01", "2024-01-02", "2024-01-01"]
            ),
            "id": [5, 2, 9, 1],
            "e": ["b", "a", "c", "x"],
        }
    )
    out = (
        collect_ordered(rd.from_pandas(df).repartition(3), key="u", ts_col="ts",
                        id_col="id", val_col="e")
        .to_pandas()
        .sort_values("u")
        .reset_index(drop=True)
    )
    # tie at 2024-01-01 broken by id: id2 ('a') before id5 ('b')
    assert out["history"].tolist() == ["a,b,c", "x"]
    assert out["n_events"].tolist() == [3, 1]


def test_lag_deltas_first_event_minus_one(ray_session):
    import ray.data as rd

    from brinkray.textproc.windows import lag_deltas

    rows = [
        (TS, 1, "a", 0.0),
        (TS + pd.Timedelta(seconds=3), 1, "b", 0.0),
        (TS, 1, "tie", 0.0),           # same ts as event 0 -> id tiebreak
        (TS + pd.Timedelta(minutes=1), 2, "x", 0.0),
    ]
    out = (
        lag_deltas(_events_ds(rows), key="user_id", ts_col="ts", id_col="event_id")
        .to_pandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    # user 1 order: id0 (ts), id2 (ts, tie -> after id0), id1 (ts+3s)
    by_id = out.set_index("event_id")["delta_us"]
    assert by_id[0] == -1
    assert by_id[2] == 0          # tie at same ts
    assert by_id[1] == 3_000_000
    assert by_id[3] == -1         # user 2's first


def test_rolling_sums_window_and_brute_force(ray_session):
    import ray.data as rd

    from brinkray.textproc.windows import rolling_sums

    rng = np.random.default_rng(7)
    n = 300
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 50, n), unit="m"),
            "user_id": rng.integers(0, 9, n).astype(np.int64),
            "event_type": "e",
            "value": rng.uniform(0, 100, n),
        }
    )
    out = (
        rolling_sums(
            rd.from_pandas(df).repartition(5),
            key="user_id",
            ts_col="ts",
            id_col="event_id",
            val_col="value",
            window_rows=3,
        )
        .to_pandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    df["v_cents"] = np.floor(df["value"] * 100).astype(np.int64)
    exp = (
        df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        .assign(
            rolling_cents=lambda d: d.groupby("user_id")["v_cents"]
            .rolling(3, min_periods=1)
            .sum()
            .reset_index(level=0, drop=True)
            .astype(np.int64)
        )
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    assert out["rolling_cents"].tolist() == exp["rolling_cents"].tolist()
    assert out["v_cents"].tolist() == exp["v_cents"].tolist()


def test_latest_per_key_two_level_reduction(ray_session):
    import ray.data as rd

    from brinkray.textproc.windows import latest_per_key

    rows = [
        (TS, 1, "old", 0.0),
        (TS + pd.Timedelta(hours=2), 1, "new", 0.0),
        (TS + pd.Timedelta(hours=2), 1, "tie_low_id", 0.0),
        (TS, 2, "only", 0.0),
    ]
    # event_ids are 0..3; the tie at +2h is between ids 1 and 2 -> id 2 wins
    out = (
        latest_per_key(
            _events_ds(rows).repartition(4),
            key="user_id",
            order_cols=["ts", "event_id"],
            payload_cols=["event_type"],
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert out["event_type"].tolist() == ["tie_low_id", "only"]
    assert out["event_id"].tolist() == [2, 3]


def test_semi_join_bloom_equals_exact(ray_session):
    import ray.data as rd

    from brinkray.textproc.joins import semi_join

    rng = np.random.default_rng(11)
    left = pa.table({"k": pa.array(np.arange(500, dtype=np.int64)),
                     "payload": pa.array([f"p{i}" for i in range(500)])})
    right = pa.table({"rk": pa.array(rng.integers(0, 200, 300).astype(np.int64))})
    lds, rds = rd.from_arrow(left).repartition(4), rd.from_arrow(right).repartition(3)

    plain = semi_join(lds, rds, on="k", right_on="rk", num_partitions=4)
    bloom = semi_join(lds, rds, on="k", right_on="rk", num_partitions=4,
                      bloom_bits=1 << 12)
    a = plain.to_pandas().sort_values("k").reset_index(drop=True)
    b = bloom.to_pandas().sort_values("k").reset_index(drop=True)
    expected = sorted(set(right["rk"].to_pylist()))
    assert a["k"].tolist() == expected
    assert b["k"].tolist() == expected          # bloom never changes the result
    assert a["payload"].tolist() == b["payload"].tolist()
    # no fan-out duplication from multi-match right keys
    assert a["k"].is_unique


def test_semi_join_tiny_bloom_still_exact(ray_session):
    """A deliberately saturated bloom (64 bits for 300 keys) must only
    cost pruning power, never correctness."""
    import ray.data as rd

    from brinkray.textproc.joins import semi_join

    left = rd.from_arrow(pa.table({"k": pa.array(np.arange(100, dtype=np.int64))}))
    right = rd.from_arrow(pa.table({"k": pa.array(np.array([5, 7, 99], np.int64))}))
    out = semi_join(left, right, on="k", num_partitions=2, bloom_bits=64,
                    bloom_hashes=2).to_pandas()
    assert sorted(out["k"].tolist()) == [5, 7, 99]


def test_pagerank_integer_recurrence(ray_session):
    import ray.data as rd

    from brinkray.textproc.joins import pagerank

    # A -> B, A -> C, B -> C, C -> A, D dangling, E isolated
    nodes = ["a", "b", "c", "d", "e"]
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "a")]
    nds = rd.from_arrow(pa.table({"node": pa.array(nodes)})).repartition(2)
    eds = rd.from_arrow(
        pa.table(
            {
                "parent": pa.array([p for p, _ in edges]),
                "child": pa.array([c for _, c in edges]),
            }
        )
    ).repartition(2)
    out = (
        pagerank(nds, eds, iters=5, scale=10**12, num_partitions=2)
        .to_pandas()
        .set_index("node")["r"]
    )

    scale = 10**12
    r0 = scale // len(nodes)
    base = (15 * r0) // 100
    r = {n: r0 for n in nodes}
    od = {}
    for p, _ in edges:
        od[p] = od.get(p, 0) + 1
    for _ in range(5):
        s = {n: 0 for n in nodes}
        for p, c in edges:
            s[c] += r[p] // od[p]
        r = {n: base + (85 * s[n]) // 100 for n in nodes}
    assert out.to_dict() == r
    # structure sanity: c (two in-links incl. the hub) outranks b; the
    # isolated node sits at base
    assert r["c"] > r["b"] > r["e"] == base
    # broadcast-ranks path (default here) == native-join path, bit for
    # bit (max_broadcast_nodes=0 forces the join path)
    joined = (
        pagerank(nds, eds, iters=5, scale=10**12, num_partitions=2,
                 max_broadcast_nodes=0)
        .to_pandas()
        .set_index("node")["r"]
    )
    assert joined.to_dict() == r


def test_pagerank_broadcast_drops_unknown_endpoints(ray_session):
    """Edges whose parent or child is absent from nodes_ds: the
    broadcast path used an unmasked searchsorted that credited the
    lexicographic neighbor (or IndexError'd past the last node) where
    the join path silently drops the edge. Both paths must now agree —
    including an endpoint sorting BEYOND the last node ('zzz')."""
    import ray.data as rd

    from brinkray.textproc.joins import pagerank

    nodes = ["a", "b", "c"]
    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),
        ("a", "zzz"),   # known parent -> unknown child: counts in
                        # out-degree, contributes nothing
        ("qq", "a"),    # unknown parent: dropped entirely
        ("zzz", "b"),   # unknown parent past the last node (the
                        # IndexError shape)
    ]
    nds = rd.from_arrow(pa.table({"node": pa.array(nodes)})).repartition(2)
    eds = rd.from_arrow(
        pa.table(
            {
                "parent": pa.array([p for p, _ in edges]),
                "child": pa.array([c for _, c in edges]),
            }
        )
    ).repartition(2)
    broadcast = (
        pagerank(nds, eds, iters=4, scale=10**12, num_partitions=2)
        .to_pandas().set_index("node")["r"].to_dict()
    )
    joined = (
        pagerank(nds, eds, iters=4, scale=10**12, num_partitions=2,
                 max_broadcast_nodes=0)
        .to_pandas().set_index("node")["r"].to_dict()
    )
    assert broadcast == joined
    # reference recurrence with the drop semantics: od('a') == 2 (the
    # edge to 'zzz' still divides a's rank), qq/zzz edges gone
    scale = 10**12
    r0 = scale // 3
    base = (15 * r0) // 100
    od = {"a": 2, "b": 1, "c": 1}
    r = {n: r0 for n in nodes}
    for _ in range(4):
        s = {n: 0 for n in nodes}
        for p, c in [("a", "b"), ("b", "c"), ("c", "a")]:
            s[c] += r[p] // od[p]
        r = {n: base + (85 * s[n]) // 100 for n in nodes}
    assert broadcast == r


def test_funnel_attribution_semantics(ray_session):
    from brinkray.textproc.windows import funnel_attribution

    rows = [
        (TS, 1, "click", 0.0),                                   # id 0
        (TS + pd.Timedelta(minutes=30), 1, "purchase", 0.0),     # id 1 -> 2 (click at same ts counts)
        (TS + pd.Timedelta(minutes=30), 1, "click", 0.0),        # id 2 (same ts as purchase 1)
        (TS + pd.Timedelta(minutes=31), 1, "purchase", 0.0),     # id 3 -> 2 (latest click)
        (TS + pd.Timedelta(hours=5), 1, "purchase", 0.0),        # id 4 -> -1 (window 1h)
        (TS, 2, "purchase", 0.0),                                # id 5 -> -1 (no click)
    ]
    out = (
        funnel_attribution(
            _events_ds(rows).repartition(3),
            key="user_id", ts_col="ts", id_col="event_id",
            type_col="event_type", first_type="click", then_type="purchase",
            within_minutes=60,
        )
        .to_pandas()
        .set_index("dst_id")["src_id"]
    )
    assert out.to_dict() == {1: 2, 3: 2, 4: -1, 5: -1}


def test_daily_counts_gapfill(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from brinkray.textproc.windows import daily_counts_gapfill

    # days 0, 1, 5 present; 2-4 must appear as zeros
    ts = pd.to_datetime(
        ["2024-01-01 03:00", "2024-01-01 09:30", "2024-01-02 00:00",
         "2024-01-06 23:59", "2024-01-06 01:00"]
    )
    ds = rd.from_arrow(
        pa.table({"ts": pa.array(ts).cast(pa.timestamp("us"))})
    ).repartition(3)
    out = daily_counts_gapfill(ds)
    assert len(out) == 6
    assert out["n"].tolist() == [2, 1, 0, 0, 0, 2]
    assert out["day"].iloc[2] == pd.Timestamp("2024-01-03")
    assert out["n"].sum() == 5
    assert (np.diff(out["day"].to_numpy()).astype("timedelta64[D]")
            == np.timedelta64(1, "D")).all()


def test_left_outer_totals_zero_fill(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from brinkray.textproc.joins import left_outer_totals

    cust = rd.from_arrow(
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
                "c_name": pa.array(["a", "b", "c", "d"]),
            }
        )
    ).repartition(2)
    orders = rd.from_arrow(
        pa.table(
            {
                "o_custkey": pa.array([1, 1, 3], pa.int64()),
                "o_totalprice": pa.array([10.5, 20.25, 7.999]),
            }
        )
    ).repartition(2)
    out = (
        left_outer_totals(cust, orders, num_partitions=2)
        .to_pandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    assert out["n_orders"].tolist() == [2, 0, 1, 0]
    assert out["spend_cents"].tolist() == [1050 + 2025, 0, 799, 0]
    assert out["n_orders"].dtype == np.int64


def test_group_shares_sums_to_one(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from brinkray.textproc.relagg import group_shares

    ds = rd.from_arrow(
        pa.table({"k": pa.array(["x"] * 6 + ["y"] * 3 + ["z"], pa.string())})
    ).repartition(3)
    out = group_shares(ds, "k").to_pandas().sort_values("k").reset_index(drop=True)
    assert out["n"].tolist() == [6, 3, 1]
    assert out["share"].tolist() == [0.6, 0.3, 0.1]


def test_dow_aggregate_isodow(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from brinkray.textproc.windows import dow_aggregate

    # 2024-01-01 is a Monday
    ts = pd.to_datetime(["2024-01-01", "2024-01-01", "2024-01-07", "2024-01-03"])
    ds = rd.from_arrow(
        pa.table(
            {
                "ts": pa.array(ts).cast(pa.timestamp("us")),
                "v": pa.array([1.015, 2.0, 3.5, 4.999]),
            }
        )
    ).repartition(2)
    out = (
        dow_aggregate(ds, "ts", "v")
        .to_pandas()
        .sort_values("dow")
        .reset_index(drop=True)
    )
    assert out["dow"].tolist() == [1, 3, 7]      # Mon, Wed, Sun
    assert out["n"].tolist() == [2, 1, 1]
    assert out["total_cents"].tolist() == [101 + 200, 499, 350]


def test_transition_counts_per_key_order(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from brinkray.textproc.windows import transition_counts

    ts = pd.to_datetime(
        ["2024-01-01 00:00", "2024-01-01 00:01", "2024-01-01 00:02",
         "2024-01-01 00:00", "2024-01-01 00:01",
         "2024-01-01 00:05"]
    )
    ds = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
                "event_id": pa.array([10, 11, 12, 20, 21, 30], pa.int64()),
                "ts": pa.array(ts).cast(pa.timestamp("us")),
                "event_type": pa.array(["a", "b", "a", "a", "b", "x"]),
            }
        )
    ).repartition(3)
    out = (
        transition_counts(ds, "user_id", "ts", "event_id", "event_type")
        .to_pandas()
        .sort_values(["prev_type", "next_type"])
        .reset_index(drop=True)
    )
    # user 1: a->b, b->a; user 2: a->b; user 3 has one event (none)
    assert list(zip(out["prev_type"], out["next_type"], out["n"])) == [
        ("a", "b", 2),
        ("b", "a", 1),
    ]


def test_active_days_per_key(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from brinkray.textproc.windows import active_days_per_key

    ts = pd.to_datetime(
        ["2024-01-01 05:00", "2024-01-01 23:00", "2024-01-02 00:00",
         "2024-03-07 12:00"]
    )
    ds = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1, 1, 2], pa.int64()),
                "ts": pa.array(ts).cast(pa.timestamp("us")),
            }
        )
    ).repartition(2)
    out = (
        active_days_per_key(ds, "user_id", "ts")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert out["n_days"].tolist() == [2, 1]


def test_full_outer_counts_zero_fill_both_sides(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from brinkray.textproc.joins import full_outer_counts

    left = rd.from_arrow(
        pa.table({"k": pa.array([1, 1, 2], pa.int64())})
    ).repartition(2)
    right = rd.from_arrow(
        pa.table({"k": pa.array([2, 3, 3, 3], pa.int64())})
    ).repartition(2)
    out = (
        full_outer_counts(left, right, "k")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == [1, 2, 3]
    assert out["n_left"].tolist() == [2, 1, 0]
    assert out["n_right"].tolist() == [0, 1, 3]


def test_distinct_per_bucket_daily_users(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from brinkray.textproc.windows import distinct_per_bucket

    ts = pd.to_datetime(
        ["2024-01-01 01:00", "2024-01-01 02:00", "2024-01-01 03:00",
         "2024-01-02 01:00", "2024-01-02 02:00"]
    )
    ds = rd.from_arrow(
        pa.table(
            {
                "ts": pa.array(ts).cast(pa.timestamp("us")),
                "user_id": pa.array([1, 1, 2, 3, 3], pa.int64()),
            }
        )
    ).repartition(3)
    out = (
        distinct_per_bucket(ds, "ts", "user_id")
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    assert out["n_distinct"].tolist() == [2, 1]


def test_cross_join_small_product(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from brinkray.textproc.joins import cross_join_small

    left = rd.from_arrow(
        pa.table({"a": pa.array(["x", "y", "z"])})
    ).repartition(2)
    right = rd.from_arrow(pa.table({"b": pa.array([1, 2], pa.int64())}))
    out = (
        cross_join_small(left, right, ["a"], ["b"])
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert len(out) == 6
    assert list(zip(out["a"], out["b"])) == [
        ("x", 1), ("x", 2), ("y", 1), ("y", 2), ("z", 1), ("z", 2)
    ]


def test_pivot_sums_fixed_point(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from brinkray.textproc.windows import pivot_sums

    ds = rd.from_arrow(
        pa.table(
            {
                "u": pa.array([1, 1, 1, 2, 2], pa.int64()),
                "t": pa.array(["a", "a", "b", "b", "c"]),
                "v": pa.array([1.015, 2.0, 3.5, 0.999, 7.0]),
            }
        )
    ).repartition(3)
    out = (
        pivot_sums(ds, "u", "t", "v", ["a", "b"])
        .to_pandas()
        .sort_values("u")
        .reset_index(drop=True)
    )
    # floor(v*100): 101+200, 350 | 99 ; 'c' column not declared -> absent
    assert list(out.columns) == ["u", "sum_a", "sum_b"]
    assert out["sum_a"].tolist() == [301, 0]
    assert out["sum_b"].tolist() == [350, 99]


def test_trailing_window_sums_range_peers(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from brinkray.textproc.windows import trailing_window_sums

    # user 1: events at t0, t0+30m, t0+30m (peer), t0+90m
    ts = pd.to_datetime(
        ["2024-01-01 00:00", "2024-01-01 00:30", "2024-01-01 00:30",
         "2024-01-01 01:30"]
    )
    ds = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1, 1, 1], pa.int64()),
                "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                "ts": pa.array(ts).cast(pa.timestamp("us")),
                "value": pa.array([1.0, 2.0, 4.0, 8.0]),
            }
        )
    ).repartition(2)
    out = (
        trailing_window_sums(ds, "user_id", "ts", "event_id", "value",
                             window_minutes=60.0)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # RANGE frame: peers at the same ts are both included (events 2,3);
    # at t0+90m the frame [t0+30m, t0+90m] includes events 2,3,4 but
    # not event 1 (inclusive lower bound: ts >= current - 60m)
    assert out["trailing_cents"].tolist() == [100, 700, 700, 1400]


def test_debounce_events_lag_semantics(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from brinkray.textproc.windows import debounce_events

    # bursts: events at 0, 10m, 45m — LAG semantics keeps 0 and NOT 10m
    # (10m gap) and NOT 45m (35m gap from the DROPPED 10m event? no:
    # LAG compares to the immediate predecessor regardless of keep, so
    # 45m - 10m = 35m > 30m -> kept)
    ts = pd.to_datetime(
        ["2024-01-01 00:00", "2024-01-01 00:10", "2024-01-01 00:45",
         "2024-01-01 00:00"]
    )
    ds = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1, 1, 2], pa.int64()),
                "event_type": pa.array(["a", "a", "a", "a"]),
                "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                "ts": pa.array(ts).cast(pa.timestamp("us")),
            }
        )
    ).repartition(2)
    out = (
        debounce_events(ds, ["user_id", "event_type"], "ts", "event_id",
                        window_minutes=30.0)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out["event_id"].tolist() == [1, 3, 4]


def test_unpivot_inverse_of_pivot(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from brinkray.textproc.windows import pivot_counts, unpivot

    ds = rd.from_arrow(
        pa.table(
            {
                "u": pa.array([1, 1, 2], pa.int64()),
                "t": pa.array(["a", "b", "a"]),
            }
        )
    ).repartition(2)
    wide = pivot_counts(ds, "u", "t", ["a", "b"])
    long = (
        unpivot(wide, "u", ["n_a", "n_b"], name_col="t", value_name="n",
                strip_prefix="n_")
        .to_pandas()
        .sort_values(["u", "t"])
        .reset_index(drop=True)
    )
    assert list(zip(long["u"], long["t"], long["n"])) == [
        (1, "a", 1), (1, "b", 1), (2, "a", 1), (2, "b", 0)
    ]


def test_sliding_distinct_counts(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from brinkray.textproc.windows import sliding_distinct_counts

    # users: day0 {1,2}, day1 {2}, day3 {3}
    ts = pd.to_datetime(
        ["2024-01-01 01:00", "2024-01-01 02:00", "2024-01-02 01:00",
         "2024-01-04 01:00"]
    )
    ds = rd.from_arrow(
        pa.table(
            {
                "ts": pa.array(ts).cast(pa.timestamp("us")),
                "user_id": pa.array([1, 2, 2, 3], pa.int64()),
            }
        )
    ).repartition(2)
    out = (
        sliding_distinct_counts(ds, "ts", "user_id", window_days=3)
        .to_pandas()
        .sort_values("window_end")
        .reset_index(drop=True)
    )
    got = {
        str(r["window_end"].date()): r["n_distinct"] for _, r in out.iterrows()
    }
    # window ending day d covers days d-2..d
    assert got["2024-01-01"] == 2          # {1,2}
    assert got["2024-01-02"] == 2          # {1,2}
    assert got["2024-01-03"] == 2          # {1,2} (day0 still in range)
    assert got["2024-01-04"] == 2          # {2 (day1), 3 (day3)}
    assert got["2024-01-06"] == 1          # {3}


def test_longest_streaks_islands(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from brinkray.textproc.windows import longest_streaks

    # user 1: days 1,2,3 then 5,6 -> streak 3; user 2: one day -> 1
    ts = pd.to_datetime(
        ["2024-01-01", "2024-01-02 05:00", "2024-01-02 09:00", "2024-01-03",
         "2024-01-05", "2024-01-06", "2024-02-01"],
        format="mixed",
    ).values.astype("datetime64[us]")
    users = [1, 1, 1, 1, 1, 1, 2]
    ds = rd.from_arrow(
        pa.table({"user_id": pa.array(users, pa.int64()),
                  "ts": pa.array(ts, pa.timestamp("us"))})
    )
    out = (
        longest_streaks(ds).to_pandas().sort_values("user_id")
        .reset_index(drop=True)
    )
    assert out["user_id"].tolist() == [1, 2]
    assert out["streak"].tolist() == [3, 1]


def test_enumerate_triangles_exact(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from brinkray.textproc.joins import enumerate_triangles

    # triangle (1,2,3) + edge to 4 closing a second triangle (1,3,4)
    ea = [1, 1, 2, 3, 1]
    eb = [2, 3, 3, 4, 4]
    edges = rd.from_arrow(
        pa.table({"item_a": pa.array(ea, pa.int64()),
                  "item_b": pa.array(eb, pa.int64())})
    )
    out = (
        enumerate_triangles(edges).to_pandas()
        .sort_values(["a", "b", "c"]).reset_index(drop=True)
    )
    assert list(map(tuple, out.to_numpy())) == [(1, 2, 3), (1, 3, 4)]


def test_bfs_distances_hops(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from brinkray.textproc.joins import bfs_distances

    # path 1-2-3-4 plus shortcut 1-3; isolated edge 8-9
    edges = rd.from_arrow(
        pa.table({"item_a": pa.array([1, 2, 3, 1, 8], pa.int64()),
                  "item_b": pa.array([2, 3, 4, 3, 9], pa.int64())})
    )
    out = (
        bfs_distances(edges, [1], max_depth=6).to_pandas()
        .sort_values("node").reset_index(drop=True)
    )
    assert dict(zip(out["node"], out["dist"])) == {1: 0, 2: 1, 3: 1, 4: 2}


def test_funnel_steps_chained_ordering(ray_session):
    from brinkray.textproc.windows import funnel_steps

    rows = [
        # user 1: full funnel in order
        (TS, 1, "view", 0.0),
        (TS + pd.Timedelta(minutes=1), 1, "click", 0.0),
        (TS + pd.Timedelta(minutes=2), 1, "purchase", 0.0),
        # user 2: purchase BEFORE the first view-anchored click -> step 2
        (TS, 2, "purchase", 0.0),
        (TS + pd.Timedelta(minutes=1), 2, "view", 0.0),
        (TS + pd.Timedelta(minutes=2), 2, "click", 0.0),
        # user 3: never viewed -> absent
        (TS, 3, "click", 0.0),
    ]
    out = (
        funnel_steps(_events_ds(rows), ["view", "click", "purchase"])
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    assert out["user_id"].tolist() == [1, 2]
    assert out["max_step"].tolist() == [3, 2]


def test_late_events_watermark(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from brinkray.textproc.windows import late_events

    base = pd.Timestamp("2024-01-01").value // 1000
    hour = 3_600_000_000
    # arrival order: seq; event at seq 3 is 3h older than the watermark
    rows = {
        "user_id": [1, 1, 1, 1],
        "event_id": [10, 11, 12, 13],
        "ts": [base, base + 4 * hour, base + hour, base + 5 * hour],
    }
    t = pa.table(
        {
            "user_id": pa.array(rows["user_id"], pa.int64()),
            "event_id": pa.array(rows["event_id"], pa.int64()),
            "ts": pa.array(rows["ts"], pa.int64()).cast(pa.timestamp("us")),
        }
    )
    out = late_events(
        rd.from_arrow(t), lateness_minutes=120, seq_col="event_id"
    ).to_pandas()
    assert out["event_id"].tolist() == [12]
    assert out["lag_us"].tolist() == [3 * hour]


def test_asof_join_forward_matches_pandas(ray_session):
    import ray.data as rd
    from brinkray.textproc.joins import asof_join

    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 4, 50),
            "lts": pd.to_datetime(rng.integers(0, 10**6, 50), unit="s"),
            "lval": np.arange(50),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 4, 30),
            "rts": pd.to_datetime(rng.integers(0, 10**6, 30), unit="s"),
            "price": rng.standard_normal(30).round(3),
        }
    )
    got = (
        asof_join(
            rd.from_pandas(left), rd.from_pandas(right),
            key="k", left_ts="lts", right_ts="rts",
            right_vals=["price"], direction="forward",
        )
        .to_pandas().sort_values("lval").reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("lts", kind="mergesort"),
        right.sort_values("rts", kind="mergesort"),
        left_on="lts", right_on="rts", by="k", direction="forward",
    ).sort_values("lval").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "lval", "price"]].astype({"price": "float64"}),
        want[["k", "lval", "price"]].astype({"price": "float64"}),
        check_dtype=False,
    )


def test_hits_matches_dense_reference(ray_session):
    """Distributed HITS == a dense numpy reference (unnormalized
    integer recurrence, h0=1) on a random-ish digraph."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from brinkray.textproc.joins import hits

    n = 30
    names = [f"n{i:02d}" for i in range(n)]
    rng = np.random.default_rng(4)
    adj = rng.random((n, n)) < 0.12
    np.fill_diagonal(adj, False)
    ps, cs = np.nonzero(adj)
    edges = rd.from_arrow(
        pa.table(
            {
                "parent": pa.array([names[i] for i in ps], pa.string()),
                "child": pa.array([names[j] for j in cs], pa.string()),
            }
        )
    )
    nodes = rd.from_arrow(pa.table({"node": pa.array(names, pa.string())}))
    a = np.zeros(n, dtype=np.int64)
    h = np.ones(n, dtype=np.int64)
    A = adj.astype(np.int64)
    for _ in range(2):
        a = A.T @ h
        h = A @ a
    # both execution paths: broadcast-scores (small graph) and the
    # join-based large-graph shape (forced via max_broadcast_nodes=0)
    for mbn in (2_000_000, 0):
        out = (
            hits(nodes, edges, iters=2, num_partitions=4,
                 max_broadcast_nodes=mbn)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        assert out["auth"].tolist() == a.tolist()
        assert out["hub"].tolist() == h.tolist()


def test_cosine_topk_multi_matches_single(ray_session):
    """One-pass multi-query top-k == per-query brute force."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from brinkray.textproc.similarity import cosine_topk, cosine_topk_multi

    rng = np.random.default_rng(8)
    vecs = rng.standard_normal((200, 12))
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs],
                                      pa.list_(pa.float32())),
            }
        )
    )
    qs = vecs[:3].astype(np.float32).astype(np.float64)
    multi = cosine_topk_multi(ds, qs, k=7).to_pandas()
    for j in range(3):
        single = cosine_topk(ds, qs[j], k=7)
        got = multi[multi["qid"] == j]["vec_id"].tolist()
        assert got == single["vec_id"].to_pylist()


def test_global_prefix_sum_matches_cumsum(ray_session):
    """Distributed corpus-wide prefix sum == driver cumsum, across an
    adversarial block layout (repartitioned, unsorted input)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from brinkray.textproc.windows import global_prefix_sum

    rng = np.random.default_rng(12)
    order = rng.permutation(3000).astype(np.int64)
    vals = rng.integers(0, 50, size=3000).astype(np.int64)
    ds = rd.from_arrow(
        pa.table({"k": pa.array(order), "v": pa.array(vals)})
    ).repartition(13)
    out = (
        global_prefix_sum(ds, "k", "v").to_pandas()
        .sort_values("k").reset_index(drop=True)
    )
    want = np.zeros(3000, dtype=np.int64)
    sorted_vals = vals[np.argsort(order, kind="stable")]
    want[1:] = np.cumsum(sorted_vals)[:-1]
    assert out["prefix"].tolist() == want.tolist()


def test_salted_join_equals_plain_join(ray_session):
    """Salting only changes the partitioning: result must equal the
    unsalted inner join, including dropped (unmatched) keys, on a
    deliberately skewed big side."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from brinkray.textproc.joins import salted_join

    # 10k rows, 90% one hot key
    keys = ["hot" if i % 10 != 9 else f"cold{i % 7}" for i in range(10_000)]
    big = pa.table(
        {
            "k": pa.array(keys, pa.string()),
            "v": pa.array(list(range(10_000)), pa.int64()),
        }
    )
    small = pa.table(
        {
            "k": pa.array(["hot", "cold1", "cold3", "unmatched"], pa.string()),
            "m": pa.array([2, 3, 5, 7], pa.int64()),
        }
    )
    out = (
        salted_join(
            rd.from_arrow(big).repartition(8), rd.from_arrow(small), on="k",
            salts=4,
        )
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    want = (
        pd.merge(big.to_pandas(), small.to_pandas(), on="k", how="inner")
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out[["k", "v", "m"]], want[["k", "v", "m"]]
    )


def test_random_walks_equals_bruteforce(ray_session):
    """md5-argmin walks == a sequential per-node walk, incl. a dead end
    (walk stops) and a 2-cycle (walk continues through revisits because
    the hash varies by step)."""
    import hashlib

    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from brinkray.textproc.joins import random_walks

    edges = [
        ("a", "b"), ("a", "c"), ("b", "a"), ("b", "d"),
        ("c", "d"),  # d is a dead end
        ("e", "f"), ("f", "e"),  # 2-cycle
    ]
    eds = rd.from_arrow(
        pa.table(
            {
                "parent": pa.array([p for p, _ in edges], pa.string()),
                "child": pa.array([c for _, c in edges], pa.string()),
            }
        )
    )
    out = random_walks(eds, steps=3).to_pandas()
    got = sorted(map(tuple, out[["start", "step", "node"]].to_numpy()))

    adj = {}
    for p, c in edges:
        adj.setdefault(p, []).append(c)
    want = []
    for start in adj:
        cur = start
        for s in range(1, 4):
            nxts = adj.get(cur)
            if not nxts:
                break
            cur = min(
                nxts,
                key=lambda v: (
                    hashlib.md5(f"{cur}#{s}#{v}".encode()).hexdigest(), v
                ),
            )
            want.append((start, s, cur))
    assert got == sorted(want)
    # dead-end check: no walk row continues FROM d (d has no out-edges)
    reached_d_at = {(st, s) for st, s, n in got if n == "d"}
    for st, s in reached_d_at:
        assert not any(g[0] == st and g[1] > s for g in got)
