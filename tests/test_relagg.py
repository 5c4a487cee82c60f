"""pricing_summary / rollup_counts / doc_chunks."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _lineitem_ds(n=400, seed=3):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    return rd.from_arrow(
        pa.table(
            {
                "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n)),
                "l_linestatus": pa.array(rng.choice(["F", "O"], n)),
                "l_quantity": pa.array(rng.integers(1, 51, n).astype(np.float64)),
                "l_extendedprice": pa.array(rng.uniform(900, 105000, n)),
                "l_discount": pa.array(rng.integers(0, 11, n) / 100.0),
                "l_tax": pa.array(rng.integers(0, 9, n) / 100.0),
                "l_shipdate": pa.array(
                    pd.Timestamp("1996-01-01")
                    + pd.to_timedelta(rng.integers(0, 2000, n), unit="D")
                ).cast(pa.timestamp("us")),
            }
        )
    ).repartition(5)


def test_pricing_summary_brute_force(ray_session):
    from brinkray.textproc.relagg import pricing_summary

    ds = _lineitem_ds()
    out = (
        pricing_summary(ds, cutoff="1998-09-01")
        .to_pandas()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    df = ds.to_pandas()
    df = df[df["l_shipdate"] <= pd.Timestamp("1998-09-01")].copy()
    df["qty_cents"] = np.floor(df["l_quantity"] * 100.0).astype(np.int64)
    df["base_cents"] = np.floor(df["l_extendedprice"] * 100.0).astype(np.int64)
    disc = df["l_extendedprice"] * (1.0 - df["l_discount"])
    df["disc_cents"] = np.floor(disc * 100.0).astype(np.int64)
    df["charge_cents"] = np.floor(disc * (1.0 + df["l_tax"]) * 100.0).astype(np.int64)
    exp = (
        df.groupby(["l_returnflag", "l_linestatus"])
        .agg(
            n_rows=("qty_cents", "size"),
            sum_qty_cents=("qty_cents", "sum"),
            sum_base_cents=("base_cents", "sum"),
            sum_disc_cents=("disc_cents", "sum"),
            sum_charge_cents=("charge_cents", "sum"),
        )
        .reset_index()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out[exp.columns.tolist()], exp, check_dtype=False
    )


def test_rollup_counts_levels(ray_session):
    import ray.data as rd

    from brinkray.textproc.relagg import rollup_counts

    df = pd.DataFrame(
        {
            "lang": ["en", "en", "en", "de", "de", "fr"],
            "source": ["a", "a", "b", "a", "c", "c"],
        }
    )
    out = rollup_counts(
        rd.from_pandas(df).repartition(3), ["lang", "source"]
    ).to_pandas()
    fine = out[out["source"].notna()]
    mid = out[out["source"].isna() & out["lang"].notna()]
    grand = out[out["lang"].isna()]
    assert dict(zip(zip(fine["lang"], fine["source"]), fine["n"])) == {
        ("en", "a"): 2, ("en", "b"): 1, ("de", "a"): 1, ("de", "c"): 1,
        ("fr", "c"): 1,
    }
    assert dict(zip(mid["lang"], mid["n"])) == {"en": 3, "de": 2, "fr": 1}
    assert len(grand) == 1 and grand["n"].iloc[0] == 6
    assert out["n"].dtype == np.int64


def test_doc_chunks_boundaries(ray_session):
    import hashlib

    import ray.data as rd

    from brinkray.textproc.curation import doc_chunks

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        " ".join(f"t{i}" for i in range(130)),  # 3 chunks: 64/64/2
                        "one two",                                # 1 chunk
                        "",                                       # empty -> [''] 1 chunk
                    ]
                ),
            }
        )
    ).repartition(2)
    out = (
        doc_chunks(docs, chunk_tokens=64)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    assert out[out["doc_id"] == 1]["n_tokens"].tolist() == [64, 64, 2]
    assert out[out["doc_id"] == 2]["n_tokens"].tolist() == [2]
    assert out[out["doc_id"] == 3]["n_tokens"].tolist() == [1]
    toks = [f"t{i}" for i in range(130)]
    want = hashlib.md5(" ".join(toks[64:128]).encode()).hexdigest()
    assert out[(out["doc_id"] == 1) & (out["chunk_id"] == 1)]["chunk_md5"].iloc[0] == want
    assert (
        out[out["doc_id"] == 3]["chunk_md5"].iloc[0]
        == hashlib.md5(b"").hexdigest()
    )


def test_global_rank_matches_row_number(ray_session):
    import ray.data as rd

    from brinkray.textproc.relagg import global_rank

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "id": np.arange(200, dtype=np.int64),
            "k": rng.integers(0, 12, 200).astype(np.int64),
        }
    )
    out = (
        global_rank(rd.from_pandas(df).repartition(4), key_col="k",
                    id_col="id", n_buckets=4)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    exp = df.sort_values(["k", "id"]).reset_index(drop=True)
    exp["rank"] = np.arange(len(exp), dtype=np.int64)
    exp["bucket"] = exp["rank"] * 4 // len(exp)
    exp = exp.sort_values("id").reset_index(drop=True)
    assert out["rank"].tolist() == exp["rank"].tolist()
    assert out["bucket"].tolist() == exp["bucket"].tolist()
    # ranks are a permutation of 0..n-1
    assert sorted(out["rank"]) == list(range(200))


def test_range_rank_matches_row_number(ray_session):
    """High-cardinality float key: exact global row_number via range
    partitioning + driver prefix sum, with duplicate key values (ties
    broken by id) straddling block boundaries."""
    import ray.data as rd

    from brinkray.textproc.relagg import range_rank

    rng = np.random.default_rng(7)
    keys = rng.normal(0.0, 100.0, 500)
    keys[100:120] = keys[0]  # a repeated key value (boundary-tie case)
    df = pd.DataFrame({"id": np.arange(500, dtype=np.int64), "k": keys})
    out = (
        range_rank(rd.from_pandas(df).repartition(7), key_col="k",
                   id_col="id", npartitions=5)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    exp = df.sort_values(["k", "id"]).reset_index(drop=True)
    exp["rank"] = np.arange(len(exp), dtype=np.int64)
    exp = exp.sort_values("id").reset_index(drop=True)
    assert out["rank"].tolist() == exp["rank"].tolist()


def test_range_rank_ntile_sql_semantics(ray_session):
    """NTILE(k) when N % k != 0: the FIRST N%k buckets get the extra
    row (window-function semantics), 1-based."""
    import ray.data as rd

    from brinkray.textproc.relagg import range_rank

    # N=10, k=4 -> bucket sizes 3,3,2,2 (NOT global_rank's 3,2,3,2)
    df = pd.DataFrame(
        {"id": np.arange(10, dtype=np.int64),
         "k": np.arange(10, dtype=np.float64)}
    )
    out = (
        range_rank(rd.from_pandas(df).repartition(3), key_col="k",
                   id_col="id", n_buckets=4, npartitions=3)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert out["bucket"].tolist() == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]

    # N < k: each row its own bucket
    small = pd.DataFrame(
        {"id": np.arange(3, dtype=np.int64), "k": [5.0, 1.0, 3.0]}
    )
    out2 = (
        range_rank(rd.from_pandas(small), key_col="k", id_col="id",
                   n_buckets=8, npartitions=2)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert out2["bucket"].tolist() == [1, 2, 3]
    assert out2["id"].tolist() == [1, 2, 0]


def test_label_centroids_exact(ray_session):
    import ray.data as rd

    from brinkray.textproc.similarity import label_centroids

    rng = np.random.default_rng(9)
    vecs = rng.normal(size=(50, 6)).astype(np.float32)
    labels = rng.integers(0, 3, 50).astype(np.int32)
    ds = rd.from_arrow(
        pa.table(
            {
                "label": pa.array(labels),
                "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            }
        )
    ).repartition(4)
    out = (
        label_centroids(ds)
        .to_pandas()
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )
    q = np.floor(vecs.astype(np.float64) * 1e6).astype(np.int64)
    for lab in range(3):
        sel = q[labels == lab]
        got = out[out["label"] == lab]
        assert got["s_micro"].tolist() == sel.sum(axis=0).tolist()
        assert got["n"].tolist() == [len(sel)] * 6
        assert got["dim"].tolist() == list(range(6))


def test_revenue_chain_brute_force(ray_session):
    import ray.data as rd

    from brinkray.textproc.joins import revenue_chain

    rng = np.random.default_rng(13)
    n_li, n_o, n_c = 300, 60, 20
    li = pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, n_o, n_li).astype(np.int64),
            "l_extendedprice": rng.uniform(100, 90000, n_li),
            "l_discount": rng.integers(0, 11, n_li) / 100.0,
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n_o, dtype=np.int64),
            "o_custkey": rng.integers(0, n_c, n_o).astype(np.int64),
            "o_orderpriority": rng.choice(["1-URGENT", "2-HIGH", "3-LOW"], n_o),
        }
    )
    cust = pd.DataFrame(
        {
            "c_custkey": np.arange(n_c, dtype=np.int64),
            "c_nationkey": rng.integers(0, 4, n_c).astype(np.int64),
        }
    )
    nation = pd.DataFrame(
        {
            "n_nationkey": np.arange(4, dtype=np.int64),
            "n_name": [f"NATION{i}" for i in range(4)],
        }
    )
    out = (
        revenue_chain(
            rd.from_pandas(li).repartition(3),
            rd.from_pandas(orders).repartition(2),
            rd.from_pandas(cust),
            rd.from_pandas(nation),
            num_partitions=4,
        )
        .to_pandas()
        .sort_values(["o_orderpriority", "n_name"])
        .reset_index(drop=True)
    )
    li["rev"] = np.floor(
        li["l_extendedprice"] * (1.0 - li["l_discount"]) * 100.0
    ).astype(np.int64)
    exp = (
        li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(nation, left_on="c_nationkey", right_on="n_nationkey")
        .groupby(["o_orderpriority", "n_name"])["rev"]
        .sum()
        .reset_index(name="rev_cents")
        .sort_values(["o_orderpriority", "n_name"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_set_op_distinct_intersect_except(ray_session):
    import ray.data as rd

    from brinkray.textproc.relagg import set_op_distinct

    left = rd.from_arrow(
        pa.table({"k": pa.array([1, 1, 2, 3, 5], pa.int64())})
    ).repartition(3)
    right = rd.from_arrow(
        pa.table({"k": pa.array([2, 2, 3, 4], pa.int64())})
    ).repartition(2)
    inter = set_op_distinct(left, right, on=["k"], op="intersect").to_pandas()
    exc = set_op_distinct(left, right, on=["k"], op="except").to_pandas()
    assert sorted(inter["k"]) == [2, 3]           # distinct semantics
    assert sorted(exc["k"]) == [1, 5]
    import pytest

    with pytest.raises(ValueError):
        set_op_distinct(left, right, on=["k"], op="union")


def test_fixed_width_histogram_brute_force(ray_session):
    import ray.data as rd

    from brinkray.textproc.relagg import fixed_width_histogram

    rng = np.random.default_rng(9)
    x = rng.uniform(-50, 450, 1000)
    ds = rd.from_arrow(pa.table({"v": pa.array(x)})).repartition(7)
    out = (
        fixed_width_histogram(ds, "v", 100.0)
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    exp = (
        pd.Series(np.floor(x / 100.0).astype(np.int64))
        .value_counts()
        .sort_index()
        .rename_axis("bucket")
        .reset_index(name="n")
    )
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_count_of_counts_brute_force(ray_session):
    import ray.data as rd

    from brinkray.textproc.relagg import count_of_counts

    rng = np.random.default_rng(11)
    keys = rng.integers(0, 60, 500)
    ds = rd.from_arrow(pa.table({"k": pa.array(keys, pa.int64())})).repartition(6)
    out = (
        count_of_counts(ds, "k", out_key="c", out_count="nk")
        .to_pandas()
        .sort_values("c")
        .reset_index(drop=True)
    )
    per_key = pd.Series(keys).value_counts()
    exp = (
        per_key.value_counts()
        .sort_index()
        .rename_axis("c")
        .reset_index(name="nk")
    )
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_cube_counts_all_grouping_sets(ray_session):
    import ray.data as rd

    from brinkray.textproc.relagg import cube_counts

    rng = np.random.default_rng(13)
    df = pd.DataFrame(
        {
            "a": rng.choice(["x", "y"], 300),
            "b": rng.choice(["p", "q", "r"], 300),
        }
    )
    ds = rd.from_pandas(df).repartition(4)
    out = (
        cube_counts(ds, ["a", "b"])
        .to_pandas()
        .sort_values(["a", "b"], na_position="first")
        .reset_index(drop=True)
    )
    # 2x3 fine + 2 a-level + 3 b-level + 1 grand = 12 rows
    assert len(out) == len(df.groupby(["a", "b"])) + 2 + 3 + 1
    fine = df.groupby(["a", "b"]).size()
    assert out[out["a"].isna() & out["b"].isna()]["n"].iloc[0] == 300
    for a in ["x", "y"]:
        assert (
            out[(out["a"] == a) & out["b"].isna()]["n"].iloc[0]
            == (df["a"] == a).sum()
        )
    for b in ["p", "q", "r"]:
        assert (
            out[out["a"].isna() & (out["b"] == b)]["n"].iloc[0]
            == (df["b"] == b).sum()
        )
    for (a, b), n in fine.items():
        assert out[(out["a"] == a) & (out["b"] == b)]["n"].iloc[0] == n


def test_grouped_corr_stats_brute_force(ray_session):
    import ray.data as rd

    from brinkray.textproc.relagg import grouped_corr_stats

    rng = np.random.default_rng(17)
    df = pd.DataFrame(
        {
            "g": rng.choice(["A", "B"], 500),
            "x": rng.uniform(0, 50, 500),
            "y": rng.uniform(0, 1e5, 500),
        }
    )
    out = (
        grouped_corr_stats(rd.from_pandas(df).repartition(6), "g", "x", "y")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    df["xi"] = np.floor(df["x"]).astype(np.int64)
    df["yi"] = np.floor(df["y"]).astype(np.int64)
    for _, row in out.iterrows():
        sub = df[df["g"] == row["g"]]
        assert row["n"] == len(sub)
        assert row["sum_x"] == sub["xi"].sum()
        assert row["sum_y"] == sub["yi"].sum()
        assert row["sum_xx"] == (sub["xi"] ** 2).sum()
        assert row["sum_yy"] == (sub["yi"] ** 2).sum()
        assert row["sum_xy"] == (sub["xi"] * sub["yi"]).sum()
        # the stats reconstruct the pandas corr to float precision
        n = row["n"]
        cov = row["sum_xy"] / n - (row["sum_x"] / n) * (row["sum_y"] / n)
        vx = row["sum_xx"] / n - (row["sum_x"] / n) ** 2
        vy = row["sum_yy"] / n - (row["sum_y"] / n) ** 2
        got_corr = cov / np.sqrt(vx * vy)
        exp_corr = sub["xi"].corr(sub["yi"])
        assert abs(got_corr - exp_corr) < 1e-9


def test_above_group_avg_exact_boundary(ray_session):
    import ray.data as rd

    from brinkray.textproc.relagg import above_group_avg

    # group 1: values 10.00, 20.00, 30.00 (avg 20.00) -> only 30 strictly above
    # group 2: values 5.00, 5.00 (avg 5.00) -> none (strict >)
    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2],
            "id": [10, 11, 12, 20, 21],
            "v": [10.0, 20.0, 30.0, 5.0, 5.0],
        }
    )
    out = (
        above_group_avg(rd.from_pandas(df).repartition(3), "k", "id", "v",
                        num_partitions=2)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert out["id"].tolist() == [12]
    assert out["v_cents"].tolist() == [3000]


def test_pair_cooccurrence_exact(ray_session):
    import ray.data as rd

    from brinkray.textproc.relagg import pair_cooccurrence

    # baskets: {1,2,3}, {2,3}, {2,3,4}, {5}
    groups = [10, 10, 10, 20, 20, 30, 30, 30, 40, 10]  # last row dups item 1
    items = [1, 2, 3, 2, 3, 2, 3, 4, 5, 1]
    ds = rd.from_arrow(
        pa.table({"g": pa.array(groups, pa.int64()),
                  "i": pa.array(items, pa.int64())})
    )
    out = (
        pair_cooccurrence(ds, "g", "i", min_count=2)
        .to_pandas()
        .sort_values(["item_a", "item_b"])
        .reset_index(drop=True)
    )
    # only (2,3) appears in >= 2 baskets (3 of them); duplicate item
    # rows within a basket never double-count
    assert out["item_a"].tolist() == [2]
    assert out["item_b"].tolist() == [3]
    assert out["n_groups"].tolist() == [3]


def test_pair_cooccurrence_truncates_giant_groups(ray_session):
    import ray.data as rd

    from brinkray.textproc.relagg import pair_cooccurrence

    ds = rd.from_arrow(
        pa.table({"g": pa.array([1] * 10, pa.int64()),
                  "i": pa.array(range(10), pa.int64())})
    )
    import pytest

    # default contract: oversized groups RAISE (a truncated result would
    # silently diverge from a capless SQL oracle — ADVICE r03)
    with pytest.raises(Exception):
        pair_cooccurrence(ds, "g", "i", min_count=1, max_items=4).to_pandas()
    out = pair_cooccurrence(
        ds, "g", "i", min_count=1, max_items=4, on_oversize="truncate"
    ).to_pandas()
    assert len(out) == 6  # C(4,2) after truncation (warning logged worker-side)


def test_table_profile_counts_nulls_and_distinct(ray_session):
    import ray.data as rd

    from brinkray.textproc.relagg import table_profile

    t = pa.table(
        {
            "a": pa.array([1, 1, 2, None], pa.int64()),
            "b": pa.array(["x", None, None, "y"], pa.string()),
        }
    )
    out = table_profile(rd.from_arrow(t), ["a", "b"]).to_pandas()
    assert out["col"].tolist() == ["a", "b"]
    assert out["n_nulls"].tolist() == [1, 2]
    # SQL's COUNT(DISTINCT col) ignores NULLs; the kernel must too
    # (Ray's groupby would otherwise give NULL its own group)
    assert out["n_distinct"].tolist() == [2, 2]


def test_set_op_bag_matches_multiset_arithmetic(ray_session):
    import ray.data as rd

    from brinkray.textproc.relagg import set_op_bag

    left = rd.from_arrow(
        pa.table({"k": pa.array(["a"] * 3 + ["b"] * 2 + ["c"], pa.string())})
    )
    right = rd.from_arrow(
        pa.table({"k": pa.array(["a"] * 1 + ["b"] * 5 + ["d"], pa.string())})
    )
    ex = set_op_bag(left, right, on=["k"], op="except_all").to_pandas()
    assert dict(zip(ex["k"], ex["n"])) == {"a": 2, "c": 1}
    it = set_op_bag(left, right, on=["k"], op="intersect_all").to_pandas()
    assert dict(zip(it["k"], it["n"])) == {"a": 1, "b": 2}


def test_grouped_string_agg_orders_within_group(ray_session):
    import ray.data as rd

    from brinkray.textproc.relagg import grouped_string_agg

    t = pa.table(
        {
            "g": pa.array([1, 1, 1, 2], pa.int64()),
            "o": pa.array([3, 1, 2, 9], pa.int64()),
            "v": pa.array(["c", "a", "b", "z"], pa.string()),
        }
    )
    out = (
        grouped_string_agg(rd.from_arrow(t), by="g", val_col="v",
                           order_cols=["o"])
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    assert out["seq"].tolist() == ["a>b>c", "z"]
