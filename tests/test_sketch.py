"""HyperLogLog sketch: estimate accuracy vs the exact sibling,
determinism across block layouts, and the CLZ/register kernel."""

import numpy as np
import pyarrow as pa


def _docs(texts):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def test_registers_rank_kernel():
    from brinkray.textproc.sketch import _registers_of

    p = 4
    # hash with register idx 0 and first remaining bit set -> rank 1
    h = np.array([np.uint64(1) << np.uint64(59)], dtype=np.uint64)
    regs = _registers_of(h, p)
    assert regs[0] == 1
    # hash 0: all 60 remaining bits zero -> sentinel caps rank at 64-p+1
    regs = _registers_of(np.array([0], dtype=np.uint64), p)
    assert regs[0] == 64 - p + 1


def test_hll_within_two_percent_of_exact(ray_session):
    from brinkray.textproc.sketch import distinct_tokens_exact, hll_distinct_tokens

    rng = np.random.default_rng(11)
    # ~30k distinct tokens spread over 300 docs with heavy repetition
    vocab = [f"tok{i}" for i in range(30_000)]
    texts = [
        " ".join(rng.choice(vocab, size=400)) for _ in range(300)
    ]
    ds = _docs(texts)
    exact = int(distinct_tokens_exact(ds).to_pandas()["n"][0])
    truth = len({t for x in texts for t in x.split()})
    assert exact == truth
    est = int(hll_distinct_tokens(ds, p=14).to_pandas()["n_estimate"][0])
    assert abs(est - exact) / exact < 0.02


def test_hll_deterministic_across_block_layouts(ray_session):
    from brinkray.textproc.sketch import hll_distinct_tokens

    texts = [f"alpha beta w{i} w{i + 1} gamma" for i in range(500)]
    a = int(hll_distinct_tokens(_docs(texts)).to_pandas()["n_estimate"][0])
    b = int(
        hll_distinct_tokens(_docs(texts).repartition(17)).to_pandas()["n_estimate"][0]
    )
    assert a == b


def test_cms_overestimates_and_is_tight(ray_session):
    """CMS never undercounts; at w=8192 over a small corpus the
    estimate for every probed token is exact (no collisions bite)."""
    import collections

    import ray.data as rd

    from brinkray.textproc.hashing import tokens_of
    from brinkray.textproc.sketch import cms_token_counts

    texts = [
        "the cat sat on the mat the end",
        "a dog and a cat and a fish",
        "the quick brown fox jumps over the lazy dog",
    ] * 20
    exact = collections.Counter(
        tok for x in texts for tok in tokens_of(x)
    )
    docs = rd.from_arrow(
        pa.table({"text": pa.array(texts, pa.string())})
    ).repartition(6)
    probe = ["the", "cat", "dog", "a", "fox"]
    out = (
        cms_token_counts(docs, probe)
        .to_pandas()
        .set_index("token")["n_est"]
    )
    for tok in probe:
        assert out[tok] >= exact[tok], tok  # CMS never undercounts
        assert out[tok] <= exact[tok] + 5, tok  # tight at this w


def test_cms_layout_determinism(ray_session):
    """Identical estimates across block layouts (merge is exact)."""
    import ray.data as rd

    from brinkray.textproc.sketch import cms_token_counts

    texts = ["alpha beta gamma beta"] * 17 + ["gamma delta"] * 5
    tbl = pa.table({"text": pa.array(texts, pa.string())})
    probe = ["alpha", "beta", "gamma", "delta"]
    a = (
        cms_token_counts(rd.from_arrow(tbl).repartition(1), probe)
        .to_pandas()["n_est"].tolist()
    )
    b = (
        cms_token_counts(rd.from_arrow(tbl).repartition(9), probe)
        .to_pandas()["n_est"].tolist()
    )
    assert a == b == [17, 34, 22, 5]


def test_exact_float_quantiles_matches_duckdb(ray_session):
    """Range refinement must reproduce quantile_disc exactly on
    all-distinct doubles, including with a cap that forces multiple
    refinement rounds."""
    import duckdb
    import numpy as np
    import ray.data as rd

    from brinkray.textproc.sketch import exact_float_quantiles

    rng = np.random.default_rng(3)
    v = rng.standard_normal(5000) * 1e4  # positives and negatives
    tbl = pa.table({"x": pa.array(v, pa.float64())})
    qs = (0.01, 0.25, 0.5, 0.9, 0.999)
    got = exact_float_quantiles(
        rd.from_arrow(tbl).repartition(7), "x", qs=qs, cap=50
    )
    con = duckdb.connect()
    con.register("t", tbl.to_pandas())
    for q, val in zip(got["q"], got["value"]):
        want = con.execute(
            f"SELECT quantile_disc(x, {q}) FROM t"
        ).fetchone()[0]
        assert val == want, (q, val, want)


def test_exact_float_quantiles_heavy_duplicate(ray_session):
    """A value repeated far beyond cap must resolve via single-key
    decode, never a corpus-scale gather."""
    import numpy as np
    import ray.data as rd

    v = np.concatenate([np.full(4000, 7.25), np.array([1.0, 2.0, 99.0])])
    tbl = pa.table({"x": pa.array(v, pa.float64())})
    from brinkray.textproc.sketch import exact_float_quantiles

    got = exact_float_quantiles(
        rd.from_arrow(tbl).repartition(5), "x", qs=(0.5,), cap=10
    )
    assert got["value"].iloc[0] == 7.25


def test_hll_grouped_within_bound_and_layout_stable(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from brinkray.textproc.sketch import hll_grouped

    rng = np.random.default_rng(21)
    n = 6000
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], n),
            "v": rng.integers(0, 800, n).astype(np.int64),
        }
    )
    # distinct per group with different supports
    df.loc[df["g"] == "b", "v"] %= 120
    df.loc[df["g"] == "c", "v"] %= 17
    exact = df.groupby("g")["v"].nunique()

    def run(parts):
        return (
            hll_grouped(rd.from_pandas(df).repartition(parts),
                        key_col="g", value_col="v", p=12)
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )

    est = run(5)
    for _, row in est.iterrows():
        e, x = row["n_estimate"], exact[row["g"]]
        assert abs(e - x) <= max(3, 0.05 * x), (row["g"], e, x)
    # bit-stable across block layouts
    assert run(11).equals(est)


def test_sampled_quantile_disc_accuracy_and_determinism(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from brinkray.textproc.sketch import sampled_quantile_disc

    rng = np.random.default_rng(31)
    n = 20_000
    v = rng.uniform(0, 1000, n)
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table({"id": pa.array(ids), "x": pa.array(v)})

    def run(parts):
        return sampled_quantile_disc(
            rd.from_arrow(tbl).repartition(parts), "x", "id", k=2000
        )

    got = run(7)
    for _, row in got.iterrows():
        exact = np.quantile(v, row["q"])
        # rank error ~O(1/sqrt(k)); uniform values => value error ~1000x that
        assert abs(row["value"] - exact) < 1000 * 3 / np.sqrt(2000), (
            row["q"], row["value"], exact)
    # hash-deterministic: identical across block layouts
    assert run(13).equals(got)


def test_grouped_sampled_quantile_disc_layout_stable(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from brinkray.textproc.sketch import grouped_sampled_quantile_disc

    rng = np.random.default_rng(41)
    n = 4000
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b"], n),
            "id": np.arange(n, dtype=np.int64),
            "v": rng.integers(0, 10_000, n).astype(np.int64),
        }
    )

    def run(parts):
        return (
            grouped_sampled_quantile_disc(
                rd.from_pandas(df).repartition(parts), "g", "v", "id",
                k=300, qs=(0.5, 0.9),
            )
            .to_pandas()
            .sort_values(["g", "q"])
            .reset_index(drop=True)
        )

    got = run(5)
    for _, row in got.iterrows():
        exact = df[df["g"] == row["g"]]["v"].quantile(row["q"])
        # rank error ~3/sqrt(300) of the 10k value range
        assert abs(row["value"] - exact) < 10_000 * 3 / np.sqrt(300)
    assert run(9).equals(got)   # hash-deterministic across layouts


def test_hll_grouped_registers_md5_matches_duckdb(ray_session):
    """The md5-hash register table (the driver-visible sketch state) is
    bit-identical to an independent DuckDB re-derivation — reg, rank
    and the exact bin()-length leading-zero formula."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from brinkray.textproc.sketch import hll_grouped_registers

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "k": [f"g{i % 3}" for i in range(5000)],
            "v": rng.integers(0, 800, size=5000).astype("int64"),
        }
    )
    got = (
        hll_grouped_registers(rd.from_pandas(df), "k", "v", p=12,
                              hash_kind="md5")
        .to_pandas()
        .sort_values(["k", "reg"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        "WITH h AS (SELECT k, md5_number_lower(CAST(v AS VARCHAR))::UBIGINT AS h FROM t), "
        "r AS (SELECT k, CAST(h >> 52 AS BIGINT) AS reg, "
        "CASE WHEN w = 0 THEN 53 ELSE 53 - length(ltrim(bin(w), '0')) END AS rk "
        "FROM (SELECT k, h, h & 4503599627370495::UBIGINT AS w FROM h)) "
        "SELECT k, reg, CAST(MAX(rk) AS BIGINT) AS rank FROM r "
        "GROUP BY 1, 2 ORDER BY 1, 2"
    ).df()
    pd.testing.assert_frame_equal(got, want)


def test_hll_grouped_md5_estimate_within_bound(ray_session):
    """The md5-register sketch still estimates: rebuild the estimate
    from the register table and compare to the exact distinct count
    (within the p=12 standard-error bound x4)."""
    import pandas as pd
    import ray.data as rd

    from brinkray.textproc.sketch import hll_estimate, hll_grouped_registers

    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {"k": ["a"] * 20000, "v": rng.integers(0, 6000, size=20000).astype("int64")}
    )
    regs_df = hll_grouped_registers(rd.from_pandas(df), "k", "v", p=12,
                                    hash_kind="md5").to_pandas()
    regs = np.zeros(1 << 12, dtype=np.int64)
    regs[regs_df["reg"].to_numpy()] = regs_df["rank"].to_numpy()
    est = hll_estimate(regs, 12)
    exact = df["v"].nunique()
    assert abs(est - exact) / exact < 4 * 1.04 / np.sqrt(1 << 12)


def test_cms_md5_estimates_bound_exact_counts(ray_session):
    """md5-mode CMS (the driver-visible variant): estimate >= exact
    always, and == exact for heavy tokens on a small-vocab corpus
    (few collisions at w=8192)."""
    import pyarrow as pa
    import ray.data as rd

    from brinkray.textproc.sketch import cms_token_counts

    texts = ["the cat sat on the mat"] * 30 + ["dog runs fast"] * 10
    ds = rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))
    out = cms_token_counts(ds, ["the", "cat", "dog", "absent"],
                           hash_kind="md5").to_pandas().set_index("token")
    assert out.loc["the", "n_est"] >= 60
    assert out.loc["cat", "n_est"] >= 30
    assert out.loc["dog", "n_est"] >= 10
    # tiny vocab, wide table: no collisions -> estimates exact
    assert out.loc["the", "n_est"] == 60
    assert out.loc["absent", "n_est"] == 0


def test_hll_token_registers_estimate_ties_exact(ray_session):
    """Estimate rebuilt from the md5 register table tracks the exact
    distinct-token count within the p=14 bound."""
    import pyarrow as pa
    import ray.data as rd

    from brinkray.textproc.sketch import (
        distinct_tokens_exact,
        hll_estimate,
        hll_token_registers,
    )

    rng = np.random.default_rng(3)
    texts = [
        " ".join(f"tok{rng.integers(0, 4000)}" for _ in range(40))
        for _ in range(400)
    ]
    ds = rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))
    regs_df = hll_token_registers(ds, p=14).to_pandas()
    regs = np.zeros(1 << 14, dtype=np.int64)
    regs[regs_df["reg"].to_numpy()] = regs_df["rank"].to_numpy()
    est = hll_estimate(regs, 14)
    exact = int(distinct_tokens_exact(ds).to_pandas()["n"][0])
    assert abs(est - exact) / exact < 4 * 1.04 / np.sqrt(1 << 14)
