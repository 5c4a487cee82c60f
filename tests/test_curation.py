"""Curation operators on constructed inputs with known answers:
exact embedding pairs, decontamination overlap counts, repetition
signals, stratified sampling determinism, heavy hitters, and the
exact-components chain stress."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest


def _docs_ds(texts, langs=None):
    import ray.data as rd

    cols = {
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }
    if langs is not None:
        cols["lang"] = pa.array(langs, pa.string())
    return rd.from_arrow(pa.table(cols))


def test_embedding_pairs_exact_matches_bruteforce(ray_session):
    import ray.data as rd

    from brinkray.textproc.curation import embedding_cosine_pairs_exact

    rng = np.random.default_rng(7)
    n, d = 120, 16
    E = rng.normal(size=(n, d))
    E[10] = E[3] + 0.01 * rng.normal(size=d)  # one planted near-dup
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(E.tolist()),
            }
        )
    )
    out = embedding_cosine_pairs_exact(ds, 0.8).to_pandas()
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    C = En @ En.T
    iu = np.triu_indices(n, 1)
    want = {
        (int(a), int(b))
        for a, b, c in zip(iu[0], iu[1], C[iu])
        if c >= 0.8
    }
    got = set(zip(out["vec_a"], out["vec_b"]))
    assert got == want
    assert (3, 10) in got


def test_embedding_pairs_exact_empty(ray_session):
    import ray.data as rd

    from brinkray.textproc.curation import embedding_cosine_pairs_exact

    # orthogonal unit vectors: no pair reaches any positive threshold
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([0, 1], pa.int64()),
                "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]]),
            }
        )
    )
    out = embedding_cosine_pairs_exact(ds, 0.5)
    assert out.count() == 0
    # schema survives the empty result (Dataset.to_pandas drops it on
    # empty datasets; the query layer rebuilds via _to_pandas)
    assert out.schema().names == ["vec_a", "vec_b", "cosine"]


def test_embedding_pairs_exact_gate_raises(ray_session):
    """The corpus-matrix broadcast is explicitly gated: past the budget
    the exact kernel must raise with a pointer to the LSH scale path,
    never silently gather the corpus."""
    import ray.data as rd

    from brinkray.textproc.curation import embedding_cosine_pairs_exact

    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(8), pa.int64()),
                "embedding": pa.array([[float(i), 1.0] for i in range(8)]),
            }
        )
    )
    with pytest.raises(ValueError, match="embedding_dup_pairs"):
        embedding_cosine_pairs_exact(ds, 0.5, max_broadcast_bytes=0)


def test_embedding_pairs_verify_bucketed_equals_bruteforce(ray_session):
    """The corpus-scale shape: LSH candidate pairs (threshold=-1 emits
    every in-bucket pair) exact-verified by embedding_pairs_verify ==
    brute force, membership AND cosine values, on a fixture where the
    multi-table recall provably reaches every >=0.9 pair."""
    import ray.data as rd

    from brinkray.textproc.curation import (
        embedding_cosine_pairs_exact,
        embedding_pairs_verify,
    )
    from brinkray.textproc.dedup import embedding_dup_pairs

    rng = np.random.default_rng(23)
    n, d = 100, 12
    E = rng.normal(size=(n, d))
    for a, b in ((3, 10), (40, 41), (77, 95)):
        E[b] = E[a] + 0.02 * rng.normal(size=d)  # planted near-dups
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(E.tolist()),
            }
        )
    )
    thr = 0.9
    exact = embedding_cosine_pairs_exact(ds, thr).to_pandas()
    # wide-recall candidate generation: 2-bit x 64 tables — a cos>=0.9
    # pair collides per table with p >= (1 - arccos(.9)/pi)^2 ~ 0.73,
    # missing all 64 with p < 1e-36
    cand = embedding_dup_pairs(
        ds, threshold=-1.0, n_tables=64, bits=2, bucket_cap=1 << 20
    )
    ver = embedding_pairs_verify(ds, cand, thr).to_pandas()
    key = ["vec_a", "vec_b"]
    a = exact.sort_values(key).reset_index(drop=True)
    b = ver.sort_values(key).reset_index(drop=True)
    assert a[key].values.tolist() == b[key].values.tolist()
    assert np.allclose(a["cosine"].to_numpy(), b["cosine"].to_numpy(),
                       rtol=0, atol=1e-12)
    got = set(zip(a["vec_a"], a["vec_b"]))
    assert {(3, 10), (40, 41), (77, 95)} <= got
    # and the candidate-side gate raises explicitly past its budget
    with pytest.raises(ValueError, match="shard the candidate"):
        embedding_pairs_verify(ds, cand, thr, max_broadcast_bytes=0)


def test_decontaminate_counts_shared_shingles(ray_session):
    from brinkray.textproc.curation import decontaminate

    bench = "alpha beta gamma delta epsilon zeta eta theta"
    # doc 1 shares the 'beta gamma delta' .. shingles; doc 2 shares none
    contaminated = "prefix beta gamma delta epsilon suffix words here"
    clean = "completely different tokens about engines and benchmarks"
    ds = _docs_ds([bench, contaminated, clean])
    out = decontaminate(ds, bench_ids=[0]).to_pandas()
    assert set(out["doc_id"]) == {1}
    # shingles of doc1: 'beta gamma delta', 'gamma delta epsilon' shared
    assert int(out["n_overlap"].iloc[0]) == 2


def test_decontaminate_excludes_bench_docs(ray_session):
    from brinkray.textproc.curation import decontaminate

    ds = _docs_ds(["one two three four", "one two three four"])
    out = decontaminate(ds, bench_ids=[0]).to_pandas()
    assert set(out["doc_id"]) == {1}  # the bench doc itself is not reported


def test_repetition_signals_values(ray_session):
    from brinkray.textproc.curation import repetition_signals

    ds = _docs_ds(["a a a b", "x y z", ""])
    out = (
        repetition_signals(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [0, 1]  # empty doc dropped
    assert list(out["n_tokens"]) == [4, 3]
    assert list(out["n_distinct"]) == [2, 3]
    assert out["top_token_frac"].iloc[0] == pytest.approx(3 / 4)
    assert out["distinct_ratio"].iloc[1] == 1.0


def test_stratified_sample_deterministic_topk(ray_session):
    from brinkray.textproc.curation import stratified_sample

    texts = [f"text number {i}" for i in range(30)]
    langs = ["en" if i % 2 == 0 else "de" for i in range(30)]
    ds = _docs_ds(texts, langs)
    out = stratified_sample(ds, k=3, by="lang").to_pandas()
    assert len(out) == 6
    assert set(out["lang"].value_counts().to_dict().values()) == {3}
    # expected: per lang, the 3 smallest (md5(text), doc_id)
    for lang in ("en", "de"):
        ids = [i for i in range(30) if langs[i] == lang]
        want = sorted(ids, key=lambda i: (hashlib.md5(texts[i].encode()).hexdigest(), i))[:3]
        got = sorted(out[out["lang"] == lang]["doc_id"])
        assert got == sorted(want)
    # stable across a second run (block layout independent)
    out2 = stratified_sample(ds, k=3, by="lang").to_pandas()
    assert sorted(zip(out2["lang"], out2["doc_id"])) == sorted(
        zip(out["lang"], out["doc_id"])
    )


def test_heavy_hitters_counts_and_ties(ray_session):
    from brinkray.textproc.curation import heavy_hitters

    ds = _docs_ds(["b b b a a c", "a c d", "E e"])  # 'e' lowercased: 2
    out = heavy_hitters(ds, k=3).to_pandas()
    # totals: a:3, b:3, c:2, e:2, d:1 — count desc, token asc on ties
    assert list(out["token"]) == ["a", "b", "c"]
    assert list(out["n"]) == [3, 3, 2]


def test_pack_shards_offsets(ray_session):
    from brinkray.textproc.curation import pack_shards

    texts = [f"some text body number {i} with a few tokens" for i in range(40)]
    ds = _docs_ds(texts)
    out = pack_shards(ds, n_shards=4).to_pandas()
    assert len(out) == 40
    # recompute expected layout directly
    rows = []
    for i, x in enumerate(texts):
        h = hashlib.md5(x.encode()).hexdigest()
        rows.append((int(h[0], 16) % 4, h, i, len(x.lower().split())))
    for shard in range(4):
        grp = sorted((r for r in rows if r[0] == shard), key=lambda r: (r[1], r[2]))
        off = 0
        for _, _, i, n in grp:
            got = out[out["doc_id"] == i].iloc[0]
            assert int(got["shard"]) == shard
            assert int(got["token_offset"]) == off
            off += n
    # deterministic across runs
    out2 = pack_shards(ds, n_shards=4).to_pandas()
    assert out.sort_values("doc_id").reset_index(drop=True).equals(
        out2.sort_values("doc_id").reset_index(drop=True)
    )


def test_ngram_novelty_known_shares(ray_session):
    from brinkray.textproc.curation import ngram_novelty

    texts = [
        "one two three four",  # shingles {one two three, two three four}
        "two three four five",  # shares {two three four} with doc 0
        "x y z w",  # no shared shingles
        "hi",  # <3 tokens: whole-text shingle, shared with doc 4
        "hi",
    ]
    out = ngram_novelty(_docs_ds(texts)).to_pandas().set_index("doc_id")
    assert int(out.loc[0, "n_shingles"]) == 2
    assert int(out.loc[0, "n_shared"]) == 1
    assert out.loc[0, "shared_frac"] == 0.5
    assert int(out.loc[1, "n_shared"]) == 1
    assert int(out.loc[2, "n_shared"]) == 0
    assert out.loc[3, "shared_frac"] == 1.0
    assert out.loc[4, "shared_frac"] == 1.0


def test_write_packed_shards_layout_and_resume(ray_session, tmp_path):
    import os

    import pyarrow.parquet as pq

    from brinkray.textproc.curation import pack_shards, write_packed_shards

    texts = [f"body of document {i} with several tokens here" for i in range(60)]
    ds = _docs_ds(texts)
    out_dir = str(tmp_path / "packed")
    manifest = write_packed_shards(ds, out_dir, n_shards=4).to_pandas()
    assert manifest["n_docs"].sum() == 60
    # written files agree with the pack_shards layout operator
    layout = pack_shards(ds, n_shards=4).to_pandas()
    for shard in manifest["shard"]:
        path = os.path.join(out_dir, f"shard={int(shard):02d}", "data.parquet")
        t = pq.read_table(path).to_pandas()
        want = layout[layout["shard"] == shard].sort_values("token_offset")
        assert list(t["doc_id"]) == list(want["doc_id"])
        assert list(t["token_offset"]) == list(want["token_offset"])
        # rows are in canonical order: offsets strictly nondecreasing
        assert (t["token_offset"].diff().dropna() >= 0).all()
    # RESUME: delete one shard, rerun — only that shard is rewritten
    shards = sorted(int(s) for s in manifest["shard"])
    victim = shards[0]
    keep_mtimes = {}
    for s in shards:
        p = os.path.join(out_dir, f"shard={s:02d}", "data.parquet")
        keep_mtimes[s] = os.stat(p).st_mtime_ns
    os.remove(os.path.join(out_dir, f"shard={victim:02d}", "data.parquet"))
    manifest2 = write_packed_shards(ds, out_dir, n_shards=4).to_pandas()
    assert manifest2.sort_values("shard").reset_index(drop=True).equals(
        manifest.sort_values("shard").reset_index(drop=True)
    )
    for s in shards:
        p = os.path.join(out_dir, f"shard={s:02d}", "data.parquet")
        if s == victim:
            assert os.path.exists(p)
        else:
            assert os.stat(p).st_mtime_ns == keep_mtimes[s], "resume rewrote a finished shard"


def test_cluster_components_chain(ray_session):
    """A 100-node chain must converge to a single component label 0
    (transitive-closure stress for the star rounds)."""
    import pandas as pd
    import ray.data as rd

    from brinkray.textproc.joins import cluster_pairs

    edges = pa.table(
        {
            "doc_a": pa.array(range(99), pa.int64()),
            "doc_b": pa.array(range(1, 100), pa.int64()),
        }
    )
    out = cluster_pairs(rd.from_arrow(edges)).to_pandas()
    assert len(out) == 100
    assert set(out["cluster"]) == {0}


def test_top_k_per_group_matches_bruteforce(ray_session):
    """Partial per-batch prune + final groupby must equal a global
    window-rank, including ties (broken by ascending id) and groups
    smaller than k."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from brinkray.textproc.curation import top_k_per_group

    rng = np.random.default_rng(11)
    n = 500
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 7, n),          # group 6 will be tiny
            "score": rng.integers(0, 20, n),     # heavy ties
            "id": np.arange(n, dtype=np.int64),
        }
    )
    df = df[~((df["g"] == 6) & (df["id"] > 5))]  # group 6: <= k rows
    ds = rd.from_pandas(df).repartition(8)       # force multi-batch partials
    got = (
        top_k_per_group(ds, by="g", score_col="score", k=4, id_col="id")
        .to_pandas()
        .sort_values(["g", "id"])
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["score", "id"], ascending=[False, True], kind="mergesort")
        .groupby("g", sort=False)
        .head(4)
        .sort_values(["g", "id"])
        .reset_index(drop=True)[["g", "score", "id"]]
    )
    pd.testing.assert_frame_equal(
        got[["g", "score", "id"]].astype("int64"), want.astype("int64")
    )


def test_tf_df_scores_handworked(ray_session):
    """tf, df and the rational-exact ppm score on a hand-worked corpus."""
    import pandas as pd
    import ray.data as rd

    from brinkray.textproc.curation import tf_df_scores

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                ["cat cat dog", "dog fish", "CAT! fish fish fish"], pa.string()
            ),
        }
    )
    out = (
        tf_df_scores(rd.from_arrow(docs).repartition(3))
        .to_pandas()
        .set_index(["doc_id", "token"])
    )
    # df: cat=2 (docs 1,3 — case-folded), dog=2, fish=2
    assert out.loc[(1, "cat"), "tf"] == 2
    assert out.loc[(1, "cat"), "df"] == 2
    assert out.loc[(1, "cat"), "tfidf_ppm"] == 1_000_000  # 2*1e6 // 2
    assert out.loc[(3, "fish"), "tf"] == 3
    assert out.loc[(3, "fish"), "tfidf_ppm"] == 1_500_000  # 3*1e6 // 2
    assert out.loc[(2, "dog"), "tfidf_ppm"] == 500_000  # 1*1e6 // 2
    assert len(out) == 6  # (1,cat)(1,dog)(2,dog)(2,fish)(3,cat)(3,fish)


def test_ngram_novelty_shuffled_equals_broadcast(ray_session):
    """The shuffle-join path must produce exactly the broadcast path's
    rows on a boilerplate-heavy corpus (including zero-shared docs)."""
    import pandas as pd
    import ray.data as rd

    from brinkray.textproc.curation import ngram_novelty, ngram_novelty_shuffled

    boiler = "all rights reserved copyright footer two thousand"
    texts = [f"unique document {i} words alpha beta {boiler}" for i in range(30)]
    texts += ["totally singular text with no shared shingles at all xyzzy"]
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(5)
    a = (
        ngram_novelty(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        ngram_novelty_shuffled(docs, num_partitions=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)[a.columns]
    )
    pd.testing.assert_frame_equal(a, b)
    assert (a["n_shared"] > 0).sum() == 30  # boilerplate detected
    assert a[a["doc_id"] == 30]["n_shared"].iloc[0] == 0


def test_write_jsonl_shards_roundtrip_and_resume(ray_session, tmp_path):
    import json
    import os

    import ray.data as rd

    from brinkray.textproc.curation import read_jsonl_manifest, write_jsonl_shards

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(40)), pa.int64()),
                "text": pa.array(
                    [f"doc {i} with some text body {'x' * (i % 7)}" for i in range(40)]
                ),
            }
        )
    ).repartition(4)
    out = str(tmp_path / "jsonl")
    m1 = (
        write_jsonl_shards(docs, out, n_shards=4)
        .to_pandas()
        .sort_values("shard")
        .reset_index(drop=True)
    )
    assert m1["n_docs"].sum() == 40
    files = sorted(os.listdir(out))
    assert files == [f"shard-{s:02d}.jsonl" for s in m1["shard"]]
    assert not any(f.endswith(".tmp") for f in files)

    # resume: poison one existing shard — a rerun must SKIP it (and
    # report the same manifest, which is derived from data, not files)
    poison = os.path.join(out, files[0])
    before = open(poison).read()
    with open(poison, "a") as f:
        f.write("")  # touch only mtime; content identical
    m2 = (
        write_jsonl_shards(docs, out, n_shards=4)
        .to_pandas()
        .sort_values("shard")
        .reset_index(drop=True)
    )
    assert m2.equals(m1)
    assert open(poison).read() == before

    # roundtrip: read back and verify per-shard counts + chars match
    rt = (
        read_jsonl_manifest(out)
        .to_pandas()
        .sort_values("shard")
        .reset_index(drop=True)
    )
    assert rt[["shard", "n_docs", "n_chars"]].equals(
        m1[["shard", "n_docs", "n_chars"]]
    )
    # and the lines are valid JSON with both fields
    row = json.loads(open(poison).readline())
    assert set(row) == {"doc_id", "text"}


def test_dedup_incremental_prefix_and_full(ray_session):
    import ray.data as rd

    from brinkray.textproc.dedup import dedup_incremental

    corpus = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["alpha beta gamma", "delta epsilon zeta"]),
            }
        )
    )
    new = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([10, 11, 12], pa.int64()),
                "text": pa.array(
                    [
                        "alpha beta gamma",          # exact dup -> dropped
                        "alpha beta DIFFERENT",      # 2-token prefix dup
                        "fresh totally new",         # kept either way
                    ]
                ),
            }
        )
    )
    full = dedup_incremental(new, corpus, num_partitions=2).to_pandas()
    assert sorted(full["doc_id"].tolist()) == [11, 12]
    pref = dedup_incremental(new, corpus, prefix_tokens=2,
                             num_partitions=2).to_pandas()
    assert sorted(pref["doc_id"].tolist()) == [12]


def test_write_csv_shards_roundtrip_quoting(ray_session, tmp_path):
    import ray.data as rd

    from brinkray.textproc.curation import read_csv_manifest, write_csv_shards

    # texts with commas, quotes and unicode exercise CSV quoting
    texts = ['plain words', 'has, a comma', 'has "quotes" inside',
             'trailing space ', 'ünïcödé text']
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts),
            }
        )
    ).repartition(2)
    out = str(tmp_path / "csv")
    m1 = (
        write_csv_shards(docs, out, n_shards=2)
        .to_pandas().sort_values("shard").reset_index(drop=True)
    )
    rt = (
        read_csv_manifest(out)
        .to_pandas().sort_values("shard").reset_index(drop=True)
    )
    assert rt[["shard", "n_docs", "n_chars"]].equals(
        m1[["shard", "n_docs", "n_chars"]]
    )
    assert m1["n_chars"].sum() == sum(len(t) for t in texts)


def test_inverted_index_postings_and_band(ray_session):
    from brinkray.textproc.curation import inverted_index

    # df: a=4, b=3, c=2, d=1, rep=1 (distinct per doc)
    ds = _docs_ds(["a b c", "a b c rep rep", "a b", "a d"]).repartition(3)
    out = (
        inverted_index(ds, df_min=2, df_max=3)
        .to_pandas()
        .sort_values("token")
        .reset_index(drop=True)
    )
    assert list(out["token"]) == ["b", "c"]       # a=4 > max, d/rep=1 < min
    assert list(out["df"]) == [3, 2]
    assert list(out["postings"]) == ["0,1,2", "0,1"]


def test_top_bigrams_counts_and_ties(ray_session):
    from brinkray.textproc.curation import top_bigrams

    ds = _docs_ds(["x y x y z", "x y. w", "solo"]).repartition(2)
    out = top_bigrams(ds, k=3).to_pandas()
    # bigrams: 'x y':3, 'y x':1, 'y z':1, 'y w':1 (punct is a token
    # boundary, not a barrier: 'y. w' -> y,w adjacency); single-token
    # and empty docs contribute nothing
    assert list(out["bigram"]) == ["x y", "y w", "y x"]
    assert list(out["n"]) == [3, 1, 1]


def test_partitioned_write_pruned_read(ray_session, tmp_path):
    import os

    from brinkray.textproc.curation import partitioned_write_pruned_read

    ds = _docs_ds(
        ["aa", "bbbb", "cc", "ddd", "e"],
        langs=["en", "de", "en", "fr", "de"],
    ).repartition(2)
    out = partitioned_write_pruned_read(
        ds, str(tmp_path / "part"), langs=["en", "de"]
    )
    out = out.sort_values("lang").reset_index(drop=True)
    # de: docs 1 ('bbbb') + 4 ('e'); en: docs 0 ('aa') + 2 ('cc')
    assert out["lang"].tolist() == ["de", "en"]
    assert out["n_docs"].tolist() == [2, 2]
    assert out["n_chars"].tolist() == [5, 4]
    assert out["sum_doc_id"].tolist() == [5, 2]
    # the fr partition exists on disk but was never read (pruned)
    assert os.path.isdir(tmp_path / "part" / "lang=fr")


def test_adjacent_edit_distances_kernel(ray_session):
    import duckdb

    from brinkray.textproc.curation import adjacent_edit_distances

    texts = ["kitten", "sitting", "sunday", "saturday", "abc"]
    ds = _docs_ds(texts).repartition(2)
    out = (
        adjacent_edit_distances(ds, prefix_len=200)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # classic values: kitten->sitting 3, sunday->saturday 3 (via duckdb)
    con = duckdb.connect()
    for _, row in out.iterrows():
        want = con.execute(
            "SELECT levenshtein(?, ?)",
            [texts[int(row["doc_id"])], texts[int(row["doc_id"]) + 1]],
        ).fetchone()[0]
        assert row["edit_distance"] == want, (row["doc_id"], want)
    assert out[out["doc_id"] == 0]["edit_distance"].iloc[0] == 3


def test_train_val_test_split_deterministic(ray_session):
    from brinkray.textproc.curation import train_val_test_split

    ds = _docs_ds(["a"] * 64)
    out1 = train_val_test_split(ds).to_pandas().sort_values("doc_id")
    out2 = train_val_test_split(ds).to_pandas().sort_values("doc_id")
    assert out1["split"].tolist() == out2["split"].tolist()
    # hash-derived: matches the md5-nibble rule exactly
    for doc_id, split in zip(out1["doc_id"], out1["split"]):
        nib = int(hashlib.md5(str(doc_id).encode()).hexdigest()[-1], 16)
        exp = "train" if nib < 12 else ("valid" if nib < 14 else "test")
        assert split == exp
    assert set(out1["split"]) == {"train", "valid", "test"}


def test_sentence_stats_explode(ray_session):
    from brinkray.textproc.curation import sentence_stats

    texts = [
        "First one here. Second!  Third sentence? ",
        "no terminal punctuation at all",
        "...",  # splits to empty fragments only -> zero rows
    ]
    out = (
        sentence_stats(_docs_ds(texts))
        .to_pandas()
        .sort_values(["doc_id", "sent_idx"])
        .reset_index(drop=True)
    )
    assert out[out["doc_id"] == 0]["n_tokens"].tolist() == [3, 1, 2]
    # sent_idx is the RAW split position (1-based), stable under filtering
    assert out[out["doc_id"] == 0]["sent_idx"].tolist() == [1, 2, 3]
    assert out[out["doc_id"] == 1]["n_tokens"].tolist() == [5]
    assert (out["doc_id"] == 2).sum() == 0


def test_snapshot_diff_classifies(ray_session):
    import ray.data as rd

    from brinkray.textproc.curation import snapshot_diff

    a = _docs_ds(["same", "old text", "goner"])            # ids 0,1,2
    b_tbl = pa.table(
        {"doc_id": pa.array([0, 1, 9], pa.int64()),
         "text": pa.array(["same", "new text", "fresh"], pa.string())}
    )
    out = (
        snapshot_diff(a, rd.from_arrow(b_tbl)).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 2, 9]
    assert out["change"].tolist() == ["modified", "removed", "added"]


def test_apply_changes_merge_semantics(ray_session):
    import ray.data as rd

    from brinkray.textproc.curation import apply_changes

    base = _docs_ds(["keep", "revise me", "drop me"])  # ids 0,1,2
    ch = pa.table(
        {
            "doc_id": pa.array([1, 2, 7], pa.int64()),
            "op": pa.array(["upsert", "delete", "upsert"], pa.string()),
            "text": pa.array(["revised", "", "inserted"], pa.string()),
        }
    )
    out = (
        apply_changes(base, rd.from_arrow(ch)).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [0, 1, 7]
    assert out["text"].tolist() == ["keep", "revised", "inserted"]


def test_gopher_flags_discriminate(ray_session):
    """Every Gopher rule must actually vary on constructed inputs (a
    flag that is constant is a vacuous check)."""
    import pyarrow as pa
    import ray.data as rd

    from brinkray.textproc.quality import gopher_quality_flags

    texts = [
        " ".join(["the", "a"] + ["words"] * 60),         # keep
        "short doc the a",                                 # too few words
        " ".join(["the", "a"] + ["xy"] * 60),             # mean len < 4
        " ".join(["qqqq"] * 60),                           # no stopwords
    ]
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    )
    out = gopher_quality_flags(ds).to_pandas().sort_values("doc_id")
    assert out["keep"].tolist() == [True, False, False, False]
    assert out["ok_words"].tolist() == [True, False, True, True]
    assert out["ok_mean_len"].tolist()[2] == False
    assert out["ok_stopwords"].tolist()[3] == False


def test_dsir_weights_prefer_target_like_docs(ray_session):
    """A doc made of target-slice bigrams outweighs one made of
    non-target bigrams; ratios are exact integer ppm."""
    import pyarrow as pa
    import ray.data as rd

    from brinkray.textproc.curation import dsir_weights

    rows = [
        (0, "en", "alpha beta alpha beta alpha beta"),
        (1, "en", "alpha beta gamma delta"),
        (2, "zh", "omega psi omega psi omega psi"),
        (3, "zh", "alpha beta omega psi"),
    ]
    ds = rd.from_arrow(
        pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "lang": pa.array([r[1] for r in rows], pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string()),
        })
    )
    out = dsir_weights(ds).to_pandas().set_index("doc_id")
    # 'alpha beta' appears 4x in en out of 5 total -> 800000 ppm
    # 'omega psi' appears 0x in en out of 4 total? no: doc2 zh 3x + doc3 zh 1x = 4 all, 0 en -> 0 ppm
    assert out.loc[0, "weight_ppm"] > out.loc[2, "weight_ppm"]
    assert out.loc[2, "weight_ppm"] == 0
    w3 = out.loc[3, "weight_ppm"]  # one 'alpha beta' (800000) + 'beta omega' (0? en count) + 'omega psi'
    assert w3 >= 800000  # contains at least the en-heavy bigram


def _tfidf_bruteforce(texts, threshold_ppm=90_000, df_min=2, df_max=100,
                      scale=10_000):
    """Pure-Python tf-idf cosine pairs in exact big-int arithmetic."""
    import re
    from collections import Counter

    tok = re.compile(r"[a-z0-9]+")
    tfs = [Counter(tok.findall(t.lower())) for t in texts]
    df = Counter()
    for c in tfs:
        df.update(c.keys())
    w = [
        {t: (n * scale) // df[t] for t, n in c.items()
         if df_min <= df[t] <= df_max}
        for c in tfs
    ]
    out = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            shared = set(w[a]) & set(w[b])
            if not shared:
                continue
            dot = sum(w[a][t] * w[b][t] for t in shared)
            na = sum(x * x for x in w[a].values())
            nb = sum(x * x for x in w[b].values())
            if dot * dot * 1_000_000 >= threshold_ppm * na * nb:
                out[(a, b)] = (dot, (dot * dot * 1_000_000) // (na * nb))
    return out


def test_doc_similarity_tfidf_matches_bruteforce(ray_session):
    from brinkray.textproc.curation import doc_similarity_tfidf

    texts = [
        "alpha beta gamma delta rare1",
        "alpha beta gamma delta rare2",
        "alpha beta epsilon zeta",
        "totally different words here entirely",
        "totally different words here entirely",
        "beta beta beta gamma gamma unique9",
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
    ] * 3  # repetition pushes common tokens past df_max=... keeps df in band
    ds = _docs_ds(texts)
    got = doc_similarity_tfidf(ds).to_pandas()
    want = _tfidf_bruteforce(texts)
    got_map = {
        (int(a), int(b)): (int(d), int(c))
        for a, b, d, c in zip(got["doc_a"], got["doc_b"],
                              got["dot_w"], got["cos2_ppm"])
    }
    assert got_map == want
    assert len(want) > 0


def test_doc_similarity_tfidf_join_path_equals_broadcast(ray_session):
    from brinkray.textproc.curation import doc_similarity_tfidf

    texts = [
        f"shared{i % 4} common tail token{i}" for i in range(40)
    ]
    ds = _docs_ds(texts)
    a = doc_similarity_tfidf(ds, norms="broadcast").to_pandas()
    b = doc_similarity_tfidf(ds, norms="join").to_pandas()
    a = a.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    b = b.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    assert a.equals(b)
    assert len(a) > 0


def test_bpe_merge_candidates_counts(ray_session):
    from brinkray.textproc.curation import bpe_merge_candidates

    # "abab" -> pairs ab, ba, ab ; word boundaries never pair
    ds = _docs_ds(["abab cd", "ab dc", "Z!z"])
    out = bpe_merge_candidates(ds, k=10)
    got = dict(zip(out["pair"], out["n"]))
    assert got == {"ab": 3, "ba": 1, "cd": 1, "dc": 1}
    # ordering: n desc, then pair text asc
    assert list(out["pair"]) == ["ab", "ba", "cd", "dc"]


def test_bpe_merge_candidates_unicode_word_isolation(ray_session):
    from brinkray.textproc.curation import bpe_merge_candidates

    # tokenizer is [a-z0-9]+ on lower(): digits join, punctuation splits
    ds = _docs_ds(["a1a1 b2", "A1A1"])
    out = bpe_merge_candidates(ds, k=10)
    got = dict(zip(out["pair"], out["n"]))
    assert got == {"1a": 2, "a1": 4, "b2": 1}


def test_mixture_weights_isqrt_and_shares(ray_session):
    import math

    import ray.data as rd

    from brinkray.textproc.curation import mixture_weights

    t = pa.table({
        "source": pa.array(["s1", "s1", "s2", "s3"], pa.string()),
        "text": pa.array(
            ["one two three", "four five", "a b c d e f g", "x"],
            pa.string()),
    })
    out = mixture_weights(rd.from_arrow(t))
    n = dict(zip(out["source"], out["n_tokens"]))
    assert n == {"s1": 5, "s2": 7, "s3": 1}
    w = dict(zip(out["source"], out["w_isqrt"]))
    assert w == {"s1": math.isqrt(5), "s2": math.isqrt(7), "s3": 1}
    tot = sum(w.values())
    sh = dict(zip(out["source"], out["share_ppm"]))
    assert sh == {k: v * 1_000_000 // tot for k, v in w.items()}
    # alpha=1 degenerates to proportional
    out1 = mixture_weights(rd.from_arrow(t), alpha_sqrt=False)
    assert dict(zip(out1["source"], out1["w_isqrt"])) == n


def test_postings_varint_bytes_bruteforce(ray_session):
    """Delta-gap varint sizes == a driver-side re-derivation, incl. the
    doc_id=0 first-posting edge (bit_length 0 -> 1 byte) and a
    multi-byte gap (>= 128 -> 2 bytes)."""
    from brinkray.textproc.curation import postings_varint_bytes
    from brinkray.textproc.hashing import tokens_of

    texts = ["zebra apple", "apple", "unique1 words here"] + [
        f"filler{i}" for i in range(3, 200)
    ] + ["zebra again"]  # zebra postings [0, 200]: gap 200 -> 2 bytes
    out = postings_varint_bytes(_docs_ds(texts), df_min=2).to_pandas()
    got = {
        r.token: (int(r.df), int(r.varint_bytes))
        for r in out.itertuples()
    }

    posts = {}
    for i, x in enumerate(texts):
        for tok in set(tokens_of(x)):
            posts.setdefault(tok, []).append(i)
    want = {}
    for tok, ids in posts.items():
        if len(ids) < 2:
            continue
        vals = [ids[0]] + [b - a for a, b in zip(ids, ids[1:])]
        want[tok] = (
            len(ids),
            sum(max(1, (v.bit_length() + 6) // 7) for v in vals),
        )
    assert got == want
    assert got["zebra"] == (2, 3)  # id 0 -> 1 byte, gap 200 -> 2 bytes


def test_vocab_growth_bruteforce(ray_session):
    """Heaps curve == a sequential scan of the doc_id-ordered token
    stream at every threshold (2^k and the full corpus)."""
    from brinkray.textproc.curation import vocab_growth
    from brinkray.textproc.hashing import tokens_of

    texts = [f"tok{i % 37} tok{i % 11} common word number{i}"
             for i in range(100)]
    out = vocab_growth(_docs_ds(texts), min_exp=3).to_pandas()
    stream = [t for x in texts for t in tokens_of(x)]
    total = len(stream)
    ths = []
    n = 8
    while n < total:
        ths.append(n)
        n <<= 1
    ths.append(total)
    want = [(N, len(set(stream[:N]))) for N in ths]
    got = list(zip(out["n_prefix"].astype(int), out["vocab"].astype(int)))
    assert got == want


def test_warcish_container_roundtrip_and_resume(ray_session, tmp_path):
    """Binary container: write -> parse-back identity, skip-existing
    resume (second write leaves bytes untouched), bad-magic raise."""
    import os

    import ray.data as rd

    from brinkray.textproc.curation import (
        read_warcish_manifest,
        write_warcish_shards,
    )

    t = pa.table(
        {
            "url": pa.array(
                [f"https://site-a.test/p/{i}" for i in range(40)], pa.string()
            ),
            "status": pa.array([200 + (i % 3) for i in range(40)], pa.int32()),
            "body": pa.array(
                [f"<html>{'x' * i}</html>".encode() for i in range(40)],
                pa.binary(),
            ),
        }
    )
    d = str(tmp_path / "wrc")
    m1 = write_warcish_shards(rd.from_arrow(t), d).to_pandas()
    files = sorted(os.listdir(d))
    sizes = {f: os.path.getsize(os.path.join(d, f)) for f in files}
    mtimes = {f: os.path.getmtime(os.path.join(d, f)) for f in files}

    back = read_warcish_manifest(d).to_pandas()
    key = ["shard", "n_records", "n_bytes", "status_sum", "checksum"]
    a = m1[key].sort_values("shard").reset_index(drop=True)
    b = back[key].sort_values("shard").reset_index(drop=True)
    assert a.astype("int64").equals(b.astype("int64"))
    assert int(a["n_records"].sum()) == 40

    # resume: re-running the sink skips every existing shard file
    write_warcish_shards(rd.from_arrow(t), d).materialize()
    assert {f: os.path.getsize(os.path.join(d, f)) for f in files} == sizes
    assert {f: os.path.getmtime(os.path.join(d, f)) for f in files} == mtimes

    # corruption: flip the magic of the first record in one shard
    p = os.path.join(d, files[0])
    blob = bytearray(open(p, "rb").read())
    blob[0:4] = b"XXXX"
    open(p, "wb").write(bytes(blob))
    import pytest as _pytest

    with _pytest.raises(Exception, match="bad magic"):
        read_warcish_manifest(d).materialize()


def test_warcish_container_binary_payloads(ray_session, tmp_path):
    """The container claims raw-byte framing: NON-UTF-8 payloads
    (gzip-like, image-like bytes) must round-trip — the checksum used
    to .decode('utf-8') and raised on any binary body."""
    import hashlib

    import ray.data as rd

    from brinkray.textproc.curation import (
        read_warcish_manifest,
        write_warcish_shards,
    )

    bodies = [
        b"\x1f\x8b\x08\x00" + bytes(range(256)),   # gzip-magic + all bytes
        b"\xff\xd8\xff\xe0jpegish\x80\xfe",
        b"plain ascii is fine too",
    ]
    t = pa.table(
        {
            "url": pa.array(
                [f"https://bin.test/b/{i}" for i in range(len(bodies))],
                pa.string(),
            ),
            "status": pa.array([200] * len(bodies), pa.int32()),
            "body": pa.array(bodies, pa.binary()),
        }
    )
    d = str(tmp_path / "wrcbin")
    m1 = write_warcish_shards(rd.from_arrow(t), d).to_pandas()
    back = read_warcish_manifest(d).to_pandas()
    key = ["shard", "n_records", "n_bytes", "status_sum", "checksum"]
    a = m1[key].sort_values("shard").reset_index(drop=True).astype("int64")
    b = back[key].sort_values("shard").reset_index(drop=True).astype("int64")
    assert a.equals(b)
    assert int(a["n_bytes"].sum()) == sum(len(x) for x in bodies)
    # checksum is the RAW-byte md5 (DuckDB md5_number_lower(blob)
    # semantics): little-endian uint64 of the last 8 digest bytes
    MOD = 1_000_000_007
    want = sum(
        int.from_bytes(hashlib.md5(x).digest()[8:], "little") % MOD
        for x in bodies
    )
    assert int(a["checksum"].sum()) == want


def test_tfidf_pair_packing_guard(ray_session):
    """doc ids >= 2^31 must raise (signed-int64 pair packing would
    silently corrupt), not just ids >= 2^32 as the old guard checked."""
    import pytest as _pytest
    import ray.data as rd

    from brinkray.textproc.curation import doc_similarity_tfidf

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 1 << 31], pa.int64()),
                "text": pa.array(["shared words here"] * 3, pa.string()),
            }
        )
    )
    with _pytest.raises(Exception, match="31 bits"):
        doc_similarity_tfidf(docs, df_min=1, df_max=10).materialize()


def test_unigram_surprisal_bruteforce_and_join_path(ray_session):
    """Both paths (broadcast LUT, hash-join past the gate) must equal
    the per-doc brute force: sum over token occurrences of
    bit_length(U) - bit_length(count)."""
    from collections import Counter

    import pyarrow as pa
    import ray

    from brinkray.textproc.curation import unigram_surprisal
    from brinkray.textproc.hashing import tokens_of

    texts = [
        "the cat sat on the mat",
        "the the the",
        "zyxqj rare token here",
        "",  # zero tokens: excluded from the result on both paths
        "Cat CAT cat!",
        "numbers 123 and 123 again 456",
    ]
    docs = ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    )

    allt = [tok for x in texts for tok in tokens_of(x)]
    counts = Counter(allt)
    bit_u = len(allt).bit_length()
    want = {}
    for i, x in enumerate(texts):
        toks = tokens_of(x)
        if not toks:
            continue
        sb = sum(bit_u - counts[t].bit_length() for t in toks)
        want[i] = (len(toks), sb, sb * 1000 // len(toks))

    for kwargs in ({}, {"max_broadcast_bytes": 0, "num_partitions": 2}):
        out = unigram_surprisal(docs, **kwargs).to_pandas()
        got = {
            int(r.doc_id): (int(r.n_tokens), int(r.surprisal_bits),
                            int(r.mean_surprisal_milli))
            for r in out.itertuples()
        }
        assert got == want, kwargs


def test_unigram_surprisal_empty_corpus(ray_session):
    import pyarrow as pa
    import ray

    from brinkray.textproc.curation import unigram_surprisal

    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array([""], pa.string())})
    )
    out = unigram_surprisal(docs)
    assert out.count() == 0
    # to_pandas() on any 0-row dataset drops columns (Ray yields no
    # batches); the typed schema is the stable contract
    assert out.schema().names == [
        "doc_id", "n_tokens", "surprisal_bits", "mean_surprisal_milli"
    ]


def test_dsir_weights_join_path_equals_broadcast(ray_session):
    """Past max_broadcast_bytes the ratio table stays distributed
    (explode ⋈ ratios -> groupby(doc) -> left-outer totals); forced
    with cap=0 and pinned bit-equal to the broadcast LUT path,
    including zero-bigram docs and a bigram shared across target and
    non-target slices (non-trivial floor ratio)."""
    import pandas as pd
    import pyarrow as pa
    import ray

    from brinkray.textproc.curation import dsir_weights

    texts = [
        "the cat sat on the mat",
        "one",                      # zero bigrams
        "",                         # zero tokens
        "the cat runs fast",
        "the cat eats fish",        # "the cat" appears in en and fr
        "unique words only here",
    ]
    langs = ["en", "fr", "en", "en", "fr", "fr"]
    docs = ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts,
                  "lang": langs})
    )
    b = (dsir_weights(docs).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    j = (dsir_weights(docs, max_broadcast_bytes=0, num_partitions=2)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(b, j[b.columns])
    # "the cat" ratio = floor(2e6/3): docs 0,3 (en) carry it once each
    row0 = b.loc[b.doc_id == 0].iloc[0]
    assert row0.n_bigrams == 5


def test_phrase_search_overlaps_and_positions(ray_session):
    import ray.data as rd

    from brinkray.textproc.curation import phrase_search

    texts = [
        "a a a b",          # "a a" overlaps: matches at 1 and 2
        "x a a y a a",      # matches at 2 and 5
        "a b a b",          # no consecutive "a a"
        "",                 # shorter than the phrase
        "A a",              # tokens_of lowercases: match at 1
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    out = (phrase_search(ds, ("a", "a")).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    got = {int(r.doc_id): (int(r.n_matches), int(r.first_pos))
           for r in out.itertuples()}
    assert got == {0: (2, 1), 1: (2, 2), 4: (1, 1)}
    # single-token phrase degenerates to term frequency + first position
    one = phrase_search(ds, ("b",)).to_pandas()
    got1 = {int(r.doc_id): (int(r.n_matches), int(r.first_pos))
            for r in one.itertuples()}
    assert got1 == {0: (1, 4), 2: (2, 2)}


def test_tf_df_scores_join_path_equals_broadcast(ray_session):
    """Past max_broadcast_bytes the df table attaches by hash join
    instead of the ray.put sorted-array probe; forced with cap=0 and
    pinned equal row-for-row."""
    import pandas as pd

    from brinkray.textproc.curation import tf_df_scores

    ds = _docs_ds([
        "the cat sat on the mat",
        "the dog",
        "cat cat cat",
        "",
    ])
    key = ["doc_id", "token"]
    b = (tf_df_scores(ds).to_pandas()
         .sort_values(key).reset_index(drop=True))
    j = (tf_df_scores(ds, max_broadcast_bytes=0, num_partitions=2)
         .to_pandas().sort_values(key).reset_index(drop=True))
    pd.testing.assert_frame_equal(b, j[b.columns])
    # spot-check: 'the' df=2, doc0 tf=2 -> 1_000_000
    row = b[(b.doc_id == 0) & (b.token == "the")].iloc[0]
    assert (row.tf, row.df, row.tfidf_ppm) == (2, 2, 1_000_000)


def test_bigram_pmi_join_path_equals_broadcast(ray_session):
    """Past max_broadcast_bytes the unigram table attaches by two hash
    joins instead of the ray.put dict; forced with cap=0 and pinned
    equal."""
    import pandas as pd

    from brinkray.textproc.curation import bigram_pmi

    ds = _docs_ds([
        "new york new york city",
        "new york is a city",
        "a brand new day in york",
        "city of york",
    ])
    b = (bigram_pmi(ds, min_count=2).to_pandas()
         .sort_values("bigram").reset_index(drop=True))
    j = (bigram_pmi(ds, min_count=2, max_broadcast_bytes=0,
                    num_partitions=2).to_pandas()
         .sort_values("bigram").reset_index(drop=True))
    pd.testing.assert_frame_equal(b, j[b.columns])
    assert "new york" in set(b["bigram"])


def test_positional_index_build_search_and_resume(ray_session, tmp_path):
    """phrase_search_index over a write_positional_index artifact must
    equal the one-off scan (overlaps, repeated phrase tokens, misses),
    read only the phrase buckets, and leave the artifact byte-identical
    across repeated searches."""
    import os

    import pandas as pd
    import ray.data as rd

    from brinkray.textproc.curation import (
        phrase_search,
        phrase_search_index,
        write_positional_index,
    )

    texts = ["a a a b", "x a a y a a", "a b a b", "", "A a",
             "batch window batch window end"]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    idx = str(tmp_path / "posidx")
    n = write_positional_index(docs, idx, num_buckets=8)
    assert n == sum(len(t.split()) for t in texts)
    assert os.path.exists(f"{idx}/manifest.parquet")

    for phrase in (("a", "a"), ("batch", "window"), ("b",), ("zz", "qq")):
        scan = (phrase_search(docs, phrase).to_pandas()
                .sort_values("doc_id").reset_index(drop=True)
                if phrase != ("zz", "qq") else None)
        via = phrase_search_index(idx, phrase).to_pandas()
        if phrase == ("zz", "qq"):
            assert len(via) == 0
            continue
        via = via.sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(scan, via[scan.columns])

    # repeated searches never touch the artifact
    stamps = {
        p: os.path.getmtime(os.path.join(r, p))
        for r, _, fs in os.walk(idx) for p in fs
    }
    phrase_search_index(idx, ("a", "a")).to_pandas()
    stamps2 = {
        p: os.path.getmtime(os.path.join(r, p))
        for r, _, fs in os.walk(idx) for p in fs
    }
    assert stamps == stamps2

    # a build without the manifest marker is not a usable index
    os.remove(f"{idx}/manifest.parquet")
    with pytest.raises(FileNotFoundError, match="manifest"):
        phrase_search_index(idx, ("a", "a"))


def test_embedding_semantic_decontaminate(ray_session):
    """Planted paraphrase (near-copy of a bench vector) is flagged,
    orthogonal vectors are not, bench vectors never self-flag."""
    import ray.data as rd

    from brinkray.textproc.curation import embedding_semantic_decontaminate

    rng = np.random.default_rng(11)
    d = 8
    bench = rng.normal(size=(2, d))
    contaminated = bench[0] + 0.05 * rng.normal(size=d)
    clean = rng.normal(size=d)
    # make 'clean' genuinely orthogonal to both bench vectors
    for b in bench:
        clean -= (clean @ b) / (b @ b) * b
    vecs = [bench[0], bench[1], contaminated, clean]
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs]),
    }))
    out = embedding_semantic_decontaminate(
        ds, bench_ids=[0, 1], threshold=0.8).to_pandas()
    assert list(out["vec_id"]) == [2]
    assert out["max_cos"].iloc[0] > 0.9
    # empty bench set -> typed empty result
    empty = embedding_semantic_decontaminate(ds, bench_ids=[99])
    assert empty.count() == 0


def test_doc_similarity_tfidf_empty_band(ray_session):
    """Every token's df above df_max (the sf0.1 bench shape): the
    banded df table is EMPTY and comes back column-less from Ray —
    the operator must return the typed empty pair table, not KeyError
    (regression: the round-5 band pushdown broke this until the bench
    sweep caught it)."""
    from brinkray.textproc.curation import doc_similarity_tfidf

    # 4 docs sharing one token -> df=4 > df_max=3
    ds = _docs_ds(["common", "common", "common", "common"])
    out = doc_similarity_tfidf(ds, df_min=2, df_max=3)
    assert out.count() == 0
    assert out.schema().names == ["doc_a", "doc_b", "dot_w", "cos2_ppm"]
