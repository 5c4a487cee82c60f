"""Correctness of the training-data operators on constructed inputs
(known duplicates, known neighbors) — not just smoke."""

import numpy as np
import pyarrow as pa
import pytest


def _docs_ds(texts):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


BASE = (
    "the quick brown fox jumps over the lazy dog while the crawler "
    "walks the frontier and extracts anchors from every page it fetches "
    "in breadth first order across many waves of discovery"
)


def test_exact_dedup_groups(ray_session):
    from brinkray.textproc.dedup import exact_dedup

    texts = [BASE, "unique one", BASE, "unique two", BASE]
    out = exact_dedup(_docs_ds(texts)).to_pandas().sort_values("doc_id")
    assert len(out) == 3  # three distinct texts
    grp = out[out["doc_id"] == 0].iloc[0]
    assert grp["n_dups"] == 3  # ids 0, 2, 4 collapse; min id kept
    assert set(out["doc_id"]) == {0, 1, 3}


def test_minhash_finds_near_dups(ray_session):
    from brinkray.textproc.dedup import minhash_lsh_pairs

    near = BASE.replace("lazy", "sleepy")  # one-token edit
    far = "completely different content about databases and queries and joins"
    texts = [BASE, near, far]
    pairs = minhash_lsh_pairs(_docs_ds(texts), threshold=0.5).to_pandas()
    assert {(0, 1)} == set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert pairs["est_jaccard"].iloc[0] > 0.5


def test_minhash_identical_docs_est_one(ray_session):
    from brinkray.textproc.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(_docs_ds([BASE, BASE]), threshold=0.9).to_pandas()
    assert len(pairs) == 1
    assert pairs["est_jaccard"].iloc[0] == 1.0


def test_simhash_near_dups(ray_session):
    from brinkray.textproc.dedup import simhash_pairs

    near = BASE + " extra"
    far = "orthogonal vocabulary entirely nothing shared whatsoever here at all"
    pairs = simhash_pairs(_docs_ds([BASE, near, far]), max_hamming=10).to_pandas()
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert (0, 1) in got
    assert (0, 2) not in got


def test_ngram_jaccard_exact_values(ray_session):
    from brinkray.textproc.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(_docs_ds([BASE, BASE]), threshold=0.5).to_pandas()
    assert len(pairs) == 1
    assert pairs["jaccard"].iloc[0] == 1.0


def _emb_ds(vectors):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(len(vectors)), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vectors], pa.list_(pa.float32())
                ),
            }
        )
    )


def test_cosine_topk_exact(ray_session):
    from brinkray.textproc.similarity import cosine_topk

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((200, 16))
    q = vecs[5]
    out = cosine_topk(_emb_ds(vecs), q, k=5)
    # brute-force numpy ground truth
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    cos = unit @ qn
    want = np.lexsort((np.arange(len(vecs)), -cos))[:5]
    assert out["vec_id"].to_pylist() == list(want)
    assert out["vec_id"].to_pylist()[0] == 5  # the query itself


def test_cosine_topk_filtered_blocks(ray_session):
    """Round-4 regression (ann_filtered_topk driver crash): an upstream
    prefilter that empties whole blocks makes Ray emit ZERO-COLUMN
    blocks; cosine_topk must drop them instead of ArrowInvalid-ing in
    pa.concat_tables."""
    from brinkray.textproc.similarity import cosine_topk

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((200, 16))
    q = vecs[3]
    allowed = np.arange(8)  # first block only — later blocks all-filtered

    def prefilter(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(np.isin(ids, allowed)))

    ds = _emb_ds(vecs).repartition(16).map_batches(
        prefilter, batch_format="pyarrow"
    )
    out = cosine_topk(ds, q, k=5)
    unit = vecs[:8] / np.linalg.norm(vecs[:8], axis=1, keepdims=True)
    cos = unit @ (q / np.linalg.norm(q))
    want = np.lexsort((np.arange(8), -cos))[:5]
    assert out["vec_id"].to_pylist() == list(want)

    # every block filtered away -> empty result with the right schema,
    # not a crash
    def drop_all(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(np.zeros(t.num_rows, dtype=bool)))

    empty = cosine_topk(
        _emb_ds(vecs).repartition(8).map_batches(drop_all, batch_format="pyarrow"),
        q, k=5,
    )
    assert empty.num_rows == 0
    assert empty.column_names == ["vec_id", "cosine"]


def test_ivf_pruned_filtered_blocks(ray_session):
    """Same latent zero-column-block hazard for the pruned-IVF probe
    scan (similarity.py round-4 sites :167/:268)."""
    from brinkray.textproc.similarity import cosine_topk, ivf_topk_pruned

    rng = np.random.default_rng(13)
    vecs = rng.standard_normal((240, 16))
    q = vecs[9]
    allowed = np.arange(0, 240, 7)

    def prefilter(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(np.isin(ids, allowed)))

    ds = _emb_ds(vecs).repartition(12).map_batches(
        prefilter, batch_format="pyarrow"
    )
    exact = cosine_topk(ds, q, k=5)
    pruned = ivf_topk_pruned(ds, q, k=5, n_centroids=4, nprobe=2)
    assert pruned["vec_id"].to_pylist() == exact["vec_id"].to_pylist()


def test_collect_drops_degenerate_blocks(ray_session):
    """_collect contract: zero-column and zero-row tables are dropped;
    all-degenerate input yields schema.empty_table()."""
    import ray

    from brinkray.textproc.similarity import _collect

    schema = pa.schema([("vec_id", pa.int64()), ("cosine", pa.float64())])

    class _Fake:
        def __init__(self, tabs):
            self._refs = [ray.put(t) for t in tabs]

        def to_arrow_refs(self):
            return self._refs

    good = pa.table({"vec_id": pa.array([1, 2], pa.int64()),
                     "cosine": pa.array([0.5, 0.25], pa.float64())})
    zero_col = pa.table({})
    zero_row = schema.empty_table()
    out = _collect(_Fake([zero_col, good, zero_row]), schema)
    assert out.num_rows == 2 and out.schema == schema
    out2 = _collect(_Fake([zero_col, zero_row]), schema)
    assert out2.num_rows == 0 and out2.schema == schema


def test_ivf_topk_contains_query_vector(ray_session):
    from brinkray.textproc.similarity import ivf_topk

    rng = np.random.default_rng(9)
    vecs = rng.standard_normal((300, 16))
    out = ivf_topk(_emb_ds(vecs), vecs[17], k=5, n_centroids=8, nprobe=3)
    assert 17 in out["vec_id"].to_pylist()  # own cluster is always probed


def test_embedding_dup_pairs(ray_session):
    from brinkray.textproc.dedup import embedding_dup_pairs

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((50, 16))
    vecs[20] = vecs[10] * 1.001  # near-identical direction
    out = embedding_dup_pairs(_emb_ds(vecs), threshold=0.999).to_pandas()
    assert (10, 20) in set(zip(out["doc_a"], out["doc_b"]))


def test_embedding_dup_recall_at_1e5(ray_session, caplog):
    """Scale check: 10^5 vectors, 50 planted near-dups — the
    size-adaptive multi-table LSH must keep recall 1.0 with ZERO
    silent bucket-cap drops (the no-silent-caps rule: any truncation
    is logged)."""
    import logging

    from brinkray.textproc.dedup import embedding_dup_pairs

    rng = np.random.default_rng(7)
    n, dim = 100_000, 32
    vecs = rng.standard_normal((n, dim))
    planted = [(2 * k, 2 * k + 1) for k in range(0, 100, 2)]
    for a, b in planted:
        vecs[b] = vecs[a] + 1e-4 * rng.standard_normal(dim)
    with caplog.at_level(logging.WARNING, logger="brinkray.dedup"):
        out = embedding_dup_pairs(_emb_ds(vecs), threshold=0.999).to_pandas()
    got = set(zip(out["doc_a"], out["doc_b"]))
    missed = [p for p in planted if p not in got]
    assert not missed, f"recall < 1.0: missed {missed}"
    drops = [r for r in caplog.records if "truncates" in r.message]
    assert not drops, f"silent-cap drops logged: {drops[0].message}"


def test_lang_id_profiles(ray_session):
    from brinkray.textproc.quality import add_lang_id

    texts = [
        "the cat and the dog sat on a mat in the house",
        "der Hund und die Katze sind in das Haus mit den Kindern",
        "",
    ]
    out = add_lang_id(_docs_ds(texts)).to_pandas().sort_values("doc_id")
    assert list(out["lang_pred"]) == ["en", "de", "und"]


def test_token_counts_match_python(ray_session):
    from brinkray.textproc.quality import add_token_counts

    texts = ["a b  c", "hello, world! x", ""]
    out = add_token_counts(_docs_ds(texts)).to_pandas().sort_values("doc_id")
    assert list(out["n_tokens"]) == [len(t.split()) for t in texts]
    assert list(out["n_bpe_ish"]) == [3, 5, 0]


def test_fingerprint_normalizes_whitespace(ray_session):
    from brinkray.textproc.hashing import fingerprint

    assert fingerprint("Hello  World") == fingerprint("hello world")
    assert fingerprint("hello world") != fingerprint("hello word")
    # md5 hex of the normalized text (SQL-twinnable: DuckDB md5())
    import hashlib

    assert fingerprint("x") == hashlib.md5(b"x").hexdigest()
    assert fingerprint(" A\tb\n") == hashlib.md5(b"a b").hexdigest()


def test_dup_span_counts_exact(ray_session):
    from brinkray.textproc.dedup import dup_span_counts

    shared = "alpha beta gamma delta epsilon zeta"  # a 6-token span
    texts = [
        "one two three " + shared + " tail words here",
        "completely different prefix " + shared,
        "no overlap with anything else at all in this doc",
        "x",  # fewer than k tokens -> never emitted
    ]
    out = (
        dup_span_counts(_docs_ds(texts), k=6)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # only docs 0 and 1 share 6-token windows; exactly one window each
    assert out["doc_id"].tolist() == [0, 1]
    assert out["n_dup_windows"].tolist() == [1, 1]


def test_linear_quality_scorer_exact(ray_session):
    import ray.data as rd

    from brinkray.textproc.quality import (
        LINEAR_MODEL_WEIGHTS,
        score_documents_linear,
    )

    texts = ["Hi there! 42 is a number.", "", "aaa bbb"]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    out = (
        score_documents_linear(rd.from_arrow(tbl), concurrency=2, batch_size=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    w = LINEAR_MODEL_WEIGHTS
    import re

    for i, t in enumerate(texts):
        exp = (
            w["bias"]
            + w["n_tokens"] * len(re.findall(r"\S+", t))
            + w["n_chars"] * len(t)
            + w["n_punct"] * len(re.findall(r"[.!?]", t))
            + w["n_digits"] * len(re.findall(r"[0-9]", t))
        )
        assert int(out["score"][i]) == exp
        assert bool(out["passes"][i]) == (exp > 0)


def _media_tbl(rows):
    return pa.table(
        {
            "media_id": pa.array([r[0] for r in rows], pa.int64()),
            "kind": pa.array([r[1] for r in rows], pa.string()),
            "payload": pa.array([r[2] for r in rows], pa.binary()),
            "mime": pa.array([r[3] for r in rows], pa.string()),
            "width": pa.array([-1] * len(rows), pa.int32()),
            "height": pa.array([-1] * len(rows), pa.int32()),
            "duration_ms": pa.array([-1] * len(rows), pa.int32()),
        }
    )


def test_media_codecs_roundtrip():
    from brinkray.textproc.media import (
        block_mean_resize,
        decode_bmp,
        decode_wav,
        encode_bmp,
        encode_wav,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)  # exact roundtrip
    # block-mean resize of a constant image is constant
    const = np.full((20, 30, 3), 100, dtype=np.uint8)
    assert np.allclose(block_mean_resize(const, 4, 4), 100.0)

    x = np.sin(np.linspace(0, 440 * 2 * np.pi, 16000))
    y, rate = decode_wav(encode_wav(x, rate=16000))
    assert rate == 16000 and len(y) == 16000
    assert np.abs(y - x).max() < 1e-3  # 16-bit quantization only


def test_media_decode_real(ray_session):
    import ray.data as rd

    from brinkray.textproc.media import (
        MediaDecoder,
        decode_media,
        encode_bmp,
        encode_video,
        encode_wav,
        frame_sample_plan,
    )

    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    wav = encode_wav(np.sin(np.linspace(0, 100, 8000)))
    vid = encode_video([img, img // 2, img // 4], fps=1.0)
    tbl = _media_tbl(
        [
            (1, "image", encode_bmp(img), "image/bmp"),
            (2, "audio", wav, "audio/wav"),
            (3, "video", vid, "video/x-bmv"),
        ]
    )
    out = decode_media(rd.from_arrow(tbl), concurrency=1, batch_size=8).to_pandas()
    assert len(out) == 3
    feats = {m: np.array(f) for m, f in zip(out["media_id"], out["features"])}
    assert all(len(f) == MediaDecoder.FEATURE_DIM for f in feats.values())
    # image features carry real pixel statistics (mean in position 27)
    assert abs(feats[1][27] - img.mean() / 255.0) < 1e-6
    # deterministic across runs
    out2 = decode_media(rd.from_arrow(tbl), concurrency=1, batch_size=8).to_pandas()
    assert np.allclose(np.stack(out["features"].values), np.stack(out2["features"].values))
    # compressed formats refuse loudly (no codec libs in the sandbox)
    with pytest.raises(Exception):
        MediaDecoder()._features("image", b"\x89PNG fake")
    assert frame_sample_plan(3500, fps=1.0) == [0, 1000, 2000, 3000]


def test_media_pil_slot_wired(monkeypatch):
    """The import-gated PIL slot in _decode_image is REAL: with a stub
    'PIL' present, a non-BMP payload decodes through Image.open(...)
    .convert('RGB') and yields the same features as its BMP twin;
    with PIL absent (this sandbox) the same payload raises the
    clearly-marked NotImplementedError."""
    import io as _io

    from brinkray.textproc import media

    rng = np.random.default_rng(3)
    pixels = rng.integers(0, 255, size=(6, 5, 3), dtype=np.uint8)
    fake_png = b"\x89PNG\r\n" + pixels.shape[0].to_bytes(2, "big") \
        + pixels.shape[1].to_bytes(2, "big") + pixels.tobytes()

    class _StubImage:
        @staticmethod
        def open(buf):
            payload = buf.read()
            assert payload[:6] == b"\x89PNG\r\n"
            h = int.from_bytes(payload[6:8], "big")
            w = int.from_bytes(payload[8:10], "big")
            arr = np.frombuffer(payload[10:], dtype=np.uint8).reshape(h, w, 3)

            class _Img:
                def convert(self, mode):
                    assert mode == "RGB"
                    return arr

            return _Img()

    # PIL absent (the sandbox): loud, specific refusal
    assert media._PILImage is None
    with pytest.raises(NotImplementedError, match="PIL"):
        media._decode_image(fake_png)

    # PIL present (stubbed): the non-BMP payload decodes through the
    # slot and matches the BMP-encoded twin bit for bit
    monkeypatch.setattr(media, "_PILImage", _StubImage)
    via_pil = media._decode_image(fake_png)
    assert np.array_equal(via_pil, pixels)
    dec = media.MediaDecoder()
    f_pil = dec._image_features(fake_png)
    f_bmp = dec._image_features(media.encode_bmp(pixels))
    assert np.array_equal(f_pil, f_bmp)
    # BMP stays on the numpy path even with PIL present
    assert np.array_equal(
        media._decode_image(media.encode_bmp(pixels)), pixels
    )


def test_media_decode_fake_plumbing(ray_session):
    import ray.data as rd

    from brinkray.textproc.media import MediaDecoder, decode_media

    tbl = _media_tbl([(1, "image", b"\x89PNG fake", "image/png")])
    out = decode_media(rd.from_arrow(tbl), concurrency=1, batch_size=8, fake=True).to_pandas()
    assert len(out) == 1 and len(out["features"][0]) == MediaDecoder.FEATURE_DIM


def test_kmeans_labels_recovers_blobs(ray_session):
    """3 well-separated blobs -> the distributed Lloyd's rounds must
    produce a partition identical to ground truth (up to relabeling),
    and identical across block layouts."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from brinkray.textproc.similarity import kmeans_labels

    rng = np.random.default_rng(21)
    centers = np.array([[10.0, 0, 0], [0, 10.0, 0], [0, 0, 10.0]])
    truth = rng.integers(0, 3, 300)
    x = centers[truth] + rng.standard_normal((300, 3)) * 0.3
    tbl = pa.table(
        {
            "vec_id": pa.array(range(300), pa.int64()),
            "embedding": pa.array([r.tolist() for r in x], pa.list_(pa.float32())),
        }
    )
    a = (
        kmeans_labels(rd.from_arrow(tbl).repartition(6), k=3, iters=8)
        .to_pandas()
        .sort_values("vec_id")["cluster"]
        .to_numpy()
    )
    # partition equality up to relabeling: each truth blob maps to
    # exactly one predicted cluster and vice versa
    df = pd.DataFrame({"t": truth, "p": a})
    assert df.groupby("t")["p"].nunique().max() == 1
    assert df.groupby("p")["t"].nunique().max() == 1
    b = (
        kmeans_labels(rd.from_arrow(tbl).repartition(1), k=3, iters=8)
        .to_pandas()
        .sort_values("vec_id")["cluster"]
        .to_numpy()
    )
    assert (a == b).all()  # layout determinism


# ------------------------------------------------- driver-visible dedup twins
def _brute_jaccard_pairs(texts, threshold):
    """Reference all-pairs shingle Jaccard (numpy, driver-side)."""
    from brinkray.textproc.hashing import shingle_hashes

    sets = [np.unique(shingle_hashes(t)) for t in texts]
    out = []
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = len(np.intersect1d(sets[i], sets[j]))
            union = len(np.union1d(sets[i], sets[j]))
            jac = inter / max(1, union)
            if jac >= threshold:
                out.append((i, j, jac))
    return sorted(out)


def _randomish_corpus(n=60, seed=11):
    """Deterministic corpus with planted near-dups at several overlap
    levels (no RNG: fixtures must be stable across runs)."""
    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lam mu nu xi omicron pi rho sigma tau upsilon").split()
    texts = []
    for i in range(n):
        toks = [words[(i * 7 + k * 3) % len(words)] for k in range(30)]
        texts.append(" ".join(toks))
        if i % 5 == 0:  # plant a near-dup: mutate a few tokens
            mut = list(toks)
            for m in range(i % 4):
                mut[m * 5 % len(mut)] = words[(i + m) % len(words)]
            texts.append(" ".join(mut))
    return texts


def test_shingle_join_pairs_equals_bruteforce(ray_session):
    """Prefix-filtered exact similarity join == brute force, row for
    row, at several thresholds (the recall-1 claim the driver twin
    relies on)."""
    from brinkray.textproc.dedup import shingle_join_pairs

    texts = _randomish_corpus()
    for t, bb in ((0.3, 128 << 20), (0.5, 128 << 20), (0.8, 128 << 20),
                  (0.5, 0)):  # bb=0 forces the per-pair SHUFFLE verify
        out = shingle_join_pairs(_docs_ds(texts), threshold=t,
                                 bucket_cap=1 << 20,
                                 max_broadcast_bytes=bb).to_pandas()
        got = sorted(
            (int(a), int(b), float(j))
            for a, b, j in zip(out["doc_a"], out["doc_b"], out["jaccard"])
        )
        want = _brute_jaccard_pairs(texts, t)
        assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in want]
        for (_, _, gj), (_, _, wj) in zip(got, want):
            assert gj == wj  # exact int division both sides


def test_winnowing_fingerprints_bruteforce(ray_session):
    """Numpy sliding-window winnowing == a pure-python per-window
    re-derivation (rightmost minimal hash per window, distinct
    positions), plus the SIGMOD'03 detection guarantee: two docs
    sharing a substring of length >= k + w - 1 share at least one
    selected fingerprint HASH."""
    from brinkray.textproc.dedup import winnowing_fingerprints
    from brinkray.textproc.hashing import md5_lower64

    k, w = 8, 4
    shared = "the exact shared passage survives winnowing"
    texts = [
        "left context before " + shared + " and a right tail here",
        "completely different opening words " + shared + " other ending",
        "no overlap with anything else in this tiny corpus at all",
        "short",  # < k + w - 1: no complete window, no output row
    ]

    def brute(s):
        n = len(s) - k + 1
        if n < w:
            return None
        hs = [md5_lower64(s[p:p + k]) for p in range(n)]
        sel = set()
        for e in range(w - 1, n):
            win = hs[e - w + 1:e + 1]
            mn = min(win)
            # rightmost position achieving the min
            off = max(j for j, v in enumerate(win) if v == mn)
            sel.add(e - w + 1 + off)
        return sorted(sel), hs

    out = winnowing_fingerprints(_docs_ds(texts)).to_pandas()
    out = out.set_index("doc_id")
    assert set(out.index) == {0, 1, 2}  # doc 3 too short
    sel_hashes = {}
    for i, s in enumerate(texts):
        b = brute(s)
        if b is None:
            continue
        sel, hs = b
        assert int(out.loc[i, "n_fingerprints"]) == len(sel)
        assert int(out.loc[i, "fp_checksum"]) == sum(
            hs[p] % 1_000_000_007 for p in sel
        )
        sel_hashes[i] = {hs[p] for p in sel}
    assert sel_hashes[0] & sel_hashes[1]  # shared-substring guarantee
    assert not (sel_hashes[2] & sel_hashes[0])


def _brute_overlap_pairs(texts, num, den):
    """Reference all-pairs overlap coefficient (exact rational gate)."""
    from brinkray.textproc.hashing import shingle_hashes

    sets = [np.unique(shingle_hashes(t)) for t in texts]
    out = []
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = len(np.intersect1d(sets[i], sets[j]))
            m = max(1, min(len(sets[i]), len(sets[j])))
            if den * inter >= num * m:
                out.append((i, j, inter / m))
    return sorted(out)


def test_overlap_dup_pairs_equals_bruteforce(ray_session):
    """Asymmetric prefix-filter containment join == brute force at
    several thresholds, both verify paths — including a planted
    SUBSET dup (short doc quoted inside a long one: overlap 1.0,
    Jaccard far below threshold) that the Jaccard join must miss and
    the overlap join must catch."""
    from brinkray.textproc.dedup import overlap_dup_pairs, shingle_join_pairs

    texts = _randomish_corpus()
    quote = " ".join(texts[0].split()[:8])  # 8-token excerpt of doc 0
    long_doc = texts[3] + " " + texts[7] + " " + texts[11]
    texts = texts + [quote, long_doc, quote + " " + texts[5]]
    for (p, q), bb in (((4, 5), 128 << 20), ((1, 2), 128 << 20),
                       ((9, 10), 128 << 20), ((4, 5), 0)):  # bb=0 => shuffle
        out = overlap_dup_pairs(_docs_ds(texts), threshold_num=p,
                                threshold_den=q, bucket_cap=1 << 20,
                                max_broadcast_bytes=bb).to_pandas()
        got = sorted(
            (int(a), int(b), float(v))
            for a, b, v in zip(out["doc_a"], out["doc_b"], out["overlap"])
        )
        want = _brute_overlap_pairs(texts, p, q)
        assert got == want
    # the containment property: the quote-in-doc0 pair is overlap-only
    qi = len(texts) - 3
    ov = {(a, b) for a, b, _ in _brute_overlap_pairs(texts, 4, 5)}
    assert (0, qi) in ov
    jac = shingle_join_pairs(_docs_ds(texts), threshold=0.8,
                             bucket_cap=1 << 20).to_pandas()
    jpairs = {(int(a), int(b)) for a, b in zip(jac["doc_a"], jac["doc_b"])}
    assert (0, qi) not in jpairs


def test_minhash_verified_equals_bruteforce(ray_session):
    """1-row-band LSH propose + exact verify at 0.5 == brute force
    (the dedup_minhash_lsh driver contract)."""
    from brinkray.textproc.dedup import jaccard_verify, minhash_lsh_pairs

    texts = _randomish_corpus()
    ds = _docs_ds(texts)
    cand = minhash_lsh_pairs(ds, threshold=0.2, bands=64,
                             bucket_cap=1 << 20).materialize()
    out = jaccard_verify(ds, cand, threshold=0.5).to_pandas()
    got = sorted((int(a), int(b)) for a, b in zip(out["doc_a"], out["doc_b"]))
    want = [(a, b) for a, b, _ in _brute_jaccard_pairs(texts, 0.5)]
    assert got == want


def test_simhash_md5_pigeonhole_exact(ray_session):
    """md5-hash simhash at max_hamming=3: result == brute-force Hamming
    over the signatures (pigeonhole recall is exact for d <= 3)."""
    from brinkray.textproc.dedup import simhash_pairs
    from brinkray.textproc.hashing import hamming64, simhash64_md5

    texts = _randomish_corpus(40)
    sigs = [simhash64_md5(t) for t in texts]
    want = sorted(
        (i, j, hamming64(sigs[i], sigs[j]))
        for i in range(len(sigs)) for j in range(i + 1, len(sigs))
        if hamming64(sigs[i], sigs[j]) <= 3
    )
    out = simhash_pairs(_docs_ds(texts), max_hamming=3, hash_kind="md5",
                        bucket_cap=1 << 20).to_pandas()
    got = sorted(
        (int(a), int(b), int(h))
        for a, b, h in zip(out["doc_a"], out["doc_b"], out["hamming"])
    )
    assert got == want


def test_ivf_topk_pruned_equals_bruteforce(ray_session):
    """Radius-bound pruned IVF == exhaustive cosine top-k membership
    AND scores, on a clustered corpus where pruning actually skips
    cells."""
    import ray.data as rd

    from brinkray.textproc.similarity import cosine_topk, ivf_topk_pruned

    rng = np.random.default_rng(3)
    centers = rng.standard_normal((6, 16)) * 4
    vecs = np.concatenate(
        [c + rng.standard_normal((50, 16)) * 0.3 for c in centers]
    )
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs],
                                      pa.list_(pa.float32())),
            }
        )
    )
    q = vecs[7]
    exact = cosine_topk(ds, q, k=10)
    pruned = ivf_topk_pruned(ds, q, k=10, n_centroids=8, nprobe=2)
    assert pruned["vec_id"].to_pylist() == exact["vec_id"].to_pylist()
    assert pruned["cosine"].to_pylist() == exact["cosine"].to_pylist()


def test_ivf_persisted_index_equals_bruteforce(ray_session, tmp_path):
    """write_ivf_index + ivf_search_index == brute force, membership
    AND scores, on a clustered corpus — and the artifact is REUSED
    across queries (no rebuild: the second search runs off the same
    on-disk centroids/cells, which stay byte-identical)."""
    import os

    import ray.data as rd

    from brinkray.textproc.similarity import (
        cosine_topk,
        ivf_search_index,
        write_ivf_index,
    )

    rng = np.random.default_rng(17)
    centers = rng.standard_normal((5, 16)) * 4
    vecs = np.concatenate(
        [c + rng.standard_normal((40, 16)) * 0.3 for c in centers]
    )
    ds = _emb_ds(vecs).repartition(6)
    idx = str(tmp_path / "ivf")
    write_ivf_index(ds, idx, n_centroids=8)
    assert os.path.exists(f"{idx}/centroids.parquet")
    cell_dirs = [d for d in os.listdir(f"{idx}/cells") if d.startswith("cell=")]
    assert len(cell_dirs) >= 2  # genuinely partitioned
    sizes = {
        d: sorted(os.listdir(os.path.join(idx, "cells", d)))
        for d in cell_dirs
    }
    for qi in (7, 63, 155):
        q = vecs[qi]
        exact = cosine_topk(ds, q, k=10)
        got = ivf_search_index(idx, q, k=10, nprobe=2)
        assert got["vec_id"].to_pylist() == exact["vec_id"].to_pylist()
        # scores agree to the last few ulps (BLAS dot summation order
        # differs with block shape — membership is the driver contract)
        assert np.allclose(got["cosine"].to_numpy(),
                           exact["cosine"].to_numpy(), rtol=0, atol=1e-12)
    # reuse: three searches later the artifact is untouched
    assert {
        d: sorted(os.listdir(os.path.join(idx, "cells", d)))
        for d in cell_dirs
    } == sizes


def test_dup_span_scrub_removes_planted_span(ray_session):
    """A 12-token span planted in two docs is removed from BOTH; unique
    text survives; short docs pass through untouched."""
    from brinkray.textproc.dedup import dup_span_scrub

    span = " ".join(f"w{i}" for i in range(12))
    texts = [
        f"alpha beta {span} gamma delta",
        f"{span} epsilon zeta eta theta iota kappa",
        "tiny doc",
        "completely unique text with many words but no shared window here ok",
    ]
    # both paths: shared-set broadcast (default) and the distributed
    # hash-join fallback (max_broadcast_windows=0) must agree exactly
    for mbw in (5_000_000, 0):
        out = (
            dup_span_scrub(_docs_ds(texts), k=12,
                           max_broadcast_windows=mbw).to_pandas()
            .sort_values("doc_id").reset_index(drop=True)
        )
        assert out.loc[0, "text_scrubbed"] == "alpha beta gamma delta"
        assert out.loc[0, "n_removed"] == 12
        assert out.loc[1, "text_scrubbed"].startswith("epsilon")
        assert (out.loc[2, "n_removed"] == 0
                and out.loc[2, "text_scrubbed"] == "tiny doc")
        assert out.loc[3, "n_removed"] == 0
        assert out["n_tokens"].tolist() == [
            len(t.split()) for t in texts
        ]


def _cdc_bruteforce(texts, head_chars=512, window=12):
    import hashlib
    from collections import defaultdict

    chunks_of = {}
    for did, text in enumerate(texts):
        head = text[:head_chars]
        if not head:
            continue
        cuts = [0]
        for i in range(window, len(head) + 1):
            if hashlib.md5(head[i - window:i].encode()).hexdigest()[0] == "0":
                cuts.append(i)
        if cuts[-1] != len(head):
            cuts.append(len(head))
        chunks_of[did] = [
            hashlib.md5(head[a:b].encode()).hexdigest()
            for a, b in zip(cuts[:-1], cuts[1:])
        ]
    docset = defaultdict(set)
    for did, cs in chunks_of.items():
        for c in set(cs):
            docset[c].add(did)
    return {
        did: (len(cs), sum(1 for c in cs if len(docset[c]) >= 2))
        for did, cs in chunks_of.items()
    }


def test_cdc_chunk_dedup_matches_bruteforce(ray_session):
    from brinkray.textproc.dedup import cdc_chunk_dedup

    rng = __import__("numpy").random.default_rng(11)
    alpha = "abcdefghij "
    base = "".join(alpha[i] for i in rng.integers(0, len(alpha), 400))
    texts = [
        base,
        "XYZPREFIX-" + base,       # shifted copy: CDC must re-sync
        base[:200] + "q" * 50 + base[200:],  # mid-edit
        "".join(alpha[i] for i in rng.integers(0, len(alpha), 300)),
        "",                         # empty: excluded on both sides
        "short",                    # shorter than the window
    ]
    got = cdc_chunk_dedup(_docs_ds(texts)).to_pandas()
    got_map = {
        int(d): (int(n), int(x))
        for d, n, x in zip(got["doc_id"], got["n_chunks"],
                           got["n_dup_chunks"])
    }
    want = _cdc_bruteforce(texts)
    assert got_map == want
    # the property fixed windows lack: the PREFIX-shifted copy still
    # shares most chunks with the original
    assert want[1][1] >= want[1][0] // 2
    assert 4 not in got_map  # empty doc emits nothing


def test_ivf_persisted_multi_query_equals_bruteforce(ray_session, tmp_path):
    """Batched search over the persisted IVF artifact: per-query
    results equal brute force AND the single-query search, on a
    clustered corpus where pruning genuinely fires."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from brinkray.textproc.similarity import (
        ivf_search_index,
        ivf_search_index_multi,
        write_ivf_index,
    )

    rng = np.random.default_rng(5)
    n, d = 600, 12
    centers = rng.normal(size=(6, d)) * 4
    E = np.vstack([c + rng.normal(size=(n // 6, d)) for c in centers])
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(E.tolist()),
    }))
    idx = str(tmp_path / "ivf")
    write_ivf_index(ds, idx, n_centroids=6)

    qids = [3, 77, 205, 599]
    Q = E[qids]
    multi = ivf_search_index_multi(
        idx, Q, k=5, nprobe=2, query_ids=qids).to_pandas()
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    for qi, qv in zip(qids, Q):
        qn = qv / np.linalg.norm(qv)
        cos = En @ qn
        want = set(np.lexsort((np.arange(n), -cos))[:5])
        got = set(multi[multi.qid == qi]["vec_id"])
        single = set(ivf_search_index(idx, qv, k=5, nprobe=2)
                     .to_pandas()["vec_id"])
        assert got == want == single, qi
