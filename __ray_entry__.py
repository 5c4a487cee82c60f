"""Driver contract for the graft builder (Ray Data target).

The driver initializes Ray itself before importing this module; nothing
here (or in brinkray) calls ray.init()/ray.shutdown().

``entry()`` runs the flagship pipeline (synthesize a Common-Crawl-shaped
web from sf0.001 documents, crawl it with the BFS-wave engine) and
returns the handler-event table. ``queries()`` exposes one callable per
implemented operator family (SURVEY.md §2 + the training-data ops);
``oracle_sql()`` gives the DuckDB-checkable subset — column names match
exactly between the Ray results and the SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF0001 = "/root/testdata/sf0.001"

_memo: dict[str, Any] = {}


def _ds(sf_dir: str, table: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet")


def _to_pandas(ds):
    """ds.to_pandas() loses the schema on empty datasets; rebuild it."""
    import pyarrow as pa

    df = ds.to_pandas()
    if len(df.columns) == 0:
        schema = ds.schema()
        df = pa.schema(zip(schema.names, schema.types)).empty_table().to_pandas()
    return df


def entry() -> Any:
    """Flagship: synthesize pages from sf0.001 documents, run the full
    crawl, return the FIFO-ordered events table (drops bodies)."""
    from brinkray.engine.crawl import EngineOptions
    from brinkray.pipelines import crawl_documents_site

    result = crawl_documents_site(
        SF0001, pages_per_doc=1.0, cap=400, options=EngineOptions(seen_shards=2)
    )
    t = result.events_table()
    return t.select(["wave", "order_key", "linked_from", "url", "status", "cached"])


def _crawl_result(sf_dir: str):
    if sf_dir not in _memo:
        from brinkray.engine.crawl import EngineOptions
        from brinkray.pipelines import crawl_documents_site

        _memo[sf_dir] = crawl_documents_site(
            sf_dir, pages_per_doc=1.0, cap=800, options=EngineOptions(seen_shards=2)
        )
    return _memo[sf_dir]


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------


def _q_distinct_users(sf_dir: str):
    from ray.data.aggregate import Count

    ev = _ds(sf_dir, "events").select_columns(["event_type", "user_id"])
    pairs = ev.groupby(["event_type", "user_id"]).aggregate(Count(alias_name="c"))
    return (
        pairs.groupby("event_type")
        .aggregate(Count(alias_name="n_users"))
        .to_pandas()
    )


def _q_status_routing(sf_dir: str):
    from ray.data.aggregate import Count

    return (
        _ds(sf_dir, "events")
        .groupby("event_type")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )


def _q_substring_detector(sf_dir: str):
    import pyarrow.compute as pc

    docs = _ds(sf_dir, "documents").select_columns(["doc_id", "source", "text"])
    hits = docs.map_batches(
        lambda t: t.filter(pc.match_substring(t["text"], "window")).select(
            ["doc_id", "source"]
        ),
        batch_format="pyarrow",
    )
    return hits.to_pandas()


def _q_per_source_budget(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    return (
        _ds(sf_dir, "documents")
        .groupby("source")
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="total_chars"))
        .to_pandas()
    )


def _q_frontier_ordering(sf_dir: str):
    return (
        _ds(sf_dir, "events")
        .select_columns(["event_id", "ts", "event_type"])
        .sort(["ts", "event_id"])
        .limit(100)
        .to_pandas()
    )


def _q_normalize_projection(sf_dir: str):
    import pyarrow as pa

    from brinkray.ref.urls import normalize_url

    ignored = frozenset({"session"})

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        srcs = t["source"].to_pylist()
        canons = [
            normalize_url(f"https://{s}.test/d/{i}?b=2&a=1&session=x{i}", ignored)
            for i, s in zip(ids, srcs)
        ]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "canon_url": pa.array(canons, pa.string()),
            }
        )

    return (
        _ds(sf_dir, "documents")
        .select_columns(["doc_id", "source"])
        .map_batches(fn, batch_format="pyarrow")
        .to_pandas()
    )


def _q_fetch_join(sf_dir: str):
    """Fetch-as-join (J1): broadcast the small side, look up per batch."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    import numpy as np

    cust = _ds(sf_dir, "customer").select_columns(["c_custkey", "c_name"]).to_pandas()
    max_ck = int(cust["c_custkey"].max())
    # dense custkey -> name array broadcast once; per-batch lookup is a
    # pure numpy gather (no per-row Python)
    names = np.empty(max_ck + 1, dtype=object)
    names[cust["c_custkey"].to_numpy()] = cust["c_name"].to_numpy()
    lookup_ref = ray.put(names)

    def fn(t: pa.Table) -> pa.Table:
        lut = ray.get(lookup_ref)
        uids = np.asarray(t["user_id"].to_pylist(), dtype=np.int64)
        ck = uids % max_ck + 1
        got = lut[ck]
        keep = got != None  # noqa: E711 — elementwise on object array
        return pa.table(
            {
                "event_id": pc.filter(t["event_id"], pa.array(keep.astype(bool))),
                "c_name": pa.array(got[keep].tolist(), pa.string()),
            }
        )

    return (
        _ds(sf_dir, "events")
        .select_columns(["event_id", "user_id"])
        .map_batches(fn, batch_format="pyarrow")
        .to_pandas()
    )


def _q_dedup_exact(sf_dir: str):
    from brinkray.textproc.dedup import exact_dedup

    return exact_dedup(_ds(sf_dir, "documents")).to_pandas()


def _q_quality_model_scores(sf_dir: str):
    """Model-inference stage shape: an actor pool scores each doc with
    a linear quality model (weights loaded once per actor __init__,
    one integer matmul per batch). Integer features/weights => exact,
    DuckDB-certifiable."""
    from brinkray.textproc.quality import score_documents_linear

    out = score_documents_linear(_ds(sf_dir, "documents")).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_dup_ngram_spans(sf_dir: str):
    """Exact duplicated 12-token-span detection (the exact-substring
    dedup shape): per doc, how many of its distinct 12-token windows
    also occur in another doc. Fully md5-keyed, so DuckDB-certifiable."""
    from brinkray.textproc.dedup import dup_span_counts

    out = dup_span_counts(_ds(sf_dir, "documents"), k=12).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_token_counts(sf_dir: str):
    from brinkray.textproc.quality import add_token_counts

    ds = add_token_counts(_ds(sf_dir, "documents").select_columns(["doc_id", "text"]))
    return ds.select_columns(["doc_id", "n_tokens", "n_bpe_ish"]).to_pandas()


def _q_quality_basic(sf_dir: str):
    from brinkray.textproc.quality import add_quality_signals

    ds = add_quality_signals(_ds(sf_dir, "documents").select_columns(["doc_id", "text"]))
    return ds.select_columns(["doc_id", "q_chars", "punct_ratio"]).to_pandas()


def _q_quality_signals(sf_dir: str):
    from brinkray.textproc.quality import add_quality_signals

    ds = add_quality_signals(_ds(sf_dir, "documents").select_columns(["doc_id", "text"]))
    return ds.select_columns(
        ["doc_id", "q_chars", "punct_ratio", "stopword_ratio", "alpha_ratio", "quality"]
    ).to_pandas()


def _q_lang_id(sf_dir: str):
    from ray.data.aggregate import Count

    from brinkray.textproc.quality import add_lang_id

    ds = add_lang_id(_ds(sf_dir, "documents").select_columns(["doc_id", "text"]))
    return ds.groupby("lang_pred").aggregate(Count(alias_name="n")).to_pandas()


def _q_fingerprints(sf_dir: str):
    from brinkray.textproc.quality import add_fingerprint

    ds = add_fingerprint(_ds(sf_dir, "documents").select_columns(["doc_id", "text"]))
    return ds.select_columns(["doc_id", "fp"]).to_pandas()


def _q_dedup_minhash(sf_dir: str):
    """MinHash-LSH near-dup, restructured to a driver-CHECKABLE
    deterministic output: 1-row bands (bands=64 — a true s>=0.5 pair
    escapes all 64 with p=(1-s)^64 <= 5e-20) propose candidates, exact
    set-Jaccard verifies at 0.5, and the emitted (doc_a, doc_b,
    jaccard) is the exact-verified subset — which IS SQL-expressible,
    so DuckDB brute-force re-derives it independently of the MinHash
    machinery. est-threshold 0.2 on the signature prunes candidates
    (P(est<0.2 | s>=0.5) ~ Phi(-4.8)); bucket_cap above corpus size
    keeps conformance recall exact (scale runs keep the default cap +
    logged truncation)."""
    from brinkray.textproc.dedup import jaccard_verify, minhash_lsh_pairs

    docs = _ds(sf_dir, "documents")
    cand = minhash_lsh_pairs(
        docs, threshold=0.2, bands=64, bucket_cap=1 << 20
    ).materialize()
    if cand.count() == 0:
        import pandas as pd

        return pd.DataFrame(
            {"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64"),
             "jaccard": pd.Series(dtype="float64")}
        )
    return _to_pandas(jaccard_verify(docs, cand, threshold=0.5))


def _q_dedup_simhash(sf_dir: str):
    """SimHash near-dup at max_hamming=3 with the md5_number_lower
    token hash: 4-chunk pigeonhole makes candidate recall EXACT for
    distance <= 3, and the md5 hash makes the 64-bit signatures (and
    so the whole Hamming-pair result) independently re-derivable by
    the DuckDB twin — the sketch computation itself is driver-checked.
    Token-less docs are excluded on both sides (SQL's per-token
    aggregation never sees them); bucket_cap above corpus size keeps
    conformance recall exact."""
    import pyarrow.compute as pc

    from brinkray.textproc.dedup import simhash_pairs

    docs = _ds(sf_dir, "documents").map_batches(
        lambda t: t.filter(
            pc.match_substring_regex(pc.utf8_lower(t["text"]), "[a-z0-9]")
        ),
        batch_format="pyarrow",
    )
    return _to_pandas(
        simhash_pairs(docs, max_hamming=3, hash_kind="md5", bucket_cap=1 << 20)
    )


def _q_dedup_ngram(sf_dir: str):
    """Exact n-gram-Jaccard similarity self-join at t=0.5 via the
    prefix-filtered inverted shingle index (AllPairs/PPJoin bound) —
    recall exactly 1 by construction, so the result equals the DuckDB
    brute-force twin row for row. Independent code path from
    dedup_minhash_lsh (which reaches the same answer through
    LSH-propose + exact-verify): the two certify each other AND the
    shared oracle."""
    return _to_pandas(_exact_jaccard_pairs(sf_dir))


def _exact_jaccard_pairs(sf_dir: str):
    """Memoized exact Jaccard>=0.5 pair graph (shared by
    dedup_ngram_jaccard and dedup_clusters_exact — the bench runs
    both; the join is computed once per sf)."""
    key = (sf_dir, "exact_jaccard_pairs_05")
    if key not in _memo:
        from brinkray.textproc.dedup import shingle_join_pairs

        _memo[key] = shingle_join_pairs(
            _ds(sf_dir, "documents"), threshold=0.5, bucket_cap=1 << 20
        ).materialize()
    return _memo[key]


def _q_dedup_containment(sf_dir: str):
    """Exact overlap-coefficient (containment-style) self-join at
    t = 4/5: the asymmetric prefix-filter join (dedup.overlap_dup_pairs
    — each doc indexes its rarest (n - ceil(t*n) + 1) shingles, probes
    with its full set; recall exactly 1 by the AllPairs bound on the
    pair's SMALLER side). Catches subset/quotation duplicates Jaccard
    misses. The emitted overlap is one IEEE division of exact ints and
    the gate is the integer compare 5*|∩| >= 4*min, so the brute-force
    SQL twin matches bit for bit; membership at the boundary is
    rational-exact (no float threshold on either side)."""
    from brinkray.textproc.dedup import overlap_dup_pairs

    out = overlap_dup_pairs(
        _ds(sf_dir, "documents"), threshold_num=4, threshold_den=5,
        bucket_cap=1 << 20,
    ).to_pandas()
    return (
        out[["doc_a", "doc_b", "overlap"]]
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


def _q_token_budget_sample(sf_dir: str):
    """Budgeted corpus selection: per language, admit docs in the
    deterministic md5(text) order until the lang's TOKEN budget (5000
    whitespace tokens) is spent — the greedy per-source budget step of
    training-mix construction (a doc is kept iff its INCLUSIVE running
    token total fits). Built on the distributed per-key ordered cumsum
    (windows.running_totals — one groupby(lang) exchange, vectorized
    mergesort+cumsum bodies); the twin is one SUM() OVER window."""
    import hashlib
    import re

    import pyarrow as pa

    from brinkray.textproc.windows import running_totals

    BUDGET = 5000
    # same whitespace definition as the twin's RE2 '\S+' (= complement
    # of [\t\n\f\r ]) — Python str.split() additionally splits on \x0b
    # and Unicode spaces like NBSP, which would admit a different set
    tok_re = re.compile(r"[^\t\n\f\r ]+")

    def prep(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        return pa.table(
            {
                "lang": t["lang"],
                "doc_id": t["doc_id"],
                "ord": pa.array(
                    [hashlib.md5(x.encode()).hexdigest() for x in texts],
                    pa.string(),
                ),
                "n_tokens": pa.array(
                    [float(len(tok_re.findall(x))) for x in texts],
                    pa.float64(),
                ),
            }
        )

    ds = _ds(sf_dir, "documents").select_columns(
        ["doc_id", "lang", "text"]
    ).map_batches(prep, batch_format="pyarrow")
    rt = running_totals(
        ds, key="lang", ts_col="ord", val_col="n_tokens", id_col="doc_id",
        scale=1,
    )
    import pyarrow.compute as pc

    out = rt.map_batches(
        lambda t: t.filter(pc.less_equal(t["running_cents"], BUDGET)),
        batch_format="pyarrow",
    ).to_pandas()
    out = out.rename(columns={"v_cents": "n_tokens"})
    return (
        out[["lang", "doc_id", "n_tokens"]]
        .sort_values(["lang", "doc_id"])
        .reset_index(drop=True)
    )


def _q_winnowing(sf_dir: str):
    """Winnowing (MOSS) fingerprints per doc: char-8-gram md5 hashes,
    window w=4, rightmost-min selection. The md5_number_lower hash
    keeps every stage SQL-derivable: the twin re-derives k-grams with
    generate_series+substr, the window min with a grouped self-join,
    and the rightmost tie-break with MAX(pos) — so n_fingerprints and
    the mod-1e9+7 checksum of the selected hash SET certify the numpy
    sliding-window kernel row for row."""
    from brinkray.textproc.dedup import winnowing_fingerprints

    return (
        winnowing_fingerprints(_ds(sf_dir, "documents"))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _q_ngram_exact(sf_dir: str):
    """The exact shingle-Jaccard VERIFY kernel on deterministic pairs
    (doc_id, doc_id+1 for doc_id % 7 == 0) — SQL-twinnable, unlike
    dedup_ngram_jaccard whose candidates come from (non-SQL) MinHash
    LSH. Same distributed machinery (broadcast id-array, two groupby
    shuffles); DuckDB re-derives the shingle sets from the text with
    list lambdas, so intersection/union counting is independently
    checked. threshold=0.0 keeps zero-overlap pairs (kernel check,
    not a dedup filter)."""
    import numpy as np
    import pyarrow as pa

    from brinkray.textproc.dedup import jaccard_verify

    docs = _ds(sf_dir, "documents")

    def mk_pairs(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
        a = ids[ids % 7 == 0]
        return pa.table(
            {"doc_a": pa.array(a, pa.int64()), "doc_b": pa.array(a + 1, pa.int64())}
        )

    # pairs whose doc_b falls off the table end drop on BOTH sides:
    # SQL's inner join loses them; verify sees one shingle side and
    # logs + skips (dedup.py::verify cardinality guard)
    cand = (
        docs.select_columns(["doc_id"])
        .map_batches(mk_pairs, batch_format="pyarrow")
        .materialize()
    )
    return _to_pandas(jaccard_verify(docs, cand, threshold=0.0))


def _q_ann_ivf_persisted(sf_dir: str):
    """PERSISTED IVF index: a build-once artifact (centroids + radii +
    the corpus hive-partitioned by cell) under /tmp, REUSED across
    calls — the round-4 gap where the quantizer re-built per query.
    The radius-pruned search reads only probed cell partitions and its
    membership provably equals brute force (the same twin as the
    exhaustive scan). centroids.parquet is written last, so a crashed
    partial build never looks complete."""
    import os

    from brinkray.textproc.similarity import ivf_search_index, write_ivf_index

    tag = os.path.basename(os.path.normpath(sf_dir))
    idx = f"/tmp/brinkray_ivf_{tag}"
    if not os.path.exists(f"{idx}/centroids.parquet"):
        import shutil

        shutil.rmtree(idx, ignore_errors=True)  # clear any partial build
        write_ivf_index(_ds(sf_dir, "embeddings"), idx, n_centroids=16)
    out = ivf_search_index(idx, _query_vec(sf_dir), k=10, nprobe=4).to_pandas()
    return out[["vec_id"]]


def _q_ann_ivf_multi_persisted(sf_dir: str):
    """Batched retrieval over the persisted IVF artifact: top-10 per
    query for the 5 smallest-id embeddings in ONE multi-query search —
    within each probe round the union of the queries' cells is read
    once and scored against all of them (a cell shared by m queries is
    read once, not m times). Exact per query by the radius bound;
    shares ann_multi_topk's brute-force twin (membership per qid)."""
    import os

    import pyarrow.parquet as pq

    from brinkray.textproc.similarity import (
        ivf_search_index_multi,
        write_ivf_index,
    )

    tag = os.path.basename(os.path.normpath(sf_dir))
    idx = f"/tmp/brinkray_ivf_{tag}"
    if not os.path.exists(f"{idx}/centroids.parquet"):
        import shutil

        shutil.rmtree(idx, ignore_errors=True)  # clear any partial build
        write_ivf_index(_ds(sf_dir, "embeddings"), idx, n_centroids=16)
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    t = t.sort_by("vec_id").slice(0, 5)
    import numpy as np

    out = ivf_search_index_multi(
        idx,
        np.array(t["embedding"].to_pylist(), dtype=np.float64),
        k=10, nprobe=4, query_ids=t["vec_id"].to_pylist(),
    ).to_pandas()
    return (out[["qid", "vec_id"]].sort_values(["qid", "vec_id"])
            .reset_index(drop=True))


def _q_ann_ivf_exhaustive(sf_dir: str):
    """IVF with nprobe == n_centroids probes every cluster => exact
    top-k membership == brute force == the ann_cosine SQL twin. Puts a
    driver oracle on the IVF code path (quantizer build, assignment,
    probe masking); the pruned nprobe<nlist variant stays rows-only."""
    from brinkray.textproc.similarity import ivf_topk

    out = ivf_topk(
        _ds(sf_dir, "embeddings"), _query_vec(sf_dir), k=10, n_centroids=16, nprobe=16
    ).to_pandas()
    return out[["vec_id"]]


def _q_embedding_dups(sf_dir: str):
    """Hyperplane-LSH embedding near-dup, restructured driver-visible:
    3-bit tables x 48 (a true cos>=0.4 pair — collision prob per table
    p^3 >= 0.251 — escapes all 48 with p <= 1e-6) propose, exact
    in-bucket cosine verifies at 0.4, and the emitted (vec_a, vec_b)
    membership equals the brute-force SQL twin (threshold margin
    >= 1e-5 measured on all sfs, so the last-ulp summation-order
    difference cannot flip a pair — same argument as
    embedding_dups_exact). bucket_cap above corpus size keeps
    conformance recall exact; scale runs use the default sharp
    (bits ~ log2(n/32)) tables + capped buckets."""
    import pandas as pd

    from brinkray.textproc.dedup import embedding_dup_pairs

    out = _to_pandas(
        embedding_dup_pairs(
            _ds(sf_dir, "embeddings"), threshold=0.4, n_tables=48, bits=3,
            bucket_cap=1 << 20,
        )
    )
    return (
        out.rename(columns={"doc_a": "vec_a", "doc_b": "vec_b"})[["vec_a", "vec_b"]]
        .sort_values(["vec_a", "vec_b"])
        .reset_index(drop=True)
    )


def _query_vec(sf_dir: str):
    """Query = the embedding of the MIN vec_id row (SQL-reproducible,
    unlike 'first row in file order')."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    i = pc.index(t["vec_id"], pc.min(t["vec_id"])).as_py()
    return t["embedding"][i].as_py()


def _q_ann_filtered_topk(sf_dir: str):
    """FILTERED vector search — top-10 cosine restricted to vectors
    whose matching document (vec_id == doc_id by construction) has
    lang='en', the metadata-prefilter ANN shape every retrieval stack
    needs. The small allowed-id set broadcasts once via ray.put
    (searchsorted membership inside map_batches — pre-filter, so
    disallowed vectors never enter the scoring pass); at corpus scale
    the same prefilter becomes a semi-join. Membership compared
    (cosine last-ulp excluded, as in ann_cosine_topk)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from brinkray.textproc.similarity import cosine_topk

    # the filter side is the SMALL dim table: read it directly (the
    # broadcast-small-side pattern, like _query_vec) — a distributed
    # unique() here adds an exchange for nothing and exposed a
    # full-suite-only empty-result flake of Ray's aggregate under
    # heavy concurrent load
    import pyarrow.compute as _pc
    import pyarrow.parquet as pq

    d = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    allowed = np.sort(
        d.filter(_pc.equal(d["lang"], "en"))["doc_id"].to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
    )
    assert len(allowed) > 0
    aref = ray.put(allowed)

    def prefilter(t: pa.Table) -> pa.Table:
        al = ray.get(aref)
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        return t.filter(pa.array(np.isin(ids, al)))

    filtered = _ds(sf_dir, "embeddings").map_batches(
        prefilter, batch_format="pyarrow"
    )
    out = cosine_topk(filtered, _query_vec(sf_dir), k=10).to_pandas()
    return out[["vec_id"]]


def _q_ann_topk(sf_dir: str):
    # Compared output is the top-k MEMBERSHIP (vec_id): the cosine value
    # itself differs from DuckDB in the last ulp (summation order), so
    # scores are pytest-verified, not hash-compared.
    from brinkray.textproc.similarity import cosine_topk

    out = cosine_topk(_ds(sf_dir, "embeddings"), _query_vec(sf_dir), k=10).to_pandas()
    return out[["vec_id"]]


def _q_ann_ivf(sf_dir: str):
    """EXACT top-k through the IVF index with per-cell angular-radius
    pruning (ivf_topk_pruned): probes cells in bound order and stops
    only when no unprobed cell can beat the k-th best, so the
    membership provably equals the brute-force scan — and the DuckDB
    twin. This replaces the fixed-nprobe approximate variant as the
    driver surface (recall<1 is invisible to a SQL oracle); the
    approximate path stays pytest-pinned via its recall bound."""
    from brinkray.textproc.similarity import ivf_topk_pruned

    out = ivf_topk_pruned(
        _ds(sf_dir, "embeddings"), _query_vec(sf_dir), k=10, n_centroids=16,
        nprobe=4,
    ).to_pandas()
    return out[["vec_id"]]


# the crawl-loop oracles re-derive the BFS fixpoint with a DuckDB
# recursive CTE over the SAME synthesized pages (dumped here; the
# driver runs the Ray query before its SQL twin). The crawl's seen set
# and per-host event counts are order-INDEPENDENT (dedup winners change
# lineage, never membership; every occurrence of a successfully fetched
# canon is exactly one event), so reachability-from-seed in SQL is an
# exact independent oracle for the stateful wave loop.
_CRAWL_PAGES_PATH = "/tmp/brinkray_crawl_pages.parquet"


def _dump_crawl_pages(sf_dir: str) -> None:
    import pyarrow.parquet as pq

    from brinkray.pipelines import pages_from_documents

    pages = pages_from_documents(sf_dir, pages_per_doc=1.0, cap=800)
    pq.write_table(pages.select(["url", "html"]), _CRAWL_PAGES_PATH)


def _q_crawl_seen(sf_dir: str):
    import pandas as pd

    res = _crawl_result(sf_dir)
    _dump_crawl_pages(sf_dir)
    items = sorted(res.seen.items())
    return pd.DataFrame(
        {"url": [u for u, _ in items], "status": [s for _, s in items]}
    )


def _q_crawl_events(sf_dir: str):
    """The FULL strict-FIFO handler-event log — now driver-twinned: the
    oracle re-derives every (wave, order_key, linked_from, url, status,
    cached) row by unrolling the BFS wave loop in SQL (see
    _crawl_events_sql)."""
    res = _crawl_result(sf_dir)
    _dump_crawl_pages(sf_dir)
    return res.events_table().select(
        ["wave", "order_key", "linked_from", "url", "status", "cached"]
    )


def _q_crawl_events_sink(sf_dir: str):
    """Streaming events sink e2e (the scale-run result surface): crawl
    with retain_results=False — so NO driver-side events concat even
    exists — sinking each wave's results to parquet straight from the
    cluster, then read the sink back as a lazy Dataset and reduce to
    the order-independent invariant (distinct url/status pairs == the
    final seen set), certified by the same recursive-CTE BFS oracle as
    crawl_seen_set. events_table() on this result raises by design
    (asserted in tests/test_engine_e2e.py)."""
    import tempfile

    from ray.data.aggregate import Max

    from brinkray.engine.crawl import EngineOptions
    from brinkray.pipelines import crawl_documents_site

    sink = tempfile.mkdtemp(prefix="brinkray_events_sink_")
    res = crawl_documents_site(
        sf_dir, pages_per_doc=1.0, cap=800,
        options=EngineOptions(
            seen_shards=2, events_sink_dir=sink, retain_results=False
        ),
    )
    _dump_crawl_pages(sf_dir)
    out = (
        res.events_dataset()
        .select_columns(["url", "status"])
        .groupby("url")
        .aggregate(Max("status", alias_name="status"))  # statuses are unique per url
        .to_pandas()
    )
    out["status"] = out["status"].astype("int64")
    return out.sort_values("url").reset_index(drop=True)


def _q_windowed_counts(sf_dir: str):
    # SQL-checked columns only: COUNT is exact; float SUM differs from
    # DuckDB in the last ulp (summation order) and would hash-mismatch.
    # The full (n, value_sum) variant is the rows-only
    # windowed_event_sums query.
    from brinkray.textproc.windows import tumbling_counts

    out = tumbling_counts(_ds(sf_dir, "events"), window="hour").to_pandas()
    return out[["event_type", "window_start", "n"]]


def _q_windowed_sums(sf_dir: str):
    # Exact fixed-point sums (int64 cents): associative, so the
    # distributed reduction is bit-reproducible and SQL-twinnable.
    from brinkray.textproc.windows import tumbling_sums_fixed

    return tumbling_sums_fixed(_ds(sf_dir, "events"), window="hour").to_pandas()


def _q_hopping_counts(sf_dir: str):
    from brinkray.textproc.windows import hopping_counts

    return hopping_counts(
        _ds(sf_dir, "events"), window_minutes=60, hop_minutes=30
    ).to_pandas()


def _q_event_sessions(sf_dir: str):
    from brinkray.textproc.windows import sessionize

    return sessionize(_ds(sf_dir, "events"), gap_minutes=30).to_pandas()


def _q_running_totals(sf_dir: str):
    """Per-customer running order total (window-function shape)."""
    from brinkray.textproc.windows import running_totals

    out = running_totals(
        _ds(sf_dir, "orders").select_columns(
            ["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"]
        ),
        key="o_custkey",
        ts_col="o_orderdate",
        val_col="o_totalprice",
        id_col="o_orderkey",
    ).to_pandas()
    return out.sort_values(["o_custkey", "o_orderdate", "o_orderkey"]).reset_index(
        drop=True
    )


def _q_user_event_histories(sf_dir: str):
    """Per-user ordered event-type history string (string_agg shape —
    the build-a-training-prompt-per-session primitive)."""
    from brinkray.textproc.windows import collect_ordered

    out = collect_ordered(
        _ds(sf_dir, "events"), key="user_id", ts_col="ts", id_col="event_id",
        val_col="event_type",
    ).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def _q_event_deltas(sf_dir: str):
    """Per-user time-since-previous-event (LAG window function);
    first event of a user gets -1."""
    from brinkray.textproc.windows import lag_deltas

    out = lag_deltas(
        _ds(sf_dir, "events"), key="user_id", ts_col="ts", id_col="event_id"
    ).to_pandas()
    return out.sort_values(["user_id", "event_id"]).reset_index(drop=True)


def _q_rolling_order_sums(sf_dir: str):
    """Per-customer 3-order moving total (ROWS BETWEEN 2 PRECEDING)."""
    from brinkray.textproc.windows import rolling_sums

    out = rolling_sums(
        _ds(sf_dir, "orders"),
        key="o_custkey",
        ts_col="o_orderdate",
        id_col="o_orderkey",
        val_col="o_totalprice",
        window_rows=3,
    ).to_pandas()
    return out.sort_values(["o_custkey", "o_orderkey"]).reset_index(drop=True)


def _q_latest_event_per_user(sf_dir: str):
    """Each user's most recent event (CDC-compaction / keep-latest)."""
    from brinkray.textproc.windows import latest_per_key

    out = latest_per_key(
        _ds(sf_dir, "events"),
        key="user_id",
        order_cols=["ts", "event_id"],
        payload_cols=["event_type"],
    ).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def _q_funnel_attribution(sf_dir: str):
    """Attribution join: each purchase attributed to the user's most
    recent click within 24h (-1 when none)."""
    from brinkray.textproc.windows import funnel_attribution

    out = funnel_attribution(
        _ds(sf_dir, "events"),
        key="user_id",
        ts_col="ts",
        id_col="event_id",
        type_col="event_type",
        first_type="click",
        then_type="purchase",
        within_minutes=24 * 60,
    ).to_pandas()
    return out.sort_values(["user_id", "dst_id"]).reset_index(drop=True)


def _q_event_type_pivot(sf_dir: str):
    """user_id x event_type count matrix (long -> wide pivot)."""
    from brinkray.textproc.windows import pivot_counts

    types = sorted(
        _ds(sf_dir, "events")
        .groupby("event_type")
        .count()
        .to_pandas()["event_type"]
        .tolist()
    )
    return pivot_counts(
        _ds(sf_dir, "events"), row_key="user_id", col_key="event_type",
        col_values=types,
    ).to_pandas().sort_values("user_id").reset_index(drop=True)


def _q_asof_join(sf_dir: str):
    """As-of join: each event matched to the user's latest order at or
    before the event time (inner semantics, like DuckDB ASOF JOIN)."""
    import pyarrow as pa

    from brinkray.textproc.joins import asof_join

    cust = _ds(sf_dir, "customer").select_columns(["c_custkey"]).to_pandas()
    max_ck = int(cust["c_custkey"].max())

    def add_ck(t: pa.Table) -> pa.Table:
        ck = [u % max_ck + 1 for u in t["user_id"].to_pylist()]
        return pa.table(
            {
                "event_id": t["event_id"],
                "ck": pa.array(ck, pa.int64()),
                "ts": t["ts"],
            }
        )

    left = _ds(sf_dir, "events").map_batches(add_ck, batch_format="pyarrow")
    right = _ds(sf_dir, "orders").map_batches(
        lambda t: pa.table(
            {"ck": t["o_custkey"], "o_orderdate": t["o_orderdate"]}
        ),
        batch_format="pyarrow",
    )
    out = asof_join(
        left, right, key="ck", left_ts="ts", right_ts="o_orderdate",
        right_vals=[],
    ).to_pandas()
    out = out.dropna(subset=["o_orderdate"])  # inner semantics
    # merge_asof introduces NaN before the dropna, promoting event_id to
    # float64; the driver's value hash is dtype-sensitive — restore int64.
    out["event_id"] = out["event_id"].astype("int64")
    return out[["event_id", "o_orderdate"]].rename(columns={"o_orderdate": "o_date"})


def _q_interval_join(sf_dir: str):
    """Range join: each event matched to ALL of the user's orders whose
    7-day attribution window [o_orderdate, o_orderdate + 7d] contains
    the event time (inner, closed interval). The event timestamp is
    CONSTRUCTED into the orders era (events are 2024, orders 1995-2001
    — the native join is vacuous) with the same deterministic formula
    in Ray and SQL, spreading events across the full o_orderdate range."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from brinkray.textproc.joins import interval_join

    cust = _ds(sf_dir, "customer").select_columns(["c_custkey"]).to_pandas()
    max_ck = int(cust["c_custkey"].max())
    base_us = np.datetime64("1995-01-01", "us").astype("int64")

    def add_ck(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy()
        ck = [u % max_ck + 1 for u in t["user_id"].to_pylist()]
        off_s = (eid * 1123457) % 208_000_000  # ~6.6y of seconds
        ts2 = (base_us + off_s * 1_000_000).astype("datetime64[us]")
        return pa.table(
            {
                "event_id": t["event_id"],
                "ck": pa.array(ck, pa.int64()),
                "ts": pa.array(ts2),
            }
        )

    seven_days = np.timedelta64(7, "D")

    def add_window(t: pa.Table) -> pa.Table:
        lo = t["o_orderdate"]
        # Arrow durations have no day unit — pass microseconds
        hi = pc.add(lo, pa.scalar(seven_days.astype("timedelta64[us]")))
        return pa.table(
            {"ck": t["o_custkey"], "o_lo": lo, "o_hi": hi, "o_orderkey": t["o_orderkey"]}
        )

    left = _ds(sf_dir, "events").map_batches(add_ck, batch_format="pyarrow")
    right = _ds(sf_dir, "orders").map_batches(add_window, batch_format="pyarrow")
    out = interval_join(
        left, right, key="ck", left_ts="ts", right_lo="o_lo", right_hi="o_hi",
        right_vals=["o_orderkey"], max_span=seven_days,
    ).to_pandas()
    return out[["event_id", "o_orderkey"]].sort_values(
        ["event_id", "o_orderkey"]
    ).reset_index(drop=True)


def _q_revenue_by_nation(sf_dir: str):
    from brinkray.textproc.joins import revenue_by_nation

    out = revenue_by_nation(
        _ds(sf_dir, "orders"),
        _ds(sf_dir, "customer"),
        _ds(sf_dir, "nation"),
        num_partitions=8,
    ).to_pandas()
    return out.sort_values("n_name").reset_index(drop=True)


def _q_dedup_clusters(sf_dir: str):
    from brinkray.textproc.dedup import minhash_lsh_pairs
    from brinkray.textproc.joins import cluster_pairs

    pairs = minhash_lsh_pairs(_ds(sf_dir, "documents"), threshold=0.2)
    return _to_pandas(cluster_pairs(pairs))


def _q_embedding_dups_exact(sf_dir: str):
    """Exact all-pairs cosine >= 0.4 (the brute-force baseline the LSH
    operator approximates). Membership only: the cosine VALUE differs
    from DuckDB in the last ulp (summation order); the 0.4 boundary has
    >= 1e-5 margin on every sf (measured), so membership is stable."""
    from brinkray.textproc.curation import embedding_cosine_pairs_exact

    out = _to_pandas(embedding_cosine_pairs_exact(_ds(sf_dir, "embeddings"), 0.4))
    return out[["vec_a", "vec_b"]]


def _q_embedding_dedup_survivors(sf_dir: str):
    """SemDeDup-shaped semantic dedup end to end (Abbas et al. 2023
    keep-one-per-semantic-cluster, with LSH buckets standing in for
    the k-means cells): hyperplane-LSH candidates -> exact in-bucket
    cosine >= 0.4 verify -> distributed connected components
    (large/small-star rounds; the pair graph never touches the
    driver) -> survivors = per-cluster minimum vec_id + every
    unclustered vector (distributed anti_join — no driver-side set).
    Twin re-derives components as a recursive reachability closure
    over the brute-force pair graph."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from brinkray.textproc.dedup import embedding_dup_pairs
    from brinkray.textproc.joins import anti_join, cluster_pairs

    pairs = embedding_dup_pairs(
        _ds(sf_dir, "embeddings"), threshold=0.4, n_tables=48, bits=3,
        bucket_cap=1 << 20,
    ).select_columns(["doc_a", "doc_b"]).materialize()
    allv = _ds(sf_dir, "embeddings").select_columns(["vec_id"])
    if pairs.count() == 0:
        out = allv.to_pandas()
    else:
        clusters = cluster_pairs(pairs).materialize()  # (doc_id, cluster)
        reps = clusters.map_batches(
            lambda t: pa.table(
                {"vec_id": t.filter(pc.equal(t["doc_id"],
                                             t["cluster"]))["doc_id"]}),
            batch_format="pyarrow",
        )
        rest = anti_join(allv, clusters, on="vec_id", right_on="doc_id")
        out = rest.union(reps).to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def _bench_doc_ids(sf_dir: str) -> list[int]:
    """The 'benchmark set' for decontamination: the 5 smallest doc_ids
    (SQL-reproducible; a real pipeline would pass its eval-set ids)."""
    ids = (
        _ds(sf_dir, "documents")
        .select_columns(["doc_id"])
        .sort("doc_id")
        .limit(5)
        .take_all()
    )
    return [int(r["doc_id"]) for r in ids]


def _q_decontamination(sf_dir: str):
    from brinkray.textproc.curation import decontaminate

    docs = _ds(sf_dir, "documents")
    return _to_pandas(decontaminate(docs, _bench_doc_ids(sf_dir)))


def _q_embedding_decontamination(sf_dir: str):
    """Semantic eval-set decontamination (the embedding-side sibling of
    the n-gram op): corpus vectors with cosine >= 0.3 against ANY of
    the 5 smallest-vec_id 'benchmark' vectors. The bench matrix is
    |bench|-bounded and broadcasts once; the corpus pass is one
    stateless matmul — no exchange. Membership only (the cosine value
    differs from DuckDB in the last ulp; the 0.3 boundary margin is
    >= 4.5e-4 on every sf, measured — the embedding_dups argument)."""
    from brinkray.textproc.curation import embedding_semantic_decontaminate

    out = embedding_semantic_decontaminate(
        _ds(sf_dir, "embeddings"), bench_ids=range(5), threshold=0.3,
    ).to_pandas()
    return (out[["vec_id"]].sort_values("vec_id").reset_index(drop=True)
            if len(out) else out.reindex(columns=["vec_id"]))


def _q_repetition_signals(sf_dir: str):
    from brinkray.textproc.curation import repetition_signals

    return repetition_signals(_ds(sf_dir, "documents")).to_pandas()


def _q_stratified_sample(sf_dir: str):
    from brinkray.textproc.curation import stratified_sample

    return stratified_sample(_ds(sf_dir, "documents"), k=50, by="lang").to_pandas()


def _q_top_docs_per_lang(sf_dir: str):
    """Top 3 documents per language by whitespace token count
    (deterministic: ties broken by ascending doc_id)."""
    from brinkray.textproc.curation import top_k_per_group
    from brinkray.textproc.quality import add_token_counts

    docs = add_token_counts(
        _ds(sf_dir, "documents").select_columns(["doc_id", "lang", "text"])
    )
    return top_k_per_group(
        docs, by="lang", score_col="n_tokens", k=3, id_col="doc_id"
    ).to_pandas()


def _q_tf_df_scores(sf_dir: str):
    from brinkray.textproc.curation import tf_df_scores

    return tf_df_scores(_ds(sf_dir, "documents")).to_pandas()


def _q_heavy_hitters(sf_dir: str):
    from brinkray.textproc.curation import heavy_hitters

    return heavy_hitters(_ds(sf_dir, "documents"), k=20).to_pandas()


def _q_pack_shards(sf_dir: str):
    from brinkray.textproc.curation import pack_shards

    return pack_shards(_ds(sf_dir, "documents"), n_shards=16).to_pandas()


def _q_dedup_incremental(sf_dir: str):
    """Incremental ingestion: docs from source 'src0' are the incoming
    batch, every other source is the existing corpus; admit only
    incoming docs whose 6-token boilerplate-prefix fingerprint is
    unseen (full-text fingerprints are all-distinct in this corpus,
    which would make the operator vacuous)."""
    from brinkray.textproc.dedup import dedup_incremental

    docs = _ds(sf_dir, "documents")
    out = dedup_incremental(
        docs.filter(expr="source == 'src0'"),
        docs.filter(expr="source != 'src0'"),
        prefix_tokens=6,
        num_partitions=8,
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_jsonl_roundtrip(sf_dir: str):
    """JSONL sink + source, certified end to end: write the corpus as
    md5-bucket JSONL shards (resumable layout), read the files back
    with ray.data.read_json, and reduce to a per-shard manifest whose
    n_chars is recomputed from the ROUND-TRIPPED text — the oracle
    derives the same manifest from the original table, so a match
    proves byte fidelity of both directions."""
    import shutil
    import tempfile

    from brinkray.textproc.curation import read_jsonl_manifest, write_jsonl_shards

    out_dir = tempfile.mkdtemp(prefix="brinkray_jsonl_", dir="/tmp")
    try:
        write_jsonl_shards(_ds(sf_dir, "documents"), out_dir).materialize()
        out = read_jsonl_manifest(out_dir).to_pandas()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return out.sort_values("shard").reset_index(drop=True)


def _q_csv_roundtrip(sf_dir: str):
    """CSV sibling of jsonl_roundtrip — same sink/source fidelity
    certificate over ray.data.read_csv + the csv shard writer."""
    import shutil
    import tempfile

    from brinkray.textproc.curation import read_csv_manifest, write_csv_shards

    out_dir = tempfile.mkdtemp(prefix="brinkray_csv_", dir="/tmp")
    try:
        write_csv_shards(_ds(sf_dir, "documents"), out_dir).materialize()
        out = read_csv_manifest(out_dir).to_pandas()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return out.sort_values("shard").reset_index(drop=True)


def _q_export_manifest(sf_dir: str):
    """The WRITE path: materialize the packed-shard layout as
    partitioned parquet under a fresh /tmp dir (resumability — skip
    existing shards, atomic tmp+rename — is pinned by
    tests/test_curation.py); the returned per-shard manifest is
    deterministic and SQL-derivable, putting a driver oracle on the
    export sink itself."""
    import tempfile

    from brinkray.textproc.curation import write_packed_shards

    out_dir = tempfile.mkdtemp(prefix="brinkray_export_", dir="/tmp")
    return write_packed_shards(
        _ds(sf_dir, "documents"), out_dir, n_shards=16
    ).to_pandas()


def _q_partition_pruned_read(sf_dir: str):
    """Hive-partitioned sink + partition-pruned read-back: write docs
    partitioned by lang, read ONLY lang=en / lang=de directories, and
    re-derive the manifest entirely from the round-tripped files."""
    import tempfile

    from brinkray.textproc.curation import partitioned_write_pruned_read

    out_dir = tempfile.mkdtemp(prefix="brinkray_part_", dir="/tmp")
    out = partitioned_write_pruned_read(
        _ds(sf_dir, "documents"), out_dir, langs=["en", "de"]
    )
    return out.sort_values("lang").reset_index(drop=True)


def _q_event_value_pivot(sf_dir: str):
    """Long -> wide SUM pivot (SUM(v) FILTER per event type) in exact
    fixed-point cents."""
    from brinkray.textproc.windows import pivot_sums

    out = pivot_sums(
        _ds(sf_dir, "events"), row_key="user_id", col_key="event_type",
        val_col="value", col_values=["click", "purchase", "view"],
    ).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def _q_trailing_hour_sums(sf_dir: str):
    """Per-user trailing 1-hour value sum (RANGE window frame, peers
    included) in exact fixed-point cents."""
    from brinkray.textproc.windows import trailing_window_sums

    out = trailing_window_sums(
        _ds(sf_dir, "events"), key="user_id", ts_col="ts",
        id_col="event_id", val_col="value", window_minutes=60.0,
    ).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def _q_adjacent_edit_distance(sf_dir: str):
    """Levenshtein distance between id-adjacent doc prefixes (the
    fuzzy-match verify scalar over a deterministic pair set)."""
    from brinkray.textproc.curation import adjacent_edit_distances

    out = adjacent_edit_distances(
        _ds(sf_dir, "documents"), prefix_len=200
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_lang_sampled_chars_quantiles(sf_dir: str):
    """Per-language sampled quantiles of n_chars (hash-deterministic
    per-group bottom-k sample, SQL-reproducible)."""
    from brinkray.textproc.sketch import grouped_sampled_quantile_disc

    out = grouped_sampled_quantile_disc(
        _ds(sf_dir, "documents"), by="lang", col="n_chars",
        id_col="doc_id", k=200, qs=(0.5, 0.9),
    ).to_pandas()
    return out.sort_values(["lang", "q"]).reset_index(drop=True)


def _q_event_pivot_roundtrip(sf_dir: str):
    """Wide -> long UNPIVOT certification by roundtrip: pivot the
    event counts wide, melt them back, drop the zero-fill rows — the
    result must equal the plain long GROUP BY (the twin)."""
    from brinkray.textproc.windows import pivot_counts, unpivot

    types = ["click", "error", "purchase", "signup", "view"]
    wide = pivot_counts(_ds(sf_dir, "events"), "user_id", "event_type", types)
    long = unpivot(
        wide, "user_id", [f"n_{t}" for t in types],
        name_col="event_type", value_name="n", strip_prefix="n_",
    ).to_pandas()
    long = long[long["n"] > 0]  # pivot zero-fills absent combos
    return long.sort_values(["user_id", "event_type"]).reset_index(drop=True)


def _q_monthly_order_growth(sf_dir: str):
    """Month-over-month order-count deltas: the corpus reduces to one
    row per month (combiner-bounded groupby); the LAG diff runs on
    that |months|-bounded table."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    def prep(t):
        import pyarrow as pa

        return pa.table({"month": pc.floor_temporal(t["o_orderdate"],
                                                    unit="month")})

    monthly = (
        _ds(sf_dir, "orders")
        .select_columns(["o_orderdate"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("month")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values("month")
        .reset_index(drop=True)
    )
    monthly["n"] = monthly["n"].astype("int64")
    prev = monthly["n"].shift(1)
    monthly["delta"] = (
        monthly["n"] - prev.fillna(monthly["n"])
    ).astype("int64")  # first month: delta 0 (matches COALESCE(lag, n))
    return monthly


def _q_embedding_norm_histogram(sf_dir: str):
    """List-column math with an exact twin: per-vector squared norm in
    fixed-point (floor(x*1000) per element, THEN square and sum — all
    integer, order-independent), bucketed into a histogram. One
    vectorized map over the list column + a |buckets|-bounded groupby."""
    import numpy as np
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def prep(t: pa.Table) -> pa.Table:
        E = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        q = np.floor(E * 1000.0).astype(np.int64)
        norm2 = (q * q).sum(axis=1)
        bucket = norm2 // 1_000_000
        import pandas as pd

        part = (
            pd.Series(bucket).value_counts().sort_index()
            .rename_axis("bucket").reset_index(name="n")
        )
        return pa.table(
            {
                "bucket": pa.array(part["bucket"].to_numpy(), pa.int64()),
                "n": pa.array(part["n"].to_numpy(), pa.int64()),
            }
        )

    out = (
        _ds(sf_dir, "embeddings")
        .select_columns(["embedding"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return out.sort_values("bucket").reset_index(drop=True)


def _q_last_events_per_user(sf_dir: str):
    """Recent-history retrieval: the 3 most recent events per user
    (top-k per group by recency — the feature-store primitive);
    per-batch pre-prune bounds the exchange at k rows per (user,
    block)."""
    from brinkray.textproc.curation import top_k_per_group

    out = top_k_per_group(
        _ds(sf_dir, "events"), by="user_id", score_col="ts",
        id_col="event_id", k=3, descending=True,
    ).to_pandas()
    return out.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)


def _q_buyer_counts(sf_dir: str):
    """Two DISTINCT aggregates in one pass (buyers vs all users):
    per-batch distinct (user, is_buyer) partials -> groupby(user) OR
    -> two scalar counts; the exchange carries <= one row per (user,
    block)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Max

    def partial(t: pa.Table) -> pa.Table:
        buyer = pc.cast(
            pc.equal(t["event_type"], pa.scalar("purchase")), pa.int64()
        )
        return (
            pa.table({"user_id": t["user_id"], "is_buyer": buyer})
            .group_by(["user_id"])
            .aggregate([("is_buyer", "max")])
            .rename_columns(["user_id", "is_buyer"])
        )

    per_user = (
        _ds(sf_dir, "events")
        .select_columns(["user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Max("is_buyer", alias_name="is_buyer"))
        .to_pandas()
    )
    import pandas as pd

    return pd.DataFrame(
        {
            "buyers": [int(per_user["is_buyer"].sum())],
            "users": [int(len(per_user))],
        }
    )


def _q_anomalous_days(sf_dir: str):
    """Days whose event count exceeds the median daily count (the
    scalar-threshold anomaly/outlier shape) — integer compare, median
    from the |days|-bounded count table, no float boundary."""
    import math

    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(t):
        import pyarrow as pa

        d = pc.floor_temporal(t["ts"], unit="day")
        g = pa.table({"day": d}).group_by(["day"]).aggregate([([], "count_all")])
        return pa.table(
            {"day": g["day"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    daily = (
        _ds(sf_dir, "events")
        .select_columns(["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    daily["n"] = daily["n"].astype("int64")
    counts = daily["n"].sort_values().to_numpy()
    med = int(counts[max(1, math.ceil(0.5 * len(counts))) - 1])  # quantile_disc
    out = daily[daily["n"] > med]
    return out.sort_values("day").reset_index(drop=True)


def _q_retention_cohorts(sf_dir: str):
    """Retention cohort matrix: users grouped by first-activity day
    (cohort), counted per day offset. Distinct (user, day) pairs are
    pre-deduped per block; the cohort table (one row per user) comes
    from a Min groupby and joins back via ONE native hash join."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Min

    ev = _ds(sf_dir, "events").select_columns(["user_id", "ts"])

    def pairs(t: pa.Table) -> pa.Table:
        d = pc.floor_temporal(t["ts"], unit="day")
        return (
            pa.table({"user_id": t["user_id"],
                      "day": d.cast(pa.int64())})
            .group_by(["user_id", "day"])
            .aggregate([])
        )

    du = (
        ev.map_batches(pairs, batch_format="pyarrow")
        .groupby(["user_id", "day"])
        .aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
    )
    first = du.groupby("user_id").aggregate(Min("day", alias_name="cohort_us"))

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["uid_r", "cohort_us"])

    joined = du.join(
        first.map_batches(rename, batch_format="pyarrow"),
        join_type="inner", num_partitions=8,
        on=("user_id",), right_on=("uid_r",),
    )

    day_us = 86_400_000_000

    def offset(t: pa.Table) -> pa.Table:
        off = pc.divide(
            pc.subtract(t["day"], t["cohort_us"]), pa.scalar(day_us)
        )
        return pa.table(
            {
                "cohort": t["cohort_us"].cast(pa.timestamp("us")),
                "day_offset": pc.cast(off, pa.int64()),
            }
        )

    out = (
        joined.map_batches(offset, batch_format="pyarrow")
        .groupby(["cohort", "day_offset"])
        .aggregate(Count(alias_name="n_users"))
        .to_pandas()
    )
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values(["cohort", "day_offset"]).reset_index(drop=True)


def _q_trailing_wau(sf_dir: str):
    """Trailing 7-day distinct active users per window end (sliding
    COUNT DISTINCT via bounded explode)."""
    from brinkray.textproc.windows import sliding_distinct_counts

    out = sliding_distinct_counts(
        _ds(sf_dir, "events"), "ts", "user_id", window_days=7
    ).to_pandas()
    out["n_distinct"] = out["n_distinct"].astype("int64")
    return out.sort_values("window_end").reset_index(drop=True)


def _q_price_equidepth_bins(sf_dir: str):
    """Equi-depth histogram: bin edges from the deterministic sample
    quantiles (q25/q50/q75 of the hash-bottom-k sample), then one
    vectorized binning pass + |bins|-bounded groupby — the two-stage
    sketch -> broadcast -> bin composition."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from brinkray.textproc.sketch import sampled_quantile_disc

    orders = _ds(sf_dir, "orders")
    qd = sampled_quantile_disc(
        orders, col="o_totalprice", id_col="o_orderkey", k=2000,
        qs=(0.25, 0.5, 0.75),
    )
    edges = qd["value"].tolist()

    def binify(t: pa.Table) -> pa.Table:
        p = t["o_totalprice"]
        b = pc.cast(pc.greater_equal(p, pa.scalar(edges[0])), pa.int64())
        for e in edges[1:]:
            b = pc.add(b, pc.cast(pc.greater_equal(p, pa.scalar(e)), pa.int64()))
        g = pa.table({"bin": b}).group_by(["bin"]).aggregate([([], "count_all")])
        return pa.table(
            {"bin": g["bin"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    out = (
        orders.select_columns(["o_totalprice"])
        .map_batches(binify, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return out.sort_values("bin").reset_index(drop=True)


def _q_session_size_histogram(sf_dir: str):
    """Composition: sessionize (30-min gap) -> sessions per event
    count — the session-length distribution a pipeline health check
    reads. Two operators chained; the histogram input is one small row
    per session."""
    from ray.data.aggregate import Count

    from brinkray.textproc.windows import sessionize

    sessions = sessionize(_ds(sf_dir, "events"), gap_minutes=30.0)
    out = (
        sessions.select_columns(["n_events"])
        .groupby("n_events")
        .aggregate(Count(alias_name="n_sessions"))
        .to_pandas()
    )
    out["n_sessions"] = out["n_sessions"].astype("int64")
    return out.sort_values("n_events").reset_index(drop=True)


def _q_debounced_events(sf_dir: str):
    """Event debouncing: keep events whose same-(user, type)
    predecessor is > 30 min older (LAG-chain semantics)."""
    from brinkray.textproc.windows import debounce_events

    out = debounce_events(
        _ds(sf_dir, "events"), keys=["user_id", "event_type"],
        ts_col="ts", id_col="event_id", window_minutes=30.0,
    ).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def _q_sampled_price_quantiles(sf_dir: str):
    """One-pass approximate quantiles from a hash-deterministic
    bottom-k sample — even the approximation is oracle-twinned because
    the sample is reproducible in SQL."""
    from brinkray.textproc.sketch import sampled_quantile_disc

    return sampled_quantile_disc(
        _ds(sf_dir, "orders"), col="o_totalprice", id_col="o_orderkey",
        k=2000,
    )


def _q_ngram_novelty(sf_dir: str):
    from brinkray.textproc.curation import ngram_novelty

    return ngram_novelty(_ds(sf_dir, "documents")).to_pandas()


# Deterministic boilerplate injected into the paragraph-dedup and
# PII driver inputs: the sf documents carry no newlines / emails / IPs,
# so the driver queries CONSTRUCT a web-shaped corpus from them —
# identically in the Ray query and its SQL twin — to make the removal
# paths non-trivially exercised (organic multi-paragraph behavior is
# pinned separately in tests/test_webclean.py).
_BOILER1 = "all rights reserved copyright footer"
_BOILER2 = "subscribe to our newsletter today"


def _q_paragraph_dedup(sf_dir: str):
    import pyarrow as pa

    from brinkray.textproc.webclean import paragraph_dedup

    def construct(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        out = [
            _BOILER1 + "\n" + x + ("\n" + _BOILER2 if i % 2 == 0 else "")
            for i, x in zip(ids, texts)
        ]
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(out, pa.string())}
        )

    docs = (
        _ds(sf_dir, "documents")
        .select_columns(["doc_id", "text"])
        .map_batches(construct, batch_format="pyarrow")
    )
    return paragraph_dedup(docs).to_pandas()


def _q_paragraph_dedup_shuffled(sf_dir: str):
    """Join-based shared-paragraph path (no driver-side take_all/
    broadcast — the boilerplate-heavy-corpus fallback); same derived
    input and the same SQL twin as paragraph_dedup, verbatim."""
    import pyarrow as pa

    from brinkray.textproc.webclean import paragraph_dedup_shuffled

    def construct(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        out = [
            _BOILER1 + "\n" + x + ("\n" + _BOILER2 if i % 2 == 0 else "")
            for i, x in zip(ids, texts)
        ]
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(out, pa.string())}
        )

    docs = (
        _ds(sf_dir, "documents")
        .select_columns(["doc_id", "text"])
        .map_batches(construct, batch_format="pyarrow")
    )
    out = paragraph_dedup_shuffled(docs).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_pii_scrub(sf_dir: str):
    import pyarrow as pa

    from brinkray.textproc.webclean import pii_scrub

    def construct(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        out = []
        for i, x in zip(ids, texts):
            s = x
            if i % 3 == 0:
                s += f" contact user{i}@mail.example.com for details"
            if i % 5 == 0:
                s += f" logged from {i % 223}.17.{i % 250}.9"
            out.append(s)
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(out, pa.string())}
        )

    docs = (
        _ds(sf_dir, "documents")
        .select_columns(["doc_id", "text"])
        .map_batches(construct, batch_format="pyarrow")
    )
    return pii_scrub(docs).to_pandas()


def _q_customers_without_orders(sf_dir: str):
    """Anti-join (NOT EXISTS): customers with no HIGH-VALUE order
    (totalprice > 300k — every customer has some order in this data,
    so the unrestricted anti-join would be vacuous)."""
    from brinkray.textproc.joins import anti_join

    big = _ds(sf_dir, "orders").filter(
        expr="o_totalprice > 300000.0"
    ).select_columns(["o_custkey"])
    out = anti_join(
        _ds(sf_dir, "customer").select_columns(["c_custkey"]),
        big,
        on="c_custkey",
        right_on="o_custkey",
        num_partitions=8,
    ).to_pandas()
    return out.sort_values("c_custkey").reset_index(drop=True)


def _q_suppliers_with_returns(sf_dir: str):
    """Semi-join (EXISTS) with the Bloom prefilter on: suppliers with
    at least one high-quantity returned lineitem. The Bloom bitmap is
    sized generously for the testdata; false positives only cost
    shuffle volume, never correctness (exact inner join follows)."""
    from brinkray.textproc.joins import semi_join

    returns = (
        _ds(sf_dir, "lineitem")
        .filter(expr="l_returnflag == 'R' and l_quantity > 49.0 "
                     "and l_extendedprice > 55000.0")
        .select_columns(["l_suppkey"])
    )
    out = semi_join(
        _ds(sf_dir, "supplier").select_columns(["s_suppkey"]),
        returns,
        on="s_suppkey",
        right_on="l_suppkey",
        num_partitions=8,
        bloom_bits=1 << 16,
    ).to_pandas()
    return out.sort_values("s_suppkey").reset_index(drop=True)


def _q_pricing_summary(sf_dir: str):
    """TPC-H Q1-shape multi-measure aggregate with exact fixed-point
    sums (qty / base price / discounted price / charge)."""
    from brinkray.textproc.relagg import pricing_summary

    out = pricing_summary(_ds(sf_dir, "lineitem")).to_pandas()
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def _q_lang_source_rollup(sf_dir: str):
    """Document counts at every ROLLUP(lang, source) level (rolled-up
    slots are NULL), from ONE fine-level shuffle."""
    from brinkray.textproc.relagg import rollup_counts

    out = rollup_counts(_ds(sf_dir, "documents"), ["lang", "source"]).to_pandas()
    return out.sort_values(
        ["lang", "source", "n"], na_position="first"
    ).reset_index(drop=True)


def _q_lang_source_cube(sf_dir: str):
    """Document counts at every CUBE(lang, source) grouping set (all
    four levels from ONE fine-level shuffle)."""
    from brinkray.textproc.relagg import cube_counts

    out = cube_counts(_ds(sf_dir, "documents"), ["lang", "source"]).to_pandas()
    return out.sort_values(
        ["lang", "source", "n"], na_position="first"
    ).reset_index(drop=True)


def _q_totalprice_histogram(sf_dir: str):
    """Fixed-width histogram of order totals (bucket = floor(price /
    25000) as int64); per-block partial counts keep the exchange
    metadata-sized."""
    from brinkray.textproc.relagg import fixed_width_histogram

    out = fixed_width_histogram(
        _ds(sf_dir, "orders"), "o_totalprice", 25000.0
    ).to_pandas()
    return out.sort_values("bucket").reset_index(drop=True)


def _q_user_activity_histogram(sf_dir: str):
    """Aggregation of aggregation: events per user, then users per
    event count — the activity-distribution shape."""
    from brinkray.textproc.relagg import count_of_counts

    out = count_of_counts(
        _ds(sf_dir, "events"), "user_id",
        out_key="n_events", out_count="n_users",
    ).to_pandas()
    return out.sort_values("n_events").reset_index(drop=True)


def _q_qty_price_corr_stats(sf_dir: str):
    """Per-returnflag covariance/correlation sufficient statistics over
    (quantity, extendedprice) in exact fixed-point int64."""
    from brinkray.textproc.relagg import grouped_corr_stats

    out = grouped_corr_stats(
        _ds(sf_dir, "lineitem"), "l_returnflag", "l_quantity", "l_extendedprice"
    ).to_pandas()
    return out.sort_values("l_returnflag").reset_index(drop=True)


def _q_daily_counts_gapfill(sf_dir: str):
    """Daily event counts with missing days zero-filled (time-series
    densification; fill size bounded by the date range, not the corpus)."""
    from brinkray.textproc.windows import daily_counts_gapfill

    return daily_counts_gapfill(_ds(sf_dir, "events"))


def _q_inverted_index(sf_dir: str):
    """Token -> sorted doc-id posting list for tokens with df in
    [2, 1000] (df band bounds posting length; distinct pairs emitted
    per batch, one groupby shuffle)."""
    from brinkray.textproc.curation import inverted_index

    out = inverted_index(_ds(sf_dir, "documents")).to_pandas()
    return out.sort_values("token").reset_index(drop=True)


def _q_postings_varint_bytes(sf_dir: str):
    """Delta-gap varint size of every df-banded posting list (the
    Lucene-style postings layout) — certifies the distributed index
    build plus the gap/bit arithmetic; the twin re-derives bit lengths
    via length(bin(gap)) (the exact-integer log2 idiom)."""
    from brinkray.textproc.curation import postings_varint_bytes

    out = postings_varint_bytes(_ds(sf_dir, "documents")).to_pandas()
    return out.sort_values("token").reset_index(drop=True)


def _q_script_ratios(sf_dir: str):
    """Unicode script composition per doc (ASCII letters / digits /
    whitespace / non-ASCII codepoints) — vectorized UTF-32 codepoint
    views, exact int counts; the twin re-counts with RE2 char
    classes."""
    from brinkray.textproc.quality import script_ratios

    out = script_ratios(_ds(sf_dir, "documents")).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_proportional_sample(sf_dir: str):
    """Budgeted stratified sample with proportional (largest-remainder)
    allocation across (lang, source) strata, md5-first rows filling
    each quota — exact integer apportionment, window-rank twin."""
    from brinkray.textproc.curation import proportional_sample

    out = proportional_sample(_ds(sf_dir, "documents"), budget=200).to_pandas()
    return (
        out[["lang", "source", "doc_id"]]
        .sort_values(["lang", "source", "doc_id"])
        .reset_index(drop=True)
    )


def _q_embedding_top_component(sf_dir: str):
    """Top principal direction of the embedding cloud (the whitening /
    drift-diagnostic vector), EXACT-integer end to end: embeddings
    quantize to ppm fixed point (floor(x*1e6) — identical IEEE double
    op both sides), the 16x16 Gram matrix reduces through per-batch
    int64 partial outer products (one tiny (i,j) exchange — vector
    rows never leave their tasks), and TWO power iterations from the
    ones vector run driver-side in arbitrary-precision ints with
    max-abs normalization. Division mirrors DuckDB's
    truncate-toward-zero `//` (Python's floor `//` differs on
    negatives — measured). The twin re-derives the Gram by a
    vec_id self-join over unnested dims and unrolls both iterations
    in HUGEINT."""
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Sum

    D, SCALE = 16, 10**6

    def partial(t: pa.Table) -> pa.Table:
        import numpy as np

        X = np.array(t["embedding"].to_pylist(), dtype=np.float64)[:, :D]
        Xi = np.floor(X * SCALE).astype(np.int64)
        G = Xi.T @ Xi  # <= 4096 rows/batch * 1e12 — int64-safe
        ii, jj = np.meshgrid(np.arange(D), np.arange(D), indexing="ij")
        return pa.table(
            {
                "i": pa.array(ii.ravel() + 1, pa.int64()),
                "j": pa.array(jj.ravel() + 1, pa.int64()),
                "g": pa.array(G.ravel(), pa.int64()),
            }
        )

    gram = (
        _ds(sf_dir, "embeddings")
        .select_columns(["embedding"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["i", "j"])
        .aggregate(Sum("g", alias_name="g"))
        .to_pandas()
    )
    G: dict[tuple[int, int], int] = {
        (int(r.i), int(r.j)): int(r.g) for r in gram.itertuples()
    }

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    v = [SCALE] * D
    for _ in range(2):
        w = [sum(G[(i, j)] * v[j - 1] for j in range(1, D + 1))
             for i in range(1, D + 1)]
        m = max(abs(x) for x in w) or 1
        v = [tdiv(x * SCALE, m) for x in w]
    return pd.DataFrame(
        {
            "dim": pd.Series(range(1, D + 1), dtype="int64"),
            "v": pd.Series(v, dtype="int64"),
        }
    )


def _q_vocab_growth(sf_dir: str):
    """Heaps-law vocabulary-growth curve over the doc_id-ordered token
    stream (distinct tokens within the first N = 2^k occurrences, plus
    the full corpus) — built on the corpus-wide distributed prefix sum
    + one groupby(token).Min + a bounded histogram exchange; the twin
    re-derives global first positions with a window SUM and the
    zip-unnest position idiom."""
    from brinkray.textproc.curation import vocab_growth

    out = vocab_growth(_ds(sf_dir, "documents")).to_pandas()
    return out.sort_values("n_prefix").reset_index(drop=True)


def _q_unigram_surprisal(sf_dir: str):
    """CCNet-style corpus-LM quality score per doc, exact-integer:
    each token occurrence contributes bit_length(U) - bit_length(c)
    (the integer log2 surprisal band; float ln differs between numpy
    and DuckDB libms, so the fixed-point rule applies). Broadcast
    count-table path under the gate; hash-join + groupby(doc_id) past
    it (both pinned equal in pytest)."""
    from brinkray.textproc.curation import unigram_surprisal

    out = unigram_surprisal(_ds(sf_dir, "documents")).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_phrase_search(sf_dir: str):
    """Exact consecutive-token phrase search (the positional
    posting-list query shape): docs containing 'batch window', with
    overlap-counted match counts and the 1-based first position."""
    from brinkray.textproc.curation import phrase_search

    out = phrase_search(_ds(sf_dir, "documents"),
                        ("batch", "window")).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_phrase_search_indexed(sf_dir: str):
    """Same phrase query as phrase_search, answered from a PERSISTED
    positional inverted index (build-once artifact under /tmp, reused
    across calls): postings hive-partitioned by token-hash bucket, the
    query reads ONLY the phrase tokens' bucket directories with the
    token-set filter pushed into the parquet scan. manifest.parquet is
    written last, so a crashed partial build never looks complete.
    Shares phrase_search's SQL twin — the scan certifies the index."""
    import os

    from brinkray.textproc.curation import (
        phrase_search_index,
        write_positional_index,
    )

    tag = os.path.basename(os.path.normpath(sf_dir))
    idx = f"/tmp/brinkray_posidx_{tag}"
    if not os.path.exists(f"{idx}/manifest.parquet"):
        import shutil

        shutil.rmtree(idx, ignore_errors=True)  # clear any partial build
        write_positional_index(_ds(sf_dir, "documents"), idx)
    out = phrase_search_index(idx, ("batch", "window")).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_top_bigrams(sf_dir: str):
    """Corpus-wide top-20 token bigrams (LM n-gram statistics pass)."""
    from brinkray.textproc.curation import top_bigrams

    out = top_bigrams(_ds(sf_dir, "documents"), k=20).to_pandas()
    return out.sort_values(["n", "bigram"],
                           ascending=[False, True]).reset_index(drop=True)


def _q_customer_order_totals(sf_dir: str):
    """LEFT OUTER join: every customer with order count + spend in
    cents; customers without orders kept with zeros (pre-aggregated
    right side, native hash-shuffle left_outer join)."""
    from brinkray.textproc.joins import left_outer_totals

    out = left_outer_totals(
        _ds(sf_dir, "customer"), _ds(sf_dir, "orders"), num_partitions=8
    ).to_pandas()
    return out.sort_values("c_custkey").reset_index(drop=True)


def _q_lang_share(sf_dir: str):
    """Percent-of-total per language (exact int counts, one IEEE
    division per group)."""
    from brinkray.textproc.relagg import group_shares

    out = group_shares(_ds(sf_dir, "documents"), "lang").to_pandas()
    return out.sort_values("lang").reset_index(drop=True)


def _q_orders_by_dow(sf_dir: str):
    """Order counts + exact spend per ISO day-of-week (date-scalar
    aggregation; 7-row-bounded exchange)."""
    from brinkray.textproc.windows import dow_aggregate

    out = dow_aggregate(_ds(sf_dir, "orders"), "o_orderdate",
                        "o_totalprice").to_pandas()
    return out.sort_values("dow").reset_index(drop=True)


def _q_event_transitions(sf_dir: str):
    """Markov transition counts over each user's (ts, id)-ordered
    event-type stream (LAG + pair GROUP BY)."""
    from brinkray.textproc.windows import transition_counts

    out = transition_counts(
        _ds(sf_dir, "events"), key="user_id", ts_col="ts",
        id_col="event_id", state_col="event_type",
    ).to_pandas()
    return out.sort_values(["prev_type", "next_type"]).reset_index(drop=True)


def _q_user_days_active(sf_dir: str):
    """Distinct active days per user (computed-key COUNT DISTINCT,
    both exchanges pre-deduped per block)."""
    from brinkray.textproc.windows import active_days_per_key

    out = active_days_per_key(_ds(sf_dir, "events"), "user_id", "ts").to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def _q_user_click_purchase_counts(sf_dir: str):
    """FULL OUTER of per-user click vs purchase counts (either-side
    keys survive, missing side zero-fills). Native full_outer join is
    broken on empty partitions in Ray 2.49 (see joins.py), so the
    operator is the union-tagged one-exchange equivalent."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from brinkray.textproc.joins import full_outer_counts

    ev = _ds(sf_dir, "events").select_columns(["user_id", "event_type"])

    def keep(val):
        def fn(t):
            return t.filter(pc.equal(t["event_type"], pa.scalar(val)))

        return fn

    clicks = ev.map_batches(keep("click"), batch_format="pyarrow")
    purchases = ev.map_batches(keep("purchase"), batch_format="pyarrow")
    out = full_outer_counts(clicks, purchases, "user_id").to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def _q_daily_active_users(sf_dir: str):
    """Distinct users per day (bucketed COUNT DISTINCT, per-block
    pre-dedup on both exchanges)."""
    from brinkray.textproc.windows import distinct_per_bucket

    out = distinct_per_bucket(_ds(sf_dir, "events"), "ts", "user_id").to_pandas()
    return out.sort_values("day").reset_index(drop=True)


def _q_region_nation_cross(sf_dir: str):
    """Cartesian product against a broadcast-small right side (the
    dimension-scaffold shape; no shuffle)."""
    from brinkray.textproc.joins import cross_join_small

    out = cross_join_small(
        _ds(sf_dir, "nation"), _ds(sf_dir, "region"),
        columns_left=["n_name"], columns_right=["r_name"],
    ).to_pandas()
    return out.sort_values(["n_name", "r_name"]).reset_index(drop=True)


def _q_long_doc_outliers(sf_dir: str):
    """Composition: exact distributed quantile (q99 of n_chars) ->
    broadcast threshold -> vectorized filter. The outlier-band shape a
    quality-filtering pass uses."""
    import pyarrow.compute as pc

    from brinkray.textproc.webclean import int_quantile_disc

    docs = _ds(sf_dir, "documents")
    thr = int_quantile_disc(docs, "n_chars", qs=(0.99,))[0.99]

    def keep(t):
        return t.filter(pc.greater_equal(t["n_chars"], thr))

    out = (
        docs.select_columns(["doc_id", "n_chars"])
        .map_batches(keep, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_orders_above_customer_avg(sf_dir: str):
    """Correlated subquery decorrelated to aggregate + join; the
    above-average comparison cross-multiplies exact integers (no float
    average ever materializes)."""
    from brinkray.textproc.relagg import above_group_avg

    out = above_group_avg(
        _ds(sf_dir, "orders"), key="o_custkey", id_col="o_orderkey",
        val_col="o_totalprice", num_partitions=8,
    ).to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


def _q_top_orders_global(sf_dir: str):
    """Global ORDER BY (price DESC, key ASC) + LIMIT 100 via Ray's
    native distributed sort — only 100 rows reach the driver."""
    import pyarrow.compute as pc

    def neg(t):
        import pyarrow as pa

        cents = pc.cast(
            pc.floor(pc.multiply(t["o_totalprice"], pa.scalar(100.0))),
            pa.int64(),
        )
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "price_cents": cents,
                "_neg": pc.multiply(cents, pa.scalar(-1)),
            }
        )

    out = (
        _ds(sf_dir, "orders")
        .select_columns(["o_orderkey", "o_totalprice"])
        .map_batches(neg, batch_format="pyarrow")
        .sort(["_neg", "o_orderkey"])
        .limit(100)
        .drop_columns(["_neg"])
        .to_pandas()
    )
    return out.reset_index(drop=True)


def _q_doc_chunks(sf_dir: str):
    """Fixed-64-token document chunking (context-packing prep): one row
    per (doc, chunk) with token count + md5 of the chunk text."""
    from brinkray.textproc.curation import doc_chunks

    out = doc_chunks(_ds(sf_dir, "documents"), chunk_tokens=64).to_pandas()
    return out.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)


def _q_revenue_by_priority_nation(sf_dir: str):
    """Three-table star-join chain (lineitem -> orders -> customer ->
    nation) with line-level revenue pre-aggregated per order BEFORE the
    first join."""
    from brinkray.textproc.joins import revenue_chain

    out = revenue_chain(
        _ds(sf_dir, "lineitem"),
        _ds(sf_dir, "orders"),
        _ds(sf_dir, "customer"),
        _ds(sf_dir, "nation"),
        num_partitions=8,
    ).to_pandas()
    return out.sort_values(["o_orderpriority", "n_name"]).reset_index(drop=True)


def _q_label_centroids(sf_dir: str):
    """Per-label embedding centroid sufficient statistics (exact
    fixed-point per-dimension sums + counts)."""
    from brinkray.textproc.similarity import label_centroids

    out = label_centroids(_ds(sf_dir, "embeddings")).to_pandas()
    return out.sort_values(["label", "dim"]).reset_index(drop=True)


def _q_doc_token_quartiles(sf_dir: str):
    """Corpus-wide exact ranking by token count (row_number shape) plus
    NTILE-style quartile assignment, via the broadcast-CDF global_rank
    operator (no global sort barrier)."""
    import re

    import pyarrow as pa

    from brinkray.textproc.relagg import global_rank

    ws = re.compile(r"\S+")

    def add_n(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(
                    [len(ws.findall(x)) for x in t["text"].to_pylist()],
                    pa.int64(),
                ),
            }
        )

    docs = _ds(sf_dir, "documents").map_batches(add_n, batch_format="pyarrow")
    out = global_rank(docs, key_col="n_tokens", id_col="doc_id", n_buckets=4)
    out = out.to_pandas().rename(columns={"rank": "rnk", "bucket": "quartile"})
    return out.sort_values("doc_id").reset_index(drop=True)[
        ["doc_id", "n_tokens", "rnk", "quartile"]
    ]


def _q_order_global_ranks(sf_dir: str):
    """Exact global row_number over a HIGH-CARDINALITY float key
    (o_totalprice) via range_rank — range partitioning + driver prefix
    sum, no global sort barrier. Ranks are computed over the WHOLE
    table; only a deterministic key-sample of rows is returned."""
    from brinkray.textproc.relagg import range_rank

    import pyarrow as pa
    import pyarrow.compute as pc

    orders = _ds(sf_dir, "orders").select_columns(["o_orderkey", "o_totalprice"])
    ranked = range_rank(orders, key_col="o_totalprice", id_col="o_orderkey")
    import numpy as np

    def sample(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(keys % 97 == 1))

    sampled = ranked.map_batches(sample, batch_format="pyarrow")
    out = sampled.to_pandas()
    out["rnk"] = out["rank"].astype("int64") + 1
    return (
        out.sort_values("o_orderkey")
        .reset_index(drop=True)[["o_orderkey", "rnk"]]
    )


def _q_order_price_ntile(sf_dir: str):
    """Exact SQL NTILE(8) over orders by (totalprice, orderkey) via
    range_rank, then per-bucket count + fixed-point price sum — the
    window-function bucket semantics (first N%k buckets get the extra
    row), certified against DuckDB's ntile()."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    from brinkray.textproc.relagg import range_rank

    orders = _ds(sf_dir, "orders").select_columns(["o_orderkey", "o_totalprice"])
    ranked = range_rank(
        orders, key_col="o_totalprice", id_col="o_orderkey", n_buckets=8
    )

    def cents(t: pa.Table) -> pa.Table:
        # repo-wide fixed-point rule: floor(x*100) on BOTH sides (pyarrow
        # round is half-to-even, DuckDB ROUND is half-away — floor avoids
        # the divergence entirely).
        c = pc.cast(pc.floor(pc.multiply(t["o_totalprice"], 100.0)), pa.int64())
        return pa.table({"bucket": t["bucket"], "c": c})

    out = (
        ranked.map_batches(cents, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Count(alias_name="n"), Sum("c", alias_name="sum_cents"))
        .to_pandas()
    )
    return out.sort_values("bucket").reset_index(drop=True)


def _set_op_sides(sf_dir: str):
    """(user_id, day) keys of click vs purchase events — the two sides
    every set-op query below compares."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def day_keys(event_type: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {"user_id": t["user_id"], "d": pc.floor_temporal(t["ts"], unit="day")}
            )

        return (
            _ds(sf_dir, "events")
            .filter(expr=f"event_type == '{event_type}'")
            .map_batches(fn, batch_format="pyarrow")
        )

    return day_keys("click"), day_keys("purchase")


def _q_click_purchase_same_day(sf_dir: str):
    """INTERSECT: (user, day) pairs with BOTH a click and a purchase."""
    from brinkray.textproc.relagg import set_op_distinct

    clicks, purchases = _set_op_sides(sf_dir)
    out = set_op_distinct(clicks, purchases, on=["user_id", "d"],
                          op="intersect").to_pandas()
    return out.sort_values(["user_id", "d"]).reset_index(drop=True)


def _q_click_no_purchase_days(sf_dir: str):
    """EXCEPT: (user, day) pairs with a click but NO purchase."""
    from brinkray.textproc.relagg import set_op_distinct

    clicks, purchases = _set_op_sides(sf_dir)
    out = set_op_distinct(clicks, purchases, on=["user_id", "d"],
                          op="except").to_pandas()
    return out.sort_values(["user_id", "d"]).reset_index(drop=True)


def _q_hll_users_per_event_type(sf_dir: str):
    """Per-group HLL sketch, restructured driver-visible: the emitted
    surface is the merged REGISTER TABLE (event_type, reg, rank) —
    the sketch's entire state in integers — computed with the
    md5_number_lower value hash so DuckDB re-derives every register
    independently (reg = top-12 hash bits, rank = leading zeros of
    the remaining 52 + 1 via exact bin()-string length — floor(log2)
    rounds 2^k-1 UP at k>=49 and is avoided on both sides). Pins the
    full sketch computation, not just its estimate; the estimate
    itself stays pytest-tied to the exact sibling
    (distinct_users_per_event_type)."""
    from brinkray.textproc.sketch import hll_grouped_registers

    out = hll_grouped_registers(
        _ds(sf_dir, "events"), key_col="event_type", value_col="user_id",
        p=12, hash_kind="md5",
    ).to_pandas()
    return out.sort_values(["event_type", "reg"]).reset_index(drop=True)


def _q_props_k_stats(sf_dir: str):
    """Schema-on-read: parse the JSON props column, extract int field
    'k', aggregate per event_type in one streaming pass; malformed rows
    are COUNTED (n_bad), never silently dropped."""
    from brinkray.textproc.parse import json_field_stats

    out = json_field_stats(
        _ds(sf_dir, "events"), json_col="props", field="k",
        group_col="event_type",
    ).to_pandas()
    return out.sort_values("event_type").reset_index(drop=True)


def _q_biggest_order_per_customer(sf_dir: str):
    """Argmax-by-VALUE per key — latest_per_key reused with a price
    ordering instead of a time ordering (operator genericity: the same
    two-level reduction serves CDC keep-latest and keep-best)."""
    from brinkray.textproc.windows import latest_per_key

    out = latest_per_key(
        _ds(sf_dir, "orders"),
        key="o_custkey",
        order_cols=["o_totalprice", "o_orderkey"],
        payload_cols=["o_orderdate"],
    ).to_pandas()
    return out.sort_values("o_custkey").reset_index(drop=True)


def _q_top_tokens_per_lang(sf_dir: str):
    """Group-wise heavy hitters by composition: per-batch (lang, token)
    count partials -> one groupby sum -> top_k_per_group (per-batch
    pre-prune bounds hot-group skew). Top 3 tokens per language."""
    import pandas as pd
    import pyarrow as pa

    from brinkray.textproc.curation import top_k_per_group
    from brinkray.textproc.hashing import tokens_of
    from ray.data.aggregate import Sum

    def explode(t: pa.Table) -> pa.Table:
        langs, toks = [], []
        for lang, text in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
            for tok in tokens_of(text):
                langs.append(lang)
                toks.append(tok)
        df = pd.DataFrame({"lang": langs, "tok": toks})
        part = df.groupby(["lang", "tok"]).size().reset_index(name="c")
        part["c"] = part["c"].astype("int64")
        return pa.Table.from_pandas(part, preserve_index=False)

    counts = (
        _ds(sf_dir, "documents")
        .select_columns(["lang", "text"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby(["lang", "tok"])
        .aggregate(Sum("c", alias_name="c"))
    )
    out = top_k_per_group(counts, by="lang", score_col="c", id_col="tok",
                          k=3).to_pandas()
    return out.sort_values(["lang", "c", "tok"],
                           ascending=[True, False, True]).reset_index(drop=True)


def _q_grouped_token_quantiles(sf_dir: str):
    from brinkray.textproc.webclean import grouped_token_quantiles

    return grouped_token_quantiles(_ds(sf_dir, "documents"))


def _q_token_length_percentiles(sf_dir: str):
    from brinkray.textproc.webclean import token_length_percentiles

    return token_length_percentiles(_ds(sf_dir, "documents"))


def _q_kmeans_clusters(sf_dir: str):
    """Distributed Lloyd's k-means labels over the embeddings table
    (k=8, 5 fixed rounds — deterministic; iterative, genuinely
    non-SQL: rows-only driver check, quality pinned in pytest against
    the table's planted labels)."""
    from brinkray.textproc.similarity import kmeans_labels

    return kmeans_labels(
        _ds(sf_dir, "embeddings"), k=8, iters=5
    ).to_pandas().sort_values("vec_id").reset_index(drop=True)


def _q_cms_heavy_hitter_counts(sf_dir: str):
    """Count-min estimates for the corpus's exact top-20 tokens,
    restructured driver-visible: with the md5 row hash
    (md5_number_lower('j:tok') % w) the ENTIRE d x w counter table —
    and therefore every min-over-rows estimate — is independently
    re-derivable by the SQL twin. The probe set comes from the
    SQL-certified exact sibling (heavy_hitters); the overestimate
    bound stays pinned in pytest."""
    from brinkray.textproc.curation import heavy_hitters
    from brinkray.textproc.sketch import cms_token_counts

    docs = _ds(sf_dir, "documents")
    probe = heavy_hitters(docs, k=20).to_pandas()["token"].tolist()
    out = cms_token_counts(docs, probe, hash_kind="md5").to_pandas()
    return out.sort_values("token").reset_index(drop=True)


def _q_totalprice_quantiles(sf_dir: str):
    """Exact quantile_disc of o_totalprice (~all-distinct doubles) via
    distributed range refinement — the returned floats are ELEMENTS of
    the input column, so the hash compare vs DuckDB is exact."""
    from brinkray.textproc.sketch import exact_float_quantiles

    return exact_float_quantiles(
        _ds(sf_dir, "orders"), "o_totalprice", cap=10_000
    )


def _q_ngram_novelty_shuffled(sf_dir: str):
    """Shuffle-join path of ngram_novelty (no broadcast shared set) —
    certified against the same SQL twin as the broadcast path."""
    from brinkray.textproc.curation import ngram_novelty_shuffled

    return ngram_novelty_shuffled(
        _ds(sf_dir, "documents"), num_partitions=8
    ).to_pandas()


def _q_distinct_tokens_exact(sf_dir: str):
    from brinkray.textproc.sketch import distinct_tokens_exact

    return distinct_tokens_exact(_ds(sf_dir, "documents")).to_pandas()


def _q_hll_distinct_tokens(sf_dir: str):
    """Corpus-wide distinct-token HLL, restructured driver-visible:
    emits the REGISTER table (reg, rank) under the md5_number_lower
    token hash, so the SQL twin re-derives the full sketch state
    (same construction as hll_users_per_event_type, p=14). The
    estimate stays pytest-tied to distinct_tokens_exact."""
    from brinkray.textproc.sketch import hll_token_registers

    out = hll_token_registers(
        _ds(sf_dir, "documents"), p=14, hash_kind="md5"
    ).to_pandas()
    return out.sort_values("reg").reset_index(drop=True)


def _q_cluster_components_exact(sf_dir: str):
    """The distributed connected-components operator (cluster_pairs,
    large-star/small-star rounds) on a DETERMINISTIC edge list —
    consecutive-id chains within md5-first-hex-char buckets (~n/16
    docs per bucket => transitive chains ~n/16 long, a real stress of
    the star rounds). The component minimum per bucket is then
    SQL-derivable (MIN OVER the same bucket), putting a driver oracle
    on the clustering path that dedup_clusters (LSH input) cannot
    have."""
    import hashlib

    import pyarrow as pa

    from brinkray.textproc.joins import cluster_pairs

    docs = _ds(sf_dir, "documents").select_columns(["doc_id", "text"])

    def bucket(t: pa.Table) -> pa.Table:
        b = [
            hashlib.md5(x.encode("utf-8")).hexdigest()[:1]
            for x in t["text"].to_pylist()
        ]
        return pa.table({"doc_id": t["doc_id"], "b": pa.array(b, pa.string())})

    import pandas as pd

    def chain(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["doc_id"].sort_values().to_numpy()
        if len(ids) < 2:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64")}
            )
        return pd.DataFrame({"doc_a": ids[:-1], "doc_b": ids[1:]})

    edges = (
        docs.map_batches(bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(chain, batch_format="pandas")
    )
    return _to_pandas(cluster_pairs(edges))


def _q_deterministic_sample(sf_dir: str):
    """Hash-based deterministic sampling (SURVEY §2.6): keep docs whose
    md5(text) starts with a nibble in 0..3 (a stable ~25% sample —
    reproducible across runs/clusters unlike random_sample)."""
    import hashlib

    import pyarrow as pa

    def fn(t: pa.Table) -> pa.Table:
        keep = [
            hashlib.md5(x.encode("utf-8")).hexdigest()[0] in "0123"
            for x in t["text"].to_pylist()
        ]
        return t.filter(pa.array(keep)).select(["doc_id", "n_chars"])

    return (
        _ds(sf_dir, "documents")
        .select_columns(["doc_id", "text", "n_chars"])
        .map_batches(fn, batch_format="pyarrow")
        .to_pandas()
    )


def _q_corpus_curation(sf_dir: str):
    """End-to-end LLM-corpus curation: exact dedup (md5 winners) ->
    quality signals -> language ID -> filter (en, quality >= 0.5).
    The dedup winner set is broadcast as an id ARRAY (8 B/id, ray.put
    once); everything else is stateless map_batches — the whole
    pipeline is one streaming pass over the corpus plus one small
    groupby. Fully SQL-twinned (md5/regex/list kernels)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from brinkray.textproc.dedup import exact_dedup
    from brinkray.textproc.quality import add_lang_id, add_quality_signals

    docs = _ds(sf_dir, "documents").select_columns(["doc_id", "text"])
    winners = exact_dedup(docs).to_pandas()
    win_ref = ray.put(np.sort(winners["doc_id"].to_numpy()))

    def keep_winners(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
        return t.filter(pa.array(np.isin(ids, ray.get(win_ref))))

    ds = add_lang_id(
        add_quality_signals(docs.map_batches(keep_winners, batch_format="pyarrow"))
    )

    def final(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.and_(
            pc.equal(t["lang_pred"], "en"),
            pc.greater_equal(t["quality"], 0.5),
        )
        return t.filter(keep).select(["doc_id", "quality"])

    return ds.map_batches(final, batch_format="pyarrow").to_pandas()


def _q_media_features(sf_dir: str):
    """Multimodal stage e2e: deterministic BMP/WAV/video payloads are
    synthesized from the documents table, decoded by the actor-pool
    MediaDecoder (real numpy/stdlib codecs), features summarized.
    Not SQL-expressible (binary codecs) -> rows-only check."""
    import numpy as np
    import ray.data as rd

    from brinkray.textproc.media import (
        decode_media,
        encode_bmp,
        encode_video,
        encode_wav,
    )

    docs = _ds(sf_dir, "documents").select_columns(["doc_id", "text"]).limit(60)
    rows = docs.take_all()
    ids, kinds, payloads = [], [], []
    for r in rows:
        i, text = int(r["doc_id"]), r["text"]
        seed = np.frombuffer(text.encode()[:64].ljust(64, b"\0"), dtype=np.uint8)
        img = np.tile(seed, (16, 16, 3))[:16, :16, :3].astype(np.uint8)
        k = i % 3
        if k == 0:
            kinds.append("image")
            payloads.append(encode_bmp(img))
        elif k == 1:
            kinds.append("audio")
            t = np.linspace(0, 2 * np.pi * (50 + i % 200), 4000)
            payloads.append(encode_wav(np.sin(t)))
        else:
            kinds.append("video")
            payloads.append(encode_video([img, 255 - img], fps=1.0))
        ids.append(i)
    import pyarrow as pa

    tbl = pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )
    out = decode_media(rd.from_arrow(tbl), concurrency=2, batch_size=8).to_pandas()
    out["feat_sum"] = [float(np.round(np.sum(f), 4)) for f in out["features"]]
    return out[["media_id", "kind", "feat_sum"]]


def _q_crawl_host_stats(sf_dir: str):
    """Per-host budget accounting over the crawl's events (§2.5)."""
    from brinkray.pipelines import host_stats

    res = _crawl_result(sf_dir)
    _dump_crawl_pages(sf_dir)
    return host_stats(res)


# the extract-links oracle parses the SAME synthesized pages with
# DuckDB's regex engine: the query below dumps the (url, html) table
# here (the driver runs the Ray query before its SQL twin), and the
# static SQL reads it via read_parquet — an independent re-extraction,
# exact for this corpus because the generator's HTML stays inside the
# double-quoted-attribute envelope (fixtures/sitegen.py docstring).
_EXTRACT_PAGES_PATH = "/tmp/brinkray_extract_pages.parquet"


def _crawl_graph(sf_dir: str):
    """Shared crawl-graph derivation: nodes = the seen set; edges =
    distinct admissible (parent -> child) discoveries from the crawl
    event log (seed/warm rows are starts, not edges). Returns the
    (nodes, edges) Datasets keyed by canon."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    res = _crawl_result(sf_dir)
    _dump_crawl_pages(sf_dir)

    ev = res.events_table().select(["linked_from", "url"])
    ev = ev.filter(
        pc.invert(
            pc.is_in(ev["linked_from"], value_set=pa.array(["start", "warm"]))
        )
    )
    # linked_from is the page's RAW url; the graph is keyed by canon
    # (the seen-set key), so re-key parents the way the engine does
    from brinkray.fixtures.sitegen import site_config
    from brinkray.ref.urls import normalize_url

    ignored = site_config().ignored_get_params
    parents = pa.array(
        [normalize_url(u, ignored) for u in ev["linked_from"].to_pylist()],
        pa.string(),
    )
    edges = (
        rd.from_arrow(pa.table({"parent": parents, "child": ev["url"]}))
        .groupby(["parent", "child"])
        .count()
        .select_columns(["parent", "child"])
    )
    nodes = rd.from_arrow(
        pa.table({"node": pa.array(sorted(res.seen.keys()), pa.string())})
    )
    return nodes, edges


def _crawl_rank_ds(sf_dir: str):
    """Shared PageRank-over-the-crawl derivation: the _crawl_graph
    nodes/edges through the exact integer fixed-point recurrence, 5
    iterations. Returns the (node, r) Dataset."""
    from brinkray.textproc.joins import pagerank

    nodes, edges = _crawl_graph(sf_dir)
    return pagerank(nodes, edges, iters=5, num_partitions=8)


def _q_graph_random_walks(sf_dir: str):
    """Deterministic DeepWalk-style walks over the crawl link graph:
    3 hops from every out-degree>0 node, next hop = md5-argmin over
    out-neighbors (the RNG derandomized to a fixed hash so the positive
    -pair sample is exact). Twin = three unrolled QUALIFY row_number
    argmin CTEs over the same reachable edge set."""
    from brinkray.textproc.joins import random_walks

    _, edges = _crawl_graph(sf_dir)
    out = random_walks(edges.materialize(), steps=3).to_pandas()
    out["step"] = out["step"].astype("int64")
    return (
        out[["start", "step", "node"]]
        .sort_values(["start", "step"])
        .reset_index(drop=True)
    )


def _q_link_pagerank(sf_dir: str):
    """PageRank over the crawl's reachable link graph (exact integer
    fixed-point, 5 iterations). The DuckDB twin re-derives the same
    graph from the dumped pages table via the crawl CTE and runs the
    identical integer recurrence unrolled."""
    out = _crawl_rank_ds(sf_dir).to_pandas()
    out = out.rename(columns={"node": "url", "r": "rank"})
    return out.sort_values("url").reset_index(drop=True)


def _q_recrawl_priority(sf_dir: str):
    """Politeness-aware recrawl schedule: every seen page ranked by
    link PageRank, capped at the top 3 per host — what a fixed refresh
    budget per origin looks like when the frontier is re-prioritized
    by link authority. Composition: the shared integer-PageRank
    derivation -> vectorized host projection (the crawl_host_stats
    regex, = scheme_and_host on canon keys) -> top_k_per_group (per-
    batch pre-prune, <= k rows per host per block reach the exchange).
    The twin appends one row_number window to the unrolled PageRank
    CTE."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from brinkray.textproc.curation import top_k_per_group

    ranks = _crawl_rank_ds(sf_dir)

    def add_host(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["node"], r"^(?P<h>https?://[^/?#]+)")
        return pa.table({
            "host": pc.struct_field(m, "h"),
            "url": t["node"],
            "rank": t["r"],
        })

    out = top_k_per_group(
        ranks.map_batches(add_host, batch_format="pyarrow"),
        by="host", score_col="rank", k=3, id_col="url",
    ).to_pandas()
    out = out[["host", "url", "rank"]]
    out["rank"] = out["rank"].astype("int64")
    return out.sort_values(
        ["host", "rank", "url"], ascending=[True, False, True]
    ).reset_index(drop=True)


def _q_crawl_wave_sizes(sf_dir: str):
    """Per-WAVE first-fetch counts — the BFS-depth histogram of the
    crawl. Puts a SQL oracle on the wave/depth semantics themselves
    (crawl_seen_set only certifies the order-independent SET): with
    default options a url's first fetch happens exactly at its BFS
    distance from the seed, which the twin re-derives by unrolling
    the reachability CTE level by level and taking MIN(level)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    import ray.data as rd

    res = _crawl_result(sf_dir)
    _dump_crawl_pages(sf_dir)
    ev = res.events_table().select(["wave", "cached"])
    first = ev.filter(pc.invert(ev["cached"]))
    out = (
        rd.from_arrow(first.select(["wave"]))
        .groupby("wave")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    out["wave"] = out["wave"].astype("int64")
    return out.sort_values("wave").reset_index(drop=True)


def _q_user_event_sequences(sf_dir: str):
    """Ordered per-group string aggregation (SQL string_agg with ORDER
    BY): each user's full event-type journey joined with '>' in
    (ts, event_id) order — the session/sequence-assembly shape."""
    from brinkray.textproc.relagg import grouped_string_agg

    out = grouped_string_agg(
        _ds(sf_dir, "events"), by="user_id", val_col="event_type",
        order_cols=["ts", "event_id"],
    ).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def _q_click_minus_purchase_bag(sf_dir: str):
    """EXCEPT ALL (bag semantics, vs the distinct set ops): per
    (user, day), click multiplicity minus purchase multiplicity,
    keeping keys with positive surplus — encoded as (key, n)."""
    from brinkray.textproc.relagg import set_op_bag

    clicks, purchases = _set_op_sides(sf_dir)
    out = set_op_bag(
        clicks, purchases, on=["user_id", "d"], op="except_all"
    ).to_pandas()
    return out.sort_values(["user_id", "d"]).reset_index(drop=True)


def _q_dup_span_scrub(sf_dir: str):
    """Exact-substring dedup REWRITE: tokens covered by any cross-doc
    duplicated 12-token window are removed; md5-keyed both sides."""
    from brinkray.textproc.dedup import dup_span_scrub

    out = dup_span_scrub(_ds(sf_dir, "documents"), k=12).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_sequence_packing(sf_dir: str):
    """Training-sequence packing layout (512-token windows over the
    doc_id-ordered token stream) via the corpus-wide distributed
    prefix sum; twin = a window SUM."""
    from brinkray.textproc.windows import sequence_packing

    out = sequence_packing(_ds(sf_dir, "documents"), window=512).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_gopher_quality(sf_dir: str):
    """Gopher-rule quality flags (word-count band, integer mean-word-
    length band, stopword English-likeness) — all-integer evidence so
    the twin re-derives every flag with list lambdas."""
    from brinkray.textproc.quality import gopher_quality_flags

    out = gopher_quality_flags(_ds(sf_dir, "documents")).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_dsir_weights(sf_dir: str):
    """DSIR-style hashed-ngram importance weights toward the lang='en'
    target slice, exact integer ppm ratios summed per doc."""
    from brinkray.textproc.curation import dsir_weights

    out = dsir_weights(_ds(sf_dir, "documents")).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_bigram_pmi(sf_dir: str):
    """Integer-exact PMI collocation scores over token bigrams (the
    phrase-mining pass); HUGEINT-twinned, floor-division both sides."""
    from brinkray.textproc.curation import bigram_pmi

    out = bigram_pmi(_ds(sf_dir, "documents"), min_count=5).to_pandas()
    return out.sort_values("bigram").reset_index(drop=True)


def _q_crawl_robots_seen(sf_dir: str):
    """Robots-gated crawl seen set: the same documents-seeded site WITH
    robots.txt pages (fixtures ROBOTS_A/ROBOTS_B), crawled with
    robots_enabled — disallowed urls are dropped pre-fetch, so the
    final seen set equals the robots-gated BFS fixpoint the twin
    re-derives (incl. the longest-match allow override /p/13/deeper
    over /p/13). Puts a driver oracle on the RFC-9309 filter path,
    previously pytest-only."""
    import pyarrow.parquet as pq

    import pandas as pd

    from brinkray.engine.crawl import EngineOptions
    from brinkray.fixtures.sitegen import build_site
    from brinkray.pipelines import run_crawl

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    texts = docs["text"].to_pylist()
    n = min(800, len(texts))
    pages = build_site(n, texts=texts, with_robots=True)
    pq.write_table(
        pages.select(["url", "html"]), _CRAWL_ROBOTS_PAGES_PATH
    )
    res = run_crawl(
        pages,
        options=EngineOptions(seen_shards=2, robots_enabled=True),
    )
    items = sorted(res.seen.items())
    return pd.DataFrame(
        {"url": [u for u, _ in items], "status": [s for _, s in items]}
    )


def _q_dedup_clusters_exact(sf_dir: str):
    """Connected components (alternating large-star/small-star rounds)
    over the EXACT Jaccard>=0.5 pair graph — unlike dedup_clusters
    (whose MinHash-estimate input is not SQL-derivable), this puts the
    distributed component-finding itself under a driver oracle: the
    twin re-derives the same edges by brute-force Jaccard and labels
    components with a recursive min-label CTE."""
    from brinkray.textproc.joins import cluster_pairs

    out = _to_pandas(cluster_pairs(_exact_jaccard_pairs(sf_dir)))
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_link_hits(sf_dir: str):
    """HITS hubs/authorities over the crawl's reachable link graph —
    exact unnormalized integer iterations (2), twin-unrolled in SQL
    like link_pagerank. Shares the _crawl_graph derivation."""
    from brinkray.textproc.joins import hits

    nodes, edges = _crawl_graph(sf_dir)
    out = hits(nodes, edges, iters=2, num_partitions=8).to_pandas()
    out = out.rename(columns={"node": "url"})[["url", "auth", "hub"]]
    return out.sort_values("url").reset_index(drop=True)


def _q_ann_multi_topk(sf_dir: str):
    """Multi-query exact ANN: top-10 per query for the 5 smallest-id
    embeddings, ONE corpus pass against the broadcast query matrix.
    Membership per query (cosine values differ from DuckDB in the last
    ulp); qid is the query's vec_id so both sides key identically."""
    import pyarrow.parquet as pq

    import pyarrow.compute as pc

    from brinkray.textproc.similarity import cosine_topk_multi

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    t = t.sort_by("vec_id").slice(0, 5)
    qids = t["vec_id"].to_pylist()
    import numpy as np

    queries = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    out = cosine_topk_multi(
        _ds(sf_dir, "embeddings"), queries, k=10
    ).to_pandas()
    out["qid"] = out["qid"].map({i: q for i, q in enumerate(qids)}).astype("int64")
    return (
        out[["qid", "vec_id"]]
        .sort_values(["qid", "vec_id"])
        .reset_index(drop=True)
    )


def _q_link_degree_histogram(sf_dir: str):
    """Out-degree distribution of the crawl's reachable link graph —
    graph analytics by composition: the same distinct-edge derivation
    as link_pagerank, then count_of_counts (degree per parent -> pages
    per degree). Twin re-derives the graph via the crawl CTE."""
    from brinkray.textproc.relagg import count_of_counts

    _, edges = _crawl_graph(sf_dir)
    out = count_of_counts(
        edges, "parent", out_key="out_degree", out_count="n_pages"
    ).to_pandas()
    return out.sort_values("out_degree").reset_index(drop=True)


def _q_sitemap_extract(sf_dir: str):
    """Sitemap ingestion (the crawler's other seed source): synthesize
    one sitemap.xml per host from the dumped pages (deterministic —
    urls in sorted order, the standard <urlset><url><loc> envelope) and
    parse the <loc> entries back with a stateless vectorized extractor
    (pyarrow RE2 over the xml bodies; at scale this is the map stage
    that feeds expand-seeds). Emits (host, url) for every extracted
    loc; the twin re-parses the SAME xml built by an identical SQL
    string_agg — certifying the extraction, not just the synthesis."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from brinkray.pipelines import pages_from_documents

    pages = pages_from_documents(sf_dir, pages_per_doc=1.0, cap=800)
    _dump_crawl_pages(sf_dir)
    urls = sorted(pages["url"].to_pylist())
    by_host: dict[str, list[str]] = {}
    for u in urls:
        host = u.split("/", 3)[2]
        by_host.setdefault(host, []).append(u)
    xmls = pa.table(
        {
            "host": pa.array(sorted(by_host), pa.string()),
            "xml": pa.array(
                [
                    "<urlset>"
                    + "".join(f"<url><loc>{u}</loc></url>" for u in by_host[h])
                    + "</urlset>"
                    for h in sorted(by_host)
                ],
                pa.string(),
            ),
        }
    )

    def extract(t: pa.Table) -> pa.Table:
        hosts_out, locs_out = [], []
        # pyarrow.compute has no extract-ALL kernel; compiled RE2-style
        # findall per xml row (rows = hosts, tiny) is the honest shape
        import re as _re

        rx = _re.compile(r"<loc>([^<]*)</loc>")
        for h, x in zip(t["host"].to_pylist(), t["xml"].to_pylist()):
            for m in rx.findall(x):
                hosts_out.append(h)
                locs_out.append(m)
        return pa.table(
            {
                "host": pa.array(hosts_out, pa.string()),
                "url": pa.array(locs_out, pa.string()),
            }
        )

    out = (
        rd.from_arrow(xmls)
        .map_batches(extract, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values(["host", "url"]).reset_index(drop=True)


def _q_crawl_extract_links(sf_dir: str):
    """Phase-1 slice: pages -> normalize -> extract links (no loop)."""
    import ray.data as rd

    from brinkray.engine.stages import make_extract_links_fn
    from brinkray.pipelines import pages_from_documents

    pages = pages_from_documents(sf_dir, pages_per_doc=1.0, cap=500)
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pages.select(["url", "html"]), _EXTRACT_PAGES_PATH)

    src = pa.table(
        {
            "href": pages["url"],
            "linked_from": pages["url"],
            "target": pa.array([""] * pages.num_rows, pa.string()),
            "order_key": pa.array(
                [f"{i:06d}" for i in range(pages.num_rows)], pa.string()
            ),
            "wave": pa.array([0] * pages.num_rows, pa.int32()),
            "body": pages["html"],
        }
    )
    links = rd.from_arrow(src).map_batches(
        make_extract_links_fn(), batch_format="pyarrow"
    )
    return links.select_columns(["href", "linked_from", "target"]).to_pandas()


def _part_edges(sf_dir: str):
    """Memoized part co-occurrence edge set (materialized Dataset) —
    four graph queries share it; the input parquet is immutable, so
    reuse is exact (same pattern as _crawl_result)."""
    key = f"edges:{sf_dir}"
    if key not in _memo:
        from brinkray.textproc.relagg import pair_cooccurrence

        _memo[key] = pair_cooccurrence(
            _ds(sf_dir, "lineitem"), "l_orderkey", "l_partkey", min_count=2
        ).materialize()
    return _memo[key]


def _q_market_basket_pairs(sf_dir: str):
    """Self-join co-occurrence shape: unordered part pairs appearing
    together in >= 2 orders, via bucket-vectorized pair explosion +
    bucket-vectorized counting (never a lineitem x lineitem join)."""
    out = _part_edges(sf_dir).to_pandas()
    return out.sort_values(["item_a", "item_b"]).reset_index(drop=True)


def _q_dataset_split(sf_dir: str):
    """Deterministic hash-based train/valid/test assignment (stable
    across runs/partitionings — the standard corpus-split operator)."""
    from brinkray.textproc.curation import train_val_test_split

    out = train_val_test_split(_ds(sf_dir, "documents")).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_sentence_stats(sf_dir: str):
    """Sentence-explode flat_map shape: one output row per non-blank
    sentence with its raw split index and token count."""
    from brinkray.textproc.curation import sentence_stats

    out = sentence_stats(_ds(sf_dir, "documents")).to_pandas()
    return out.sort_values(["doc_id", "sent_idx"]).reset_index(drop=True)


def _q_part_supplier_counts(sf_dir: str):
    """TPC-H Q16 shape: COUNT(DISTINCT supplier) per (brand, size) for
    non-STANDARD parts, excluding low-balance suppliers. Both dimension
    sides (part attrs, excluded suppkeys) broadcast once via ray.put
    and probed with searchsorted inside one lineitem map_batches; the
    only corpus-scale exchange is the distinct-triple groupby."""
    import numpy as np
    import pyarrow as pa

    import ray
    from ray.data.aggregate import Count

    part = _ds(sf_dir, "part").select_columns(
        ["p_partkey", "p_brand", "p_size", "p_type"]
    ).to_pandas()
    part = part[~part["p_type"].str.startswith("STANDARD")]
    part = part.sort_values("p_partkey")
    pk = part["p_partkey"].to_numpy(dtype=np.int64)
    brands = part["p_brand"].to_numpy()
    sizes = part["p_size"].to_numpy(dtype=np.int64)

    supp = _ds(sf_dir, "supplier").select_columns(
        ["s_suppkey", "s_acctbal"]
    ).to_pandas()
    excl = np.sort(
        supp.loc[supp["s_acctbal"] < 1000.0, "s_suppkey"].to_numpy(dtype=np.int64)
    )
    ref = ray.put((pk, brands, sizes, excl))

    def probe(t: pa.Table) -> pa.Table:
        pks, brs, szs, ex = ray.get(ref)
        lpart = np.asarray(t["l_partkey"].to_pylist(), dtype=np.int64)
        lsupp = np.asarray(t["l_suppkey"].to_pylist(), dtype=np.int64)
        pos = np.searchsorted(pks, lpart)
        pos_c = np.minimum(pos, len(pks) - 1)
        keep = (pks[pos_c] == lpart) & ~np.isin(lsupp, ex)
        pos_k = pos_c[keep]
        return pa.table(
            {
                "p_brand": pa.array(brs[pos_k]),
                "p_size": pa.array(szs[pos_k], pa.int64()),
                "l_suppkey": pa.array(lsupp[keep], pa.int64()),
            }
        )

    triples = (
        _ds(sf_dir, "lineitem")
        .select_columns(["l_partkey", "l_suppkey"])
        .map_batches(probe, batch_format="pyarrow")
        .groupby(["p_brand", "p_size", "l_suppkey"])
        .aggregate(Count(alias_name="_c"))
    )
    out = (
        triples.groupby(["p_brand", "p_size"])
        .aggregate(Count(alias_name="n_supp"))
        .to_pandas()
    )
    return out.sort_values(["p_brand", "p_size"]).reset_index(drop=True)


def _q_rich_inactive_customers(sf_dir: str):
    """TPC-H Q22 shape: per market segment, count + exact-cents balance
    sum of customers whose balance beats the positive-balance global
    average (integer cross-multiply, no float division) and who placed
    no order since 2001-01-01 (anti-join). The global (sum, n) scalar
    is one streaming aggregate broadcast by value."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Sum

    from brinkray.textproc.joins import anti_join

    def cust_prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.multiply(t["c_acctbal"], pa.scalar(100.0))), pa.int64()
        )
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_mktsegment": t["c_mktsegment"],
                "bal_cents": cents,
            }
        )

    cust = (
        _ds(sf_dir, "customer")
        .select_columns(["c_custkey", "c_mktsegment", "c_acctbal"])
        .map_batches(cust_prep, batch_format="pyarrow")
        .materialize()
    )
    pos = cust.filter(expr="bal_cents > 0").aggregate(
        Sum("bal_cents", alias_name="s"), Count(alias_name="n")
    )
    s_pos, n_pos = int(pos["s"]), int(pos["n"])

    cutoff = np.datetime64("2001-01-01", "us")

    def recent_only(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["o_orderdate"], pa.scalar(cutoff)))
        return t.select(["o_custkey"])

    recent = (
        _ds(sf_dir, "orders")
        .select_columns(["o_custkey", "o_orderdate"])
        .map_batches(recent_only, batch_format="pyarrow")
    )
    def above_avg(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.greater(pc.multiply(t["bal_cents"], pa.scalar(n_pos)),
                       pa.scalar(s_pos))
        )

    rich = cust.map_batches(above_avg, batch_format="pyarrow")
    out = (
        anti_join(rich, recent, on="c_custkey", right_on="o_custkey",
                  num_partitions=8)
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_cust"),
                   Sum("bal_cents", alias_name="bal_cents"))
        .to_pandas()
    )
    out["bal_cents"] = out["bal_cents"].astype(np.int64)
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def _q_longest_streaks(sf_dir: str):
    """Gaps-and-islands at day granularity: longest consecutive-active-
    day run per user (one groupby(user) over bounded per-key state)."""
    from brinkray.textproc.windows import longest_streaks

    out = longest_streaks(_ds(sf_dir, "events")).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def _q_snapshot_diff(sf_dir: str):
    """CDC diff between two corpus snapshots (added/removed/modified by
    content hash). Snapshot B is derived deterministically from the
    documents table (drop id%17==0, revise id%13==0, add id%19==0 under
    id + 2^40 — a high-bit offset that cannot collide with real ids) so both the Ray side and the SQL twin construct the
    identical pair of inputs."""
    import pyarrow as pa

    from brinkray.textproc.curation import snapshot_diff

    docs = _ds(sf_dir, "documents").select_columns(["doc_id", "text"])

    def derive_b(t: pa.Table) -> pa.Table:
        idn = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        out_id, out_tx = [], []
        for i, tx in zip(idn, texts):
            if i % 17 == 0:
                continue
            out_id.append(int(i))
            out_tx.append(tx + " rev2" if i % 13 == 0 else tx)
        for i, tx in zip(idn, texts):
            if i % 19 == 0:
                out_id.append(int(i) + (1 << 40))
                out_tx.append(tx)
        return pa.table(
            {"doc_id": pa.array(out_id, pa.int64()),
             "text": pa.array(out_tx, pa.string())}
        )

    snap_b = docs.map_batches(derive_b, batch_format="pyarrow")
    out = snapshot_diff(docs, snap_b).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_basket_triangles(sf_dir: str):
    """Distributed triangle enumeration over the part co-occurrence
    graph (edges = part pairs sharing >= 2 orders): two native
    hash-shuffle joins, no gathered adjacency."""
    from brinkray.textproc.joins import enumerate_triangles

    out = enumerate_triangles(_part_edges(sf_dir)).to_pandas()
    return out.sort_values(["a", "b", "c"]).reset_index(drop=True)


def _q_clustering_coefficients(sf_dir: str):
    """Per-node triangle participation over the part co-occurrence
    graph: (node, n_tri, n_wedges) in exact integers — the local
    clustering coefficient is n_tri / n_wedges, left rational so the
    result stays hash-comparable. Triangle side reuses the distributed
    enumeration; degrees come from one groupby over the edge list."""
    import pandas as pd
    import pyarrow as pa

    from ray.data.aggregate import Count

    from brinkray.textproc.joins import enumerate_triangles

    edges = _part_edges(sf_dir)
    tris = enumerate_triangles(edges)

    def explode_nodes(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": pa.concat_arrays(
                [t["a"].combine_chunks(), t["b"].combine_chunks(),
                 t["c"].combine_chunks()]
            )}
        )

    tri_counts = (
        tris.map_batches(explode_nodes, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="n_tri"))
        .to_pandas()
    )

    def edge_ends(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": pa.concat_arrays(
                [t["item_a"].combine_chunks(), t["item_b"].combine_chunks()]
            )}
        )

    deg = (
        edges.map_batches(edge_ends, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="deg"))
        .to_pandas()
    )
    out = deg.merge(tri_counts, on="node", how="left")
    out["n_tri"] = out["n_tri"].fillna(0).astype("int64")
    out["n_wedges"] = (out["deg"] * (out["deg"] - 1) // 2).astype("int64")
    out = out[out["n_wedges"] > 0][["node", "n_tri", "n_wedges"]]
    return out.sort_values("node").reset_index(drop=True)


def _q_small_quantity_revenue(sf_dir: str):
    """TPC-H Q17 shape (decorrelated scalar subquery): revenue from
    lineitems whose quantity is below 20% of their part's average —
    the per-part (sum, n) aggregate joins back onto lineitem and the
    comparison is the exact integer cross-multiply qty*5*n < sum.
    Returns one row: (rev_cents, n_rows)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Sum

    def prep(t: pa.Table) -> pa.Table:
        qty = pc.cast(
            pc.floor(pc.multiply(t["l_quantity"], pa.scalar(100.0))), pa.int64()
        )
        ep = pc.cast(
            pc.floor(pc.multiply(t["l_extendedprice"], pa.scalar(100.0))),
            pa.int64(),
        )
        return pa.table(
            {"l_partkey": t["l_partkey"], "qty_cents": qty, "ep_cents": ep}
        )

    rows = (
        _ds(sf_dir, "lineitem")
        .select_columns(["l_partkey", "l_quantity", "l_extendedprice"])
        .map_batches(prep, batch_format="pyarrow")
        .materialize()
    )
    per_part = rows.groupby("l_partkey").aggregate(
        Sum("qty_cents", alias_name="s"), Count(alias_name="n")
    )

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["pk", "s", "n"])

    joined = rows.join(
        per_part.map_batches(rename, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=8,
        on=("l_partkey",),
        right_on=("pk",),
    )

    def keep(t: pa.Table) -> pa.Table:
        lhs = pc.multiply(pc.multiply(t["qty_cents"], pa.scalar(5)), t["n"])
        return t.filter(pc.less(lhs, t["s"])).select(["ep_cents"])

    agg = joined.map_batches(keep, batch_format="pyarrow").aggregate(
        Sum("ep_cents", alias_name="rev_cents"), Count(alias_name="n_rows")
    )
    return pd.DataFrame(
        {"rev_cents": [int(agg["rev_cents"])], "n_rows": [int(agg["n_rows"])]}
    )


def _q_time_to_first_purchase(sf_dir: str):
    """Two-branch argmin join: per user, microseconds from first click
    to first purchase (users whose first purchase is not before their
    first click). ONE groupby(user, event_type) Min exchange feeds a
    tiny in-driver pivot — the corpus never moves twice."""
    import pandas as pd
    import pyarrow as pa

    from ray.data.aggregate import Min

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_type": t["event_type"],
                "ts_us": t["ts"].cast(pa.int64()),
            }
        )

    firsts = (
        _ds(sf_dir, "events")
        .select_columns(["user_id", "event_type", "ts"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .aggregate(Min("ts_us", alias_name="t"))
        .to_pandas()
    )  # |users| x |event types| rows — driver-safe by construction
    piv = firsts.pivot_table(index="user_id", columns="event_type", values="t")
    if "click" not in piv.columns or "purchase" not in piv.columns:
        return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                             "delta_us": pd.Series([], dtype="int64")})
    both = piv.dropna(subset=["click", "purchase"])
    both = both[both["purchase"] >= both["click"]]
    out = pd.DataFrame(
        {
            "user_id": both.index.to_numpy(),
            "delta_us": (both["purchase"] - both["click"]).astype("int64").to_numpy(),
        }
    )
    return out.sort_values("user_id").reset_index(drop=True)


def _q_cdc_apply(sf_dir: str):
    """CDC merge/upsert: apply a derived change stream (revise id%13,
    delete id%17 — deletes win, insert id%19 under id + 2^40) onto the
    documents snapshot; certified by the twin constructing the target
    snapshot directly. Returns (doc_id, fp) — content hashes, so the
    comparison covers payload bytes, not just keys."""
    import hashlib

    import pyarrow as pa

    from brinkray.textproc.curation import apply_changes

    docs = _ds(sf_dir, "documents").select_columns(["doc_id", "text"])

    def derive_changes(t: pa.Table) -> pa.Table:
        idn = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        out_id, out_op, out_tx = [], [], []
        for i, tx in zip(idn, texts):
            if i % 17 == 0:
                out_id.append(int(i)); out_op.append("delete"); out_tx.append("")
            elif i % 13 == 0:
                out_id.append(int(i)); out_op.append("upsert")
                out_tx.append(tx + " rev2")
            if i % 19 == 0:
                out_id.append(int(i) + (1 << 40)); out_op.append("upsert")
                out_tx.append(tx)
        return pa.table(
            {"doc_id": pa.array(out_id, pa.int64()),
             "op": pa.array(out_op, pa.string()),
             "text": pa.array(out_tx, pa.string())}
        )

    changes = docs.map_batches(derive_changes, batch_format="pyarrow")

    def fp(t: pa.Table) -> pa.Table:
        fps = [hashlib.md5(x.encode()).hexdigest() for x in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"], "fp": pa.array(fps)})

    out = (
        apply_changes(docs, changes)
        .map_batches(fp, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_graph_distances(sf_dir: str):
    """Multi-wave BFS hop distances over the part co-occurrence graph
    from the graph's smallest node — the iterative frontier-join shape,
    twinned against a bounded recursive CTE."""
    from ray.data.aggregate import Min

    from brinkray.textproc.joins import bfs_distances

    edges = _part_edges(sf_dir)
    seed = int(edges.aggregate(Min("item_a", alias_name="m"))["m"])
    out = bfs_distances(edges, [seed], max_depth=6).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def _q_funnel_steps(sf_dir: str):
    """Ordered 3-step funnel (view -> click -> purchase with
    chained-MIN ordering): per user, the furthest step reached."""
    from brinkray.textproc.windows import funnel_steps

    out = funnel_steps(
        _ds(sf_dir, "events"), ["view", "click", "purchase"]
    ).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def _q_events_profile(sf_dir: str):
    """Data-profiling operator: per-column NULL + exact distinct counts
    over the events table."""
    from brinkray.textproc.relagg import table_profile

    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    return table_profile(_ds(sf_dir, "events"), cols).to_pandas()


def _q_text_roundtrip(sf_dir: str):
    """Plain-text-lines sink + source (ray.data.read_text), certified
    end to end through the same manifest invariant as the jsonl/csv
    pairs."""
    import shutil
    import tempfile

    from brinkray.textproc.curation import read_text_manifest, write_text_shards

    out_dir = tempfile.mkdtemp(prefix="brinkray_text_", dir="/tmp")
    try:
        write_text_shards(_ds(sf_dir, "documents"), out_dir).materialize()
        out = read_text_manifest(out_dir).to_pandas()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return out.sort_values("shard").reset_index(drop=True)


def _q_warcish_roundtrip(sf_dir: str):
    """WARC-like BINARY capture container, sink + source certified end
    to end: the synthesized pages (url, status, raw html bytes) write
    as length-prefixed records into md5(url)-bucket shards, read back
    via read_binary_files + frame parsing, and reduce to a per-shard
    manifest whose every field — counts, payload bytes, status sum,
    and an md5-payload checksum — is recomputed from the ROUND-TRIPPED
    records. The twin re-derives the manifest from the original page
    dump (statuses from the /status/NNN url convention, the same
    sandbox-web rule as the crawl CTE)."""
    import re
    import shutil
    import tempfile

    import pyarrow as pa
    import ray.data as rd

    from brinkray.pipelines import pages_from_documents
    from brinkray.textproc.curation import (
        read_warcish_manifest,
        write_warcish_shards,
    )

    pages = pages_from_documents(sf_dir, pages_per_doc=1.0, cap=800)
    _dump_crawl_pages(sf_dir)
    st_re = re.compile(r"^https?://[^/]+/status/([0-9]{3})(/|$)")
    urls = pages["url"].to_pylist()
    statuses = [
        int(m.group(1)) if (m := st_re.match(u)) else 200 for u in urls
    ]
    tbl = pa.table(
        {
            "url": pages["url"],
            "status": pa.array(statuses, pa.int32()),
            "body": pages["html"],
        }
    )
    out_dir = tempfile.mkdtemp(prefix="brinkray_wrc_", dir="/tmp")
    try:
        write_warcish_shards(rd.from_arrow(tbl), out_dir).materialize()
        out = read_warcish_manifest(out_dir).to_pandas()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    for c in ("n_records", "n_bytes", "status_sum", "checksum"):
        out[c] = out[c].astype("int64")
    return out.sort_values("shard").reset_index(drop=True)


def _q_lang_confusion(sf_dir: str):
    """Label-vs-model confusion matrix: stored lang x stopword-profile
    prediction, one stateless scoring pass + one tiny groupby."""
    from ray.data.aggregate import Count

    from brinkray.textproc.quality import add_lang_id

    out = (
        add_lang_id(_ds(sf_dir, "documents").select_columns(["lang", "text"]))
        .groupby(["lang", "lang_pred"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    return out.sort_values(["lang", "lang_pred"]).reset_index(drop=True)


def _q_filter_funnel(sf_dir: str):
    """Filter-cascade accounting (what a curation run reports): each
    doc is attributed to the FIRST stage that rejects it — lang !=
    'en', length outside [100, 520] chars, linear quality score <= 0 —
    or 'pass'. One vectorized pass + a 4-row groupby; no doc is
    silently dropped (the counts partition the corpus)."""
    import re

    import numpy as np
    import pyarrow as pa

    from ray.data.aggregate import Count

    from brinkray.textproc.quality import LINEAR_MODEL_WEIGHTS as W

    tok = re.compile(r"\S+")
    punct = re.compile(r"[.!?]")
    digit = re.compile(r"[0-9]")

    def label(t: pa.Table) -> pa.Table:
        langs = t["lang"].to_pylist()
        texts = t["text"].to_pylist()
        nchars = t["n_chars"].to_numpy(zero_copy_only=False)
        score = (
            W["bias"]
            + W["n_tokens"] * np.array([len(tok.findall(x)) for x in texts])
            + W["n_chars"] * nchars
            + W["n_punct"] * np.array([len(punct.findall(x)) for x in texts])
            + W["n_digits"] * np.array([len(digit.findall(x)) for x in texts])
        )
        stage = np.where(
            np.array(langs) != "en", "lang",
            np.where((nchars < 100) | (nchars > 520), "length",
                     np.where(score <= 0, "quality", "pass")),
        )
        return pa.table({"stage": pa.array(stage)})

    out = (
        _ds(sf_dir, "documents")
        .select_columns(["lang", "text", "n_chars"])
        .map_batches(label, batch_format="pyarrow")
        .groupby("stage")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    return out.sort_values("stage").reset_index(drop=True)


def _q_weighted_sample_orders(sf_dir: str):
    """Deterministic WEIGHTED sampling (inclusion probability ∝ value,
    the importance-sampling shape): order o is kept iff
    u16(o) / 65536 < price_cents / 60,000,000 where u16 is the last
    four md5 nibbles of the orderkey — hash-deterministic, so the
    sample is stable under repartition/rerun AND fully SQL-twinnable;
    the comparison is exact-integer cross-multiplied. Stateless
    map_batches, no exchange."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def keep(t: pa.Table) -> pa.Table:
        ids = t["o_orderkey"].to_numpy(zero_copy_only=False)
        u16 = np.array(
            [int(hashlib.md5(str(i).encode()).hexdigest()[-4:], 16) for i in ids],
            dtype=np.int64,
        )
        cents = pc.cast(
            pc.floor(pc.multiply(t["o_totalprice"], pa.scalar(100.0))),
            pa.int64(),
        ).to_numpy()
        mask = u16 * 60_000_000 < 65_536 * cents
        return pa.table(
            {"o_orderkey": pa.array(ids[mask], pa.int64())}
        )

    out = (
        _ds(sf_dir, "orders")
        .select_columns(["o_orderkey", "o_totalprice"])
        .map_batches(keep, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("o_orderkey").reset_index(drop=True)


def _q_pareto_customers(sf_dir: str):
    """Pareto coverage report: how many of the top-revenue customers
    cover >= 80% of total order revenue (exact cents; threshold compare
    is integer cross-multiplied). The corpus-scale exchange is the
    per-customer Sum; the descending cumsum runs over the
    |customers|-bounded aggregate (documented assumption — a
    corpus-scale key set would swap the tail for the distributed
    range_rank + prefix-sum path)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.multiply(t["o_totalprice"], pa.scalar(100.0))),
            pa.int64(),
        )
        return pa.table({"o_custkey": t["o_custkey"], "cents": cents})

    per_cust = (
        _ds(sf_dir, "orders")
        .select_columns(["o_custkey", "o_totalprice"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("cents", alias_name="cents"))
        .to_pandas()
    )
    per_cust = per_cust.sort_values(
        ["cents", "o_custkey"], ascending=[False, True]
    ).reset_index(drop=True)
    total = int(per_cust["cents"].sum())
    cum = per_cust["cents"].cumsum().to_numpy()
    # first k with cum[k-1] * 5 >= total * 4  (>= 80%, exact ints)
    k = int(np.searchsorted(cum * 5, total * 4) + 1)
    return pd.DataFrame(
        {
            "n_customers": np.array([len(per_cust)], dtype=np.int64),
            "top_k_for_80pct": np.array([k], dtype=np.int64),
            "total_cents": np.array([total], dtype=np.int64),
        }
    )


def _q_repeat_orders_week(sf_dir: str):
    """Temporal SELF-join: unordered pairs of same-customer orders
    placed within 7 days of each other, via the interval-join kernel
    (orders vs orders with a [date, date+7d] window) and a vectorized
    dedup filter so each pair emits exactly once (later date wins;
    equal dates tie-break on orderkey)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from brinkray.textproc.joins import interval_join

    def left_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ck": t["o_custkey"],
                "ts": t["o_orderdate"],
                "next_order": t["o_orderkey"],
            }
        )

    def right_prep(t: pa.Table) -> pa.Table:
        lo = t["o_orderdate"]
        hi = pc.add(lo, pa.scalar(np.timedelta64(7, "D").astype("timedelta64[us]")))
        return pa.table(
            {
                "ck": t["o_custkey"],
                "lo": lo,
                "hi": hi,
                "first_order": t["o_orderkey"],
                # carried so the dedup filter can compare dates
                "first_date": lo,
            }
        )

    orders = _ds(sf_dir, "orders").select_columns(
        ["o_custkey", "o_orderdate", "o_orderkey"]
    )
    joined = interval_join(
        orders.map_batches(left_prep, batch_format="pyarrow"),
        orders.map_batches(right_prep, batch_format="pyarrow"),
        key="ck",
        left_ts="ts",
        right_lo="lo",
        right_hi="hi",
        right_vals=["first_order", "first_date"],
        max_span=np.timedelta64(7, "D"),
    )

    def dedup(t: pa.Table) -> pa.Table:
        later = pc.greater(t["ts"], t["first_date"])
        tie = pc.and_(
            pc.equal(t["ts"], t["first_date"]),
            pc.greater(t["next_order"], t["first_order"]),
        )
        t = t.filter(pc.or_(later, tie))
        return t.select(["ck", "first_order", "next_order"]).rename_columns(
            ["o_custkey", "first_order", "next_order"]
        )

    out = joined.map_batches(dedup, batch_format="pyarrow").to_pandas()
    return out.sort_values(
        ["o_custkey", "first_order", "next_order"]
    ).reset_index(drop=True)


def _q_revenue_gini(sf_dir: str):
    """Gini concentration of per-customer revenue in EXACT integers:
    G = (2*sum(i*v_i) - (n+1)*sum(v)) / (n*sum(v)) over ascending-rank
    cents — returned as (gini_num, gini_den) so the division never
    happens. Ranks come from the distributed range_rank (the
    high-cardinality sort-rank path), so no stage holds more than one
    range's rows; the final reduction is one integer aggregate."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Sum

    from brinkray.textproc.relagg import range_rank

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.multiply(t["o_totalprice"], pa.scalar(100.0))),
            pa.int64(),
        )
        return pa.table({"o_custkey": t["o_custkey"], "cents": cents})

    per_cust = (
        _ds(sf_dir, "orders")
        .select_columns(["o_custkey", "o_totalprice"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("cents", alias_name="cents"))
    )
    ranked = range_rank(per_cust, key_col="cents", id_col="o_custkey")

    def weight(t: pa.Table) -> pa.Table:
        i = pc.add(t["rank"], pa.scalar(1))  # 1-based
        return pa.table(
            {"cents": t["cents"], "iv": pc.multiply(i, t["cents"])}
        )

    agg = ranked.map_batches(weight, batch_format="pyarrow").aggregate(
        Sum("cents", alias_name="s"), Sum("iv", alias_name="s1"),
        Count(alias_name="n"),
    )
    s, s1, n = int(agg["s"]), int(agg["s1"]), int(agg["n"])
    return pd.DataFrame(
        {
            "gini_num": pd.Series([2 * s1 - (n + 1) * s], dtype="int64"),
            "gini_den": pd.Series([n * s], dtype="int64"),
        }
    )


def _q_late_events(sf_dir: str):
    """Watermark/late-data detection: events whose event time trails
    the per-user ARRIVAL-order watermark by > 24 hours. The generated
    events arrive in perfect event-time order (zero late rows), so
    arrival order is simulated with a deterministic md5 shuffle —
    seq = u16(md5(event_id)) * 2^40 + event_id, identical on both
    sides — which is exactly the out-of-order stream a watermark
    exists for."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from brinkray.textproc.windows import late_events

    def with_seq(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        u16 = np.array(
            [int(hashlib.md5(str(i).encode()).hexdigest()[-4:], 16)
             for i in ids],
            dtype=np.int64,
        )
        return t.append_column(
            "arrival", pa.array((u16 << 40) + ids, pa.int64())
        )

    ev = _ds(sf_dir, "events").select_columns(
        ["user_id", "event_id", "ts"]
    ).map_batches(with_seq, batch_format="pyarrow")
    out = late_events(
        ev, lateness_minutes=24 * 60, seq_col="arrival"
    ).to_pandas()
    out = out[["user_id", "arrival", "ts_us", "lag_us"]]
    return out.sort_values(["user_id", "arrival"]).reset_index(drop=True)


def _q_incremental_daily_counts(sf_dir: str):
    """Incremental view maintenance: a base aggregate (events before
    the split date) merged with a delta aggregate (events after) by
    one sum over the union — certified against the full recompute (the
    twin). The corpus never re-aggregates from scratch: each side is
    its own combiner-bounded groupby."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    split = np.datetime64("2024-01-15", "us")

    def bucket(which: str):
        def fn(t: pa.Table) -> pa.Table:
            if which == "base":
                t = t.filter(pc.less(t["ts"], pa.scalar(split)))
            else:
                t = t.filter(pc.greater_equal(t["ts"], pa.scalar(split)))
            day = pc.floor_temporal(t["ts"], unit="day")
            return pa.table(
                {"day": day,
                 "n": pa.array(np.ones(t.num_rows, np.int64), pa.int64())}
            )

        return fn

    ev = _ds(sf_dir, "events").select_columns(["ts"])
    base = ev.map_batches(bucket("base"), batch_format="pyarrow")
    delta = ev.map_batches(bucket("delta"), batch_format="pyarrow")
    out = (
        base.union(delta)
        .groupby("day")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return out.sort_values("day").reset_index(drop=True)


def _q_session_conversion(sf_dir: str):
    """Sessionized conversion rate inputs: total session count and the
    count containing >= 1 purchase, as exact integers (the rate is
    their ratio). Per-user session assignment is the same vectorized
    gaps-and-islands body as sessionize; only one tiny row per session
    leaves the group."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ray.data.aggregate import Count, Sum

    gap = np.timedelta64(30 * 60, "s")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="mergesort")
        ts = g["ts"].to_numpy()
        sid = np.cumsum(np.concatenate(([True], np.diff(ts) > gap)))
        hasp = pd.DataFrame(
            {"sid": sid, "p": (g["event_type"].to_numpy() == "purchase")}
        ).groupby("sid")["p"].any()
        return pd.DataFrame({"hasp": hasp.astype("int64").to_numpy()})

    agg = (
        _ds(sf_dir, "events")
        .select_columns(["user_id", "ts", "event_type"])
        .groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .aggregate(Count(alias_name="n_sessions"),
                   Sum("hasp", alias_name="n_with_purchase"))
    )
    return pd.DataFrame(
        {
            "n_sessions": pd.Series([int(agg["n_sessions"])], dtype="int64"),
            "n_with_purchase": pd.Series(
                [int(agg["n_with_purchase"])], dtype="int64"
            ),
        }
    )


def _q_top_entry_paths(sf_dir: str):
    """Sequence-mining shape: the 10 most common first-3-event-type
    paths across users (ties by path string). Per-user prefix
    extraction is one groupby(user) with a vectorized argsort body;
    the path-count exchange is bounded by |event types|^3."""
    import pandas as pd
    import pyarrow as pa

    from ray.data.aggregate import Count

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort").head(3)
        return pd.DataFrame({"path": [">".join(g["event_type"])]})

    out = (
        _ds(sf_dir, "events")
        .select_columns(["user_id", "ts", "event_id", "event_type"])
        .groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .groupby("path")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    out = out.sort_values(["n", "path"], ascending=[False, True]).head(10)
    return out.reset_index(drop=True)


def _q_imputed_values(sf_dir: str):
    """Missing-value imputation (the data-repair shape): values of
    events with event_id % 7 == 0 are treated as missing and filled
    with their event type's median over the NON-missing rows (exact
    cents, quantile_disc rank semantics). The per-group medians come
    from one combiner-bounded (group, value, count) histogram groupby;
    the small median table broadcasts into a vectorized fill pass."""
    import math

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.multiply(t["value"], pa.scalar(100.0))), pa.int64()
        )
        missing = pa.array(
            t["event_id"].to_numpy(zero_copy_only=False) % 7 == 0
        )
        return pa.table(
            {
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "cents": cents,
                "missing": missing,
            }
        )

    rows = (
        _ds(sf_dir, "events")
        .select_columns(["event_id", "event_type", "value"])
        .map_batches(prep, batch_format="pyarrow")
        .materialize()
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        df = t.filter(pc.invert(t["missing"])).select(
            ["event_type", "cents"]
        ).to_pandas()
        g = df.groupby(["event_type", "cents"]).size().reset_index(name="c")
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = (
        rows.map_batches(hist_partial, batch_format="pyarrow")
        .groupby(["event_type", "cents"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )  # bounded by |types| x |distinct cents|
    medians: dict[str, int] = {}
    for et, g in hist.groupby("event_type"):
        g = g.sort_values("cents")
        n = int(g["c"].sum())
        rank = max(1, math.ceil(0.5 * n))  # quantile_disc(0.5)
        cum = g["c"].cumsum().to_numpy()
        medians[et] = int(g["cents"].to_numpy()[np.searchsorted(cum, rank)])

    import ray

    med_ref = ray.put(medians)

    def fill(t: pa.Table) -> pa.Table:
        med = ray.get(med_ref)
        ets = t["event_type"].to_pylist()
        cents = t["cents"].to_numpy(zero_copy_only=False).copy()
        miss = t["missing"].to_numpy(zero_copy_only=False)
        # An event_type with ONLY missing rows has no median; the SQL
        # twin's inner join on the medians table silently drops those
        # rows — mirror that (instead of raising KeyError).
        has_med = np.array([e in med for e in ets], dtype=bool)
        fills = np.array([med.get(e, 0) for e in ets], dtype=np.int64)
        cents[miss] = fills[miss]
        out = pa.table(
            {
                "event_id": t["event_id"],
                "value_cents": pa.array(cents, pa.int64()),
                "imputed": pa.array(miss),
            }
        )
        keep = np.logical_or(~miss, has_med)
        return out if bool(keep.all()) else out.filter(pa.array(keep))

    out = rows.map_batches(fill, batch_format="pyarrow").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def _q_next_order_after_event(sf_dir: str):
    """FORWARD as-of join ("next appointment" shape): for each event,
    the customer's EARLIEST order date at or after the event time —
    the direction DuckDB's ASOF JOIN can't express (twinned as the
    decorrelated MIN join). Uses the same deterministic events->orders
    era mapping as the interval join."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from brinkray.textproc.joins import asof_join

    cust = _ds(sf_dir, "customer").select_columns(["c_custkey"]).to_pandas()
    max_ck = int(cust["c_custkey"].max())
    base_us = np.datetime64("1995-01-01", "us").astype("int64")

    def add_ck(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy()
        ck = [u % max_ck + 1 for u in t["user_id"].to_pylist()]
        off_s = (eid * 1123457) % 208_000_000
        ts2 = (base_us + off_s * 1_000_000).astype("datetime64[us]")
        return pa.table(
            {
                "event_id": t["event_id"],
                "ck": pa.array(ck, pa.int64()),
                "ts": pa.array(ts2),
            }
        )

    left = _ds(sf_dir, "events").map_batches(add_ck, batch_format="pyarrow")

    def ord_prep(t: pa.Table) -> pa.Table:
        return pa.table({"ck": t["o_custkey"], "o_date": t["o_orderdate"]})

    right = _ds(sf_dir, "orders").select_columns(
        ["o_custkey", "o_orderdate"]
    ).map_batches(ord_prep, batch_format="pyarrow")
    out = asof_join(
        left, right, key="ck", left_ts="ts", right_ts="o_date",
        right_vals=["o_date"], direction="forward",
    ).to_pandas()
    out = out.dropna(subset=["o_date"])  # inner semantics
    out["o_date"] = pd.to_datetime(out["o_date"]).astype("datetime64[us]")
    # the union-side NA padding upcasts event_id to float64; restore
    out["event_id"] = out["event_id"].astype("int64")
    return out[["event_id", "o_date"]].sort_values("event_id").reset_index(
        drop=True
    )


def _q_revenue_by_balance_decile(sf_dir: str):
    """Analytics composition: customers NTILE(10)-bucketed by account
    balance (exact cents, range-partitioned global rank), native-joined
    onto orders, revenue + order count per decile."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Sum

    from brinkray.textproc.joins import default_join_partitions
    from brinkray.textproc.relagg import range_rank

    def cust_prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.multiply(t["c_acctbal"], pa.scalar(100.0))), pa.int64()
        )
        return pa.table({"c_custkey": t["c_custkey"], "bal_cents": cents})

    deciles = range_rank(
        _ds(sf_dir, "customer")
        .select_columns(["c_custkey", "c_acctbal"])
        .map_batches(cust_prep, batch_format="pyarrow"),
        key_col="bal_cents",
        id_col="c_custkey",
        n_buckets=10,
    )

    def keep_bucket(t: pa.Table) -> pa.Table:
        return pa.table({"ck": t["c_custkey"], "decile": t["bucket"]})

    def ord_prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.multiply(t["o_totalprice"], pa.scalar(100.0))),
            pa.int64(),
        )
        return pa.table({"o_custkey": t["o_custkey"], "cents": cents})

    joined = (
        _ds(sf_dir, "orders")
        .select_columns(["o_custkey", "o_totalprice"])
        .map_batches(ord_prep, batch_format="pyarrow")
        .join(
            deciles.map_batches(keep_bucket, batch_format="pyarrow"),
            join_type="inner",
            num_partitions=default_join_partitions(),
            on=("o_custkey",),
            right_on=("ck",),
        )
    )
    out = (
        joined.groupby("decile")
        .aggregate(Sum("cents", alias_name="rev_cents"),
                   Count(alias_name="n_orders"))
        .to_pandas()
    )
    out["rev_cents"] = out["rev_cents"].astype("int64")
    return out.sort_values("decile").reset_index(drop=True)


def _q_loo_target_encoding(sf_dir: str):
    """Leave-one-out target encoding (the ML feature-engineering shape:
    each row's feature is its GROUP's mean computed WITHOUT the row, so
    the encoding never leaks the row's own target): per order,
    (sum_others, n_others) = (group_sum - v, n - 1) as exact integers —
    the mean is the rational num/den, never a float. Per-customer sums
    come from the bucket-vectorized kernel; one native join back."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from brinkray.textproc.joins import default_join_partitions
    from brinkray.textproc.relagg import bucketed_group_sums

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.multiply(t["o_totalprice"], pa.scalar(100.0))),
            pa.int64(),
        )
        ones = pa.array([1] * t.num_rows, pa.int64())
        return pa.table(
            {"o_custkey": t["o_custkey"], "o_orderkey": t["o_orderkey"],
             "cents": cents, "_n": ones}
        )

    rows = (
        _ds(sf_dir, "orders")
        .select_columns(["o_custkey", "o_orderkey", "o_totalprice"])
        .map_batches(prep, batch_format="pyarrow")
        .materialize()
    )

    def agg_in(t: pa.Table) -> pa.Table:
        return pa.table(
            {"o_custkey": t["o_custkey"], "s": t["cents"], "n": t["_n"]}
        )

    agg = bucketed_group_sums(
        rows.map_batches(agg_in, batch_format="pyarrow"),
        key_col="o_custkey", sum_cols=["s", "n"],
    )

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["ck", "s", "n"])

    joined = rows.join(
        agg.map_batches(rename, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=default_join_partitions(),
        on=("o_custkey",),
        right_on=("ck",),
    )

    def loo(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["n"], pa.scalar(1)))
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "loo_num": pc.subtract(t["s"], t["cents"]),
                "loo_den": pc.subtract(t["n"], pa.scalar(1)),
            }
        )

    out = joined.map_batches(loo, batch_format="pyarrow").to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


def _q_score_calibration(sf_dir: str):
    """Model-eval calibration table: documents NTILE(10)-bucketed by
    quality-model score (exact integers, ties by doc_id), per decile
    the row count and the count passing the decision threshold — the
    table a score-calibration curve is plotted from."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Sum

    from brinkray.textproc.quality import score_documents_linear
    from brinkray.textproc.relagg import range_rank

    scores = score_documents_linear(_ds(sf_dir, "documents")).materialize()
    ranked = range_rank(scores, key_col="score", id_col="doc_id",
                        n_buckets=10)

    def flag(t: pa.Table) -> pa.Table:
        # rejoin passes from the score itself (rank kept only key+id)
        return pa.table(
            {
                "decile": t["bucket"],
                "pass_i": pc.cast(pc.greater(t["score"], pa.scalar(0)),
                                  pa.int64()),
            }
        )

    out = (
        ranked.map_batches(flag, batch_format="pyarrow")
        .groupby("decile")
        .aggregate(Count(alias_name="n"), Sum("pass_i", alias_name="n_pass"))
        .to_pandas()
    )
    out["n_pass"] = out["n_pass"].astype("int64")
    return out.sort_values("decile").reset_index(drop=True)


def _q_lang_id_prf(sf_dir: str):
    """Per-class precision/recall INPUTS for the lang-ID model
    (tp/fp/fn as exact integers — precision = tp/(tp+fp), recall =
    tp/(tp+fn) are the callers' rationals): derived from the
    |classes|^2-bounded confusion counts, classes = labels ∪
    predictions."""
    import pandas as pd

    from ray.data.aggregate import Count

    from brinkray.textproc.quality import add_lang_id

    conf = (
        add_lang_id(_ds(sf_dir, "documents").select_columns(["lang", "text"]))
        .groupby(["lang", "lang_pred"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )  # bounded by |classes|^2
    classes = sorted(set(conf["lang"]) | set(conf["lang_pred"]))
    rows = []
    for c in classes:
        tp = int(conf[(conf["lang"] == c) & (conf["lang_pred"] == c)]["n"].sum())
        fn = int(conf[(conf["lang"] == c) & (conf["lang_pred"] != c)]["n"].sum())
        fp = int(conf[(conf["lang"] != c) & (conf["lang_pred"] == c)]["n"].sum())
        rows.append((c, tp, fp, fn))
    return pd.DataFrame(rows, columns=["cls", "tp", "fp", "fn"]).astype(
        {"tp": "int64", "fp": "int64", "fn": "int64"}
    )


def _q_crawl_url_features(sf_dir: str):
    """Web-analytics features over the crawl's reached URL set: path
    depth (non-empty '/'-segments) and query-string flag per canonical
    url — a stateless vectorized map over the seen set, twinned
    through the same recursive-CTE reachability fixpoint as
    crawl_seen_set."""
    import re

    import pandas as pd

    res = _crawl_result(sf_dir)
    _dump_crawl_pages(sf_dir)
    urls = sorted(res.seen.keys())
    path_re = re.compile(r"^https?://[^/?#]+([^?#]*)")
    depths, has_q = [], []
    for u in urls:
        m = path_re.match(u)
        path = m.group(1) if m else ""
        depths.append(len([s for s in path.split("/") if s]))
        has_q.append("?" in u)
    return pd.DataFrame(
        {
            "url": urls,
            "depth": pd.Series(depths, dtype="int64"),
            "has_query": has_q,
        }
    )


# shared pages dump for the web-graph queries (the driver runs the Ray
# query before its SQL twin, so the dump is the oracle's input)
_ANCHOR_PAGES_PATH = "/tmp/brinkray_anchor_pages.parquet"
_CAPTURE_PAGES_PATH = "/tmp/brinkray_capture_pages.parquet"


def _anchor_pages_ds(sf_dir: str):
    import pyarrow.parquet as pq

    import ray.data as rd

    from brinkray.pipelines import pages_from_documents

    pages = pages_from_documents(sf_dir, pages_per_doc=1.0, cap=500)
    pq.write_table(pages.select(["url", "html"]), _ANCHOR_PAGES_PATH)
    return rd.from_arrow(pages.select(["url", "html"])).repartition(8)


def _q_anchor_text_index(sf_dir: str):
    """Anchor-text index over the synthesized pages: per link TARGET,
    reference count, distinct anchor-text count, lexicographic first
    anchor (webgraph.anchor_text_stats). The extraction regex set is
    RE2-compatible and shared verbatim with the DuckDB twin; the
    absolutizer CASE mirrors the crawl extractor's oracle-pinned gate
    order (urls.go:96-101 then 47-67)."""
    from brinkray.textproc.webgraph import anchor_text_stats

    out = anchor_text_stats(_anchor_pages_ds(sf_dir)).to_pandas()
    out["n_refs"] = out["n_refs"].astype("int64")
    out["n_anchor_texts"] = out["n_anchor_texts"].astype("int64")
    return out.sort_values("href").reset_index(drop=True)


def _q_pld_link_graph(sf_dir: str):
    """Pay-level-domain link graph: page-level links grouped to
    (src_pld, dst_pld) exact edge weights — the Common-Crawl domain
    -graph aggregation (per-batch combine, one exchange). The PLD
    reduction (last two labels, cc-SLD exceptions) runs identically in
    the SQL twin via list slicing."""
    from brinkray.textproc.webgraph import pld_link_graph

    out = pld_link_graph(_anchor_pages_ds(sf_dir)).to_pandas()
    out["n_links"] = out["n_links"].astype("int64")
    return out.sort_values(["src_pld", "dst_pld"]).reset_index(drop=True)


def _q_recrawl_latest(sf_dir: str):
    """Recrawl capture consolidation (WARC dedup): the base snapshot
    plus a deterministic half-recrawl (md5-last-nibble < 8 selection,
    warc_ts + 7 days, text suffixed) collapse to one latest capture
    per url via the exchange-bounded latest_per_key. Output proves
    which capture won (capture, n_chars)."""
    import hashlib

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import ray.data as rd

    from brinkray.pipelines import pages_from_documents
    from brinkray.textproc.webgraph import consolidate_captures

    pages = pages_from_documents(sf_dir, pages_per_doc=1.0, cap=500)
    base = pages.select(["url", "warc_ts", "text"])
    pq.write_table(base, _CAPTURE_PAGES_PATH)

    week_us = 7 * 86_400 * 1_000_000

    def expand(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        sel = pa.array(
            [int(hashlib.md5(u.encode()).hexdigest()[-1], 16) < 8 for u in urls]
        )
        b = pa.table(
            {
                "url": t["url"],
                "warc_ts": t["warc_ts"],
                "capture": pa.array([0] * len(urls), pa.int64()),
                "text": t["text"],
            }
        )
        r = t.filter(sel)
        rec = pa.table(
            {
                "url": r["url"],
                "warc_ts": pc.add(
                    r["warc_ts"], pa.scalar(week_us, pa.duration("us"))
                ),
                "capture": pa.array([1] * r.num_rows, pa.int64()),
                "text": pc.binary_join_element_wise(
                    r["text"], pa.scalar(" [recrawl]"), ""
                ),
            }
        )
        return pa.concat_tables([b, rec])

    caps = rd.from_arrow(base).repartition(8).map_batches(
        expand, batch_format="pyarrow"
    )
    out = consolidate_captures(caps).to_pandas()
    out["n_chars"] = out["text"].str.len().astype("int64")
    out["capture"] = out["capture"].astype("int64")
    out = out.rename(columns={"warc_ts": "latest_ts"})
    return (
        out[["url", "latest_ts", "capture", "n_chars"]]
        .sort_values("url")
        .reset_index(drop=True)
    )


def _q_epoch_shuffle(sf_dir: str):
    """Deterministic training-epoch shuffle: global permutation key =
    md5(doc_id || ':1'); emit the first 500 (pos, doc_id, key). Each
    batch pre-prunes to its 500 smallest keys so the final sort sees
    k rows per block, not the corpus; the 100-TB epoch shuffle
    materializes the SAME keys into md5-bucket shards (pack_shards) —
    this query pins the permutation itself against SQL."""
    import hashlib

    import pandas as pd
    import pyarrow as pa

    k = 500

    def keyed(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        keys = [hashlib.md5(f"{i}:1".encode()).hexdigest() for i in ids]
        df = pd.DataFrame({"doc_id": ids, "skey": keys})
        df = df.sort_values("skey").head(k)
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
                "skey": pa.array(df["skey"], pa.string()),
            }
        )

    out = (
        _ds(sf_dir, "documents")
        .select_columns(["doc_id"])
        .map_batches(keyed, batch_format="pyarrow")
        .sort("skey")
        .limit(k)
        .to_pandas()
    )
    out["pos"] = pd.RangeIndex(1, len(out) + 1).astype("int64")
    return out[["pos", "doc_id", "skey"]]


def _q_dedup_keep_best(sf_dir: str):
    """End-to-end near-dedup survivor corpus: exact Jaccard>=0.5 pair
    graph -> distributed connected components -> per-cluster
    keep-highest-quality representative (n_chars DESC, doc_id ASC) ->
    survivors = representatives + unclustered docs. Membership joins
    quality via the native hash join; the per-cluster argmax is
    latest_per_key (one candidate per (cluster, block)); unclustered
    docs come from the distributed anti_join — no driver-side set."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from brinkray.textproc.joins import (
        anti_join,
        cluster_pairs,
        default_join_partitions,
    )
    from brinkray.textproc.windows import latest_per_key

    clusters = cluster_pairs(_exact_jaccard_pairs(sf_dir)).materialize()
    docs = _ds(sf_dir, "documents").select_columns(["doc_id", "n_chars"])
    joined = clusters.join(
        docs,
        join_type="inner",
        num_partitions=default_join_partitions(),
        on=("doc_id",),
    )

    def negid(t: pa.Table) -> pa.Table:
        return t.append_column("neg_id", pc.negate(t["doc_id"]))

    reps = latest_per_key(
        joined.map_batches(negid, batch_format="pyarrow"),
        key="cluster",
        order_cols=["n_chars", "neg_id"],
        payload_cols=["doc_id"],
    ).select_columns(["doc_id"]).materialize()  # barrier: keep the two
    # native joins (membership join above, anti_join below) in separate
    # streaming executions — two concurrent hash-shuffle joins can
    # deadlock a small cluster's aggregator pools (NOTES round-3)
    rest = anti_join(docs, clusters, on="doc_id").select_columns(["doc_id"])
    out = reps.union(rest).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


_TEXT_PAGES_PATH = "/tmp/brinkray_text_pages.parquet"


def _q_crawl_extracted_text(sf_dir: str):
    """Driver-visible form of the north rule's per-url text invariant:
    for every 200-status page the crawl fetched, the ENGINE-extracted
    text (carried through the distributed fetch+extract stages) equals
    an independent per-page recomputation — emitted as (url, n_bytes,
    text_md5) and certified by the BFS-fixpoint oracle joining the
    dumped pages' text column (built by the same ref.text.extract_text
    the byte-identity e2e suites pin)."""
    import hashlib

    import pandas as pd
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from brinkray.pipelines import pages_from_documents

    res = _crawl_result(sf_dir)
    _dump_crawl_pages(sf_dir)
    pages = pages_from_documents(sf_dir, pages_per_doc=1.0, cap=800)
    pq.write_table(pages.select(["url", "text"]), _TEXT_PAGES_PATH)

    ev = res.events_table()
    ev = ev.filter(
        pc.and_(pc.equal(ev["cached"], False), pc.equal(ev["status"], 200))
    )
    rows = [
        (u, len(t.encode()), hashlib.md5(t.encode()).hexdigest())
        for u, t in zip(ev["url"].to_pylist(), ev["text"].to_pylist())
    ]
    df = pd.DataFrame(rows, columns=["url", "n_bytes", "text_md5"])
    df["n_bytes"] = df["n_bytes"].astype("int64")
    return df.sort_values("url").reset_index(drop=True)


def _q_crawl_cached_per_wave(sf_dir: str):
    """Per-wave dedup pressure: handler events split into first-fetch
    vs cached-replay per BFS wave — the frontier-collapse accounting a
    10^10-URL crawl watches. Twin: aggregate over the full unrolled
    FIFO event-log oracle (_crawl_events_sql)."""
    import pandas as pd

    res = _crawl_result(sf_dir)
    _dump_crawl_pages(sf_dir)
    ev = res.events_table().select(["wave", "cached"]).to_pandas()
    g = ev.groupby("wave")["cached"].agg(["count", "sum"]).reset_index()
    return pd.DataFrame(
        {
            "wave": g["wave"].astype("int64"),
            "n_events": g["count"].astype("int64"),
            "n_cached": g["sum"].astype("int64"),
        }
    )


def _q_crawl_multi_seed(sf_dir: str):
    """Multi-seed crawl (S5) under a driver oracle: two seeds, depth
    capped at 3 waves, final seen set = the union of both seeds'
    3-level BFS neighborhoods — re-derived in SQL by unrolling the
    level-limited fixpoint from both seeds over the same dumped
    pages."""
    import pandas as pd
    import pyarrow.parquet as pq

    from brinkray.engine.crawl import EngineOptions
    from brinkray.pipelines import pages_from_documents, run_crawl

    pages = pages_from_documents(sf_dir, pages_per_doc=1.0, cap=800)
    pq.write_table(pages.select(["url", "html"]), _CRAWL_PAGES_PATH)
    res = run_crawl(
        pages,
        options=EngineOptions(seen_shards=2, max_waves=3),
        seeds=["https://site-a.test", "https://site-b.test/p/2"],
    )
    items = sorted(res.seen.items())
    return pd.DataFrame(
        {
            "url": [u for u, _ in items],
            "status": pd.Series([s for _, s in items], dtype="int64"),
        }
    )


def _q_url_variant_counts(sf_dir: str):
    """URL canonicalization audit: how many RAW absolutized href
    variants collapse onto each canonical frontier key (the seen-set
    key of urls.go:111-155) — the dedup pressure the normalizer
    creates (session params, param-order variants, valueless params).
    Extraction = the engine's own link-extract stage over the dumped
    pages; canonicalization = ref.urls.normalize_parts (the ported
    normalizer); the twin re-derives both with the oracle-pinned CASE
    + param-sort SQL from the crawl CTE."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data as rd

    from brinkray.engine.stages import make_extract_links_fn
    from brinkray.fixtures.sitegen import site_config
    from brinkray.pipelines import pages_from_documents
    from brinkray.ref.urls import normalize_parts

    pages = pages_from_documents(sf_dir, pages_per_doc=1.0, cap=500)
    pq.write_table(pages.select(["url", "html"]), _EXTRACT_PAGES_PATH)
    src = pa.table(
        {
            "href": pages["url"],
            "linked_from": pages["url"],
            "target": pa.array([""] * pages.num_rows, pa.string()),
            "order_key": pa.array(
                [f"{i:06d}" for i in range(pages.num_rows)], pa.string()
            ),
            "wave": pa.array([0] * pages.num_rows, pa.int32()),
            "body": pages["html"],
        }
    )
    links = (
        rd.from_arrow(src)
        .repartition(8)
        .map_batches(make_extract_links_fn(), batch_format="pyarrow")
    )
    ignored = frozenset(site_config().ignored_get_params)

    def canonize(t: pa.Table) -> pa.Table:
        canons, raws = [], []
        for h in t["href"].to_pylist():
            try:
                canon, _scheme, host, _path = normalize_parts(h, ignored)
            except Exception:
                continue  # bare relative => dies at normalize (brink.go:76-81)
            if not host:
                continue  # the https://// quirk: empty host, dropped
            canons.append(canon)
            raws.append(h)
        part = (
            pd.DataFrame({"canon": canons, "raw": raws})
            .groupby(["canon", "raw"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.table(
            {
                "canon": pa.array(part["canon"], pa.string()),
                "raw": pa.array(part["raw"], pa.string()),
                "n": pa.array(part["n"], pa.int64()),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "url": [g["canon"].iloc[0]],
                "n_variants": [g["raw"].nunique()],
                "n_refs": [int(g["n"].sum())],
            }
        )

    out = (
        links.map_batches(canonize, batch_format="pyarrow")
        .groupby("canon")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    out["n_variants"] = out["n_variants"].astype("int64")
    out["n_refs"] = out["n_refs"].astype("int64")
    return out.sort_values("url").reset_index(drop=True)


def _q_host_freshness(sf_dir: str):
    """Per-host capture freshness over the Common-Crawl-shaped pages
    table: page count and newest/oldest warc_ts (as int64 epoch-us so
    the aggregate is exactly hashable) — the recrawl-scheduling signal
    a 10^10-URL frontier prioritizes by. Per-batch combine, one
    exchange over <= hosts x blocks partial rows."""
    import re

    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import ray.data as rd

    from brinkray.pipelines import pages_from_documents

    pages = pages_from_documents(sf_dir, pages_per_doc=1.0, cap=500)
    pq.write_table(
        pages.select(["url", "warc_ts", "text"]), _CAPTURE_PAGES_PATH
    )
    host_re = re.compile(r"^https?://([^/]+)")

    def partial(t: pa.Table) -> pa.Table:
        hosts = [
            (host_re.match(u).group(1) if host_re.match(u) else "")
            for u in t["url"].to_pylist()
        ]
        us = pc.cast(t["warc_ts"], pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"host": hosts, "us": us})
        part = df.groupby("host", sort=False)["us"].agg(
            ["count", "min", "max"]
        ).reset_index()
        return pa.table(
            {
                "host": pa.array(part["host"], pa.string()),
                "n": pa.array(part["count"], pa.int64()),
                "lo": pa.array(part["min"], pa.int64()),
                "hi": pa.array(part["max"], pa.int64()),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "host": [g["host"].iloc[0]],
                "n_pages": [int(g["n"].sum())],
                "oldest_us": [int(g["lo"].min())],
                "newest_us": [int(g["hi"].max())],
            }
        )

    out = (
        rd.from_arrow(pages.select(["url", "warc_ts"]))
        .repartition(8)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("host")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    for c in ("n_pages", "oldest_us", "newest_us"):
        out[c] = out[c].astype("int64")
    return out.sort_values("host").reset_index(drop=True)


def _q_scd2_history(sf_dir: str):
    """SCD-type-2 dimension build from the event stream: each user's
    ordered events become validity intervals [valid_from, valid_to)
    with valid_to = next event's ts (sentinel 2100-01-01 for the open
    row) — the warehouse temporal-table operator. One groupby(user)
    exchange; the per-user body is a vectorized sort + shift."""
    import pandas as pd

    sentinel = pd.Timestamp("2100-01-01")

    def build(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        out = pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(),
                "event_type": g["event_type"].to_numpy(),
                "valid_from": g["ts"].to_numpy(),
                "valid_to": g["ts"].shift(-1).fillna(sentinel).to_numpy(),
            }
        )
        return out

    out = (
        _ds(sf_dir, "events")
        .select_columns(["user_id", "event_id", "ts", "event_type"])
        .groupby("user_id")
        .map_groups(build, batch_format="pandas")
        .to_pandas()
    )
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values(
        ["user_id", "valid_from", "event_type"]
    ).reset_index(drop=True)


def _q_per_source_quota(sf_dir: str):
    """Per-domain document quota (the C4-style balance cap): keep at
    most 50 docs per source, selected by the deterministic md5(doc_id)
    order — reuses the curation top_k_per_group primitive (per-batch
    local top-k, <= k rows per (group, block) reach the exchange)."""
    import hashlib

    import pyarrow as pa

    from brinkray.textproc.curation import top_k_per_group

    def keyed(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "source": t["source"],
                "skey": pa.array(
                    [hashlib.md5(str(i).encode()).hexdigest() for i in ids],
                    pa.string(),
                ),
            }
        )

    ds = (
        _ds(sf_dir, "documents")
        .select_columns(["doc_id", "source"])
        .map_batches(keyed, batch_format="pyarrow")
    )
    out = top_k_per_group(
        ds, by="source", score_col="skey", k=50, id_col="doc_id",
        descending=False,
    ).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return (
        out[["source", "doc_id"]]
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )


def _q_salted_event_revenue(sf_dir: str):
    """Skew-defeating salted hash join under oracle: the events stream
    (5 extremely hot event_type keys — the worst-case skew shape)
    joins a small per-type dim through joins.salted_join (big side
    salted, small side replicated per salt, composite-key exchange —
    a hot key occupies `salts` partitions instead of one straggler),
    then exact fixed-point weighted sums. Result provably equals the
    unsalted join — the twin is the plain SQL join."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from brinkray.textproc.joins import salted_join

    ev = _ds(sf_dir, "events").select_columns(["event_type", "value"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "cents": pc.cast(
                    pc.floor(pc.multiply(t["value"], 100.0)), pa.int64()
                ),
            }
        )

    e = ev.map_batches(cents, batch_format="pyarrow")
    dim = (
        ev.select_columns(["event_type"])
        .groupby("event_type")
        .count()
        .map_batches(
            lambda t: pa.table(
                {
                    "event_type": t["event_type"],
                    "mult": pc.cast(
                        pc.utf8_length(t["event_type"]), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )
    joined = salted_join(e, dim, on="event_type")

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_pylist(),
                "w": pc.multiply(t["cents"], t["mult"]).to_numpy(
                    zero_copy_only=False
                ),
            }
        )
        part = df.groupby("event_type", sort=False)["w"].agg(
            ["sum", "count"]
        ).reset_index()
        return pa.table(
            {
                "event_type": pa.array(part["event_type"], pa.string()),
                "s": pa.array(part["sum"], pa.int64()),
                "c": pa.array(part["count"], pa.int64()),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "weighted_cents": [int(g["s"].sum())],
                "n": [int(g["c"].sum())],
            }
        )

    out = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    out["weighted_cents"] = out["weighted_cents"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def _q_pushdown_filtered_read(sf_dir: str):
    """Prune at the READ: the lang='en' row filter is pushed into the
    parquet scan (pyarrow dataset expression — row groups whose lang
    statistics exclude 'en' never leave storage) and only the two
    needed columns are projected; the filter column itself is not even
    read into the Dataset. The first rule of 100-TB pipelines, as an
    oracle-certified operator."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.dataset as pads

    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["source", "n_chars"],
        filter=(pads.field("lang") == "en"),
    )

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "source": t["source"].to_pylist(),
                "n_chars": t["n_chars"].to_numpy(zero_copy_only=False),
            }
        )
        part = df.groupby("source", sort=False)["n_chars"].agg(
            ["count", "sum"]
        ).reset_index()
        return pa.table(
            {
                "source": pa.array(part["source"], pa.string()),
                "c": pa.array(part["count"], pa.int64()),
                "s": pa.array(part["sum"], pa.int64()),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "source": [g["source"].iloc[0]],
                "n_docs": [int(g["c"].sum())],
                "total_chars": [int(g["s"].sum())],
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    out["total_chars"] = out["total_chars"].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


def _q_crawl_refresh_seen(sf_dir: str):
    """Recrawl/refresh under oracle: crawl, EXPIRE an md5-selected half
    of the seen urls (CrawlEngine.expire_urls — the freshness-driven
    re-crawl primitive), then re-run the SAME engine seeding exactly
    the expired urls. The refreshed state must land back on the
    original BFS fixpoint — the twin is crawl_seen_set's oracle
    verbatim. A fresh engine is used (never the memoized shared crawl,
    whose state other queries read)."""
    import hashlib

    import pandas as pd

    from brinkray.engine.crawl import CrawlEngine, EngineOptions
    from brinkray.fixtures import site_config
    from brinkray.pipelines import pages_from_documents

    pages = pages_from_documents(sf_dir, pages_per_doc=1.0, cap=800)
    _dump_crawl_pages(sf_dir)
    eng = CrawlEngine(site_config(), EngineOptions(seen_shards=2))
    eng.set_pages(pages)
    eng.run()
    stale = [
        u
        for u in eng.seen.all_items()
        if int(hashlib.md5(u.encode()).hexdigest()[-1], 16) < 8
    ]
    assert eng.expire_urls(stale) == len(stale)
    eng.run(seeds=stale)
    items = sorted(eng.seen.all_items().items())
    return pd.DataFrame(
        {
            "url": [u for u, _ in items],
            "status": pd.Series([s for _, s in items], dtype="int64"),
        }
    )


def _reval_outcomes(sf_dir: str) -> dict[str, bool]:
    """Shared revalidation pass (memoized like _crawl_result): crawl
    with track_body_hashes on, SOFT-expire the md5-last-hex-digit<8
    half of the seen urls, mutate the md5-first-hex-digit<8 page
    subset (9 appended comment bytes, skipped when that would cross
    the 8192 content gate), refresh, and return the engine's per-url
    classification (canon -> modified?) from the genuine stored-vs-
    refetched body-md5 comparison."""
    key = ("reval", sf_dir)
    if key in _memo:
        return _memo[key]
    import hashlib

    import pyarrow as pa

    from brinkray.engine.crawl import CrawlEngine, EngineOptions
    from brinkray.fixtures import site_config
    from brinkray.pipelines import pages_from_documents

    pages = pages_from_documents(sf_dir, pages_per_doc=1.0, cap=800)
    _dump_crawl_pages(sf_dir)  # the twin reads the ORIGINAL pages
    eng = CrawlEngine(
        site_config(), EngineOptions(seen_shards=2, track_body_hashes=True)
    )
    eng.set_pages(pages)
    eng.run()
    stale = [
        u
        for u in sorted(eng.seen.all_items())
        if int(hashlib.md5(u.encode()).hexdigest()[-1], 16) < 8
    ]
    assert eng.expire_urls(stale, keep_body=True) == len(stale)

    urls = pages["url"].to_pylist()
    htmls = pages["html"].to_pylist()
    for i, (u, h) in enumerate(zip(urls, htmls)):
        if (
            int(hashlib.md5(u.encode()).hexdigest()[0], 16) < 8
            and len(h) + 9 <= 8192
        ):
            htmls[i] = h + b"<!--v2-->"
    mutated = pages.set_column(
        pages.schema.get_field_index("html"), "html",
        pa.array(htmls, pages["html"].type),
    )
    eng.set_pages(mutated)
    eng.run(seeds=stale)
    items = eng.reval_items()
    assert len(items) == len(stale)
    _memo[key] = items
    return items


def _q_crawl_revalidation(sf_dir: str):
    """Conditional-GET revalidation under oracle (see _reval_outcomes):
    the engine classifies each soft-expired url's re-fetch revalidated
    (the 304-Not-Modified outcome an If-None-Match request would get)
    vs modified by comparing stored vs refetched body md5. The twin
    re-derives both md5 predicates over the ORIGINAL page dump + the
    BFS fixpoint, certifying the hash comparison per url. 404 urls (no
    page) have empty bodies both runs => revalidated, mirrored by the
    twin's LEFT JOIN."""
    import pandas as pd

    items = sorted(_reval_outcomes(sf_dir).items())
    return pd.DataFrame(
        {
            "url": [u for u, _ in items],
            "outcome": ["modified" if m else "revalidated" for _, m in items],
        }
    )


def _q_refresh_change_rates(sf_dir: str):
    """Per-host content change rates from the revalidation pass — the
    input of a Cho/Garcia-Molina-style refresh scheduler (hosts with
    higher modified fractions earn shorter revisit intervals). One
    host-projection regex + groupby over the classified outcomes; the
    twin aggregates the same CASE over the fixpoint."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    items = sorted(_reval_outcomes(sf_dir).items())
    t = pa.table(
        {
            "url": pa.array([u for u, _ in items], pa.string()),
            "mod": pa.array([int(m) for _, m in items], pa.int64()),
        }
    )

    def add_host(tb: pa.Table) -> pa.Table:
        m = pc.extract_regex(tb["url"], r"^(?P<h>https?://[^/?#]+)")
        return pa.table(
            {"host": pc.struct_field(m, "h"), "mod": tb["mod"]}
        )

    out = (
        rd.from_arrow(t)
        .map_batches(add_host, batch_format="pyarrow")
        .groupby("host")
        .aggregate(
            Count(alias_name="n_checked"),
            Sum("mod", alias_name="n_modified"),
        )
        .to_pandas()
    )
    out["n_checked"] = out["n_checked"].astype("int64")
    out["n_modified"] = out["n_modified"].astype("int64")
    return out.sort_values("host").reset_index(drop=True)


def _q_negative_samples(sf_dir: str):
    """Deterministic contrastive negative sampling: docs are placed on
    the md5 ring (exact distributed row_number via range_rank over the
    md5_number_lower-compatible uint64 key), and each doc draws k=3
    negatives at fixed ring offsets (rank + off) mod n — one
    rank-arithmetic hash join, no randomness, repartition-stable.
    The hash ring makes the negatives corpus-position-independent (the
    property random negatives approximate)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from brinkray.textproc.hashing import md5_lower64
    from brinkray.textproc.joins import default_join_partitions
    from brinkray.textproc.relagg import range_rank

    docs = _ds(sf_dir, "documents").select_columns(["doc_id"])
    n = docs.count()  # parquet metadata, no scan
    offsets = [(1, 1), (2, 7), (3, 42)]

    def keyed(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "h": pa.array(
                    [md5_lower64(str(i)) for i in ids], pa.uint64()
                ),
            }
        )

    ranked = range_rank(
        docs.map_batches(keyed, batch_format="pyarrow"),
        key_col="h",
        id_col="doc_id",
    ).materialize()

    def explode(t: pa.Table) -> pa.Table:
        import numpy as np

        rk = t["rank"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        outs = []
        for slot, off in offsets:
            outs.append(
                pa.table(
                    {
                        "doc_id": pa.array(ids, pa.int64()),
                        "slot": pa.array(
                            np.full(len(ids), slot, dtype=np.int64)
                        ),
                        "nrk": pa.array((rk + off) % n, pa.int64()),
                    }
                )
            )
        return pa.concat_tables(outs)

    def as_neg(t: pa.Table) -> pa.Table:
        return pa.table(
            {"neg_id": t["doc_id"], "nrk": pc.cast(t["rank"], pa.int64())}
        )

    pairs = ranked.map_batches(explode, batch_format="pyarrow").join(
        ranked.map_batches(as_neg, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=default_join_partitions(),
        on=("nrk",),
    )
    out = pairs.select_columns(["doc_id", "slot", "neg_id"]).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values(["doc_id", "slot"]).reset_index(drop=True)


# --------------------------------------------------------------------------
# TPC-H-shaped relational suite (brinkray/textproc/tpch.py) — classic query
# shapes adapted to the reduced schema (no partsupp / commit dates)
# --------------------------------------------------------------------------


def _q_unshipped_order_revenue(sf_dir: str):
    from brinkray.textproc.tpch import top_unshipped_orders

    return top_unshipped_orders(_ds(sf_dir, "lineitem"), _ds(sf_dir, "orders"))


def _q_forecast_revenue_delta(sf_dir: str):
    from brinkray.textproc.tpch import forecast_revenue_delta

    return forecast_revenue_delta(_ds(sf_dir, "lineitem"))


def _q_nation_trade_volumes(sf_dir: str):
    from brinkray.textproc.tpch import nation_trade_volumes

    return nation_trade_volumes(
        _ds(sf_dir, "lineitem"), _ds(sf_dir, "orders"),
        _ds(sf_dir, "customer"), _ds(sf_dir, "supplier"),
        _ds(sf_dir, "nation"), "NATION_3", "NATION_7",
    )


def _q_market_share_yearly(sf_dir: str):
    from brinkray.textproc.tpch import market_share_yearly

    return market_share_yearly(
        _ds(sf_dir, "lineitem"), _ds(sf_dir, "orders"),
        _ds(sf_dir, "customer"), _ds(sf_dir, "supplier"),
        _ds(sf_dir, "nation"), _ds(sf_dir, "region"),
        "NATION_3", "EUROPE",
    )


def _q_profit_by_nation_year(sf_dir: str):
    from brinkray.textproc.tpch import profit_by_nation_year

    return profit_by_nation_year(
        _ds(sf_dir, "lineitem"), _ds(sf_dir, "part"),
        _ds(sf_dir, "supplier"), _ds(sf_dir, "nation"),
    )


def _q_important_parts(sf_dir: str):
    from brinkray.textproc.tpch import important_parts

    return important_parts(_ds(sf_dir, "lineitem"))


def _q_returnflag_priority_counts(sf_dir: str):
    from brinkray.textproc.tpch import returnflag_priority_counts

    return returnflag_priority_counts(
        _ds(sf_dir, "lineitem"), _ds(sf_dir, "orders")
    )


def _q_promo_revenue_share(sf_dir: str):
    from brinkray.textproc.tpch import promo_revenue_share

    return promo_revenue_share(_ds(sf_dir, "lineitem"), _ds(sf_dir, "part"))


def _q_top_supplier_revenue(sf_dir: str):
    from brinkray.textproc.tpch import top_supplier_revenue

    return top_supplier_revenue(_ds(sf_dir, "lineitem"), _ds(sf_dir, "supplier"))


def _q_large_volume_customers(sf_dir: str):
    from brinkray.textproc.tpch import large_volume_customers

    return large_volume_customers(
        _ds(sf_dir, "lineitem"), _ds(sf_dir, "orders"), _ds(sf_dir, "customer")
    )


def _q_disjunctive_brand_revenue(sf_dir: str):
    from brinkray.textproc.tpch import disjunctive_brand_revenue

    return disjunctive_brand_revenue(_ds(sf_dir, "lineitem"), _ds(sf_dir, "part"))


def _q_dominant_part_suppliers(sf_dir: str):
    from brinkray.textproc.tpch import dominant_part_suppliers

    return dominant_part_suppliers(
        _ds(sf_dir, "lineitem"), _ds(sf_dir, "supplier")
    )


def _q_waiting_order_suppliers(sf_dir: str):
    from brinkray.textproc.tpch import waiting_order_suppliers

    return waiting_order_suppliers(
        _ds(sf_dir, "lineitem"), _ds(sf_dir, "supplier")
    )


def _q_returned_item_customers(sf_dir: str):
    from brinkray.textproc.tpch import returned_item_customers

    return returned_item_customers(
        _ds(sf_dir, "lineitem"), _ds(sf_dir, "orders"),
        _ds(sf_dir, "customer"), _ds(sf_dir, "nation"),
    )


def _q_min_cost_supplier_per_part(sf_dir: str):
    from brinkray.textproc.tpch import min_cost_supplier_per_part

    return min_cost_supplier_per_part(
        _ds(sf_dir, "lineitem"), _ds(sf_dir, "part"), _ds(sf_dir, "supplier")
    )


def _q_late_order_priority_counts(sf_dir: str):
    from brinkray.textproc.tpch import late_order_priority_counts

    return late_order_priority_counts(
        _ds(sf_dir, "lineitem"), _ds(sf_dir, "orders")
    )


def _q_local_supplier_volume(sf_dir: str):
    from brinkray.textproc.tpch import local_supplier_volume

    return local_supplier_volume(
        _ds(sf_dir, "lineitem"), _ds(sf_dir, "orders"),
        _ds(sf_dir, "customer"), _ds(sf_dir, "supplier"),
        _ds(sf_dir, "nation"), _ds(sf_dir, "region"),
    )


def _q_customer_order_distribution(sf_dir: str):
    from brinkray.textproc.tpch import customer_order_distribution

    return customer_order_distribution(
        _ds(sf_dir, "orders"), _ds(sf_dir, "customer")
    )


def _q_doc_similarity_tfidf(sf_dir: str):
    from brinkray.textproc.curation import doc_similarity_tfidf

    return doc_similarity_tfidf(
        _ds(sf_dir, "documents").select_columns(["doc_id", "text"])
    ).to_pandas()


def _q_cdc_chunk_dedup(sf_dir: str):
    from brinkray.textproc.dedup import cdc_chunk_dedup

    out = cdc_chunk_dedup(
        _ds(sf_dir, "documents").select_columns(["doc_id", "text"])
    ).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_bpe_merge_candidates(sf_dir: str):
    from brinkray.textproc.curation import bpe_merge_candidates

    return bpe_merge_candidates(
        _ds(sf_dir, "documents").select_columns(["text"])
    )


def _q_mixture_weights(sf_dir: str):
    from brinkray.textproc.curation import mixture_weights

    return mixture_weights(
        _ds(sf_dir, "documents").select_columns(["source", "text"])
    )


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # crawl-operator analogues over the shared testdata views
        "distinct_users_per_event_type": _q_distinct_users,
        "status_routing_counts": _q_status_routing,
        "substring_detector": _q_substring_detector,
        "per_source_budget": _q_per_source_budget,
        "frontier_ordering": _q_frontier_ordering,
        "normalize_projection": _q_normalize_projection,
        "fetch_join": _q_fetch_join,
        # training-data operators
        "dedup_exact": _q_dedup_exact,
        "dup_ngram_spans": _q_dup_ngram_spans,
        "quality_model_scores": _q_quality_model_scores,
        "token_counts": _q_token_counts,
        "quality_basic": _q_quality_basic,
        "quality_signals": _q_quality_signals,
        "lang_id_counts": _q_lang_id,
        "doc_fingerprints": _q_fingerprints,
        "dedup_minhash_lsh": _q_dedup_minhash,
        "dedup_simhash": _q_dedup_simhash,
        "dedup_ngram_jaccard": _q_dedup_ngram,
        "ngram_jaccard_exact": _q_ngram_exact,
        "dedup_containment": _q_dedup_containment,
        "winnowing_fingerprints": _q_winnowing,
        "token_budget_sample": _q_token_budget_sample,
        "embedding_dups": _q_embedding_dups,
        "ann_cosine_topk": _q_ann_topk,
        "ann_filtered_topk": _q_ann_filtered_topk,
        "ann_ivf_topk": _q_ann_ivf,
        "ann_ivf_exhaustive": _q_ann_ivf_exhaustive,
        "ann_ivf_persisted": _q_ann_ivf_persisted,
        "ann_ivf_multi_persisted": _q_ann_ivf_multi_persisted,
        "deterministic_sample": _q_deterministic_sample,
        # end-to-end curation (dedup x quality x lang -> corpus filter)
        "corpus_curation": _q_corpus_curation,
        # curation family (all SQL-twinned): exact embedding pairs,
        # benchmark decontamination, repetition signals, stratified
        # sampling, corpus-wide heavy hitters, exact components
        "embedding_dups_exact": _q_embedding_dups_exact,
        "embedding_dedup_survivors": _q_embedding_dedup_survivors,
        "embedding_decontamination": _q_embedding_decontamination,
        "decontamination": _q_decontamination,
        "repetition_signals": _q_repetition_signals,
        "stratified_sample_lang": _q_stratified_sample,
        "top_docs_per_lang": _q_top_docs_per_lang,
        "tf_df_scores": _q_tf_df_scores,
        "heavy_hitters": _q_heavy_hitters,
        "pack_shards": _q_pack_shards,
        "export_manifest": _q_export_manifest,
        "dedup_incremental": _q_dedup_incremental,
        "jsonl_roundtrip": _q_jsonl_roundtrip,
        "csv_roundtrip": _q_csv_roundtrip,
        "revenue_by_priority_nation": _q_revenue_by_priority_nation,
        "label_centroids": _q_label_centroids,
        "doc_token_quartiles": _q_doc_token_quartiles,
        "order_global_ranks": _q_order_global_ranks,
        "order_price_ntile": _q_order_price_ntile,
        "click_purchase_same_day": _q_click_purchase_same_day,
        "click_no_purchase_days": _q_click_no_purchase_days,
        "funnel_attribution": _q_funnel_attribution,
        "biggest_order_per_customer": _q_biggest_order_per_customer,
        "top_tokens_per_lang": _q_top_tokens_per_lang,
        "props_k_stats": _q_props_k_stats,
        "hll_users_per_event_type": _q_hll_users_per_event_type,
        "ngram_novelty": _q_ngram_novelty,
        "ngram_novelty_shuffled": _q_ngram_novelty_shuffled,
        # web-corpus cleaning (paragraph dedup / PII / exact percentiles)
        "paragraph_dedup": _q_paragraph_dedup,
        "paragraph_dedup_shuffled": _q_paragraph_dedup_shuffled,
        "pii_scrub": _q_pii_scrub,
        "token_length_percentiles": _q_token_length_percentiles,
        "customers_without_orders": _q_customers_without_orders,
        "market_basket_pairs": _q_market_basket_pairs,
        "part_supplier_counts": _q_part_supplier_counts,
        "rich_inactive_customers": _q_rich_inactive_customers,
        "dataset_split": _q_dataset_split,
        "sentence_stats": _q_sentence_stats,
        "longest_streaks": _q_longest_streaks,
        "snapshot_diff": _q_snapshot_diff,
        "basket_triangles": _q_basket_triangles,
        "clustering_coefficients": _q_clustering_coefficients,
        "small_quantity_revenue": _q_small_quantity_revenue,
        "time_to_first_purchase": _q_time_to_first_purchase,
        "cdc_apply": _q_cdc_apply,
        "graph_distances": _q_graph_distances,
        "funnel_steps": _q_funnel_steps,
        "events_profile": _q_events_profile,
        "text_roundtrip": _q_text_roundtrip,
        "lang_confusion": _q_lang_confusion,
        "filter_funnel": _q_filter_funnel,
        "weighted_sample_orders": _q_weighted_sample_orders,
        "repeat_orders_week": _q_repeat_orders_week,
        "revenue_gini": _q_revenue_gini,
        "late_events": _q_late_events,
        "session_conversion": _q_session_conversion,
        "imputed_values": _q_imputed_values,
        "next_order_after_event": _q_next_order_after_event,
        "revenue_by_balance_decile": _q_revenue_by_balance_decile,
        "loo_target_encoding": _q_loo_target_encoding,
        "score_calibration": _q_score_calibration,
        "lang_id_prf": _q_lang_id_prf,
        "top_entry_paths": _q_top_entry_paths,
        "incremental_daily_counts": _q_incremental_daily_counts,
        "pareto_customers": _q_pareto_customers,
        "grouped_token_quantiles": _q_grouped_token_quantiles,
        "distinct_tokens_exact": _q_distinct_tokens_exact,
        "hll_distinct_tokens": _q_hll_distinct_tokens,
        "cms_heavy_hitter_counts": _q_cms_heavy_hitter_counts,
        "kmeans_clusters": _q_kmeans_clusters,
        "totalprice_quantiles": _q_totalprice_quantiles,
        "cluster_components_exact": _q_cluster_components_exact,
        # multimodal decode (actor-pool stage, real BMP/WAV/video codecs)
        "media_features": _q_media_features,
        # streaming-shaped + join operators
        "windowed_event_counts": _q_windowed_counts,
        "windowed_event_sums": _q_windowed_sums,
        "hopping_window_counts": _q_hopping_counts,
        "event_sessions": _q_event_sessions,
        "running_totals": _q_running_totals,
        "event_type_pivot": _q_event_type_pivot,
        "user_event_histories": _q_user_event_histories,
        "event_deltas": _q_event_deltas,
        "rolling_order_sums": _q_rolling_order_sums,
        "latest_event_per_user": _q_latest_event_per_user,
        "suppliers_with_returns": _q_suppliers_with_returns,
        "pricing_summary": _q_pricing_summary,
        "lang_source_rollup": _q_lang_source_rollup,
        "lang_source_cube": _q_lang_source_cube,
        "totalprice_histogram": _q_totalprice_histogram,
        "user_activity_histogram": _q_user_activity_histogram,
        "qty_price_corr_stats": _q_qty_price_corr_stats,
        "daily_counts_gapfill": _q_daily_counts_gapfill,
        "inverted_index": _q_inverted_index,
        "postings_varint_bytes": _q_postings_varint_bytes,
        "vocab_growth": _q_vocab_growth,
        "unigram_surprisal": _q_unigram_surprisal,
        "phrase_search": _q_phrase_search,
        "phrase_search_indexed": _q_phrase_search_indexed,
        "script_ratios": _q_script_ratios,
        "proportional_sample": _q_proportional_sample,
        "embedding_top_component": _q_embedding_top_component,
        "warcish_roundtrip": _q_warcish_roundtrip,
        "customer_order_totals": _q_customer_order_totals,
        "lang_share": _q_lang_share,
        "orders_by_dow": _q_orders_by_dow,
        "event_transitions": _q_event_transitions,
        "user_days_active": _q_user_days_active,
        "user_click_purchase_counts": _q_user_click_purchase_counts,
        "daily_active_users": _q_daily_active_users,
        "region_nation_cross": _q_region_nation_cross,
        "long_doc_outliers": _q_long_doc_outliers,
        "orders_above_customer_avg": _q_orders_above_customer_avg,
        "top_orders_global": _q_top_orders_global,
        "partition_pruned_read": _q_partition_pruned_read,
        "event_value_pivot": _q_event_value_pivot,
        "trailing_hour_sums": _q_trailing_hour_sums,
        "sampled_price_quantiles": _q_sampled_price_quantiles,
        "adjacent_edit_distance": _q_adjacent_edit_distance,
        "debounced_events": _q_debounced_events,
        "lang_sampled_chars_quantiles": _q_lang_sampled_chars_quantiles,
        "session_size_histogram": _q_session_size_histogram,
        "event_pivot_roundtrip": _q_event_pivot_roundtrip,
        "monthly_order_growth": _q_monthly_order_growth,
        "embedding_norm_histogram": _q_embedding_norm_histogram,
        "last_events_per_user": _q_last_events_per_user,
        "buyer_counts": _q_buyer_counts,
        "price_equidepth_bins": _q_price_equidepth_bins,
        "trailing_wau": _q_trailing_wau,
        "retention_cohorts": _q_retention_cohorts,
        "anomalous_days": _q_anomalous_days,
        "top_bigrams": _q_top_bigrams,
        "doc_chunks": _q_doc_chunks,
        "asof_join_events_orders": _q_asof_join,
        "interval_join_events_orders": _q_interval_join,
        "revenue_by_nation": _q_revenue_by_nation,
        "dedup_clusters": _q_dedup_clusters,
        # the crawl engine itself (non-SQL-expressible: stateful wave loop)
        "crawl_seen_set": _q_crawl_seen,
        "crawl_url_features": _q_crawl_url_features,
        "crawl_events": _q_crawl_events,
        "crawl_events_sink": _q_crawl_events_sink,
        "crawl_host_stats": _q_crawl_host_stats,
        "crawl_extract_links": _q_crawl_extract_links,
        "link_pagerank": _q_link_pagerank,
        "graph_random_walks": _q_graph_random_walks,
        "link_hits": _q_link_hits,
        "crawl_wave_sizes": _q_crawl_wave_sizes,
        "crawl_robots_seen": _q_crawl_robots_seen,
        "user_event_sequences": _q_user_event_sequences,
        "click_minus_purchase_bag": _q_click_minus_purchase_bag,
        "bigram_pmi": _q_bigram_pmi,
        "dup_span_scrub": _q_dup_span_scrub,
        "sequence_packing": _q_sequence_packing,
        "gopher_quality": _q_gopher_quality,
        "dsir_weights": _q_dsir_weights,
        "dedup_clusters_exact": _q_dedup_clusters_exact,
        "ann_multi_topk": _q_ann_multi_topk,
        "link_degree_histogram": _q_link_degree_histogram,
        # web-graph / corpus-construction family (round 4)
        "anchor_text_index": _q_anchor_text_index,
        "pld_link_graph": _q_pld_link_graph,
        "recrawl_latest_capture": _q_recrawl_latest,
        "epoch_shuffle": _q_epoch_shuffle,
        "dedup_keep_best": _q_dedup_keep_best,
        "url_variant_counts": _q_url_variant_counts,
        "host_freshness": _q_host_freshness,
        "scd2_history": _q_scd2_history,
        "per_source_quota": _q_per_source_quota,
        "crawl_extracted_text": _q_crawl_extracted_text,
        "crawl_cached_per_wave": _q_crawl_cached_per_wave,
        "crawl_multi_seed": _q_crawl_multi_seed,
        "salted_event_revenue": _q_salted_event_revenue,
        "pushdown_filtered_read": _q_pushdown_filtered_read,
        "negative_samples": _q_negative_samples,
        "crawl_refresh_seen": _q_crawl_refresh_seen,
        "sitemap_extract": _q_sitemap_extract,
        "crawl_revalidation": _q_crawl_revalidation,
        "refresh_change_rates": _q_refresh_change_rates,
        # TPC-H-shaped relational suite (reduced schema)
        "unshipped_order_revenue": _q_unshipped_order_revenue,
        "forecast_revenue_delta": _q_forecast_revenue_delta,
        "nation_trade_volumes": _q_nation_trade_volumes,
        "market_share_yearly": _q_market_share_yearly,
        "profit_by_nation_year": _q_profit_by_nation_year,
        "important_parts": _q_important_parts,
        "returnflag_priority_counts": _q_returnflag_priority_counts,
        "promo_revenue_share": _q_promo_revenue_share,
        "top_supplier_revenue": _q_top_supplier_revenue,
        "large_volume_customers": _q_large_volume_customers,
        "disjunctive_brand_revenue": _q_disjunctive_brand_revenue,
        "dominant_part_suppliers": _q_dominant_part_suppliers,
        "waiting_order_suppliers": _q_waiting_order_suppliers,
        "returned_item_customers": _q_returned_item_customers,
        "min_cost_supplier_per_part": _q_min_cost_supplier_per_part,
        "late_order_priority_counts": _q_late_order_priority_counts,
        "local_supplier_volume": _q_local_supplier_volume,
        "customer_order_distribution": _q_customer_order_distribution,
        "doc_similarity_tfidf": _q_doc_similarity_tfidf,
        "bpe_merge_candidates": _q_bpe_merge_candidates,
        "mixture_weights": _q_mixture_weights,
        "recrawl_priority": _q_recrawl_priority,
        "cdc_chunk_dedup": _q_cdc_chunk_dedup,
    }


# lineitem revenue in exact int64 centi-cents (matches tpch._rev_cc):
# both ROUND()s are exact for the 2-decimal synthetic inputs.
_REV_CC_SQL = (
    "CAST(ROUND(l.l_extendedprice*100) AS BIGINT) "
    "* (100 - CAST(ROUND(l.l_discount*100) AS BIGINT))"
)


def _sql_set(lang: str) -> str:
    """Render a stopword profile as a SQL IN-list (single source of
    truth: the same STOPWORDS the Ray operators use)."""
    from brinkray.textproc.quality import STOPWORDS

    return ", ".join(f"'{w}'" for w in sorted(STOPWORDS[lang]))


# Shared CTE prelude for the crawl-loop oracles: pages -> sandbox-web
# index (ref/world.py conventions) -> expansion-eligible parents
# (status 200, path not forbidden, not oversized; stages.py:145-160) ->
# RE2 link re-extraction + absolutize (urls.go:47-67 quirk order) ->
# per-corpus canon (strip ignored GET params, sort the rest,
# urls.go:129-152) -> fetch-admissible edges (allowed domain, no
# transport error, content-length gate; ref/world.py gate order) ->
# recursive BFS fixpoint from the seed. Valid because seen membership
# and event counts are order-independent (crawl.py wave anatomy).
_CRAWL_CTE_TEMPLATE = """
WITH RECURSIVE
pages AS (SELECT url, decode(html) AS html, octet_length(html) AS blen
          FROM read_parquet('{path}')),
idx AS (SELECT url AS canon,
        CASE WHEN regexp_matches(url, '^https?://[^/]+/status/[0-9]{{3}}(/|$)')
             THEN CAST(regexp_extract(url, '/status/([0-9]{{3}})', 1) AS INTEGER)
             ELSE 200 END AS status,
        html, blen FROM pages),
expandable AS (
  SELECT canon, regexp_extract(canon, '^(https?://[^/?#]+)', 1) AS hostpfx, html
  FROM idx
  WHERE status = 200 AND blen <= 8192
    AND NOT contains(regexp_replace(canon, '^https?://[^/?#]+', ''), 'admin/')),
tags AS (SELECT canon, hostpfx,
         unnest(regexp_extract_all(html, '<a(?:>|[ \t\n][^>]*>)', 0)) AS tag
         FROM expandable),
raw AS (SELECT canon, hostpfx,
        regexp_extract(tag, 'href="([^"]*)"', 1) AS href0 FROM tags),
kept AS (SELECT canon, hostpfx, trim(href0, ' ') AS href1 FROM raw
         WHERE href0 <> 'javascript:;' AND NOT starts_with(href0, '#')),
absd AS (SELECT canon AS parent,
         CASE WHEN starts_with(href1, '//') THEN 'https://' || href1
              WHEN starts_with(href1, '/') THEN hostpfx || href1
              ELSE href1 END AS href
         FROM kept WHERE href1 <> ''),
canond AS (SELECT parent,
           split_part(href, '?', 1) AS base,
           list_sort(list_filter(str_split(split_part(href, '?', 2), '&'),
                     t -> t <> '' AND split_part(t, '=', 1) <> 'session')) AS toks
           FROM absd
           WHERE regexp_matches(href, '^https?://[^/?#]+')),
cand AS (SELECT parent,
         CASE WHEN len(toks) = 0 THEN base
              ELSE base || '?' || array_to_string(toks, '&') END AS child
         FROM canond),
edges AS (
  SELECT c.parent, c.child, COUNT(*) AS cnt
  FROM cand c LEFT JOIN idx i ON i.canon = c.child
  WHERE regexp_extract(c.child, '^(https?://[^/?#]+)', 1)
        IN ('https://site-a.test', 'https://site-b.test')
    AND NOT starts_with(regexp_replace(c.child, '^https?://[^/?#]+', ''), '/err/')
    AND (i.canon IS NULL OR i.blen <= 8192)
  GROUP BY c.parent, c.child),
reach AS (
  SELECT 'https://site-a.test' AS canon
  UNION
  SELECT e.child FROM reach r JOIN edges e ON e.parent = r.canon)
"""

_CRAWL_CTE = _CRAWL_CTE_TEMPLATE.format(path=_CRAWL_PAGES_PATH)

# robots-enabled twin: same fixpoint over a robots-carrying pages dump,
# with RFC-9309 longest-match gating (fixtures ROBOTS_A/ROBOTS_B:
# site-a disallows /missing/ and /p/13 with /p/13/deeper re-allowed —
# allow wins length ties; site-b disallows /status/) applied to every
# would-be CHILD: a disallowed url is never fetched, so it is neither
# in the seen set nor an expansion parent (stages.make_robots_filter
# runs pre-seen-check). Path excludes the query, matching Go url.Path.
_CRAWL_ROBOTS_PAGES_PATH = "/tmp/brinkray_crawl_pages_robots.parquet"
_ROBOTS_CHILD_OK = (
    "(CASE WHEN regexp_extract(c.child, '^(https?://[^/?#]+)', 1) = "
    "'https://site-a.test' THEN "
    "CASE WHEN starts_with(regexp_extract(c.child, "
    "'^https?://[^/?#]+([^?#]*)', 1), '/p/13/deeper') THEN TRUE "
    "WHEN starts_with(regexp_extract(c.child, "
    "'^https?://[^/?#]+([^?#]*)', 1), '/p/13') THEN FALSE "
    "WHEN starts_with(regexp_extract(c.child, "
    "'^https?://[^/?#]+([^?#]*)', 1), '/missing/') THEN FALSE "
    "ELSE TRUE END "
    "ELSE NOT starts_with(regexp_extract(c.child, "
    "'^https?://[^/?#]+([^?#]*)', 1), '/status/') END)"
)
_CRAWL_ROBOTS_CTE = _CRAWL_CTE_TEMPLATE.replace(
    "AND (i.canon IS NULL OR i.blen <= 8192)",
    "AND (i.canon IS NULL OR i.blen <= 8192)\n    AND " + _ROBOTS_CHILD_OK,
).format(path=_CRAWL_ROBOTS_PAGES_PATH)


def _pagerank_sql(iters: int = 5, scale: int = 10**12) -> str:
    """Unrolled integer PageRank over the crawl CTE's reachable graph —
    the same recurrence as joins.pagerank (floor divisions, 85/100
    damping, evaporating dangling mass), one CTE per iteration."""
    head = (
        _CRAWL_CTE
        + ", nodes AS (SELECT canon FROM reach), "
        "er AS (SELECT DISTINCT e.parent, e.child FROM edges e "
        "JOIN nodes n ON e.parent = n.canon), "
        "odt AS (SELECT parent, CAST(COUNT(*) AS BIGINT) AS od "
        "FROM er GROUP BY parent), "
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM nodes), "
        f"r0 AS (SELECT canon, {scale} // (SELECT c FROM nn) AS r FROM nodes)"
    )
    steps = []
    for i in range(1, iters + 1):
        steps.append(
            f", r{i} AS (SELECT n.canon, "
            f"(15 * ({scale} // (SELECT c FROM nn))) // 100 "
            "+ (85 * COALESCE(s.s, 0)) // 100 AS r "
            "FROM nodes n LEFT JOIN ("
            "SELECT er.child, CAST(SUM(p.r // odt.od) AS BIGINT) AS s "
            f"FROM er JOIN r{i-1} p ON p.canon = er.parent "
            "JOIN odt ON odt.parent = er.parent "
            "GROUP BY er.child) s ON s.child = n.canon)"
        )
    return (
        head
        + "".join(steps)
        + f" SELECT canon AS url, CAST(r AS BIGINT) AS rank FROM r{iters} "
        "ORDER BY url"
    )


def _crawl_events_sql(levels: int = 14) -> str:
    """FULL FIFO event-log twin — the strongest crawl oracle: re-derive
    every handler event (wave, order_key, linked_from, url, status,
    cached) by unrolling the BFS wave loop in SQL.

    Key facts making this exact:
    * order_key is a PATH label: parent key + '/' + zero-padded link
      position, where positions count the links the extractor EMITS
      (post-absolutize, pre-normalize — links that later die at
      normalize still consume a position). The ``num`` CTE numbers
      kept-level links per page in document order via the
      zip-unnest-with-ordinality idiom.
    * in the sandbox world every fetch gate (known host / err path /
      allowed domain / content length) is a pure function of the CANON,
      so a gate-failing canon NEVER produces events and a gate-passing
      occurrence always does — fetched for the global FIFO-first
      occurrence, cached replay for every other.
    * expansion applies only to status-200, small, non-admin pages —
      the same ``expandable`` predicate as the reachability CTE.
    """
    head = _CRAWL_CTE_TEMPLATE.format(path=_CRAWL_PAGES_PATH)
    # MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, so 14
    # chained wave levels would expand the shared pages/idx/val trees
    # exponentially (observed as "Too many open files" on the parquet
    # source); materializing shared + per-level CTEs keeps the plan
    # linear in `levels`
    head = head.replace("pages AS (", "pages AS MATERIALIZED (")
    head = head.replace("idx AS (", "idx AS MATERIALIZED (")
    # reuse pages/idx from the template head; rebuild link derivation
    # WITH positions (the template's edges/reach tail is unused here
    # but harmless — DuckDB prunes unreferenced CTEs)
    base = head + """
, exp2 AS (SELECT canon, regexp_extract(canon, '^(https?://[^/?#]+)', 1)
           AS hostpfx, html FROM idx),
tg2 AS (SELECT canon, hostpfx,
        unnest(regexp_extract_all(html, '<a(?:>|[ \t\n][^>]*>)', 0)) AS tag,
        unnest(generate_series(1,
            len(regexp_extract_all(html, '<a(?:>|[ \t\n][^>]*>)', 0)))) AS ti
        FROM exp2),
raw2 AS (SELECT canon, hostpfx, ti,
         regexp_extract(tag, 'href="([^"]*)"', 1) AS href0 FROM tg2),
kept2 AS (SELECT canon, hostpfx, ti, trim(href0, ' ') AS href1 FROM raw2
          WHERE href0 <> 'javascript:;' AND NOT starts_with(href0, '#')
          AND trim(href0, ' ') <> ''),
num AS (SELECT canon AS parent,
        CASE WHEN starts_with(href1, '//') THEN 'https://' || href1
             WHEN starts_with(href1, '/') THEN hostpfx || href1
             ELSE href1 END AS href,
        row_number() OVER (PARTITION BY canon ORDER BY ti) - 1 AS pos
        FROM kept2),
cn AS (SELECT parent, pos, href,
       CASE WHEN regexp_matches(href, '^https?://[^/?#]+') THEN
         (CASE WHEN len(list_filter(str_split(split_part(href, '?', 2), '&'),
                t -> t <> '' AND split_part(t, '=', 1) <> 'session')) = 0
               THEN split_part(href, '?', 1)
               ELSE split_part(href, '?', 1) || '?' || array_to_string(
                    list_sort(list_filter(str_split(split_part(href, '?', 2),
                    '&'), t -> t <> '' AND split_part(t, '=', 1) <> 'session')),
                    '&') END)
       ELSE NULL END AS child FROM num),
val AS MATERIALIZED (SELECT c.parent, c.pos, c.href, c.child,
        (c.child IS NOT NULL
         AND regexp_extract(c.child, '^(https?://[^/?#]+)', 1)
             IN ('https://site-a.test', 'https://site-b.test')
         AND NOT starts_with(
             regexp_replace(c.child, '^https?://[^/?#]+', ''), '/err/')
         AND (i.canon IS NULL OR i.blen <= 8192)) AS ok
        FROM cn c LEFT JOIN idx i ON i.canon = c.child),
expok AS MATERIALIZED (SELECT canon FROM idx WHERE status = 200 AND blen <= 8192
          AND NOT contains(regexp_replace(canon, '^https?://[^/?#]+', ''),
                           'admin/')),
w0 AS (SELECT 'https://site-a.test' AS canon, '000000' AS okey,
       'start' AS lf, 'https://site-a.test' AS href_raw),
ev0 AS (SELECT 0 AS wave, w0.okey, w0.lf, w0.canon,
        COALESCE(i.status, 404) AS status, FALSE AS cached
        FROM w0 LEFT JOIN idx i ON i.canon = w0.canon),
fetched0 AS (SELECT canon, okey, href_raw FROM w0),
seen0 AS (SELECT canon FROM w0)"""
    steps = []
    for k in range(1, levels + 1):
        p = k - 1
        steps.append(f"""
, occ{k} AS (SELECT f.okey || '/' || lpad(CAST(v.pos AS VARCHAR), 6, '0')
            AS okey, f.href_raw AS lf, v.href AS href_raw,
            v.child AS canon, v.ok
            FROM fetched{p} f JOIN expok e ON e.canon = f.canon
            JOIN val v ON v.parent = f.canon),
vok{k} AS MATERIALIZED (SELECT okey, lf, href_raw, canon FROM occ{k} WHERE ok),
new{k} AS MATERIALIZED (SELECT canon, MIN(okey) AS wokey FROM vok{k}
           WHERE canon NOT IN (SELECT canon FROM seen{p}) GROUP BY canon),
fetched{k} AS MATERIALIZED (SELECT n.canon, n.wokey AS okey, o.href_raw
               FROM new{k} n JOIN vok{k} o
               ON o.canon = n.canon AND o.okey = n.wokey),
seen{k} AS MATERIALIZED (SELECT canon FROM seen{p}
            UNION ALL SELECT canon FROM fetched{k}),
ev{k} AS MATERIALIZED (SELECT {k} AS wave, o.okey, o.lf, o.canon,
          COALESCE(i.status, 404) AS status,
          (n.canon IS NULL OR o.okey <> n.wokey) AS cached
          FROM vok{k} o LEFT JOIN idx i ON i.canon = o.canon
          LEFT JOIN new{k} n ON n.canon = o.canon)""")
    union = " UNION ALL ".join(
        [f"SELECT * FROM ev{k}" for k in range(0, levels + 1)]
    )
    return (
        base + "".join(steps)
        + f" SELECT CAST(wave AS BIGINT) AS wave, okey AS order_key, "
        f"lf AS linked_from, canon AS url, CAST(status AS BIGINT) AS status, "
        f"cached FROM ({union}) ORDER BY wave, order_key"
    )


def _wave_sizes_sql(levels: int = 24) -> str:
    """BFS-depth histogram twin: unroll the reachability CTE level by
    level (l0 = seed, l_k = children(l_{k-1})) and take MIN(level) per
    canon — the wave at which the engine first fetches it. ``levels``
    safely exceeds the deepest testdata crawl (<= ~12 waves)."""
    head = _CRAWL_CTE + ", l0 AS (SELECT 'https://site-a.test' AS canon)"
    steps, unions = [], ["SELECT canon, 0 AS d FROM l0"]
    for i in range(1, levels + 1):
        steps.append(
            f", l{i} AS (SELECT DISTINCT e.child AS canon FROM edges e "
            f"JOIN l{i - 1} p ON e.parent = p.canon)"
        )
        unions.append(f"SELECT canon, {i} AS d FROM l{i}")
    return (
        head
        + "".join(steps)
        + ", alld AS (" + " UNION ALL ".join(unions) + ")"
        + ", md AS (SELECT canon, MIN(d) AS w FROM alld GROUP BY canon) "
        "SELECT CAST(w AS BIGINT) AS wave, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM md GROUP BY w ORDER BY wave"
    )


def _hits_sql(iters: int = 2) -> str:
    """Unrolled integer HITS over the crawl CTE's reachable graph —
    the same unnormalized recurrence as joins.hits (h0 = 1)."""
    head = (
        _CRAWL_CTE
        + ", nodes AS (SELECT canon FROM reach), "
        "er AS (SELECT DISTINCT e.parent, e.child FROM edges e "
        "JOIN nodes n ON e.parent = n.canon), "
        "h0 AS (SELECT canon, 1 AS h FROM nodes)"
    )
    steps = []
    for t in range(1, iters + 1):
        steps.append(
            f", a{t} AS (SELECT n.canon, CAST(COALESCE(s.s, 0) AS BIGINT) AS a "
            "FROM nodes n LEFT JOIN (SELECT er.child, SUM(p.h) AS s "
            f"FROM er JOIN h{t - 1} p ON p.canon = er.parent "
            "GROUP BY er.child) s ON s.child = n.canon)"
        )
        steps.append(
            f", h{t} AS (SELECT n.canon, CAST(COALESCE(s.s, 0) AS BIGINT) AS h "
            f"FROM nodes n LEFT JOIN (SELECT er.parent, SUM(p.a) AS s "
            f"FROM er JOIN a{t} p ON p.canon = er.child "
            "GROUP BY er.parent) s ON s.parent = n.canon)"
        )
    return (
        head
        + "".join(steps)
        + f" SELECT n.canon AS url, a{iters}.a AS auth, h{iters}.h AS hub "
        f"FROM nodes n JOIN a{iters} ON a{iters}.canon = n.canon "
        f"JOIN h{iters} ON h{iters}.canon = n.canon ORDER BY url"
    )


def _recrawl_priority_sql(iters: int = 5, k: int = 3) -> str:
    """Top-k-per-host window over the unrolled PageRank CTE (host =
    the crawl_host_stats scheme://authority regex)."""
    host = "regexp_extract(url, '^(https?://[^/?#]+)', 1)"
    return (
        "SELECT host, url, rank FROM ("
        f"SELECT {host} AS host, url, rank, "
        f"row_number() OVER (PARTITION BY {host} "
        "ORDER BY rank DESC, url) AS rn "
        f"FROM ({_pagerank_sql(iters=iters)}) pr) t "
        f"WHERE rn <= {k} ORDER BY host, rank DESC, url"
    )


def oracle_sql() -> dict[str, str]:
    d = _oracle_sql_dict()
    d["link_pagerank"] = _pagerank_sql(iters=5)
    # deterministic walks: per hop one QUALIFY row_number argmin over
    # the same reachable edge set (ties md5 then child, as in the
    # kernel)
    _walk_head = (
        _CRAWL_CTE
        + ", nodes AS (SELECT canon FROM reach), "
        "er AS (SELECT DISTINCT e.parent, e.child FROM edges e "
        "JOIN nodes n ON e.parent = n.canon), "
        "w1 AS (SELECT parent AS start, child AS node FROM er "
        "QUALIFY row_number() OVER (PARTITION BY parent "
        "ORDER BY md5(parent || '#1#' || child), child) = 1)"
    )
    _walk_steps = "".join(
        f", w{s} AS (SELECT w.start, e.child AS node "
        f"FROM w{s-1} w JOIN er e ON e.parent = w.node "
        "QUALIFY row_number() OVER (PARTITION BY w.start "
        f"ORDER BY md5(w.node || '#{s}#' || e.child), e.child) = 1)"
        for s in (2, 3)
    )
    d["graph_random_walks"] = (
        _walk_head + _walk_steps
        + " SELECT start, step, node FROM ("
        + " UNION ALL ".join(
            f"SELECT start, CAST({s} AS BIGINT) AS step, node FROM w{s}"
            for s in (1, 2, 3)
        )
        + ") ORDER BY start, step"
    )
    d["recrawl_priority"] = _recrawl_priority_sql(iters=5, k=3)
    d["link_degree_histogram"] = (
        _CRAWL_CTE
        + ", nodes AS (SELECT canon FROM reach), "
        "er AS (SELECT DISTINCT e.parent, e.child FROM edges e "
        "JOIN nodes n ON e.parent = n.canon), "
        "od AS (SELECT parent, CAST(COUNT(*) AS BIGINT) AS out_degree "
        "FROM er GROUP BY parent) "
        "SELECT out_degree, CAST(COUNT(*) AS BIGINT) AS n_pages "
        "FROM od GROUP BY out_degree ORDER BY out_degree"
    )
    # the shuffle-join novelty path computes the identical quantity —
    # it shares the broadcast path's twin verbatim
    d["ngram_novelty_shuffled"] = d["ngram_novelty"]
    # the persisted positional index answers the identical phrase
    # query — the scan twin certifies the index end to end
    d["phrase_search_indexed"] = d["phrase_search"]
    # the batched persisted-IVF search answers the identical 5-query
    # top-10 — the brute-force multi-query twin certifies it
    d["ann_ivf_multi_persisted"] = d["ann_multi_topk"]
    # the join-based paragraph-dedup path computes the identical
    # quantity — it shares the broadcast path's twin verbatim
    d["paragraph_dedup_shuffled"] = d["paragraph_dedup"]
    d["crawl_wave_sizes"] = _wave_sizes_sql()
    d["crawl_events"] = _crawl_events_sql()
    d["crawl_robots_seen"] = (
        _CRAWL_ROBOTS_CTE
        + "SELECT r.canon AS url, CAST(COALESCE(i.status, 404) AS BIGINT) "
        "AS status FROM reach r LEFT JOIN idx i ON i.canon = r.canon "
        "ORDER BY url"
    )
    d["link_hits"] = _hits_sql(iters=2)
    # refresh lands back on the same fixpoint => same oracle as
    # crawl_seen_set
    d["crawl_refresh_seen"] = (
        _CRAWL_CTE
        + "SELECT r.canon AS url, CAST(COALESCE(i.status, 404) AS BIGINT) "
        "AS status FROM reach r LEFT JOIN idx i ON i.canon = r.canon "
        "ORDER BY url"
    )
    # revalidation: the expired set is the md5-last-hex-digit<8 slice
    # of the fixpoint; a url classifies 'modified' iff its page exists,
    # was small enough to take the 9-byte mutation (blen <= 8183), and
    # matched the md5-first-hex-digit<8 mutation predicate — everything
    # else (incl. 404s' empty bodies) revalidates. The engine derives
    # the same labels by genuinely comparing stored vs refetched md5s.
    d["crawl_revalidation"] = (
        _CRAWL_CTE
        + "SELECT r.canon AS url, CASE WHEN i.canon IS NOT NULL "
        "AND i.blen <= 8183 "
        "AND substr(md5(r.canon), 1, 1) "
        "IN ('0','1','2','3','4','5','6','7') "
        "THEN 'modified' ELSE 'revalidated' END AS outcome "
        "FROM reach r LEFT JOIN idx i ON i.canon = r.canon "
        "WHERE substr(md5(r.canon), 32, 1) "
        "IN ('0','1','2','3','4','5','6','7') "
        "ORDER BY url"
    )
    # sitemap: SQL builds the identical per-host xml (string_agg in
    # url order) and re-parses the <loc> entries independently
    d["sitemap_extract"] = (
        f"WITH p AS (SELECT url, split_part(url, '/', 3) AS host "
        f"FROM read_parquet('{_CRAWL_PAGES_PATH}')), "
        "x AS (SELECT host, '<urlset>' || "
        "string_agg('<url><loc>' || url || '</loc></url>', '' "
        "ORDER BY url) || '</urlset>' AS xml FROM p GROUP BY host), "
        "l AS (SELECT host, unnest(regexp_extract_all(xml, "
        "'<loc>([^<]*)</loc>', 1)) AS url FROM x) "
        "SELECT host, url FROM l ORDER BY host, url"
    )
    # WARC-ish manifest re-derived from the original page dump: shard
    # = md5(url) first hex digit % 8, statuses from the /status/NNN
    # convention. The Ray side checksums RAW bytes (binary payloads
    # pytest-pinned); this DuckDB's md5_number_lower is VARCHAR-only,
    # so the twin decodes — equal because md5(utf8(s)) == md5(bytes)
    # for the driver's valid-UTF-8 pages
    d["warcish_roundtrip"] = (
        f"WITH p AS (SELECT url, decode(html) AS s, "
        f"octet_length(html) AS b FROM read_parquet('{_CRAWL_PAGES_PATH}')), "
        "r AS (SELECT (strpos('0123456789abcdef', "
        "substr(md5(url), 1, 1)) - 1) % 8 AS shard, b, "
        "CASE WHEN regexp_matches(url, "
        "'^https?://[^/]+/status/[0-9]{3}(/|$)') "
        "THEN CAST(regexp_extract(url, '/status/([0-9]{3})', 1) AS BIGINT) "
        "ELSE 200 END AS st, "
        "md5_number_lower(s) % 1000000007 AS ck FROM p) "
        "SELECT CAST(shard AS BIGINT) AS shard, "
        "CAST(COUNT(*) AS BIGINT) AS n_records, "
        "CAST(SUM(b) AS BIGINT) AS n_bytes, "
        "CAST(SUM(st) AS BIGINT) AS status_sum, "
        "CAST(SUM(ck) AS BIGINT) AS checksum "
        "FROM r GROUP BY shard ORDER BY shard"
    )
    # per-host change rates: the same expired/modified predicates
    # aggregated by host — the refresh-scheduler input
    d["refresh_change_rates"] = (
        _CRAWL_CTE
        + "SELECT regexp_extract(r.canon, '^(https?://[^/?#]+)', 1) "
        "AS host, CAST(COUNT(*) AS BIGINT) AS n_checked, "
        "CAST(COUNT(*) FILTER (WHERE i.canon IS NOT NULL "
        "AND i.blen <= 8183 "
        "AND substr(md5(r.canon), 1, 1) "
        "IN ('0','1','2','3','4','5','6','7')) AS BIGINT) AS n_modified "
        "FROM reach r LEFT JOIN idx i ON i.canon = r.canon "
        "WHERE substr(md5(r.canon), 32, 1) "
        "IN ('0','1','2','3','4','5','6','7') "
        "GROUP BY host ORDER BY host"
    )
    # engine-extracted text equals a per-page recomputation for every
    # fetched 200 page (driver-visible byte-identity invariant)
    d["crawl_extracted_text"] = (
        _CRAWL_CTE
        + f"SELECT p.url, CAST(octet_length(encode(p.text)) AS BIGINT) AS n_bytes, "
        f"md5(p.text) AS text_md5 "
        f"FROM read_parquet('{_TEXT_PAGES_PATH}') p "
        "JOIN reach r ON r.canon = p.url "
        "JOIN idx i ON i.canon = p.url WHERE i.status = 200 ORDER BY p.url"
    )
    # per-wave fetched-vs-cached accounting over the full FIFO event
    # log oracle
    d["crawl_cached_per_wave"] = (
        "SELECT wave, CAST(COUNT(*) AS BIGINT) AS n_events, "
        "CAST(COUNT(*) FILTER (WHERE cached) AS BIGINT) AS n_cached "
        "FROM (" + _crawl_events_sql() + ") GROUP BY wave ORDER BY wave"
    )
    # multi-seed, depth-capped seen set: 3-level BFS union from both
    # seeds (the engine runs max_waves=3 with the same two seeds)
    d["crawl_multi_seed"] = (
        _CRAWL_CTE
        + ", s0 AS (SELECT unnest(['https://site-a.test', "
        "'https://site-b.test/p/2']) AS canon), "
        "l1 AS (SELECT DISTINCT e.child AS canon FROM edges e "
        "JOIN s0 p ON e.parent = p.canon), "
        "l2 AS (SELECT DISTINCT e.child AS canon FROM edges e "
        "JOIN l1 p ON e.parent = p.canon), "
        "allr AS (SELECT DISTINCT canon FROM ("
        "SELECT canon FROM s0 UNION ALL SELECT canon FROM l1 "
        "UNION ALL SELECT canon FROM l2)) "
        "SELECT r.canon AS url, CAST(COALESCE(i.status, 404) AS BIGINT) "
        "AS status FROM allr r LEFT JOIN idx i ON i.canon = r.canon "
        "ORDER BY url"
    )
    return d


def _oracle_sql_dict() -> dict[str, str]:
    return {
        "distinct_users_per_event_type": (
            "SELECT event_type, COUNT(DISTINCT user_id) AS n_users "
            "FROM events GROUP BY event_type"
        ),
        "status_routing_counts": (
            "SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type"
        ),
        "substring_detector": (
            "SELECT doc_id, source FROM documents WHERE text LIKE '%window%'"
        ),
        "per_source_budget": (
            "SELECT source, COUNT(*) AS n_docs, "
            "CAST(SUM(n_chars) AS BIGINT) AS total_chars "
            "FROM documents GROUP BY source"
        ),
        "frontier_ordering": (
            "SELECT event_id, ts, event_type FROM events "
            "ORDER BY ts, event_id LIMIT 100"
        ),
        "normalize_projection": (
            "SELECT doc_id, 'https://' || source || '.test/d/' || "
            "CAST(doc_id AS VARCHAR) || '?a=1&b=2' AS canon_url FROM documents"
        ),
        "fetch_join": (
            "SELECT e.event_id, c.c_name FROM events e JOIN customer c "
            "ON ((e.user_id % (SELECT MAX(c_custkey) FROM customer)) + 1) = c.c_custkey"
        ),
        "dedup_exact": (
            "SELECT md5(text) AS h, MIN(doc_id) AS doc_id, "
            "CAST(COUNT(*) AS BIGINT) AS n_dups FROM documents GROUP BY md5(text)"
        ),
        "token_counts": (
            "SELECT doc_id, "
            "CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens, "
            "CAST(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS BIGINT) AS n_bpe_ish "
            "FROM documents"
        ),
        "quality_model_scores": (
            "WITH f AS (SELECT doc_id, "
            "CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens, "
            "n_chars, "
            "CAST(len(regexp_extract_all(text, '[.!?]')) AS BIGINT) AS n_punct, "
            "CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits "
            "FROM documents) "
            "SELECT doc_id, CAST(500 + 3*n_tokens - 1*n_chars + 20*n_punct "
            "- 5*n_digits AS BIGINT) AS score, "
            "(500 + 3*n_tokens - 1*n_chars + 20*n_punct - 5*n_digits) > 0 "
            "AS passes FROM f ORDER BY doc_id"
        ),
        "dup_ngram_spans": (
            "WITH toks AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents), "
            "idx AS (SELECT doc_id, t, unnest(range(1, len(t) - 10)) AS i "
            "FROM toks WHERE len(t) >= 12), "
            "wins AS (SELECT DISTINCT doc_id, "
            "md5(array_to_string(t[i:i+11], ' ')) AS w FROM idx), "
            "shared AS (SELECT w FROM wins GROUP BY w "
            "HAVING COUNT(DISTINCT doc_id) >= 2) "
            "SELECT wins.doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_windows "
            "FROM wins JOIN shared USING (w) "
            "GROUP BY wins.doc_id ORDER BY wins.doc_id"
        ),
        "windowed_event_counts": (
            "SELECT event_type, date_trunc('hour', ts) AS window_start, "
            "COUNT(*) AS n "
            "FROM events GROUP BY event_type, date_trunc('hour', ts)"
        ),
        "running_totals": (
            "SELECT o_custkey, o_orderdate, o_orderkey, "
            "CAST(floor(o_totalprice * 100) AS BIGINT) AS v_cents, "
            "CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) OVER ("
            "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents "
            "FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey"
        ),
        "event_type_pivot": (
            "SELECT user_id, "
            + ", ".join(
                f"CAST(COUNT(*) FILTER (WHERE event_type = '{t}') AS BIGINT) "
                f"AS n_{t}"
                for t in ("click", "error", "purchase", "signup", "view")
            )
            + " FROM events GROUP BY user_id ORDER BY user_id"
        ),
        "lang_sampled_chars_quantiles": (
            "WITH s AS (SELECT lang, n_chars FROM documents "
            "QUALIFY row_number() OVER (PARTITION BY lang "
            "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 200) "
            + " UNION ALL ".join(
                f"SELECT lang, {q} AS q, "
                f"CAST(quantile_disc(n_chars, {q}) AS BIGINT) AS value "
                f"FROM s GROUP BY lang"
                for q in (0.5, 0.9)
            )
            + " ORDER BY lang, q"
        ),
        "debounced_events": (
            "SELECT user_id, event_type, ts, event_id FROM events "
            "QUALIFY lag(ts) OVER (PARTITION BY user_id, event_type "
            "ORDER BY ts, event_id) IS NULL "
            "OR ts - lag(ts) OVER (PARTITION BY user_id, event_type "
            "ORDER BY ts, event_id) > INTERVAL 30 MINUTE "
            "ORDER BY event_id"
        ),
        "adjacent_edit_distance": (
            "SELECT a.doc_id, CAST(levenshtein(substr(a.text, 1, 200), "
            "substr(b.text, 1, 200)) AS BIGINT) AS edit_distance "
            "FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1 "
            "ORDER BY a.doc_id"
        ),
        "sampled_price_quantiles": (
            "WITH s AS (SELECT o_totalprice FROM orders "
            "QUALIFY row_number() OVER ("
            "ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) <= 2000) "
            + " UNION ALL ".join(
                f"SELECT {q} AS q, quantile_disc(o_totalprice, {q}) "
                f"AS value FROM s"
                for q in (0.25, 0.5, 0.75, 0.9, 0.99)
            )
            + " ORDER BY q"
        ),
        "trailing_hour_sums": (
            "SELECT user_id, ts, event_id, "
            "CAST(floor(value * 100.0) AS BIGINT) AS v_cents, "
            "CAST(SUM(CAST(floor(value * 100.0) AS BIGINT)) OVER ("
            "PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) "
            "AS BIGINT) AS trailing_cents "
            "FROM events ORDER BY event_id"
        ),
        "event_value_pivot": (
            "SELECT user_id, "
            + ", ".join(
                f"CAST(COALESCE(SUM(CAST(floor(value * 100.0) AS BIGINT)) "
                f"FILTER (WHERE event_type = '{t}'), 0) AS BIGINT) AS sum_{t}"
                for t in ("click", "purchase", "view")
            )
            + " FROM events GROUP BY user_id ORDER BY user_id"
        ),
        "user_event_histories": (
            "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events, "
            "string_agg(event_type, ',' ORDER BY ts, event_id) AS history "
            "FROM events GROUP BY user_id ORDER BY user_id"
        ),
        "asof_join_events_orders": (
            "SELECT e.event_id, o.o_orderdate AS o_date FROM events e "
            "ASOF JOIN orders o "
            "ON ((e.user_id % (SELECT MAX(c_custkey) FROM customer)) + 1) = o.o_custkey "
            "AND e.ts >= o.o_orderdate"
        ),
        "interval_join_events_orders": (
            "WITH e2 AS (SELECT event_id, "
            "(user_id % (SELECT MAX(c_custkey) FROM customer)) + 1 AS ck, "
            "TIMESTAMP '1995-01-01' + "
            "((event_id * 1123457) % 208000000) * INTERVAL 1 SECOND AS ts "
            "FROM events) "
            "SELECT e.event_id, o.o_orderkey FROM e2 e JOIN orders o "
            "ON e.ck = o.o_custkey "
            "AND e.ts >= o.o_orderdate "
            "AND e.ts <= o.o_orderdate + INTERVAL 7 DAY "
            "ORDER BY e.event_id, o.o_orderkey"
        ),
        "revenue_by_nation": (
            "SELECT n.n_name, CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS "
            "BIGINT)) AS BIGINT) AS total_cents "
            "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "GROUP BY n.n_name ORDER BY n.n_name"
        ),
        "quality_basic": (
            "SELECT doc_id, CAST(length(text) AS BIGINT) AS q_chars, "
            "CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE) / length(text) "
            "AS punct_ratio FROM documents"
        ),
        # quality_signals: every column re-derived with DuckDB regex/list
        # kernels; the quality score mirrors the Python expression's exact
        # association order so IEEE doubles match bit-for-bit.
        "quality_signals": (
            "WITH q AS (SELECT doc_id, "
            "CAST(length(text) AS BIGINT) AS q_chars, "
            "CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE) / length(text) AS punct_ratio, "
            "CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) / length(text) AS alpha_ratio, "
            "len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS nt, "
            "len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), "
            f"t -> t IN ({_sql_set('en')}))) AS ns "
            "FROM documents) "
            "SELECT doc_id, q_chars, punct_ratio, "
            "CASE WHEN nt = 0 THEN 0.0 ELSE CAST(ns AS DOUBLE) / nt END AS stopword_ratio, "
            "alpha_ratio, "
            "GREATEST(0.0, LEAST(1.0, "
            "0.3 * LEAST(1.0, nt / 50) + 0.3 * alpha_ratio "
            "+ 0.2 * LEAST(1.0, (CASE WHEN nt = 0 THEN 0.0 ELSE CAST(ns AS DOUBLE) / nt END) * 5) "
            "+ 0.2 * (1.0 - LEAST(1.0, punct_ratio * 5)))) AS quality "
            "FROM q"
        ),
        # lang_id: same stopword profiles inlined; the CASE cascade encodes
        # the Python argmax's strict-> tie-break (alphabetical profile order
        # wins ties; ratios share the denominator so counts compare exactly).
        "score_calibration": (
            "WITH f AS (SELECT doc_id, "
            "500 + 3*CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) "
            "- n_chars "
            "+ 20*CAST(len(regexp_extract_all(text, '[.!?]')) AS BIGINT) "
            "- 5*CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) "
            "AS score FROM documents), "
            "d AS (SELECT score, ntile(10) OVER (ORDER BY score, doc_id) "
            "AS decile FROM f) "
            "SELECT CAST(decile AS BIGINT) AS decile, "
            "CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(COUNT(*) FILTER (score > 0) AS BIGINT) AS n_pass "
            "FROM d GROUP BY 1 ORDER BY 1"
        ),
        "lang_id_prf": (
            "WITH toks AS (SELECT lang, "
            "regexp_extract_all(lower(text), '[a-z0-9]+') AS tk "
            "FROM documents), r AS (SELECT lang, len(tk) AS nt, "
            f"len(list_filter(tk, t -> t IN ({_sql_set('de')}))) AS c_de, "
            f"len(list_filter(tk, t -> t IN ({_sql_set('en')}))) AS c_en, "
            f"len(list_filter(tk, t -> t IN ({_sql_set('es')}))) AS c_es, "
            f"len(list_filter(tk, t -> t IN ({_sql_set('fr')}))) AS c_fr "
            "FROM toks), m AS (SELECT lang, CASE "
            "WHEN nt = 0 OR (c_de = 0 AND c_en = 0 AND c_es = 0 AND c_fr = 0) THEN 'und' "
            "WHEN c_de >= c_en AND c_de >= c_es AND c_de >= c_fr THEN 'de' "
            "WHEN c_en >= c_es AND c_en >= c_fr THEN 'en' "
            "WHEN c_es >= c_fr THEN 'es' ELSE 'fr' END AS lang_pred FROM r), "
            "c AS (SELECT DISTINCT lang AS cls FROM m "
            "UNION SELECT DISTINCT lang_pred FROM m) "
            "SELECT c.cls, "
            "CAST((SELECT COUNT(*) FROM m WHERE m.lang = c.cls "
            "AND m.lang_pred = c.cls) AS BIGINT) AS tp, "
            "CAST((SELECT COUNT(*) FROM m WHERE m.lang <> c.cls "
            "AND m.lang_pred = c.cls) AS BIGINT) AS fp, "
            "CAST((SELECT COUNT(*) FROM m WHERE m.lang = c.cls "
            "AND m.lang_pred <> c.cls) AS BIGINT) AS fn "
            "FROM c ORDER BY c.cls"
        ),
        "revenue_by_balance_decile": (
            "WITH d AS (SELECT c_custkey, ntile(10) OVER ("
            "ORDER BY CAST(floor(c_acctbal*100.0) AS BIGINT), c_custkey) "
            "AS decile FROM customer) "
            "SELECT CAST(d.decile AS BIGINT) AS decile, "
            "CAST(SUM(CAST(floor(o_totalprice*100.0) AS BIGINT)) AS BIGINT) "
            "AS rev_cents, CAST(COUNT(*) AS BIGINT) AS n_orders "
            "FROM orders o JOIN d ON o.o_custkey = d.c_custkey "
            "GROUP BY 1 ORDER BY 1"
        ),
        "loo_target_encoding": (
            "WITH r AS (SELECT o_custkey, o_orderkey, "
            "CAST(floor(o_totalprice*100.0) AS BIGINT) AS cents FROM orders), "
            "a AS (SELECT o_custkey, CAST(SUM(cents) AS BIGINT) AS s, "
            "COUNT(*) AS n FROM r GROUP BY 1) "
            "SELECT r.o_orderkey, CAST(a.s - r.cents AS BIGINT) AS loo_num, "
            "CAST(a.n - 1 AS BIGINT) AS loo_den "
            "FROM r JOIN a ON r.o_custkey = a.o_custkey "
            "WHERE a.n > 1 ORDER BY 1"
        ),
        "next_order_after_event": (
            "WITH mx AS (SELECT MAX(c_custkey) AS m FROM customer), "
            "e AS (SELECT event_id, user_id % (SELECT m FROM mx) + 1 AS ck, "
            "TIMESTAMP '1995-01-01' + to_microseconds("
            "((event_id * 1123457) % 208000000) * 1000000) AS ts FROM events) "
            "SELECT e.event_id, MIN(o.o_orderdate) AS o_date "
            "FROM e JOIN orders o ON o.o_custkey = e.ck "
            "AND o.o_orderdate >= e.ts GROUP BY 1 ORDER BY 1"
        ),
        "imputed_values": (
            "WITH r AS (SELECT event_id, event_type, "
            "CAST(floor(value*100.0) AS BIGINT) AS cents, "
            "event_id % 7 = 0 AS missing FROM events), "
            "m AS (SELECT event_type, "
            "quantile_disc(cents, 0.5) AS med FROM r "
            "WHERE NOT missing GROUP BY 1) "
            "SELECT r.event_id, "
            "CAST(CASE WHEN r.missing THEN m.med ELSE r.cents END AS BIGINT) "
            "AS value_cents, r.missing AS imputed "
            "FROM r JOIN m ON r.event_type = m.event_type "
            "ORDER BY r.event_id"
        ),
        "session_conversion": (
            "WITH r AS (SELECT user_id, ts, event_type, "
            "CASE WHEN lag(ts) OVER w IS NULL "
            "OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END "
            "AS brk FROM events WINDOW w AS ("
            "PARTITION BY user_id ORDER BY ts)), "
            "s AS (SELECT user_id, event_type, SUM(brk) OVER ("
            "PARTITION BY user_id ORDER BY ts "
            "ROWS UNBOUNDED PRECEDING) AS sid FROM r), "
            "sess AS (SELECT user_id, sid, "
            "MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS hasp "
            "FROM s GROUP BY 1, 2) "
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions, "
            "CAST(SUM(hasp) AS BIGINT) AS n_with_purchase FROM sess"
        ),
        "top_entry_paths": (
            "WITH f AS (SELECT user_id, event_type, ts, event_id, "
            "row_number() OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS rn FROM events), "
            "p AS (SELECT user_id, string_agg(event_type, '>' "
            "ORDER BY ts, event_id) AS path FROM f WHERE rn <= 3 "
            "GROUP BY 1) "
            "SELECT path, CAST(COUNT(*) AS BIGINT) AS n FROM p "
            "GROUP BY 1 ORDER BY n DESC, path LIMIT 10"
        ),
        "late_events": (
            "WITH a AS (SELECT user_id, "
            "CAST((strpos('0123456789abcdef', substr(md5(CAST(event_id AS VARCHAR)), 29, 1)) - 1) * 4096 + (strpos('0123456789abcdef', substr(md5(CAST(event_id AS VARCHAR)), 30, 1)) - 1) * 256 "
            "+ (strpos('0123456789abcdef', substr(md5(CAST(event_id AS VARCHAR)), 31, 1)) - 1) * 16 + (strpos('0123456789abcdef', substr(md5(CAST(event_id AS VARCHAR)), 32, 1)) - 1) AS BIGINT) * 1099511627776 "
            "+ event_id AS arrival, "
            "CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events), "
            "w AS (SELECT user_id, arrival, ts_us, "
            "MAX(ts_us) OVER (PARTITION BY user_id ORDER BY arrival "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm FROM a) "
            "SELECT user_id, arrival, ts_us, "
            "CAST(wm - ts_us AS BIGINT) AS lag_us "
            "FROM w WHERE wm - ts_us > 86400000000::BIGINT "
            "ORDER BY user_id, arrival"
        ),
        "incremental_daily_counts": (
            "SELECT date_trunc('day', ts) AS day, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM events "
            "GROUP BY 1 ORDER BY 1"
        ),
        "revenue_gini": (
            "WITH pc AS (SELECT o_custkey, "
            "CAST(SUM(CAST(floor(o_totalprice*100.0) AS BIGINT)) AS BIGINT) "
            "AS cents FROM orders GROUP BY 1), "
            "r AS (SELECT cents, row_number() OVER (ORDER BY cents, o_custkey) "
            "AS i FROM pc), "
            "a AS (SELECT CAST(SUM(cents) AS BIGINT) AS s, "
            "CAST(SUM(i*cents) AS BIGINT) AS s1, COUNT(*) AS n FROM r) "
            "SELECT CAST(2*s1 - (n+1)*s AS BIGINT) AS gini_num, "
            "CAST(n*s AS BIGINT) AS gini_den FROM a"
        ),
        "repeat_orders_week": (
            "SELECT a.o_custkey, b.o_orderkey AS first_order, "
            "a.o_orderkey AS next_order "
            "FROM orders a JOIN orders b ON a.o_custkey = b.o_custkey "
            "AND a.o_orderdate >= b.o_orderdate "
            "AND a.o_orderdate <= b.o_orderdate + INTERVAL 7 DAY "
            "AND (a.o_orderdate > b.o_orderdate OR "
            "(a.o_orderdate = b.o_orderdate AND a.o_orderkey > b.o_orderkey)) "
            "ORDER BY 1, 2, 3"
        ),
        "weighted_sample_orders": (
            "SELECT o_orderkey FROM orders "
            "WHERE CAST((strpos('0123456789abcdef', substr(md5(CAST(o_orderkey AS VARCHAR)), 29, 1)) - 1) * 4096 + (strpos('0123456789abcdef', substr(md5(CAST(o_orderkey AS VARCHAR)), 30, 1)) - 1) * 256 "
            "+ (strpos('0123456789abcdef', substr(md5(CAST(o_orderkey AS VARCHAR)), 31, 1)) - 1) * 16 + (strpos('0123456789abcdef', substr(md5(CAST(o_orderkey AS VARCHAR)), 32, 1)) - 1) AS BIGINT) * 60000000 "
            "< 65536 * CAST(floor(o_totalprice*100.0) AS BIGINT) "
            "ORDER BY 1"
        ),
        "pareto_customers": (
            "WITH pc AS (SELECT o_custkey, "
            "CAST(SUM(CAST(floor(o_totalprice*100.0) AS BIGINT)) AS BIGINT) "
            "AS cents FROM orders GROUP BY 1), "
            "r AS (SELECT SUM(cents) OVER (ORDER BY cents DESC, o_custkey "
            "ROWS UNBOUNDED PRECEDING) AS cum FROM pc), "
            "t AS (SELECT CAST(SUM(cents) AS BIGINT) AS total, "
            "COUNT(*) AS n FROM pc) "
            "SELECT CAST(t.n AS BIGINT) AS n_customers, "
            "CAST((SELECT COUNT(*) FROM r, t WHERE r.cum * 5 < t.total * 4) "
            "+ 1 AS BIGINT) AS top_k_for_80pct, "
            "t.total AS total_cents FROM t"
        ),
        "lang_confusion": (
            "WITH toks AS (SELECT lang, "
            "regexp_extract_all(lower(text), '[a-z0-9]+') AS tk "
            "FROM documents), r AS (SELECT lang, len(tk) AS nt, "
            f"len(list_filter(tk, t -> t IN ({_sql_set('de')}))) AS c_de, "
            f"len(list_filter(tk, t -> t IN ({_sql_set('en')}))) AS c_en, "
            f"len(list_filter(tk, t -> t IN ({_sql_set('es')}))) AS c_es, "
            f"len(list_filter(tk, t -> t IN ({_sql_set('fr')}))) AS c_fr "
            "FROM toks), lab AS (SELECT lang, CASE "
            "WHEN nt = 0 OR (c_de = 0 AND c_en = 0 AND c_es = 0 AND c_fr = 0) THEN 'und' "
            "WHEN c_de >= c_en AND c_de >= c_es AND c_de >= c_fr THEN 'de' "
            "WHEN c_en >= c_es AND c_en >= c_fr THEN 'en' "
            "WHEN c_es >= c_fr THEN 'es' ELSE 'fr' END AS lang_pred FROM r) "
            "SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM lab GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "filter_funnel": (
            "WITH f AS (SELECT lang, n_chars, "
            "500 + 3*CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) "
            "- n_chars "
            "+ 20*CAST(len(regexp_extract_all(text, '[.!?]')) AS BIGINT) "
            "- 5*CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) "
            "AS score FROM documents), "
            "lab AS (SELECT CASE WHEN lang <> 'en' THEN 'lang' "
            "WHEN n_chars < 100 OR n_chars > 520 THEN 'length' "
            "WHEN score <= 0 THEN 'quality' ELSE 'pass' END AS stage FROM f) "
            "SELECT stage, CAST(COUNT(*) AS BIGINT) AS n FROM lab "
            "GROUP BY 1 ORDER BY 1"
        ),
        "lang_id_counts": (
            "WITH toks AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS tk "
            "FROM documents), r AS (SELECT len(tk) AS nt, "
            f"len(list_filter(tk, t -> t IN ({_sql_set('de')}))) AS c_de, "
            f"len(list_filter(tk, t -> t IN ({_sql_set('en')}))) AS c_en, "
            f"len(list_filter(tk, t -> t IN ({_sql_set('es')}))) AS c_es, "
            f"len(list_filter(tk, t -> t IN ({_sql_set('fr')}))) AS c_fr "
            "FROM toks), lab AS (SELECT CASE "
            "WHEN nt = 0 OR (c_de = 0 AND c_en = 0 AND c_es = 0 AND c_fr = 0) THEN 'und' "
            "WHEN c_de >= c_en AND c_de >= c_es AND c_de >= c_fr THEN 'de' "
            "WHEN c_en >= c_es AND c_en >= c_fr THEN 'en' "
            "WHEN c_es >= c_fr THEN 'es' ELSE 'fr' END AS lang_pred FROM r) "
            "SELECT lang_pred, COUNT(*) AS n FROM lab GROUP BY lang_pred"
        ),
        # windowed sums: fixed-point int64 cents — associative, so the
        # distributed Sum matches SQL exactly (floor of identical doubles).
        "windowed_event_sums": (
            "SELECT event_type, date_trunc('hour', ts) AS window_start, "
            "COUNT(*) AS n, "
            "CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_cents "
            "FROM events GROUP BY event_type, date_trunc('hour', ts)"
        ),
        # hopping windows: every event lands in window/hop overlapping
        # windows = union of shifted hop-grid buckets (time_bucket's
        # 2000-01-01 origin sits on the 30-min epoch grid, so it equals
        # the engine's epoch-aligned bucketing).
        "hopping_window_counts": (
            "WITH e AS (SELECT event_type, "
            "time_bucket(INTERVAL '30 minutes', ts) AS g FROM events), "
            "u AS (SELECT event_type, g AS window_start FROM e "
            "UNION ALL SELECT event_type, g - INTERVAL '30 minutes' FROM e) "
            "SELECT event_type, window_start, COUNT(*) AS n "
            "FROM u GROUP BY event_type, window_start"
        ),
        # sessions: SQL gaps-and-islands (LAG -> new-session flag -> running
        # sum) with the same strict > gap predicate as sessionize().
        "event_sessions": (
            "WITH lagged AS (SELECT user_id, ts, "
            "LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts FROM events), "
            "flagged AS (SELECT user_id, ts, CASE WHEN prev_ts IS NULL "
            "OR ts - prev_ts > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s "
            "FROM lagged), sess AS (SELECT user_id, ts, SUM(new_s) OVER "
            "(PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING "
            "AND CURRENT ROW) AS sid FROM flagged) "
            "SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end, "
            "CAST(COUNT(*) AS BIGINT) AS n_events FROM sess GROUP BY user_id, sid"
        ),
        "deterministic_sample": (
            "SELECT doc_id, n_chars FROM documents "
            "WHERE substr(md5(text), 1, 1) IN ('0', '1', '2', '3')"
        ),
        "event_pivot_roundtrip": (
            "SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM events GROUP BY user_id, event_type "
            "ORDER BY user_id, event_type"
        ),
        "last_events_per_user": (
            "SELECT user_id, ts, event_id FROM events "
            "QUALIFY row_number() OVER (PARTITION BY user_id "
            "ORDER BY ts DESC, event_id ASC) <= 3 "
            "ORDER BY user_id, ts, event_id"
        ),
        "buyer_counts": (
            "SELECT CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase' "
            "THEN user_id END) AS BIGINT) AS buyers, "
            "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users FROM events"
        ),
        "anomalous_days": (
            "WITH d AS (SELECT date_trunc('day', ts) AS day, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1) "
            "SELECT day, n FROM d "
            "WHERE n > (SELECT quantile_disc(n, 0.5) FROM d) "
            "ORDER BY day"
        ),
        "retention_cohorts": (
            "WITH du AS (SELECT DISTINCT user_id, date_trunc('day', ts) "
            "AS day FROM events), "
            "f AS (SELECT user_id, MIN(day) AS cohort FROM du GROUP BY 1) "
            "SELECT f.cohort, CAST(date_diff('day', f.cohort, du.day) "
            "AS BIGINT) AS day_offset, CAST(COUNT(*) AS BIGINT) AS n_users "
            "FROM du JOIN f ON du.user_id = f.user_id "
            "GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "trailing_wau": (
            "WITH du AS (SELECT DISTINCT date_trunc('day', ts) AS day, "
            "user_id FROM events), "
            "offs AS (SELECT unnest(generate_series(0, 6)) AS off) "
            "SELECT w.window_end, "
            "CAST(COUNT(DISTINCT w.user_id) AS BIGINT) AS n_distinct FROM "
            "(SELECT du.day + to_days(CAST(offs.off AS INT)) AS window_end, "
            "du.user_id FROM du, offs) w "
            "GROUP BY w.window_end ORDER BY w.window_end"
        ),
        "price_equidepth_bins": (
            "WITH s AS (SELECT o_totalprice FROM orders "
            "QUALIFY row_number() OVER ("
            "ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) <= 2000), "
            "e AS (SELECT quantile_disc(o_totalprice, 0.25) AS q1, "
            "quantile_disc(o_totalprice, 0.5) AS q2, "
            "quantile_disc(o_totalprice, 0.75) AS q3 FROM s) "
            "SELECT CAST(CAST(o.o_totalprice >= e.q1 AS BIGINT) "
            "+ CAST(o.o_totalprice >= e.q2 AS BIGINT) "
            "+ CAST(o.o_totalprice >= e.q3 AS BIGINT) AS BIGINT) AS bin, "
            "CAST(COUNT(*) AS BIGINT) AS n "
            "FROM orders o, e GROUP BY 1 ORDER BY bin"
        ),
        "embedding_norm_histogram": (
            "WITH q AS (SELECT list_transform(embedding, "
            "x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS e "
            "FROM embeddings), "
            "n2 AS (SELECT list_sum(list_transform(e, x -> x * x)) AS norm2 "
            "FROM q) "
            "SELECT CAST(norm2 // 1000000 AS BIGINT) AS bucket, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM n2 "
            "GROUP BY 1 ORDER BY bucket"
        ),
        "monthly_order_growth": (
            "WITH m AS (SELECT date_trunc('month', o_orderdate) AS month, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM orders GROUP BY 1) "
            "SELECT month, n, CAST(n - COALESCE(lag(n) OVER (ORDER BY month), n) "
            "AS BIGINT) AS delta FROM m ORDER BY month"
        ),
        "session_size_histogram": (
            "WITH lagged AS (SELECT user_id, ts, "
            "LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts FROM events), "
            "flagged AS (SELECT user_id, ts, CASE WHEN prev_ts IS NULL "
            "OR ts - prev_ts > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s "
            "FROM lagged), sess AS (SELECT user_id, ts, SUM(new_s) OVER "
            "(PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING "
            "AND CURRENT ROW) AS sid FROM flagged), "
            "per_sess AS (SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) "
            "AS n_events FROM sess GROUP BY user_id, sid) "
            "SELECT n_events, CAST(COUNT(*) AS BIGINT) AS n_sessions "
            "FROM per_sess GROUP BY n_events ORDER BY n_events"
        ),
        # end-to-end curation: md5-winner dedup, then the exact
        # quality/lang expressions from the twins above, then the filter.
        "corpus_curation": (
            "WITH d AS (SELECT doc_id, text, md5(text) AS h FROM documents), "
            "w AS (SELECT h, MIN(doc_id) AS doc_id FROM d GROUP BY h), "
            "k AS (SELECT d.doc_id, d.text FROM d JOIN w "
            "ON d.doc_id = w.doc_id AND d.h = w.h), "
            "q AS (SELECT doc_id, "
            "CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE) / length(text) AS punct_ratio, "
            "CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) / length(text) AS alpha_ratio, "
            "len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS nt, "
            "len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), "
            f"t -> t IN ({_sql_set('en')}))) AS ns, "
            f"len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), t -> t IN ({_sql_set('de')}))) AS c_de, "
            f"len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), t -> t IN ({_sql_set('es')}))) AS c_es, "
            f"len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), t -> t IN ({_sql_set('fr')}))) AS c_fr "
            "FROM k), s AS (SELECT doc_id, nt, ns, c_de, c_es, c_fr, "
            "GREATEST(0.0, LEAST(1.0, "
            "0.3 * LEAST(1.0, nt / 50) + 0.3 * alpha_ratio "
            "+ 0.2 * LEAST(1.0, (CASE WHEN nt = 0 THEN 0.0 ELSE CAST(ns AS DOUBLE) / nt END) * 5) "
            "+ 0.2 * (1.0 - LEAST(1.0, punct_ratio * 5)))) AS quality FROM q) "
            "SELECT doc_id, quality FROM s WHERE quality >= 0.5 "
            "AND NOT (nt = 0 OR (c_de = 0 AND ns = 0 AND c_es = 0 AND c_fr = 0)) "
            "AND NOT (c_de >= ns AND c_de >= c_es AND c_de >= c_fr) "
            "AND (ns >= c_es AND ns >= c_fr)"
        ),
        # doc fingerprints: md5 of the whitespace-normalized lowercase
        # text (explicit ASCII class — Python \s and RE2 \s disagree on \v).
        "doc_fingerprints": (
            "SELECT doc_id, md5(trim(regexp_replace(lower(text), "
            "'[ \t\n\f\r]+', ' ', 'g'), ' ')) AS fp FROM documents"
        ),
        # link extraction: DuckDB independently re-parses the SAME
        # synthesized pages (dumped by the query to a temp parquet —
        # the driver runs the Ray query first) with RE2 regexes. The
        # CASE mirrors absolute_links_in's quirk order (urls.go:47-67):
        # '//' first (=> the malformed https://// reproduction), then
        # root-relative, else verbatim; javascript:;/#anchor checks
        # happen BEFORE the ASCII-space trim (urls.go:96-101), the
        # empty-href drop after (brink.go:125-128).
        "crawl_extract_links": (
            f"WITH pages AS (SELECT url, decode(html) AS html "
            f"FROM read_parquet('{_EXTRACT_PAGES_PATH}')), "
            "tags AS (SELECT url, "
            "regexp_extract(url, '^(https?://[^/]+)', 1) AS hostpfx, "
            "unnest(regexp_extract_all(html, '<a(?:>|[ \t\n][^>]*>)', 0)) AS tag "
            "FROM pages), "
            "raw AS (SELECT url, hostpfx, "
            "regexp_extract(tag, 'href=\"([^\"]*)\"', 1) AS href0, "
            "regexp_extract(tag, 'target=\"([^\"]*)\"', 1) AS target FROM tags), "
            "kept AS (SELECT url, hostpfx, trim(href0, ' ') AS href1, target "
            "FROM raw WHERE href0 <> 'javascript:;' AND NOT starts_with(href0, '#')) "
            "SELECT CASE WHEN starts_with(href1, '//') THEN 'https://' || href1 "
            "WHEN starts_with(href1, '/') THEN hostpfx || href1 "
            "ELSE href1 END AS href, url AS linked_from, target "
            "FROM kept WHERE href1 <> ''"
        ),
        # ANN top-k: membership check (scores differ from DuckDB in the
        # last ulp; values are pytest-verified against ground truth).
        "ann_cosine_topk": (
            "WITH q AS (SELECT embedding FROM embeddings "
            "WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)) "
            "SELECT e.vec_id FROM embeddings e, q "
            "ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
            "CAST(q.embedding AS DOUBLE[])) DESC, e.vec_id LIMIT 10"
        ),
        # metadata-filtered ANN: the same brute-force ordering over the
        # lang-gated join (note the QUERY vector is the global MIN
        # vec_id row, unfiltered — the filter applies to candidates)
        "ann_filtered_topk": (
            "WITH q AS (SELECT embedding FROM embeddings "
            "WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)) "
            "SELECT e.vec_id FROM embeddings e "
            "JOIN documents d ON d.doc_id = e.vec_id, q "
            "WHERE d.lang = 'en' "
            "ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
            "CAST(q.embedding AS DOUBLE[])) DESC, e.vec_id LIMIT 10"
        ),
        # IVF with nprobe == nlist is exhaustive => identical top-k
        # membership to the brute-force twin above; this certifies the
        # IVF path (quantizer/assignment/probe) against SQL.
        "ann_ivf_exhaustive": (
            "WITH q AS (SELECT embedding FROM embeddings "
            "WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)) "
            "SELECT e.vec_id FROM embeddings e, q "
            "ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
            "CAST(q.embedding AS DOUBLE[])) DESC, e.vec_id LIMIT 10"
        ),
        # the persisted-index search is exact by the radius-bound
        # argument, so its membership twin is the same brute-force scan
        "ann_ivf_persisted": (
            "WITH q AS (SELECT embedding FROM embeddings "
            "WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)) "
            "SELECT e.vec_id FROM embeddings e, q "
            "ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
            "CAST(q.embedding AS DOUBLE[])) DESC, e.vec_id LIMIT 10"
        ),
        # exact IVF top-k with radius-bound pruning == brute force by
        # construction (probing stops only when no unprobed cell can
        # beat the k-th best) => same membership twin as the scan.
        # multi-query exact top-k membership (one pass, broadcast query
        # matrix on the Ray side; per-query window on the SQL side)
        "ann_multi_topk": (
            "WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings "
            "ORDER BY vec_id LIMIT 5), "
            "r AS (SELECT q.qid, e.vec_id, row_number() OVER ("
            "PARTITION BY q.qid ORDER BY "
            "list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
            "CAST(q.qe AS DOUBLE[])) DESC, e.vec_id) AS rnk "
            "FROM embeddings e, q) "
            "SELECT qid, vec_id FROM r WHERE rnk <= 10 ORDER BY qid, vec_id"
        ),
        # connected components over the exact Jaccard>=0.5 pair graph:
        # the twin labels each node with the MIN reachable doc_id via a
        # recursive CTE over the (brute-force-derived) edges.
        "dedup_clusters_exact": (
            "WITH RECURSIVE toks AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents), "
            "sh AS (SELECT doc_id, CASE WHEN len(t) < 3 "
            "THEN [array_to_string(t, ' ')] "
            "ELSE list_transform(range(1, len(t)-1), "
            "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END AS s FROM toks), "
            "p AS (SELECT a.doc_id AS u, b.doc_id AS v "
            "FROM sh a JOIN sh b ON a.doc_id < b.doc_id "
            "WHERE CAST(len(list_distinct(list_intersect(a.s, b.s))) AS DOUBLE) "
            "/ greatest(len(list_distinct(a.s || b.s)), 1) >= 0.5), "
            "e AS (SELECT u, v FROM p UNION ALL SELECT v, u FROM p), "
            "nodes AS (SELECT DISTINCT u AS node FROM e), "
            "lbl AS (SELECT node, node AS l FROM nodes "
            "UNION SELECT e.v, lbl.l FROM lbl JOIN e ON e.u = lbl.node "
            "WHERE lbl.l < e.v) "
            "SELECT node AS doc_id, CAST(MIN(l) AS BIGINT) AS cluster "
            "FROM lbl GROUP BY node ORDER BY doc_id"
        ),
        "ann_ivf_topk": (
            "WITH q AS (SELECT embedding FROM embeddings "
            "WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)) "
            "SELECT e.vec_id FROM embeddings e, q "
            "ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
            "CAST(q.embedding AS DOUBLE[])) DESC, e.vec_id LIMIT 10"
        ),
        # MinHash-LSH propose + exact-verify at t=0.5: the verified
        # subset is SQL-expressible (brute-force pairwise Jaccard) —
        # 1-row bands make LSH recall 1-(1-s)^64 (miss <= 5e-20 at the
        # threshold), so the equality is deterministic in practice.
        "dedup_minhash_lsh": (
            "WITH toks AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents), "
            "sh AS (SELECT doc_id, CASE WHEN len(t) < 3 "
            "THEN [array_to_string(t, ' ')] "
            "ELSE list_transform(range(1, len(t)-1), "
            "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END AS s FROM toks), "
            "p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "CAST(len(list_distinct(list_intersect(a.s, b.s))) AS DOUBLE) "
            "/ greatest(len(list_distinct(a.s || b.s)), 1) AS jaccard "
            "FROM sh a JOIN sh b ON a.doc_id < b.doc_id) "
            "SELECT doc_a, doc_b, jaccard FROM p WHERE jaccard >= 0.5 "
            "ORDER BY 1, 2"
        ),
        # exact prefix-filtered shingle join (recall 1 by the
        # AllPairs/PPJoin bound) — same brute-force twin as the
        # LSH-verified path above; two independent Ray code paths,
        # one oracle.
        "dedup_ngram_jaccard": (
            "WITH toks AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents), "
            "sh AS (SELECT doc_id, CASE WHEN len(t) < 3 "
            "THEN [array_to_string(t, ' ')] "
            "ELSE list_transform(range(1, len(t)-1), "
            "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END AS s FROM toks), "
            "p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "CAST(len(list_distinct(list_intersect(a.s, b.s))) AS DOUBLE) "
            "/ greatest(len(list_distinct(a.s || b.s)), 1) AS jaccard "
            "FROM sh a JOIN sh b ON a.doc_id < b.doc_id) "
            "SELECT doc_a, doc_b, jaccard FROM p WHERE jaccard >= 0.5 "
            "ORDER BY 1, 2"
        ),
        # SimHash at max_hamming=3: 4-chunk pigeonhole recall is EXACT
        # and the md5_number_lower token hash lets DuckDB re-derive the
        # 64-bit signatures independently (per-bit +/-1 majority vote,
        # packed into two BIGINT halves to stay inside shift range).
        "dedup_simhash": (
            "WITH toks AS (SELECT doc_id, "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok "
            "FROM documents), "
            "th AS (SELECT doc_id, md5_number_lower(tok)::UBIGINT AS h FROM toks), "
            "bits AS (SELECT doc_id, bb.b, "
            "SUM(CASE WHEN (h >> bb.b) & 1 = 1 THEN 1 ELSE -1 END) AS v "
            "FROM th, (SELECT unnest(generate_series(0, 63)) AS b) bb "
            "GROUP BY doc_id, bb.b), "
            "sig AS (SELECT doc_id, "
            "CAST(SUM(CASE WHEN v > 0 AND b < 32 THEN (1::BIGINT << b) "
            "ELSE 0 END) AS BIGINT) AS lo, "
            "CAST(SUM(CASE WHEN v > 0 AND b >= 32 THEN (1::BIGINT << (b - 32)) "
            "ELSE 0 END) AS BIGINT) AS hi FROM bits GROUP BY doc_id) "
            "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) "
            "AS BIGINT) AS hamming "
            "FROM sig a JOIN sig b ON a.doc_id < b.doc_id "
            "WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3 "
            "ORDER BY 1, 2"
        ),
        # hyperplane-LSH propose + exact cosine verify at 0.4 — same
        # membership as the brute-force twin (recall: 48 tables x 3
        # bits miss a true pair with p <= 1e-6; margin at the 0.4
        # boundary >= 1e-5 measured on all sfs).
        "embedding_dups": (
            "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) >= 0.4 ORDER BY 1, 2"
        ),
        # grouped-HLL register table: reg = top-12 bits of
        # md5_number_lower(str(user_id)), rank = leading zeros of the
        # low 52 bits + 1 — computed with exact bin()-string length
        # (floor(log2(2^k-1)) rounds UP at k >= 49; measured), max-
        # merged per (event_type, reg). Pins the sketch state itself.
        # distinct-token HLL register table (p=14; top-14 bits = reg,
        # leading zeros of the low 50 + 1 = rank via exact bin() length)
        "hll_distinct_tokens": (
            "WITH tk AS (SELECT unnest(regexp_extract_all(lower(text), "
            "'[a-z0-9]+')) AS tok FROM documents), "
            "h AS (SELECT md5_number_lower(tok)::UBIGINT AS h FROM tk), "
            "r AS (SELECT CAST(h >> 50 AS BIGINT) AS reg, "
            "CASE WHEN w = 0 THEN 51 "
            "ELSE 51 - length(ltrim(bin(w), '0')) END AS rk "
            "FROM (SELECT h, h & 1125899906842623::UBIGINT AS w FROM h)) "
            "SELECT reg, CAST(MAX(rk) AS BIGINT) AS \"rank\" FROM r "
            "GROUP BY reg ORDER BY reg"
        ),
        # count-min: the twin rebuilds the d x w counter table from the
        # md5 row hashes and probes min-over-rows for the exact top-20
        "cms_heavy_hitter_counts": (
            "WITH tk AS (SELECT unnest(regexp_extract_all(lower(text), "
            "'[a-z0-9]+')) AS tok FROM documents), "
            "cnt AS (SELECT tok, COUNT(*) AS c FROM tk GROUP BY tok), "
            "probe AS (SELECT tok AS token FROM cnt "
            "ORDER BY c DESC, tok LIMIT 20), "
            "rws AS (SELECT unnest(generate_series(0, 3)) AS j), "
            "cells AS (SELECT rws.j, "
            "md5_number_lower(CAST(rws.j AS VARCHAR) || ':' || cnt.tok)"
            "::UBIGINT % 8192 AS b, SUM(cnt.c) AS n "
            "FROM cnt, rws GROUP BY 1, 2) "
            "SELECT p.token, CAST(MIN(cells.n) AS BIGINT) AS n_est "
            "FROM probe p JOIN rws ON TRUE "
            "JOIN cells ON cells.j = rws.j AND cells.b = "
            "md5_number_lower(CAST(rws.j AS VARCHAR) || ':' || p.token)"
            "::UBIGINT % 8192 "
            "GROUP BY p.token ORDER BY p.token"
        ),
        "hll_users_per_event_type": (
            "WITH h AS (SELECT event_type, "
            "md5_number_lower(CAST(user_id AS VARCHAR))::UBIGINT AS h "
            "FROM events), "
            "r AS (SELECT event_type, CAST(h >> 52 AS BIGINT) AS reg, "
            "CASE WHEN w = 0 THEN 53 "
            "ELSE 53 - length(ltrim(bin(w), '0')) END AS rk "
            "FROM (SELECT event_type, h, "
            "h & 4503599627370495::UBIGINT AS w FROM h)) "
            "SELECT event_type, reg, CAST(MAX(rk) AS BIGINT) AS \"rank\" "
            "FROM r GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        # exact shingle-Jaccard kernel: DuckDB re-derives the 3-token
        # shingle SETS from the text (regexp tokenizer == TOKEN_RE,
        # list lambdas) and counts intersection/union independently of
        # the uint64 shingle-hash representation (hashing.py:44-66 —
        # equal strings hash equal; a 64-bit collision inside one
        # pair's union is ~1e-13 at these doc sizes). Single IEEE
        # division of exact ints => bit-identical float.
        "ngram_jaccard_exact": (
            "WITH toks AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents), "
            "sh AS (SELECT doc_id, CASE WHEN len(t) < 3 "
            "THEN [array_to_string(t, ' ')] "
            "ELSE list_transform(range(1, len(t)-1), "
            "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END AS shingles "
            "FROM toks), "
            "pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "a.shingles AS sa, b.shingles AS sb "
            "FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1 "
            "WHERE a.doc_id % 7 = 0) "
            "SELECT doc_a, doc_b, "
            "CAST(len(list_distinct(list_intersect(sa, sb))) AS DOUBLE) "
            "/ greatest(len(list_distinct(sa || sb)), 1) AS jaccard "
            "FROM pairs"
        ),
        # overlap-coefficient (containment) self-join: brute-force
        # all-pairs re-derivation from string shingles; the gate is the
        # same exact integer comparison 5*|∩| >= 4*min as the Ray
        # kernel (no float boundary), the value one IEEE division.
        "dedup_containment": (
            "WITH toks AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents), "
            "sh AS (SELECT doc_id, CASE WHEN len(t) < 3 "
            "THEN [array_to_string(t, ' ')] "
            "ELSE list_transform(range(1, len(t)-1), "
            "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END AS shingles "
            "FROM toks), "
            "d AS (SELECT doc_id, list_distinct(shingles) AS s FROM sh) "
            "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) "
            "/ greatest(least(len(a.s), len(b.s)), 1) AS overlap "
            "FROM d a JOIN d b ON a.doc_id < b.doc_id "
            "WHERE 5 * len(list_intersect(a.s, b.s)) "
            ">= 4 * greatest(least(len(a.s), len(b.s)), 1) "
            "ORDER BY doc_a, doc_b"
        ),
        # winnowing: full SQL re-derivation — k-grams via
        # generate_series+substr+md5_number_lower, per-window min via
        # a grouped join, rightmost tie-break via MAX(pos), distinct
        # selected positions, then exact-int count + mod-checksum.
        "winnowing_fingerprints": (
            "WITH d AS (SELECT doc_id, text, length(text) - 7 AS n "
            "FROM documents WHERE length(text) >= 11), "
            "px AS (SELECT doc_id, n, text, "
            "unnest(generate_series(1, n)) AS pos FROM d), "
            "pos AS (SELECT doc_id, n, pos, "
            "md5_number_lower(substr(text, pos, 8)) AS h FROM px), "
            "rws AS (SELECT unnest(generate_series(0, 3)) AS j), "
            "wpos AS (SELECT doc_id, pos + j AS we, pos, h "
            "FROM pos, rws "
            "WHERE pos + j >= 4 AND pos + j <= n), "
            "wmin AS (SELECT doc_id, we, MIN(h) AS mh "
            "FROM wpos GROUP BY doc_id, we), "
            "sel AS (SELECT w.doc_id, MAX(w.pos) AS spos FROM wpos w "
            "JOIN wmin m ON m.doc_id = w.doc_id AND m.we = w.we "
            "AND w.h = m.mh GROUP BY w.doc_id, w.we), "
            "fp AS (SELECT DISTINCT doc_id, spos FROM sel), "
            "hs AS (SELECT f.doc_id, p.h FROM fp f JOIN pos p "
            "ON p.doc_id = f.doc_id AND p.pos = f.spos) "
            "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fingerprints, "
            "CAST(SUM(h % 1000000007) AS BIGINT) AS fp_checksum "
            "FROM hs GROUP BY doc_id ORDER BY doc_id"
        ),
        # token-budget selection: greedy per-lang admission in md5
        # order until the inclusive running token total exceeds the
        # budget — one window SUM re-derives the distributed cumsum.
        "token_budget_sample": (
            "WITH t AS (SELECT lang, doc_id, md5(text) AS o, "
            "CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) "
            "AS n_tokens FROM documents), "
            "r AS (SELECT lang, doc_id, n_tokens, "
            "SUM(n_tokens) OVER (PARTITION BY lang ORDER BY o, doc_id) "
            "AS run FROM t) "
            "SELECT lang, doc_id, n_tokens FROM r WHERE run <= 5000 "
            "ORDER BY lang, doc_id"
        ),
        # crawl loop (ST1/ST3/D1/J2 composed): the seen set as a
        # recursive-CTE BFS fixpoint over the dumped pages — an
        # independent re-derivation of the stateful wave loop's result,
        # valid because membership and statuses are order-independent.
        "crawl_url_features": (
            _CRAWL_CTE
            + "SELECT r.canon AS url, "
            "CAST(len(list_filter(str_split("
            "regexp_extract(r.canon, '^https?://[^/?#]+([^?#]*)', 1), '/'), "
            "s -> s <> '')) AS BIGINT) AS depth, "
            "contains(r.canon, '?') AS has_query "
            "FROM reach r ORDER BY url"
        ),
        "crawl_events_sink": (
            _CRAWL_CTE
            + "SELECT r.canon AS url, CAST(COALESCE(i.status, 404) AS BIGINT) AS status "
            "FROM reach r LEFT JOIN idx i ON i.canon = r.canon ORDER BY url"
        ),
        # sink round-trip shares the seen-set fixpoint oracle: distinct
        # (url,status) over the sunk events IS the seen set (each fetched
        # canon appears as >=1 event carrying its one status).
        "crawl_seen_set": (
            _CRAWL_CTE
            + "SELECT r.canon AS url, CAST(COALESCE(i.status, 404) AS BIGINT) AS status "
            "FROM reach r LEFT JOIN idx i ON i.canon = r.canon ORDER BY url"
        ),
        # host stats (§2.5): every occurrence of a successfully fetched
        # canon is one handler event (first = fetched, rest = cached
        # replays, incl. intra-wave dup losers), so per-host counts
        # follow from edge multiplicities over the reachable graph.
        # exact embedding pairs: DuckDB re-derives every pairwise
        # cosine independently (list_cosine_similarity); membership at
        # the 0.4 boundary has >= 1e-5 margin on all sfs (measured), so
        # the last-ulp summation-order difference cannot flip a pair.
        "embedding_decontamination": (
            "WITH b AS (SELECT vec_id, embedding FROM embeddings "
            "ORDER BY vec_id LIMIT 5), "
            "m AS (SELECT e.vec_id, "
            "MAX(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[]))) AS mx "
            "FROM embeddings e CROSS JOIN b "
            "WHERE e.vec_id NOT IN (SELECT vec_id FROM b) "
            "GROUP BY e.vec_id) "
            "SELECT vec_id FROM m WHERE mx >= 0.3 ORDER BY vec_id"
        ),
        "embedding_dedup_survivors": (
            "WITH RECURSIVE p AS ("
            "SELECT a.vec_id AS va, b.vec_id AS vb FROM embeddings a "
            "JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) >= 0.4), "
            "e AS (SELECT va AS a, vb AS b FROM p "
            "UNION ALL SELECT vb, va FROM p), "
            "r AS (SELECT a AS v, a AS w FROM e "
            "UNION SELECT r.v, e.b FROM r JOIN e ON e.a = r.w), "
            "lbl AS (SELECT v, MIN(w) AS cluster FROM r GROUP BY v) "
            "SELECT vec_id FROM embeddings "
            "WHERE vec_id NOT IN (SELECT v FROM lbl) "
            "UNION ALL SELECT DISTINCT cluster AS vec_id FROM lbl "
            "ORDER BY vec_id"
        ),
        "embedding_dups_exact": (
            "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) >= 0.4"
        ),
        # decontamination: DuckDB re-derives the 3-token shingle sets
        # (same list-lambda kernel as ngram_jaccard_exact) and counts
        # distinct shared shingles against the benchmark union — an
        # independent check of the broadcast-set + searchsorted probe.
        "decontamination": (
            "WITH toks AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents), "
            "sh AS (SELECT doc_id, CASE WHEN len(t) < 3 "
            "THEN [array_to_string(t, ' ')] "
            "ELSE list_transform(range(1, len(t)-1), "
            "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END AS shingles "
            "FROM toks), "
            "bids AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 5), "
            "b AS (SELECT list_distinct(flatten(list(shingles))) AS bs "
            "FROM sh WHERE doc_id IN (SELECT doc_id FROM bids)) "
            "SELECT s.doc_id, "
            "CAST(len(list_distinct(list_intersect(s.shingles, b.bs))) AS BIGINT) "
            "AS n_overlap FROM sh s, b "
            "WHERE s.doc_id NOT IN (SELECT doc_id FROM bids) "
            "AND len(list_distinct(list_intersect(s.shingles, b.bs))) > 0"
        ),
        # repetition signals: each ratio is ONE IEEE division of exact
        # ints => bit-identical to the vectorized numpy kernel.
        "repetition_signals": (
            "WITH t AS (SELECT doc_id, "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok "
            "FROM documents), "
            "c AS (SELECT doc_id, tok, COUNT(*) AS n FROM t GROUP BY doc_id, tok) "
            "SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_tokens, "
            "CAST(COUNT(*) AS BIGINT) AS n_distinct, "
            "CAST(COUNT(*) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS distinct_ratio, "
            "CAST(MAX(n) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS top_token_frac "
            "FROM c GROUP BY doc_id"
        ),
        "stratified_sample_lang": (
            "SELECT lang, doc_id FROM ("
            "SELECT lang, doc_id, row_number() OVER "
            "(PARTITION BY lang ORDER BY md5(text), doc_id) AS rn "
            "FROM documents) WHERE rn <= 50"
        ),
        "totalprice_quantiles": (
            "WITH t AS (SELECT o_totalprice AS v FROM orders) "
            + " UNION ALL ".join(
                f"SELECT CAST({q} AS DOUBLE) AS q, "
                f"quantile_disc(v, {q}) AS value FROM t"
                for q in (0.25, 0.5, 0.75, 0.9, 0.99)
            )
        ),
        "customers_without_orders": (
            "SELECT c_custkey FROM customer c WHERE NOT EXISTS ("
            "SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
            "AND o.o_totalprice > 300000.0) ORDER BY c_custkey"
        ),
        "market_basket_pairs": (
            "WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) "
            "SELECT a.l_partkey AS item_a, b.l_partkey AS item_b, "
            "CAST(COUNT(*) AS BIGINT) AS n_groups "
            "FROM pp a JOIN pp b ON a.l_orderkey = b.l_orderkey "
            "AND a.l_partkey < b.l_partkey "
            "GROUP BY 1, 2 HAVING COUNT(*) >= 2 ORDER BY 1, 2"
        ),
        "part_supplier_counts": (
            "SELECT p.p_brand, CAST(p.p_size AS BIGINT) AS p_size, "
            "CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS n_supp "
            "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
            "WHERE p.p_type NOT LIKE 'STANDARD%' "
            "AND l.l_suppkey NOT IN "
            "(SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0) "
            "GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "rich_inactive_customers": (
            "WITH c AS (SELECT c_custkey, c_mktsegment, "
            "CAST(floor(c_acctbal*100.0) AS BIGINT) AS bal_cents FROM customer), "
            "pos AS (SELECT CAST(SUM(bal_cents) AS BIGINT) AS s, "
            "COUNT(*) AS n FROM c WHERE bal_cents > 0), "
            "recent AS (SELECT DISTINCT o_custkey FROM orders "
            "WHERE o_orderdate >= TIMESTAMP '2001-01-01') "
            "SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_cust, "
            "CAST(SUM(bal_cents) AS BIGINT) AS bal_cents "
            "FROM c, pos WHERE c.bal_cents * pos.n > pos.s "
            "AND c_custkey NOT IN (SELECT o_custkey FROM recent) "
            "GROUP BY 1 ORDER BY 1"
        ),
        "dataset_split": (
            "SELECT doc_id, CASE WHEN n < 12 THEN 'train' "
            "WHEN n < 14 THEN 'valid' ELSE 'test' END AS split "
            "FROM (SELECT doc_id, strpos('0123456789abcdef', "
            "substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1 AS n "
            "FROM documents) ORDER BY doc_id"
        ),
        "longest_streaks": (
            "WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day "
            "FROM events), "
            "r AS (SELECT user_id, day, row_number() OVER ("
            "PARTITION BY user_id ORDER BY day) AS rn FROM d), "
            "i AS (SELECT user_id, COUNT(*) AS len FROM r "
            "GROUP BY user_id, day - CAST(rn AS INTEGER)) "
            "SELECT user_id, CAST(MAX(len) AS BIGINT) AS streak "
            "FROM i GROUP BY user_id ORDER BY user_id"
        ),
        "snapshot_diff": (
            "WITH a AS (SELECT doc_id, md5(text) AS fp FROM documents), "
            "b AS (SELECT doc_id, md5(CASE WHEN doc_id % 13 = 0 "
            "THEN text || ' rev2' ELSE text END) AS fp FROM documents "
            "WHERE doc_id % 17 <> 0 "
            "UNION ALL SELECT doc_id + (1::BIGINT << 40), md5(text) FROM documents "
            "WHERE doc_id % 19 = 0) "
            "SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id, "
            "CASE WHEN b.doc_id IS NULL THEN 'removed' "
            "WHEN a.doc_id IS NULL THEN 'added' ELSE 'modified' END AS change "
            "FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id "
            "WHERE a.doc_id IS NULL OR b.doc_id IS NULL OR a.fp <> b.fp "
            "ORDER BY 1"
        ),
        "basket_triangles": (
            "WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), "
            "e AS (SELECT x.l_partkey AS ia, y.l_partkey AS ib "
            "FROM pp x JOIN pp y ON x.l_orderkey = y.l_orderkey "
            "AND x.l_partkey < y.l_partkey "
            "GROUP BY 1, 2 HAVING COUNT(*) >= 2) "
            "SELECT e1.ia AS a, e1.ib AS b, e2.ib AS c "
            "FROM e e1 JOIN e e2 ON e1.ib = e2.ia "
            "JOIN e e3 ON e3.ia = e1.ia AND e3.ib = e2.ib "
            "ORDER BY 1, 2, 3"
        ),
        "clustering_coefficients": (
            "WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), "
            "e AS (SELECT x.l_partkey AS ia, y.l_partkey AS ib "
            "FROM pp x JOIN pp y ON x.l_orderkey = y.l_orderkey "
            "AND x.l_partkey < y.l_partkey "
            "GROUP BY 1, 2 HAVING COUNT(*) >= 2), "
            "t AS (SELECT e1.ia AS a, e1.ib AS b, e2.ib AS c "
            "FROM e e1 JOIN e e2 ON e1.ib = e2.ia "
            "JOIN e e3 ON e3.ia = e1.ia AND e3.ib = e2.ib), "
            "tn AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri FROM ("
            "SELECT a AS node FROM t UNION ALL SELECT b FROM t "
            "UNION ALL SELECT c FROM t) GROUP BY 1), "
            "deg AS (SELECT node, COUNT(*) AS d FROM ("
            "SELECT ia AS node FROM e UNION ALL SELECT ib FROM e) GROUP BY 1) "
            "SELECT deg.node, CAST(COALESCE(tn.n_tri, 0) AS BIGINT) AS n_tri, "
            "CAST(deg.d * (deg.d - 1) // 2 AS BIGINT) AS n_wedges "
            "FROM deg LEFT JOIN tn ON deg.node = tn.node "
            "WHERE deg.d >= 2 ORDER BY deg.node"
        ),
        "small_quantity_revenue": (
            "WITH r AS (SELECT l_partkey, "
            "CAST(floor(l_quantity*100.0) AS BIGINT) AS qty_cents, "
            "CAST(floor(l_extendedprice*100.0) AS BIGINT) AS ep_cents "
            "FROM lineitem), "
            "q AS (SELECT l_partkey, CAST(SUM(qty_cents) AS BIGINT) AS s, "
            "COUNT(*) AS n FROM r GROUP BY 1) "
            "SELECT CAST(SUM(r.ep_cents) AS BIGINT) AS rev_cents, "
            "CAST(COUNT(*) AS BIGINT) AS n_rows "
            "FROM r JOIN q ON r.l_partkey = q.l_partkey "
            "WHERE r.qty_cents * 5 * q.n < q.s"
        ),
        "events_profile": (
            " UNION ALL ".join(
                f"SELECT '{c}' AS col, "
                f"CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls, "
                f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct "
                "FROM events"
                for c in sorted(
                    ["event_id", "ts", "user_id", "event_type", "value",
                     "props"]
                )
            )
            + " ORDER BY col"
        ),
        "funnel_steps": (
            "WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events "
            "WHERE event_type = 'view' GROUP BY 1), "
            "c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e "
            "JOIN v ON e.user_id = v.user_id AND e.ts >= v.t1 "
            "WHERE e.event_type = 'click' GROUP BY 1), "
            "p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e "
            "JOIN c ON e.user_id = c.user_id AND e.ts >= c.t2 "
            "WHERE e.event_type = 'purchase' GROUP BY 1) "
            "SELECT v.user_id, CAST(CASE WHEN p.user_id IS NOT NULL THEN 3 "
            "WHEN c.user_id IS NOT NULL THEN 2 ELSE 1 END AS BIGINT) "
            "AS max_step "
            "FROM v LEFT JOIN c ON v.user_id = c.user_id "
            "LEFT JOIN p ON v.user_id = p.user_id ORDER BY 1"
        ),
        "cdc_apply": (
            "SELECT doc_id, md5(CASE WHEN doc_id % 13 = 0 "
            "THEN text || ' rev2' ELSE text END) AS fp FROM documents "
            "WHERE doc_id % 17 <> 0 "
            "UNION ALL SELECT doc_id + (1::BIGINT << 40), md5(text) FROM documents "
            "WHERE doc_id % 19 = 0 ORDER BY 1"
        ),
        "graph_distances": (
            "WITH RECURSIVE pp AS (SELECT DISTINCT l_orderkey, l_partkey "
            "FROM lineitem), "
            "e AS (SELECT x.l_partkey AS ia, y.l_partkey AS ib "
            "FROM pp x JOIN pp y ON x.l_orderkey = y.l_orderkey "
            "AND x.l_partkey < y.l_partkey "
            "GROUP BY 1, 2 HAVING COUNT(*) >= 2), "
            "b AS (SELECT ia AS src, ib AS dst FROM e "
            "UNION ALL SELECT ib, ia FROM e), "
            "r(node, d) AS (SELECT (SELECT MIN(ia) FROM e), 0 "
            "UNION SELECT b.dst, r.d + 1 FROM r JOIN b ON r.node = b.src "
            "WHERE r.d < 6) "
            "SELECT node, CAST(MIN(d) AS BIGINT) AS dist FROM r "
            "GROUP BY 1 ORDER BY 1"
        ),
        "time_to_first_purchase": (
            "WITH c AS (SELECT user_id, MIN(ts) AS t FROM events "
            "WHERE event_type = 'click' GROUP BY 1), "
            "p AS (SELECT user_id, MIN(ts) AS t FROM events "
            "WHERE event_type = 'purchase' GROUP BY 1) "
            "SELECT c.user_id, date_diff('microsecond', c.t, p.t) AS delta_us "
            "FROM c JOIN p USING (user_id) WHERE p.t >= c.t ORDER BY 1"
        ),
        "sentence_stats": (
            "WITH s AS (SELECT doc_id, "
            "regexp_split_to_array(text, '[.!?]+') AS arr FROM documents), "
            "e AS (SELECT doc_id, unnest(generate_series(1, len(arr))) AS "
            "sent_idx, unnest(arr) AS frag FROM s) "
            "SELECT doc_id, CAST(sent_idx AS BIGINT) AS sent_idx, "
            "CAST(len(regexp_extract_all(frag, '\\S+')) AS BIGINT) AS n_tokens "
            "FROM e WHERE regexp_matches(frag, '\\S') "
            "ORDER BY doc_id, sent_idx"
        ),
        "event_deltas": (
            "SELECT user_id, event_id, COALESCE(date_diff('microsecond', "
            "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts), "
            "-1) AS delta_us FROM events ORDER BY user_id, event_id"
        ),
        "rolling_order_sums": (
            "SELECT o_custkey, o_orderkey, "
            "CAST(floor(o_totalprice*100.0) AS BIGINT) AS v_cents, "
            "CAST(SUM(CAST(floor(o_totalprice*100.0) AS BIGINT)) OVER ("
            "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
            "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS rolling_cents "
            "FROM orders ORDER BY o_custkey, o_orderkey"
        ),
        "latest_event_per_user": (
            "SELECT user_id, ts, event_id, event_type FROM ("
            "SELECT user_id, ts, event_id, event_type, row_number() OVER ("
            "PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn "
            "FROM events) WHERE rn = 1 ORDER BY user_id"
        ),
        "suppliers_with_returns": (
            "SELECT s_suppkey FROM supplier s WHERE EXISTS ("
            "SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey "
            "AND l.l_returnflag = 'R' AND l.l_quantity > 49.0 "
            "AND l.l_extendedprice > 55000.0) ORDER BY s_suppkey"
        ),
        "pricing_summary": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(COUNT(*) AS BIGINT) AS n_rows, "
            "CAST(SUM(CAST(floor(l_quantity*100.0) AS BIGINT)) AS BIGINT) "
            "AS sum_qty_cents, "
            "CAST(SUM(CAST(floor(l_extendedprice*100.0) AS BIGINT)) AS BIGINT) "
            "AS sum_base_cents, "
            "CAST(SUM(CAST(floor(l_extendedprice*(1-l_discount)*100.0) AS BIGINT)) "
            "AS BIGINT) AS sum_disc_cents, "
            "CAST(SUM(CAST(floor(l_extendedprice*(1-l_discount)*(1+l_tax)*100.0) "
            "AS BIGINT)) AS BIGINT) AS sum_charge_cents "
            "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01' "
            "GROUP BY l_returnflag, l_linestatus "
            "ORDER BY l_returnflag, l_linestatus"
        ),
        "lang_source_rollup": (
            "SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n FROM documents "
            "GROUP BY ROLLUP(lang, source) "
            "ORDER BY lang NULLS FIRST, source NULLS FIRST, n"
        ),
        "lang_source_cube": (
            "SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n FROM documents "
            "GROUP BY CUBE(lang, source) "
            "ORDER BY lang NULLS FIRST, source NULLS FIRST, n"
        ),
        "totalprice_histogram": (
            "SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bucket, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM orders "
            "GROUP BY 1 ORDER BY bucket"
        ),
        "user_activity_histogram": (
            "WITH per_user AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) "
            "AS n_events FROM events GROUP BY user_id) "
            "SELECT n_events, CAST(COUNT(*) AS BIGINT) AS n_users "
            "FROM per_user GROUP BY n_events ORDER BY n_events"
        ),
        "qty_price_corr_stats": (
            "WITH t AS (SELECT l_returnflag, "
            "CAST(floor(l_quantity) AS BIGINT) AS x, "
            "CAST(floor(l_extendedprice) AS BIGINT) AS y FROM lineitem) "
            "SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(x) AS BIGINT) AS sum_x, CAST(SUM(y) AS BIGINT) AS sum_y, "
            "CAST(SUM(x*x) AS BIGINT) AS sum_xx, "
            "CAST(SUM(y*y) AS BIGINT) AS sum_yy, "
            "CAST(SUM(x*y) AS BIGINT) AS sum_xy "
            "FROM t GROUP BY l_returnflag ORDER BY l_returnflag"
        ),
        "customer_order_totals": (
            "SELECT c.c_custkey, c.c_name, "
            "CAST(COALESCE(o.n, 0) AS BIGINT) AS n_orders, "
            "CAST(COALESCE(o.s, 0) AS BIGINT) AS spend_cents "
            "FROM customer c LEFT JOIN ("
            "SELECT o_custkey, COUNT(*) AS n, "
            "SUM(CAST(floor(o_totalprice * 100.0) AS BIGINT)) AS s "
            "FROM orders GROUP BY o_custkey) o "
            "ON c.c_custkey = o.o_custkey ORDER BY c.c_custkey"
        ),
        "lang_share": (
            "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(COUNT(*) AS DOUBLE) / "
            "(SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) AS share "
            "FROM documents GROUP BY lang ORDER BY lang"
        ),
        "orders_by_dow": (
            "SELECT CAST(isodow(o_orderdate) AS BIGINT) AS dow, "
            "CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(CAST(floor(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) "
            "AS total_cents FROM orders GROUP BY 1 ORDER BY dow"
        ),
        "event_transitions": (
            "WITH s AS (SELECT user_id, event_type, "
            "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
            "AS prev_type FROM events) "
            "SELECT prev_type, event_type AS next_type, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM s "
            "WHERE prev_type IS NOT NULL "
            "GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "user_days_active": (
            "SELECT user_id, "
            "CAST(COUNT(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n_days "
            "FROM events GROUP BY user_id ORDER BY user_id"
        ),
        "orders_above_customer_avg": (
            "WITH t AS (SELECT o_custkey, o_orderkey, "
            "CAST(floor(o_totalprice * 100.0) AS BIGINT) AS v_cents "
            "FROM orders), "
            "a AS (SELECT o_custkey, CAST(SUM(v_cents) AS BIGINT) AS s, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY 1) "
            "SELECT t.o_orderkey, t.o_custkey, t.v_cents FROM t "
            "JOIN a ON t.o_custkey = a.o_custkey "
            "WHERE t.v_cents * a.n > a.s ORDER BY t.o_orderkey"
        ),
        "top_orders_global": (
            "SELECT o_orderkey, "
            "CAST(floor(o_totalprice * 100.0) AS BIGINT) AS price_cents "
            "FROM orders ORDER BY price_cents DESC, o_orderkey LIMIT 100"
        ),
        "daily_active_users": (
            "SELECT date_trunc('day', ts) AS day, "
            "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct "
            "FROM events GROUP BY 1 ORDER BY day"
        ),
        "region_nation_cross": (
            "SELECT n_name, r_name FROM nation CROSS JOIN region "
            "ORDER BY n_name, r_name"
        ),
        "long_doc_outliers": (
            "SELECT doc_id, n_chars FROM documents "
            "WHERE n_chars >= (SELECT quantile_disc(n_chars, 0.99) "
            "FROM documents) ORDER BY doc_id"
        ),
        "user_click_purchase_counts": (
            "WITH c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_left "
            "FROM events WHERE event_type = 'click' GROUP BY 1), "
            "p AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_right "
            "FROM events WHERE event_type = 'purchase' GROUP BY 1) "
            "SELECT COALESCE(c.user_id, p.user_id) AS user_id, "
            "CAST(COALESCE(c.n_left, 0) AS BIGINT) AS n_left, "
            "CAST(COALESCE(p.n_right, 0) AS BIGINT) AS n_right "
            "FROM c FULL JOIN p ON c.user_id = p.user_id ORDER BY user_id"
        ),
        "inverted_index": (
            "WITH tok AS (SELECT DISTINCT doc_id, "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token "
            "FROM documents) "
            "SELECT token, CAST(COUNT(*) AS BIGINT) AS df, "
            "string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) "
            "AS postings FROM tok GROUP BY token "
            "HAVING COUNT(*) BETWEEN 2 AND 1000 ORDER BY token"
        ),
        # postings compression: delta gaps via LAG, LEB128 byte count
        # via the exact bin()-length bit-length idiom (float log2 would
        # round wrong at 2^k boundaries).
        "postings_varint_bytes": (
            "WITH tok AS (SELECT DISTINCT doc_id, "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token "
            "FROM documents), "
            "dfs AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df "
            "FROM tok GROUP BY token "
            "HAVING COUNT(*) BETWEEN 2 AND 1000), "
            "g AS (SELECT t.token, t.doc_id, t.doc_id - "
            "LAG(t.doc_id) OVER (PARTITION BY t.token ORDER BY t.doc_id) "
            "AS gap FROM tok t JOIN dfs ON dfs.token = t.token), "
            "v AS (SELECT token, COALESCE(gap, doc_id) AS val FROM g), "
            "b AS (SELECT token, GREATEST(1, "
            "CAST(ceil(length(bin(val)) / 7.0) AS BIGINT)) AS nb FROM v) "
            "SELECT b.token, dfs.df, CAST(SUM(b.nb) AS BIGINT) "
            "AS varint_bytes FROM b JOIN dfs ON dfs.token = b.token "
            "GROUP BY b.token, dfs.df ORDER BY b.token"
        ),
        "script_ratios": (
            "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, "
            "CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) "
            "AS n_ascii_alpha, "
            "CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) "
            "AS n_digit, "
            "CAST(len(regexp_extract_all(text, '[\\t\\n\\x0b\\x0c\\r ]')) "
            "AS BIGINT) AS n_space, "
            "CAST(len(regexp_extract_all(text, '[^\\x00-\\x7f]')) "
            "AS BIGINT) AS n_non_ascii "
            "FROM documents ORDER BY doc_id"
        ),
        # proportional allocation: floor shares + largest-remainder
        # rounding (ties by stratum key), then md5-first quota fill
        "proportional_sample": (
            "WITH c AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) "
            "AS c FROM documents GROUP BY lang, source), "
            "tot AS (SELECT CAST(SUM(c) AS BIGINT) AS C FROM c), "
            "b AS (SELECT lang, source, c, "
            "(200 * c) // (SELECT C FROM tot) AS base, "
            "(200 * c) % (SELECT C FROM tot) AS rem FROM c), "
            "f AS (SELECT *, row_number() OVER ("
            "ORDER BY rem DESC, lang, source) AS rr FROM b), "
            "al AS (SELECT lang, source, base + CASE WHEN rr <= "
            "200 - (SELECT CAST(SUM(base) AS BIGINT) FROM b) "
            "THEN 1 ELSE 0 END AS k FROM f), "
            "rk AS (SELECT d.lang, d.source, d.doc_id, "
            "row_number() OVER (PARTITION BY d.lang, d.source "
            "ORDER BY md5(d.text), d.doc_id) AS rn FROM documents d) "
            "SELECT r.lang, r.source, r.doc_id FROM rk r "
            "JOIN al a ON a.lang = r.lang AND a.source = r.source "
            "WHERE r.rn <= a.k ORDER BY r.lang, r.source, r.doc_id"
        ),
        # power iteration in HUGEINT: Gram via a vec_id self-join over
        # unnested dims (CAST to DOUBLE before the ppm floor — a FLOAT
        # multiply would round differently), two unrolled iterations,
        # max-abs normalization with truncating // (matches the
        # kernel's tdiv)
        "embedding_top_component": (
            "WITH ii AS (SELECT unnest(generate_series(1, 16)) AS i), "
            "x AS (SELECT vec_id, ii.i, CAST(floor("
            "CAST(embedding[ii.i] AS DOUBLE) * 1000000) AS BIGINT) AS v "
            "FROM embeddings, ii), "
            "g AS (SELECT a.i AS i, b.i AS j, "
            "CAST(SUM(CAST(a.v AS HUGEINT) * b.v) AS HUGEINT) AS g "
            "FROM x a JOIN x b ON a.vec_id = b.vec_id GROUP BY a.i, b.i), "
            "w1 AS (SELECT i, SUM(g * CAST(1000000 AS HUGEINT)) AS w "
            "FROM g GROUP BY i), "
            "m1 AS (SELECT MAX(ABS(w)) AS m FROM w1), "
            "v1 AS (SELECT i, (w * CAST(1000000 AS HUGEINT)) "
            "// (SELECT m FROM m1) AS v FROM w1), "
            "w2 AS (SELECT g.i, SUM(g.g * v1.v) AS w FROM g "
            "JOIN v1 ON v1.i = g.j GROUP BY g.i), "
            "m2 AS (SELECT MAX(ABS(w)) AS m FROM w2), "
            "v2 AS (SELECT i, (w * CAST(1000000 AS HUGEINT)) "
            "// (SELECT m FROM m2) AS v FROM w2) "
            "SELECT i AS dim, CAST(v AS BIGINT) AS v FROM v2 ORDER BY dim"
        ),
        # Heaps curve: global first-occurrence positions via a window
        # SUM over doc token counts + zip-unnest ordinality, thresholds
        # 2^k (power(2,k) is exact in float64) plus the full corpus.
        "phrase_search": (
            "WITH d AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '[a-z0-9]+') AS t "
            "FROM documents), "
            "pos AS (SELECT doc_id, unnest(t) AS tok, "
            "unnest(generate_series(1, len(t))) AS p FROM d), "
            "m AS (SELECT p0.doc_id, p0.p AS p FROM pos p0 "
            "JOIN pos p1 ON p1.doc_id = p0.doc_id AND p1.p = p0.p + 1 "
            "AND p1.tok = 'window' WHERE p0.tok = 'batch') "
            "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches, "
            "CAST(MIN(p) AS BIGINT) AS first_pos "
            "FROM m GROUP BY doc_id ORDER BY doc_id"
        ),
        "unigram_surprisal": (
            "WITH tok AS (SELECT doc_id, "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token "
            "FROM documents), "
            "c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM tok "
            "GROUP BY token), "
            "u AS (SELECT CAST(COUNT(*) AS BIGINT) AS u FROM tok) "
            "SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens, "
            "CAST(SUM(length(bin(u.u)) - length(bin(c.c))) AS BIGINT) "
            "AS surprisal_bits, "
            "CAST(CAST(SUM(length(bin(u.u)) - length(bin(c.c))) AS BIGINT) "
            "* 1000 // COUNT(*) AS BIGINT) AS mean_surprisal_milli "
            "FROM tok t JOIN c USING (token) CROSS JOIN u "
            "GROUP BY t.doc_id ORDER BY t.doc_id"
        ),
        "vocab_growth": (
            "WITH d AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '[a-z0-9]+') AS t "
            "FROM documents), "
            "off AS (SELECT doc_id, t, COALESCE(SUM(len(t)) OVER ("
            "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING "
            "AND 1 PRECEDING), 0) AS pre FROM d), "
            "pos AS (SELECT pre + ti - 1 AS gpos, tok FROM ("
            "SELECT pre, unnest(t) AS tok, "
            "unnest(generate_series(1, len(t))) AS ti FROM off)), "
            "f AS (SELECT tok, MIN(gpos) AS fp FROM pos GROUP BY tok), "
            "tot AS (SELECT CAST(SUM(len(t)) AS BIGINT) AS n FROM d), "
            "ks AS (SELECT unnest(generate_series(7, 62)) AS k), "
            "th AS (SELECT CAST(power(2, k) AS BIGINT) AS n_prefix "
            "FROM ks WHERE CAST(power(2, k) AS BIGINT) < "
            "(SELECT n FROM tot) "
            "UNION ALL SELECT n FROM tot) "
            "SELECT th.n_prefix, CAST(COUNT(*) FILTER ("
            "WHERE f.fp < th.n_prefix) AS BIGINT) AS vocab "
            "FROM th CROSS JOIN f GROUP BY th.n_prefix "
            "ORDER BY th.n_prefix"
        ),
        "user_event_sequences": (
            "SELECT user_id, string_agg(event_type, '>' "
            "ORDER BY ts, event_id) AS seq FROM events "
            "GROUP BY user_id ORDER BY user_id"
        ),
        "click_minus_purchase_bag": (
            "WITH c AS (SELECT user_id, date_trunc('day', ts) AS d "
            "FROM events WHERE event_type = 'click'), "
            "p AS (SELECT user_id, date_trunc('day', ts) AS d "
            "FROM events WHERE event_type = 'purchase'), "
            "e AS (SELECT * FROM c EXCEPT ALL SELECT * FROM p) "
            "SELECT user_id, d, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM e GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        # PMI: HUGEINT keeps n_ab*U^2*1e6 exact; floor division both
        # sides (DuckDB // == Python // for positive ints)
        # span-REMOVAL twin: positions covered by shared windows are
        # re-derived in SQL (window join + position unnest), survivors
        # re-joined in position order
        "dup_span_scrub": (
            "WITH toks AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents), "
            "idx AS (SELECT doc_id, t, unnest(range(1, len(t) - 10)) AS i "
            "FROM toks WHERE len(t) >= 12), "
            "wins AS (SELECT doc_id, i, "
            "md5(array_to_string(t[i:i+11], ' ')) AS w FROM idx), "
            "shared AS (SELECT w FROM (SELECT DISTINCT doc_id, w FROM wins) "
            "GROUP BY w HAVING COUNT(*) >= 2), "
            "cover AS (SELECT DISTINCT wins.doc_id, "
            "unnest(generate_series(wins.i, wins.i + 11)) AS p "
            "FROM wins JOIN shared USING (w)), "
            "tokpos AS (SELECT doc_id, t[p] AS tok, p FROM "
            "(SELECT doc_id, t, unnest(generate_series(1, len(t))) AS p "
            "FROM toks)), "
            "kept AS (SELECT tp.doc_id, tp.p, tp.tok FROM tokpos tp "
            "LEFT JOIN cover c ON c.doc_id = tp.doc_id AND c.p = tp.p "
            "WHERE c.p IS NULL), "
            "agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept, "
            "string_agg(tok, ' ' ORDER BY p) AS txt FROM kept GROUP BY doc_id), "
            "nt AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks) "
            "SELECT nt.doc_id, nt.n_tokens, "
            "nt.n_tokens - CAST(COALESCE(agg.n_kept, 0) AS BIGINT) AS n_removed, "
            "COALESCE(agg.txt, '') AS text_scrubbed "
            "FROM nt LEFT JOIN agg ON agg.doc_id = nt.doc_id ORDER BY nt.doc_id"
        ),
        "sequence_packing": (
            "WITH c AS (SELECT doc_id, "
            "CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens "
            "FROM documents), "
            "p AS (SELECT doc_id, n_tokens, CAST(COALESCE(SUM(n_tokens) OVER ("
            "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"
            "), 0) AS BIGINT) AS pre FROM c) "
            "SELECT doc_id, n_tokens, pre // 512 AS bin, pre % 512 AS offset "
            "FROM p ORDER BY doc_id"
        ),
        "gopher_quality": (
            "WITH w AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws "
            "FROM documents), "
            "s AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words, "
            "CAST(COALESCE(list_sum(list_transform(ws, x -> length(x))), 0) "
            "AS BIGINT) AS sum_word_len, "
            "CAST(len(list_distinct(list_filter(ws, "
            "x -> x IN ('the', 'a', 'and', 'of', 'to')))) AS BIGINT) AS n_stop "
            "FROM w) "
            "SELECT doc_id, n_words, sum_word_len, n_stop, "
            "n_words BETWEEN 50 AND 100000 AS ok_words, "
            "(4 * n_words <= sum_word_len AND sum_word_len <= 10 * n_words "
            "AND n_words > 0) AS ok_mean_len, "
            "n_stop >= 2 AS ok_stopwords, "
            "(n_words BETWEEN 50 AND 100000) AND "
            "(4 * n_words <= sum_word_len AND sum_word_len <= 10 * n_words "
            "AND n_words > 0) AND n_stop >= 2 AS keep "
            "FROM s ORDER BY doc_id"
        ),
        # DSIR: ratio_ppm = n_target*1e6 // n_all per bigram; doc weight
        # = sum over its bigram OCCURRENCES (so the per-doc join fans
        # out positions, not distinct grams)
        "dsir_weights": (
            "WITH t AS (SELECT doc_id, lang, "
            "regexp_extract_all(lower(text), '[a-z0-9]+') AS tk "
            "FROM documents), "
            "z AS (SELECT doc_id, lang, "
            "unnest(generate_series(1, len(tk) - 1)) AS i, tk "
            "FROM t WHERE len(tk) > 1), "
            "bg AS (SELECT doc_id, lang, tk[i] || ' ' || tk[i + 1] AS g "
            "FROM z), "
            "r AS (SELECT g, (SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) "
            "* 1000000) // COUNT(*) AS ppm FROM bg GROUP BY g) "
            "SELECT d.doc_id, "
            "CAST(COALESCE(s.nb, 0) AS BIGINT) AS n_bigrams, "
            "CAST(COALESCE(s.w, 0) AS BIGINT) AS weight_ppm "
            "FROM documents d LEFT JOIN "
            "(SELECT bg.doc_id, COUNT(*) AS nb, SUM(r.ppm) AS w "
            "FROM bg JOIN r ON r.g = bg.g GROUP BY bg.doc_id) s "
            "ON s.doc_id = d.doc_id ORDER BY d.doc_id"
        ),
        "bigram_pmi": (
            "WITH t AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') "
            "AS tk FROM documents), "
            "uni AS (SELECT unnest(tk) AS tok FROM t), "
            "u AS (SELECT tok, CAST(COUNT(*) AS HUGEINT) AS n "
            "FROM uni GROUP BY tok), "
            "ut AS (SELECT SUM(n) AS uu FROM u), "
            "z AS (SELECT unnest(generate_series(1, len(tk) - 1)) AS i, tk "
            "FROM t WHERE len(tk) > 1), "
            "bg AS (SELECT tk[i] AS a, tk[i + 1] AS b, "
            "CAST(COUNT(*) AS HUGEINT) AS n_ab FROM z GROUP BY 1, 2), "
            "bt AS (SELECT SUM(n_ab) AS bb FROM bg) "
            "SELECT a || ' ' || b AS bigram, CAST(n_ab AS BIGINT) AS n_ab, "
            "CAST((n_ab * ut.uu * ut.uu * 1000000) "
            "// (bt.bb * ua.n * ub.n) AS BIGINT) AS pmi_ppm "
            "FROM bg JOIN u ua ON ua.tok = bg.a JOIN u ub ON ub.tok = bg.b, "
            "ut, bt WHERE n_ab >= 5 ORDER BY bigram"
        ),
        "top_bigrams": (
            "WITH t AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') "
            "AS tk FROM documents), "
            "z AS (SELECT unnest(generate_series(1, len(tk) - 1)) AS i, tk "
            "FROM t WHERE len(tk) > 1) "
            "SELECT tk[i] || ' ' || tk[i + 1] AS bigram, "
            "CAST(COUNT(*) AS BIGINT) AS n "
            "FROM z GROUP BY 1 ORDER BY n DESC, bigram LIMIT 20"
        ),
        "daily_counts_gapfill": (
            "WITH d AS (SELECT date_trunc('day', ts) AS day, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1), "
            "b AS (SELECT unnest(generate_series("
            "(SELECT MIN(day) FROM d), (SELECT MAX(day) FROM d), "
            "INTERVAL 1 DAY)) AS day) "
            "SELECT b.day AS day, CAST(COALESCE(d.n, 0) AS BIGINT) AS n "
            "FROM b LEFT JOIN d ON b.day = d.day ORDER BY day"
        ),
        "doc_chunks": (
            "WITH toks AS (SELECT doc_id, "
            "regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents) "
            "SELECT doc_id, CAST(g.i AS BIGINT) AS chunk_id, "
            "CAST(least(64, len(tk) - g.i*64) AS BIGINT) AS n_tokens, "
            "md5(array_to_string(tk[(g.i*64+1):((g.i+1)*64)], ' ')) AS chunk_md5 "
            "FROM toks, LATERAL UNNEST(generate_series(0, "
            "CAST(ceil(len(tk)/64.0) AS BIGINT)-1)) AS g(i) "
            "ORDER BY doc_id, chunk_id"
        ),
        "grouped_token_quantiles": (
            "WITH t AS (SELECT lang, "
            "len(regexp_extract_all(text, '\\S+')) AS n FROM documents) "
            + " UNION ALL ".join(
                f"SELECT lang, CAST({q} AS DOUBLE) AS q, "
                f"CAST(quantile_disc(n, {q}) AS BIGINT) AS n_tokens "
                "FROM t GROUP BY lang"
                for q in (0.5, 0.9)
            )
        ),
        "tf_df_scores": (
            "WITH t AS (SELECT doc_id, "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token "
            "FROM documents), "
            "tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf "
            "FROM t GROUP BY doc_id, token), "
            "df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df "
            "FROM tf GROUP BY token) "
            "SELECT tf.doc_id, tf.token, tf.tf, df.df, "
            "CAST((tf.tf * 1000000) // df.df AS BIGINT) AS tfidf_ppm "
            "FROM tf JOIN df USING (token)"
        ),
        "top_docs_per_lang": (
            "SELECT lang, doc_id, n_tokens FROM ("
            "SELECT lang, doc_id, "
            "CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens, "
            "row_number() OVER (PARTITION BY lang ORDER BY "
            "len(regexp_extract_all(text, '\\S+')) DESC, doc_id) AS rn "
            "FROM documents) WHERE rn <= 3"
        ),
        "heavy_hitters": (
            "WITH t AS (SELECT "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token "
            "FROM documents) "
            "SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM t "
            "GROUP BY token ORDER BY n DESC, token LIMIT 20"
        ),
        # shard packing: the per-shard canonical order and cumulative
        # token offsets are pure window arithmetic over exact ints.
        "pack_shards": (
            "WITH d AS (SELECT doc_id, md5(text) AS h, "
            "strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1 AS shard, "
            "len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens "
            "FROM documents) "
            "SELECT doc_id, CAST(shard AS BIGINT) AS shard, "
            "CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY h, doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens "
            "AS BIGINT) AS token_offset FROM d"
        ),
        # export sink manifest: shard membership and token totals are
        # pure arithmetic over md5/token counts — the oracle certifies
        # WHAT the writer placed in each partition (the file layout
        # itself is pinned by pytest).
        "export_manifest": (
            "WITH d AS (SELECT "
            "strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1 AS shard, "
            "len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens "
            "FROM documents) "
            "SELECT CAST(shard AS BIGINT) AS shard, "
            "CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(n_tokens) AS BIGINT) AS n_tokens FROM d GROUP BY shard"
        ),
        "dedup_incremental": (
            "WITH f AS (SELECT doc_id, source, md5(array_to_string("
            "regexp_split_to_array(trim(text), '\\s+')[1:6], ' ')) AS fp "
            "FROM documents) "
            "SELECT n.doc_id, n.fp FROM f n WHERE n.source = 'src0' "
            "AND NOT EXISTS (SELECT 1 FROM f c WHERE c.source <> 'src0' "
            "AND c.fp = n.fp) ORDER BY n.doc_id"
        ),
        "partition_pruned_read": (
            "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(length(text)) AS BIGINT) AS n_chars, "
            "CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id "
            "FROM documents WHERE lang IN ('en', 'de') "
            "GROUP BY lang ORDER BY lang"
        ),
        "jsonl_roundtrip": (
            "SELECT CAST((strpos('0123456789abcdef', substr(md5(text), 1, 1)) "
            "- 1) % 16 AS BIGINT) AS shard, "
            "CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(length(text)) AS BIGINT) AS n_chars "
            "FROM documents GROUP BY shard ORDER BY shard"
        ),
        # the CSV pair certifies the identical invariant (manifest
        # re-derived from the original table) through a different
        # format + reader, so it shares the jsonl twin's SQL
        # text-lines pair: same invariant, third format/reader
        "text_roundtrip": (
            "SELECT CAST((strpos('0123456789abcdef', substr(md5(text), 1, 1)) "
            "- 1) % 16 AS BIGINT) AS shard, "
            "CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(length(text)) AS BIGINT) AS n_chars "
            "FROM documents GROUP BY shard ORDER BY shard"
        ),
        "csv_roundtrip": (
            "SELECT CAST((strpos('0123456789abcdef', substr(md5(text), 1, 1)) "
            "- 1) % 16 AS BIGINT) AS shard, "
            "CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(length(text)) AS BIGINT) AS n_chars "
            "FROM documents GROUP BY shard ORDER BY shard"
        ),
        "revenue_by_priority_nation": (
            "SELECT o.o_orderpriority, n.n_name, "
            "CAST(SUM(CAST(floor(l.l_extendedprice*(1.0-l.l_discount)*100.0) "
            "AS BIGINT)) AS BIGINT) AS rev_cents "
            "FROM lineitem l "
            "JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "JOIN customer c ON o.o_custkey = c.c_custkey "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "GROUP BY o_orderpriority, n_name "
            "ORDER BY o_orderpriority, n_name"
        ),
        "label_centroids": (
            "WITH ex AS (SELECT label, "
            "unnest(generate_series(0, len(embedding)-1)) AS dim, "
            "unnest(embedding) AS v FROM embeddings) "
            "SELECT label, CAST(dim AS BIGINT) AS dim, "
            "CAST(SUM(CAST(floor(CAST(v AS DOUBLE)*1000000.0) AS BIGINT)) "
            "AS BIGINT) AS s_micro, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM ex GROUP BY label, dim ORDER BY label, dim"
        ),
        "click_purchase_same_day": (
            "SELECT user_id, date_trunc('day', ts) AS d FROM events "
            "WHERE event_type = 'click' "
            "INTERSECT "
            "SELECT user_id, date_trunc('day', ts) AS d FROM events "
            "WHERE event_type = 'purchase' ORDER BY user_id, d"
        ),
        "click_no_purchase_days": (
            "SELECT user_id, date_trunc('day', ts) AS d FROM events "
            "WHERE event_type = 'click' "
            "EXCEPT "
            "SELECT user_id, date_trunc('day', ts) AS d FROM events "
            "WHERE event_type = 'purchase' ORDER BY user_id, d"
        ),
        "funnel_attribution": (
            "WITH c AS (SELECT user_id, ts, event_id FROM events "
            "WHERE event_type = 'click'), "
            "p AS (SELECT user_id, ts, event_id FROM events "
            "WHERE event_type = 'purchase') "
            "SELECT p.user_id AS user_id, p.event_id AS dst_id, "
            "CAST(COALESCE(c.event_id, -1) AS BIGINT) AS src_id "
            "FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts "
            "AND c.ts + INTERVAL 24 HOUR >= p.ts "
            "QUALIFY row_number() OVER (PARTITION BY p.event_id "
            "ORDER BY c.ts DESC, c.event_id DESC) = 1 "
            "ORDER BY p.user_id, dst_id"
        ),
        "props_k_stats": (
            "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(0 AS BIGINT) AS n_bad, "
            "CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) "
            "AS BIGINT) AS k_sum, "
            "CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) "
            "AS BIGINT) AS k_min, "
            "CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) "
            "AS BIGINT) AS k_max "
            "FROM events GROUP BY event_type ORDER BY event_type"
        ),
        "biggest_order_per_customer": (
            "SELECT o_custkey, o_totalprice, o_orderkey, o_orderdate FROM ("
            "SELECT o_custkey, o_totalprice, o_orderkey, o_orderdate, "
            "row_number() OVER (PARTITION BY o_custkey "
            "ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn FROM orders) "
            "WHERE rn = 1 ORDER BY o_custkey"
        ),
        "top_tokens_per_lang": (
            "WITH tok AS (SELECT lang, "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok "
            "FROM documents), "
            "cnt AS (SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c "
            "FROM tok GROUP BY lang, tok) "
            "SELECT lang, c, tok FROM ("
            "SELECT lang, tok, c, row_number() OVER (PARTITION BY lang "
            "ORDER BY c DESC, tok ASC) AS rn FROM cnt) "
            "WHERE rn <= 3 ORDER BY lang, c DESC, tok"
        ),
        "doc_token_quartiles": (
            "WITH t AS (SELECT doc_id, "
            "CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens "
            "FROM documents), "
            "r AS (SELECT doc_id, n_tokens, "
            "CAST(row_number() OVER (ORDER BY n_tokens, doc_id) - 1 AS BIGINT) "
            "AS rnk FROM t) "
            "SELECT doc_id, n_tokens, rnk, "
            "CAST((rnk * 4) // (SELECT COUNT(*) FROM t) AS BIGINT) AS quartile "
            "FROM r ORDER BY doc_id"
        ),
        "order_global_ranks": (
            "WITH r AS (SELECT o_orderkey, "
            "row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rnk "
            "FROM orders) "
            "SELECT o_orderkey, CAST(rnk AS BIGINT) AS rnk FROM r "
            "WHERE o_orderkey % 97 = 1 ORDER BY o_orderkey"
        ),
        "order_price_ntile": (
            "WITH r AS (SELECT o_totalprice, "
            "ntile(8) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket "
            "FROM orders) "
            "SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n, "
            "CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
            "AS sum_cents FROM r GROUP BY bucket ORDER BY bucket"
        ),
        # exact distinct-token cardinality — the oracle-certified
        # sibling of the hll_distinct_tokens sketch.
        "distinct_tokens_exact": (
            "SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS n FROM "
            "(SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) "
            "AS tok FROM documents)"
        ),
        # cross-doc shingle novelty: DuckDB re-derives every doc's
        # DISTINCT 3-token shingle set via the same list-lambda kernel
        # as ngram_jaccard_exact (string shingles — independent of the
        # uint64 hash representation; a collision is ~1e-13 at these
        # sizes) and counts how many appear in >= 2 docs. shared_frac
        # is a single IEEE division of exact ints => bit-identical.
        "ngram_novelty": (
            "WITH toks AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents), "
            "sh0 AS (SELECT doc_id, CASE WHEN len(t) < 3 "
            "THEN [array_to_string(t, ' ')] "
            "ELSE list_transform(range(1, len(t)-1), "
            "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END AS shingles "
            "FROM toks), "
            "s AS (SELECT DISTINCT doc_id, sh FROM "
            "(SELECT doc_id, unnest(shingles) AS sh FROM sh0)), "
            "c AS (SELECT sh, COUNT(*) AS nd FROM s GROUP BY sh) "
            "SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles, "
            "CAST(SUM(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_shared, "
            "CAST(SUM(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE) "
            "/ COUNT(*) AS shared_frac "
            "FROM s JOIN c USING (sh) GROUP BY s.doc_id"
        ),
        # web-corpus cleaning twins. The paragraph/PII inputs are
        # CONSTRUCTED from documents (boilerplate header/footer,
        # synthetic emails/IPs) identically to the Ray queries — the
        # sf texts carry no newlines/emails natively, and a removal
        # path that never fires would be a vacuous oracle.
        "paragraph_dedup": (
            f"WITH base AS (SELECT doc_id, '{_BOILER1}' || chr(10) || text || "
            f"CASE WHEN doc_id % 2 = 0 THEN chr(10) || '{_BOILER2}' "
            "ELSE '' END AS text FROM documents), "
            "sp AS (SELECT doc_id, string_split(text, chr(10)) AS ps FROM base), "
            "p AS (SELECT doc_id, unnest(ps) AS para, "
            "generate_subscripts(ps, 1) AS i FROM sp), "
            "shared AS (SELECT para FROM p WHERE length(para) > 0 "
            "GROUP BY para HAVING COUNT(DISTINCT doc_id) >= 2), "
            "kept AS (SELECT doc_id, para, i FROM p WHERE length(para) = 0 "
            "OR para NOT IN (SELECT para FROM shared)), "
            "tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_paras "
            "FROM p GROUP BY doc_id), "
            "agg AS (SELECT doc_id, COUNT(*) AS n_kept, "
            "string_agg(para, chr(10) ORDER BY i) AS text_clean "
            "FROM kept GROUP BY doc_id) "
            "SELECT t.doc_id, t.n_paras, "
            "CAST(t.n_paras - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed, "
            "COALESCE(a.text_clean, '') AS text_clean "
            "FROM tot t LEFT JOIN agg a USING (doc_id)"
        ),
        "pii_scrub": (
            "WITH base AS (SELECT doc_id, text || "
            "CASE WHEN doc_id % 3 = 0 THEN ' contact user' || "
            "CAST(doc_id AS VARCHAR) || '@mail.example.com for details' "
            "ELSE '' END || "
            "CASE WHEN doc_id % 5 = 0 THEN ' logged from ' || "
            "CAST(doc_id % 223 AS VARCHAR) || '.17.' || "
            "CAST(doc_id % 250 AS VARCHAR) || '.9' ELSE '' END AS text "
            "FROM documents) "
            "SELECT doc_id, "
            "CAST(len(regexp_extract_all(text, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) "
            "AS n_emails, "
            "CAST(len(regexp_extract_all(regexp_replace(text, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
            "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) "
            "AS n_ipv4, "
            "regexp_replace(regexp_replace(text, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
            "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g') "
            "AS text_redacted FROM base"
        ),
        "token_length_percentiles": (
            "WITH t AS (SELECT len(regexp_extract_all(text, '\\S+')) AS n "
            "FROM documents) "
            + " UNION ALL ".join(
                f"SELECT CAST({q} AS DOUBLE) AS q, "
                f"CAST(quantile_disc(n, {q}) AS BIGINT) AS n_tokens FROM t"
                for q in (0.25, 0.5, 0.75, 0.9, 0.99)
            )
        ),
        # exact components: the chain edges within each md5-prefix
        # bucket connect the whole bucket, so the star rounds must
        # converge every member to the bucket minimum — which SQL
        # derives directly with a window MIN (singleton buckets have no
        # edge and are absent from the Ray output; QUALIFY drops them).
        "cluster_components_exact": (
            "SELECT doc_id, "
            "MIN(doc_id) OVER (PARTITION BY substr(md5(text), 1, 1)) AS cluster "
            "FROM documents "
            "QUALIFY COUNT(*) OVER (PARTITION BY substr(md5(text), 1, 1)) > 1"
        ),
        "crawl_host_stats": (
            _CRAWL_CTE
            + ", occ AS ("
            "SELECT e.child AS url, SUM(e.cnt) + CASE WHEN e.child = 'https://site-a.test' "
            "THEN 1 ELSE 0 END AS n_events "
            "FROM edges e JOIN reach r ON e.parent = r.canon GROUP BY e.child "
            "UNION ALL SELECT 'https://site-a.test', 1 WHERE 'https://site-a.test' NOT IN "
            "(SELECT e.child FROM edges e JOIN reach r ON e.parent = r.canon)) "
            "SELECT regexp_extract(url, '^(https?://[^/?#]+)', 1) AS host, "
            "CAST(SUM(n_events) AS BIGINT) AS n_events, "
            "CAST(SUM(n_events - 1) AS BIGINT) AS n_cached, "
            "CAST(COUNT(*) AS BIGINT) AS n_fetched "
            "FROM occ GROUP BY 1"
        ),
        # anchor-text index: RE2 re-extraction of <a ...>text</a>
        # elements from the dumped pages, absolutizer CASE in the
        # crawl extractor's oracle-pinned gate order.
        "anchor_text_index": (
            f"WITH pages AS (SELECT url, decode(html) AS html "
            f"FROM read_parquet('{_ANCHOR_PAGES_PATH}')), "
            "elems AS (SELECT url, "
            "regexp_extract(url, '^(https?://[^/]+)', 1) AS hostpfx, "
            "unnest(regexp_extract_all(html, "
            "'<a(?:>|[ \t\n][^>]*>)[^<]*</a>', 0)) AS elem FROM pages), "
            "raw AS (SELECT hostpfx, "
            "regexp_extract(elem, 'href=\"([^\"]*)\"', 1) AS href0, "
            "regexp_extract(elem, '>([^<]*)</a>$', 1) AS anchor FROM elems), "
            "kept AS (SELECT hostpfx, trim(href0, ' ') AS href1, anchor "
            "FROM raw WHERE href0 <> 'javascript:;' "
            "AND NOT starts_with(href0, '#')), "
            "ab AS (SELECT CASE WHEN starts_with(href1, '//') "
            "THEN 'https://' || href1 "
            "WHEN starts_with(href1, '/') THEN hostpfx || href1 "
            "ELSE href1 END AS href, anchor FROM kept WHERE href1 <> '') "
            "SELECT href, CAST(COUNT(*) AS BIGINT) AS n_refs, "
            "CAST(COUNT(DISTINCT anchor) AS BIGINT) AS n_anchor_texts, "
            "MIN(anchor) AS first_anchor FROM ab GROUP BY href ORDER BY href"
        ),
        # PLD link graph: same extraction, hosts reduced to pay-level
        # domains by last-two-labels slicing (cc-SLD exceptions take
        # three) — mirrored from webgraph.pld_of_host.
        "pld_link_graph": (
            f"WITH pages AS (SELECT url, decode(html) AS html "
            f"FROM read_parquet('{_ANCHOR_PAGES_PATH}')), "
            "elems AS (SELECT url, "
            "regexp_extract(url, '^(https?://[^/]+)', 1) AS hostpfx, "
            "unnest(regexp_extract_all(html, "
            "'<a(?:>|[ \t\n][^>]*>)[^<]*</a>', 0)) AS elem FROM pages), "
            "raw AS (SELECT url, hostpfx, "
            "regexp_extract(elem, 'href=\"([^\"]*)\"', 1) AS href0 FROM elems), "
            "kept AS (SELECT url, hostpfx, trim(href0, ' ') AS href1 "
            "FROM raw WHERE href0 <> 'javascript:;' "
            "AND NOT starts_with(href0, '#')), "
            "ab AS (SELECT url, CASE WHEN starts_with(href1, '//') "
            "THEN 'https://' || href1 "
            "WHEN starts_with(href1, '/') THEN hostpfx || href1 "
            "ELSE href1 END AS href FROM kept WHERE href1 <> ''), "
            "hosts AS (SELECT "
            "regexp_extract(url, '^https?://([^/]+)', 1) AS sh, "
            "regexp_extract(href, '^https?://([^/]+)', 1) AS dh FROM ab), "
            "h2 AS (SELECT sh, dh FROM hosts WHERE dh <> ''), "
            "plds AS (SELECT "
            "CASE WHEN len(string_split(sh, '.')) <= 2 THEN sh "
            "WHEN string_split(sh, '.')[-2] || '.' || string_split(sh, '.')[-1] "
            "IN ('co.uk','org.uk','ac.uk','com.au','co.jp','com.br','co.in') "
            "THEN string_split(sh, '.')[-3] || '.' || "
            "string_split(sh, '.')[-2] || '.' || string_split(sh, '.')[-1] "
            "ELSE string_split(sh, '.')[-2] || '.' || string_split(sh, '.')[-1] "
            "END AS src_pld, "
            "CASE WHEN len(string_split(dh, '.')) <= 2 THEN dh "
            "WHEN string_split(dh, '.')[-2] || '.' || string_split(dh, '.')[-1] "
            "IN ('co.uk','org.uk','ac.uk','com.au','co.jp','com.br','co.in') "
            "THEN string_split(dh, '.')[-3] || '.' || "
            "string_split(dh, '.')[-2] || '.' || string_split(dh, '.')[-1] "
            "ELSE string_split(dh, '.')[-2] || '.' || string_split(dh, '.')[-1] "
            "END AS dst_pld FROM h2) "
            "SELECT src_pld, dst_pld, CAST(COUNT(*) AS BIGINT) AS n_links "
            "FROM plds GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        # recrawl consolidation: union the deterministic half-recrawl
        # (md5 last nibble < 8, +7 days, suffixed text), keep-latest
        # per url by (warc_ts, capture).
        "recrawl_latest_capture": (
            f"WITH base AS (SELECT url, warc_ts, text, "
            f"CAST(0 AS BIGINT) AS capture "
            f"FROM read_parquet('{_CAPTURE_PAGES_PATH}')), "
            "rec AS (SELECT url, warc_ts + INTERVAL 7 DAY AS warc_ts, "
            "text || ' [recrawl]' AS text, CAST(1 AS BIGINT) AS capture "
            "FROM base WHERE substr(md5(url), 32, 1) < '8'), "
            "caps AS (SELECT * FROM base UNION ALL SELECT * FROM rec), "
            "r AS (SELECT url, warc_ts, capture, text, row_number() OVER ("
            "PARTITION BY url ORDER BY warc_ts DESC, capture DESC) AS rn "
            "FROM caps) "
            "SELECT url, warc_ts AS latest_ts, capture, "
            "CAST(length(text) AS BIGINT) AS n_chars "
            "FROM r WHERE rn = 1 ORDER BY url"
        ),
        # deterministic epoch-shuffle permutation: md5(doc_id || ':1')
        # global order, first 500 positions.
        "epoch_shuffle": (
            "WITH k AS (SELECT doc_id, "
            "md5(CAST(doc_id AS VARCHAR) || ':1') AS skey FROM documents), "
            "r AS (SELECT doc_id, skey, "
            "row_number() OVER (ORDER BY skey) AS pos FROM k) "
            "SELECT CAST(pos AS BIGINT) AS pos, doc_id, skey FROM r "
            "WHERE pos <= 500 ORDER BY pos"
        ),
        # near-dedup survivor corpus: components over the brute-force
        # Jaccard>=0.5 edges (same CTE as dedup_clusters_exact), one
        # representative per cluster by (n_chars DESC, doc_id ASC),
        # plus every unclustered doc.
        "dedup_keep_best": (
            "WITH RECURSIVE toks AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents), "
            "sh AS (SELECT doc_id, CASE WHEN len(t) < 3 "
            "THEN [array_to_string(t, ' ')] "
            "ELSE list_transform(range(1, len(t)-1), "
            "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END AS s FROM toks), "
            "p AS (SELECT a.doc_id AS u, b.doc_id AS v "
            "FROM sh a JOIN sh b ON a.doc_id < b.doc_id "
            "WHERE CAST(len(list_distinct(list_intersect(a.s, b.s))) AS DOUBLE) "
            "/ greatest(len(list_distinct(a.s || b.s)), 1) >= 0.5), "
            "e AS (SELECT u, v FROM p UNION ALL SELECT v, u FROM p), "
            "nodes AS (SELECT DISTINCT u AS node FROM e), "
            "lbl AS (SELECT node, node AS l FROM nodes "
            "UNION SELECT e.v, lbl.l FROM lbl JOIN e ON e.u = lbl.node "
            "WHERE lbl.l < e.v), "
            "comp AS (SELECT node AS doc_id, MIN(l) AS cluster "
            "FROM lbl GROUP BY node), "
            "best AS (SELECT c.cluster, d.doc_id, row_number() OVER ("
            "PARTITION BY c.cluster ORDER BY d.n_chars DESC, d.doc_id) AS rn "
            "FROM comp c JOIN documents d ON d.doc_id = c.doc_id) "
            "SELECT CAST(doc_id AS BIGINT) AS doc_id FROM best WHERE rn = 1 "
            "UNION ALL SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents "
            "WHERE doc_id NOT IN (SELECT doc_id FROM comp) ORDER BY doc_id"
        ),
        # canonicalization audit: RE2 re-extraction + the crawl CTE's
        # oracle-pinned absolutize/param-sort canonicalization, grouped
        # by canon with raw-variant counts.
        "url_variant_counts": (
            f"WITH pages AS (SELECT url, decode(html) AS html "
            f"FROM read_parquet('{_EXTRACT_PAGES_PATH}')), "
            "tags AS (SELECT url, "
            "regexp_extract(url, '^(https?://[^/]+)', 1) AS hostpfx, "
            "unnest(regexp_extract_all(html, '<a(?:>|[ \t\n][^>]*>)', 0)) "
            "AS tag FROM pages), "
            "raw AS (SELECT hostpfx, "
            "regexp_extract(tag, 'href=\"([^\"]*)\"', 1) AS href0 FROM tags), "
            "kept AS (SELECT hostpfx, trim(href0, ' ') AS href1 FROM raw "
            "WHERE href0 <> 'javascript:;' AND NOT starts_with(href0, '#')), "
            "absd AS (SELECT CASE WHEN starts_with(href1, '//') "
            "THEN 'https://' || href1 "
            "WHEN starts_with(href1, '/') THEN hostpfx || href1 "
            "ELSE href1 END AS href FROM kept WHERE href1 <> ''), "
            "canond AS (SELECT href, split_part(href, '?', 1) AS base, "
            "list_sort(list_filter(str_split(split_part(href, '?', 2), '&'), "
            "t -> t <> '' AND split_part(t, '=', 1) <> 'session')) AS toks "
            "FROM absd WHERE regexp_matches(href, '^https?://[^/?#]+')), "
            "cand AS (SELECT href, CASE WHEN len(toks) = 0 THEN base "
            "ELSE base || '?' || array_to_string(toks, '&') END AS canon "
            "FROM canond) "
            "SELECT canon AS url, "
            "CAST(COUNT(DISTINCT href) AS BIGINT) AS n_variants, "
            "CAST(COUNT(*) AS BIGINT) AS n_refs "
            "FROM cand GROUP BY canon ORDER BY canon"
        ),
        # per-host capture freshness (recrawl-scheduling signal);
        # epoch-us ints so min/max are exactly hashable.
        "host_freshness": (
            f"WITH p AS (SELECT url, warc_ts "
            f"FROM read_parquet('{_CAPTURE_PAGES_PATH}')) "
            "SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS host, "
            "CAST(COUNT(*) AS BIGINT) AS n_pages, "
            "CAST(epoch_us(MIN(warc_ts)) AS BIGINT) AS oldest_us, "
            "CAST(epoch_us(MAX(warc_ts)) AS BIGINT) AS newest_us "
            "FROM p GROUP BY 1 ORDER BY 1"
        ),
        # SCD-2 validity intervals per user (open row -> sentinel).
        "scd2_history": (
            "SELECT user_id, event_type, ts AS valid_from, "
            "COALESCE(LEAD(ts) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id), TIMESTAMP '2100-01-01') AS valid_to "
            "FROM events ORDER BY user_id, valid_from, event_type"
        ),
        # md5-ring negative sampling: exact row_number over the same
        # uint64 hash key (md5_number_lower == hashing.md5_lower64,
        # verified bit-identical), offsets joined back by rank.
        "negative_samples": (
            "WITH r AS (SELECT doc_id, row_number() OVER ("
            "ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR)), doc_id) - 1 "
            "AS rk FROM documents), "
            "n AS (SELECT COUNT(*) AS cnt FROM documents), "
            "o(slot, off) AS (VALUES (1, 1), (2, 7), (3, 42)), "
            "p AS (SELECT r.doc_id, o.slot, (r.rk + o.off) % n.cnt AS nrk "
            "FROM r, n, o) "
            "SELECT p.doc_id, CAST(p.slot AS BIGINT) AS slot, "
            "b.doc_id AS neg_id FROM p JOIN r b ON b.rk = p.nrk "
            "ORDER BY 1, 2"
        ),
        # read-pushdown scan: WHERE + projection at the parquet reader
        "pushdown_filtered_read": (
            "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(n_chars) AS BIGINT) AS total_chars "
            "FROM documents WHERE lang = 'en' GROUP BY source ORDER BY source"
        ),
        # salted hot-key join == plain join (salting only changes the
        # partitioning): plain SQL join is the oracle.
        "salted_event_revenue": (
            "WITH dim AS (SELECT DISTINCT event_type, "
            "CAST(length(event_type) AS BIGINT) AS mult FROM events), "
            "e AS (SELECT event_type, "
            "CAST(floor(value * 100) AS BIGINT) AS cents FROM events) "
            "SELECT e.event_type, "
            "CAST(SUM(e.cents * d.mult) AS BIGINT) AS weighted_cents, "
            "CAST(COUNT(*) AS BIGINT) AS n "
            "FROM e JOIN dim d ON d.event_type = e.event_type "
            "GROUP BY e.event_type ORDER BY e.event_type"
        ),
        # per-source quota: first 50 docs per source in md5(doc_id)
        # order (the C4-style domain balance cap).
        "per_source_quota": (
            "SELECT source, doc_id FROM ("
            "SELECT source, doc_id, row_number() OVER ("
            "PARTITION BY source "
            "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn "
            "FROM documents) WHERE rn <= 50 ORDER BY source, doc_id"
        ),
        # ------------------------------------------------------------------
        # TPC-H-shaped suite: revenue fixed point is
        #   rev_cc = round(ep*100) * (100 - round(disc*100))   (centi-cents)
        # exact for the 2-decimal inputs, so Ray's int64 sums match DuckDB's
        # bit-for-bit regardless of distribution order.
        # ------------------------------------------------------------------
        "unshipped_order_revenue": (
            "SELECT l.l_orderkey, CAST(SUM("
            f"{_REV_CC_SQL}) AS BIGINT) AS rev_cc, "
            "o.o_orderdate, o.o_orderpriority "
            "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "WHERE o.o_orderdate < TIMESTAMP '1998-01-01' "
            "AND l.l_shipdate > TIMESTAMP '1998-01-01' "
            "GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority "
            "ORDER BY rev_cc DESC, l.l_orderkey LIMIT 10"
        ),
        "forecast_revenue_delta": (
            "SELECT CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) "
            "* CAST(ROUND(l_discount*100) AS BIGINT)) AS BIGINT) "
            "AS revenue_delta FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
            "AND l_shipdate < TIMESTAMP '1998-01-01' "
            "AND CAST(ROUND(l_discount*100) AS BIGINT) BETWEEN 5 AND 7 "
            "AND l_quantity < 5"
        ),
        "nation_trade_volumes": (
            "SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation, "
            "CAST(year(l.l_shipdate) AS BIGINT) AS l_year, "
            f"CAST(SUM({_REV_CC_SQL}) AS BIGINT) AS rev_cc "
            "FROM lineitem l "
            "JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "JOIN customer c ON o.o_custkey = c.c_custkey "
            "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
            "JOIN nation ns ON s.s_nationkey = ns.n_nationkey "
            "JOIN nation nc ON c.c_nationkey = nc.n_nationkey "
            "WHERE l.l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l.l_shipdate < TIMESTAMP '1998-01-01' "
            "AND ((ns.n_name = 'NATION_3' AND nc.n_name = 'NATION_7') "
            "OR (ns.n_name = 'NATION_7' AND nc.n_name = 'NATION_3')) "
            "GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"
        ),
        "market_share_yearly": (
            "WITH rows_ AS (SELECT "
            "CAST(year(o.o_orderdate) AS BIGINT) AS o_year, "
            f"{_REV_CC_SQL} AS rev, "
            f"CASE WHEN ns.n_name = 'NATION_3' THEN {_REV_CC_SQL} "
            "ELSE 0 END AS nrev "
            "FROM lineitem l "
            "JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "JOIN customer c ON o.o_custkey = c.c_custkey "
            "JOIN nation nc ON c.c_nationkey = nc.n_nationkey "
            "JOIN region r ON nc.n_regionkey = r.r_regionkey "
            "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
            "JOIN nation ns ON s.s_nationkey = ns.n_nationkey "
            "WHERE r.r_name = 'EUROPE') "
            "SELECT o_year, CAST(SUM(nrev) AS BIGINT) AS nation_cc, "
            "CAST(SUM(rev) AS BIGINT) AS total_cc, "
            "CAST(SUM(nrev) AS DOUBLE) / CAST(SUM(rev) AS DOUBLE) AS share "
            "FROM rows_ GROUP BY o_year ORDER BY o_year"
        ),
        "profit_by_nation_year": (
            "SELECT n.n_name, CAST(year(l.l_shipdate) AS BIGINT) AS l_year, "
            f"CAST(SUM({_REV_CC_SQL}) AS BIGINT) AS rev_cc "
            "FROM lineitem l "
            "JOIN part p ON l.l_partkey = p.p_partkey "
            "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
            "JOIN nation n ON s.s_nationkey = n.n_nationkey "
            "WHERE p.p_name LIKE '%widget%' "
            "GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "important_parts": (
            "WITH v AS (SELECT l_partkey, "
            "CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) "
            "AS value_cents FROM lineitem GROUP BY l_partkey) "
            "SELECT l_partkey, value_cents FROM v "
            "WHERE 2 * value_cents * (SELECT COUNT(*) FROM v) "
            "> 3 * (SELECT SUM(value_cents) FROM v) "
            "ORDER BY value_cents DESC, l_partkey"
        ),
        "returnflag_priority_counts": (
            "SELECT l.l_returnflag, "
            "CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') "
            "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
            "CAST(SUM(CASE WHEN o.o_orderpriority NOT IN "
            "('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) "
            "AS low_line_count "
            "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' "
            "AND l.l_shipdate < TIMESTAMP '1998-01-01' "
            "GROUP BY 1 ORDER BY 1"
        ),
        "promo_revenue_share": (
            "SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN "
            f"{_REV_CC_SQL} ELSE 0 END) AS BIGINT) AS promo_cc, "
            f"CAST(SUM({_REV_CC_SQL}) AS BIGINT) AS total_cc, "
            "100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN "
            f"{_REV_CC_SQL} ELSE 0 END) AS DOUBLE) "
            f"/ CAST(SUM({_REV_CC_SQL}) AS DOUBLE) AS promo_share "
            "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
            "WHERE l.l_shipdate >= TIMESTAMP '1997-09-01' "
            "AND l.l_shipdate < TIMESTAMP '1997-10-01'"
        ),
        "top_supplier_revenue": (
            "WITH r AS (SELECT l_suppkey, "
            f"CAST(SUM({_REV_CC_SQL.replace('l.l_', 'l_')}) AS BIGINT) "
            "AS total_rev FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
            "AND l_shipdate < TIMESTAMP '1997-04-01' GROUP BY l_suppkey) "
            "SELECT s.s_suppkey, s.s_name, r.total_rev "
            "FROM r JOIN supplier s ON r.l_suppkey = s.s_suppkey "
            "WHERE r.total_rev = (SELECT MAX(total_rev) FROM r) "
            "ORDER BY s.s_suppkey"
        ),
        "large_volume_customers": (
            "SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, "
            "CAST(ROUND(o.o_totalprice*100) AS BIGINT) AS o_total_cents, "
            "CAST(SUM(l.l_quantity) AS BIGINT) AS sum_qty "
            "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "JOIN customer c ON o.o_custkey = c.c_custkey "
            "GROUP BY 1, 2, 3, 4, 5 HAVING SUM(l.l_quantity) > 300 "
            "ORDER BY o_total_cents DESC, o.o_orderkey"
        ),
        "disjunctive_brand_revenue": (
            f"SELECT CAST(SUM({_REV_CC_SQL}) AS BIGINT) AS rev_cc "
            "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
            "WHERE (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 10 "
            "AND l.l_quantity BETWEEN 1 AND 3) "
            "OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 1 AND 15 "
            "AND l.l_quantity BETWEEN 2 AND 5) "
            "OR (p.p_brand = 'Brand#8' AND p.p_size BETWEEN 1 AND 20 "
            "AND l.l_quantity BETWEEN 4 AND 8)"
        ),
        "dominant_part_suppliers": (
            "WITH ps AS (SELECT l_partkey, l_suppkey, "
            "CAST(SUM(l_quantity) AS BIGINT) AS qty "
            "FROM lineitem GROUP BY 1, 2), "
            "tot AS (SELECT l_partkey, SUM(qty) AS tq, COUNT(*) AS ns "
            "FROM ps GROUP BY 1) "
            "SELECT s.s_suppkey, s.s_name, "
            "CAST(COUNT(*) AS BIGINT) AS n_parts_dominated "
            "FROM ps JOIN tot ON ps.l_partkey = tot.l_partkey "
            "JOIN supplier s ON ps.l_suppkey = s.s_suppkey "
            "WHERE ps.qty * tot.ns > 2 * tot.tq "
            "GROUP BY 1, 2 ORDER BY 1"
        ),
        "waiting_order_suppliers": (
            "WITH ps AS (SELECT l_orderkey, l_suppkey, "
            "MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r "
            "FROM lineitem GROUP BY 1, 2), "
            "o AS (SELECT l_orderkey, COUNT(*) AS n_supp, SUM(has_r) AS n_r "
            "FROM ps GROUP BY 1) "
            "SELECT s.s_suppkey, s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait "
            "FROM ps JOIN o ON ps.l_orderkey = o.l_orderkey "
            "JOIN supplier s ON ps.l_suppkey = s.s_suppkey "
            "WHERE o.n_supp > 1 AND o.n_r = 1 AND ps.has_r = 1 "
            "GROUP BY 1, 2 ORDER BY numwait DESC, s.s_suppkey"
        ),
        "returned_item_customers": (
            "WITH rev AS (SELECT o.o_custkey, "
            f"CAST(SUM({_REV_CC_SQL}) AS BIGINT) AS rev_cc "
            "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "WHERE l.l_returnflag = 'R' "
            "AND o.o_orderdate >= TIMESTAMP '1997-10-01' "
            "AND o.o_orderdate < TIMESTAMP '1998-01-01' GROUP BY 1) "
            "SELECT c.c_custkey, c.c_name, n.n_name, rev.rev_cc "
            "FROM rev JOIN customer c ON rev.o_custkey = c.c_custkey "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "ORDER BY rev.rev_cc DESC, c.c_custkey LIMIT 20"
        ),
        "min_cost_supplier_per_part": (
            "WITH u AS (SELECT l.l_partkey, l.l_suppkey, "
            "MIN(CAST(ROUND(l.l_extendedprice*100) AS BIGINT) * 840 "
            "// CAST(l.l_quantity AS BIGINT)) AS unit_scaled "
            "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
            "WHERE p.p_size = 10 GROUP BY 1, 2), "
            "r AS (SELECT l_partkey, l_suppkey, unit_scaled, "
            "ROW_NUMBER() OVER (PARTITION BY l_partkey "
            "ORDER BY unit_scaled, l_suppkey) AS rn FROM u) "
            "SELECT r.l_partkey, p.p_name, s.s_suppkey, s.s_name, "
            "r.unit_scaled FROM r "
            "JOIN part p ON r.l_partkey = p.p_partkey "
            "JOIN supplier s ON r.l_suppkey = s.s_suppkey "
            "WHERE r.rn = 1 ORDER BY r.l_partkey"
        ),
        "late_order_priority_counts": (
            "WITH m AS (SELECT l_orderkey, MAX(l_shipdate) AS ms "
            "FROM lineitem GROUP BY 1) "
            "SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count "
            "FROM orders o JOIN m ON o.o_orderkey = m.l_orderkey "
            "WHERE o.o_orderdate >= TIMESTAMP '1997-07-01' "
            "AND o.o_orderdate < TIMESTAMP '1997-10-01' "
            "AND m.ms > o.o_orderdate + INTERVAL 30 DAY "
            "GROUP BY 1 ORDER BY 1"
        ),
        "local_supplier_volume": (
            f"SELECT n.n_name, CAST(SUM({_REV_CC_SQL}) AS BIGINT) AS rev_cc "
            "FROM lineitem l "
            "JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "JOIN customer c ON o.o_custkey = c.c_custkey "
            "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
            "JOIN nation n ON s.s_nationkey = n.n_nationkey "
            "JOIN region r ON n.n_regionkey = r.r_regionkey "
            "WHERE r.r_name = 'EUROPE' "
            "AND c.c_nationkey = s.s_nationkey "
            "AND o.o_orderdate >= TIMESTAMP '1997-01-01' "
            "AND o.o_orderdate < TIMESTAMP '1998-01-01' "
            "GROUP BY 1 ORDER BY rev_cc DESC, n.n_name"
        ),
        "customer_order_distribution": (
            "WITH per_cust AS (SELECT c.c_custkey, "
            "COUNT(o.o_orderkey) AS c_count "
            "FROM customer c LEFT OUTER JOIN orders o "
            "ON c.c_custkey = o.o_custkey "
            "AND o.o_orderpriority <> '1-URGENT' GROUP BY 1) "
            "SELECT CAST(c_count AS BIGINT) AS c_count, "
            "CAST(COUNT(*) AS BIGINT) AS custdist "
            "FROM per_cust GROUP BY 1 "
            "ORDER BY custdist DESC, c_count DESC"
        ),
        # sparse tf-idf cosine self-join: integer weights (tf*1e4)//df
        # over the df band [2, 100]; the cos^2 compare is HUGEINT here,
        # Python big-int on the Ray side — exact on both.
        "doc_similarity_tfidf": (
            "WITH t AS (SELECT doc_id, "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token "
            "FROM documents), "
            "tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf "
            "FROM t GROUP BY 1, 2), "
            "df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df "
            "FROM tf GROUP BY 1), "
            "w AS (SELECT tf.doc_id, tf.token, (tf.tf*10000)//df.df AS w "
            "FROM tf JOIN df USING (token) WHERE df.df BETWEEN 2 AND 100), "
            "nrm AS (SELECT doc_id, SUM(w*w) AS nn FROM w GROUP BY 1), "
            "dt AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "SUM(a.w*b.w) AS dot_w FROM w a JOIN w b "
            "ON a.token = b.token AND a.doc_id < b.doc_id GROUP BY 1, 2) "
            "SELECT dt.doc_a, dt.doc_b, CAST(dt.dot_w AS BIGINT) AS dot_w, "
            "CAST(CAST(dt.dot_w AS HUGEINT)*dt.dot_w*1000000 "
            "// (CAST(na.nn AS HUGEINT)*nb.nn) AS BIGINT) AS cos2_ppm "
            "FROM dt JOIN nrm na ON dt.doc_a = na.doc_id "
            "JOIN nrm nb ON dt.doc_b = nb.doc_id "
            "WHERE CAST(dt.dot_w AS HUGEINT)*dt.dot_w*1000000 "
            ">= 90000 * CAST(na.nn AS HUGEINT)*nb.nn "
            "ORDER BY doc_a, doc_b"
        ),
        "bpe_merge_candidates": (
            "WITH wt AS (SELECT "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w "
            "FROM documents), "
            "p AS (SELECT substr(w, CAST(i AS INT), 2) AS pair FROM wt, "
            "UNNEST(generate_series(1, length(w)-1)) AS t(i) "
            "WHERE length(w) >= 2) "
            "SELECT pair, CAST(COUNT(*) AS BIGINT) AS n FROM p "
            "GROUP BY 1 ORDER BY n DESC, pair LIMIT 30"
        ),
        # content-defined chunking: boundary after char i iff
        # md5(trailing 12 chars) starts with hex '0'; chunk identity =
        # md5(chunk text) — both re-derived verbatim in SQL.
        "cdc_chunk_dedup": (
            "WITH d AS (SELECT doc_id, substr(text, 1, 512) AS t "
            "FROM documents WHERE length(text) > 0), "
            "marks AS (SELECT doc_id, t, CAST(i AS BIGINT) AS i FROM d, "
            "UNNEST(generate_series(12, length(t))) AS g(i) "
            "WHERE substr(md5(substr(t, CAST(i - 11 AS INT), 12)), 1, 1) "
            "= '0'), "
            "edges AS (SELECT DISTINCT doc_id, t, i FROM ("
            "SELECT doc_id, t, i FROM marks "
            "UNION ALL SELECT doc_id, t, CAST(length(t) AS BIGINT) "
            "FROM d) u), "
            "ch AS (SELECT doc_id, md5(substr(t, "
            "CAST(COALESCE(LAG(i) OVER w, 0) + 1 AS INT), "
            "CAST(i - COALESCE(LAG(i) OVER w, 0) AS INT))) AS chash "
            "FROM edges WINDOW w AS (PARTITION BY doc_id ORDER BY i)), "
            "nd AS (SELECT chash, COUNT(DISTINCT doc_id) AS n_docs "
            "FROM ch GROUP BY 1) "
            "SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks, "
            "CAST(SUM(CASE WHEN nd.n_docs >= 2 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_dup_chunks "
            "FROM ch c JOIN nd ON c.chash = nd.chash "
            "GROUP BY 1 ORDER BY 1"
        ),
        # isqrt via float sqrt + exact +/-1 correction (float sqrt of a
        # BIGINT is within one ULP, so one step lands on floor(sqrt)).
        "mixture_weights": (
            "WITH s AS (SELECT source, CAST(SUM(len(regexp_extract_all("
            "lower(text), '[a-z0-9]+'))) AS BIGINT) AS n_tokens "
            "FROM documents GROUP BY 1), "
            "r0 AS (SELECT source, n_tokens, "
            "CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS r "
            "FROM s), "
            "r1 AS (SELECT source, n_tokens, r "
            "+ (CASE WHEN (r+1)*(r+1) <= n_tokens THEN 1 ELSE 0 END) "
            "- (CASE WHEN r*r > n_tokens THEN 1 ELSE 0 END) AS w FROM r0) "
            "SELECT source, n_tokens, w AS w_isqrt, "
            "CAST(w * 1000000 // (SELECT SUM(w) FROM r1) AS BIGINT) "
            "AS share_ppm FROM r1 ORDER BY source"
        ),
    }
