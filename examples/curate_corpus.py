"""End-to-end training-corpus curation over a documents parquet table —
the pipeline a 100-TB run would use, demonstrated at testdata scale:

    boilerplate removal (paragraph_dedup)
    -> PII redaction (pii_scrub)
    -> quality / language gating (add_quality_signals, add_lang_id)
    -> near-dup removal (minhash_lsh_pairs -> cluster_pairs, keep min id)
    -> per-language curation (top_k_per_group by token count)
    -> packed training export (write_packed_shards, resumable)

Every stage is a streaming Ray Data transform; nothing corpus-scale is
ever materialized on the driver. Run:

    python examples/curate_corpus.py [SF_DIR] [OUT_DIR]
"""

from __future__ import annotations

import sys


def curate(sf_dir: str, out_dir: str) -> dict:
    import numpy as np
    import pyarrow as pa

    import ray
    import ray.data as rd

    from brinkray.textproc.curation import top_k_per_group, write_packed_shards
    from brinkray.textproc.dedup import minhash_lsh_pairs
    from brinkray.textproc.joins import cluster_pairs
    from brinkray.textproc.quality import add_lang_id, add_token_counts
    from brinkray.textproc.webclean import paragraph_dedup, pii_scrub

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    # 1. boilerplate paragraphs out, then PII — both streaming passes
    cleaned = paragraph_dedup(docs).map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"], "text": t["text_clean"]}
        ),
        batch_format="pyarrow",
    )
    redacted = pii_scrub(cleaned).map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "text": t["text_redacted"]}),
        batch_format="pyarrow",
    )

    # 2. language + length gating (vectorized signals, streaming filter)
    gated = add_token_counts(add_lang_id(redacted)).map_batches(
        lambda t: t.filter(
            np.asarray(t["n_tokens"].to_pylist(), dtype=np.int64) >= 5
        ).select(["doc_id", "text", "lang_pred"]),
        batch_format="pyarrow",
    )

    # 3. near-dup clusters -> drop everything but each cluster's min id
    pairs = minhash_lsh_pairs(gated, threshold=0.5)
    losers = cluster_pairs(pairs).map_batches(
        lambda t: t.filter(
            np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
            != np.asarray(t["cluster"].to_pylist(), dtype=np.int64)
        ).select(["doc_id"]),
        batch_format="pyarrow",
    )
    loser_ids = ray.put(
        np.sort(np.asarray(losers.to_pandas()["doc_id"], dtype=np.int64))
    )

    def drop_losers(t: pa.Table) -> pa.Table:
        bad = ray.get(loser_ids)
        ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
        return t.filter(~np.isin(ids, bad))

    surviving = gated.map_batches(drop_losers, batch_format="pyarrow")

    # 4. keep the 200 longest docs per detected language
    kept = top_k_per_group(
        add_token_counts(surviving),
        by="lang_pred",
        score_col="n_tokens",
        k=200,
        id_col="doc_id",
    ).to_pandas()
    keep_ids = ray.put(np.sort(kept["doc_id"].to_numpy().astype(np.int64)))

    def only_kept(t: pa.Table) -> pa.Table:
        good = ray.get(keep_ids)
        ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
        return t.filter(np.isin(ids, good)).select(["doc_id", "text"])

    final = surviving.map_batches(only_kept, batch_format="pyarrow")

    # 5. resumable packed-parquet export (manifest is a tiny Dataset)
    manifest = write_packed_shards(final, out_dir).to_pandas()
    return {
        "kept_docs": int(len(kept)),
        "shards": int(len(manifest)),
        "exported_tokens": int(manifest["n_tokens"].sum()),
        "out_dir": out_dir,
    }


if __name__ == "__main__":
    import os

    # runnable as `python examples/curate_corpus.py` from the repo root
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_corpus"
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    try:
        print(curate(sf_dir, out_dir))
    finally:
        ray.shutdown()
