"""Large cached synthetic webs for benchmarking.

``ensure_big_site`` materializes a big deterministic pages table to a
/tmp parquet cache (keyed by its parameters), generating the shards in
parallel with Ray tasks — the generator is a pure function of
(n_pages, texts, fanout, row_range), so sharded output row-sets equal
the single-shot build (tests pin this). Repeat bench runs (and the 8-
vs-32-CPU scaling pair) reuse the cache instead of regenerating.

Pages are padded to ``text_pad`` characters so per-page parse work is
Common-Crawl-page-sized rather than snippet-sized.
"""

from __future__ import annotations

import os

import ray

from .sitegen import build_site

CACHE_ROOT = "/tmp/brinkray_sites"


@ray.remote
def _gen_shard(out_dir: str, shard: int, n_pages: int, lo: int, hi: int, texts, fanout: int):
    import pyarrow.parquet as pq

    tbl = build_site(n_pages, texts=texts, fanout=fanout, row_range=(lo, hi))
    pq.write_table(tbl, os.path.join(out_dir, f"shard_{shard:04d}.parquet"))
    return tbl.num_rows


def _padded_texts(sf_dir: str, text_pad: int) -> list[str]:
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    out = []
    for t in docs["text"].to_pylist():
        if len(t) < text_pad:
            t = (t + " ") * (text_pad // max(1, len(t)) + 1)
        out.append(t[:text_pad])
    return out


def ensure_big_site(
    sf_dir: str,
    n_pages: int,
    fanout: int = 32,
    text_pad: int = 4000,
    shards: int = 32,
) -> str:
    """Returns a directory of parquet shards; generates on first use."""
    key = f"v2_{os.path.basename(os.path.normpath(sf_dir))}_{n_pages}_{fanout}_{text_pad}"
    out_dir = os.path.join(CACHE_ROOT, key)
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    texts = _padded_texts(sf_dir, text_pad)
    texts_ref = ray.put(texts)
    step = (n_pages + shards - 1) // shards
    futs = [
        _gen_shard.remote(
            out_dir, s, n_pages, s * step, min((s + 1) * step, n_pages), texts_ref, fanout
        )
        for s in range(shards)
        if s * step < n_pages
    ]
    ray.get(futs)
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir
