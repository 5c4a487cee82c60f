"""Training-data operators over Common-Crawl-style corpora.

Beyond the reference's own crawl operators, these are the operations a
large-scale training-data pipeline needs, each expressed Ray-Data-first
(map_batches partials -> small groupby merges, broadcast lookups, no
driver-side loops over rows):

  dedup       — exact (md5 hash-partition), MinHash+LSH near-dup,
                SimHash, n-gram Jaccard verification, embedding-cosine
  similarity  — brute-force cosine top-k (the baseline), IVF-bucketed
                approximate variant (the scale path)
  quality     — language-ID (stopword profiles), quality signals,
                token counting, rolling-hash document fingerprints
  media       — multimodal (binary-column) stage plumbing with real
                numpy/stdlib codecs (BMP / PCM-WAV / frame container)
  webgraph    — anchor-text index, PLD link graph, recrawl capture
                consolidation (the web-corpus construction steps
                downstream of the crawl loop)
"""
