"""brinkray — a Ray-Data-native URL-frontier + fetch-scheduler engine.

A from-scratch reimplementation of the query/data-processing
capabilities of the reference crawler (djavorszky/brink, read-only at
/root/reference) on top of ray.data: BFS-wave frontier Datasets,
zero-copy Arrow map_batches stages, actor pools for the stateful
pieces (sharded cuckoo-filter seen set, politeness token buckets,
fetcher sessions).

Layout:
  brinkray.ref      — pure-Python conformance core (no Ray): the Go
                      semantics, pinned by the reference's own golden
                      test tables, plus a single-process oracle.
  brinkray.engine   — the Ray Data pipelines (stages, wave driver,
                      checkpointing).
  brinkray.state    — actor-held state: cuckoo filter, seen shards,
                      politeness/budget.
  brinkray.fixtures — deterministic synthetic-web generator
                      (Common-Crawl-shaped pages table).
  brinkray.textproc — training-data operators over the documents /
                      embeddings tables (dedup, similarity, quality).
"""

__version__ = "0.1.0"
