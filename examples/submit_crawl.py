"""`ray job submit` entry point for a production crawl — the
multi-node path the north rule names (the CLI drives the same engine
single-node). Run it against a cluster:

    ray job submit --address http://<head>:8265 \
        --working-dir . -- python examples/submit_crawl.py \
        --conf examples/brink.toml --pages /data/pages_parquet \
        --events-sink /data/crawl_events --checkpoint /data/crawl_ckpt \
        --index-mode partitioned --index-dir /data/page_index

Scale defaults are ON here (unlike the conformance-oriented CLI):
scale ordering, streaming events sink with retain_results=False (no
driver-side results concat), retain_canon=False shards (digests-only
seen state), order-key growth capping, partitioned page index, and
per-wave checkpointing — a crashed job resumes with
``--resume`` and skips every _COMPLETE wave and _SUNK sink partition.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--conf", required=True, help="brink-style TOML config")
    p.add_argument("--pages", required=True, help="pages parquet dir (url, html)")
    p.add_argument("--events-sink", required=True, help="events parquet sink dir")
    p.add_argument("--checkpoint", required=True, help="per-wave checkpoint dir")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--index-mode", default="partitioned",
                   choices=["broadcast", "partitioned"])
    p.add_argument("--index-dir", default=None,
                   help="partitioned-index shard root (required for partitioned)")
    p.add_argument("--index-nparts", type=int, default=64)
    p.add_argument("--seen-shards", type=int, default=None,
                   help="default: 2x cluster CPU count / 16")
    p.add_argument("--max-waves", type=int, default=None)
    p.add_argument("--fetch-batch-size", type=int, default=4096)
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init()  # inside `ray job submit` this joins the cluster

    import ray.data as rd

    from brinkray.engine.crawl import CrawlEngine, EngineOptions
    from brinkray.ref.config import from_toml

    cfg = from_toml(args.conf)
    ncpu = int(ray.cluster_resources().get("CPU", 16))
    opts = EngineOptions(
        ordering="scale",
        seen_shards=args.seen_shards or max(4, ncpu // 8),
        seen_capacity_per_shard=1 << 22,
        fetch_batch_size=args.fetch_batch_size,
        store_body=False,
        events_sink_dir=args.events_sink,
        retain_results=False,
        retain_canon=False,
        rebase_order_keys=True,
        checkpoint_dir=args.checkpoint,
        index_mode=args.index_mode,
        index_dir=args.index_dir,
        index_nparts=args.index_nparts,
        max_waves=args.max_waves,
        robots_enabled=True,
    )
    eng = CrawlEngine(cfg, opts)
    eng.set_pages(rd.read_parquet(args.pages, file_extensions=["parquet"]))
    res = eng.run(resume=args.resume)
    print(json.dumps({
        "waves": res.waves,
        "urls_seen": res.seen_count(),
        "events_sink": args.events_sink,
        "metrics": res.metrics[-3:],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
