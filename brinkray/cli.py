"""CLI entry point — parity with the reference's cmd/main.go.

    python -m brinkray.cli --conf brink.toml --pages pages_dir/ \
        [--out run.log] [--results out/] [--checkpoint ckpt/] [--resume]

Flags mirror cmd/main.go:17-18 (-conf, -out); the example handlers are
ports of cmd/main.go:54-77 (the page counter + broken-wiki-link
substring detector, and the 404 edge logger). SIGINT/SIGTERM trigger
Stop() like main.go:39-44.

Owns its Ray session (scripts and the test fixture are the only places
allowed to call ray.init).
"""

from __future__ import annotations

import argparse
import logging
import signal
import sys

log = logging.getLogger("brinkray")

_NEEDLE = "Use the buttons below to create it or to search for the words in the title."


def build_handlers(crawler) -> dict:
    """The example handlers from cmd/main.go:52-77."""
    counters = {"oks": 0}

    def handler(linked_from, url, status, body, cached):
        counters["oks"] += 1
        log.info("%d: %s", status, url)
        if counters["oks"] % 100 == 0:
            log.info("Links seen: %d", counters["oks"])
        if cached:
            return
        if _NEEDLE in body:
            log.info("%s -> %s: linked wiki article does not exist", linked_from, url)

    def not_found_handler(linked_from, url, status, body, cached):
        if cached:
            log.info("404: CACHED: %s -> %s", linked_from, url)
        else:
            log.info("404: %s -> %s", linked_from, url)

    crawler.handle_default_func(handler)
    crawler.handle_func(404, not_found_handler)
    return counters


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="brinkray")
    p.add_argument("--conf", default="brink.toml", help="TOML config file")
    p.add_argument("--out", default="std", help="log destination ('std' or a file)")
    p.add_argument("--pages", required=True, help="pages parquet path (the sandbox web)")
    p.add_argument("--results", default=None, help="write crawl results parquet here")
    p.add_argument("--checkpoint", default=None, help="per-wave checkpoint directory")
    p.add_argument("--resume", action="store_true", help="resume from checkpoint")
    p.add_argument("--max-waves", type=int, default=None)
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args(argv)

    # configure our logger directly (basicConfig is a no-op when the
    # host process — e.g. Ray — already configured the root logger)
    log.setLevel(logging.INFO)
    log.propagate = False
    handler = (
        logging.FileHandler(args.out)
        if args.out != "std"
        else logging.StreamHandler(sys.stderr)
    )
    handler.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
    log.handlers = [handler]

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )

    from .crawler import Crawler
    from .engine.crawl import EngineOptions

    c = Crawler.from_toml(
        args.conf,
        EngineOptions(checkpoint_dir=args.checkpoint, max_waves=args.max_waves),
    )
    build_handlers(c)
    c.set_pages(args.pages)

    signal.signal(signal.SIGINT, lambda *_: c.stop())
    signal.signal(signal.SIGTERM, lambda *_: c.stop())

    result = c.start(resume=args.resume)
    log.info(
        "crawl finished: %d waves, %d urls seen", result.waves, len(result.seen)
    )
    if args.results:
        import ray.data as rd

        for i, ds in enumerate(result.results):
            if ds.count():
                ds.write_parquet(f"{args.results.rstrip('/')}/wave_{i:04d}")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
