"""Fault injection: a fetch worker hard-killed mid-wave (os._exit — the
shape of a preempted / OOM-killed node) must not change what the crawl
produces. Ray retries the killed task; in scale mode the dead attempt's
shard reservations are generation-orphan-swept at the execution barrier
and requeued rows claim in the next wave (engine/crawl.py scale-wave
docstring); in strict mode marks are idempotent set inserts.

The hook is EngineOptions.chaos_kill_marker (fetch.py::fetch_fn): the
first task to atomically create the marker file kills its worker
process — exactly one death per marker."""

import os
import tempfile

import pytest

from brinkray.engine.crawl import CrawlEngine, EngineOptions
from brinkray.fixtures import build_site, site_config


def _crawl(table, ordering: str, chaos: str | None):
    eng = CrawlEngine(
        site_config(),
        EngineOptions(seen_shards=2, ordering=ordering, chaos_kill_marker=chaos),
    )
    eng.set_pages(table)
    return eng.run()


@pytest.mark.parametrize("ordering", ["strict", "scale"])
def test_worker_death_preserves_crawl_invariants(ray_session, ordering):
    table = build_site(80)
    want = _crawl(table, ordering, None)

    marker = os.path.join(
        tempfile.mkdtemp(prefix="brinkray_chaos_"), f"kill_{ordering}"
    )
    got = _crawl(table, ordering, marker)

    # the kill actually fired (the marker was claimed)
    assert os.path.exists(marker)
    # final seen set identical
    assert got.seen == want.seen
    # fetched (url, status) multiset identical; in strict mode the full
    # FIFO event sequence survives the retry byte-for-byte
    gt, wt = got.events_table(), want.events_table()
    if ordering == "strict":
        assert gt.select(
            ["wave", "order_key", "linked_from", "url", "status", "cached"]
        ).equals(
            wt.select(
                ["wave", "order_key", "linked_from", "url", "status", "cached"]
            )
        )
    else:
        def multiset(t):
            return sorted(
                zip(
                    t["url"].to_pylist(),
                    t["status"].to_pylist(),
                    t["cached"].to_pylist(),
                )
            )

        assert multiset(gt) == multiset(wt)
