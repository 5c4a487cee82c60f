"""Unit tests: cuckoo filter, seen shards, politeness, cookie session."""

import numpy as np
import pytest

from brinkray.state.cuckoo import CuckooFilter, sha1_64


def test_cuckoo_basic():
    f = CuckooFilter(capacity=1 << 12)
    keys = [f"https://h.test/p/{i}" for i in range(2000)]
    for k in keys:
        f.add(k)
    # no false negatives, ever
    assert all(k in f for k in keys)
    # false-positive rate on fresh keys stays tiny
    fresh = [f"https://other.test/q/{i}" for i in range(4000)]
    fp = sum(1 for k in fresh if k in f)
    assert fp / len(fresh) < 0.01


def test_cuckoo_batch_matches_scalar():
    f = CuckooFilter(capacity=1 << 10)
    ins = [f"k{i}" for i in range(300)]
    for k in ins:
        f.add(k)
    probe = ins[:50] + [f"x{i}" for i in range(50)]
    hashes = np.array([sha1_64(k) for k in probe], dtype=np.uint64)
    batch = f.contains_many(hashes)
    scalar = [k in f for k in probe]
    assert list(batch) == scalar


def test_cuckoo_overflow_keeps_correctness():
    f = CuckooFilter(capacity=16)  # deliberately tiny
    keys = [f"k{i}" for i in range(200)]
    for k in keys:
        f.add(k)
    assert all(k in f for k in keys)  # overflow set guarantees no false negatives


def test_cuckoo_dump_restore():
    f = CuckooFilter(capacity=1 << 10)
    for i in range(100):
        f.add(f"k{i}")
    g = CuckooFilter.restore(f.dump())
    assert all(f"k{i}" in g for i in range(100))
    assert g.count == f.count


def test_sha1_64_stable():
    # pinned: sharding must be stable across processes/versions
    assert sha1_64("https://site-a.test") == int.from_bytes(
        __import__("hashlib").sha1(b"https://site-a.test").digest()[:8], "big"
    )


def test_seen_shards(ray_session):
    from brinkray.state.seen import ShardedSeenSet

    s = ShardedSeenSet(3)
    canons = [f"https://h.test/p/{i}" for i in range(50)]
    assert s.check(canons) == [-1] * 50
    s.mark(canons[:30], [200] * 30)
    got = s.check(canons)
    assert got[:30] == [200] * 30
    assert got[30:] == [-1] * 20
    # first-write-wins (brink.go:103 marks once)
    s.mark(canons[:5], [404] * 5)
    assert s.check(canons[:5]) == [200] * 5
    assert s.size() == 30
    items = s.all_items()
    assert len(items) == 30 and items[canons[0]] == 200
    # dump/restore round-trip
    dumps = s.dump()
    s2 = ShardedSeenSet(3)
    s2.restore(dumps)
    assert s2.check(canons) == got


def test_politeness_budget(ray_session):
    from brinkray.state.politeness import PolitenessClient

    p = PolitenessClient(2, per_host_budget=10)
    assert p.take("https://a.test", 7) == 7
    assert p.take("https://a.test", 7) == 3  # capped
    assert p.take("https://a.test", 1) == 0
    assert p.take("https://b.test", 4) == 4  # independent per host
    assert p.usage() == {"https://a.test": 10, "https://b.test": 4}


def test_politeness_unlimited(ray_session):
    from brinkray.state.politeness import PolitenessClient

    p = PolitenessClient(2, per_host_budget=None)
    assert p.take("https://a.test", 10**6) == 10**6


def test_cookie_session_auth_drop():
    """brink.go:173-192: the Authorization header is deleted permanently
    once any request carries a session cookie (case-insensitive name)."""
    from brinkray.engine.fetch import CookieSession
    from brinkray.ref import AUTH_BASIC, Cookie, CrawlOptions, new_config_with_opts

    opts = CrawlOptions(
        auth_type=AUTH_BASIC,
        user="u",
        password="p",
        cookies={"JSESSIONID": Cookie(name="JSESSIONID", value="abc")},
        session_cookie_names=["jsessionid"],
    )
    cfg = new_config_with_opts("https://a.test", opts)
    s = CookieSession(cfg)
    h1 = s.prepare_headers()
    # the deletion happens while cookies are attached, BEFORE headers
    # are added — so even the first request loses Authorization
    assert "Authorization" not in h1
    assert h1["Cookie"] == "JSESSIONID=abc"
    assert "Authorization" not in s.prepare_headers()


def test_cookie_session_no_session_cookie_keeps_auth():
    from brinkray.engine.fetch import CookieSession
    from brinkray.ref import AUTH_BASIC, Cookie, CrawlOptions, new_config_with_opts

    opts = CrawlOptions(
        auth_type=AUTH_BASIC,
        user="u",
        password="p",
        cookies={"other": Cookie(name="other", value="1")},
        session_cookie_names=["jsessionid"],
    )
    cfg = new_config_with_opts("https://a.test", opts)
    s = CookieSession(cfg)
    assert s.prepare_headers()["Authorization"].startswith("Basic ")
    # response cookies merge by name (brink.go:267-274)
    s.merge_response_cookies([Cookie(name="other", value="2")])
    assert s.cookies["other"].value == "2"
    # ...and a session cookie arriving later drops auth from then on
    s.merge_response_cookies([Cookie(name="JSessionID", value="z")])
    assert "Authorization" not in s.prepare_headers()


def test_retain_canon_off_drops_strings_not_semantics(ray_session):
    """retain_canon=False (the 10^10-URL memory mode): check / mark /
    reserve / dedup semantics identical, memory ~canon-free (dump
    carries no strings), all_items raises with a pointer."""
    import pytest

    from brinkray.state.seen import ShardedSeenSet

    a = ShardedSeenSet(2, retain_canon=True)
    b = ShardedSeenSet(2, retain_canon=False)
    urls = [f"https://x.test/p/{i}" for i in range(200)]
    for s in (a, b):
        s.mark(urls[:150], [200] * 150)
    assert a.check(urls) == b.check(urls)
    assert a.size() == b.size() == 150
    assert b.reserve(urls[140:160])[:10] == [200] * 10  # stored statuses
    with pytest.raises(RuntimeError, match="retain_canon"):
        b.all_items()
    assert len(a.all_items()) == 150
    # dump: no canon strings retained; restore round-trips the flag
    dumps = b.dump()
    assert all(d["canon"] == {} and d["retain_canon"] is False for d in dumps)
    c = ShardedSeenSet(2, retain_canon=True)
    c.restore(dumps)
    assert c.check(urls) == b.check(urls)
    with pytest.raises(RuntimeError):
        c.all_items()  # restore adopts the dump's mode


def test_engine_scale_run_with_retain_canon_off(ray_session, tmp_path):
    """Scale-mode e2e with retain_canon=False + events sink: same seen
    COUNT and same sunk events as the conformance run; the canon-keyed
    surfaces raise."""
    import pytest

    from brinkray.engine.crawl import CrawlEngine, EngineOptions
    from brinkray.fixtures import build_site, site_config

    cfg = site_config()
    table = build_site(60)
    ref_eng = CrawlEngine(cfg, EngineOptions(seen_shards=2, ordering="scale"))
    ref_eng.set_pages(table)
    want = ref_eng.run()

    sink = str(tmp_path / "sink")
    eng = CrawlEngine(
        cfg,
        EngineOptions(
            seen_shards=2, ordering="scale", retain_canon=False,
            events_sink_dir=sink, retain_results=False,
        ),
    )
    eng.set_pages(table)
    res = eng.run()
    assert res.seen_count() == want.seen_count()
    with pytest.raises(RuntimeError, match="retain_canon"):
        _ = res.seen
    key = ["linked_from", "url", "status", "cached"]
    got = (
        res.events_dataset().to_pandas()[key]
        .sort_values(key).reset_index(drop=True)
    )
    exp = (
        want.events_table().select(key).to_pandas()
        .sort_values(key).reset_index(drop=True)
    )
    assert got.equals(exp)


# ------------------------------------------------------ recrawl/refresh


def test_seen_forget_roundtrip(ray_session):
    from brinkray.state.seen import ShardedSeenSet

    s = ShardedSeenSet(2)
    s.mark(["https://a.test/p/1", "https://a.test/p/2"], [200, 404])
    assert s.check(["https://a.test/p/1", "https://a.test/p/2"]) == [200, 404]
    assert s.forget(["https://a.test/p/1", "https://a.test/p/9"]) == 1
    # expired url is novel again; the other is untouched
    assert s.check(["https://a.test/p/1", "https://a.test/p/2"]) == [-1, 404]
    # re-mark after forget works (stale cuckoo fingerprint is harmless)
    s.mark(["https://a.test/p/1"], [503])
    assert s.check(["https://a.test/p/1"]) == [503]
    assert s.size() == 2


def test_reval_items_survives_forget(ray_session):
    """Hard forget after a classified re-mark must not orphan the
    reval entry (it used to KeyError a later reval_items()); a soft
    forget leaves the classification but skips the in-flight digest
    until its re-mark restores the canon."""
    from brinkray.state.seen import ShardedSeenSet

    s = ShardedSeenSet(2, track_body=True)
    u1, u2 = "https://a.test/r/1", "https://a.test/r/2"
    s.mark([u1, u2], [200, 200], body_md5s=[b"A" * 16, b"B" * 16])
    s.forget([u1, u2], keep_body=True)  # soft expire both
    # re-mark: u1 modified, u2 revalidated
    s.mark([u1, u2], [200, 200], body_md5s=[b"X" * 16, b"B" * 16])
    assert s.reval_items() == {u1: True, u2: False}
    assert s.reval_stats() == (1, 1)

    # HARD forget u1: classification history goes with it
    assert s.forget([u1]) == 1
    assert s.reval_items() == {u2: False}  # no KeyError, u1 gone
    assert s.reval_stats() == (1, 0)

    # SOFT forget u2 (next refresh round): canon is popped while the
    # refetch is in flight — reval_items skips it instead of raising
    assert s.forget([u2], keep_body=True) == 1
    assert s.reval_items() == {}
    s.mark([u2], [200], body_md5s=[b"B" * 16])
    assert s.reval_items() == {u2: False}


def test_recrawl_refreshes_expired_urls(ray_session):
    """expire_urls + a second run() on the same engine: the expired
    urls fetch FRESH (cached=False) while their rediscovered neighbors
    replay cached; final seen set identical to the first crawl."""
    from brinkray.engine.crawl import CrawlEngine, EngineOptions
    from brinkray.fixtures import build_site, site_config

    table = build_site(50)
    eng = CrawlEngine(site_config(), EngineOptions(seen_shards=2))
    eng.set_pages(table)
    first = eng.run()
    stale = ["https://site-a.test/p/1", "https://site-b.test/p/2"]
    assert all(u in first.seen for u in stale)

    assert eng.expire_urls(stale) == 2
    second = eng.run(seeds=stale)

    ev = second.events_table()
    rows = {
        u: c for u, c in zip(ev["url"].to_pylist(), ev["cached"].to_pylist())
        if u in stale
    }
    assert rows == {u: False for u in stale}  # re-fetched fresh
    # everything rediscovered beyond the stale seeds replays cached
    others = [
        c for u, c in zip(ev["url"].to_pylist(), ev["cached"].to_pylist())
        if u not in stale
    ]
    assert others and all(others)
    # the refresh restored the original statuses => identical seen set
    assert eng.seen.all_items() == first.seen


@pytest.mark.parametrize("ordering", ["strict", "scale"])
def test_revalidation_classifies_modified_vs_unchanged(ray_session, ordering):
    """Conditional-GET revalidation (track_body_hashes): soft-expire
    two urls, mutate ONE page's body, refresh — the unchanged url
    classifies revalidated (the 304 outcome), the mutated one modified;
    a HARD expire leaves no stored hash, so no classification."""
    import pyarrow as pa

    from brinkray.engine.crawl import CrawlEngine, EngineOptions
    from brinkray.fixtures import build_site, site_config

    table = build_site(50)
    eng = CrawlEngine(
        site_config(),
        EngineOptions(seen_shards=2, track_body_hashes=True, ordering=ordering),
    )
    eng.set_pages(table)
    first = eng.run()
    same_u = "https://site-a.test/p/1"
    mod_u = "https://site-b.test/p/2"
    hard_u = "https://site-a.test/p/3"
    assert all(u in first.seen for u in (same_u, mod_u, hard_u))

    assert eng.expire_urls([same_u, mod_u], keep_body=True) == 2
    assert eng.expire_urls([hard_u]) == 1  # hard: body hash dropped too

    urls = table["url"].to_pylist()
    htmls = table["html"].to_pylist()
    i = urls.index(mod_u)
    htmls[i] = htmls[i] + b"<!--v2-->"
    mutated = table.set_column(
        table.schema.get_field_index("html"), "html",
        pa.array(htmls, table["html"].type),
    )
    eng.set_pages(mutated)
    eng.run(seeds=[same_u, mod_u, hard_u])

    assert eng.reval_items() == {same_u: False, mod_u: True}
    assert eng.reval_stats() == (1, 1)
    assert eng.seen.all_items() == first.seen  # statuses unchanged
