"""robots.txt parsing + robots-enabled crawl (engine == oracle)."""

from brinkray.engine.robots import RobotsPolicy, parse_robots


def test_parse_groups_and_fallback():
    text = (
        "# comment\n"
        "User-agent: evilbot\n"
        "Disallow: /\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Allow: /private/ok\n"
    )
    star = parse_robots(text, "*")
    assert [(r.allow, r.prefix) for r in star] == [
        (False, "/private/"),
        (True, "/private/ok"),
    ]
    evil = parse_robots(text, "EvilBot")
    assert [(r.allow, r.prefix) for r in evil] == [(False, "/")]
    # unknown agent falls back to *
    assert parse_robots(text, "other") == star


def test_stacked_user_agents_share_rules():
    text = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert parse_robots(text, "a") == parse_robots(text, "b")
    assert parse_robots(text, "a")[0].prefix == "/x"


def test_longest_match_wins():
    policy = RobotsPolicy.from_pages(
        {"https://h.test": "User-agent: *\nDisallow: /a\nAllow: /a/b\n"}
    )
    assert not policy.allowed("https://h.test", "/a")
    assert not policy.allowed("https://h.test", "/a/c")
    assert policy.allowed("https://h.test", "/a/b")
    assert policy.allowed("https://h.test", "/a/b/c")
    assert policy.allowed("https://h.test", "/other")
    # domain with no robots: everything allowed
    assert policy.allowed("https://none.test", "/a")


def test_empty_disallow_allows_all():
    policy = RobotsPolicy.from_pages({"https://h.test": "User-agent: *\nDisallow:\n"})
    assert policy.allowed("https://h.test", "/anything")


def test_robots_crawl_engine_matches_oracle(ray_session):
    from brinkray.engine.crawl import CrawlEngine, EngineOptions
    from brinkray.fixtures import build_site, site_config
    from brinkray.ref.oracle import crawl_oracle
    from brinkray.ref.world import Web

    cfg = site_config()
    table = build_site(50, with_robots=True)
    web = Web.build(table["url"].to_pylist(), table["html"].to_pylist(), cfg)
    policy = RobotsPolicy.from_pages(
        {
            "https://site-a.test": table["html"][
                table["url"].to_pylist().index("https://site-a.test/robots.txt")
            ]
            .as_py()
            .decode(),
            "https://site-b.test": table["html"][
                table["url"].to_pylist().index("https://site-b.test/robots.txt")
            ]
            .as_py()
            .decode(),
        }
    )
    oracle = crawl_oracle(web, cfg, robots=policy)
    # the policy actually bites: disallowed paths absent from seen
    # (robots are per-host: site-b allows /missing/, site-a doesn't)
    assert not any(
        u.startswith("https://site-a.test/missing/") for u in oracle.seen
    )
    assert not any(
        u.startswith("https://site-b.test/status/") for u in oracle.seen
    )
    baseline = crawl_oracle(web, cfg)
    assert any(
        u.startswith("https://site-a.test/missing/") for u in baseline.seen
    )

    eng = CrawlEngine(cfg, EngineOptions(seen_shards=2, robots_enabled=True))
    eng.set_pages(table)
    result = eng.run()
    got = list(
        zip(
            result.events_table()["linked_from"].to_pylist(),
            result.events_table()["url"].to_pylist(),
            result.events_table()["status"].to_pylist(),
            result.events_table()["cached"].to_pylist(),
        )
    )
    want = [(e.linked_from, e.url, e.status, e.cached) for e in oracle.events]
    assert got == want
    assert result.seen == oracle.seen
