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


# ---------------------------------------------------------- Crawl-delay


def test_parse_crawl_delay():
    from brinkray.engine.robots import parse_crawl_delay

    text = (
        "User-agent: fastbot\n"
        "Crawl-delay: 0.25\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /x/\n"
        "Crawl-delay: 2\n"
    )
    assert parse_crawl_delay(text, "fastbot") == 0.25
    assert parse_crawl_delay(text, "otherbot") == 2.0
    assert parse_crawl_delay(text) == 2.0
    # invalid / non-positive values are ignored; absent => None
    assert parse_crawl_delay("User-agent: *\nCrawl-delay: soon\n") is None
    assert parse_crawl_delay("User-agent: *\nCrawl-delay: -1\n") is None
    assert parse_crawl_delay("User-agent: *\nDisallow: /\n") is None


def test_crawl_delay_policy_and_validation():
    import pytest

    from brinkray.engine.crawl import CrawlEngine, EngineOptions
    from brinkray.engine.robots import RobotsPolicy
    from brinkray.fixtures import site_config

    pol = RobotsPolicy.from_pages(
        {"https://site-b.test": "User-agent: *\nCrawl-delay: 0.5\n"}
    )
    assert pol.crawl_delays == {"https://site-b.test": 0.5}

    with pytest.raises(ValueError, match="robots_enabled"):
        CrawlEngine(site_config(), EngineOptions(respect_crawl_delay=True))
    with pytest.raises(ValueError, match="strict"):
        CrawlEngine(
            site_config(),
            EngineOptions(
                respect_crawl_delay=True, robots_enabled=True, ordering="scale"
            ),
        )


def _replace_robots(table, domain_body: dict[str, str]):
    import pyarrow as pa

    urls = table["url"].to_pylist()
    htmls = table["html"].to_pylist()
    for dom, body in domain_body.items():
        htmls[urls.index(f"{dom}/robots.txt")] = body.encode()
    cols = {name: table[name] for name in table.schema.names}
    cols["html"] = pa.array(htmls, pa.binary())
    return pa.table(cols)


def test_crawl_delay_limits_novel_fetches_per_wave(ray_session):
    """Crawl-delay 0.5 with a 1-second wave period => at most 2 NOVEL
    site-b fetches per wave, surplus deferred; the final seen set is
    unchanged (deferral completeness)."""
    import pandas as pd

    from brinkray.engine.crawl import CrawlEngine, EngineOptions
    from brinkray.fixtures import build_site, site_config

    table = _replace_robots(
        build_site(60, with_robots=True),
        {"https://site-b.test": "User-agent: *\nCrawl-delay: 0.5\nDisallow: /status/\n"},
    )
    cfg = site_config()

    base = CrawlEngine(cfg, EngineOptions(seen_shards=2, robots_enabled=True))
    base.set_pages(table)
    r0 = base.run()

    eng = CrawlEngine(
        cfg,
        EngineOptions(
            seen_shards=2,
            robots_enabled=True,
            respect_crawl_delay=True,
            crawl_delay_wave_seconds=1.0,
        ),
    )
    eng.set_pages(table)
    r1 = eng.run()

    assert r1.seen == r0.seen

    def novel_b_per_wave(res) -> list[int]:
        ev = res.events_table()
        df = pd.DataFrame(
            {
                "wave": ev["wave"].to_pylist(),
                "url": ev["url"].to_pylist(),
                "cached": ev["cached"].to_pylist(),
            }
        )
        df = df[~df["cached"] & df["url"].str.startswith("https://site-b.test")]
        return df.groupby("wave").size().tolist()

    limited = novel_b_per_wave(r1)
    assert limited and max(limited) <= 2
    # the limit actually bit: the unlimited run exceeds it somewhere
    assert max(novel_b_per_wave(r0)) > 2
