"""robots.txt parser (functions/robotstxt.py) — grammar corner cases
beyond the oracle templates: CRLF files, agent-specific (non-wildcard)
matching, stacked user-agent runs sharing one rule block, groups with
only a crawl-delay, and the allow-all (no matching group) default.
Corpus-level parity vs an independent derivation is covered by the
`robots_parse_rules` DuckDB oracle."""


def _parse(spark, rows, agent="*"):
    from pyppeteer_scraper_spark.functions.robotstxt import (
        parse_robots_rules,
    )

    df = spark.createDataFrame(rows, "domain string, robots_txt string")
    out = parse_robots_rules(df, agent=agent)
    return {
        (r["domain"], r["path"]): (r["allow"], r["crawl_delay_ms"])
        for r in out.collect()
    }


def test_crlf_and_stacked_agents(spark):
    txt = (
        "User-agent: googlebot\r\n"
        "User-agent: *\r\n"
        "Disallow: /a\r\n"
        "Allow: /a/b\r\n"
        "\r\n"
        "User-agent: other\r\n"
        "Disallow: /c\r\n"
    )
    got = _parse(spark, [("d.example", txt)])
    # the stacked run matches '*'; the 'other' group does not
    assert got == {
        ("d.example", "/a"): (False, None),
        ("d.example", "/a/b"): (True, None),
    }
    # same file read as googlebot: identical rules (same stacked run)
    assert _parse(spark, [("d.example", txt)], agent="GoogleBot") == {
        ("d.example", "/a"): (False, None),
        ("d.example", "/a/b"): (True, None),
    }
    # 'other' agent gets only its own group
    assert _parse(spark, [("d.example", txt)], agent="other") == {
        ("d.example", "/c"): (False, None),
    }


def test_delay_only_group_and_allow_all_default(spark):
    rows = [
        # matching group declares only a delay -> no rule rows, and the
        # delay has no rule row to ride on (documented: delays surface
        # with rules; a rules-free domain is allow-all)
        ("slow.example", "User-agent: *\nCrawl-delay: 3\n"),
        # no group matches '*' -> no output at all (allow-all default)
        ("open.example", "User-agent: SpecificBot\nDisallow: /\n"),
        # delay applies across matched groups; max wins
        (
            "multi.example",
            "User-agent: *\nDisallow: /x\nCrawl-delay: 1\n\n"
            "User-agent: *\nDisallow: /y\nCrawl-delay: 4\n",
        ),
    ]
    got = _parse(spark, rows)
    assert ("open.example", "/") not in got
    assert all(d != "open.example" and d != "slow.example" for d, _ in got)
    assert got[("multi.example", "/x")] == (False, 4000)
    assert got[("multi.example", "/y")] == (False, 4000)


def test_robots_sitemaps_group_independent(spark):
    from pyppeteer_scraper_spark.functions.robotstxt import robots_sitemaps

    txt = (
        "User-agent: somebot\r\n"
        "Disallow: /private\r\n"
        "Sitemap: https://a.example/sitemap.xml  # comment\r\n"
        "\n"
        "User-agent: *\n"
        "SITEMAP: https://a.example/sitemap-news.xml\n"
        "Sitemap:\n"  # empty value dropped
    )
    df = spark.createDataFrame(
        [("a.example", txt), ("b.example", "User-agent: *\nDisallow: /x")],
        "domain string, robots_txt string",
    )
    out = {
        (r["domain"], r["sitemap_url"])
        for r in robots_sitemaps(df).collect()
    }
    # directives surface regardless of which UA group encloses them,
    # case-insensitively, comments stripped; no-directive domain absent
    assert out == {
        ("a.example", "https://a.example/sitemap.xml"),
        ("a.example", "https://a.example/sitemap-news.xml"),
    }
