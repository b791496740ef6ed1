"""Sitemap ingestion (sources/sitemaps.py) — entity decoding order,
empty-loc drops, priority-tier mapping, and the integration the parser
exists for: parsed seeds flow straight into the crawl frontier via
plans/round.py::init_state.  Value parity vs an independent derivation
is covered by the `sitemap_parse` DuckDB oracle."""

from pyspark.sql import functions as F


def test_entity_decode_and_empty_loc(spark):
    from pyppeteer_scraper_spark.sources.sitemaps import parse_sitemaps

    xml = (
        "<urlset>"
        # &amp;lt; must decode to the literal '&lt;', not '<'
        "<url><loc>https://d.example/q?a=1&amp;b=2&amp;lt;</loc></url>"
        "<url><loc></loc></url>"  # empty loc -> dropped
        "<url><loc>https://d.example/'quote'&quot;</loc></url>"
        "</urlset>"
    )
    df = spark.createDataFrame(
        [("d.example", xml)], "domain string, sitemap_xml string"
    )
    locs = sorted(
        r["loc"] for r in parse_sitemaps(df).select("loc").collect()
    )
    assert locs == [
        "https://d.example/'quote'\"",
        "https://d.example/q?a=1&b=2&lt;",
    ]


def test_seeds_feed_init_state(spark):
    from pyppeteer_scraper_spark.plans.round import init_state
    from pyppeteer_scraper_spark.sources.sitemaps import (
        parse_sitemaps,
        sitemap_seeds,
    )

    xml = (
        "<urlset>"
        "<url><loc>https://a.example/hot</loc><priority>0.9</priority></url>"
        "<url><loc>https://a.example/cold</loc><priority>0.2</priority></url>"
        "<url><loc>https://b.example/default</loc></url>"  # 0.5 default
        "</urlset>"
    )
    df = spark.createDataFrame(
        [("a.example", xml)], "domain string, sitemap_xml string"
    )
    seeds = sitemap_seeds(parse_sitemaps(df))
    got = {r["url"]: r["priority"] for r in seeds.collect()}
    assert got == {
        "https://a.example/hot": 0,
        "https://a.example/cold": 1,
        "https://b.example/default": 1,
    }

    state = init_state(spark, seeds)
    rows = {
        r["url"]: (r["domain"], r["priority"], r["state"])
        for r in state.frontier.collect()
    }
    assert len(rows) == 3
    assert rows["https://a.example/hot"] == ("a.example", 0, "pending")
    assert rows["https://b.example/default"][0] == "b.example"
    # frontier schema contract intact (url_hash populated, no nulls)
    assert (
        state.frontier.filter(F.col("url_hash").isNull()).count() == 0
    )
