"""Round-4 batch: outlink-resolution and robots→sitemap discovery
pipeline queries — verdict-level semantics beyond the oracle hash."""

from pyspark.sql import functions as F


def test_outlink_resolve_forms(spark, sf_med):
    from pyppeteer_scraper_spark.plans.queries import QUERIES

    rows = QUERIES["url_outlink_resolve"](spark, sf_med).filter(
        F.col("doc_id") == 7
    ).orderBy("link_idx").collect()
    # doc 7: url https://s7.example.org/dir3/sub/page7.html
    assert [r["href"] for r in rows] == [
        "../up1", "/abs/p2", "rel/r1?k=1", "#frag", "//cdn.example.net/x1.js",
    ]
    assert [r["resolved"] for r in rows] == [
        "https://s7.example.org/dir3/up1",
        "https://s7.example.org/abs/p2",
        "https://s7.example.org/dir3/sub/rel/r1?k=1",
        "https://s7.example.org/dir3/sub/page7.html",  # fragment-only → self
        "https://cdn.example.net/x1.js",
    ]


def test_robots_sitemap_discovery_verdicts(spark, sf_med):
    from pyppeteer_scraper_spark.plans.queries import QUERIES

    out = QUERIES["pipeline_robots_sitemap_discovery"](spark, sf_med)
    rows = out.collect()
    # 25 domains × 4 urls from exactly the DECLARED sitemap of each
    assert len(rows) == 100
    assert all(("/sm0/" in r["path"]) or ("/sm1/" in r["path"]) or "private" in r["path"] for r in rows)
    for r in rows:
        if "/ok/" in r["path"]:
            assert r["allowed"] is True          # Allow rule is longer
            assert r["matched_pattern"].endswith("/ok/")
        elif "/private" in r["path"]:
            assert r["allowed"] is False
            assert r["matched_pattern"].endswith("/")
        else:
            assert r["allowed"] is True and r["matched_pattern"] is None
    # the chain really gated on robots: domain k declares sm{k%2} only
    for r in rows:
        k = int(r["domain"][1:].split(".")[0])
        if "/sm" in r["path"]:
            assert f"/sm{k % 2}/" in r["path"]
