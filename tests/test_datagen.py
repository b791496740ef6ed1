from pyspark.sql import functions as F

from pyppeteer_scraper_spark.functions.canonicalize import with_canonical_url
from pyppeteer_scraper_spark.sources.datagen import (
    MEGA_HOST,
    generate_crawl_tables,
)


def test_crawl_tables_shape(spark, sf_small, tmp_path):
    t = generate_crawl_tables(spark, sf_small, out_dir=str(tmp_path / "crawl"))
    pages, seeds, robots = t["pages"], t["seeds"], t["robots"]

    n_docs = spark.read.parquet(f"{sf_small}/documents.parquet").count()
    n_pages = pages.count()
    assert n_pages > n_docs  # base docs + duplicate variants

    # mega-host skew ~30%
    mega = pages.filter(F.col("url").contains(MEGA_HOST)).count()
    assert 0.2 < mega / n_pages < 0.45

    # duplicate variants collapse under canonicalization
    canon = with_canonical_url(pages.select("url"))
    assert canon.select("url").distinct().count() < n_pages

    # seeds: 50 rows, priorities in {0,1}
    srows = seeds.collect()
    assert len(srows) == 50
    assert {r["priority"] for r in srows} <= {0, 1}

    # robots: one row per domain, some disallowed, mega throttled
    r = {x["domain"]: x for x in robots.collect()}
    assert MEGA_HOST in r
    assert r[MEGA_HOST]["max_per_round"] == 8
    assert any(not x["allow"] for x in r.values())
    assert any(x["max_per_round"] == 1 for x in r.values())

    # ~5% of base pages embed the reference-shaped workshop payload
    with_payload = pages.filter(
        F.col("html").cast("string").contains('<script type="application/json">')
    ).count()
    assert with_payload > 0

    # determinism: regeneration yields the identical table
    t2 = generate_crawl_tables(spark, sf_small)
    assert t2["pages"].exceptAll(pages).count() == 0
    assert pages.exceptAll(t2["pages"]).count() == 0
