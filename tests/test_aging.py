"""Priority aging (operators/aging.py): starvation rescue, bounded
scheduling rounds, and no-op equivalence with the static order."""

from pyspark.sql import functions as F

from pyppeteer_scraper_spark.operators.aging import (
    aged_priority,
    select_batch_aged,
)
from pyppeteer_scraper_spark.operators.topk import topk_per_group


def _frontier(spark, n_fresh=40, starved_priority=30):
    """One domain: n_fresh fresh high-priority URLs (priority 0-3,
    discovered this round) plus ONE old low-priority URL."""
    rows = [
        ("d0", f"https://d0.example/fresh{i:03d}", i % 4, 20)
        for i in range(n_fresh)
    ]
    rows.append(("d0", "https://d0.example/starved", starved_priority, 0))
    return spark.createDataFrame(
        rows, "domain string, url string, priority long, discovered_round long"
    )


def test_static_order_starves_worst_url(spark):
    pend = _frontier(spark)
    sel = topk_per_group(
        pend, ["domain"], [F.col("priority"), F.col("url")], 4, salt_on="url"
    )
    assert (
        sel.filter(F.col("url").contains("starved")).count() == 0
    ), "static order must starve the planted URL for this test to mean anything"


def test_aging_rescues_within_bounded_rounds(spark):
    # The bounded-rounds guarantee is relative to the competition's
    # AGE, not its count: a URL with priority gap G and age lead L
    # wins once floor(L / boost_every) > G.  Here the starved URL
    # (priority 30, discovered round 0) competes at round 100 with
    # fresh arrivals (priority 0-3, discovered round 100): age lead
    # 100, boost_every=2 → 50 levels gained > 27-level gap → selected.
    fresh0 = _frontier(spark).withColumn(
        "discovered_round",
        F.when(F.col("url").contains("starved"), F.lit(0)).otherwise(
            F.lit(100)
        ),
    )
    sel = select_batch_aged(fresh0, cap=4, round_no=100, boost_every=2)
    assert sel.filter(F.col("url").contains("starved")).count() == 1
    # and the aged value is exactly priority - floor(age/boost)
    got = sel.filter(F.col("url").contains("starved")).collect()[0]
    assert got["aged_priority"] == 30 - 100 // 2


def test_huge_boost_every_is_static_noop(spark):
    pend = _frontier(spark)
    aged = select_batch_aged(
        pend, cap=4, round_no=21, boost_every=10_000
    ).select("url")
    static = topk_per_group(
        pend, ["domain"], [F.col("priority"), F.col("url")], 4, salt_on="url"
    ).select("url")
    assert aged.exceptAll(static).count() == 0
    assert static.exceptAll(aged).count() == 0


def test_aged_priority_expression(spark):
    df = spark.createDataFrame(
        [(10, 0), (10, 5), (0, 7)], "priority long, discovered_round long"
    )
    out = df.select(
        aged_priority(
            F.col("priority"), F.col("discovered_round"), 8, boost_every=4
        ).alias("a")
    ).collect()
    # ages 8,3,1 → boosts 2,0,0
    assert [r["a"] for r in out] == [8, 10, 0]
