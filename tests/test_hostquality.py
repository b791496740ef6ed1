"""Host-quality frontier demotion (operators/hostquality.py) — the
scheduler-facing half: only pending rows on strictly-below-threshold
domains demote, priorities only move upward, everything else passes
through.  The per-domain quality values + demotion verdicts are
oracle-checked by `rank_domain_quality`."""

from pyspark.sql import functions as F


def test_demote_low_quality_domains(spark):
    from pyppeteer_scraper_spark.operators.hostquality import (
        demote_low_quality_domains,
    )

    quality = spark.createDataFrame(
        [("bad.example", 10, 0.10),
         ("meh.example", 10, 0.40),
         ("ok.example", 10, 0.60),
         ("good.example", 10, 0.90)],
        "domain string, n_docs long, quality double",
    )
    frontier = spark.createDataFrame(
        [
            ("u1", "bad.example", 1, "pending"),
            ("u2", "bad.example", 0, "fetched"),   # not pending: untouched
            ("u3", "meh.example", 2, "pending"),
            ("u4", "good.example", 1, "pending"),
            ("u5", "bad.example", 5, "pending"),   # already worse than 3
            ("u6", "new.example", 1, "pending"),   # unknown domain: untouched
        ],
        "url string, domain string, priority int, state string",
    )
    # exact percentile(0.25) over [.1,.4,.6,.9] = 0.325 -> only bad.example
    # is strictly below; meh (0.40) survives.
    out = {
        r["url"]: r["priority"]
        for r in demote_low_quality_domains(
            frontier, quality, demote_frac=0.25, demoted_priority=3,
            exact=True,
        ).collect()
    }
    assert out == {"u1": 3, "u2": 0, "u3": 2, "u4": 1, "u5": 5, "u6": 1}


def test_domain_quality_partitioning_invariance(spark):
    from pyppeteer_scraper_spark.operators.hostquality import domain_quality

    rows = [
        ("a.example", f"some text number {i} with words")
        for i in range(40)
    ] + [("b.example", "short")]
    df = spark.createDataFrame(rows, "domain string, text string")
    q1 = {
        r["domain"]: (r["n_docs"], r["quality"])
        for r in domain_quality(df.coalesce(1)).collect()
    }
    q13 = {
        r["domain"]: (r["n_docs"], r["quality"])
        for r in domain_quality(df.repartition(13)).collect()
    }
    # exact-integer aggregation: identical under any partitioning
    assert q1 == q13
    assert q1["a.example"][0] == 40
