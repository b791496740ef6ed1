"""Count-Min sketch: one-sided error law, exact mergeability."""

from pyspark.sql import functions as F

from pyppeteer_scraper_spark.operators.countmin import (
    cms_build,
    cms_estimate,
    cms_merge,
)

# planted skewed multiset: zipf-ish counts over 40 distinct keys,
# sketched at width 8 so collisions are guaranteed (40 keys >> 8
# buckets per depth row)
TRUE = {f"k{i}": max(1, 200 // (i + 1)) for i in range(40)}
WIDTH, DEPTH = 8, 3


def _items(spark):
    rows = [(k,) for k, c in TRUE.items() for _ in range(c)]
    return spark.createDataFrame(rows, ["item"])


def test_cms_never_underestimates_and_collides(spark):
    items = _items(spark)
    cms = cms_build(items, "item", depth=DEPTH, width=WIDTH)
    qs = spark.createDataFrame([(k,) for k in TRUE], ["item"])
    est = {
        r["item"]: r["cms_est"]
        for r in cms_estimate(
            cms, qs, "item", depth=DEPTH, width=WIDTH
        ).collect()
    }
    assert set(est) == set(TRUE)
    # one-sided error: estimate >= true, always
    for k, t in TRUE.items():
        assert est[k] >= t, (k, est[k], t)
    # the test is not vacuous: at width 8 some keys MUST collide
    assert any(est[k] > t for k, t in TRUE.items())
    # total mass conservation per depth row
    n = sum(TRUE.values())
    per_d = cms.groupBy("d").agg(F.sum("cnt").alias("s")).collect()
    assert all(r["s"] == n for r in per_d)


def test_cms_merge_is_exact(spark):
    items = _items(spark).withColumn(
        "half", F.pmod(F.crc32(F.col("item")), F.lit(2))
    )
    a = cms_build(
        items.filter("half = 0"), "item", depth=DEPTH, width=WIDTH
    )
    b = cms_build(
        items.filter("half = 1"), "item", depth=DEPTH, width=WIDTH
    )
    merged = {
        (r["d"], r["b"]): r["cnt"]
        for r in cms_merge(a, b).collect()
    }
    whole = {
        (r["d"], r["b"]): r["cnt"]
        for r in cms_build(
            items, "item", depth=DEPTH, width=WIDTH
        ).collect()
    }
    assert merged == whole
