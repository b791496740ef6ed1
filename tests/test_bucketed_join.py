"""Bucketed co-located join — the zero-shuffle join layout the engine
targets for the url_seen/frontier anti-join at cluster scale (Iceberg
`bucket(N, url_hash)` partition transform; Spark's `bucketBy` is the
sandbox stand-in).

Asserts the physical property the 100-TB story depends on: two tables
bucketed+sorted on the join key sort-merge-join with NO Exchange on
either side — the join cost is a local merge per bucket, however large
the tables grow.  A same-key join of UNBUCKETED tables over identical
data shows the Exchange this layout removes.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse_tables(spark, tmp_path_factory):
    # 'spark' is the shared session; its warehouse dir is already set.
    # Use unique table names to avoid cross-run clashes.
    seen = spark.range(0, 10_000).select(
        F.col("id").alias("url_hash"),
        F.md5(F.col("id").cast("string")).alias("url"),
    )
    links = spark.range(0, 3_000).select(
        (F.col("id") * 3).alias("url_hash"),
        F.lit(1).alias("hits"),
    )
    spark.sql("DROP TABLE IF EXISTS seen_bkt")
    spark.sql("DROP TABLE IF EXISTS links_bkt")
    (
        seen.write.bucketBy(8, "url_hash").sortBy("url_hash")
        .mode("overwrite").format("parquet").saveAsTable("seen_bkt")
    )
    (
        links.write.bucketBy(8, "url_hash").sortBy("url_hash")
        .mode("overwrite").format("parquet").saveAsTable("links_bkt")
    )
    yield seen, links
    spark.sql("DROP TABLE IF EXISTS seen_bkt")
    spark.sql("DROP TABLE IF EXISTS links_bkt")


def _joined_plan(spark):
    a = spark.table("links_bkt")
    b = spark.table("seen_bkt")
    joined = a.hint("merge").join(b, "url_hash", "left_anti")
    return joined, joined._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, warehouse_tables):
    joined, plan = _joined_plan(spark)
    assert "SortMergeJoin" in plan
    # the property that matters at 100 TB: neither side reshuffles
    assert "Exchange" not in plan, plan
    # and the result is correct: anti-join keeps hashes not in seen
    # (seen covers 0..9999, links are multiples of 3 up to 8997 -> empty)
    assert joined.count() == 0


def test_unbucketed_same_join_shuffles(spark, warehouse_tables):
    seen, links = warehouse_tables
    plan = (
        links.hint("merge")
        .join(seen, "url_hash", "left_anti")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # control: identical data without the bucketed layout pays Exchanges
    assert "Exchange" in plan


def test_bucketed_groupby_skips_shuffle(spark, warehouse_tables):
    # partial+final agg collapse onto the bucket layout: no Exchange
    plan = (
        spark.table("seen_bkt")
        .groupBy("url_hash")
        .agg(F.count("*").alias("n"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
