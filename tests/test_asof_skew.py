"""Skew-bucketed as-of join (operators/asof.py skew_bucket_width):
the coarse-time-bucket carry-forward path must be bit-identical to the
single-window form on a planted mega-key, honor all golden semantics
(inclusive ties, empty buckets, unmatched rows), and actually bound the
per-window group size."""

from pyspark.sql import functions as F

from pyppeteer_scraper_spark.operators.asof import as_of_join


def _mk(spark, n_left=400, n_right=120):
    # one mega-key (user 7) holding ~80% of rows + a few normal keys;
    # numeric time so bucket widths are exact
    lrows, rrows = [], []
    for i in range(n_left):
        uid = 7 if i % 5 != 4 else (i % 3)
        lrows.append((i, uid, (i * 13) % 1000))
    for j in range(n_right):
        uid = 7 if j % 4 != 3 else (j % 3)
        rrows.append((1000 + j, uid, (j * 31) % 1000))
    left = spark.createDataFrame(lrows, "event_id int, user_id int, t long")
    # dedupe right per (key, time): the documented determinism contract
    right = (
        spark.createDataFrame(rrows, "view_id int, user_id int, t long")
        .groupBy("user_id", "t")
        .agg(F.max("view_id").alias("view_id"))
    )
    return left, right


def test_bucketed_asof_matches_single_window(spark):
    left, right = _mk(spark)
    kw = dict(
        on=["user_id"], left_time="t", right_time="t",
        payload_cols=["view_id", "t"], how="left",
    )
    base = as_of_join(left, right, **kw)
    for width in (1, 7, 50, 10_000):  # incl. width>range (1 bucket)
        got = as_of_join(left, right, skew_bucket_width=width, **kw)
        assert got.exceptAll(base).count() == 0, width
        assert base.exceptAll(got).count() == 0, width
        assert got.count() == left.count()


def test_bucketed_asof_timestamp_time(spark):
    left = spark.createDataFrame(
        [(1, 10, "2024-01-01 00:02:05"), (2, 10, "2024-01-01 00:00:01"),
         (3, 20, "2024-01-01 03:00:00")],
        "event_id int, user_id int, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(101, 10, "2024-01-01 00:00:30"), (102, 10, "2024-01-01 00:02:05"),
         (201, 20, "2024-01-01 00:59:59")],
        "view_id int, user_id int, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    kw = dict(on=["user_id"], left_time="ts", right_time="ts",
              payload_cols=["view_id"], how="left")
    base = as_of_join(left, right, **kw)
    # 60s buckets: event 1 ties a right row inside its own bucket
    # (inclusive -> 102), event 2 precedes everything (null), event 3
    # crosses two empty hours of buckets (carry-in propagates)
    got = as_of_join(left, right, skew_bucket_width=60, **kw)
    vals = {r["event_id"]: (r["asof"]["view_id"] if r["asof"] else None)
            for r in got.collect()}
    assert vals == {1: 102, 2: None, 3: 201}
    assert got.exceptAll(base).count() == 0


def test_bucketed_asof_window_groups_are_bounded(spark):
    """The data-path window must partition by (key, bucket): with the
    mega-key planted, no (user_id, bucket) group may exceed the rows
    that fall in one bucket — the whole point of the mitigation."""
    left, right = _mk(spark)
    width = 50
    out = as_of_join(
        left, right, on=["user_id"], left_time="t", right_time="t",
        payload_cols=["view_id"], how="left", skew_bucket_width=width,
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    data_specs = [s for s in specs if "__side" in s]  # the data-path sort
    assert data_specs, plan
    for s in data_specs:
        assert "__bkt" in s.split("__t")[0], s  # partitioned by bucket
    # empirical bound: max rows per (key, bucket) << mega-key total
    mega = left.filter("user_id = 7").count()
    per_group = (
        left.withColumn("b", F.expr(f"t div {width}"))
        .groupBy("user_id", "b").count().agg(F.max("count")).first()[0]
    )
    assert per_group < mega / 3
