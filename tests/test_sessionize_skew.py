"""Skew-bucketed sessionization (operators/sessionize.py): the
two-phase bucketed form must be bit-identical to the single-window
form — including sessions spanning bucket boundaries, runs of empty
buckets, and equal-timestamp tie-breaks — and must bound the per-window
group size under a planted mega-key."""

from pyspark.sql import functions as F

from pyppeteer_scraper_spark.operators.sessionize import (
    session_stats,
    sessionize,
)


def _events(spark):
    # mega-user 7 with ~2000 events over ~40 days; sparse other users;
    # gaps engineered around the 30-min boundary (29m59s / 30m00s /
    # 30m01s) and equal-ts ties broken by event_id
    rows = []
    t0 = 1_700_000_000  # epoch seconds
    t = t0
    for i in range(2000):
        step = [5, 1799, 1800, 1801, 90_000][i % 5]  # incl. exact-gap ties
        t += step
        rows.append((i, 7, t))
    rows += [(10_000, 1, t0), (10_001, 1, t0), (10_002, 1, t0 + 1801),
             (10_003, 2, t0 + 5_000_000)]
    df = spark.createDataFrame(rows, "event_id long, user_id int, sec long")
    return df.select(
        "event_id", "user_id",
        F.timestamp_seconds(F.col("sec")).alias("ts"),
    ).repartition(8)


def test_bucketed_sessionize_matches_single_window(spark):
    ev = _events(spark)
    base = sessionize(ev).orderBy("user_id", "session_no", "event_id")
    for width in (3600, 1801, 86_400, 10**9):  # incl. width >> range
        got = sessionize(ev, skew_bucket_seconds=width)
        assert got.exceptAll(base).count() == 0, width
        assert base.exceptAll(got).count() == 0, width
        assert got.count() == ev.count()


def test_bucketed_sessionize_stats_and_boundaries(spark):
    ev = _events(spark)
    # stats derived from the bucketed form match the single-window form
    a = session_stats(sessionize(ev), "user_id", "ts")
    b = session_stats(
        sessionize(ev, skew_bucket_seconds=3600), "user_id", "ts"
    )
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    # golden: user 1 — two equal-ts events share session 1; the +1801s
    # event opens session 2 (gap > 30min)
    u1 = {r["session_no"]: r["n_events"]
          for r in b.filter("user_id = 1").collect()}
    assert u1 == {1: 2, 2: 1}


def test_bucketed_sessionize_window_groups_bounded(spark):
    """With the mega-user planted, the data-path window must partition
    by (key, bucket): the largest (user, bucket) group stays a small
    fraction of the mega-user's total rows."""
    ev = _events(spark)
    width = 86_400
    out = sessionize(ev, skew_bucket_seconds=width)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    data_specs = [s for s in specs if "__tus" in s and "__nb" not in s]
    assert data_specs, plan
    for s in data_specs:
        # partition spec (before the __tus ordering key) includes __bkt
        assert "__bkt" in s.split("__tus")[0], s
    mega = ev.filter("user_id = 7").count()
    per_group = (
        ev.withColumn("b", F.expr(
            f"unix_micros(cast(ts as timestamp)) div {width * 1_000_000}"))
        .groupBy("user_id", "b").count().agg(F.max("count")).first()[0]
    )
    assert per_group < mega / 5
