"""As-of join operator tests (operators/asof.py) — golden semantics the
union+window formulation must honor: latest at-or-before match,
inclusive tie goes to the right row at equal time, left/inner modes."""

from pyspark.sql import functions as F

from pyppeteer_scraper_spark.operators.asof import as_of_join


def _ts(s):
    return f"2024-01-01 00:00:0{s}"


def test_as_of_join_golden(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts(5)),   # after r2 → matches r2
            (2, 10, _ts(2)),   # equal-time tie → matches r1 (inclusive)
            (3, 10, _ts(1)),   # before any right row → unmatched
            (4, 20, _ts(9)),   # other key
        ],
        "event_id int, user_id int, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [
            (101, 10, _ts(2)),  # r1
            (102, 10, _ts(4)),  # r2
            (201, 20, _ts(3)),  # r3
        ],
        "view_id int, user_id int, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))

    inner = as_of_join(
        left, right, on=["user_id"], left_time="ts", right_time="ts",
        payload_cols=["view_id", "ts"],
    )
    got = {r["event_id"]: r["asof"]["view_id"] for r in inner.collect()}
    assert got == {1: 102, 2: 101, 4: 201}

    outer = as_of_join(
        left, right, on=["user_id"], left_time="ts", right_time="ts",
        payload_cols=["view_id", "ts"], how="left",
    )
    got_outer = {
        r["event_id"]: (r["asof"]["view_id"] if r["asof"] else None)
        for r in outer.collect()
    }
    assert got_outer == {1: 102, 2: 101, 3: None, 4: 201}
    # left columns survive untouched
    assert {"event_id", "user_id", "ts", "asof"} == set(outer.columns)


def test_as_of_join_single_shuffle_no_range_explosion(spark):
    """Plan shape: one exchange by the join key feeding a window sort —
    never a cartesian/range-candidate join."""
    import contextlib
    import io

    left = spark.range(100).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 7).alias("user_id"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
    )
    right = spark.range(50).select(
        F.col("id").alias("view_id"),
        (F.col("id") % 7).alias("user_id"),
        F.timestamp_seconds(F.col("id") * 100).alias("ts"),
    )
    out = as_of_join(
        left, right, on=["user_id"], left_time="ts", right_time="ts",
        payload_cols=["view_id"],
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan
    # correctness spot check vs a brute-force computation
    import bisect

    rts = {}
    for r in right.collect():
        rts.setdefault(r["user_id"], []).append((r["ts"], r["view_id"]))
    for k in rts:
        rts[k].sort()
    expect = {}
    for r in left.collect():
        lst = rts.get(r["user_id"], [])
        i = bisect.bisect_right([t for t, _ in lst], r["ts"])
        if i:
            expect[r["event_id"]] = lst[i - 1][1]
    got = {r["event_id"]: r["asof"]["view_id"] for r in out.collect()}
    assert got == expect


def test_sessionize_gaps_agrees_with_builtin_session_window(spark, sf_med):
    """Cross-check two independent sessionization implementations: the
    registry's lag+cumsum formulation vs Spark's built-in
    F.session_window (same 30-min gap rule).  Session boundaries differ
    in representation only — compare (user, n_events, start) multisets.
    session_window's window.end pads +gap, so compare starts and sizes."""
    from pyppeteer_scraper_spark.plans.queries import QUERIES

    mine = QUERIES["a_sessionize_gaps"](spark, sf_med)
    ev = spark.read.parquet(f"{sf_med}/events.parquet")
    builtin = (
        ev.groupBy(
            F.col("user_id"),
            F.session_window(F.col("ts").cast("timestamp"), "30 minutes"),
        )
        .agg(F.count("*").alias("n_events"), F.min("ts").alias("session_start"))
        .select("user_id", "n_events", "session_start")
    )
    a = {
        (r["user_id"], r["n_events"], r["session_start"])
        for r in mine.select("user_id", "n_events", "session_start").collect()
    }
    b = {
        (r["user_id"], r["n_events"], r["session_start"]) for r in builtin.collect()
    }
    assert len(a) == len(b)
    assert a == b


def test_sketch_aggregates_error_bounds(spark, sf_med):
    """Sketch outputs must land inside their advertised error envelopes
    vs the exact aggregates: HLL++ rsd=0.02 → allow 3σ=6%; t-digest-ish
    percentile_approx(accuracy=10000) is rank-exact to 1/10000 of the
    group, well under one value step here — allow the gap between two
    adjacent order statistics."""
    from pyspark.sql import functions as F

    from pyppeteer_scraper_spark.plans.queries import QUERIES

    got = {
        r["event_type"]: r
        for r in QUERIES["a_sketch_aggregates"](spark, sf_med).collect()
    }
    ev = spark.read.parquet(f"{sf_med}/events.parquet")
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.99)").alias("p99"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for et, e in exact.items():
        g = got[et]
        assert abs(g["approx_users"] - e["users"]) <= max(3, 0.06 * e["users"]), et
        assert abs(g["p50_approx"] - e["p50"]) <= 0.05 * abs(e["p50"]) + 1.0, et
        assert abs(g["p99_approx"] - e["p99"]) <= 0.05 * abs(e["p99"]) + 2.0, et
