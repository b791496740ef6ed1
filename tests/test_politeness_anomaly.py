"""AIMD crawl-delay adaptation, param entropy, fetch-rate anomalies."""

import math

import pytest
from pyspark.sql import functions as F


def test_adaptive_crawl_delay_backoff_and_floor(spark):
    from pyppeteer_scraper_spark.operators.budget import adaptive_crawl_delay

    rows = []
    # host 'bad': 100% errors in rounds 0-2, clean 3-5
    for r in range(6):
        for i in range(4):
            rows.append(("bad", r, r < 3))
    # host 'good': always clean -> additive decrease to the floor
    for r in range(6):
        rows.append(("good", r, False))
    df = spark.createDataFrame(rows, "host string, round int, is_error boolean")
    out = {r["host"]: r for r in adaptive_crawl_delay(df, n_rounds=6).collect()}
    # bad: 500 ->1000 ->2000 ->4000, then -100 x3 -> 3700
    assert out["bad"]["delay_ms"] == 3700
    assert out["bad"]["n_backoff"] == 3 and out["bad"]["n_speedup"] == 3
    # good: 500 - 600 floored at 100
    assert out["good"]["delay_ms"] == 100
    assert out["good"]["n_speedup"] == 6


def test_adaptive_crawl_delay_missing_round_is_clean(spark):
    from pyppeteer_scraper_spark.operators.budget import adaptive_crawl_delay

    # only round 0 observed (errors): rounds 1-5 default to err=0
    df = spark.createDataFrame(
        [("h", 0, True), ("h", 0, True)], "host string, round int, is_error boolean"
    )
    out = adaptive_crawl_delay(df, n_rounds=6).collect()[0]
    # 500 -> 1000, then -100 x5 -> 500
    assert out["delay_ms"] == 500
    assert out["n_backoff"] == 1 and out["n_speedup"] == 5


def test_adaptive_crawl_delay_cap(spark):
    from pyppeteer_scraper_spark.operators.budget import adaptive_crawl_delay

    df = spark.createDataFrame(
        [("h", r, True) for r in range(6)],
        "host string, round int, is_error boolean",
    )
    out = adaptive_crawl_delay(df, n_rounds=6).collect()[0]
    assert out["delay_ms"] == 5000  # capped, not 32000


def test_param_entropy_flags_session_ids(spark):
    from pyppeteer_scraper_spark.operators.traps import param_entropy

    rows = []
    for i in range(200):
        rows.append((f"http://a.example/p?sid=u{i}",))  # unique values
        rows.append((f"http://a.example/p?page={i % 3}",))  # 3 values
    urls = spark.createDataFrame(rows, "url string")
    out = {r["param"]: r for r in param_entropy(urls, threshold=4.0).collect()}
    assert out["sid"]["trap"] is True
    assert out["sid"]["entropy"] == pytest.approx(math.log(200), abs=1e-4)
    assert out["page"]["trap"] is False
    assert out["page"]["entropy"] == pytest.approx(math.log(3), abs=0.01)


def test_fetch_rate_anomaly_flags_spike(spark):
    from pyppeteer_scraper_spark.operators.hostquality import (
        fetch_rate_anomalies,
    )

    rows = []
    # steady 5 fetches/hour for 10 hours, then a 200-fetch spike hour
    for h in range(10):
        for i in range(5):
            rows.append(("steady.example", f"2024-01-01 {h:02d}:00:{i:02d}"))
    for i in range(200):
        rows.append(("steady.example", f"2024-01-01 11:00:{i % 60:02d}"))
    # single-hour host: sigma undefined -> z NULL, anomaly False
    rows.append(("once.example", "2024-01-01 00:00:00"))
    df = spark.createDataFrame(rows, "host string, ts string").select(
        "host", F.to_timestamp("ts").alias("ts")
    )
    out = fetch_rate_anomalies(df).collect()
    spike = [r for r in out if r["n_fetches"] == 200]
    assert len(spike) == 1 and spike[0]["anomaly"] is True
    steady = [
        r for r in out if r["host"] == "steady.example" and r["n_fetches"] == 5
    ]
    assert all(not r["anomaly"] for r in steady)
    once = [r for r in out if r["host"] == "once.example"]
    assert once[0]["z"] is None and once[0]["anomaly"] is False
