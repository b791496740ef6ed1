"""Round-4 batch: WARC revisit records + A-ES weighted sampling."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_revisit_records_semantics(spark):
    from pyppeteer_scraper_spark.sources.warc import revisit_records

    rows = [
        (1, _ts("2026-01-01T00:00:00"), "u1", "dA"),  # first capture
        (2, _ts("2026-01-02T00:00:00"), "u1", "dA"),  # unchanged → revisit
        (3, _ts("2026-01-03T00:00:00"), "u1", "dB"),  # changed → response
        (4, _ts("2026-01-04T00:00:00"), "u1", "dA"),  # reverted → revisit of #1
        (5, _ts("2026-01-01T00:00:00"), "u2", "dA"),  # same digest, other url
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, url string, digest string"
    )
    got = {
        r["event_id"]: (r["record_type"], r["refers_to_ts"])
        for r in revisit_records(df, tiebreak_col="event_id").collect()
    }
    assert got[1] == ("response", None)
    assert got[2] == ("revisit", _ts("2026-01-01T00:00:00"))
    assert got[3] == ("response", None)
    assert got[4] == ("revisit", _ts("2026-01-01T00:00:00"))
    assert got[5] == ("response", None)  # digest dedup is per-URL


def test_revisit_storage_savings_accounting(spark):
    from pyppeteer_scraper_spark.sources.warc import revisit_records

    # 10 urls × 5 identical captures → 10 responses, 40 revisits
    rows = [
        (u * 10 + i, _ts(f"2026-01-0{i + 1}T00:00:00"), f"u{u}", "same")
        for u in range(10)
        for i in range(5)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, url string, digest string"
    )
    counts = dict(
        revisit_records(df, tiebreak_col="event_id")
        .groupBy("record_type")
        .count()
        .collect()
    )
    assert counts == {"response": 10, "revisit": 40}


def test_ares_inclusion_tracks_weight(spark):
    from pyppeteer_scraper_spark.operators.splits import weighted_sample_ares

    # 50 heavy docs (w=1000) + 450 light (w=10): heavy docs should
    # dominate a k=50 draw (each heavy key is ~100× smaller in
    # expectation); exact counts are deterministic given the salt.
    df = spark.createDataFrame(
        [(i, 1000 if i < 50 else 10) for i in range(500)],
        "doc_id long, n_chars long",
    )
    picked = weighted_sample_ares(df, "n_chars", k=50).collect()
    heavy = sum(1 for r in picked if r["doc_id"] < 50)
    assert heavy >= 40  # weight-proportional, not uniform (uniform ⇒ ~5)
    # deterministic: same draw twice
    again = weighted_sample_ares(df, "n_chars", k=50).collect()
    assert [r["doc_id"] for r in picked] == [r["doc_id"] for r in again]


def test_ares_is_without_replacement_and_ranked(spark):
    from pyppeteer_scraper_spark.operators.splits import weighted_sample_ares

    df = spark.createDataFrame(
        [(i, 100) for i in range(200)], "doc_id long, n_chars long"
    )
    out = weighted_sample_ares(df, "n_chars", k=30).collect()
    ids = [r["doc_id"] for r in out]
    assert len(ids) == len(set(ids)) == 30
    keys = [r["ares_key"] for r in sorted(out, key=lambda r: r["rnk"])]
    assert keys == sorted(keys)
