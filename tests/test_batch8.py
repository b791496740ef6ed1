"""Round-4 session-5 batch 8: bucketed range join, systematic PPS
sampling — goldens plus the no-nested-loop plan proof."""

import contextlib
import io
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from pyppeteer_scraper_spark.operators.rangejoin import range_join_bucketed
from pyppeteer_scraper_spark.operators.splits import systematic_pps_sample


def _points(spark):
    return spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 1, 0, 0)),   # inside w0
            (2, datetime(2024, 1, 1, 5, 59, 59)),  # inside w0 (end-1s)
            (3, datetime(2024, 1, 1, 6, 0, 0)),    # exactly end -> OUT
            (4, datetime(2024, 1, 2, 3, 0, 0)),    # inside w1
            (5, datetime(2024, 1, 9, 0, 0, 0)),    # no window
        ],
        ["pid", "ts"],
    )


def _wins(spark):
    return spark.createDataFrame(
        [
            (0, datetime(2024, 1, 1, 0, 0, 0), datetime(2024, 1, 1, 6, 0, 0)),
            (1, datetime(2024, 1, 2, 0, 0, 0), datetime(2024, 1, 2, 6, 0, 0)),
        ],
        ["win_id", "ws", "we"],
    )


def test_range_join_golden_half_open(spark):
    out = sorted(
        (r["pid"], r["win_id"])
        for r in range_join_bucketed(_points(spark), _wins(spark)).collect()
    )
    # half-open [ws, we): pid 3 at exactly `we` is excluded
    assert out == [(1, 0), (2, 0), (4, 1)]


def test_range_join_no_duplicate_matches_across_buckets(spark):
    # tiny bucket width -> every interval spans MANY buckets; a pair
    # must still match exactly once (the point's own bucket)
    out = range_join_bucketed(
        _points(spark), _wins(spark), bucket_micros=60_000_000
    ).collect()
    pairs = [(r["pid"], r["win_id"]) for r in out]
    assert sorted(pairs) == [(1, 0), (2, 0), (4, 1)]
    assert len(set(pairs)) == len(pairs)


def test_range_join_plan_has_no_nested_loop(spark):
    df = range_join_bucketed(_points(spark), _wins(spark))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_systematic_pps_golden(spark):
    # weights 10,10,10,10 / total 40, n_samples=4 -> step 10: positions
    # 0,10,20,30 — each doc drawn exactly once
    docs = spark.createDataFrame(
        [(i, "s", 10) for i in range(4)], ["doc_id", "source", "n_chars"]
    )
    r = systematic_pps_sample(docs, n_samples=4).collect()[0]
    assert r["n_sampled"] == 4 and r["n_hits"] == 4
    assert r["w_sampled"] == 40


def test_systematic_pps_big_doc_replicated(spark):
    # one doc owns 30 of 40 weight: at step 10 it must be hit 3 times
    docs = spark.createDataFrame(
        [(0, "a", 30), (1, "b", 4), (2, "b", 3), (3, "b", 3)],
        ["doc_id", "source", "n_chars"],
    )
    out = {r["source"]: r for r in systematic_pps_sample(docs, n_samples=4).collect()}
    assert out["a"]["n_hits"] == 3
    total_hits = sum(r["n_hits"] for r in out.values())
    assert total_hits == 4  # exactly n_samples overall


def test_systematic_pps_matches_single_partition_reference(spark):
    # bucketed two-pass prefix sum == naive single-window computation
    rows = [(i, f"s{i % 3}", (i * 37) % 50 + 1) for i in range(200)]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    bucketed = {
        r["source"]: (r["n_sampled"], r["n_hits"], r["w_sampled"])
        for r in systematic_pps_sample(
            docs, n_samples=20, bucket_size=16
        ).collect()
    }
    wide = {
        r["source"]: (r["n_sampled"], r["n_hits"], r["w_sampled"])
        for r in systematic_pps_sample(
            docs, n_samples=20, bucket_size=10**9
        ).collect()
    }
    assert bucketed == wide
