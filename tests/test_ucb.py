"""UCB1 host allocation (operators/selection.py::ucb1_host_allocation)."""

import math

from pyspark.sql import functions as F

from pyppeteer_scraper_spark.operators.selection import (
    ucb1_host_allocation,
)


def test_ucb1_hand_computed_trace(spark):
    """3 arms, hand-traced: init pulls a=0.9 b=0.5 c=0.1; round 1
    (T=3, equal bonus) picks a (best mean) and draws 0.8; round 2
    (T=4) picks b — a's bonus shrank with n=2 while b kept the full
    single-pull bonus (the EXPLORATION property: 2.165 > 2.027);
    round 3 (T=5) picks a again; a's third pull has no observed
    reward left => 0."""
    rows = [
        ("a", 1, 0.9), ("a", 2, 0.8),
        ("b", 1, 0.5), ("b", 2, 0.4),
        ("c", 1, 0.1),
    ]
    df = spark.createDataFrame(rows, ["host", "seq", "reward"]).select(
        "host",
        F.to_timestamp(
            F.concat(F.lit("2026-01-01 00:00:0"), F.col("seq"))
        ).alias("ts"),
        "reward",
    )
    got = {
        r["host"]: r
        for r in ucb1_host_allocation(df, n_rounds=3).collect()
    }
    assert got["a"]["n_pulls"] == 3
    assert got["b"]["n_pulls"] == 2
    assert got["c"]["n_pulls"] == 1
    assert got["a"]["mean_reward"] == round(1.7 / 3, 6)
    assert got["b"]["mean_reward"] == round(0.9 / 2, 6)
    assert got["c"]["mean_reward"] == 0.1
    # final UCB at T = 3 + 3
    for h, (n, s) in {"a": (3, 1.7), "b": (2, 0.9), "c": (1, 0.1)}.items():
        want = round(s / n + math.sqrt(2 * math.log(6) / n), 6)
        assert abs(got[h]["ucb"] - want) < 1e-9, (h, got[h]["ucb"], want)


def test_ucb1_exploration_reaches_cold_arm(spark):
    """With enough rounds every arm gets pulled again eventually —
    even the worst arm's bonus outgrows a heavily-pulled winner's
    (logarithmic-regret mechanics)."""
    rows = [("good", i, 0.9) for i in range(1, 30)] + [
        ("bad", 1, 0.0),
        ("bad", 2, 0.0),
    ]
    df = spark.createDataFrame(rows, ["host", "seq", "reward"]).select(
        "host",
        F.to_timestamp(
            F.format_string("2026-01-01 00:%02d:00", F.col("seq"))
        ).alias("ts"),
        "reward",
    )
    got = {
        r["host"]: r
        for r in ucb1_host_allocation(df, n_rounds=12).collect()
    }
    assert got["bad"]["n_pulls"] >= 2, got
    assert got["good"]["n_pulls"] > got["bad"]["n_pulls"]


def test_ucb1_empty_rewards_returns_empty(spark):
    """ADVICE r04: an empty reward log must yield an empty allocation
    (schema intact), not a math.log(0) crash."""
    from pyppeteer_scraper_spark.operators.selection import (
        ucb1_host_allocation,
    )

    empty = spark.createDataFrame(
        [], "host string, ts timestamp, reward double"
    )
    out = ucb1_host_allocation(empty, n_rounds=3)
    assert out.columns == ["host", "n_pulls", "mean_reward", "ucb"]
    assert out.count() == 0
