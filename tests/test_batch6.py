"""Round-4 session-5 batch 6: conditional-GET accounting, link
reciprocity, corpus churn, filter ablation — hand-computed goldens."""

import pytest
from pyspark.sql import functions as F

from pyppeteer_scraper_spark.functions.text import filter_ablation
from pyppeteer_scraper_spark.operators.linkrank import reciprocity
from pyppeteer_scraper_spark.operators.revisit import (
    conditional_get_stats,
    snapshot_churn,
)


def test_conditional_get_golden(spark):
    # page p1 on hA: v1, v1 (304), v2, v2 (304); page p2 on hB: v1 only
    rows = [
        ("p1", "hA", 1, "v1", 100),
        ("p1", "hA", 2, "v1", 100),
        ("p1", "hA", 3, "v2", 300),
        ("p1", "hA", 4, "v2", 300),
        ("p2", "hB", 1, "v1", 50),
    ]
    df = spark.createDataFrame(
        rows, ["page", "host", "ts", "fingerprint", "n_bytes"]
    )
    out = {r["host"]: r for r in conditional_get_stats(df).collect()}
    a = out["hA"]
    assert a["n_fetches"] == 4 and a["n_not_modified"] == 2
    assert a["bytes_full"] == 800
    # saved: the 2nd v1 (100) and 2nd v2 (300)
    assert a["bytes_transferred"] == 400
    assert a["savings_pct"] == pytest.approx(0.5, abs=1e-6)
    b = out["hB"]
    # a page's FIRST fetch is never a 304
    assert b["n_not_modified"] == 0 and b["bytes_transferred"] == 50


def test_conditional_get_tiebreak_deterministic(spark):
    # two fetches at the SAME ts: the tiebreak column must order them
    rows = [("p", "h", 1, 1, "v1", 10), ("p", "h", 1, 2, "v1", 10)]
    df = spark.createDataFrame(
        rows, ["page", "host", "ts", "eid", "fingerprint", "n_bytes"]
    )
    out = conditional_get_stats(df, tiebreak_col="eid").collect()[0]
    assert out["n_not_modified"] == 1


def test_reciprocity_golden(spark):
    # a<->b reciprocal; a->c one-way; c->b one-way
    e = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c"), ("c", "b")], ["src", "dst"]
    )
    out = {r["node"]: r for r in reciprocity(e).collect()}
    assert out["a"]["n_out"] == 2 and out["a"]["n_reciprocal"] == 1
    assert out["a"]["reciprocity"] == pytest.approx(0.5, abs=1e-6)
    assert out["b"]["reciprocity"] == pytest.approx(1.0, abs=1e-6)
    assert out["c"]["n_reciprocal"] == 0


def test_reciprocity_ignores_duplicate_edges(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "a")], ["src", "dst"]
    )
    out = {r["node"]: r for r in reciprocity(e).collect()}
    assert out["a"]["n_out"] == 1 and out["a"]["n_reciprocal"] == 1


def test_snapshot_churn_golden(spark):
    prev = spark.createDataFrame(
        [(1, "s", "f1"), (2, "s", "f2"), (3, "s", "f3")],
        ["doc_id", "source", "fingerprint"],
    )
    curr = spark.createDataFrame(
        # 1 unchanged, 2 changed, 3 removed, 4 added
        [(1, "s", "f1"), (2, "s", "f2x"), (4, "s", "f4")],
        ["doc_id", "source", "fingerprint"],
    )
    out = snapshot_churn(prev, curr).collect()[0]
    assert out["n_added"] == 1 and out["n_removed"] == 1
    assert out["n_changed"] == 1 and out["n_unchanged"] == 1
    assert out["n_curr"] == 3
    assert out["churn_rate"] == pytest.approx(3 / 3, abs=1e-6)


def test_filter_ablation_golden(spark):
    docs = spark.createDataFrame(
        [
            ("pass pass", 0),   # passes both
            ("kill_a only", 1),  # fails A only
            ("kill_both", 3),    # fails A and B
        ],
        ["text", "flags"],
    )
    out = {
        r["rule"]: r
        for r in filter_ablation(
            docs,
            {
                "rule_a": F.col("flags").bitwiseAND(1) > 0,
                "rule_b": F.col("flags").bitwiseAND(2) > 0,
            },
        ).collect()
    }
    a, b = out["rule_a"], out["rule_b"]
    assert a["n_docs"] == 3 and a["n_failed"] == 2
    assert a["n_unique_failed"] == 1  # only the fails-A-only doc
    assert a["n_pass_all"] == 1
    # without rule A: the fails-A-only doc would pass -> 2
    assert a["n_pass_without"] == 2
    assert b["n_failed"] == 1 and b["n_unique_failed"] == 0
    assert b["n_pass_without"] == 1
