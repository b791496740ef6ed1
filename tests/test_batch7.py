"""Round-4 session-5 batch 7: vocab coverage curve, Gini host
concentration, order-independent shard checksums."""

import pytest
from pyspark.sql import functions as F

from pyppeteer_scraper_spark.functions.text import vocab_coverage_curve
from pyppeteer_scraper_spark.operators.export import shard_checksum_manifest
from pyppeteer_scraper_spark.operators.hostquality import gini_concentration


def test_vocab_coverage_golden(spark):
    # counts: a=6, b=3, c=1 -> total 10
    docs = spark.createDataFrame(
        [("a a a b",), ("a a a b b c",)], ["text"]
    )
    out = {r["k"]: r for r in vocab_coverage_curve(docs, ks=(1, 2, 3)).collect()}
    assert out[1]["covered_tokens"] == 6
    assert out[1]["coverage"] == pytest.approx(0.6, abs=1e-6)
    assert out[2]["covered_tokens"] == 9
    assert out[3]["coverage"] == pytest.approx(1.0, abs=1e-6)
    assert out[3]["n_types"] == 3 and out[3]["n_tokens_total"] == 10


def test_vocab_coverage_tiebreak_deterministic(spark):
    # b and c tie at 2: rank must be (count desc, token asc) -> b then c
    docs = spark.createDataFrame([("a a a b b c c",)], ["text"])
    rows = vocab_coverage_curve(docs, ks=(2,)).collect()
    assert rows[0]["covered_tokens"] == 5  # a(3) + b(2), not a + c


def test_gini_extremes(spark):
    even = spark.createDataFrame(
        [(f"h{i}",) for i in range(4) for _ in range(5)], ["host"]
    )
    g = gini_concentration(even).collect()[0]
    assert g["n_groups"] == 4 and g["total"] == 20
    assert g["gini"] == pytest.approx(0.0, abs=1e-6)
    # one host owns ~everything -> gini near (n-1)/n * (1 - 1/total-ish)
    skew = spark.createDataFrame(
        [("big",)] * 97 + [("a",), ("b",), ("c",)], ["host"]
    )
    s = gini_concentration(skew).collect()[0]
    assert s["gini"] > 0.7


def test_gini_weighted_matches_exploded(spark):
    # weight_col path must equal the exploded-row path
    w = spark.createDataFrame(
        [("h1", 5), ("h2", 1), ("h3", 14)], ["host", "n"]
    )
    flat = spark.createDataFrame(
        [("h1",)] * 5 + [("h2",)] * 1 + [("h3",)] * 14, ["host"]
    )
    a = gini_concentration(w, weight_col="n").collect()[0]
    b = gini_concentration(flat).collect()[0]
    assert a["gini"] == b["gini"] and a["total"] == b["total"]


def test_checksum_order_independent_and_content_sensitive(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(40)], ["doc_id", "text"]
    )
    base = {r["shard"]: r["checksum"] for r in shard_checksum_manifest(docs, 4).collect()}
    # repartition/reorder: identical manifest
    shuffled = {
        r["shard"]: r["checksum"]
        for r in shard_checksum_manifest(
            docs.repartition(7).sortWithinPartitions(F.desc("doc_id")), 4
        ).collect()
    }
    assert base == shuffled
    # a one-doc content flip changes exactly that doc's shard checksum
    mutated = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 3, F.lit("tampered")).otherwise(F.col("text")),
    )
    mut = {r["shard"]: r["checksum"] for r in shard_checksum_manifest(mutated, 4).collect()}
    diff = [s for s in base if base[s] != mut.get(s)]
    assert len(diff) == 1
