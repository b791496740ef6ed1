"""Round-4 session-2 operators: token-budget selection, CCNet ppl
buckets, BPE pair candidates, Zipf/Heaps corpus stats."""

import math

import pytest
from pyspark.sql import functions as F

from pyppeteer_scraper_spark.functions.lm import ppl_buckets
from pyppeteer_scraper_spark.functions.text import (
    word_char_pairs,
    zipf_heaps_stats,
)
from pyppeteer_scraper_spark.operators.selection import (
    select_by_token_budget,
)


def test_select_budget_is_top_score_prefix(spark):
    rows = [
        # (doc_id, source, text) — varying quality/length
        (1, "a", "the quick brown fox jumps over the lazy dog"),
        (2, "a", "zz qq xx vv kk jj ww yy"),
        (3, "a", "a plain ordinary sentence about ordinary things"),
        (4, "b", "short"),
        (5, "b", "another document with several whitespace tokens here"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    budget = 12
    out = select_by_token_budget(docs, budget).collect()

    # budget respected per source
    per_source = {}
    for r in out:
        per_source.setdefault(r["source"], []).append(r)
    for src, rs in per_source.items():
        assert sum(r["n_tokens"] for r in rs) <= budget

    # admitted set IS the greedy score-desc prefix (replayed in Python)
    scored = docs.select(
        "source",
        "doc_id",
        F.size(F.split("text", " ", -1)).alias("n"),
    ).collect()
    from pyppeteer_scraper_spark.functions.classifier import (
        quality_model_score,
    )

    sc = {
        r["doc_id"]: r["score"]
        for r in docs.select(
            "doc_id", quality_model_score(F.col("text"))["score"].alias("score")
        ).collect()
    }
    expect = set()
    for src in {"a", "b"}:
        cand = sorted(
            (r for r in scored if r["source"] == src),
            key=lambda r: (-sc[r["doc_id"]], r["doc_id"]),
        )
        cum = 0
        for r in cand:
            cum += r["n"]
            if cum > budget:
                break
            expect.add(r["doc_id"])
    assert {r["doc_id"] for r in out} == expect


def test_select_budget_monotone_prefix_property(spark, sf_small):
    """Admitted rows form a contiguous prefix of the (score desc,
    doc_id) order within every source — no gaps."""
    from pyppeteer_scraper_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents")
    out = select_by_token_budget(docs, 400)
    w_rank = out.groupBy("source").agg(
        F.count("*").alias("n_sel"), F.max("cum_tokens").alias("max_cum")
    )
    for r in w_rank.collect():
        assert r["max_cum"] <= 400
        assert r["n_sel"] >= 1  # budget 400 admits at least the best doc


def test_ppl_buckets_balanced_and_ordered(spark, sf_small):
    from pyppeteer_scraper_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents").select(
        "doc_id", "text", "lang"
    )
    out = ppl_buckets(docs, n_buckets=3).cache()
    try:
        # ntile balance: per lang, bucket sizes differ by <= 1
        sizes = (
            out.groupBy("lang", "bucket").count().collect()
        )
        per_lang = {}
        for r in sizes:
            per_lang.setdefault(r["lang"], []).append(r["count"])
        for lang, cs in per_lang.items():
            assert max(cs) - min(cs) <= 1, (lang, cs)
        # ordering: within a lang, every head-bucket ppl <= every
        # tail-bucket ppl
        agg = (
            out.groupBy("lang")
            .agg(
                F.max(F.when(F.col("bucket") == 1, F.col("ppl"))).alias(
                    "head_max"
                ),
                F.min(F.when(F.col("bucket") == 3, F.col("ppl"))).alias(
                    "tail_min"
                ),
            )
            .collect()
        )
        for r in agg:
            assert r["head_max"] <= r["tail_min"], r
    finally:
        out.unpersist()


def test_word_char_pairs_hand_computed(spark):
    df = spark.createDataFrame([("Hello, ab c!",)], ["text"])
    got = df.select(word_char_pairs(F.col("text")).alias("p")).collect()[0][
        "p"
    ]
    # hello -> he el ll lo ; ab -> ab ; c -> (none)
    assert got == ["he", "el", "ll", "lo", "ab"]


def test_zipf_heaps_hand_computed(spark):
    # corpus: token frequencies a:4 b:2 c:1 -> ranks 1,2,3
    df = spark.createDataFrame(
        [("a a b c",), ("a a b",)], ["text"]
    )
    row = zipf_heaps_stats(df).collect()[0]
    assert row["n_tokens"] == 7
    assert row["vocab"] == 3
    assert row["n_top"] == 3
    xs = [math.log(r) for r in (1, 2, 3)]
    ys = [math.log(c) for c in (4, 2, 1)]
    mx, my = sum(xs) / 3, sum(ys) / 3
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / 3
    var = sum((x - mx) ** 2 for x in xs) / 3
    assert row["zipf_slope"] == pytest.approx(round(cov / var, 4), abs=1e-9)
