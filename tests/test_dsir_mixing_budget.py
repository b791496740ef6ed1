"""Round-4 data-pipeline operators: DSIR importance weights,
temperature mixing weights, max-min-fair budget water-filling, and
13-gram overlap decontamination."""

import pytest
from pyspark.sql import functions as F

from pyppeteer_scraper_spark.functions.dsir import dsir_log_weights
from pyppeteer_scraper_spark.functions.mixing import temperature_mix_weights
from pyppeteer_scraper_spark.operators.budget import maxmin_fair_allocation
from pyppeteer_scraper_spark.operators.splits import (
    hash_split,
    split_ngram_contamination,
)


# --------------------------- DSIR ---------------------------------------


def test_dsir_ranks_target_like_docs_higher(spark):
    # target corpus speaks vocab A; among the scored docs, the A-like
    # one must out-weigh the B-like one (the selection property DSIR
    # exists for)
    a_text = "alpha beta gamma delta epsilon zeta"
    b_text = "one two three four five six"
    rows = [(i, a_text, True) for i in range(20)] + [
        (100, a_text, False),
        (101, b_text, False),
        (102, "", False),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    out = {
        r["doc_id"]: r
        for r in dsir_log_weights(docs, F.col("tgt")).collect()
    }
    assert out[100]["log_weight"] > out[101]["log_weight"]
    assert out[100]["avg_log_ratio"] > out[101]["avg_log_ratio"]
    # empty doc: no grams, neutral weight
    assert out[102]["n_grams"] == 0 and out[102]["log_weight"] == 0.0


def test_dsir_weight_is_sum_of_gram_ratios(spark):
    # one doc, one-gram corpus: hand-check the smoothed ratio math
    docs = spark.createDataFrame(
        [(1, "x", True), (2, "x", False)], "doc_id long, text string, t boolean"
    )
    import math

    out = {r["doc_id"]: r for r in dsir_log_weights(docs, F.col("t"), n_buckets=16).collect()}
    # both docs are the single gram "x": ct=1, cr=2, T=1, R=2, B=16
    expect = math.log((1 + 1) / (1 + 16)) - math.log((2 + 1) / (2 + 16))
    assert out[1]["log_weight"] == pytest.approx(expect, abs=2e-6)
    assert out[1]["log_weight"] == out[2]["log_weight"]


# --------------------------- mixing -------------------------------------


def test_mixing_alpha_one_is_natural_share(spark):
    docs = spark.createDataFrame(
        [(1, "a b c", "s1"), (2, "a b c d e f", "s2"), (3, "a b c", "s2")],
        "doc_id long, text string, source string",
    )
    out = {
        r["source"]: r
        for r in temperature_mix_weights(docs, ["source"], alpha=1.0).collect()
    }
    assert out["s1"]["weight"] == pytest.approx(out["s1"]["raw_share"])
    assert out["s1"]["n_tokens"] == 3 and out["s2"]["n_tokens"] == 9


def test_mixing_low_alpha_upsamples_small_sources(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(["w"] * 1000), "big"), (2, "w w", "small")],
        "doc_id long, text string, source string",
    )
    w = {
        r["source"]: r
        for r in temperature_mix_weights(
            docs, ["source"], alpha=0.2, token_budget=10_000
        ).collect()
    }
    assert w["small"]["weight"] > w["small"]["raw_share"]
    assert w["big"]["weight"] < w["big"]["raw_share"]
    total = w["small"]["weight"] + w["big"]["weight"]
    assert total == pytest.approx(1.0, abs=2e-6)
    # epochs = weight * budget / tokens: the small slice repeats
    assert w["small"]["epochs"] > 1.0


# --------------------------- budget -------------------------------------


def _waterfill_naive(demands: dict, budget: int) -> dict:
    """Reference implementation: literal progressive filling."""
    alloc = {h: 0 for h in demands}
    remaining = budget
    while remaining > 0:
        open_hosts = sorted(
            [(d, h) for h, d in demands.items() if alloc[h] < d]
        )
        if not open_hosts:
            break
        # raise the level by 1 across open hosts, in (demand, host) order
        for d, h in open_hosts:
            if remaining == 0:
                break
            alloc[h] += 1
            remaining -= 1
    return alloc


@pytest.mark.parametrize("budget_frac", [0.0, 0.3, 0.5, 0.9, 1.5])
def test_budget_matches_naive_waterfill(spark, budget_frac):
    demands = {f"h{i:02d}": (i * 7) % 23 + (3 if i % 5 == 0 else 0) for i in range(40)}
    total = sum(demands.values())
    budget = int(total * budget_frac)
    df = spark.createDataFrame(
        list(demands.items()), "host string, demand long"
    )
    got = {
        r["host"]: r["alloc"]
        for r in maxmin_fair_allocation(df, budget).collect()
    }
    assert got == _waterfill_naive(demands, budget)
    assert sum(got.values()) == min(budget, total)
    assert all(got[h] <= demands[h] for h in demands)


def test_budget_skewed_mega_host(spark):
    # one mega-host must not absorb the budget: max-min gives it the
    # same level as every other unsatisfied host
    rows = [("mega", 10_000_000)] + [(f"h{i}", 10) for i in range(99)]
    df = spark.createDataFrame(rows, "host string, demand long")
    out = {r["host"]: r["alloc"] for r in maxmin_fair_allocation(df, 1000).collect()}
    assert out["mega"] == 1000 - 99 * 10  # everyone else fully served
    assert all(out[f"h{i}"] == 10 for i in range(99))


# --------------------------- n-gram contamination ------------------------


def test_ngram_contamination_catches_partial_leak(spark):
    train_words = [f"t{i}" for i in range(40)]
    train_text = " ".join(train_words)
    # eval doc embeds a 13-token span of train inside fresh text
    leak = " ".join(["x1 x2 x3"] + train_words[10:23] + ["y1 y2"])
    clean_12 = " ".join(["z0"] + train_words[0:12] + ["z1"] * 5)  # 12-token overlap max? no:
    # careful: 12 consecutive train tokens can still form no 13-window
    short = "a b c"
    df = spark.createDataFrame(
        [
            (1, train_text, "train"),
            (2, leak, "test"),
            (3, clean_12, "test"),
            (4, short, "test"),
            (5, "totally different words only here", "test"),
        ],
        "doc_id long, text string, split string",
    )
    out = {
        r["eval_id"]: r
        for r in split_ngram_contamination(df, n=13).collect()
    }
    assert out[2]["contaminated"] and out[2]["n_hits"] == 1
    assert not out[3]["contaminated"]
    assert not out[4]["contaminated"] and out[4]["n_grams"] == 0
    assert not out[5]["contaminated"]
    assert len(out) == 4  # every eval doc gets a row, hit or not


def test_ngram_contamination_planted_corpus_recall(spark, sf_med):
    # exact planted copies (the decontamination fixture) must all be
    # flagged whenever both halves land across the split boundary and
    # the doc is long enough to have 13-grams
    from pyppeteer_scraper_spark.sources.tables import load_table

    docs = load_table(spark, sf_med, "documents").select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    corpus = hash_split(docs.unionByName(copies))
    out = split_ngram_contamination(corpus, n=13)
    flagged = {r["eval_id"] for r in out.filter("contaminated").collect()}
    # reference: exact-text leakage pairs (md5 semi-join) restricted to
    # docs with >= 13 tokens
    from pyppeteer_scraper_spark.operators.splits import (
        split_exact_contamination,
    )

    exact = {
        r["doc_id"]
        for r in split_exact_contamination(corpus)
        .join(
            corpus.filter(F.size(F.split("text", " ", -1)) >= 13).select(
                "doc_id"
            ),
            "doc_id",
        )
        .collect()
    }
    assert exact, "fixture lost its planted duplicates"
    assert exact <= flagged  # n-gram overlap subsumes exact duplication
