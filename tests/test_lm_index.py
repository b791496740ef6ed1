"""Char-trigram LM scoring (functions/lm.py) — hand-computed smoothing
math, short-doc guard, and the ranking property the CCNet-style filter
relies on (repetitive in-distribution text scores more probable than
out-of-distribution text)."""

import math

from pyspark.sql import functions as F


def test_trigram_lm_hand_computed(spark):
    from pyppeteer_scraper_spark.functions.lm import trigram_lm_scores

    # corpus: "aaaa" (trigrams aaa x2), "aaab" (aaa, aab)
    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "aaab")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in trigram_lm_scores(docs).collect()}
    # counts: C(aaa)=3, C(aab)=1; contexts: C(aa·)=4; V={a,b} -> 2
    lp_aaa = math.log((3 + 1.0) / (4 + 2.0))
    lp_aab = math.log((1 + 1.0) / (4 + 2.0))
    assert out[1]["n_trigrams"] == 2
    assert out[1]["avg_logp"] == round(lp_aaa, 6)
    assert out[2]["avg_logp"] == round((lp_aaa + lp_aab) / 2, 6)
    assert out[2]["ppl"] == round(math.exp(-(lp_aaa + lp_aab) / 2), 3)
    # the common pattern is more probable
    assert out[1]["avg_logp"] > out[2]["avg_logp"]


def test_trigram_lm_short_doc_guard(spark):
    from pyppeteer_scraper_spark.functions.lm import trigram_lm_scores

    docs = spark.createDataFrame(
        [(1, "ab"), (2, "abcd")], "doc_id long, text string"
    )
    rows = trigram_lm_scores(docs).collect()
    # the 2-char doc contributes no trigrams and yields no score row
    assert {r["doc_id"] for r in rows} == {2}
    assert rows[0]["n_trigrams"] == 2


def test_trigram_lm_ranks_ood_text_worse(spark):
    from pyppeteer_scraper_spark.functions.lm import trigram_lm_scores

    common = [(i, "the cat sat on the mat " * 3) for i in range(10)]
    weird = [(99, "zqxjkv wvxzqj qzkxvj")]
    docs = spark.createDataFrame(
        common + weird, "doc_id long, text string"
    )
    out = {r["doc_id"]: r["ppl"] for r in trigram_lm_scores(docs).collect()}
    assert out[99] > out[0]  # OOD text is higher perplexity
