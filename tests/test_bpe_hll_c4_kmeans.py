"""BPE train/encode goldens, HLL estimator bounds, C4 verdicts,
relational k-means invariants."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F


# --- pure-Python reference BPE (independent of the Spark impl) ----------


def _ref_train(word_cnt: dict, n_merges: int):
    syms = {w: list(w) for w in word_cnt}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, s in syms.items():
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += word_cnt[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        merges.append((a, b, n))
        for w, s in syms.items():
            out = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms[w] = out
    return merges, syms


def _ref_encode(text: str, merges):
    toks = []
    for w in text.split():
        s = list(w)
        for a, b, _ in merges:
            out = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            s = out
        toks.extend(s)
    return toks


def test_train_bpe_matches_reference(spark):
    from pyppeteer_scraper_spark.functions.bpe import train_bpe

    wc = {
        "lower": 5,
        "lowest": 3,
        "newer": 6,
        "wider": 2,
        "new": 8,
        "ggg": 4,  # overlap run: greedy-left must give 'gg','g'
    }
    words = spark.createDataFrame(list(wc.items()), "word string, cnt long")
    got, syms_df = train_bpe(words, n_merges=8)
    want, want_syms = _ref_train(wc, 8)
    assert got == want
    got_syms = {r["word"]: r["syms"] for r in syms_df.collect()}
    assert got_syms == want_syms


def test_encode_bpe_matches_reference(spark):
    from pyppeteer_scraper_spark.functions.bpe import encode_bpe, train_bpe

    wc = {"banana": 4, "bandana": 2, "ananas": 3}
    words = spark.createDataFrame(list(wc.items()), "word string, cnt long")
    merges, _ = train_bpe(words, n_merges=6)
    docs = spark.createDataFrame(
        [(1, "banana bandana"), (2, "ananas banana banana"), (3, None)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in encode_bpe(docs, merges).collect()
    }
    assert got[1] == _ref_encode("banana bandana", merges)
    assert got[2] == _ref_encode("ananas banana banana", merges)
    assert got[3] == []


def test_train_bpe_tiebreak_is_lexicographic(spark):
    from pyppeteer_scraper_spark.functions.bpe import train_bpe

    # 'ab' and 'ba' pairs both occur exactly twice -> ('a','b') wins
    words = spark.createDataFrame(
        [("ab", 2), ("ba", 2)], "word string, cnt long"
    )
    merges, _ = train_bpe(words, n_merges=1)
    assert merges[0][:2] == ("a", "b")


# --- HLL ------------------------------------------------------------------


def test_hll_estimate_within_error(spark):
    from pyppeteer_scraper_spark.operators.hll import (
        hll_estimate,
        hll_registers,
    )

    n = 20000
    df = spark.range(n).select(
        F.concat(F.lit("item-"), F.col("id")).alias("e")
    )
    regs = hll_registers(df, "e", p=8)
    est = hll_estimate(regs, p=8)
    # standard error ~ 1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert abs(est - n) / n < 0.20


def test_hll_merge_equals_union(spark):
    from pyppeteer_scraper_spark.operators.hll import (
        hll_registers,
        merge_registers,
    )

    a = spark.range(0, 5000).select(F.concat(F.lit("x"), "id").alias("e"))
    b = spark.range(3000, 9000).select(F.concat(F.lit("x"), "id").alias("e"))
    merged = {
        (r["bucket"], r["rho"])
        for r in merge_registers(
            hll_registers(a, "e"), hll_registers(b, "e")
        ).collect()
    }
    union = {
        (r["bucket"], r["rho"])
        for r in hll_registers(a.unionByName(b), "e").collect()
    }
    assert merged == union


def test_hll_small_range_correction(spark):
    from pyppeteer_scraper_spark.operators.hll import (
        hll_estimate,
        hll_registers,
    )

    df = spark.range(50).select(F.concat(F.lit("s"), "id").alias("e"))
    est = hll_estimate(hll_registers(df, "e", p=8), p=8)
    assert abs(est - 50) / 50 < 0.25


# --- C4 line filters -------------------------------------------------------


def test_c4_verdicts_and_survivors(spark):
    from pyppeteer_scraper_spark.functions.text import c4_line_filters

    docs = spark.createDataFrame(
        [
            (1, "a good long enough line here.\nanother solid line of text."
                "\nthird fine line for the doc."),
            (2, "only one keeper line right here.\nok.\nnope"),
            (3, "anything with lorem ipsum inside it.\nfine line one two"
                " three.\nfine line four five six.\nfine line seven eight"
                " nine."),
            (4, "please enable javascript to continue now.\nvar x = { a }."
                "\nclean line one two three four.\nclean line five six seven"
                " eight.\nclean line nine ten eleven twelve."),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in c4_line_filters(docs).collect()}
    assert out[1]["verdict"] == "kept" and out[1]["n_kept"] == 3
    assert out[1]["kept_md5"] is not None
    assert out[2]["verdict"] == "too_few_lines" and out[2]["kept_md5"] is None
    assert out[3]["verdict"] == "lorem_ipsum"
    # doc 4: javascript + brace lines dropped, 3 clean survive
    assert out[4]["verdict"] == "kept" and out[4]["n_kept"] == 3


# --- relational k-means -----------------------------------------------------


def test_kmeans_relational_separates_planted_clusters(spark):
    from pyppeteer_scraper_spark.operators.similarity import kmeans_relational

    # two tight planted blobs far apart; k=2 must split them exactly
    rows = []
    for i in range(40):
        base = [10.0, 10.0] if i % 2 == 0 else [-10.0, -10.0]
        rows.append((i, [base[0] + (i % 5) * 0.01, base[1] - (i % 3) * 0.01]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_relational(df, k=2, iters=3).collect()
    sizes = sorted(r["n_members"] for r in out)
    assert sizes == [20, 20]
    norms = [r["centroid_norm"] for r in out]
    for nm in norms:
        assert nm == pytest.approx(math.sqrt(200), abs=0.5)
