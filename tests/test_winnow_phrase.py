"""Round-4 session-10: winnowing fingerprints + positional phrase search."""

from pyspark.sql import functions as F

from pyppeteer_scraper_spark.operators.dedup import winnow_fingerprints
from pyppeteer_scraper_spark.operators.search import phrase_search


def test_winnow_detection_guarantee(spark):
    # shared substring of length >= k + w - 1 (k=4, w=4 -> 7) must
    # contribute at least one identical fingerprint hash to both docs.
    shared = "zqxjkwvbn"  # 9 chars > 7, unlikely grams elsewhere
    df = spark.createDataFrame(
        [
            (1, "aaaa" + shared + "bbbbbbbb"),
            (2, "cccccccc" + shared + "dddd"),
        ],
        ["doc_id", "text"],
    )
    out = winnow_fingerprints(df, k=4, w=4)
    fps = {
        d: {r["fp"] for r in rows}
        for d, rows in [
            (1, out.filter(F.col("doc_id") == 1).collect()),
            (2, out.filter(F.col("doc_id") == 2).collect()),
        ]
    }
    assert fps[1] & fps[2], "shared substring produced no common fingerprint"


def test_winnow_density_and_short_doc(spark):
    # a doc shorter than k yields no grams (and must not crash via
    # descending-sequence pitfalls); selections are ~2N/w dense.
    df = spark.createDataFrame(
        [(1, "ab"), (2, "abcdefghijklmnopqrstuvwxyz" * 4)],
        ["doc_id", "text"],
    )
    out = winnow_fingerprints(df, k=4, w=4).collect()
    assert all(r["doc_id"] == 2 for r in out)
    n_pos = 26 * 4 - 4 + 1
    assert 0 < len(out) <= n_pos - 3
    # every fingerprint position must actually be a selected gram start
    assert all(1 <= r["fp_pos"] <= n_pos for r in out)


def test_phrase_search_three_term_chain_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c a b c"),   # "a b c" twice
            (2, "a b x c"),       # broken chain -> no match
            (3, "c b a"),         # reversed -> no match
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_search(df, "a b c").collect()
    }
    assert got == {1: 2}


def test_phrase_search_overlapping_adjacent_repeats(spark):
    # "t t t" contains "t t" at positions 0 and 1 -> 2 matches
    df = spark.createDataFrame([(1, "t t t")], ["doc_id", "text"])
    got = phrase_search(df, "t t").collect()
    assert [(r["doc_id"], r["n_matches"]) for r in got] == [(1, 2)]


def test_winnow_shared_spans_df_cap_prunes_boilerplate(spark):
    from pyppeteer_scraper_spark.operators.dedup import winnow_shared_spans

    # 4 docs all share boilerplate; docs 1,2 also share a rare quote.
    boiler = "all rights reserved worldwide"
    quote = "zqxjv unique quoted passage kwybn"
    df = spark.createDataFrame(
        [
            (1, quote + " " + boiler),
            (2, "intro text " + quote + " " + boiler),
            (3, "other page " + boiler),
            (4, "yet another " + boiler),
        ],
        ["doc_id", "text"],
    )
    # max_df=2: boilerplate fps (df=4) are cut; quote fps (df=2) stay
    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in winnow_shared_spans(df, k=5, w=4, max_df=2).collect()
    }
    assert set(got) == {(1, 2)}
    assert got[(1, 2)] >= 1


def test_winnow_matched_spans_localizes_planted_quote(spark):
    from pyppeteer_scraper_spark.operators.dedup import winnow_matched_spans

    # a long planted quote at known offsets in both docs
    quote = "zqx jkw vbn mlp qrs tuv wxy zab cde fgh"  # 40 chars
    pre1, pre2 = "A" * 10 + " ", "B" * 30 + " "
    df = spark.createDataFrame(
        [(1, pre1 + quote + " tail one"), (2, pre2 + quote + " other")],
        ["doc_id", "text"],
    )
    spans = winnow_matched_spans(df, k=5, w=4, max_df=2).collect()
    assert spans, "no spans found for a planted 40-char quote"
    best = max(spans, key=lambda r: r["n_fps"])
    assert (best["doc_a"], best["doc_b"]) == (1, 2)
    # alignment diagonal = offset difference of the quote starts
    assert best["diag"] == len(pre2) - len(pre1)
    # the span must lie inside the quote region of doc 1 (1-based);
    # +1: the space AFTER the quote is common to both docs, so the
    # true shared region legitimately extends one char past it
    q_start, q_end = len(pre1) + 1, len(pre1) + len(quote) + 1
    assert q_start <= best["a_start"] <= best["a_end"] <= q_end
    # and cover most of it (selection density ~2/w)
    assert best["a_end"] - best["a_start"] >= len(quote) * 0.5
