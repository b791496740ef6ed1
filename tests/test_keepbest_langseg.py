"""keep_best representative selection + per-segment language ID."""

from pyspark.sql import functions as F


def test_keep_best_picks_highest_quality(spark):
    from pyppeteer_scraper_spark.operators.dedup import keep_best

    docs = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.5), (4, 0.7), (5, 0.1)],
        "doc_id long, quality double",
    )
    # component {1,2,3} via chain 1-2, 2-3; component {4}; {5} singleton
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    out = {r["kept_id"]: r for r in keep_best(docs, pairs).collect()}
    assert set(out) == {2, 4, 5}  # 2 wins its cluster on quality
    assert out[2]["n_members"] == 3
    assert out[2]["kept_quality"] == 0.9
    assert out[4]["n_members"] == 1


def test_keep_best_tie_breaks_to_lowest_id(spark):
    from pyppeteer_scraper_spark.operators.dedup import keep_best

    docs = spark.createDataFrame(
        [(7, 0.5), (3, 0.5)], "doc_id long, quality double"
    )
    pairs = spark.createDataFrame([(3, 7)], "a long, b long")
    out = keep_best(docs, pairs).collect()
    assert len(out) == 1 and out[0]["kept_id"] == 3


def test_lang_segments_detects_mixed_docs(spark):
    from pyppeteer_scraper_spark.functions.text import lang_segments

    en6 = "the cat and the dog is"          # strong en segment
    fr6 = "le chat et la mer un"            # strong fr segment
    docs = spark.createDataFrame(
        [
            (1, " ".join([en6] * 4)),            # pure en, 4 segments
            (2, " ".join([en6] * 2 + [fr6] * 2)),  # 50/50 -> mixed
            (3, "xyzzy plugh quux foo bar baz"),   # no stopwords -> und
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in lang_segments(docs).collect()}
    assert out[1]["dominant_lang"] == "en" and out[1]["mixed"] is False
    assert out[1]["n_segments"] == 4 and out[1]["n_dominant"] == 4
    assert out[2]["mixed"] is True
    assert out[2]["dominant_lang"] == "en"  # tie 2-2 -> lang asc
    assert out[3]["dominant_lang"] == "und"
