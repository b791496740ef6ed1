"""Round-4 session-10: content-defined chunking."""

from pyspark.sql import functions as F

from pyppeteer_scraper_spark.operators.dedup import cdc_chunks


def _chunks(df, doc):
    rows = df.filter(F.col("doc_id") == doc).collect()
    return sorted((r["start"], r["length"], r["chunk_md5"]) for r in rows)


def test_cdc_spans_cover_document_exactly(spark):
    text = "the quick brown fox jumps over the lazy dog " * 20
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    spans = _chunks(cdc_chunks(df, w=8, bits=4), 1)
    assert spans[0][0] == 1
    pos = 1
    for start, length, _ in spans:
        assert start == pos
        pos += length
    assert pos - 1 == len(text)


def test_cdc_boundaries_resync_after_insertion(spark):
    base = "the quick brown fox jumps over the lazy dog " * 30
    shifted = "INSERTED PREFIX " + base
    df = spark.createDataFrame(
        [(1, base), (2, shifted)], ["doc_id", "text"]
    )
    out = cdc_chunks(df, w=8, bits=4)
    h1 = {c for _, _, c in _chunks(out, 1)}
    h2 = {c for _, _, c in _chunks(out, 2)}
    # content-anchored boundaries: most of doc 1's chunks reappear in
    # doc 2 despite every absolute offset shifting by 16
    assert len(h1 & h2) >= 0.6 * len(h1), (len(h1 & h2), len(h1))


def test_cdc_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "tiny")], ["doc_id", "text"])
    spans = _chunks(cdc_chunks(df, w=8, bits=4), 1)
    assert spans == [(1, 4, spans[0][2])]
