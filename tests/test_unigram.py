"""Unigram-LM tokenizer (functions/unigram.py)."""

from pyspark.sql import functions as F

from pyppeteer_scraper_spark.functions.unigram import (
    encode_unigram,
    train_unigram,
)
from pyppeteer_scraper_spark.sources.tables import load_table


def _tiny(spark):
    return spark.createDataFrame(
        [(1, "low lower lowest"), (2, "new newer newest"),
         (3, "low new low")],
        ["doc_id", "text"],
    )


def test_unigram_learns_morphemes_golden(spark):
    """Hard-EM on the low/new + er/est corpus must learn exactly the
    stems and suffixes as multi-char pieces, and encode every word as
    stem(+suffix) — the hand-checkable Kudo-style outcome."""
    docs = _tiny(spark)
    vocab = train_unigram(
        docs, vocab_size=20, n_iters=2, seed_size=30, max_piece_len=4
    )
    pieces = {r["piece"] for r in vocab.collect()}
    assert {"low", "new", "er", "est"} <= pieces
    enc = {
        r["doc_id"]: r["pieces"]
        for r in encode_unigram(docs, vocab).collect()
    }
    assert enc[1] == ["low", "low", "er", "low", "est"]
    assert enc[2] == ["new", "new", "er", "new", "est"]
    assert enc[3] == ["low", "new", "low"]


def test_unigram_roundtrip_and_determinism(spark, sf_small):
    docs = load_table(spark, sf_small, "documents").limit(60)
    vocab = train_unigram(
        docs, vocab_size=64, n_iters=2, seed_size=200, max_piece_len=6
    )
    rows = sorted(
        (r["piece"], r["logp"]) for r in vocab.collect()
    )
    again = sorted(
        (r["piece"], r["logp"])
        for r in train_unigram(
            docs, vocab_size=64, n_iters=2, seed_size=200,
            max_piece_len=6,
        ).collect()
    )
    assert rows == again  # fully deterministic training
    n_multi = sum(1 for p, _ in rows if len(p) > 1)
    assert 0 < n_multi <= 64
    # coverage + lossless roundtrip: concatenated pieces == the word
    enc = encode_unigram(docs, vocab)
    words = docs.select(
        "doc_id", F.split("text", r"\s+").alias("w")
    ).select(
        "doc_id",
        F.concat_ws("", F.filter("w", lambda x: x != "")).alias("joined"),
    )
    got = enc.select(
        "doc_id", F.concat_ws("", "pieces").alias("joined2")
    )
    j = {r["doc_id"]: r["joined"] for r in words.collect()}
    for r in got.collect():
        assert r["joined2"] == j[r["doc_id"]], r["doc_id"]
