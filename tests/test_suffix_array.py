"""Distributed suffix array (operators/suffix.py)."""

from pyppeteer_scraper_spark.operators.suffix import (
    SEP,
    global_suffix_array,
)
from pyppeteer_scraper_spark.sources.tables import load_table


def _reference(doc_list):
    """Sort the raw suffixes in python — the independent derivation."""
    cat = "".join(t + SEP for _, t in sorted(doc_list))
    offs = {}
    pos = 0
    for did, t in sorted(doc_list):
        for i in range(len(t) + 1):
            offs[pos + i] = (did, i)
        pos += len(t) + 1
    order = sorted(range(len(cat)), key=lambda p: cat[p:])
    return sorted((rk + 1, *offs[p]) for rk, p in enumerate(order))


def test_suffix_array_matches_sorted_suffixes_hand_data(spark):
    """Repetitive strings (banana/abracadabra + a shared 'banana'
    prefix across docs) force deep rank ties — the doubling loop
    cannot shortcut via unique single chars; empty doc covered."""
    docs = [(1, "banana"), (2, "abracadabra"), (3, ""), (5, "bananaban")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = sorted(
        (r["suffix_rank"], r["doc_id"], r["off"])
        for r in global_suffix_array(df).collect()
    )
    assert got == _reference(docs)


def test_suffix_array_matches_on_real_corpus_sample(spark, sf_small):
    docs = [
        (r["doc_id"], r["text"])
        for r in load_table(spark, sf_small, "documents")
        .filter("doc_id % 17 = 2")
        .collect()
    ]
    assert len(docs) >= 2
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = sorted(
        (r["suffix_rank"], r["doc_id"], r["off"])
        for r in global_suffix_array(df).collect()
    )
    want = _reference(docs)
    assert len(got) == len(want)
    assert got == want
