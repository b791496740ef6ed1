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


def test_adjacent_lcp_detects_planted_duplicate(spark):
    """A 60-char string planted in two docs must surface as an
    adjacent SA pair with lcp == cap (the Lee et al. detection
    signal); every pair's lcp must equal the python common-prefix of
    the true concatenated suffixes (capped)."""
    from pyppeteer_scraper_spark.operators.suffix import (
        suffix_adjacent_lcp,
    )

    dup = "the quick brown fox jumps over the lazy dog again and again"
    docs = [
        (1, "alpha beta gamma " + dup + " tail one"),
        (2, "completely different middle " + dup + " other tail"),
        (3, "unrelated filler text with no repeats at all here"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    cap = 48
    rows = suffix_adjacent_lcp(df, cap=cap).collect()

    cat = "".join(t + SEP for _, t in sorted(docs))
    offs, pos = {}, 0
    for did, t in sorted(docs):
        for i in range(len(t) + 1):
            offs[pos + i] = (did, i)
        pos += len(t) + 1
    order = sorted(range(len(cat)), key=lambda p: cat[p:])
    gpos_of = {}
    for rk, p in enumerate(order):
        gpos_of[rk + 1] = p

    def ref_lcp(p, q):
        a, b = cat[p : p + cap], cat[q : q + cap]
        n = 0
        while n < min(len(a), len(b)) and a[n] == b[n]:
            n += 1
        return n

    planted_hit = False
    assert len(rows) == len(cat) - 1
    for r in rows:
        p, q = gpos_of[r["rank_a"]], gpos_of[r["rank_a"] + 1]
        assert (r["doc_a"], r["off_a"]) == offs[p], r
        assert (r["doc_b"], r["off_b"]) == offs[q], r
        assert r["lcp"] == ref_lcp(p, q), (r, ref_lcp(p, q))
        if (
            r["lcp"] == cap
            and {r["doc_a"], r["doc_b"]} == {1, 2}
        ):
            planted_hit = True
    assert planted_hit
