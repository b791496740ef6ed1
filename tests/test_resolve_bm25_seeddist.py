"""Round-4 batch: RFC 3986 resolution, within-doc line dedup, BM25,
BFS seed distance."""

import math

import pytest
from pyspark.sql import functions as F

RFC_CASES = [
    # (base, ref, expected) — RFC 3986 §5.4 style
    ("https://a.example.com/a/b/c/page", "../x", "https://a.example.com/a/b/x"),
    ("https://a.example.com/a/b/c/page", "./y", "https://a.example.com/a/b/c/y"),
    ("https://a.example.com/a/b/c/page", "z/w", "https://a.example.com/a/b/c/z/w"),
    ("https://a.example.com/a/b/c/page", "/root/r", "https://a.example.com/root/r"),
    ("https://a.example.com/a/b/c", "//cdn.example.org/lib.js", "https://cdn.example.org/lib.js"),
    ("https://a.example.com/a", "http://other.example/abs", "http://other.example/abs"),
    ("https://a.example.com/a/b?old=1", "?q=3", "https://a.example.com/a/b?q=3"),
    ("https://a.example.com/a/b/c/", "../../up/../deep", "https://a.example.com/a/deep"),
    ("https://a.example.com/a/b", "", "https://a.example.com/a/b"),
    # '..' past the root clamps at '/', per §5.2.4
    ("https://a.example.com/a/b/c/page", "../../../../x", "https://a.example.com/x"),
    # directory-form refs keep the trailing slash
    ("https://a.example.com/a/b", "sub/", "https://a.example.com/a/sub/"),
    ("https://a.example.com/a/b", "..", "https://a.example.com/"),
    # fragments are stripped (a crawler never fetches them)
    ("https://a.example.com/a/b#frag", "d#z", "https://a.example.com/a/d"),
    ("https://a.example.com/a//b/c", "../x", "https://a.example.com/a/x"),  # '//' collapse
]


def test_resolve_reference_rfc_cases(spark):
    from pyppeteer_scraper_spark.functions.canonicalize import resolve_reference

    df = spark.createDataFrame(RFC_CASES, "base string, ref string, expected string")
    rows = df.select(
        "base", "ref", "expected",
        resolve_reference(F.col("base"), F.col("ref")).alias("got"),
    ).collect()
    for r in rows:
        assert r["got"] == r["expected"], (r["base"], r["ref"], r["got"], r["expected"])


def test_dedup_lines_within_semantics(spark):
    from pyppeteer_scraper_spark.functions.text import dedup_lines_within

    df = spark.createDataFrame(
        [
            (1, "menu\nbody one\nmenu\nbody two\nmenu\nfooter\nfooter"),
            (2, "unique one\nunique two"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in dedup_lines_within(df).collect()}
    assert got[1]["deduped_text"] == "menu\nbody one\nbody two\nfooter"
    assert (got[1]["n_lines"], got[1]["n_kept"]) == (7, 4)
    assert got[2]["deduped_text"] == "unique one\nunique two"
    assert (got[3]["n_lines"], got[3]["n_kept"]) == (1, 1)  # [''] kept


def test_bm25_hand_computed(spark):
    from pyppeteer_scraper_spark.operators.search import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana"),       # dl=3, tf(apple)=2
            (2, "apple cherry cherry date"), # dl=4, tf(apple)=1
            (3, "banana date date date"),    # dl=4
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(docs, query_terms=["apple"], top_n=10)
    rows = {r["doc_id"]: r for r in out.collect()}
    n_docs, avgdl, k1, b = 3.0, 11 / 3, 1.2, 0.75
    df_apple = 2.0
    idf = math.log(1 + (n_docs - df_apple + 0.5) / (df_apple + 0.5))

    def score(tf, dl):
        return round(idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)), 6)

    assert rows[1]["score"] == pytest.approx(score(2, 3), abs=1e-6)
    assert rows[2]["score"] == pytest.approx(score(1, 4), abs=1e-6)
    assert rows[1]["rnk"] == 1 and rows[2]["rnk"] == 2  # higher tf, shorter doc wins
    assert 3 not in rows  # no 'apple' posting


def test_bm25_rank_determinism_on_ties(spark):
    from pyppeteer_scraper_spark.operators.search import bm25_topk

    # identical docs → identical scores → rank by doc_id
    docs = spark.createDataFrame(
        [(i, "same text here") for i in range(5)], "doc_id long, text string"
    )
    rows = bm25_topk(docs, query_terms=["same"], top_n=3).orderBy("rnk").collect()
    assert [r["doc_id"] for r in rows] == [0, 1, 2]


def test_seed_distance_hand_graph(spark):
    from pyppeteer_scraper_spark.operators.linkrank import seed_distance

    # 0→1→2→3, 5→6 (island), 4 isolated-but-linked from 3
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (5, 6)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["dist"] for r in seed_distance(edges, seeds, max_hops=3).collect()}
    # hop budget of 3: node 4 is 4 hops out → unreached
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: -1, 5: -1, 6: -1}


def test_seed_distance_min_over_multiple_seeds(spark):
    from pyppeteer_scraper_spark.operators.linkrank import seed_distance

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (9, 2), (2, 0)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,), (9,)], "node long")
    got = {r["node"]: r["dist"] for r in seed_distance(edges, seeds, max_hops=4).collect()}
    assert got[2] == 1  # via seed 9, not 2 hops via seed 0
    assert got[0] == 0 and got[1] == 1 and got[9] == 0
