"""Round-4 batch: rendezvous hashing fleet assignment + token entropy."""

import math

import pytest
from pyspark.sql import functions as F


def test_rendezvous_minimal_disruption(spark):
    from pyppeteer_scraper_spark.operators.export import rendezvous_assign

    doms = spark.createDataFrame(
        [(f"h{i}.example",) for i in range(300)], "domain string"
    )
    n8 = [f"node{i}" for i in range(8)]
    a8 = {r["domain"]: r["assigned_node"] for r in rendezvous_assign(doms, nodes=n8).collect()}
    a9 = {
        r["domain"]: r["assigned_node"]
        for r in rendezvous_assign(doms, nodes=n8 + ["node8"]).collect()
    }
    moved = sum(1 for d in a8 if a8[d] != a9[d])
    # HRW property: ONLY keys whose new max is node8 move; everything
    # that moved must have moved TO the new node, and the moved share
    # concentrates around 1/9
    for d in a8:
        if a8[d] != a9[d]:
            assert a9[d] == "node8"
    assert moved / 300 < 2 / 9
    assert moved > 0


def test_rendezvous_balance_and_determinism(spark):
    from pyppeteer_scraper_spark.operators.export import rendezvous_assign

    doms = spark.createDataFrame(
        [(f"d{i}.example",) for i in range(400)], "domain string"
    )
    out1 = rendezvous_assign(doms).groupBy("assigned_node").count().collect()
    counts = {r["assigned_node"]: r["count"] for r in out1}
    assert len(counts) == 8
    assert max(counts.values()) < 3 * min(counts.values())  # rough balance
    out2 = {r["domain"]: r["assigned_node"] for r in rendezvous_assign(doms).collect()}
    out3 = {r["domain"]: r["assigned_node"] for r in rendezvous_assign(doms).collect()}
    assert out2 == out3


def test_token_entropy_hand_computed(spark):
    from pyppeteer_scraper_spark.functions.text import token_entropy

    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # H = 0
            (2, "a b c d"),          # uniform: H = ln 4
            (3, "a a b b b b"),      # p = 1/3, 2/3
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in token_entropy(df).collect()}
    assert got[1]["token_entropy"] == pytest.approx(0.0, abs=1e-9)
    assert got[2]["token_entropy"] == pytest.approx(math.log(4), abs=1e-6)
    h3 = -(1 / 3) * math.log(1 / 3) - (2 / 3) * math.log(2 / 3)
    assert got[3]["token_entropy"] == pytest.approx(h3, abs=1e-6)
    assert (got[3]["n_tokens"], got[3]["n_distinct"]) == (6, 2)


def test_token_entropy_spam_below_prose(spark):
    from pyppeteer_scraper_spark.functions.text import token_entropy

    df = spark.createDataFrame(
        [
            (1, "buy now " * 50),
            (2, "the quick brown fox jumps over a lazy dog while rain "
                "falls softly on ancient rooftops near the quiet harbor"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["token_entropy"] for r in token_entropy(df).collect()}
    assert got[1] < got[2]
