"""Round-4 session-10: k-core peeling (operators/linkrank.py::kcore)."""

from pyppeteer_scraper_spark.operators.linkrank import kcore


def _cores(df):
    return {(r["node"], r["degree"]) for r in df.collect()}


def test_kcore_triangle_survives_pendant_chain_peeled(spark):
    # triangle a-b-c plus pendant chain c-d-e: at k=2 the chain peels
    # (e has degree 1, then d), the triangle is the converged 2-core.
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")],
        ["src", "dst"],
    )
    assert _cores(kcore(e, k=2, rounds=3)) == {("a", 2), ("b", 2), ("c", 2)}


def test_kcore_cascade_needs_multiple_rounds(spark):
    # path a-b-c-d-e at k=2: round 1 drops a,e; round 2 drops b,d;
    # round 3 drops c -> empty.  Intermediate rounds show the cascade.
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")], ["src", "dst"]
    )
    assert _cores(kcore(e, k=2, rounds=1)) == {("b", 1), ("c", 2), ("d", 1)}
    assert _cores(kcore(e, k=2, rounds=2)) == set()


def test_kcore_direction_and_duplicate_edges_ignored(spark):
    # both directions + self loop present: undirected dedup means the
    # triangle still has degree 2 everywhere at k=2.
    e = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("a", "a")],
        ["src", "dst"],
    )
    assert _cores(kcore(e, k=2, rounds=2)) == {("a", 2), ("b", 2), ("c", 2)}
