"""Round-4 session-5 batch 9: co-citation with skew cap, log2
histograms."""

from pyspark.sql import functions as F

from pyppeteer_scraper_spark.functions.text import log2_histogram
from pyppeteer_scraper_spark.operators.linkrank import (
    cocitation,
    cocitation_dropped,
)


def test_cocitation_golden(spark):
    # d1 cited by a,b,c; d2 cited by a,b -> (a,b)=2 common, (a,c)=(b,c)=1
    e = spark.createDataFrame(
        [("a", "d1"), ("b", "d1"), ("c", "d1"), ("a", "d2"), ("b", "d2")],
        ["src", "dst"],
    )
    out = [(r["a"], r["b"], r["n_common"]) for r in cocitation(e).collect()]
    assert out[0] == ("a", "b", 2)
    assert set(out[1:]) == {("a", "c", 1), ("b", "c", 1)}


def test_cocitation_cap_truncates_hubs_and_reports(spark):
    # hub cited by 5 pages; cap 2 keeps only its first 2 citers by src
    # order (s0, s1) -> hub contributes exactly the (s0, s1) pair
    hub = [(f"s{i}", "hub") for i in range(5)]
    e = spark.createDataFrame(hub + [("s0", "d"), ("s3", "d")], ["src", "dst"])
    pairs = {(r["a"], r["b"]): r["n_common"] for r in cocitation(e, max_citers=2).collect()}
    assert pairs == {("s0", "s1"): 1, ("s0", "s3"): 1}
    rep = cocitation_dropped(e, max_citers=2).collect()[0]
    assert rep["n_dsts_total"] == 2
    assert rep["n_dsts_truncated"] == 1 and rep["n_edges_dropped"] == 3


def test_log2_histogram_golden(spark):
    df = spark.createDataFrame(
        [("s", 1), ("s", 2), ("s", 3), ("s", 1024), ("s", 0)],
        ["source", "n_chars"],
    )
    out = {r["bucket"]: r["n"] for r in log2_histogram(df).collect()}
    # 1 -> bucket 0; 2,3 -> bucket 1; 1024 -> bucket 10 (exact power);
    # 0 -> bucket -1
    assert out == {0: 1, 1: 2, 10: 1, -1: 1}
