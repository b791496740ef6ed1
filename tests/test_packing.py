"""Sequence packing (operators/packing.py): the two-pass distributed
prefix sum must equal the naive global-window formulation bit-for-bit,
and the plan must never collapse the data through a single-task global
window."""

from pyspark.sql import Window
from pyspark.sql import functions as F


def _naive(spark, docs, capacity):
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    p = docs.withColumn(
        "start_tok", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    first = F.expr(f"start_tok div {capacity}")
    last = F.when(
        F.col("n_tokens") > 0,
        F.expr(f"(start_tok + n_tokens - 1) div {capacity}"),
    ).otherwise(first)
    return p.select(
        "doc_id", "n_tokens", "start_tok",
        first.alias("first_seq"), last.alias("last_seq"),
        F.when(F.col("n_tokens") > 0, last - first + 1)
        .otherwise(F.lit(0)).cast("long").alias("n_seqs"),
    )


def test_packing_golden_boundaries(spark):
    from pyppeteer_scraper_spark.operators.packing import pack_token_stream

    docs = spark.createDataFrame(
        [(1, 100), (2, 412), (3, 600), (4, 0), (5, 1)],
        "doc_id long, n_tokens long",
    )
    out = {
        r["doc_id"]: r
        for r in pack_token_stream(docs, capacity=512, bucket_size=2).collect()
    }
    # doc1 [0,100): seq 0; doc2 [100,512): seq 0 exactly to the boundary
    assert (out[1]["first_seq"], out[1]["last_seq"], out[1]["n_seqs"]) == (0, 0, 1)
    assert (out[2]["start_tok"], out[2]["last_seq"]) == (100, 0)
    # doc3 [512,1112): spans seqs 1-2
    assert (out[3]["first_seq"], out[3]["last_seq"], out[3]["n_seqs"]) == (1, 2, 2)
    # empty doc occupies no sequence
    assert (out[4]["start_tok"], out[4]["n_seqs"]) == (1112, 0)
    assert (out[5]["first_seq"], out[5]["n_seqs"]) == (2, 1)


def test_packing_matches_naive_global_window(spark):
    from pyppeteer_scraper_spark.operators.packing import pack_token_stream

    # gappy, shuffled ids; sizes straddling many boundaries
    rows = [(i * 7 % 1009, (i * 37) % 300) for i in range(600)]
    ids = {r[0] for r in rows}
    rows = [r for r in rows if r[0] in ids]  # ids unique by construction
    docs = spark.createDataFrame(
        rows, "doc_id long, n_tokens long"
    ).repartition(16)
    got = pack_token_stream(docs, capacity=257, bucket_size=50)
    want = _naive(spark, docs, 257)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.count() == 600


def test_packing_plan_has_no_global_window_on_data(spark):
    """The data-path window must be partitioned by bucket; the only
    unpartitioned window may touch the tiny bucket-totals table."""
    from pyppeteer_scraper_spark.operators.packing import pack_token_stream

    docs = spark.range(0, 10_000).select(
        F.col("id").alias("doc_id"), F.lit(50).alias("n_tokens")
    )
    plan = pack_token_stream(
        docs, capacity=512
    )._jdf.queryExecution().optimizedPlan().toString()
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    doc_specs = [s for s in specs if "doc_id" in s]
    # the per-doc window exists and is bucket-PARTITIONED: its spec
    # lists __bucket before the doc_id ordering column
    assert doc_specs, plan
    for s in doc_specs:
        assert s.index("__bucket") < s.index("doc_id"), plan


def test_packing_exact_division_beyond_float_precision(spark):
    """Offsets past 2^45 with a non-power-of-two capacity: float
    division + cast('long') rounds across integer boundaries; the
    operator must use exact integer division (`div`)."""
    from pyppeteer_scraper_spark.operators.packing import pack_token_stream

    big = (1 << 53) + 1  # not representable as float64 + 1 exactly
    cap = 1000
    docs = spark.createDataFrame(
        [(0, big), (1, 1), (2, 1)], "doc_id long, n_tokens long"
    )
    out = {
        r["doc_id"]: r
        for r in pack_token_stream(docs, capacity=cap, bucket_size=2).collect()
    }
    # doc 1 starts at exactly `big`; Python int // is the ground truth
    assert out[1]["start_tok"] == big
    assert out[1]["first_seq"] == big // cap
    assert out[2]["first_seq"] == (big + 1) // cap
