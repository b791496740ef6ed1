"""roc_auc_exact (functions/classifier.py) and stride_interleave
(operators/export.py): hand-computed values, brute-force pair
equivalence, degenerate classes, proportional-prefix property, and
partitioning-independence."""

import itertools

from pyspark.sql import Window
from pyspark.sql import functions as F

from pyppeteer_scraper_spark.functions.classifier import roc_auc_exact
from pyppeteer_scraper_spark.operators.export import stride_interleave


def _auc_bruteforce(pairs):
    """AUC = P(s_pos > s_neg) + 0.5 P(tie) over all pos x neg pairs."""
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    if not pos or not neg:
        return None
    wins = ties = 0
    for p, n in itertools.product(pos, neg):
        if p > n:
            wins += 1
        elif p == n:
            ties += 1
    return (wins + 0.5 * ties) / (len(pos) * len(neg))


def _run_auc(spark, pairs, bucket_width=2):
    df = spark.createDataFrame(
        [(s, bool(y)) for s, y in pairs], "score_raw long, label boolean"
    )
    return roc_auc_exact(df, bucket_width=bucket_width).collect()[0]


def test_auc_hand_computed_with_ties(spark):
    # pos scores {3, 5, 5}, neg {1, 5, 2}: wins = 2+2+2 = 6 (the pos-3
    # loses to the neg-5), ties = 2 (the two pos-5 against the neg-5)
    # -> AUC = (6 + 0.5*2) / 9 = 7/9
    pairs = [(3, 1), (5, 1), (5, 1), (1, 0), (5, 0), (2, 0)]
    row = _run_auc(spark, pairs)
    assert row.n_pos == 3 and row.n_neg == 3
    assert row.auc == round(7 / 9, 6)
    assert row.gini == round(2 * 7 / 9 - 1, 6)


def test_auc_matches_bruteforce_across_bucket_widths(spark):
    # Deterministic messy case: scores spanning buckets, negatives
    # interleaved, duplicates everywhere; bucket_width must not matter.
    pairs = [((i * 37) % 11 - 3, (i * 17) % 3 == 0) for i in range(60)]
    want = round(_auc_bruteforce(pairs), 6)
    for bw in (1, 2, 1024):
        row = _run_auc(spark, pairs, bucket_width=bw)
        assert row.auc == want, f"bucket_width={bw}"


def test_auc_perfect_and_inverted_and_degenerate(spark):
    sep = [(10, 1), (11, 1), (1, 0), (2, 0)]
    assert _run_auc(spark, sep).auc == 1.0
    inv = [(1, 1), (2, 1), (10, 0), (11, 0)]
    assert _run_auc(spark, inv).auc == 0.0
    one_class = [(1, 1), (2, 1)]
    row = _run_auc(spark, one_class)
    assert row.auc is None and row.gini is None and row.n_neg == 0


def test_interleave_matches_naive_global_window(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").select(
        "doc_id", "source"
    )
    got = stride_interleave(docs, "source", "doc_id", k=None)
    cnt = docs.groupBy("source").agg(F.count("*").alias("ns"))
    naive = (
        docs.withColumn(
            "rn",
            F.row_number()
            .over(Window.partitionBy("source").orderBy("doc_id"))
            .cast("long"),
        )
        .join(cnt, "source")
        .select(
            "source",
            "doc_id",
            "rn",
            (F.col("rn").cast("double") / F.col("ns").cast("double")).alias(
                "vt"
            ),
        )
    )
    assert got.exceptAll(naive).count() == 0
    assert naive.exceptAll(got).count() == 0


def test_interleave_prefix_is_proportional(spark):
    # Two sources 3:1 -> in every prefix of length 4k, source a has
    # contributed 3k and source b k (exact for integer strides).
    rows = [("a", i) for i in range(300)] + [("b", 1000 + i) for i in range(100)]
    docs = spark.createDataFrame(rows, "source string, doc_id long")
    head = stride_interleave(docs, "source", "doc_id", k=80).collect()
    assert [r.pos for r in head] == list(range(1, 81))
    for k in (4, 8, 40, 80):
        pref = [r.source for r in head[:k]]
        assert pref.count("a") == 3 * k // 4
        assert pref.count("b") == k // 4


def test_interleave_partitioning_independent(spark):
    rows = [(f"s{i % 3}", i) for i in range(500)]
    docs = spark.createDataFrame(rows, "source string, doc_id long")
    a = stride_interleave(docs.repartition(1), k=50).collect()
    b = stride_interleave(
        docs.repartition(16, "doc_id"), k=50, bucket_size=7
    ).collect()
    assert a == b
