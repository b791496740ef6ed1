"""BM25 ranked retrieval over the document corpus.

The engine already builds the inverted index (plans/queries.py::
text_inverted_index) and IDF tables (functions/text.py); BM25
(Robertson/Spärck Jones; the Lucene-default scoring function) is the
standard way a corpus this size is actually QUERIED — quality
inspection ("show me the docs this filter would keep for topic X"),
decontamination review, and eval-set mining all reduce to ranked
lookups.  The reference has nothing comparable (it greps single pages
as they arrive).

Scale shape: the score join is posting-list-sized — the term-frequency
table is inner-joined to the (broadcast, tiny) query-term list FIRST,
so only postings of queried terms flow through the rest of the plan;
corpus-level stats (N, avgdl) ride in as a broadcast 1-row aggregate.
All built-ins: one explode + three aggregates + window top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str] | None = None,
    n_query_terms: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``top_n`` documents per query term under BM25.

    ``query_terms=None`` derives the terms deterministically as the
    ``n_query_terms`` most frequent corpus tokens (tf desc, term asc) —
    the driver-oracle form, where both engines must agree on the term
    set without a side channel.  Scoring uses the Lucene BM25 variant
    ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``; ties rank by doc id.

    Output: (term, doc_id, tf, dl, score, rnk).
    """
    tok = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ", -1)).alias("term")
    )
    dl = tok.groupBy(id_col).agg(F.count("*").cast("long").alias("dl"))
    # every doc has ≥1 token row (split of "" is ['']), so dl covers all
    # docs and ONE aggregate yields both corpus stats.  They attach via
    # an explicit broadcast crossJoin: the build side is exactly one
    # row, so the BroadcastNestedLoopJoin this plans is a scalar
    # attach, not an all-pairs join — declared as such in the registry
    # plan sweep's allowlist (tests/test_plan_quality.py).
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )

    if query_terms is None:
        qt = (
            tok.groupBy("term")
            .agg(F.count("*").alias("ctf"))
            .orderBy(F.desc("ctf"), "term")
            .limit(n_query_terms)
            .select("term")
        )
    else:
        qt = docs.sparkSession.createDataFrame(
            [(t,) for t in query_terms], "term string"
        )

    tf = (
        tok.join(F.broadcast(qt), "term")  # prune to queried postings first
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))

    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "score",
            F.round(
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * F.col("tf")
                * (k1 + 1)
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("term").orderBy(F.desc("score"), F.col(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= top_n)
        .select("term", id_col, "tf", "dl", "score", "rnk")
    )
