"""Quality-first token-budget corpus selection — per source, admit
documents in descending model-quality order until a token budget is
exhausted (the FineWeb/DCLM-style "take the best N tokens per source"
curation step that sits between quality scoring and sequence packing).

Reference analog: the reference keeps only rows that pass its
per-scraper filter chain (e.g. /root/reference/scraper/home_depo.py:
444-455) — a boolean gate.  A training-data pipeline additionally has
a CAPACITY: the corpus target is "X tokens", not "everything that
passes", so the gate becomes a budgeted top-prefix per source.

Scale shape: ONE shuffle on source (the window partition key).  The
running token total is a window cumulative sum within each source
ordered by (score desc, doc_id) — no global sort, no driver collect.
Skew: the partition key has low cardinality (sources), so a mega
source funnels one task; the two-phase pre-rank in operators/topk.py
is the documented swap-in when a single source exceeds a task's rows
(the budget bound means only ~budget/min_doc_tokens rows per source
can ever be admitted, so pre-filtering to each source's top
candidates by score bounds the window input before the exact pass).

Determinism contract (driver hash parity): ordering uses the ROUNDED
(6 dp) sigmoid score from functions/classifier.py — hash-stable across
engines (text_model_quality is driver-green) — with doc_id as the
total-order tie-break, and the admitted set is {rows whose cumulative
tokens INCLUDING self <= budget} (a doc that would overshoot is
dropped, as are all after it in score order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyppeteer_scraper_spark.functions.classifier import quality_model_score


def select_by_token_budget(
    docs: DataFrame,
    budget_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Admit the best-scoring prefix of each source under a per-source
    token budget.  Returns one row per ADMITTED doc:
    (source, doc_id, n_tokens, score, cum_tokens).

    Token counting is the oracle family's whitespace split
    (``split(text, ' ')`` — single-space, empties counted) so the
    DuckDB twin is exact.
    """
    score = quality_model_score(F.col(text_col))["score"]
    scored = docs.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ", -1)).cast("long").alias(
            "n_tokens"
        ),
        score.alias("score"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scored.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= F.lit(int(budget_tokens)))
    )
