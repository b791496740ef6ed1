"""As-of (temporal backward) join — Spark lacks one natively.

For each left row, attach the payload of the LATEST right row with the
same key and ``right_time <= left_time`` (inclusive).  The classic uses:
point-in-time feature lookup, "state as of event time", market-data
joins.

Scale shape — the union+window formulation, NOT a range join:
interleave both sides into one (key, time)-sorted stream and carry the
last-seen right payload forward with ``last(..., ignorenulls=True)``
over an unbounded-preceding window.  One shuffle (by key), one sort,
zero candidate explosion — a range-predicate join would either
cross-join within key or need interval bucketing.  At web scale the
only hazard is a mega-key funneling one partition; mitigate by
splitting the window into coarse time buckets (carrying each bucket's
closing state forward), the same trick as the salted top-k — not needed
at sandbox sizes and not applied here.

Tie discipline: right rows sort BEFORE left rows at equal time (the
inclusive <=), and callers should de-duplicate the right side to one
row per (key, time) to keep the matched payload deterministic — the
registered query does (max event id wins), mirrored in its DuckDB
``ASOF JOIN`` oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list,
    left_time: str,
    right_time: str,
    payload_cols: list,
    how: str = "inner",
    matched_col: str = "asof",
) -> DataFrame:
    """Attach ``matched_col`` (struct of ``payload_cols`` from the
    latest right row at-or-before the left row's time) to every left
    row.  ``how="left"`` keeps unmatched left rows with a null struct;
    ``"inner"`` drops them."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    on = list(on)
    payload_t = right.select(
        F.struct(*[F.col(c) for c in payload_cols]).alias("p")
    ).schema["p"].dataType
    lhs = left.select(
        "*",
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(payload_t).alias("__payload"),
    )
    extra = [c for c in left.columns if c not in on]
    rhs = right.select(
        *on,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in extra],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__payload"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        lhs.unionByName(rhs)
        .withColumn(matched_col, F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
        .drop("__t", "__side", "__payload")
    )
    if how == "inner":
        matched = matched.filter(F.col(matched_col).isNotNull())
    return matched
