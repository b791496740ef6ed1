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
only hazard is a mega-key funneling one partition; pass
``skew_bucket_width`` to split the window into coarse time buckets and
carry each bucket's closing right-state forward (the same
divide-into-bounded-groups trick as the salted top-k):

  phase A: the running window partitions by (key, bucket) — a mega-key
           spreads across its buckets, each group bounded by the
           bucket's row count;
  phase B: per-bucket CLOSING right payloads form a summary table (one
           row per key x bucket — tiny), a per-key window over THAT
           computes each bucket's carry-in (last closing state of any
           earlier bucket), and a co-partitioned (key, bucket) join
           seeds phase A's nulls via coalesce.

Cost: one extra small-shuffle aggregate + join; correctness is
bit-identical to the single-window form (asserted against it in
tests/test_asof_skew.py).

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
    skew_bucket_width: int | None = None,
) -> DataFrame:
    """Attach ``matched_col`` (struct of ``payload_cols`` from the
    latest right row at-or-before the left row's time) to every left
    row.  ``how="left"`` keeps unmatched left rows with a null struct;
    ``"inner"`` drops them.

    ``skew_bucket_width``: optional mega-key mitigation — split each
    key's ordered stream into coarse time buckets of this width
    (seconds for timestamp time columns, raw units for numeric ones)
    and carry closing state across buckets, so no window group exceeds
    one bucket's rows.  Same results, one extra bounded shuffle."""
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
    u = lhs.unionByName(rhs)
    if skew_bucket_width is None:
        w = (
            Window.partitionBy(*on)
            .orderBy("__t", "__side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        u = u.withColumn(
            matched_col, F.last("__payload", ignorenulls=True).over(w)
        )
    else:
        u = _bucketed_carry_forward(
            u, on, matched_col, int(skew_bucket_width)
        )
    # pin output column order (the bucketed path's equi-join reorders
    # key columns first)
    matched = u.filter(F.col("__side") == 1).select(
        *left.columns, matched_col
    )
    if how == "inner":
        matched = matched.filter(F.col(matched_col).isNotNull())
    return matched


def _bucketed_carry_forward(
    u: DataFrame, on: list, matched_col: str, width: int
) -> DataFrame:
    """Skew-safe running last-right-payload over the interleaved
    stream: partition the per-key window by coarse time bucket and
    seed each bucket with the closing state of earlier buckets.

    Exact integer bucketing (`div`): seconds granularity for timestamp
    time columns, raw units for numerics — a bucket boundary never
    splits equal timestamps, so the (__t, __side) tie discipline is
    preserved within every bucket.
    """
    t_type = u.schema["__t"].dataType.simpleString()
    if t_type.startswith("timestamp"):
        bkt = F.expr(f"unix_seconds(cast(__t as timestamp)) div {width}")
    else:
        bkt = F.expr(f"cast(__t as bigint) div {width}")
    u = u.withColumn("__bkt", bkt)
    # phase A: running last within (key, bucket) — bounded groups
    wb = (
        Window.partitionBy(*on, "__bkt")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = F.last("__payload", ignorenulls=True).over(wb)
    # phase B: per-bucket closing right payload -> tiny summary table
    # (one row per key x bucket), then a per-key window over the
    # SUMMARY computes each bucket's carry-in.  Buckets with no right
    # rows must still appear so their carry-in propagates.
    closing = (
        u.filter(F.col("__side") == 0)
        .groupBy(*on, "__bkt")
        .agg(F.max_by("__payload", "__t").alias("__close"))
    )
    buckets = u.select(*on, "__bkt").distinct()
    wc = (
        Window.partitionBy(*on)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        buckets.join(closing, [*on, "__bkt"], "left")
        .withColumn("__carry", F.last("__close", ignorenulls=True).over(wc))
        .select(*on, "__bkt", "__carry")
    )
    # co-partitioned (key, bucket) join seeds phase A's leading nulls
    return u.join(carry, [*on, "__bkt"], "left").withColumn(
        matched_col, F.coalesce(local, F.col("__carry"))
    )
