"""Gap-based sessionization — 30-min-inactivity-style session ids via
lag + cumulative sum over the per-key time order (the micro-batch
analog of Structured Streaming's ``session_window``; see the
a_sessionize_gaps query for the oracle and the session_window
cross-check).

Scale shape: one shuffle by key, no self-join.  The single hazard at
web scale is the same one as the as-of join's: a mega-key (one user /
one host with 10^8 events) funnels a single window partition.  Pass
``skew_bucket_seconds`` to run the skew-safe two-phase form, the exact
same decomposition as operators/packing.py's distributed prefix sum:

  phase A: lag + session-start flags within (key, time-bucket) — the
           window partitions by bucket, so a mega-key spreads across
           its buckets;
  phase B: per-bucket summaries (last event time, session-start count)
           form a TINY table (one row per key x non-empty bucket); a
           per-key window over that yields (a) each bucket's carry-in
           timestamp — the previous bucket's closing event time, which
           decides whether the bucket's first event opens a new
           session — and (b) the exclusive prefix sum of session
           starts, the bucket's session-number base.  A co-partitioned
           (key, bucket) join folds both back.

Output is bit-identical to the single-window form (asserted in
tests/test_sessionize_skew.py), including sessions spanning bucket
boundaries and runs of empty buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
    gap_seconds: int = 30 * 60,
    skew_bucket_seconds: int | None = None,
) -> DataFrame:
    """Per-event session numbers: (key, order cols, ts, session_no),
    ``session_no`` counting 1.. per key in time order.  A new session
    opens when the previous event is more than ``gap_seconds`` older
    (or absent).  Ties on ts break by ``order_cols``."""
    gap_us = int(gap_seconds) * 1_000_000
    # parquet ts is TIMESTAMP_NTZ; cast via the UTC-pinned session so
    # unix_micros is defined (pure offset — cancels in differences)
    base = events.select(
        F.col(key_col).alias("__k"),
        *[F.col(c) for c in order_cols],
        F.col(ts_col).alias("__ts"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__tus"),
    )
    if skew_bucket_seconds is None:
        w = Window.partitionBy("__k").orderBy("__tus", *order_cols)
        prev = F.lag("__tus").over(w)
        new_sess = F.when(
            prev.isNull() | (F.col("__tus") - prev > gap_us), 1
        ).otherwise(0)
        cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        out = base.withColumn("__new", new_sess).withColumn(
            "session_no", F.sum("__new").over(cum).cast("long")
        )
    else:
        out = _bucketed_sessionize(
            base, order_cols, gap_us, int(skew_bucket_seconds) * 1_000_000
        )
    return out.select(
        F.col("__k").alias(key_col),
        *[F.col(c) for c in order_cols],
        F.col("__ts").alias(ts_col),
        "session_no",
    )


def _bucketed_sessionize(
    base: DataFrame,
    order_cols: tuple[str, ...],
    gap_us: int,
    width_us: int,
) -> DataFrame:
    ev = base.withColumn("__bkt", F.expr(f"__tus div {width_us}"))
    wb = Window.partitionBy("__k", "__bkt").orderBy("__tus", *order_cols)
    # carry-in: closing event time of the nearest earlier non-empty
    # bucket.  Times are monotone in bucket id, so a running max over
    # the per-bucket maxima IS the previous bucket's last event time.
    summ = ev.groupBy("__k", "__bkt").agg(F.max("__tus").alias("__last"))
    wprev = (
        Window.partitionBy("__k")
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = summ.withColumn("__carry", F.max("__last").over(wprev)).select(
        "__k", "__bkt", "__carry"
    )
    prev = F.coalesce(F.lag("__tus").over(wb), F.col("__carry"))
    flagged = ev.join(carry, ["__k", "__bkt"]).withColumn(
        "__new",
        F.when(prev.isNull() | (F.col("__tus") - prev > gap_us), 1).otherwise(
            0
        ),
    )
    # session-number base per bucket: exclusive prefix sum of the
    # per-bucket session-start counts — window over the summary only
    starts = flagged.groupBy("__k", "__bkt").agg(
        F.sum("__new").alias("__nb")
    )
    bases = starts.withColumn(
        "__base", F.coalesce(F.sum("__nb").over(wprev), F.lit(0))
    ).select("__k", "__bkt", "__base")
    cum = wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return flagged.join(bases, ["__k", "__bkt"]).withColumn(
        "session_no",
        (F.col("__base") + F.sum("__new").over(cum)).cast("long"),
    )


def session_stats(sessions: DataFrame, key_col: str, ts_col: str) -> DataFrame:
    """Collapse per-event session numbers to per-session rows:
    (key, session_no, n_events, session_start, session_end)."""
    return sessions.groupBy(key_col, "session_no").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )
