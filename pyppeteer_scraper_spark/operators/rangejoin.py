"""Bucketed range join — points joined to covering intervals WITHOUT a
nested-loop plan.

Spark has no native band/range join: a plain ``ON ts BETWEEN start AND
end`` predicate has no equi-key, so Catalyst falls back to
BroadcastNestedLoopJoin (all-pairs against the broadcast side) — the
exact plan this repo's plan-quality gate bans.  The standard composition
(e.g. Databricks' range-join optimization, and the same trick the as-of
join's skew path uses, operators/asof.py) is:

1. quantize time into fixed-width buckets;
2. explode each interval to every bucket it overlaps (intervals/bucket
   width is bounded — a few rows per interval);
3. EQUI-join points to interval-buckets on the bucket id;
4. re-check the exact predicate to discard same-bucket non-overlaps.

A (point, interval) pair can match in at most one bucket — the point's
own — so no post-join dedup is needed.  The shuffle is hash(bucket):
co-partitioned, skew-safe up to hot buckets (pick ``bucket_micros`` ≈
median interval width so explode factor stays 2-3×; a hot bucket is a
hot time window and AQE skew-split applies).

Reference analog: none (single-site scrapers never join event streams);
this is the generalized form of the reference's date-window filtering
(/root/reference/scraper/canada_ircc.py:61-74 filters rows into a
hardcoded date range).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "ws",
    end_col: str = "we",
    bucket_micros: int = 21_600_000_000,  # 6 h
) -> DataFrame:
    """Inner-join ``points`` to the ``intervals`` rows whose
    [start, end) half-open window contains the point's timestamp.
    Returns points ⋈ intervals columns (bucket key dropped).
    """
    b = int(bucket_micros)
    # normalize TIMESTAMP_NTZ (parquet naive timestamps) to session-tz
    # TIMESTAMP: unix_micros rejects NTZ, and a mixed NTZ/LTZ compare
    # in the exact re-check would otherwise coerce implicitly.  The
    # session is pinned to UTC (session.py), so the cast is a pure
    # relabel — no wall-clock shift.
    p = points.withColumn(ts_col, F.col(ts_col).cast("timestamp")).withColumn(
        "__b", F.expr(f"unix_micros({ts_col}) div {b}")
    )
    iv = (
        intervals.withColumn(start_col, F.col(start_col).cast("timestamp"))
        .withColumn(end_col, F.col(end_col).cast("timestamp"))
        .withColumn(
            "__b",
            F.explode(
                F.sequence(
                    F.expr(f"unix_micros({start_col}) div {b}"),
                    F.expr(f"unix_micros({end_col}) div {b}"),
                )
            ),
        )
    )
    return (
        p.join(iv, "__b")
        .filter(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) < F.col(end_col))
        )
        .drop("__b")
    )
