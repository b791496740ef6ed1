"""Top-k-per-group with skew-safe two-phase evaluation.

Reference shape: keep-newest-10-logs-per-scraper
(/root/reference/my_logger/cleanup.py:64-75) and the per-domain
fetch-batch cap.  A single window over a skewed group key (the
mega-host holds ~30% of the frontier) funnels that key's rows through
one task; the two-phase form first takes a salted per-(group, salt)
top-k — map-side, parallel across ``salt_buckets`` tasks — then the
exact top-k over the ≤ salt_buckets·k survivors.  Results are
identical because any global top-k row is necessarily a top-k row of
its salt bucket.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: Column | int,
    salt_buckets: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Rows ranking ≤ k within each group under ``order_cols``.

    ``k`` may be a per-row Column (e.g. a per-domain politeness cap —
    it must be constant within a group) or a plain int.  ``salt_on``
    names a high-cardinality column used to derive the salt; when
    omitted, the salt is derived from the first order column that is a
    plain expression (sort-order wrappers like ``F.desc(...)`` cannot
    be cast/hashed — Spark fails codegen on them), and if every order
    column is a sort-order expression, ``salt_on`` is required.
    """
    k_col = F.lit(k) if isinstance(k, int) else k
    df = df.withColumn("__k", k_col)

    if salt_on:
        salt_src = F.col(salt_on)
    else:
        def _is_sort_order(c: Column) -> bool:
            s = c._jc.toString() if hasattr(c, "_jc") else str(c)
            # Spark Connect has no _jc; str(Column) renders as
            # "Column<'x DESC NULLS LAST'>" — strip the wrapper so the
            # suffix test still recognizes sort-order expressions there.
            m = re.fullmatch(r"Column<'(.*)'>", s, flags=re.DOTALL)
            if m:
                s = m.group(1)
            return s.endswith("NULLS FIRST") or s.endswith("NULLS LAST")

        plain = [c for c in order_cols if not _is_sort_order(c)]
        if not plain:
            raise ValueError(
                "topk_per_group: every order column is a sort-order "
                "expression; pass salt_on=<column name> to derive the salt"
            )
        salt_src = plain[0].cast("string")
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(salt_src), F.lit(salt_buckets)))

    w1 = Window.partitionBy(*group_cols, "__salt").orderBy(*order_cols)
    phase1 = (
        salted.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= F.col("__k"))
        .drop("__rn", "__salt")
    )

    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        phase1.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= F.col("__k"))
        .drop("__rn", "__k")
    )


def global_row_number(
    df: DataFrame,
    order_exprs: list[Column],
    out_col: str = "__grn",
) -> DataFrame:
    """Global 1-based row_number under ``order_exprs`` WITHOUT a
    single-partition window (round 5, VERDICT r04 #6): range-partition
    on the order keys, row_number within each partition in parallel,
    then add collected per-partition count offsets — the only driver
    data is one count per partition (the suffix array's dense-rank
    discipline, generalized to non-distinct rows).

    ``order_exprs`` must define a TOTAL order (pass a tiebreak column)
    for the result to be deterministic.  The input is pinned with an
    eager localCheckpoint so the partition layout the offsets were
    measured on is the one the window runs over.

    EAGER (ADVICE r05): calling this runs Spark jobs immediately (the
    checkpoint + one count per partition) — callers construct it at
    action time, not plan-build time.  The returned DataFrame carries
    the pinned intermediate as ``._graft_pinned``; long-lived sessions
    that materialize the result and keep going should call
    ``result._graft_pinned.unpersist()`` to release the checkpointed
    blocks (one-shot query paths can leave it to the context cleaner).
    """
    srt = (
        df.repartitionByRange(*order_exprs)
        .sortWithinPartitions(*order_exprs)
        .withColumn("__pid", F.spark_partition_id())
    )
    srt = srt.localCheckpoint(eager=True)
    counts = sorted(
        (r["__pid"], r["cnt"])
        for r in srt.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    )
    offsets, acc = [], 0
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    spark = df.sparkSession
    off = spark.createDataFrame(offsets or [], "__pid int, __off long")
    w = Window.partitionBy("__pid").orderBy(*order_exprs)
    out = (
        srt.withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(off), "__pid")
        .withColumn(out_col, (F.col("__off") + F.col("__rn")).cast("long"))
        .drop("__pid", "__rn", "__off")
    )
    out._graft_pinned = srt  # caller-managed release (see docstring)
    return out
