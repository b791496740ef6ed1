"""HyperLogLog distinct-count sketch in exact relational form.

The register table of an HLL sketch is a *deterministic* function of
the input set — bucket = high bits of a hash, register = max over the
bucket of (1 + leading-zero count of the low bits).  Computing it as
``groupBy(bucket).agg(max(rho))`` gives a mergeable, shuffle-tiny
(m rows of 2 ints) distinct-count sketch with exactly the semantics
of the streaming original (Flajolet et al., AofA 2007), and — unlike
library HLLs — every intermediate is SQL-checkable, so the register
table itself can be oracled hash-exact against an independent engine.

Merge across partitions/shards/days is ``max`` per bucket — the same
aggregation — which is why this is the 100-TB shape: per-shard
register tables roll up without touching raw data again.

Scale notes: one map-side-combinable aggregation over the corpus; the
shuffle carries at most m rows per mapper.  The estimator runs over m
rows — driver-scale math.  Hash = first 48 bits of md5 (engine-
portable); p bucket bits from the top, w = 48 - p rho bits below.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_registers(
    df: DataFrame, col: str, p: int = 8
) -> DataFrame:
    """Exact HLL register table over ``df[col]``: (bucket, rho) with
    2**p rows at most — buckets never hit by a hash are absent (their
    register is implicitly 0; ``hll_estimate`` accounts for them).

    rho is 1 + the number of leading zeros of the (48-p)-bit suffix,
    computed portably as ``w_bits - bit_length(w) + 1`` via the
    unpadded ``bin()`` string both Spark and DuckDB share.
    """
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    w_bits = 48 - p
    h = F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 12), 16, 10).cast(
        "long"
    )
    bucket = (h / F.lit(2**w_bits)).cast("long")
    w = h % F.lit(2**w_bits)
    rho = F.when(w == 0, F.lit(w_bits + 1)).otherwise(
        F.lit(w_bits) - F.length(F.bin(w)) + 1
    )
    return (
        df.select(bucket.alias("bucket"), rho.cast("int").alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def merge_registers(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two register tables into one — max per bucket.  This is
    the whole merge story: per-shard sketches roll up associatively."""
    return (
        a.unionByName(b)
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame, p: int = 8) -> float:
    """HLL cardinality estimate from a register table, with the
    standard small-range (linear counting) correction.  Collects m
    rows — driver-scale arithmetic, exact powers of two so the sum is
    order-independent bit-for-bit."""
    m = 2**p
    rows = registers.collect()
    filled = {r["bucket"]: r["rho"] for r in rows}
    zeros = m - len(filled)
    s = zeros * 1.0 + sum(2.0 ** -rho for rho in filled.values())
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / s
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    return est
