"""HyperBall: per-node neighborhood-function sketches over a link
graph (Boldi & Vigna, "In-Core Computation of Geometric Centralities
with HyperBall", 2013 — the algorithm behind the Facebook/Common-Crawl
"degrees of separation" measurements).

Each node carries an HLL register table of the set of nodes reachable
from it within t hops; one HyperBall round merges every node's sketch
with its out-neighbors' sketches.  Because the register table of an
HLL sketch is a *deterministic* function of the underlying set (see
operators/hll.py), the whole iteration is exactly checkable: an oracle
can compute the true distance-<=t ball by unrolled BFS joins and
derive the identical registers with the same md5 hash layout.

Per-node ball sizes at increasing t yield the neighborhood function
N(v, t) and from it harmonic/closeness centrality estimates — the
principled way to get centrality at web scale, where exact all-pairs
BFS is impossible but per-node O(2^p)-byte sketches stream through
one equi-join per round.

Scale shape: state is (node, bucket, rho) — at most 2^p rows per node,
in practice min(|ball|, 2^p).  One round = one equi-join of the edge
list against the register table on dst (shuffle keyed by node id,
rows of 3 ints) + a map-side-combinable groupBy(node, bucket) max.
No all-pairs, no driver collect; lineage is truncated every
``checkpoint_every`` rounds (see ``hyperball``).  Mega-hub skew: a
hub's registers replicate to each
in-neighbor — bounded by 2^p rows per edge, the same cost model as
the published algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def node_registers(nodes: DataFrame, col: str = "node", p: int = 8) -> DataFrame:
    """Singleton-set HLL registers for each node id: (node, bucket,
    rho) with exactly one row per node.  Hash layout identical to
    operators/hll.py::hll_registers (48-bit md5 prefix; p bucket bits
    high, 48-p rho bits low) so oracles share the expression."""
    w_bits = 48 - p
    h = F.conv(
        F.substring(F.md5(F.col(col).cast("string")), 1, 12), 16, 10
    ).cast("long")
    w = h % F.lit(2**w_bits)
    return nodes.select(
        F.col(col).alias("node"),
        (h / F.lit(2**w_bits)).cast("long").alias("bucket"),
        F.when(w == 0, F.lit(w_bits + 1))
        .otherwise(F.lit(w_bits) - F.length(F.bin(w)) + 1)
        .cast("int")
        .alias("rho"),
    )


def hyperball(
    edges: DataFrame,
    t: int = 2,
    p: int = 8,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 2,
) -> DataFrame:
    """Run t HyperBall rounds over directed ``edges``; returns the
    register table (node, bucket, rho) of each node's distance-<=t
    OUT-ball (self included at t=0).  Deterministic — fixed rounds,
    md5-derived registers, max-merge only.

    Lineage is truncated every ``checkpoint_every`` rounds: an
    unmaterialized round references ``regs`` twice (identity branch +
    propagation join), fanning lineage ~2x/round — bounded at
    2^checkpoint_every — while an EAGER per-round localCheckpoint
    costs one full job each, which dominates wall time at small and
    medium graph sizes."""
    # localCheckpoint (eager), not cache(): the node-set union and the
    # per-round propagation joins branch off `e` concurrently, and a
    # lazy cache races — both branches recompute the upstream edge
    # derivation (e.g. the window over raw events) in parallel before
    # either populates the cache.  One eager materialization makes
    # every branch read the 16-byte edge rows.
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    regs = node_registers(nodes, "node", p).localCheckpoint()
    for r in range(t):
        prop = (
            e.join(regs.withColumnRenamed("node", "dst"), "dst")
            .select(F.col("src").alias("node"), "bucket", "rho")
        )
        regs = (
            regs.unionByName(prop)
            .groupBy("node", "bucket")
            .agg(F.max("rho").alias("rho"))
        )
        if (r + 1) % checkpoint_every == 0 and r + 1 < t:
            regs = regs.localCheckpoint()
    return regs


def ball_summary(regs: DataFrame, p: int = 8) -> DataFrame:
    """Per-node sketch summary: (node, n_filled, sum_rho, frac).
    ``frac`` = sum of 2^-rho over filled buckets — every term is an
    exact power of two >= 2^-(48-p+1), so the double sum is EXACT and
    order-independent (the estimator's only data-dependent part);
    with n_filled it determines the linear-counting/raw HLL estimate,
    which stays driver/pytest-side (see operators/hll.py::
    hll_estimate) to keep the oracled output transcendental-free."""
    return regs.groupBy("node").agg(
        F.count("*").cast("long").alias("n_filled"),
        F.sum("rho").cast("long").alias("sum_rho"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("frac"),
    )


def ball_estimate(summary: DataFrame, p: int = 8) -> DataFrame:
    """Per-node HLL cardinality estimate from ``ball_summary`` rows:
    (node, est).  Same estimator as operators/hll.py::hll_estimate
    (raw alpha*m^2/s with linear-counting small-range correction) but
    evaluated as one distributed projection — no driver collect, so it
    scales to 10^10 nodes.  Estimates are approximate by construction;
    accuracy is pytest-pinned (the register tables they derive from
    are the oracled artifact)."""
    m = float(2**p)
    alpha = 0.7213 / (1 + 1.079 / m)
    zeros = F.lit(m) - F.col("n_filled")
    s = zeros + F.col("frac")
    raw = F.lit(alpha * m * m) / s
    lin = F.lit(m) * F.log(F.lit(m) / zeros)
    return summary.select(
        "node",
        F.when((raw <= 2.5 * m) & (zeros > 0), lin).otherwise(raw).alias(
            "est"
        ),
    )


def harmonic_estimates(
    edges: DataFrame,
    t_max: int = 3,
    p: int = 8,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Harmonic centrality estimates from HyperBall sketches — the
    published purpose of the algorithm (Boldi & Vigna 2013 §3:
    H(v) = sum over t of (N(v,t) - N(v,t-1)) / t, with N from the
    per-node HLL counters).  Runs hyperball at t = 1..t_max (each run
    extends the previous ball by one merge round conceptually; here
    each t reruns from scratch for clarity — t_max is small) and sums
    the per-shell estimate differences.

    Returns (node, harmonic).  Approximate by construction (HLL
    estimator); the underlying registers are exactly checkable, and
    accuracy is pytest-pinned against exact BFS harmonic centrality
    on known graphs.  All arithmetic is a per-node projection + one
    t_max-way join on node — no collect, no all-pairs."""
    out = None
    for t in range(1, t_max + 1):
        est = ball_estimate(
            ball_summary(hyperball(edges, t=t, p=p, src=src, dst=dst), p),
            p,
        ).withColumnRenamed("est", f"n{t}")
        out = est if out is None else out.join(est, "node")
    expr = None
    for t in range(1, t_max + 1):
        lo = F.lit(1.0) if t == 1 else F.col(f"n{t - 1}")
        shell = (F.col(f"n{t}") - lo) / F.lit(float(t))
        expr = shell if expr is None else expr + shell
    return out.select("node", F.greatest(expr, F.lit(0.0)).alias("harmonic"))
