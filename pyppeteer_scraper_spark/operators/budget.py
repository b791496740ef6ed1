"""Max-min-fair crawl-budget allocation ("water-filling") — split a
global per-round fetch budget across hosts so no host is starved and
no budget is wasted: every host gets ``min(demand, level)`` where the
water level is the largest L with ``sum(min(demand, L)) <= budget``,
and the leftover ``budget - sum`` is handed out as +1s in a
deterministic order.

Reference analog: the reference caps ONE host at a fixed daily number
(MAX_REGISTER_PER_DAY, /root/reference/service/alert.py) — a
single-tenant special case.  A frontier with 10^7 pending hosts needs
the general allocation, and max-min fairness is the standard choice
(it is what per-host token buckets converge to under contention).

Scale shape — the naive closed form sorts hosts by demand and runs a
prefix-sum window: a GLOBAL sort + single-partition window, the
classic scale trap.  Instead, ``sum(min(d, L))`` is monotone in L, so
the level is found by DISTRIBUTED BINARY SEARCH: O(log2(max_demand))
tiny aggregate jobs over the (host, demand) table, each a map-side
partial sum — no global sort, no wide window, any table size.  Only
the remainder +1s need an order, and only over hosts still unsatisfied
at the level boundary; the implementation bounds that window to the
boundary cohort (demand > L), orders of magnitude smaller than the
host table (for a skew-proof form, rank the cohort with the salted
two-phase top-k in operators/topk.py).

All arithmetic is integer (exact division/remainder), so the
allocation is bit-identical to the sort-based closed form — the DuckDB
oracle derives it INDEPENDENTLY via the prefix-sum window, making the
driver check a true two-implementation cross-check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def maxmin_fair_allocation(
    demands: DataFrame,
    budget: int,
    host_col: str = "host",
    demand_col: str = "demand",
    caches: list | None = None,
) -> DataFrame:
    """Allocate ``budget`` units across hosts max-min fairly.

    Input: one row per host with an integer demand ≥ 0.  Output:
    (host_col, demand, alloc) with
      - alloc = demand for every host whose full demand fits,
      - alloc = L or L+1 for the rest, +1s going to the first
        ``remainder`` unsatisfied hosts in (demand, host) order,
      - sum(alloc) = min(budget, sum(demand)), alloc <= demand always.
    """
    demands = demands.select(
        F.col(host_col), F.col(demand_col).cast("long").alias(demand_col)
    ).cache()
    if caches is not None:
        # per-round callers (run_round) sweep this at round end — the
        # same contract as bloom.anti_join_with_filter's `caches`
        caches.append(demands)
    stats = demands.agg(
        F.coalesce(F.max(demand_col), F.lit(0)).alias("mx"),
        F.coalesce(F.sum(demand_col), F.lit(0)).alias("total"),
    ).collect()[0]
    mx, total = int(stats["mx"]), int(stats["total"])

    if total <= budget:
        # Budget covers everyone — no level, no remainder.
        return demands.withColumn("alloc", F.col(demand_col))

    # Largest L with sum(min(d, L)) <= budget: monotone → binary search,
    # ~log2(max_demand) aggregate jobs over the cached demand table.
    lo, hi = 0, mx
    while lo < hi:
        mid = (lo + hi + 1) // 2
        served = int(
            demands.agg(
                F.sum(F.least(F.col(demand_col), F.lit(mid)))
            ).collect()[0][0]
        )
        if served <= budget:
            lo = mid
        else:
            hi = mid - 1
    level = lo
    served_at_level = int(
        demands.agg(
            F.sum(F.least(F.col(demand_col), F.lit(level)))
        ).collect()[0][0]
    )
    remainder = budget - served_at_level  # < #unsatisfied by maximality

    # +1 bonuses: first `remainder` hosts with demand > level, in
    # (demand, host) order.  The sorted window runs over the boundary
    # cohort ONLY (pre-filtered), never the full host table.
    cohort = Window.orderBy(F.col(demand_col), F.col(host_col))
    satisfied = demands.filter(F.col(demand_col) <= level).withColumn(
        "alloc", F.col(demand_col)
    )
    boundary = (
        demands.filter(F.col(demand_col) > level)
        .withColumn("__rk", F.row_number().over(cohort))
        .withColumn(
            "alloc",
            (
                F.lit(level)
                + F.when(F.col("__rk") <= remainder, F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).cast("long"),
        )
        .drop("__rk")
    )
    return satisfied.unionByName(boundary)


def apply_global_budget(
    batch: DataFrame,
    budget: int,
    domain_col: str = "domain",
    order_cols: tuple = ("priority", "depth", "discovered_ts", "url"),
    caches: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Trim a politeness-capped fetch batch to a GLOBAL per-round
    budget, max-min fairly across domains (crawl(global_budget=...)).

    Per-domain politeness caps bound each HOST's round share; a real
    deployment also has a hard round-level capacity (fetcher fleet
    bandwidth).  Taking the global top-N by priority would starve
    whole domains behind one hot one; water-filling gives every domain
    min(its politeness-capped demand, level) — fair AND work-conserving.

    Returns (kept, cut): ``kept`` is the budgeted batch, ``cut`` rows
    must return to the pending pool (they were schedulable, just not
    funded this round).  Within a domain the keep order is the
    politeness total order, so the cut rows are exactly the lowest-
    priority tail.  The per-domain rank window partitions by domain
    over the ALREADY politeness-capped batch (≤ cap rows each), never
    the raw frontier.  Cost: the level binary search adds
    O(log2 max_demand) tiny aggregate jobs per round over the cached
    per-domain counts.
    """
    demands = batch.groupBy(domain_col).agg(F.count("*").alias("demand"))
    alloc = maxmin_fair_allocation(
        demands, budget, host_col=domain_col, caches=caches
    )
    w = Window.partitionBy(domain_col).orderBy(
        *[F.col(c) for c in order_cols]
    )
    ranked = batch.withColumn("__grk", F.row_number().over(w)).join(
        alloc.select(domain_col, "alloc"), domain_col
    )
    kept = ranked.filter(F.col("__grk") <= F.col("alloc")).drop(
        "__grk", "alloc"
    )
    cut = ranked.filter(F.col("__grk") > F.col("alloc")).drop(
        "__grk", "alloc"
    )
    return kept, cut


def adaptive_crawl_delay(
    outcomes: "DataFrame",
    n_rounds: int = 6,
    host_col: str = "host",
    round_col: str = "round",
    error_col: str = "is_error",
    init_ms: int = 500,
    min_ms: int = 100,
    max_ms: int = 5000,
    err_threshold: float = 0.15,
    decrease_ms: int = 100,
) -> "DataFrame":
    """AIMD politeness adaptation (the TCP congestion-control shape,
    applied per host): after each crawl round, a host whose error
    rate (429/5xx) exceeded ``err_threshold`` gets its crawl delay
    DOUBLED (multiplicative backoff, capped at ``max_ms``); a clean
    round earns an additive ``decrease_ms`` speed-up (floored at
    ``min_ms``).  The reference hardcodes per-site delays
    (/root/reference/scraper/costco.py sleep loops); a web-scale
    crawler must learn them per host from its own fetch outcomes.

    ``outcomes``: one row per fetch with (host, round, is_error).
    Returns (host, delay_ms, n_backoff, n_speedup) after folding
    rounds 0..n_rounds-1 in order.

    Scale shape: one groupBy(host, round) count aggregation, then one
    groupBy(host) building a round->err_rate map, then the fold runs
    as a JVM ``aggregate`` over sequence(0, n-1) — pure codegen, one
    shuffle keyed by host, no window, no driver loop.  Integer state
    only, so results are bit-exact across engines.
    """
    rates = (
        outcomes.groupBy(
            F.col(host_col).alias("host"),
            F.col(round_col).cast("long").alias("round"),
        )
        .agg(
            (
                F.sum(F.col(error_col).cast("long"))
                / F.count("*")
            ).alias("err_rate")
        )
        .groupBy("host")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("round", "err_rate"))
            ).alias("rates")
        )
    )
    zero = F.struct(
        F.lit(init_ms).cast("long").alias("delay"),
        F.lit(0).cast("long").alias("nb"),
        F.lit(0).cast("long").alias("ns"),
    )

    def step(acc, i):
        er = F.coalesce(
            F.element_at(F.col("rates"), i.cast("long")), F.lit(0.0)
        )
        backoff = er > err_threshold
        new_delay = F.when(
            backoff, F.least(acc["delay"] * 2, F.lit(max_ms).cast("long"))
        ).otherwise(
            F.greatest(acc["delay"] - decrease_ms, F.lit(min_ms).cast("long"))
        )
        return F.struct(
            new_delay.alias("delay"),
            (acc["nb"] + backoff.cast("long")).alias("nb"),
            (acc["ns"] + (~backoff).cast("long")).alias("ns"),
        )

    folded = F.aggregate(
        F.sequence(F.lit(0), F.lit(n_rounds - 1)), zero, step
    )
    return rates.select(
        "host",
        folded["delay"].alias("delay_ms"),
        folded["nb"].alias("n_backoff"),
        folded["ns"].alias("n_speedup"),
    )
