"""Host-level quality prior — close the loop from the content model
back into the crawl scheduler: domains whose fetched pages score low on
the quality classifier get demoted in the frontier, so budget flows
toward hosts that historically yield good documents (the
quality-focused crawling policy of CCNet/RefinedWeb-style pipelines;
the link-graph analog is operators/linkrank.py).

Domain quality is the gram-weighted model score over every page fetched
from the domain: ``sigmoid(sum(score_raw) / (sum(n_grams) * 1000))``.
Both sums are exact integers (functions/classifier.py keeps the dot
product integral), so the per-domain aggregate is order-independent and
exactly oracle-able — no float-accumulation drift however many
partitions contribute.  One groupBy(domain) shuffle over page scores;
the frontier join mirrors ``reprioritize_frontier``: only the
cold-domain build side joins, only ``priority`` moves, and only UPWARD
(a demotion can never promote).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyppeteer_scraper_spark.functions.classifier import (
    quality_model_score,
    quality_model_scored,
)


def domain_quality(
    pages: DataFrame,
    domain_col: str = "domain",
    text_col: str = "text",
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-domain quality from page text: (domain, n_docs, quality).

    ``quality`` is the logistic of the exact integer gram-score sum,
    rounded to 6 dp — identical whatever the partitioning, matching the
    DuckDB oracle bit-for-bit.
    """
    if hash_fn == "md5":
        # staged projections (round 6): score_raw and n_grams share the
        # tokenize/gram subtree, which the Column form re-evaluated per
        # output (classifier.quality_model_scored)
        scored = quality_model_scored(
            pages.select(F.col(domain_col).alias("domain"), F.col(text_col)),
            text_col=text_col,
            carry=("domain",),
        ).select(
            "domain",
            F.col("score_raw").alias("__raw"),
            F.col("n_grams").alias("__n"),
        )
    else:
        cols = quality_model_score(F.col(text_col), hash_fn=hash_fn)
        scored = pages.select(
            F.col(domain_col).alias("domain"),
            cols["score_raw"].alias("__raw"),
            cols["n_grams"].alias("__n"),
        )
    agg = (
        scored
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__raw").alias("__sraw"),
            F.sum("__n").alias("__sn"),
        )
    )
    x = F.col("__sraw").cast("double") / (
        F.col("__sn").cast("double") * F.lit(1000.0)
    )
    quality = F.when(
        F.col("__sn") > 0, F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-x)), 6)
    ).otherwise(F.lit(0.5))
    return agg.select("domain", "n_docs", quality.alias("quality"))


def demote_low_quality_domains(
    frontier: DataFrame,
    quality: DataFrame,
    demote_frac: float = 0.25,
    demoted_priority: int = 3,
    exact: bool = False,
) -> DataFrame:
    """Demote pending frontier rows on domains in the bottom
    ``demote_frac`` of the quality distribution to (at least)
    ``demoted_priority``.

    The threshold is ONE scalar to the driver — ``percentile_approx``
    by default (a sketch pass over the domain aggregate, which is
    already tiny next to the frontier); ``exact=True`` uses the exact
    interpolated percentile for oracle-checkable runs.  Fetched/blocked
    rows and above-threshold domains pass through untouched; ties at
    the threshold are NOT demoted (strict ``<``, deterministic).
    """
    pfn = "percentile" if exact else "percentile_approx"
    thr = quality.agg(
        F.expr(f"{pfn}(quality, {demote_frac})").alias("t")
    ).collect()[0]["t"]
    cold = quality.filter(F.col("quality") < F.lit(thr)).select(
        "domain", F.lit(True).alias("__cold")
    )
    # Unhinted join, same policy as reprioritize_frontier: cold is a
    # fraction of the domain set — small in practice, unbounded in
    # principle; AQE's runtime size check owns the broadcast decision.
    out = frontier.join(cold, "domain", "left")
    demote = (F.col("state") == "pending") & F.coalesce(
        F.col("__cold"), F.lit(False)
    )
    return out.withColumn(
        "priority",
        F.when(
            demote, F.greatest(F.col("priority"), F.lit(demoted_priority))
        ).otherwise(F.col("priority")),
    ).drop("__cold")


def fetch_rate_anomalies(
    fetches: "DataFrame",
    host_col: str = "host",
    ts_col: str = "ts",
    z_threshold: float = 2.0,
) -> "DataFrame":
    """Per-host fetch-rate anomaly detection: bucket fetches by hour,
    z-score each (host, hour) count against that host's own
    mean/stddev across hours, flag |z| > ``z_threshold``.  Crawl ops
    use: a host whose fetch rate spikes is usually a trap/loop the
    scheduler is stuck in; one that collapses is being throttled —
    both want the politeness controller's attention before the next
    round.

    Returns (host, hour, n_fetches, z, anomaly).  Hosts with a single
    observed hour (stddev undefined) or zero variance report z = NULL
    and anomaly = false rather than dividing by zero.

    Scale shape: two map-side-combinable aggregations plus one
    broadcast-size join back on host (hosts << fetches); no window
    over raw rows.
    """
    counts = fetches.groupBy(
        F.col(host_col).alias("host"),
        F.date_trunc("hour", F.col(ts_col)).alias("hour"),
    ).agg(F.count("*").cast("long").alias("n_fetches"))
    stats = counts.groupBy("host").agg(
        F.avg("n_fetches").alias("mu"),
        F.stddev_samp("n_fetches").alias("sigma"),
    )
    z = F.when(
        F.col("sigma") > 0, (F.col("n_fetches") - F.col("mu")) / F.col("sigma")
    )
    return (
        counts.join(stats, "host")
        .select(
            "host",
            "hour",
            "n_fetches",
            F.round(z, 4).alias("z"),
            F.coalesce(F.abs(z) > z_threshold, F.lit(False)).alias("anomaly"),
        )
    )


def gini_concentration(
    df: DataFrame,
    group_col: str = "host",
    weight_col: str | None = None,
) -> DataFrame:
    """Gini coefficient of per-group mass — THE crawl-skew scalar: how
    concentrated URL/byte mass is across hosts (0 = perfectly even,
    →1 = one mega-host owns the crawl).  This is the number that
    decides whether the skew machinery (salted top-k, AQE skew join,
    per-host caps) is load-bearing on a given corpus, and the one to
    alert on when a trap inflates a single host.

    Standard rank formula over ascending mass x_1 ≤ … ≤ x_n:
    G = 2·Σ(i·x_i) / (n·Σx) − (n+1)/n.  Ties are rank-order-invariant
    (equal x with consecutive i contribute the same Σ i·x_i under any
    tie order), so the result is deterministic without a tiebreak.

    One groupBy over hosts, then ranks from the distributed
    range-partitioned row_number (``topk.global_row_number`` — round
    5: bounded by construction, no single-partition window even when
    the host table is 10^7 rows) and a final scalar aggregate.
    Returns a single row (n_groups, total, gini).
    """
    from pyppeteer_scraper_spark.operators.topk import global_row_number

    x = (
        F.count("*").alias("x")
        if weight_col is None
        else F.sum(weight_col).alias("x")
    )
    counts = df.groupBy(F.col(group_col).alias("g")).agg(x)
    ranked = global_row_number(
        counts, [F.col("x"), F.col("g")], out_col="i"
    ).select("x", "i")
    return ranked.agg(
        F.count("*").cast("long").alias("n_groups"),
        F.sum("x").cast("long").alias("total"),
        F.round(
            F.lit(2.0) * F.sum(F.col("i") * F.col("x"))
            / (F.count("*") * F.sum("x"))
            - (F.count("*") + F.lit(1.0)) / F.count("*"),
            6,
        ).alias("gini"),
    )
