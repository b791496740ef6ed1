"""Frontier priority aging — starvation-freedom for the politeness
top-k.

``select_batch`` (plans/round.py) takes each over-cap domain's best
``cap`` rows under a static total order, so a URL whose priority is
worse than the domain's steady-state inflow is never scheduled — on a
mega-host the tail can starve for the crawl's whole lifetime.  The
classic fix (e.g. Heritrix's cost-based queue rotation, UbiCrawler's
round-robin guarantee) is aging: a pending URL's *effective* priority
improves by one level every ``boost_every`` rounds it waits, so any
URL's rank eventually beats any finite static priority — scheduling is
guaranteed in bounded rounds (priority_gap × boost_every + cap slack).

Kept OUT of the default crawl path on purpose: crawl parity with the
reference (tests/test_parity.py) pins the static order; aging is the
opt-in composition below.  Everything is codegen arithmetic plus the
same skew-safe two-phase top-k the politeness cap uses — aging adds
ZERO new shuffles (the effective priority is a projection feeding the
identical window plan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyppeteer_scraper_spark.operators.topk import topk_per_group


def aged_priority(
    priority: Column,
    discovered_round: Column,
    round_no: int,
    boost_every: int = 4,
) -> Column:
    """Effective priority after aging (lower = scheduled first):
    ``priority - floor((round_no - discovered_round) / boost_every)``.
    """
    age = F.lit(round_no) - discovered_round
    return (priority - F.floor(age / F.lit(boost_every))).cast("long")


def select_batch_aged(
    pending: DataFrame,
    cap: int,
    round_no: int,
    boost_every: int = 4,
    priority_col: str = "priority",
    discovered_col: str = "discovered_round",
    domain_col: str = "domain",
    url_col: str = "url",
) -> DataFrame:
    """Per-domain top-``cap`` under the AGED order — the drop-in
    anti-starvation variant of the politeness selection.  Same
    two-phase salted top-k as select_batch (mega-host rows spread
    across salt buckets; only ≤ 16·cap survivors reach the exact
    rank), with the aged priority as a pure projection."""
    aged = pending.withColumn(
        "__aged",
        aged_priority(
            F.col(priority_col), F.col(discovered_col), round_no, boost_every
        ),
    )
    return topk_per_group(
        aged,
        [domain_col],
        [F.col("__aged"), F.col(url_col)],
        cap,
        salt_on=url_col,
    ).withColumnRenamed("__aged", "aged_priority")
