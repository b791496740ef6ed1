"""Crawl-trap detection — flag URL patterns that explode without bound
(calendar pages, session-id permutations, faceted-search grids) so the
frontier stops feeding budget into them.

A "trap" is a (domain, normalized-path-pattern) whose DISTINCT-URL count
exceeds a threshold: infinitely many URLs, one template.  The classic
crawler defense (Heritrix's path-repetition rules, IRLbot's spam/trap
budgeting, Olston & Najork 2010 §2.3.3) re-expressed as one aggregate:

    pattern  = path with every digit run collapsed to 'N'
    traps    = groupBy(domain, pattern) having count(DISTINCT path) >= k

Scale shape: the groupBy keys on (domain, pattern) — cardinality is the
number of URL *templates*, orders of magnitude below the URL count, and
the digit-collapse is a codegen `regexp_replace` (no Python, no
shuffle beyond the one aggregate; partial aggregation absorbs the
per-URL fan-in map-side).  The trap list that comes back is tiny next
to the frontier, so the demotion join follows the same unhinted-AQE
policy as `reprioritize_frontier`/`demote_low_quality_domains`.

The reference never needed this (it crawls a fixed URL list), but its
politeness cap (`docs/CRON_SCHEDULE_RECOMMENDATIONS.md:20-55`) is the
same idea one level up: bound the budget any one source can consume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: digit runs collapse to one token — '/cal/2024-05-17' and
#: '/cal/2024-05-18' are the same template '/cal/N-N-N'.
_DIGITS = "[0-9]+"


def url_pattern(path_col) -> "F.Column":
    """Normalized path template: digit runs -> 'N'."""
    return F.regexp_replace(path_col, _DIGITS, "N")


def strip_scheme_host(url_col) -> "F.Column":
    """Path+query of a URL (everything after the authority)."""
    return F.regexp_replace(url_col, r"^[a-z][a-z0-9+.-]*://[^/]*", "")


def trap_patterns(
    urls: DataFrame,
    domain_col: str = "domain",
    path_col: str = "path",
    min_distinct_urls: int = 100,
) -> DataFrame:
    """Per-(domain, pattern) URL-template stats with the trap verdict:
    (domain, pattern, n_urls, n_hits, is_trap:int).

    ``n_urls`` counts distinct paths under the template (the explosion
    signal); ``n_hits`` counts rows (frequency, kept for prioritizing
    which traps to block first).  Exact distinct is fine here: the
    aggregate's key space is templates, so the distinct shuffle carries
    (domain, pattern, path) — already deduplicated map-side.
    """
    pat = url_pattern(F.col(path_col))
    return (
        urls.select(
            F.col(domain_col).alias("domain"),
            pat.alias("pattern"),
            F.col(path_col).alias("__path"),
        )
        .groupBy("domain", "pattern")
        .agg(
            F.countDistinct("__path").alias("n_urls"),
            F.count("*").alias("n_hits"),
        )
        .withColumn(
            "is_trap",
            (F.col("n_urls") >= F.lit(min_distinct_urls)).cast("int"),
        )
    )


def demote_trap_urls(
    frontier: DataFrame,
    traps: DataFrame,
    demoted_priority: int = 3,
) -> DataFrame:
    """Demote pending frontier rows whose (domain, path-template) is a
    flagged trap to (at least) ``demoted_priority`` — mirror of
    `demote_low_quality_domains`: only `priority` moves, only downward
    in urgency (numerically up), fetched/blocked rows untouched.

    The join key is derived from ``frontier.url`` with the same
    codegen normalization used to build the trap table, so no extra
    columns need to exist in the frontier schema.
    """
    trap_side = traps.filter(F.col("is_trap") == 1).select(
        "domain", "pattern", F.lit(True).alias("__trap")
    )
    keyed = frontier.withColumn(
        "__pattern", url_pattern(strip_scheme_host(F.col("url")))
    )
    out = keyed.join(
        trap_side,
        (keyed["domain"] == trap_side["domain"])
        & (keyed["__pattern"] == trap_side["pattern"]),
        "left",
    ).drop(trap_side["domain"])
    demote = (F.col("state") == "pending") & F.coalesce(
        F.col("__trap"), F.lit(False)
    )
    return (
        out.withColumn(
            "priority",
            F.when(
                demote, F.greatest(F.col("priority"), F.lit(demoted_priority))
            ).otherwise(F.col("priority")),
        )
        .drop("__trap", "__pattern", "pattern")
    )


def param_entropy(
    urls: "DataFrame",
    url_col: str = "url",
    threshold: float = 4.0,
) -> "DataFrame":
    """Per-(host, parameter) Shannon entropy of observed parameter
    VALUES — the classic session-id / calendar-trap signal: a
    parameter whose values are near-unique per URL (entropy ~
    ln(n_urls)) generates unbounded URL spaces and should be stripped
    or demoted before scheduling, complementing ``trap_patterns``
    (which keys on path shape, not query strings).

    Returns (host, param, n_values, entropy, trap) where entropy =
    -sum p ln p over the value distribution and trap = entropy >
    ``threshold`` (ln(55) ~ 4.0: more than ~55 effective values).

    Scale shape: explode query params once, two map-side-combinable
    aggregations ((host,param,value) counts -> per-(host,param)
    entropy); no window, no driver data.
    """
    host = F.regexp_extract(F.col(url_col), r"^[a-z]+://([^/?]*)", 1)
    qs = F.regexp_extract(F.col(url_col), r"\?(.*)$", 1)
    kv = urls.filter(qs != "").select(
        host.alias("host"),
        F.explode(F.split(qs, "&")).alias("pair"),
    ).select(
        "host",
        F.split(F.col("pair"), "=").getItem(0).alias("param"),
        F.split(F.col("pair"), "=").getItem(1).alias("value"),
    )
    counts = kv.groupBy("host", "param", "value").agg(
        F.count("*").alias("c")
    )
    return (
        counts.groupBy("host", "param")
        .agg(
            F.count("*").cast("long").alias("n_values"),
            # H = ln(N) - (1/N) * sum(c * ln c): one pass, no p column
            F.sum("c").alias("n_obs"),
            F.sum(F.col("c") * F.log(F.col("c"))).alias("clogc"),
        )
        .select(
            "host",
            "param",
            "n_values",
            F.round(
                F.log(F.col("n_obs")) - F.col("clogc") / F.col("n_obs"), 6
            ).alias("entropy"),
        )
        .withColumn("trap", F.col("entropy") > threshold)
    )
