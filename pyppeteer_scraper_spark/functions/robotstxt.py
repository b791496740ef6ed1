"""robots.txt parsing as a DataFrame job — the producer of the
broadcast rules table the frontier scheduler gates on.

The reference never parses robots.txt (single-site scrapers hard-code
their politeness, /root/reference/docs/CRON_SCHEDULE_RECOMMENDATIONS.md);
a web-scale crawler fetches ~one robots.txt per host and must turn
millions of them into the (domain, path, allow, crawl_delay) rules
table that `plans/round.py::select_batch` broadcasts.  This module does
that parse with built-ins only — split/posexplode for lines, a
lag-window for user-agent group runs, one shuffle by domain — so
parsing 10^8 robots files is a single bounded-skew pass (each window
partition is one domain's robots.txt: KBs).

Grammar handled (RFC 9309 + de-facto practice):
- case-insensitive directives; inline ``#`` comments; blank lines
- stacked ``User-agent:`` lines forming one group (a run of UA lines
  shares the rules that follow)
- values containing ``:`` (paths/URLs) — split on the FIRST colon only
- empty ``Disallow:`` (allow-everything) dropped rather than emitted
- ``Crawl-delay`` (seconds, fractional ok) → ms, max over the groups
  that match the requested agent
- groups are matched by exact agent token (lowercased); pass
  ``agent="*"`` for the wildcard group
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def parse_robots_rules(
    df: DataFrame,
    domain_col: str = "domain",
    text_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """Parse one robots.txt per row into per-path rules for ``agent``.

    Output: (domain, path, allow, crawl_delay_ms) — one row per
    Allow/Disallow line in every group whose user-agent set contains
    ``agent``; ``crawl_delay_ms`` is the domain-level max over matching
    groups (null if none declared).  Domains with no matching group
    produce no rows (crawler default: allow-all).
    """
    dom = F.col(domain_col)
    lines = df.select(
        dom.alias("domain"),
        # split is regex-based: accept CRLF and bare-LF files alike
        F.posexplode(F.split(F.col(text_col), "\r?\n")).alias("pos", "raw"),
    )
    cleaned = (
        lines.withColumn("line", F.trim(F.regexp_replace("raw", "#.*", "")))
        .filter((F.col("line") != "") & (F.instr("line", ":") > 0))
        .select(
            "domain",
            "pos",
            F.lower(F.trim(F.substring_index("line", ":", 1))).alias(
                "directive"
            ),
            F.trim(
                F.expr("substring(line, instr(line, ':') + 1)")
            ).alias("value"),
        )
    )
    w = Window.partitionBy("domain").orderBy("pos")
    is_ua = F.col("directive") == "user-agent"
    run_start = is_ua & (
        F.coalesce(F.lag("directive").over(w) != F.lit("user-agent"), F.lit(True))
    )
    grouped = cleaned.withColumn(
        "grp",
        F.sum(run_start.cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    matched = (
        grouped.groupBy("domain", "grp")
        .agg(
            F.max(
                (is_ua & (F.lower(F.col("value")) == agent.lower())).cast("int")
            ).alias("__m")
        )
        .filter(F.col("__m") == 1)
        .drop("__m")
    )
    in_scope = grouped.join(matched, ["domain", "grp"])
    delays = in_scope.filter(F.col("directive") == "crawl-delay").groupBy(
        "domain"
    ).agg(
        (F.max(F.col("value").cast("double")) * 1000)
        .cast("long")
        .alias("crawl_delay_ms")
    )
    rules = in_scope.filter(
        F.col("directive").isin("allow", "disallow") & (F.col("value") != "")
    ).select(
        "domain",
        F.col("value").alias("path"),
        (F.col("directive") == "allow").alias("allow"),
    )
    return rules.distinct().join(delays, "domain", "left")


def robots_sitemaps(
    df: DataFrame,
    domain_col: str = "domain",
    text_col: str = "robots_txt",
) -> DataFrame:
    """Extract ``Sitemap:`` directives: (domain, sitemap_url).

    Per RFC 9309 §2.3 / sitemaps.org, ``Sitemap`` lines are
    GROUP-INDEPENDENT — they apply regardless of user-agent groups, so
    this is a pure line scan (no group windows): split lines, strip
    inline comments, keep full absolute URLs.  The output is the fetch
    list that feeds :func:`sources.sitemaps.parse_sitemaps`, chaining
    robots discovery into the sitemap seed wave.
    """
    dom = F.col(domain_col)
    lines = df.select(
        dom.alias("domain"),
        F.explode(F.split(F.col(text_col), "\r?\n")).alias("raw"),
    ).select(
        "domain",
        F.trim(F.regexp_replace(F.col("raw"), "#.*$", "")).alias("line"),
    )
    kv = lines.filter(F.lower(F.col("line")).startswith("sitemap:")).select(
        "domain",
        F.trim(F.expr("substring(line, 9)")).alias("sitemap_url"),
    )
    return kv.filter(F.col("sitemap_url") != "").distinct()


def robots_pattern_regex(pattern: str) -> str:
    """Compile one robots.txt path pattern to a regex implementing
    RFC 9309 / Google matching semantics: prefix match, ``*`` matches
    any run (including ``/``), trailing ``$`` anchors the end.

    Driver-side compile (a crawler compiles its rule set once per
    robots fetch; the per-URL MATCH runs engine-side).  The output is
    RE2-safe AND java.util.regex-safe — only escaped literals, ``.*``,
    and anchors — so Spark's regexp_like and a SQL oracle's
    regexp_matches evaluate it identically.  Spec semantics are pinned
    by pytest against RFC 9309's own example table.
    """
    import re as _re

    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    esc = _re.escape(body).replace(r"\*", ".*")
    return "^" + esc + ("$" if anchored else "")


def match_robots(urls: DataFrame, rules: DataFrame) -> DataFrame:
    """Evaluate URL paths against compiled robots rules with
    longest-match precedence (RFC 9309 §2.2.2): among matching rules
    the longest PATTERN wins; on a length tie the least restrictive
    (Allow) wins; no matching rule means allowed.

    ``urls``: (domain, path).  ``rules``: (domain, pattern, regex,
    allow) — regex from :func:`robots_pattern_regex`.

    Returns (domain, path, allowed, matched_pattern).  One broadcast-
    friendly equi-join on domain (rules tables are small dimensions —
    the scheduler already broadcasts them, plans/round.py) + one window
    over (domain, path), partition-bounded by rules-per-domain.
    """
    j = urls.join(rules, "domain", "left")
    hit = F.when(
        F.col("pattern").isNotNull()
        & F.regexp_like(F.col("path"), F.col("regex")),
        F.lit(1),
    ).otherwise(F.lit(0))
    w = Window.partitionBy("domain", "path").orderBy(
        F.col("hit").desc(),
        F.length("pattern").desc(),
        F.col("allow").desc(),
        F.col("pattern"),
    )
    ranked = (
        j.withColumn("hit", hit)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
    )
    return ranked.select(
        "domain",
        "path",
        F.when(F.col("hit") == 1, F.col("allow"))
        .otherwise(F.lit(True))
        .alias("allowed"),
        F.when(F.col("hit") == 1, F.col("pattern")).alias("matched_pattern"),
    )
