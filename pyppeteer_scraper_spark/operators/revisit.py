"""Adaptive revisit scheduling — estimate each page's change rate from
its fetch history and derive the freshness-optimal recrawl interval.

The estimator is Cho & Garcia-Molina's improved Poisson change-rate
estimator (ACM TOIT 2003, "Estimating Frequency of Change"): with n
consecutive-fetch intervals of mean length ī and X of them showing a
changed page,

    lambda_hat = -ln((n - X + 0.5) / (n + 0.5)) / ī

(the +0.5 terms are the paper's bias correction, keeping the estimate
finite when every interval changed).  The revisit interval is
1/lambda_hat, clamped to [min_interval, max_interval] — pages that
never change drift toward the cap, hot pages toward the floor.

This generalizes the reference's FIXED cron cadences
(/root/reference/docs/CRON_SCHEDULE_RECOMMENDATIONS.md:20-55 — e.g.
hourly for Home Depot plus a Monday-evening burst precisely BECAUSE the
operator observed registrations change Monday 16:00-19:00) into the
closed-loop policy a 10^10-URL frontier needs: nobody hand-tunes 10^10
cron lines.

Shape at scale: one window over (page, ts) to pair consecutive fetches
(a single shuffle by page — the same partitioning the snapshot store
already has), then one groupBy(page).  Everything is codegen arithmetic;
exact-oracle-able because the change flag, the interval sum, and the
estimator are all order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def change_rate_schedule(
    observations: DataFrame,
    page_col: str = "page",
    ts_col: str = "ts",
    changed_col: str = "changed",
    min_interval_days: float = 1.0 / 24,
    max_interval_days: float = 30.0,
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-page change-rate estimate and revisit interval:
    (page, n_obs, n_changes, lambda_hat, revisit_days).

    ``observations`` carries one row per historical fetch with a
    precomputed 0/1 ``changed`` flag vs the previous fetch (the
    snapshot-change-detection operator, plans/queries.py::d4, produces
    exactly this).  The first observation of a page has no prior; its
    flag is ignored.  ``order_cols`` breaks timestamp ties
    deterministically (e.g. an event id).

    Pages with a single observation have no intervals; they get the
    max interval (nothing is known, deafult to the cheapest schedule).
    """
    w = Window.partitionBy(page_col).orderBy(ts_col, *order_cols)
    seq = observations.select(
        F.col(page_col).alias("page"),
        # NTZ-safe: unix_micros requires TIMESTAMP; the max-min
        # difference below is timezone-shift-invariant either way
        F.col(ts_col).cast("timestamp").alias("__ts"),
        F.col(changed_col).cast("long").alias("__chg"),
        F.row_number().over(w).alias("__rn"),
    )
    agg = seq.groupBy("page").agg(
        F.count("*").alias("n_obs"),
        # exclude the first fetch: it has no previous snapshot to differ from
        F.sum(F.when(F.col("__rn") > 1, F.col("__chg")).otherwise(0)).alias(
            "n_changes"
        ),
        F.unix_micros(F.max("__ts")).alias("__max_us"),
        F.unix_micros(F.min("__ts")).alias("__min_us"),
    )
    n_int = (F.col("n_obs") - 1).cast("double")
    # ANSI-safe: every division sits inside a CASE branch that already
    # proved the denominator nonzero (CaseWhen evaluates lazily), so
    # Spark 4's default ANSI mode never sees a divide-by-zero.
    mean_interval_days = (
        (F.col("__max_us") - F.col("__min_us")).cast("double")
        / F.greatest(n_int, F.lit(1.0))
        / F.lit(86_400_000_000.0)
    )
    lam = F.when(
        mean_interval_days > 0,
        -F.log(
            (n_int - F.col("n_changes") + F.lit(0.5)) / (n_int + F.lit(0.5))
        )
        / mean_interval_days,
    ).otherwise(F.lit(0.0))
    revisit = F.least(
        F.greatest(
            F.when(lam > 0, F.lit(1.0) / lam).otherwise(
                F.lit(float(max_interval_days))
            ),
            F.lit(float(min_interval_days)),
        ),
        F.lit(float(max_interval_days)),
    )
    single = F.col("n_obs") <= 1
    return agg.select(
        "page",
        "n_obs",
        "n_changes",
        F.when(single, F.lit(0.0))
        .otherwise(F.round(lam, 6))
        .alias("lambda_hat"),
        F.when(single, F.lit(float(max_interval_days)))
        .otherwise(F.round(revisit, 6))
        .alias("revisit_days"),
    )


def conditional_get_stats(
    fetches: DataFrame,
    page_col: str = "page",
    host_col: str = "host",
    ts_col: str = "ts",
    fingerprint_col: str = "fingerprint",
    bytes_col: str = "n_bytes",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Conditional-GET (ETag / If-Modified-Since) bandwidth accounting
    per host: a refetch whose content fingerprint equals the previous
    fetch's would have been answered ``304 Not Modified`` — header-only,
    body transfer saved (RFC 9110 §13.1; the revisit economics every
    polite recrawler runs on).  The reference refetches full pages on
    every cron tick; at 10^10 URLs the 304 ratio IS the bandwidth bill.

    Input: one row per fetch with a deterministic content fingerprint
    and the body size.  First fetch of a page is always a full 200.
    Returns per host: (host, n_fetches, n_not_modified, n_modified,
    bytes_full, bytes_transferred, savings_pct).

    Shape at scale: one window over (page, ts) — a single shuffle by
    page, the partitioning the snapshot store already has — then one
    groupBy(host); all codegen, order-independent, exact-oracle-able.
    """
    order = [ts_col] if tiebreak_col is None else [ts_col, tiebreak_col]
    w = Window.partitionBy(page_col).orderBy(*order)
    tagged = fetches.withColumn(
        "not_modified",
        F.lag(F.col(fingerprint_col)).over(w) == F.col(fingerprint_col),
    ).withColumn("not_modified", F.coalesce("not_modified", F.lit(False)))
    saved = F.when(F.col("not_modified"), F.col(bytes_col)).otherwise(F.lit(0))
    return (
        tagged.groupBy(F.col(host_col).alias("host"))
        .agg(
            F.count("*").cast("long").alias("n_fetches"),
            F.sum(F.col("not_modified").cast("long"))
            .cast("long")
            .alias("n_not_modified"),
            F.sum((~F.col("not_modified")).cast("long"))
            .cast("long")
            .alias("n_modified"),
            F.sum(F.col(bytes_col)).cast("long").alias("bytes_full"),
            (F.sum(F.col(bytes_col)) - F.sum(saved))
            .cast("long")
            .alias("bytes_transferred"),
            F.round(
                F.sum(saved) * 1.0 / F.greatest(F.sum(F.col(bytes_col)), F.lit(1)),
                6,
            ).alias("savings_pct"),
        )
    )


def snapshot_churn(
    prev: DataFrame,
    curr: DataFrame,
    key_col: str = "doc_id",
    group_col: str = "source",
    fingerprint_col: str = "fingerprint",
) -> DataFrame:
    """Crawl-over-crawl corpus churn per group: docs added, removed,
    changed (same key, different fingerprint), unchanged — the
    snapshot-diff report that sizes incremental processing (how much
    of the 100 TB actually needs re-dedup/re-scoring this round) and
    feeds the adaptive-revisit estimator with per-host priors.

    ``prev``/``curr``: (key, group, fingerprint) snapshots.  A full
    outer join on key classifies each doc; one shuffle on the key both
    snapshots are naturally stored by (bucketed checkpoint layouts
    join Exchange-free).  churn_rate = (added+removed+changed)/n_curr,
    with removed counted against the group it left.
    """
    p = prev.select(
        F.col(key_col).alias("k"),
        F.col(group_col).alias("pg"),
        F.col(fingerprint_col).alias("pf"),
    )
    c = curr.select(
        F.col(key_col).alias("k"),
        F.col(group_col).alias("cg"),
        F.col(fingerprint_col).alias("cf"),
    )
    j = p.join(c, "k", "full_outer").select(
        F.coalesce("cg", "pg").alias("grp"),
        F.col("pf").isNull().cast("long").alias("added"),
        F.col("cf").isNull().cast("long").alias("removed"),
        (
            F.col("pf").isNotNull()
            & F.col("cf").isNotNull()
            & (F.col("pf") != F.col("cf"))
        )
        .cast("long")
        .alias("changed"),
        (
            F.col("pf").isNotNull()
            & F.col("cf").isNotNull()
            & (F.col("pf") == F.col("cf"))
        )
        .cast("long")
        .alias("unchanged"),
        F.col("cf").isNotNull().cast("long").alias("in_curr"),
    )
    return (
        j.groupBy(F.col("grp").alias(group_col))
        .agg(
            F.sum("added").cast("long").alias("n_added"),
            F.sum("removed").cast("long").alias("n_removed"),
            F.sum("changed").cast("long").alias("n_changed"),
            F.sum("unchanged").cast("long").alias("n_unchanged"),
            F.sum("in_curr").cast("long").alias("n_curr"),
            F.round(
                (F.sum("added") + F.sum("removed") + F.sum("changed")) * 1.0
                / F.greatest(F.sum("in_curr"), F.lit(1)),
                6,
            ).alias("churn_rate"),
        )
    )


def retry_backoff_schedule(
    attempts: DataFrame,
    page_col: str = "page",
    ts_col: str = "ts",
    ok_col: str = "ok",
    order_cols: tuple = (),
    base_ms: int = 1000,
    cap_ms: int = 3_600_000,
    max_retries: int = 6,
    salt: str = "backoff-v1",
) -> DataFrame:
    """Truncated-exponential-backoff retry policy over a per-page fetch
    attempt log: the current consecutive-failure streak (failures
    after the last success — the whole history if no success yet)
    drives the next retry delay

        delay = min(base * 2^(streak-1), cap) * (1/2 + jitter/2)

    with DETERMINISTIC jitter in [0, 1) from md5(salt, page, streak) —
    reproducible across engines/runs (no Math.random), yet decorrelated
    across pages so retry waves don't thundering-herd a recovering
    host.  Pages with streak > max_retries are marked give_up (parked
    for the adaptive-revisit scheduler instead of hot retry).  Pages
    whose latest attempt succeeded emit streak 0 / delay 0.

    Returns (page, n_attempts, n_fails, streak, next_delay_ms:bigint,
    give_up).  Scale: one groupBy per page — the same single-shuffle
    class as change_rate_schedule; the streak is a conditional count
    against the max success timestamp, not a window sort, so partial
    aggregation absorbs everything map-side.  Reference analog: the
    bare try/except + next-cron-tick retry of the scrapers
    (/root/reference/scraper/home_depo.py:616-641) — here the retry
    cadence is computed, per page, from observed failures.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in order_cols]
    w = Window.partitionBy(page_col).orderBy(*[o.desc() for o in order])
    ranked = attempts.select(
        F.col(page_col).alias("page"),
        F.col(ts_col).alias("__ts"),
        F.col(ok_col).cast("boolean").alias("__ok"),
        F.row_number().over(w).alias("__rk_desc"),
    )
    agg = ranked.groupBy("page").agg(
        F.count("*").alias("n_attempts"),
        F.sum(F.when(~F.col("__ok"), 1).otherwise(0))
        .cast("long")
        .alias("n_fails"),
        # streak = attempts newer than the most recent success == the
        # smallest desc-rank of a success, minus one; no success =>
        # whole history
        (
            F.coalesce(
                F.min(F.when(F.col("__ok"), F.col("__rk_desc"))),
                F.count("*") + 1,
            )
            - 1
        )
        .cast("long")
        .alias("streak"),
    )
    jitter = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "\x1f",
                        F.lit(salt),
                        F.col("page").cast("string"),
                        F.col("streak").cast("string"),
                    )
                ),
                1,
                6,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(16**6))
    )
    raw = F.least(
        F.lit(float(base_ms)) * F.pow(F.lit(2.0), F.col("streak") - 1),
        F.lit(float(cap_ms)),
    )
    return agg.select(
        "page",
        "n_attempts",
        "n_fails",
        "streak",
        F.when(F.col("streak") <= 0, F.lit(0))
        .otherwise(
            F.floor(raw * (F.lit(0.5) + jitter / 2))
        )
        .cast("long")
        .alias("next_delay_ms"),
        (F.col("streak") > max_retries).alias("give_up"),
    )
