"""Sink operators — the reference's alert/notify side-effects as
appendable tables (SURVEY.md §2.2).

The reference posts Slack mrkdwn and emails from inside the scrape
loop (/root/reference/service/alert.py:47-88,133-187).  In a
distributed engine, side-effects don't belong in executors: the engine
APPENDS decision rows to an ``alerts`` table; a tiny driver-side
notifier (out of scope here) drains that table.  Message text is
composed with JVM string functions, matching the reference's f-string
formats exactly so a downstream notifier is a drop-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WORKSHOP_PAGE_LINK = "https://www.homedepot.ca/workshops?store=7265"


def alert_messages(actions: DataFrame) -> DataFrame:
    """Standard + urgent alert rows for one round's actions.

    Message shapes mirror /root/reference/scraper/home_depo.py:509
    (standard mrkdwn) and the auto-register block at :546-556.
    """
    base = actions.select(
        "round",
        "event_code",
        F.lit("alert").alias("kind"),
        F.format_string(
            "*<%s|%s>* starts on *%s* is open for registration: %s",
            F.lit(WORKSHOP_PAGE_LINK),
            F.col("title"),
            F.col("start_time"),
            F.lit(WORKSHOP_PAGE_LINK),
        ).alias("message"),
    )
    register = actions.filter(F.col("register")).select(
        "round",
        "event_code",
        F.lit("register").alias("kind"),
        F.format_string(
            "🎯 Auto-registering for workshop:\n• Event Code: *%s*\n"
            "• Workshop ID: *%s*\n• Title: *%s*\n• Date: *%s*",
            F.col("event_code"),
            F.col("workshop_id"),
            F.col("title"),
            F.col("start_time"),
        ).alias("message"),
    )
    return base.unionByName(register)


def error_alert_messages(errors: DataFrame) -> DataFrame:
    """Error alert rows (kind="error") for one round's fetch/parse
    failures — exactly one per failed URL per round, with the mrkdwn
    shape of the reference's ``send_api_error_alert``
    (/root/reference/service/alert.py:308-335: "🚨 *API ERROR - {service}*
    🚨\\n{error}" plus a fenced details block)."""
    return errors.select(
        "round",
        F.col("url").alias("event_code"),
        F.lit("error").alias("kind"),
        F.format_string(
            "🚨 *API ERROR - %s* 🚨\n%s\n*Details:*\n```%s```",
            F.col("url"),
            F.col("error_message"),
            F.col("details"),
        ).alias("message"),
    )


def append_alerts(actions: DataFrame, alerts_path: str) -> None:
    """K1/K2 sink: append this round's alert rows (partitioned by round
    — each cron run's alerts are one immutable partition)."""
    alert_messages(actions).write.mode("append").partitionBy("round").parquet(
        alerts_path
    )


def append_snapshot(snapshot: DataFrame, path: str) -> None:
    """K4 sink: overwrite-latest snapshot (reference `save_state`
    upsert, /root/reference/scraper/canada_ircc.py:101-119)."""
    snapshot.coalesce(1).write.mode("overwrite").parquet(path)
