"""Structured-Streaming expressions of the reference's temporal
semantics (SURVEY.md §2.11).

The reference is batch-per-cron; its streaming-shaped concepts map to:

- cron trigger            → ``Trigger.AvailableNow`` micro-batches
- seen-set across runs    → ``dropDuplicates`` on canonical url with
                            watermarked state
- once-per-day alert gate → 1-day tumbling window aggregation
                            (/root/reference/scraper/home_depo.py:171-179)
- snapshot change detect  → stateful last-value comparison
                            (/root/reference/scraper/canada_ircc.py:153-155)

The batch frontier loop (plans/checkpoint.crawl) remains the parity
engine — crawl ordering demands strict round boundaries — but these
streaming jobs cover continuous ingestion of a pages feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyppeteer_scraper_spark.functions.canonicalize import canonicalize_udf
from pyppeteer_scraper_spark.schemas import PAGES_SCHEMA


def read_pages_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of page parquet drops (a Common-Crawl-style
    feed directory).  AvailableNow processing drains what exists and
    stops — the cron-batch analog."""
    return spark.readStream.schema(PAGES_SCHEMA).parquet(path)


def streaming_url_dedup(pages: DataFrame) -> DataFrame:
    """Watermarked streaming dedup on canonical URL — the url_seen
    anti-join expressed as streaming state.  The 7-day watermark bounds
    state: a re-crawl after the horizon is treated as new (the
    reference's seen-set never expires, but at 10^10 scale bounded
    state is the right default; widen for stricter parity)."""
    return (
        pages.withColumn("url", canonicalize_udf(F.col("url")))
        .withWatermark("warc_ts", "7 days")
        .dropDuplicates(["url"])
    )


def daily_emit_gate(pages: DataFrame) -> DataFrame:
    """Once-per-day-per-domain emit counts: tumbling 1-day window over
    the page feed — the streaming form of the reference's daily alert
    rate-limit (D3)."""
    from pyppeteer_scraper_spark.functions.canonicalize import domain_of

    return (
        pages.withColumn("domain", domain_of(F.col("url")))
        .withWatermark("warc_ts", "1 day")
        .groupBy(F.window("warc_ts", "1 day").alias("day"), "domain")
        .agg(F.count("*").alias("n_pages"), F.min("warc_ts").alias("first_ts"))
        .select(
            F.col("day.start").alias("day_start"), "domain", "n_pages", "first_ts"
        )
    )


def run_complete_to_memory(stream_df: DataFrame, name: str) -> None:
    """Drain an aggregation stream in complete mode into a memory sink
    (windows under an open watermark never emit in append mode — the
    single-batch AvailableNow case would output nothing)."""
    q = (
        stream_df.writeStream.trigger(availableNow=True)
        .outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.awaitTermination()


def run_available_now(
    stream_df: DataFrame, ckpt: str, out_path: str | None = None
) -> None:
    """Drain the stream with AvailableNow semantics (the cron-run
    analog) into parquet (or a no-op memory sink for tests)."""
    writer = stream_df.writeStream.trigger(availableNow=True).option(
        "checkpointLocation", ckpt
    )
    if out_path:
        q = writer.outputMode("append").format("parquet").option("path", out_path).start()
    else:
        q = writer.outputMode("append").format("noop").start()
    q.awaitTermination()


def fetch_rate_windows(
    pages: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-domain fetch-rate monitoring: tumbling event-time windows
    over the page feed in APPEND mode — each (window, domain) row is
    emitted EXACTLY ONCE, when the watermark passes the window end, and
    late pages behind the watermark are dropped (bounded state, no
    restatement downstream).

    This is the operational telemetry stream a fetch fleet alarms on
    (politeness violations, dead hosts); complete-mode daily_emit_gate
    restates history every batch, which is right for a dashboard but
    wrong for an alert log.  Exactly-once emission across restarts
    comes from the checkpointed watermark (tests run it as two
    AvailableNow drains sharing a checkpoint — the cron-run analog)."""
    from pyppeteer_scraper_spark.functions.canonicalize import domain_of

    return (
        pages.withColumn("domain", domain_of(F.col("url")))
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "domain")
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "domain",
            "n_pages",
        )
    )
