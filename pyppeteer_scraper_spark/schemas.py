"""Explicit StructType schemas for every engine table.

The reference's schemas are implicit (dicts shaped by ``.get()`` reads,
documented only by its JSON fixtures, e.g.
/root/reference/tests/homedepot_sample_response.json).  The engine flips
this to explicit columnar schemas so Catalyst can prune/push down.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Input table: Common-Crawl-style fetched pages (BASELINE.json input_hint).
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# Crawl frontier — the partitioned priority queue (FIXTURES.md §5).
FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), True),
        T.StructField("domain", T.StringType(), True),
        T.StructField("priority", T.IntegerType(), True),
        T.StructField("depth", T.IntegerType(), True),
        T.StructField("discovered_ts", T.TimestampType(), True),
        T.StructField("state", T.StringType(), True),  # pending|fetched|blocked|missing
        # Revisit cadence — the cron-tier analog (0 = crawl once;
        # 1 = every round / "hourly"; 2 = every 2 rounds / "daily").
        T.StructField("revisit_interval", T.IntegerType(), True),
        T.StructField("last_fetch_round", T.IntegerType(), True),  # -1 = never
    ]
)

URL_SEEN_SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("first_seen_round", T.IntegerType(), True),
    ]
)

ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("domain", T.StringType(), False),
        T.StructField("allow", T.BooleanType(), True),
        T.StructField("crawl_delay_ms", T.LongType(), True),
        T.StructField("max_per_round", T.IntegerType(), True),
    ]
)

SEEDS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("priority", T.IntegerType(), True),
    ]
)

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("fetched", T.LongType(), True),
        T.StructField("deduped", T.LongType(), True),
        T.StructField("emitted", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

# Extraction output of one round (mapInPandas over html).
EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("links", T.ArrayType(T.StringType()), True),
        T.StructField("payload_json", T.StringType(), True),
    ]
)

LINKS_SCHEMA = T.StructType(
    [
        T.StructField("src_url", T.StringType(), False),
        T.StructField("dst_url", T.StringType(), False),
    ]
)

# CDC snapshot table — reference `ircc_state`
# (/root/reference/dashboard/lib/db/schema.sql:14-21).
SNAPSHOT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("estimated_time", T.StringType(), True),
        T.StructField("people_ahead", T.StringType(), True),
        T.StructField("total_waiting", T.StringType(), True),
        T.StructField("last_updated", T.StringType(), True),
        T.StructField("scraped_at", T.TimestampType(), True),
    ]
)

# Embedded workshop payload — the reference's golden-fixture shape
# (/root/reference/tests/homedepot_sample_response.json:1-40,
#  parsed at /root/reference/scraper/home_depo.py:393-405).
WORKSHOP_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("code", T.StringType(), True),
        T.StructField("workshopId", T.StringType(), True),
        T.StructField("attendeeLimit", T.IntegerType(), True),
        T.StructField("remainingSeats", T.IntegerType(), True),
        T.StructField("duration", T.StringType(), True),
        T.StructField("closeDate", T.StringType(), True),
        T.StructField("endTime", T.StringType(), True),
        T.StructField("eventDate", T.StringType(), True),
        T.StructField("startTime", T.StringType(), True),
        T.StructField("workshopStatus", T.StringType(), True),
        T.StructField("workshopType", T.StringType(), True),
        T.StructField(
            "icsFile",
            T.StructType(
                [
                    T.StructField("code", T.StringType(), True),
                    T.StructField("url", T.StringType(), True),
                ]
            ),
            True,
        ),
        T.StructField(
            "eventType",
            T.StructType(
                [
                    T.StructField("workshopEventId", T.StringType(), True),
                    T.StructField("code", T.StringType(), True),
                    T.StructField("name", T.StringType(), True),
                    T.StructField("shortCode", T.StringType(), True),
                    T.StructField("description", T.StringType(), True),
                    T.StructField("thingsToKnow", T.StringType(), True),
                    T.StructField("imageUrl", T.StringType(), True),
                    T.StructField(
                        "photo",
                        T.StructType(
                            [
                                T.StructField("code", T.StringType(), True),
                                T.StructField("url", T.StringType(), True),
                            ]
                        ),
                        True,
                    ),
                ]
            ),
            True,
        ),
    ]
)

WORKSHOP_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField(
            "workshopEventWsDTO", T.ArrayType(WORKSHOP_EVENT_SCHEMA), True
        ),
        T.StructField("dihFlag", T.BooleanType(), True),
        T.StructField("diyFlag", T.BooleanType(), True),
        T.StructField("kidFlag", T.BooleanType(), True),
    ]
)
