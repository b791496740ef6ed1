"""Watermarked windowed aggregation in APPEND mode: exactly-once
window emission across checkpointed runs, late-data drop."""

import os

from pyspark.sql import functions as F

from pyppeteer_scraper_spark.streaming.rounds import (
    fetch_rate_windows,
    read_pages_stream,
    run_available_now,
)


def _pages(spark, rows):
    df = spark.createDataFrame(rows, ["url", "ts"])
    return df.select(
        "url",
        F.to_timestamp("ts").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


def test_append_windows_emit_once_and_drop_late(spark, tmp_path):
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(feed)

    # run 1: three pages in the 01:00 window, plus a 03:00 page that
    # advances the watermark past 02:00 (closing the 01:00 window)
    _pages(
        spark,
        [
            ("https://a.example/1", "2024-01-01 01:05:00"),
            ("https://a.example/2", "2024-01-01 01:10:00"),
            ("https://b.example/1", "2024-01-01 01:20:00"),
            ("https://a.example/3", "2024-01-01 03:00:00"),
        ],
    ).write.mode("append").parquet(feed)
    stream = fetch_rate_windows(read_pages_stream(spark, feed))
    run_available_now(stream, ckpt, out)

    # run 2: a 05:00 page (closes the 03:00 window) and a LATE page in
    # the long-closed 01:00 window — behind the checkpointed watermark,
    # it must be dropped, not restated
    _pages(
        spark,
        [
            ("https://a.example/4", "2024-01-01 05:00:00"),
            ("https://a.example/LATE", "2024-01-01 01:30:00"),
        ],
    ).write.mode("append").parquet(feed)
    stream = fetch_rate_windows(read_pages_stream(spark, feed))
    run_available_now(stream, ckpt, out)

    got = {
        (r["win_start"].hour, r["domain"]): r["n_pages"]
        for r in spark.read.parquet(out).collect()
    }
    # 01:00 window emitted once with the ON-TIME counts only
    assert got[(1, "a.example")] == 2
    assert got[(1, "b.example")] == 1
    # 03:00 window closed by run 2's watermark advance
    assert got[(3, "a.example")] == 1
    # the late row created no new 01:00 emission (no double counting:
    # sum over a.example hour-1 keys is exactly the run-1 value)
    assert (
        sum(v for (h, d), v in got.items() if h == 1 and d == "a.example")
        == 2
    )
