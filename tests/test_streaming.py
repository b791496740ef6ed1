import os

from pyspark.sql import functions as F


def test_streaming_dedup_and_daily_gate(spark, sf_small, tmp_path):
    from pyppeteer_scraper_spark.sources.datagen import generate_crawl_tables
    from pyppeteer_scraper_spark.streaming.rounds import (
        daily_emit_gate,
        read_pages_stream,
        run_available_now,
        streaming_url_dedup,
    )

    t = generate_crawl_tables(spark, sf_small)
    feed = str(tmp_path / "feed")
    t["pages"].write.mode("overwrite").parquet(feed)

    stream = read_pages_stream(spark, feed)
    assert stream.isStreaming

    # dedup: duplicate-variant URLs collapse in streaming state too
    out1 = str(tmp_path / "dedup_out")
    run_available_now(
        streaming_url_dedup(stream), str(tmp_path / "ck1"), out1
    )
    got = spark.read.parquet(out1)
    n_raw = t["pages"].count()
    n_dedup = got.count()
    assert n_dedup < n_raw
    assert got.select("url").distinct().count() == n_dedup

    # daily gate: windowed counts per domain (complete mode — all pages
    # share one day, so append mode would hold the window open forever)
    from pyppeteer_scraper_spark.streaming.rounds import run_complete_to_memory

    run_complete_to_memory(daily_emit_gate(stream), "gate_mem")
    gate = spark.sql("select * from gate_mem")
    assert gate.count() > 0
    assert set(gate.columns) == {"day_start", "domain", "n_pages", "first_ts"}
    assert gate.groupBy("day_start", "domain").count().filter(F.col("count") > 1).count() == 0
