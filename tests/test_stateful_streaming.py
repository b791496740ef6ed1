import datetime as dt

from pyspark.sql import functions as F


def test_snapshot_change_stream(spark, tmp_path):
    """CDC parity across two micro-batches: state persists between
    AvailableNow runs via the checkpoint, repeats are suppressed, first
    observation always emits (reference: canada_ircc.py has_changed)."""
    from pyppeteer_scraper_spark.streaming.stateful import snapshot_change_stream

    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def write_batch(rows, part):
        spark.createDataFrame(rows, "key string, ts timestamp, value double").coalesce(
            1
        ).write.mode("overwrite").parquet(f"{feed}/part={part}")

    t = lambda m: dt.datetime(2026, 1, 1, 0, m)  # noqa: E731
    write_batch(
        [("ircc", t(1), 10.0), ("ircc", t(2), 10.0), ("ircc", t(3), 12.0)], 1
    )

    def drain():
        stream = (
            spark.readStream.schema("key string, ts timestamp, value double")
            .option("maxFilesPerTrigger", "100")
            .parquet(feed + "/part=*")
        )
        q = (
            snapshot_change_stream(stream)
            .writeStream.trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .format("parquet")
            .option("path", out)
            .outputMode("append")
            .start()
        )
        q.awaitTermination()

    drain()
    got = {
        (r["ts"].minute, r["value"], r["prev"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {(1, 10.0, None), (3, 12.0, 10.0)}

    # second batch: 12.0 repeat suppressed by persisted state, 15.0 emits
    write_batch([("ircc", t(4), 12.0), ("ircc", t(5), 15.0)], 2)
    drain()
    got = {
        (r["ts"].minute, r["value"], r["prev"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {(1, 10.0, None), (3, 12.0, 10.0), (5, 15.0, 12.0)}
