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


def test_snapshot_change_stream_multi(spark, tmp_path):
    """Struct-valued CDC: a row emits when ANY of the tracked fields
    differs (reference has_changed compares the whole 4-field dict);
    single-field repeats with other fields changed still emit."""
    from pyppeteer_scraper_spark.streaming.stateful import (
        snapshot_change_stream_multi,
    )

    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    ddl = "key string, ts timestamp, wait double, status string, open int, note string"

    def write_batch(rows, part):
        spark.createDataFrame(rows, ddl).coalesce(1).write.mode("overwrite").parquet(
            f"{feed}/part={part}"
        )

    t = lambda m: dt.datetime(2026, 1, 1, 0, m)  # noqa: E731
    write_batch(
        [
            ("ircc", t(1), 10.0, "open", 1, "a"),
            ("ircc", t(2), 10.0, "open", 1, "a"),   # identical → suppressed
            ("ircc", t(3), 10.0, "CLOSED", 1, "a"),  # one field changed → emits
            ("ircc", t(4), 12.0, "CLOSED", 0, "b"),  # several changed → emits
        ],
        1,
    )

    def drain():
        stream = (
            spark.readStream.schema(ddl)
            .option("maxFilesPerTrigger", "100")
            .parquet(feed + "/part=*")
        )
        q = (
            snapshot_change_stream_multi(stream)
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
        (r["ts"].minute, r["wait"], r["status"], r["prev_status"], r["prev_wait"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {
        (1, 10.0, "open", None, None),
        (3, 10.0, "CLOSED", "open", 10.0),
        (4, 12.0, "CLOSED", "CLOSED", 10.0),
    }

    # state persists across micro-batch runs: exact repeat suppressed
    write_batch(
        [("ircc", t(5), 12.0, "CLOSED", 0, "b"), ("ircc", t(6), 12.0, "open", 0, "b")],
        2,
    )
    drain()
    minutes = sorted(
        r["ts"].minute for r in spark.read.parquet(out).collect()
    )
    assert minutes == [1, 3, 4, 6]
