"""Round-4 session-2 batch 2: WARC emit roundtrip, Z-order layout,
DSIR Gumbel-top-k resampling."""

import math

from pyspark.sql import functions as F

from pyppeteer_scraper_spark.operators.export import (
    zorder_key,
    zorder_layout,
)
from pyppeteer_scraper_spark.sources.warc import parse_warc, serialize_warc


def test_warc_serialize_parse_roundtrip(spark):
    rows = [
        ("https://a.example/1", "2026-01-05 10:00:00", "hello <b>world</b>"),
        ("https://b.example/2", "2026-02-06 11:30:00", "second page body"),
        ("https://b.example/3", "2026-03-07 12:45:00", "third"),
    ]
    pages = spark.createDataFrame(rows, ["url", "ts", "text"]).withColumn(
        "warc_ts", F.to_timestamp("ts")
    )
    recs = serialize_warc(pages)
    # one WARC file = records concatenated in url order
    warc = "".join(
        r["warc_record"]
        for r in recs.orderBy("url").select("warc_record").collect()
    )
    parsed = (
        parse_warc(
            spark.createDataFrame([(warc,)], ["warc"])
        )
        .filter(F.col("record_type") == "response")
        .orderBy("url")
        .collect()
    )
    assert [(p["url"], p["payload"]) for p in parsed] == [
        (u, t) for u, _, t in rows
    ]
    # Content-Length header matches the actual block byte length
    rec0 = recs.filter(F.col("url") == rows[0][0]).collect()[0][
        "warc_record"
    ]
    head, _, rest = rec0.partition("\r\n\r\n")
    clen = int(
        [l for l in head.splitlines() if l.startswith("Content-Length:")][0]
        .split(":")[1]
    )
    assert clen == len(rest.encode()) - 4  # minus trailing 2x CRLF


def test_zorder_key_hand_computed(spark):
    df = spark.createDataFrame([(5, 3), (0, 0), (65535, 65535)], ["a", "b"])
    got = [
        r["z"]
        for r in df.select(
            zorder_key(F.col("a"), F.col("b")).alias("z")
        ).collect()
    ]

    def morton(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    assert got == [morton(5, 3), 0, morton(65535, 65535)]
    assert morton(65535, 65535) == 2**32 - 1


def test_zorder_layout_prunes_both_dims(spark):
    # 32x32 grid: z-order files must cover small rectangles in BOTH
    # dims, unlike a lexicographic (a, b) sort whose files span the
    # whole b range.
    rows = [(a * 32 + b, a, b) for a in range(32) for b in range(32)]
    df = spark.createDataFrame(rows, ["id", "a", "b"])
    out = zorder_layout(df, "a", "b", "id", rows_per_file=64).collect()
    assert sum(r["n_rows"] for r in out) == 1024
    for r in out:
        # 64 rows in z order cover an 8x8 block of the 32x32 grid
        assert r["a_max"] - r["a_min"] <= 8
        assert r["b_max"] - r["b_min"] <= 8


def test_gumbel_topk_prefers_heavy_weights(spark, sf_small):
    """Docs sampled ∝ exp(log_weight): the target-like subset (src0,
    which DEFINES the DSIR target) must be over-represented in the
    sample relative to its corpus share."""
    from pyppeteer_scraper_spark.functions.dsir import dsir_gumbel_topk
    from pyppeteer_scraper_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents")
    n_docs = docs.count()
    n_target = docs.filter(F.col("source") == "src0").count()
    picked = dsir_gumbel_topk(docs, F.col("source") == "src0", k=50)
    got = picked.join(docs.select("doc_id", "source"), "doc_id")
    share = (
        got.filter(F.col("source") == "src0").count() / 50
    )
    assert share > (n_target / n_docs), (share, n_target / n_docs)
    # determinism: second run identical
    again = dsir_gumbel_topk(docs, F.col("source") == "src0", k=50)
    assert sorted(r["doc_id"] for r in picked.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_gumbel_key_matches_python_replay(spark):
    """The seeded noise is a pure function of doc_id — replay in
    Python."""
    from pyppeteer_scraper_spark.functions.dsir import dsir_gumbel_topk
    import hashlib

    rows = [(i, "src0" if i % 2 else "srcX", "common words here") for i in range(1, 9)]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = dsir_gumbel_topk(docs, F.col("source") == "src0", k=8).collect()

    def gumbel(doc_id):
        h = hashlib.md5(f"resample-v1\x1f{doc_id}".encode()).hexdigest()
        u = (int(h[:12], 16) + 1) / (16**12 + 1)
        return -math.log(-math.log(u))

    for r in out:
        assert r["gumbel_key"] == round(r["log_weight"] + gumbel(r["doc_id"]), 6)
