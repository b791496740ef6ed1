"""Deterministic shuffled-shard export (operators/export.py).

Verifies the three properties a training-shard writer must hold:
byte-identical re-runs (determinism independent of input partitioning),
exactly one data file per shard, and a (shard, seq) plan that is a
permutation of the corpus with balanced shards.  The (shard, seq)
VALUES are oracle-checked against DuckDB by `export_shard_plan`
(tools/check_correctness.py); these tests cover the physical writer the
oracle can't see.
"""

import glob
import hashlib
import os

from pyspark.sql import functions as F


def _shard_file_hashes(path: str) -> dict:
    out = {}
    for d in sorted(glob.glob(os.path.join(path, "shard=*"))):
        files = [
            f
            for f in sorted(glob.glob(os.path.join(d, "*")))
            if not f.endswith((".crc", "_SUCCESS"))
        ]
        hashes = []
        for f in files:
            with open(f, "rb") as fh:
                hashes.append(hashlib.md5(fh.read()).hexdigest())
        out[os.path.basename(d)] = hashes
    return out


def test_shard_plan_is_balanced_permutation(spark, sf_small):
    from pyppeteer_scraper_spark.operators.export import shard_plan
    from pyppeteer_scraper_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents")
    n = docs.count()
    planned = shard_plan(docs, n_shards=4).cache()
    try:
        assert planned.count() == n  # no row gained or lost
        per = {
            r["shard"]: (r["n"], r["max_seq"])
            for r in planned.groupBy("shard")
            .agg(F.count("*").alias("n"), F.max("seq").alias("max_seq"))
            .collect()
        }
        assert sorted(per) == [0, 1, 2, 3]
        # seq is contiguous 1..k per shard
        assert all(cnt == mx for cnt, mx in per.values())
        # uniform hash ⇒ no shard dominates (loose 3x bound at n≈50+)
        sizes = [cnt for cnt, _ in per.values()]
        assert max(sizes) <= 3 * max(1, min(sizes))
    finally:
        planned.unpersist()


def test_write_training_shards_deterministic_files(spark, sf_small, tmp_path):
    from pyppeteer_scraper_spark.operators.export import (
        shard_plan,
        write_training_shards,
    )
    from pyppeteer_scraper_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    p1, p2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    write_training_shards(docs, p1, n_shards=4)
    # different input partitioning must not change the output bytes
    write_training_shards(docs.repartition(13), p2, n_shards=4)

    h1, h2 = _shard_file_hashes(p1), _shard_file_hashes(p2)
    assert sorted(h1) == ["shard=%d" % i for i in range(4)]
    assert all(len(v) == 1 for v in h1.values())  # one file per shard
    assert h1 == h2  # byte-identical re-run

    # round trip: written rows ≡ planned rows (same permutation)
    back = spark.read.parquet(p1)
    planned = shard_plan(docs, n_shards=4)
    assert (
        back.select("doc_id", "shard", "seq")
        .exceptAll(planned.select("doc_id", "shard", "seq"))
        .count()
        == 0
    )
    assert back.count() == docs.count()


def test_frontcode_urls_lossless_and_edge_cases(spark):
    """Front-coding is lossless: url[k] reconstructs as
    url[k-1][:prefix_len] + suffix within each group; first-in-group
    has prefix_len 0; identical URLs code to empty suffixes; a
    one-URL group passes through whole."""
    from pyppeteer_scraper_spark.operators.export import frontcode_urls

    rows = [
        ("a.example", "https://a.example/x/1"),
        ("a.example", "https://a.example/x/10"),
        ("a.example", "https://a.example/x/10"),  # exact dup
        ("a.example", "https://a.example/y"),
        ("b.example", "https://b.example/only"),
    ]
    df = spark.createDataFrame(rows, ["domain", "url"])
    out = sorted(
        frontcode_urls(df, "url", "domain").collect(),
        key=lambda r: (r["domain"], r["rank"]),
    )
    # reconstruct per group
    prev = {}
    for r in out:
        if r["rank"] == 1:
            assert r["prefix_len"] == 0
            rebuilt = r["suffix"]
        else:
            rebuilt = prev[r["domain"]][: r["prefix_len"]] + r["suffix"]
        assert rebuilt == r["url"], r
        prev[r["domain"]] = r["url"]
    dup = [r for r in out if r["url"] == "https://a.example/x/10"]
    assert dup[1]["prefix_len"] == len("https://a.example/x/10")
    assert dup[1]["suffix"] == ""
    only = [r for r in out if r["domain"] == "b.example"]
    assert only[0]["prefix_len"] == 0
    assert only[0]["suffix"] == "https://b.example/only"
