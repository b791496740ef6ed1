from pyspark.sql import functions as F

from pyppeteer_scraper_spark.operators.bloom import (
    anti_join_with_bloom,
    bloom_annotate,
    update_bloom_shards,
)


def _seen_df(spark, ids):
    return spark.createDataFrame(
        [(i,) for i in ids], ["n"]
    ).select(
        F.xxhash64(F.concat(F.lit("https://x/"), F.col("n").cast("string"))).alias("url_hash"),
        F.concat(F.lit("https://x/"), F.col("n").cast("string")).alias("url"),
        F.lit(1).cast("int").alias("first_seen_round"),
    )


def test_bloom_no_false_negatives_and_exactness(spark, tmp_path):
    bloom_dir = str(tmp_path / "bloom")
    seen = _seen_df(spark, range(0, 2000))
    inserted = update_bloom_shards(seen, bloom_dir)
    assert inserted == 2000

    candidates = _seen_df(spark, range(1000, 4000)).drop("first_seen_round")

    # no false negatives: every truly-seen candidate is flagged
    ann = bloom_annotate(candidates, bloom_dir).toPandas()
    truly_seen = ann["url"].str.removeprefix("https://x/").astype(int) < 2000
    assert ann.loc[truly_seen, "maybe_seen"].all()
    # false-positive rate over the 2000 unseen candidates is small
    fp = ann.loc[~truly_seen, "maybe_seen"].mean()
    assert fp < 0.05, f"fp rate {fp}"

    # bloom-accelerated anti-join == plain anti-join, exactly
    plain = set(
        r["url"]
        for r in candidates.join(
            seen.select("url_hash", "url"), ["url_hash", "url"], "left_anti"
        ).collect()
    )
    accel = set(
        r["url"] for r in anti_join_with_bloom(candidates, seen, bloom_dir).collect()
    )
    assert accel == plain
    assert len(accel) == 2000


def test_bloom_incremental_update(spark, tmp_path):
    bloom_dir = str(tmp_path / "bloom2")
    update_bloom_shards(_seen_df(spark, range(0, 100)), bloom_dir)
    update_bloom_shards(_seen_df(spark, range(100, 200)), bloom_dir)
    ann = bloom_annotate(
        _seen_df(spark, range(0, 200)).drop("first_seen_round"), bloom_dir
    )
    assert ann.filter(~F.col("maybe_seen")).count() == 0


def test_crawl_with_bloom_matches_plain(spark, sf_small, tmp_path):
    from pyppeteer_scraper_spark.plans.checkpoint import crawl
    from pyppeteer_scraper_spark.sources.datagen import generate_crawl_tables

    t = generate_crawl_tables(spark, sf_small)
    plain = crawl(
        spark, t["pages"], t["seeds"], t["robots"], 3, str(tmp_path / "plain")
    )
    bloomed = crawl(
        spark, t["pages"], t["seeds"], t["robots"], 3, str(tmp_path / "bloom"),
        use_bloom=True,
    )
    a = sorted(
        (r["url"], r["first_seen_round"]) for r in plain.state.url_seen.collect()
    )
    b = sorted(
        (r["url"], r["first_seen_round"]) for r in bloomed.state.url_seen.collect()
    )
    assert a == b
    fa = sorted((r["url"], r["state"]) for r in plain.state.frontier.collect())
    fb = sorted((r["url"], r["state"]) for r in bloomed.state.frontier.collect())
    assert fa == fb
