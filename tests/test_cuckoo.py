"""Cuckoo-filter seen-sidecar: no-false-negative invariant, deletion
(recrawl eviction), overflow-stash behavior, and crawl-loop parity with
both the plain anti-join and the bloom sidecar."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyppeteer_scraper_spark.operators.cuckoo import (
    CuckooParams,
    _contains,
    _delete_batch,
    _insert_batch,
    anti_join_with_cuckoo,
    cuckoo_annotate,
    delete_cuckoo_shards,
    load_params,
    params_for,
    update_cuckoo_shards,
)


def _seen_df(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], ["n"]).select(
        F.xxhash64(
            F.concat(F.lit("https://x/"), F.col("n").cast("string"))
        ).alias("url_hash"),
        F.concat(F.lit("https://x/"), F.col("n").cast("string")).alias("url"),
        F.lit(1).cast("int").alias("first_seen_round"),
    )


def test_cuckoo_no_false_negatives_and_exactness(spark, tmp_path):
    d = str(tmp_path / "ck")
    seen = _seen_df(spark, range(0, 2000))
    assert update_cuckoo_shards(seen, d) == 2000

    candidates = _seen_df(spark, range(1000, 4000)).drop("first_seen_round")
    ann = cuckoo_annotate(candidates, d).toPandas()
    truly_seen = ann["url"].str.removeprefix("https://x/").astype(int) < 2000
    assert ann.loc[truly_seen, "maybe_seen"].all()
    # 16-bit fingerprints: FP rate is ~1e-4-scale, far below bloom's
    fp = ann.loc[~truly_seen, "maybe_seen"].mean()
    assert fp < 0.01, f"fp rate {fp}"

    plain = set(
        r["url"]
        for r in candidates.join(
            seen.select("url_hash", "url"), ["url_hash", "url"], "left_anti"
        ).collect()
    )
    accel = set(
        r["url"]
        for r in anti_join_with_cuckoo(candidates, seen, d).collect()
    )
    assert accel == plain
    assert len(accel) == 2000


def test_cuckoo_delete_enables_recrawl(spark, tmp_path):
    """The capability bloom lacks: evict a URL cohort in O(batch) so it
    re-enters the crawlable set, without touching the other 90%."""
    d = str(tmp_path / "ckdel")
    update_cuckoo_shards(_seen_df(spark, range(0, 2000)), d)
    cohort = _seen_df(spark, range(500, 700))
    assert delete_cuckoo_shards(cohort, d) == 200

    ann = cuckoo_annotate(
        _seen_df(spark, range(0, 2000)).drop("first_seen_round"), d
    ).toPandas()
    n = ann["url"].str.removeprefix("https://x/").astype(int)
    evicted = (n >= 500) & (n < 700)
    # kept keys: hard no-false-negative guarantee
    assert ann.loc[~evicted, "maybe_seen"].all()
    # evicted keys: gone up to fingerprint-collision FPs
    assert ann.loc[evicted, "maybe_seen"].mean() < 0.05

    # recrawl flow end-to-end: drop the cohort from url_seen AND the
    # filter → the accelerated anti-join readmits exactly the cohort.
    seen_after = _seen_df(spark, range(0, 2000)).filter(
        ~((F.col("url_hash").isNotNull())
          & (F.substring("url", 11, 10).cast("int") >= 500)
          & (F.substring("url", 11, 10).cast("int") < 700))
    )
    candidates = _seen_df(spark, range(0, 2000)).drop("first_seen_round")
    plain = set(
        r["url"]
        for r in candidates.join(
            seen_after.select("url_hash", "url"), ["url_hash", "url"], "left_anti"
        ).collect()
    )
    accel = set(
        r["url"]
        for r in anti_join_with_cuckoo(candidates, seen_after, d).collect()
    )
    assert accel == plain
    assert len(accel) == 200


def test_cuckoo_duplicate_copy_accounting():
    """Insert twice / delete once ⇒ still present; delete twice ⇒ gone
    (pure numpy, single shard)."""
    rng = np.random.default_rng(11)
    p = CuckooParams(n_shards=1, n_buckets=1 << 10)
    table = np.zeros((p.n_buckets, 4), dtype=np.uint16)
    stash = np.zeros(0, dtype=np.uint64)
    keys = rng.integers(0, 2**63, size=1500, dtype=np.uint64)
    stash = _insert_batch(table, stash, keys, p)
    dup = keys[:200]
    stash = _insert_batch(table, stash, dup, p)
    stash, n1 = _delete_batch(table, stash, dup, p)
    assert n1 == 200
    assert _contains(table, stash, keys, p).all(), "FN after deleting one copy"
    stash, n2 = _delete_batch(table, stash, dup, p)
    assert n2 == 200
    assert _contains(table, stash, dup, p).mean() < 0.05
    assert _contains(table, stash, keys[200:], p).all()


def test_cuckoo_overflow_stash_keeps_no_fn_guarantee():
    """Past the sizing load factor the filter must degrade to more FPs,
    never to a false negative: overfill to ~99% so eviction walks fail
    and the stash absorbs the homeless fingerprints."""
    rng = np.random.default_rng(3)
    p = CuckooParams(n_shards=1, n_buckets=1 << 10)  # 4096 slots
    table = np.zeros((p.n_buckets, 4), dtype=np.uint16)
    stash = np.zeros(0, dtype=np.uint64)
    keys = rng.integers(0, 2**63, size=4500, dtype=np.uint64)
    stash = _insert_batch(table, stash, keys, p)
    assert (table != 0).sum() + len(stash) >= 4500 * 0.99
    assert len(stash) > 0, "overload should spill to the stash"
    assert _contains(table, stash, keys, p).all(), "FN under overload"


def test_cuckoo_params_sizing_and_mismatch(spark, tmp_path):
    p = params_for(10_000_000)
    # 0.66 target load: slots must cover expected_n with ≥1.3x headroom
    assert p.n_shards * p.n_buckets * 4 >= 10_000_000 * 1.3
    d = str(tmp_path / "ckp")
    update_cuckoo_shards(
        _seen_df(spark, range(50)), d, CuckooParams(n_shards=4, n_buckets=1 << 10)
    )
    assert load_params(d).n_shards == 4
    with pytest.raises(ValueError, match="mismatch"):
        cuckoo_annotate(
            _seen_df(spark, range(5)).drop("first_seen_round"),
            d,
            CuckooParams(n_shards=8, n_buckets=1 << 10),
        )


def test_crawl_with_cuckoo_matches_plain(spark, sf_small, tmp_path):
    from pyppeteer_scraper_spark.plans.checkpoint import crawl
    from pyppeteer_scraper_spark.sources.datagen import generate_crawl_tables

    t = generate_crawl_tables(spark, sf_small)
    plain = crawl(
        spark, t["pages"], t["seeds"], t["robots"], 3, str(tmp_path / "plain")
    )
    cuckooed = crawl(
        spark, t["pages"], t["seeds"], t["robots"], 3, str(tmp_path / "ck"),
        use_bloom=True, seen_filter="cuckoo",
    )
    a = sorted(
        (r["url"], r["first_seen_round"]) for r in plain.state.url_seen.collect()
    )
    b = sorted(
        (r["url"], r["first_seen_round"])
        for r in cuckooed.state.url_seen.collect()
    )
    assert a == b
    fa = sorted((r["url"], r["state"]) for r in plain.state.frontier.collect())
    fb = sorted((r["url"], r["state"]) for r in cuckooed.state.frontier.collect())
    assert fa == fb
