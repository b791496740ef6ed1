"""Relational sidecar-scheme bloom export == numpy sidecar, bit for
bit, and resume-from-rows (operators/bloom.py)."""

import shutil
import tempfile

import numpy as np
from pyspark.sql import functions as F

from pyppeteer_scraper_spark.operators.bloom import (
    BloomParams,
    LocalShardStore,
    _load_shard,
    bloom_annotate,
    bloom_words_sidecar_scheme,
    load_bloom_shards_from_words,
    update_bloom_shards,
)
from pyppeteer_scraper_spark.sources.tables import load_table


def _hashes(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    return docs.select(
        F.xxhash64(
            F.concat(F.lit("https://d.example/"), F.col("doc_id"))
        ).alias("url_hash")
    )


def test_relational_scheme_matches_numpy_sidecar_bit_for_bit(
    spark, sf_small
):
    """bloom_words_sidecar_scheme (pure codegen, signed-int64
    arithmetic) must reproduce the EXACT bitmaps update_bloom_shards
    (numpy uint64 double hashing) writes — every shard, every bit —
    and load_bloom_shards_from_words must rebuild working npz shards
    from the rows alone."""
    params = BloomParams(n_shards=4, m=1 << 12, k=4)
    hashes = _hashes(spark, sf_small)
    da = tempfile.mkdtemp(prefix="bloom_a_")
    db = tempfile.mkdtemp(prefix="bloom_b_")
    try:
        update_bloom_shards(hashes, da, params)
        words = bloom_words_sidecar_scheme(
            hashes, n_shards=params.n_shards, m=params.m, k=params.k
        )
        n_set = load_bloom_shards_from_words(words, db, params)
        assert n_set > 0
        sa, sb = LocalShardStore(da), LocalShardStore(db)
        total = 0
        for shard in range(params.n_shards):
            ba = _load_shard(sa, shard, params.m)
            bb = _load_shard(sb, shard, params.m)
            assert ba.any(), shard  # every shard got keys
            assert np.array_equal(ba, bb), f"shard {shard} bitmap differs"
            total += int(ba.sum())
        assert total == n_set
        # and the reconstructed store serves probes identically
        cand = hashes.limit(200).withColumn(
            "url", F.col("url_hash").cast("string")
        )
        ann_a = {
            r["url_hash"]: r["maybe_seen"]
            for r in bloom_annotate(cand, da, params).collect()
        }
        ann_b = {
            r["url_hash"]: r["maybe_seen"]
            for r in bloom_annotate(cand, db, params).collect()
        }
        assert ann_a == ann_b
        # inserted keys can never be bloom-negative
        assert all(ann_a.values())
    finally:
        shutil.rmtree(da, ignore_errors=True)
        shutil.rmtree(db, ignore_errors=True)


def test_bloom_shard_words_validates_envelope(spark):
    """ADVICE r04: k_hashes > 4 would read past md5's 32 hex chars and
    m_bits > 2^24 would alias the 24-bit position slices — both must
    raise, not silently corrupt the filter."""
    import pytest

    from pyppeteer_scraper_spark.operators.bloom import bloom_shard_words

    df = spark.createDataFrame([("http://a/",)], ["url"])
    with pytest.raises(ValueError, match="k_hashes"):
        bloom_shard_words(df, k_hashes=5)
    with pytest.raises(ValueError, match="m_bits"):
        bloom_shard_words(df, m_bits=(1 << 24) + 32)
    with pytest.raises(ValueError, match="n_shards"):
        bloom_shard_words(df, n_shards=0)
    # the documented envelope still works
    assert bloom_shard_words(df, k_hashes=4, m_bits=1 << 10).count() > 0
