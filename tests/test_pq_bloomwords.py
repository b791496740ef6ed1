"""Product quantization (operators/pq.py) and the word-packed bloom
export (operators/bloom.py::bloom_shard_words)."""

import numpy as np
from pyspark.sql import functions as F

from pyppeteer_scraper_spark.operators.bloom import bloom_shard_words
from pyppeteer_scraper_spark.operators.pq import (
    pq_encode_adc,
    pq_sample_codebook,
)
from pyppeteer_scraper_spark.sources.tables import load_table


def test_pq_codebook_vectors_encode_to_themselves(spark, sf_med):
    """Every codebook source vector (vec_id < k) is at distance 0 from
    its own codeword in every subspace, so its code must be its own id
    — the zero-quantization-error fixed point of the encoder."""
    emb = load_table(spark, sf_med, "embeddings")
    cb = pq_sample_codebook(emb, n_sub=4, k=16)
    assert cb.shape == (4, 16, 16)
    q = np.zeros(64)
    enc = pq_encode_adc(emb.filter(F.col("vec_id") < 16), cb, q)
    for r in enc.collect():
        assert r["codes"] == [r["vec_id"]] * 4, r


def test_pq_adc_is_exact_for_codebook_vectors(spark, sf_med):
    """For a vector that IS a codebook entry the quantizer is lossless,
    so the ADC estimate to the query equals the true squared distance
    exactly (up to float64 summation order)."""
    emb = load_table(spark, sf_med, "embeddings")
    cb = pq_sample_codebook(emb, n_sub=4, k=16)
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.filter(F.col("vec_id") < 32).collect()
    }
    q = vecs[3]
    enc = pq_encode_adc(emb.filter(F.col("vec_id") < 16), cb, q)
    for r in enc.collect():
        true_d2 = float(((vecs[r["vec_id"]] - q) ** 2).sum())
        assert abs(r["approx_d2"] - true_d2) < 1e-9, (r, true_d2)


def test_pq_adc_tracks_true_distance(spark, sf_med):
    """Lossy regime: over the whole corpus the ADC estimate must rank
    vectors broadly like the true distance (rank correlation well
    above chance) and be nonnegative."""
    emb = load_table(spark, sf_med, "embeddings")
    cb = pq_sample_codebook(emb, n_sub=4, k=16)
    rows = emb.orderBy("vec_id").collect()
    q = np.asarray(rows[0]["embedding"], dtype=np.float64)
    enc = {
        r["vec_id"]: r["approx_d2"]
        for r in pq_encode_adc(emb, cb, q).collect()
    }
    true = {
        r["vec_id"]: float(
            ((np.asarray(r["embedding"], dtype=np.float64) - q) ** 2).sum()
        )
        for r in rows
    }
    ids = sorted(true)
    a = np.argsort(np.argsort([enc[i] for i in ids]))
    b = np.argsort(np.argsort([true[i] for i in ids]))
    n = len(ids)
    rho = 1 - 6 * float(((a - b) ** 2).sum()) / (n * (n * n - 1))
    # untrained sample codebook over near-isotropic random embeddings
    # is the WORST regime for PQ (quantization error ~ signal);
    # measured rho ~0.48 here — assert well above chance, not a
    # trained-codebook bar
    assert rho > 0.3, rho
    assert all(v >= 0 for v in enc.values())
    # anchor: the query IS vec 0, a codebook vector (lossless cell),
    # so its ADC estimate is exactly 0 and it ranks first
    assert enc[0] == 0.0
    assert min(enc, key=lambda i: (enc[i], i)) == 0


def test_bloom_words_have_no_false_negatives(spark, sf_small):
    """Reconstruct the bitmaps from the exported words and verify every
    key's k positions are set in its shard — the bloom no-false-
    negative contract, checked through the EXPORTED artifact (the same
    md5-slice hashing reimplemented in numpy/python)."""
    import hashlib

    docs = load_table(spark, sf_small, "documents")
    urls = docs.select(
        F.concat(F.lit("https://d/"), F.col("doc_id").cast("string")).alias(
            "url"
        )
    )
    n_shards, m_bits, k = 4, 1024, 3
    words = bloom_shard_words(
        urls, n_shards=n_shards, m_bits=m_bits, k_hashes=k, salt="t"
    ).collect()
    bitmaps = {s: np.zeros(m_bits, dtype=bool) for s in range(n_shards)}
    for r in words:
        assert 0 <= r["word_val"] < 2**32
        for b in range(32):
            if r["word_val"] >> b & 1:
                bitmaps[r["shard"]][r["word_idx"] * 32 + b] = True
    n_keys = 0
    for u in urls.collect():
        hx = hashlib.md5(("t\x1f" + u["url"]).encode()).hexdigest()
        shard = int(hx[:8], 16) % n_shards
        for i in range(k):
            pos = int(hx[8 + i * 6 : 14 + i * 6], 16) % m_bits
            assert bitmaps[shard][pos], (u["url"], shard, pos)
        n_keys += 1
    assert n_keys > 0
    # and the filter is not degenerate-full: some bits remain clear
    assert sum(bm.sum() for bm in bitmaps.values()) < n_shards * m_bits
