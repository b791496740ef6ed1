"""Sharded bloom-filter URL-seen sidecar (north_rule: "URL-seen dedup
via a sharded bloom/cuckoo filter maintained per partition").

Role at scale: the exact left-anti join against ``url_seen`` shuffles
candidate URLs against a 10^10-row table every round.  A per-shard
bloom filter — shard = pmod(url_hash, n_shards), host-aligned with the
frontier's partitioning — answers "definitely unseen" locally for the
overwhelming majority of fresh links, so only bloom-positives (true
seen + false positives at rate ~(1-e^{-kn/m})^k) reach the exact
anti-join.  False positives are corrected by that exact join; false
negatives are impossible, so results are byte-identical with or
without the bloom (asserted in tests).

Shards are numpy bit arrays persisted per round (the parquet-sidecar
analog of an Iceberg puffin blob), built/updated incrementally from
each round's url_seen delta inside ``applyInPandas`` — vectorized
double hashing, no per-row Python.

Reference analog: the whole-file JSON seen-set re-read every run
(/root/reference/service/alert.py:460-490) — the thing this replaces.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SHARDS = 16
DEFAULT_BITS = 1 << 20  # 1 Mi bits/shard ≈ 131 KiB packed
DEFAULT_K = 4


def _indices(hashes: np.ndarray, m: int, k: int) -> np.ndarray:
    """k bit positions per hash via Kirsch-Mitzenmacher double hashing
    (h1 + i*h2 mod m), fully vectorized."""
    h = hashes.astype(np.uint64)
    h1 = h % np.uint64(m)
    h2 = ((h >> np.uint64(33)) | (h << np.uint64(31))) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * (h2[:, None] % np.uint64(m))) % np.uint64(m)).astype(
        np.int64
    )


def _shard_path(bloom_dir: str, shard: int) -> str:
    return os.path.join(bloom_dir, f"shard={shard}.npz")


def _load_shard(bloom_dir: str, shard: int, m: int) -> np.ndarray:
    path = _shard_path(bloom_dir, shard)
    if os.path.exists(path):
        return np.unpackbits(np.load(path)["bits"]).astype(bool)[:m]
    return np.zeros(m, dtype=bool)


def _save_shard(bloom_dir: str, shard: int, bits: np.ndarray) -> None:
    os.makedirs(bloom_dir, exist_ok=True)
    np.savez_compressed(_shard_path(bloom_dir, shard), bits=np.packbits(bits))


def update_bloom_shards(
    url_seen_delta: DataFrame,
    bloom_dir: str,
    n_shards: int = DEFAULT_SHARDS,
    m: int = DEFAULT_BITS,
    k: int = DEFAULT_K,
) -> int:
    """OR this round's url_hash delta into the persisted shards.
    Returns the number of hashes inserted.

    Each shard group is processed by one task that loads its bit
    array, sets bits for its batch, and writes it back — O(delta)
    work per round, never O(history).
    """
    def upd(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        bits = _load_shard(bloom_dir, shard, m)
        idx = _indices(pdf["url_hash"].to_numpy(), m, k)
        bits[idx.ravel()] = True
        _save_shard(bloom_dir, shard, bits)
        return pd.DataFrame({"shard": [shard], "n": [len(pdf)]})

    delta = url_seen_delta.select(
        "url_hash", F.pmod(F.col("url_hash"), F.lit(n_shards)).alias("shard")
    )
    out = delta.groupBy("shard").applyInPandas(upd, "shard int, n long")
    return sum(r["n"] for r in out.collect())


def bloom_annotate(
    candidates: DataFrame,
    bloom_dir: str,
    n_shards: int = DEFAULT_SHARDS,
    m: int = DEFAULT_BITS,
    k: int = DEFAULT_K,
    hash_col: str = "url_hash",
) -> DataFrame:
    """Add ``maybe_seen`` (bool): False ⇒ definitely unseen (no exact
    join needed); True ⇒ check exactly."""
    def test(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["__shard"].iloc[0])
        bits = _load_shard(bloom_dir, shard, m)
        idx = _indices(pdf[hash_col].to_numpy(), m, k)
        pdf = pdf.drop(columns="__shard")
        pdf["maybe_seen"] = bits[idx].all(axis=1)
        return pdf

    from pyspark.sql import types as T

    # fresh StructType — .add() mutates the DataFrame's cached schema
    schema = T.StructType(
        list(candidates.schema.fields)
        + [T.StructField("maybe_seen", T.BooleanType())]
    )
    return (
        candidates.withColumn("__shard", F.pmod(F.col(hash_col), F.lit(n_shards)))
        .groupBy("__shard")
        .applyInPandas(test, schema)
    )


def anti_join_with_bloom(
    candidates: DataFrame,
    url_seen: DataFrame,
    bloom_dir: str,
    n_shards: int = DEFAULT_SHARDS,
    m: int = DEFAULT_BITS,
    k: int = DEFAULT_K,
    caches: list | None = None,
) -> DataFrame:
    """candidates ∖ url_seen, bloom-accelerated and exactly equal to the
    plain left-anti join: bloom-negatives pass straight through; only
    bloom-positives pay the exact anti-join shuffle.

    ``annotated`` is cached because both branches (fresh / suspect)
    filter it — uncached, the bloom probe and its whole upstream
    lineage (canonicalize UDF, link explode) would run twice.  The
    handle is appended to ``caches`` so the caller's round-level
    unpersist sweep releases it.
    """
    annotated = bloom_annotate(candidates, bloom_dir, n_shards, m, k).cache()
    if caches is not None:
        caches.append(annotated)
    fresh = annotated.filter(~F.col("maybe_seen")).drop("maybe_seen")
    suspect = annotated.filter(F.col("maybe_seen")).drop("maybe_seen")
    verified = suspect.join(
        url_seen.select("url_hash", "url"), ["url_hash", "url"], "left_anti"
    )
    return fresh.unionByName(verified)
