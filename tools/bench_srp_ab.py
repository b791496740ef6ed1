"""A/B: banded-SRP near-dup candidate shuffle carrying ids-only
(current, round 3) vs. carrying unit vectors through the band join +
pair dedup (round-2 form).  Same results required; prints one JSON line
with wall times and the result checksum.

Usage: python tools/bench_srp_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def near_dups_carry_vectors(df, threshold=0.95, id_col="vec_id",
                            vec_col="embedding", n_planes=96, n_bands=12):
    """The round-2 plan shape: both sides of the L-way band join and the
    (a,b) group-by carry dim-sized unit vectors."""
    import pandas as pd
    import numpy as np
    from pyspark.sql import types as T

    from pyppeteer_scraper_spark.operators.similarity import (
        srp_band_keys,
        with_unit_norm,
    )

    u = with_unit_norm(df, vec_col).select(F.col(id_col), F.col("unit"))
    sig = srp_band_keys(u, "unit", n_planes=n_planes, n_bands=n_bands)
    e = sig.select(F.col(id_col), "unit", F.explode("bands").alias("key"))
    a = e.select(F.col(id_col).alias("a"), F.col("unit").alias("ua"), "key")
    b = e.select(F.col(id_col).alias("b"), F.col("unit").alias("ub"), "key")
    cand = (
        a.join(b, "key")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.first("ua").alias("ua"), F.first("ub").alias("ub"))
    )

    @F.pandas_udf(T.DoubleType())
    def pair_dot(ua: pd.Series, ub: pd.Series) -> pd.Series:
        if not len(ua):
            return pd.Series([], dtype=float)
        ma = np.stack([np.asarray(v, dtype=np.float64) for v in ua])
        mb = np.stack([np.asarray(v, dtype=np.float64) for v in ub])
        return pd.Series(np.einsum("ij,ij->i", ma, mb))

    return (
        cand.withColumn("cosine", F.round(pair_dot("ua", "ub"), 6))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def checksum(df):
    row = df.agg(
        F.count("*").alias("n"),
        F.bit_xor(F.xxhash64("a", "b", F.col("cosine").cast("string"))).alias("h"),
    ).first()
    return (row["n"], row["h"])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyppeteer_scraper_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )
    from pyppeteer_scraper_spark.session import get_spark
    from pyppeteer_scraper_spark.sources.tables import load_table

    spark = get_spark("srp-ab", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    emb = load_table(spark, sf_dir, "embeddings")
    emb.cache().count()

    def timed(fn):
        best, ck = float("inf"), None
        for _ in range(reps):
            t0 = time.time()
            ck = checksum(fn(emb))
            best = min(best, time.time() - t0)
        return best, ck

    t_ids, ck_ids = timed(embedding_near_dup_pairs)
    t_vec, ck_vec = timed(near_dups_carry_vectors)
    emb.unpersist()
    assert ck_ids == ck_vec, f"results differ: {ck_ids} vs {ck_vec}"
    print(
        json.dumps(
            {
                "metric": "srp_near_dup_ids_only_ab",
                "sf_dir": sf_dir,
                "pairs": ck_ids[0],
                "ids_only_sec": round(t_ids, 3),
                "carry_vectors_sec": round(t_vec, 3),
                "speedup": round(t_vec / t_ids, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
