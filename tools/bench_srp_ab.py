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
    from pyppeteer_scraper_spark.plans.queries import _near_dup_corpus
    from pyppeteer_scraper_spark.session import get_spark

    spark = get_spark("srp-ab", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    # planted-near-dup corpus (the raw synthetic embeddings have no
    # pairs ≥ 0.95 — the registry query uses the same corpus)
    emb = _near_dup_corpus(spark, sf_dir)
    emb.cache().count()

    def timed(fn):
        best, ck = float("inf"), None
        for _ in range(reps):
            t0 = time.time()
            ck = checksum(fn(emb))
            best = min(best, time.time() - t0)
        return best, ck

    t_ids, ck_ids = timed(embedding_near_dup_pairs)
    t_vec, ck_vec = timed(
        lambda d: embedding_near_dup_pairs(d, carry_vectors=True)
    )
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
