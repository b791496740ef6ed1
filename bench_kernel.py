"""Scheduling-kernel benchmark — the north-rule metric in isolation.

Times one pass of the frontier's per-URL work over a synthetic
multi-million-URL universe: canonicalize (pandas UDF) → robots gate
(broadcast join) → politeness selection (count-gated two-phase top-k)
→ seen-set anti-join → page extraction (mapInPandas).  No checkpoint
I/O — this measures URLs scheduled+deduped/sec of the compute path, the
part that a cluster scales with executors (state I/O scales with
HDFS/S3 throughput instead).

Prints one JSON line.  Knobs: $SPARK_GRAFT_CPUS, $KERNEL_URLS.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from pyppeteer_scraper_spark.functions.canonicalize import with_canonical_url
    from pyppeteer_scraper_spark.plans.extract import extract_pages
    from pyppeteer_scraper_spark.session import get_spark

    cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n = int(os.environ.get("KERNEL_URLS", "24000000"))
    spark = get_spark("kernel", cores=cores)

    # URL universe: variant spellings, 30% mega-host skew.
    raw = (
        spark.range(n)
        .select(
            F.concat(
                F.lit("https://"),
                F.when(F.pmod("id", F.lit(10)) < 3, F.lit("MEGA-host.example"))
                .otherwise(
                    F.concat(
                        F.lit("site-"),
                        F.pmod("id", F.lit(197)).cast("string"),
                        F.lit(".example"),
                    )
                ),
                F.lit("/p"),
                F.col("id").cast("string"),
                F.when(F.pmod("id", F.lit(4)) == 0, F.lit("?utm_source=x")).otherwise(
                    F.lit("")
                ),
            ).alias("url"),
            F.pmod("id", F.lit(2)).cast("int").alias("priority"),
            F.lit(0).cast("int").alias("depth"),
            F.timestamp_seconds(F.lit(1767225600) + F.pmod("id", F.lit(1000))).alias(
                "discovered_ts"
            ),
        )
        .cache()
    )
    raw.count()

    seen = (
        spark.range(0, n, 2)
        .select(
            F.xxhash64(F.concat(F.lit("k"), F.col("id").cast("string"))).alias(
                "url_hash"
            ),
            F.concat(F.lit("https://x/"), F.col("id").cast("string")).alias("url"),
        )
        .cache()
    )
    seen.count()

    # Realistic politeness budgets (a crawl cap is 10^3-ish per round,
    # not 10^5 — the cap IS the skew defence): every domain exceeds its
    # cap here, so the full two-phase ranked path is what gets timed.
    # crawl_delay_ms values are deliberately NON-binding here
    # (floor(ROUND_INTERVAL_MS/delay) ≥ max_per_round), so the delay
    # enforcement doesn't shrink the scheduled batch and the benchmark
    # keeps timing the full ranked path at the same workload.
    robots = spark.createDataFrame(
        [("mega-host.example", True, 20, 2000)]
        + [(f"site-{i}.example", i % 20 != 0, 50, 1000) for i in range(197)],
        "domain string, allow boolean, crawl_delay_ms long, max_per_round int",
    )

    # extraction corpus: n/16 pages at realistic ~4 KB page size
    # (tiny toy pages make the stage serde-bound and hide scaling)
    n_pages = n // 16
    body = (
        "the quick brown corpus text with several repeated tokens and "
        "some entropy present in every crawled page body " * 16
    )
    # numPartitions at generation — a .repartition here would shuffle
    # ~6 GB of html through local disk and dominate the measurement
    pages = spark.range(n_pages, numPartitions=int(cores) * 4).select(
        F.concat(F.lit("https://s.example/p"), F.col("id").cast("string")).alias("url"),
        F.encode(
            F.concat(
                F.lit("<html><head><title>Doc "),
                F.col("id").cast("string"),
                F.lit("</title></head><body><p>" + body),
                F.col("id").cast("string"),
                F.lit('</p><a href="https://s.example/a">x</a>'
                      '<a href="https://s.example/b?utm_source=x">y</a>'
                      '<a href="https://s.example/c">z</a></body></html>'),
            ),
            "utf-8",
        ).alias("html"),
        F.lit("en").alias("lang"),
    )

    # warm python workers + codegen
    with_canonical_url(raw.limit(2000)).count()
    extract_pages(pages.limit(2000)).count()

    # The engine's own politeness operator (cached single-pass window
    # branches) — this times the REAL select_batch code path.
    from pyppeteer_scraper_spark.plans.round import select_batch

    t0 = time.time()
    # canon stays lazy: select_batch's internal cache materializes the
    # canonicalize exactly once (dom_counts aggregates before the cache
    # exists, but that pass prunes to 4 columns)
    canon = with_canonical_url(raw)
    batch, blocked, still_pending, caches = select_batch(canon, robots, expected_domains=198)
    fresh = batch.join(seen, ["url_hash", "url"], "left_anti")
    n_out = fresh.count()
    t_sched = time.time() - t0
    for df in caches:
        df.unpersist()
    canon.unpersist()
    raw.unpersist()
    seen.unpersist()

    t1 = time.time()
    extract_pages(pages).write.format("noop").mode("overwrite").save()
    t_extract = time.time() - t1

    total = t_sched + t_extract
    print(
        json.dumps(
            {
                "metric": "kernel_urls_per_sec",
                "value": round(n / t_sched, 1),
                "unit": "urls/sec",
                "cpus": cores,
                "n_urls": n,
                "n_scheduled": n_out,
                "sched_seconds": round(t_sched, 2),
                "extract_pages": n // 16,
                "extract_seconds": round(t_extract, 2),
                "extract_pages_per_sec": round((n // 16) / t_extract, 1),
                "total_seconds": round(total, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
