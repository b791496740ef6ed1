"""Frontier-only leg of bench.py — the full-crawl scaling measurement
without the 44-query analytical suite, so a pinned N-vs-4N pair fits
inside one host window (the suite adds ~10 min/leg and measures job
latency, not the crawl path).

Prints one JSON line; knobs: $SPARK_GRAFT_CPUS, $SPARK_GRAFT_SF_DIR,
$SPARK_GRAFT_BENCH_REP, $SPARK_GRAFT_BENCH_ROUNDS.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(REPO, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    from pyppeteer_scraper_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench-frontier", cores=cpus)
    out = bench.bench_frontier(spark, sf_dir)
    out["cpus"] = cpus
    print(json.dumps(out))


if __name__ == "__main__":
    main()
