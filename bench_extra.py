"""Round-6 optimization harness (guide §1.4/§1.5) — NOT the driver
bench.  Times individual registry queries with the noop sink under job
descriptions and captures ``.explain("formatted")`` per query, so each
optimization's before/after evidence (seconds + plan shape) is
reproducible.  ``bench.py`` stays frozen; this file only cites numbers
into OPTIMIZATION_r06.md.

Usage:
  python bench_extra.py [--tag before|after] [--reps N] [--sf DIR] name...
Prints one JSON line {name: [sec, ...]} and writes
plans/r06/<name>_<tag>.txt when --tag is given.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default=None)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                       "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from pyppeteer_scraper_spark.session import get_spark

    spark = get_spark(
        "bench_extra", cores=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_mod", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    queries = mod.queries()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # session warm-up (JVM/codegen/python workers)
    force(queries["q6_forecast_revenue"](spark, args.sf))

    out: dict[str, list[float]] = {}
    for name in args.names:
        fn = queries[name]
        if args.tag:
            plan_dir = os.path.join(REPO, "plans", "r06")
            os.makedirs(plan_dir, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, args.sf).explain("formatted")
            with open(
                os.path.join(plan_dir, f"{name}_{args.tag}.txt"), "w"
            ) as fh:
                fh.write(buf.getvalue())
        times = []
        for r in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.time()
            force(fn(spark, args.sf))
            times.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = times
        print(f"# {name}: {times}", file=sys.stderr, flush=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
