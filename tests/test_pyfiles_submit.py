"""Deployment-surface check: the package runs via
`spark-submit --py-files pyppeteer_scraper_spark.zip job.py` with NO
repo checkout available to the job — the path a real multi-executor
cluster uses (north star: "Runs via spark-submit --py-files on
multi-executor clusters").

The probe job exercises a pandas UDF (canonicalize) so the zip must
reach the executors' Python workers, not just the driver — the exact
failure mode a driver-only PYTHONPATH fix would mask.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = textwrap.dedent(
    """
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pyppeteer_scraper_spark.functions.canonicalize import canonicalize_udf

    spark = (
        SparkSession.builder.master("local[2]")
        .appName("pyfiles-probe")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    df = spark.createDataFrame(
        [("HTTPS://Example.COM:443/b/?utm_source=x&id=1#frag",),
         ("https://example.com/b/?id=1",)],
        ["url"],
    ).withColumn("canon", canonicalize_udf(F.col("url")))
    rows = sorted(r["canon"] for r in df.collect())
    assert rows[0] == rows[1], rows
    print("PYFILES_PROBE_OK", rows[0])
    spark.stop()
    """
)


def _spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    for p in ("/opt/spark/bin/spark-submit",):
        if os.path.exists(p):
            return p
    return None


def test_spark_submit_pyfiles(tmp_path):
    submit = _spark_submit()
    if submit is None:
        import pytest

        pytest.skip("spark-submit not on PATH")

    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from make_pyfiles import build
    finally:
        sys.path.pop(0)
    zip_path = build(str(tmp_path / "pyppeteer_scraper_spark.zip"))
    job = tmp_path / "job.py"
    job.write_text(JOB)

    env = dict(os.environ)
    # the job must see the package ONLY through --py-files
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [submit, "--py-files", zip_path, str(job)],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "PYFILES_PROBE_OK" in out.stdout, (out.stdout, out.stderr[-2000:])
