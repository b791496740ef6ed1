"""Local stand-in for the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() twin on DuckDB over the
same parquet, compare row count + sorted-column values.

Usage: python tools/check_correctness.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyppeteer_scraper_spark.sources.tables import TABLE_NAMES  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(6)
        elif s.dtype == object:
            df[c] = s.astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_mod", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyppeteer_scraper_spark.session import get_spark

    spark = get_spark("correctness", cores=8, shuffle_partitions=8)

    con = duckdb.connect()
    # Pin the session TZ: strptime('%z')→TIMESTAMP casts convert via the
    # session TimeZone; Spark is pinned to UTC, so DuckDB must be too or
    # s_tz_offset_normalize spuriously fails on non-UTC hosts.
    con.execute("SET TimeZone='UTC'")
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = mod.queries()
    oracles = mod.oracle_sql()
    failures = []
    # name_filter: comma-separated substrings (ANY match keeps the
    # query).  A filter that matches nothing is an ERROR, not a green
    # run — a typo'd filter once skipped everything and printed n/n OK.
    pats = [p for p in name_filter.split(",") if p] if name_filter else []
    selected = {
        name: fn
        for name, fn in queries.items()
        if not pats or any(p in name for p in pats)
    }
    if not selected:
        print(f"filter {name_filter!r} matched 0 of {len(queries)} queries")
        return 2
    if pats:
        print(f"filter {name_filter!r}: {len(selected)}/{len(queries)} queries")
    for name, fn in selected.items():
        try:
            got = normalize(fn(spark, sf_dir).toPandas())
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(got)} rows")
            continue
        try:
            want = normalize(con.execute(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            failures.append(name)
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}")
            failures.append(name)
            continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=1e-6, atol=1e-9)
        except AssertionError as e:
            print(f"FAIL {name}: values differ\n{str(e)[:500]}")
            diff_mask = (got != want).any(axis=1)
            print(got[diff_mask].head(3))
            print(want[diff_mask].head(3))
            failures.append(name)
            continue
        print(f"OK   {name}: {len(got)} rows")

    print(f"\n{len(selected) - len(failures)}/{len(selected)} OK")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
