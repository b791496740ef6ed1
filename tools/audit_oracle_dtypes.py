"""Audit oracle output dtypes against the Spark side.

The driver's value hash is dtype-sensitive in one known way: DuckDB's
integer ``sum()`` returns HUGEINT (int128), which lands in pandas as
``object``/``Decimal`` and hashes differently from Spark's int64 even
when every value is equal (this made the round-3 driver rows for
pack_sequences and d6_adaptive_revisit red while rows/schema matched).

This tool runs every oracle on DuckDB and its twin on Spark at a small
SF and reports any column whose pandas dtype *kind* differs — intended
to be run after adding oracles, before a driver round.

Usage: python tools/audit_oracle_dtypes.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyppeteer_scraper_spark.sources.tables import TABLE_NAMES  # noqa: E402


def kind(s: pd.Series) -> str:
    if pd.api.types.is_datetime64_any_dtype(s):
        return "ts"
    k = s.dtype.kind
    if k == "O":
        # object column of ints/Decimals = a HUGEINT leak; of strings = fine
        non_null = s.dropna()
        if len(non_null) and all(isinstance(v, str) for v in non_null.head(20)):
            return "str"
        if len(non_null) and all(
            isinstance(v, (int,)) or type(v).__name__ == "Decimal"
            for v in non_null.head(20)
        ):
            return "INT-AS-OBJECT"
        return "obj"
    return {"i": "int", "u": "int", "f": "float", "b": "bool"}.get(k, k)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_mod", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyppeteer_scraper_spark.session import get_spark

    spark = get_spark("dtype-audit", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = mod.queries()
    oracles = mod.oracle_sql()
    bad = []
    for name, sql in oracles.items():
        if name_filter and name_filter not in name:
            continue
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"ERR  {name}: duckdb {type(e).__name__}: {e}")
            bad.append(name)
            continue
        try:
            got = queries[name](spark, sf_dir).toPandas()
        except Exception as e:
            print(f"ERR  {name}: spark {type(e).__name__}: {e}")
            bad.append(name)
            continue
        mismatches = []
        for c in sorted(set(got.columns) & set(want.columns)):
            kg, kw = kind(got[c]), kind(want[c])
            # empty-result object columns are indistinguishable; skip
            if kg != kw and not (len(got) == 0 or len(want) == 0):
                mismatches.append(f"{c}: spark={kg}({got[c].dtype}) oracle={kw}({want[c].dtype})")
        hug = [c for c in want.columns if kind(want[c]) == "INT-AS-OBJECT"]
        if mismatches or hug:
            print(f"BAD  {name}: {'; '.join(mismatches)}"
                  + (f"  HUGEINT-leak: {hug}" if hug else ""))
            bad.append(name)
        else:
            print(f"ok   {name}")
    print(f"\n{len(bad)} oracles with dtype drift: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
