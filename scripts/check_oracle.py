"""Local approximation of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01, converts both to pandas, sorts columns by name and
rows by value, and compares a dtype-sensitive CSV representation — so an
int64-vs-float64 (or Decimal) mismatch shows up even when the values are
numerically equal, mirroring the driver's value-hash.

Usage: python scripts/check_oracle.py [query_name ...]
"""

from __future__ import annotations

import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.to_csv(index=False, float_format="%.9g")


def main() -> int:
    only = set(sys.argv[1:])
    entry_mod = importlib.import_module("__spark_entry__")
    from snowy_json_spark.session import get_spark

    spark = get_spark("check-oracle", cores=4)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    sf = "/root/testdata/sf0.01"
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    oracles = entry_mod.oracle_sql()
    bad = 0
    for name, fn in entry_mod.queries().items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf).toPandas()
        except Exception as e:  # noqa: BLE001 — report, keep checking
            print(f"{name}: SPARK ERROR {e}")
            bad += 1
            continue
        if name not in oracles:
            print(f"{name}: rows-only ({len(got)} rows)")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {e}")
            bad += 1
            continue
        rows_ok = len(got) == len(want)
        cols_ok = sorted(got.columns) == sorted(want.columns)
        hash_ok = cols_ok and canon(got) == canon(want)
        status = "OK" if (rows_ok and cols_ok and hash_ok) else "FAIL"
        print(
            f"{name}: {status} rows={rows_ok}({len(got)}/{len(want)}) "
            f"cols={cols_ok} hash={hash_ok}"
        )
        if status == "FAIL":
            bad += 1
            if not hash_ok and cols_ok and rows_ok:
                g, w = canon(got).splitlines(), canon(want).splitlines()
                for lg, lw in zip(g, w):
                    if lg != lw:
                        print(f"   spark:  {lg}\n   oracle: {lw}")
                        break
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
