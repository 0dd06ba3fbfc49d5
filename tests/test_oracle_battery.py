"""Full oracle battery: EVERY registered query vs its DuckDB oracle.

The driver's correctness harness windows only the first 50 entries of
``__spark_entry__.queries()``; this test replays the driver's comparison
(row count + column set + value hash on column-name-sorted, row-sorted
CSV) over **all** registered queries at sf0.001, so the queries beyond
the driver window stay green under plain ``pytest tests/``.

Mirrors scripts/check_oracle.py, which runs the same comparison at
sf0.01 for ad-hoc use.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_BATTERY_SF", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# built once at module scope — queries()/oracle_sql() rebuild their
# full 76-entry dicts on every call
QUERIES = entry.queries()
ORACLES = entry.oracle_sql()
QUERY_NAMES = list(QUERIES)


def canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.to_csv(index=False, float_format="%.9g")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"{SF_DIR} not present"
)
@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(name, spark, duck):
    got = QUERIES[name](spark, SF_DIR).toPandas()
    # every registered query carries an oracle (the README's "76
    # queries, 76 oracles" 1:1 invariant) — a genuinely
    # non-SQL-expressible op must be added to this allowlist
    # explicitly, not slip through as an unchecked green
    ROWS_ONLY_OK: set[str] = set()
    if name not in ORACLES:
        assert name in ROWS_ONLY_OK, (
            f"{name} has no oracle_sql entry and is not in the "
            "documented rows-only allowlist"
        )
        return
    want = duck.execute(ORACLES[name]).df()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch {sorted(got.columns)} vs "
        f"{sorted(want.columns)}"
    )
    assert len(got) == len(want), (
        f"{name}: row count {len(got)} vs oracle {len(want)}"
    )
    g, w = canon(got), canon(want)
    if g != w:
        for lg, lw in zip(g.splitlines(), w.splitlines()):
            if lg != lw:
                pytest.fail(
                    f"{name}: value-hash mismatch; first differing line:\n"
                    f"  spark:  {lg}\n  oracle: {lw}"
                )
        pytest.fail(f"{name}: value-hash mismatch (length)")
