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


def test_driver_window_covers_operator_families():
    """The driver's correctness harness checks only the first 50
    registered queries; pin that the high-value operator families stay
    inside that window (round-4 VERDICT: the whole round-4 wave once
    sat beyond it and went driver-unchecked)."""
    window = QUERY_NAMES[:50]
    must_be_checked = {
        # validation engine core
        "row_validation_documents", "partition_verdicts_documents",
        "column_stats_documents", "duplicate_keys_documents",
        "schema_contract_documents", "tdigest_events",
        # dedup families
        "minhash_near_dups_documents", "simhash_near_dups_documents",
        "winnowing_pairs_documents", "dedup_clusters_documents",
        "paragraph_dedup_documents", "incremental_dedup_documents",
        # ANN paths
        "ann_topk_embeddings", "knn_join_embeddings",
        "lsh_topk_embeddings", "ivf_topk_embeddings",
        # pipeline operators
        "warc_roundtrip_documents", "lm_perplexity_documents",
        "dsir_documents", "greedy_pack_documents", "pagerank_documents",
        "tfidf_documents", "curation_documents", "host_stats_documents",
        "gopher_quality_documents", "contamination_documents",
    }
    missing = must_be_checked - set(window)
    assert not missing, f"outside the driver-checked window: {sorted(missing)}"
    assert len(QUERY_NAMES) == len(set(QUERY_NAMES))
    assert set(QUERY_NAMES) >= set(ORACLES), "oracle without a query"


def test_no_query_without_oracle_or_allowlist():
    """r05 VERDICT item 8: a NEW query registered without an oracle (and
    without an explicit rows-only allowlist entry) must fail loudly even
    when the parametrized replay is skipped (e.g. test data absent).
    The allowlist is intentionally empty — 1:1 queries:oracles."""
    ROWS_ONLY_OK: set[str] = set()
    unchecked = set(QUERY_NAMES) - set(ORACLES) - ROWS_ONLY_OK
    assert not unchecked, (
        f"queries registered without an oracle_sql entry: {sorted(unchecked)}"
    )
