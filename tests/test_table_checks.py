"""Table-scope operator tests: stats, uniqueness, referential, drift.

Uses the driver-generated star schema at sf0.001 (TESTDATA.md) plus
hand-pinned slices (FIXTURES.md §3).
"""

from __future__ import annotations

import pytest

from snowy_json_spark.operators.drift import (
    DriftThresholds,
    HistogramSpec,
    collect_histogram,
    drift_verdicts,
    ks_statistic,
    psi,
)
from snowy_json_spark.operators.referential import (
    anti_join_violations,
    membership_check_broadcast_set,
    referential_violations,
)
from snowy_json_spark.operators.stats import (
    ColumnStatsSpec,
    HllSketches,
    column_stats,
    stats_violations,
)
from snowy_json_spark.operators.uniqueness import (
    duplicate_keys,
    duplicate_keys_hashed,
    duplicate_keys_salted,
    distinct_rate,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_column_stats_single_pass(spark, documents):
    specs = [
        ColumnStatsSpec("n_chars", exact_distinct=True),
        ColumnStatsSpec("lang", exact_distinct=True),
    ]
    row = column_stats(documents, specs).collect()[0].asDict()
    assert row["n_chars__count"] == 500
    assert row["n_chars__null_rate"] == 0.0
    assert row["n_chars__min"] == 47 and row["n_chars__max"] == 558
    assert row["lang__distinct"] == 5


def test_stats_thresholds(spark, documents):
    specs = [ColumnStatsSpec("n_chars", max_value=500, exact_distinct=True)]
    row = column_stats(documents, specs).collect()[0].asDict()
    v = stats_violations(row, specs)
    assert len(v) == 1
    assert v[0]["constraint_id"] == "#/x-table-checks/stats/n_chars/max_value"
    assert v[0]["observed_value"] == "558"


def test_hll_sketches_mergeable(spark, documents):
    h = HllSketches(["lang"])
    per = h.per_group(documents, ["source"])
    merged = h.merge(per).collect()[0]
    # 5 true distinct langs; HLL exact at this cardinality
    assert merged["lang__distinct"] == 5


def test_duplicate_keys_and_salted_equivalence(spark):
    rows = [("u1",), ("u2",), ("u1",), ("u3",), ("u1",), ("u2",)]
    df = spark.createDataFrame(rows, "url string").repartition(4)
    plain = {(r["url"], r["dup_count"]) for r in duplicate_keys(df, ["url"]).collect()}
    salted = {
        (r["url"], r["dup_count"])
        for r in duplicate_keys_salted(df, ["url"], salt_buckets=8).collect()
    }
    assert plain == {("u1", 3), ("u2", 2)}
    assert salted == plain
    hashed = {
        (r["url"], r["dup_count"])
        for r in duplicate_keys_hashed(df, ["url"]).collect()
    }
    assert hashed == plain


def test_distinct_rate(spark):
    df = spark.createDataFrame([("a",), ("b",), ("a",)], "k string")
    r = distinct_rate(df, ["k"], exact=True).collect()[0]
    assert r["total_rows"] == 3 and r["distinct_keys"] == 2
    assert abs(r["distinct_rate"] - 2 / 3) < 1e-9


def test_referential_anti_join(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    bad = anti_join_violations(orders, "o_custkey", customer, "c_custkey")
    # driver data is referentially clean: every order has a customer
    assert bad.count() == 0
    # poison one key
    poisoned = orders.limit(5).withColumn(
        "o_custkey", orders.o_custkey + 10_000_000
    )
    v = referential_violations(
        poisoned, "o_custkey", customer, "c_custkey", "#/x/ref/custkey", ["o_orderkey"]
    )
    rows = v.collect()
    assert len(rows) == 5
    assert all(r["constraint_id"] == "#/x/ref/custkey" for r in rows)


def test_membership_set(spark, documents):
    v = membership_check_broadcast_set(
        documents, "lang", ["en", "fr", "de"], "#/x/lang", ["doc_id"]
    )
    got = {r["observed_value"] for r in v.collect()}
    assert got == {"es", "zh"}


def test_psi_ks_math():
    assert psi([10, 10, 10], [10, 10, 10]) == pytest.approx(0.0)
    assert ks_statistic([10, 0, 0], [0, 0, 10]) == pytest.approx(1.0)
    assert psi([100, 0, 0], [0, 0, 100]) > 1.0


def test_drift_verdicts_end_to_end(spark, documents):
    spec = HistogramSpec("n_chars", lo=0, hi=600, n_buckets=12)
    snapshot = collect_histogram(documents, spec, "lang")
    # identical data → no drift
    current = collect_histogram(documents, spec, "lang")
    verdicts = drift_verdicts(current, snapshot)
    assert all(v["status"] == "pass" for v in verdicts)
    # shift one group hard → fail
    from pyspark.sql import functions as F

    shifted = documents.withColumn(
        "n_chars",
        F.when(F.col("lang") == "en", F.col("n_chars") + 300).otherwise(
            F.col("n_chars")
        ),
    )
    cur2 = collect_histogram(shifted, spec, "lang")
    v2 = {v["group"]: v["status"] for v in drift_verdicts(cur2, snapshot)}
    assert v2["en"] == "fail"
    assert v2["de"] == "pass"


def test_drift_missing_group():
    v = drift_verdicts({"a": [1, 2]}, {"a": [1, 2], "b": [3, 4]})
    status = {x["group"]: x["status"] for x in v}
    assert status["b"] == "missing_current"


def test_hashed_shuffle_fallback_on_high_dup_corpus(spark):
    """50%-duplicate corpus with broadcast_limit=1: the candidate set
    exceeds the limit so the semi-join must degrade to a shuffle join
    (no BroadcastExchange of the candidates) while producing output
    identical to the plain strategy."""
    rows = [(f"u{i % 500}",) for i in range(1000)]  # every key ×2
    df = spark.createDataFrame(rows, "url string").repartition(8)
    plain = {(r["url"], r["dup_count"]) for r in duplicate_keys(df, ["url"]).collect()}
    fallback = duplicate_keys_hashed(df, ["url"], broadcast_limit=1)
    got = {(r["url"], r["dup_count"]) for r in fallback.collect()}
    assert got == plain and len(got) == 500
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fallback.explain("formatted")
    assert "BroadcastHashJoin" not in buf.getvalue()


def test_corpus_diff_statuses(spark):
    from snowy_json_spark.operators.stats import corpus_diff

    old = spark.createDataFrame(
        [(1, "same"), (2, "before"), (3, "gone"), (5, None), (6, None)],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "same"), (2, "after"), (4, "fresh"), (5, None), (6, "now set")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["status"]
           for r in corpus_diff(old, new, "doc_id", "text").collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed",
                   4: "added", 5: "unchanged", 6: "changed"}
