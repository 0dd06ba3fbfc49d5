"""Deterministic md5-bucket sampling (operators/sampling.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from snowy_json_spark.operators.sampling import (
    BUCKETS,
    deterministic_sample,
    keep_fraction,
    stratified_sample,
    train_test_split,
)


def py_keep(key: str, fraction: float, seed: str) -> bool:
    """Reference implementation of the documented rule."""
    if fraction >= 1.0:
        return True
    h = hashlib.md5(f"{key}:{seed}".encode()).hexdigest()[:4]
    return h < format(int(fraction * BUCKETS), "04x")


@pytest.fixture(scope="module")
def keys(spark):
    return spark.createDataFrame(
        [(f"https://h{i}.example.com/p/{i}",) for i in range(2000)], "k string"
    )


def test_matches_reference_rule(spark, keys):
    got = {r["k"] for r in deterministic_sample(keys, "k", 0.25, "s1").collect()}
    want = {
        f"https://h{i}.example.com/p/{i}"
        for i in range(2000)
        if py_keep(f"https://h{i}.example.com/p/{i}", 0.25, "s1")
    }
    assert got == want
    # rate lands near the target
    assert 0.20 < len(got) / 2000 < 0.30


def test_partitioning_independent(spark, keys):
    a = {r["k"] for r in deterministic_sample(keys, "k", 0.1).collect()}
    b = {
        r["k"]
        for r in deterministic_sample(keys.repartition(13, "k"), "k", 0.1).collect()
    }
    assert a == b


def test_edge_fractions_and_null(spark):
    df = spark.createDataFrame([("a",), ("b",), (None,)], "k string")
    assert deterministic_sample(df, "k", 1.0).count() == 2  # nulls excluded
    assert deterministic_sample(df, "k", 0.0).count() == 0
    row = df.select(keep_fraction(F.col("k"), 1.0).alias("f")).collect()
    assert [r["f"] for r in row].count(False) == 1  # the null key


def test_stratified_rates(spark):
    rows = [(f"k{i}", "en" if i % 2 == 0 else ("de" if i % 4 == 1 else "fr"))
            for i in range(4000)]
    df = spark.createDataFrame(rows, "k string, lang string")
    out = stratified_sample(
        df, "k", "lang", {"en": 0.5, "de": 1.0}, default_fraction=0.0, seed="mix"
    )
    got = {r["lang"]: 0 for r in out.collect()}
    for r in out.collect():
        got[r["lang"]] = got.get(r["lang"], 0) + 1
    assert got["de"] == 1000          # full stratum
    assert "fr" not in got            # default 0
    assert 800 < got["en"] < 1200     # ~half of 2000
    # per-key decisions match the reference rule
    want_en = {f"k{i}" for i in range(0, 4000, 2) if py_keep(f"k{i}", 0.5, "mix")}
    assert {r["k"] for r in out.collect() if r["lang"] == "en"} == want_en


def test_train_test_split_stable_under_growth(spark):
    small = spark.createDataFrame([(f"k{i}",) for i in range(500)], "k string")
    big = spark.createDataFrame([(f"k{i}",) for i in range(1000)], "k string")
    s = {r["k"]: r["split"] for r in train_test_split(small, "k", 0.2).collect()}
    b = {r["k"]: r["split"] for r in train_test_split(big, "k", 0.2).collect()}
    assert all(b[k] == v for k, v in s.items())  # no key migrates
    assert 0.15 < sum(v == "test" for v in b.values()) / 1000 < 0.25


def test_sampling_plan_is_scan_local(spark, tmp_path):
    import contextlib
    import io

    p = str(tmp_path / "keys")
    spark.createDataFrame([(f"k{i}", i) for i in range(100)],
                          "k string, v long").write.parquet(p)
    df = spark.read.parquet(p)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        deterministic_sample(df, "k", 0.1).explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan, "sampling must not shuffle"
    assert "IsNotNull(k)" in plan, "null-key filter not pushed to scan"


def test_token_budget_sample(spark):
    from snowy_json_spark.operators.sampling import (
        budget_fractions,
        token_budget_sample,
    )

    rows = [(f"k{i}", "web" if i % 2 == 0 else "code", 100) for i in range(4000)]
    df = spark.createDataFrame(rows, "k string, s string, tokens long")
    # web total = 200_000; code total = 200_000
    fr = budget_fractions(df, "s", "tokens", {"web": 50_000, "code": 500_000, "books": 10})
    assert fr["web"] == pytest.approx(0.25)
    assert fr["code"] == 1.0          # budget exceeds supply -> take all
    assert fr["books"] == 0.0         # stratum absent from corpus
    out = token_budget_sample(df, "k", "s", "tokens", {"web": 50_000, "code": 500_000})
    got = {}
    for r in out.collect():
        got[r["s"]] = got.get(r["s"], 0) + r["tokens"]
    assert got["code"] == 200_000
    assert 40_000 < got["web"] < 60_000   # ~budget in expectation
