"""Bloom-filter seen-set (operators/bloom.py): no false negatives,
fp rate near theory, deterministic across partitionings, Arrow-only
probe path."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from snowy_json_spark.operators.bloom import (
    bloom_params,
    build_bloom,
    might_contain,
    seen_flags,
)


@pytest.fixture(scope="module")
def seen_df(spark):
    return spark.createDataFrame(
        [(f"https://h{i}.example.com/p/{i}",) for i in range(1000)], "url string"
    )


@pytest.fixture(scope="module")
def bloom(seen_df):
    m, k = bloom_params(1000, 0.01)
    return build_bloom(seen_df, "url", m, k), m, k


def test_params_sane():
    m, k = bloom_params(1000, 0.01)
    assert m % 8 == 0 and 9000 < m < 11000 and 6 <= k <= 8


def test_no_false_negatives(spark, seen_df, bloom):
    bm, m, k = bloom
    out = seen_flags(seen_df, "url", bm, m, k)
    assert out.filter(~F.col("seen")).count() == 0


def test_fp_rate_near_theory(spark, bloom):
    bm, m, k = bloom
    probe = spark.createDataFrame(
        [(f"https://unseen{i}.other.net/x",) for i in range(5000)], "url string"
    )
    fp = seen_flags(probe, "url", bm, m, k).filter(F.col("seen")).count()
    assert fp / 5000 < 0.03  # sized for 1%


def test_build_partitioning_independent(spark, seen_df, bloom):
    bm, m, k = bloom
    bm2 = build_bloom(seen_df.repartition(7, "url"), "url", m, k)
    assert bm == bm2


def test_null_keys(spark, bloom):
    bm, m, k = bloom
    df = spark.createDataFrame([(None,), ("https://h1.example.com/p/1",)], "url string")
    got = {r["url"]: r["seen"] for r in seen_flags(df, "url", bm, m, k).collect()}
    assert got[None] is False
    assert got["https://h1.example.com/p/1"] is True


def test_bitmap_size_checked(spark, bloom):
    bm, m, k = bloom
    with pytest.raises(ValueError):
        might_contain(F.lit("x"), bm, m * 2, k)


def test_probe_is_arrow_not_rowwise(spark, seen_df, bloom):
    bm, m, k = bloom
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        seen_flags(seen_df, "url", bm, m, k).explain("formatted")
    plan = buf.getvalue()
    assert "ArrowEvalPython" in plan, "probe must run as an Arrow pandas UDF"
    assert "BatchEvalPython" not in plan, "row-wise Python UDF in probe path"
    assert "Exchange" not in plan, "probe must not shuffle"
