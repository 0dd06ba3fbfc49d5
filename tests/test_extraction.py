"""Byte-identical text-extraction invariant (BASELINE.json input_hint)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snowy_json_spark.operators.extract import (
    extraction_report,
    extraction_violations,
    with_extracted_text,
)
from snowy_json_spark.sources.pages import generate_pages


@pytest.fixture(scope="module")
def pages(spark):
    return generate_pages(spark, 3000, 8).cache()


def test_extraction_roundtrip_on_clean_rows(spark, pages):
    # wherever text is present and html non-empty, extraction must be
    # byte-identical to the stored text
    clean = pages.filter(
        F.col("text").isNotNull() & (F.length("text") > 0) & (F.length("html") > 0)
    )
    e = with_extracted_text(clean)
    assert e.filter(F.col("extracted_text") != F.col("text")).count() == 0


def test_extraction_violations_catch_planted_gaps(spark, pages):
    # planted: ~1% null text, ~0.5% empty text (html still carries body),
    # ~1% empty html (text still present) — every one is a mismatch
    v = extraction_violations(pages, ["url"])
    n = v.count()
    assert n > 0
    expected = pages.filter(
        ~(
            (F.col("text").isNull() & (F.length("html") == 0))
            | (
                F.col("text").isNotNull()
                & (F.length("html") > 0)
                & (F.col("html").cast("string") == F.concat(F.lit("<html><body>"), F.col("text"), F.lit("</body></html>")))
            )
        )
    ).count()
    assert n == expected


def test_extraction_report(spark, pages):
    r = extraction_report(pages).collect()[0]
    assert r["n_rows"] == 3000
    assert r["n_byte_identical"] + r["n_both_missing"] + r["n_mismatched"] == 3000
    assert r["n_byte_identical"] > 2800  # overwhelming majority clean
