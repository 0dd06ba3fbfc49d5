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


def test_robots_noindex_variants(spark):
    from snowy_json_spark.operators.extract import noindex_filter, robots_noindex

    rows = [
        (1, b'<html><head><meta name="robots" content="noindex,nofollow">'
            b"</head><body>x</body></html>"),
        (2, b"<html><head><META NAME='ROBOTS' CONTENT='NOINDEX'></head>"
            b"<body>x</body></html>"),
        (3, b'<html><head><meta content="noindex" name=robots></head>'
            b"<body>x</body></html>"),
        (4, b'<html><head><meta name="googlebot" content="noindex"></head>'
            b"<body>x</body></html>"),
        (5, b'<html><head><meta name="robots" content="index,follow"></head>'
            b"<body>x</body></html>"),
        (6, b'<html><head><meta name="viewport" content="noindex-like"></head>'
            b"<body>x</body></html>"),
        (7, b"<html><body>no meta at all</body></html>"),
        (8, None),
        (9, b"<html><head><meta name=robots content=noindex,nofollow>"
            b"</head><body>x</body></html>"),
        (10, b"<html><head><meta content=nofollow,noindex name=robots>"
             b"</head><body>x</body></html>"),
        # News-only opt-out must NOT trip the general filter
        (11, b'<html><head><meta name="googlebot-news" content="noindex">'
             b"</head><body>x</body></html>"),
        # robots meta in ONE tag + noindex in ANOTHER must not combine
        (12, b'<html><head><meta name="robots" content="all">'
             b'<meta name="descr" content="noindex"></head>'
             b"<body>x</body></html>"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html binary")
    got = {r["doc_id"]: r["ni"] for r in df.select(
        "doc_id", robots_noindex(F.col("html")).alias("ni")).collect()}
    assert got == {1: True, 2: True, 3: True, 4: True,
                   5: False, 6: False, 7: False, 8: False,
                   9: True, 10: True, 11: False, 12: False}
    kept = {r["doc_id"] for r in noindex_filter(df).collect()}
    # null html cannot opt out, so it is kept
    assert kept == {5, 6, 7, 8, 11, 12}


def test_noindex_attribute_name_boundary(spark):
    from snowy_json_spark.operators.extract import robots_noindex

    rows = [
        (1, b'<html><head><meta data-name="robots" content="noindex-state">'
            b"</head><body>x</body></html>"),
        (2, b'<html><head><meta itemname="robots" content="noindex">'
            b"</head><body>x</body></html>"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html binary")
    got = {r["doc_id"]: r["ni"] for r in df.select(
        "doc_id", robots_noindex(F.col("html")).alias("ni")).collect()}
    assert got == {1: False, 2: False}
