"""Span tagging attributes: offsets, explode view, redaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowy_json_spark.operators.spans import (
    explode_spans,
    redact_spans,
    tag_spans,
)


def _df(spark):
    rows = [
        (1, "write to bob@example.com or 10.0.0.1 today"),
        (2, "clean document with no identifiers"),
        (3, None),
        (4, "a@b.io and c@d.io"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tag_spans_offsets(spark):
    got = {r["doc_id"]: r["spans"]
           for r in tag_spans(_df(spark), "doc_id", "text").collect()}
    s1 = [(s["start"], s["end"], s["tag"]) for s in got[1]]
    assert (9, 24, "email") in s1
    assert (28, 36, "ipv4") in s1
    assert got[2] == []
    assert got[3] is None
    assert [s["tag"] for s in got[4]] == ["email", "email"]
    assert [s["start"] for s in got[4]] == sorted(s["start"] for s in got[4])


def test_explode_spans_attribute_table(spark):
    tagged = tag_spans(_df(spark), "doc_id", "text")
    rows = explode_spans(tagged, "doc_id").collect()
    assert {r["doc_id"] for r in rows} == {1, 4}
    assert all(r["end"] > r["start"] for r in rows)


def test_redact_spans_roundtrip(spark):
    tagged = tag_spans(_df(spark), "doc_id", "text")
    red = {r["doc_id"]: r["clean"]
           for r in redact_spans(tagged, "text", out_col="clean").collect()}
    assert red[1] == "write to <EMAIL> or <IPV4> today"
    assert red[2] == "clean document with no identifiers"
    assert red[3] is None
    assert red[4] == "<EMAIL> and <EMAIL>"


def test_redact_overlapping_spans_merge(spark):
    df = spark.createDataFrame([(1, "xxabcdefyy")], "doc_id long, text string")
    tagged = df.withColumn(
        "spans",
        F.array(
            F.struct(F.lit(2).alias("start"), F.lit(6).alias("end"),
                     F.lit("a").alias("tag")),
            F.struct(F.lit(4).alias("start"), F.lit(8).alias("end"),
                     F.lit("b").alias("tag")),
        ),
    )
    out = redact_spans(tagged, "text", out_col="clean").first()["clean"]
    # overlapping spans merge to one interval, earliest member's tag
    assert out == "xx<A>yy"


def test_redact_nested_span_never_leaks_tail(spark):
    """Regression: a span nested inside a longer one (the phone regex
    matching the digit run inside an email) must not leave the
    enclosing span's tail unredacted."""
    text = "mail bob.15551234567.smith@example.com now"
    tagged = tag_spans(
        spark.createDataFrame([(1, text)], "doc_id long, text string"),
        "doc_id", "text",
    )
    spans = tagged.first()["spans"]
    assert {s["tag"] for s in spans} == {"email", "phone"}
    out = redact_spans(tagged, "text", out_col="clean").first()["clean"]
    assert out == "mail <EMAIL> now"
    assert "smith" not in out and "@example.com" not in out


def test_custom_taggers(spark):
    df = spark.createDataFrame([(1, "order #A123 and #B77")],
                               "doc_id long, text string")
    got = tag_spans(df, "doc_id", "text",
                    taggers={"order": r"#[A-Z]\d+"}).first()["spans"]
    assert [(s["start"], s["end"], s["tag"]) for s in got] == [
        (6, 11, "order"), (16, 20, "order")]


def test_redact_adjacent_spans_stay_separate(spark):
    """Back-to-back (touching, non-overlapping) entities keep their
    own redaction markers — only genuine overlap merges."""
    df = spark.createDataFrame([(1, "a@b5551x")], "doc_id long, text string")
    tagged = df.withColumn(
        "spans",
        F.array(
            F.struct(F.lit(0).alias("start"), F.lit(3).alias("end"),
                     F.lit("email").alias("tag")),
            F.struct(F.lit(3).alias("start"), F.lit(7).alias("end"),
                     F.lit("phone").alias("tag")),
        ),
    )
    out = redact_spans(tagged, "text", out_col="clean").first()["clean"]
    assert out == "<EMAIL><PHONE>x"
