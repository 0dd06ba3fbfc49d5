"""Unicode canonicalization: forms, control policy, null safety."""

from __future__ import annotations

import unicodedata

import pytest

from pyspark.sql import functions as F

from snowy_json_spark.operators.normalize import (
    canonical_text,
    collapse_whitespace,
    strip_control_chars,
    unicode_normalize_udf,
)

NFD_E = "é"          # e + combining acute
NFC_E = "é"           # é precomposed
LIG = "ﬁle"           # ﬁle with fi-ligature


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )


def test_nfc_composes_and_nfd_decomposes(spark):
    df = _df(spark, [NFD_E, NFC_E, "plain ascii", None])
    out = df.select(
        unicode_normalize_udf("NFC")(F.col("text")).alias("nfc"),
        unicode_normalize_udf("NFD")(F.col("text")).alias("nfd"),
    ).collect()
    assert out[0]["nfc"] == NFC_E and out[1]["nfc"] == NFC_E
    assert out[0]["nfd"] == NFD_E and out[1]["nfd"] == NFD_E
    assert out[2]["nfc"] == "plain ascii"
    assert out[3]["nfc"] is None and out[3]["nfd"] is None


def test_nfkc_folds_compatibility_chars(spark):
    df = _df(spark, [LIG, "ＨＩ"])  # ligature, full-width HI
    out = df.select(unicode_normalize_udf("NFKC")(F.col("text")).alias("t")).collect()
    assert out[0]["t"] == "file"
    assert out[1]["t"] == "HI"
    # NFC must NOT fold compatibility chars
    kept = df.select(unicode_normalize_udf("NFC")(F.col("text")).alias("t")).collect()
    assert kept[0]["t"] == LIG


def test_strip_control_chars_keeps_tab_newline(spark):
    df = _df(spark, ["a\x00b\x07c\td\ne\rf\x7fg\x9ch"])
    out = df.select(strip_control_chars(F.col("text")).alias("t")).first()["t"]
    assert out == "abc\td\ne\rfgh"


def test_collapse_whitespace_preserves_case(spark):
    df = _df(spark, ["  Mixed   CASE\t\ttext \n here  "])
    out = df.select(collapse_whitespace(F.col("text")).alias("t")).first()["t"]
    assert out == "Mixed CASE text here"


def test_canonical_text_composed_policy(spark):
    raw = "  We\x07ird " + NFD_E + "  caf" + NFD_E + " \x00 "
    df = _df(spark, [raw, None])
    out = df.select(
        canonical_text(F.col("text"), collapse_ws=True).alias("t")
    ).collect()
    assert out[0]["t"] == "Weird " + NFC_E + " caf" + NFC_E
    assert out[1]["t"] is None
    # idempotence: canonicalizing twice is a no-op
    df2 = _df(spark, [out[0]["t"]])
    again = df2.select(
        canonical_text(F.col("text"), collapse_ws=True).alias("t")
    ).first()["t"]
    assert again == out[0]["t"]


def test_matches_python_unicodedata_on_sample(spark):
    samples = [NFD_E * 3, "już ą́", "한국어 테스트", "ascii only", ""]
    df = _df(spark, samples)
    got = [r["t"] for r in
           df.select(unicode_normalize_udf("NFC")(F.col("text")).alias("t"))
           .orderBy("id").collect()]
    assert got == [unicodedata.normalize("NFC", s) for s in samples]


def test_invalid_form_raises(spark):
    with pytest.raises(ValueError):
        unicode_normalize_udf("NFX")
