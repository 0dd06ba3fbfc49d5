"""Model-based quality scoring: features, linear path, trained path."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from snowy_json_spark.operators.quality_ml import (
    linear_quality_score,
    quality_feature_columns,
    score_quality,
    train_quality_classifier,
)

GOOD = ("the quick brown fox jumps over the lazy dog and then the dog "
        "naps in the warm sun for a while before dinner")
BAD = "$$$ !!! @@@ ### %% ^^ && ** (( )) __ ++ == ~~ ## $$ !! ?? .."


def _labeled(spark, n=200):
    rows = []
    for i in range(n):
        good = i % 2 == 0
        body = (GOOD + f" extra{i}") if good else (BAD + f" x{i}!!!")
        rows.append((i, body, 1.0 if good else 0.0))
    return spark.createDataFrame(rows, "doc_id long, text string, label double")


def test_feature_columns_values(spark):
    df = spark.createDataFrame(
        [(1, "The cat. Sat!"), (2, None), (3, "")],
        "doc_id long, text string")
    feats = quality_feature_columns(F.col("text"))
    got = {r["doc_id"]: r for r in df.select(
        "doc_id", *[v.alias(k) for k, v in feats.items()]).collect()}
    # "the cat. sat!" → words: the cat. sat! (lowercased, ws split)
    assert got[1]["n_words"] == 3.0
    assert got[1]["mean_word_len"] == pytest.approx((3 + 4 + 4) / 3)
    assert got[1]["stop_ratio"] == pytest.approx(1 / 3)
    assert got[1]["punct_ratio"] == pytest.approx(2 / 13)
    assert got[1]["upper_ratio"] == pytest.approx(2 / 13)
    for d in (2, 3):
        assert got[d]["n_words"] == 0.0
        assert got[d]["mean_word_len"] == 0.0


def test_linear_score_hand_computed(spark):
    df = spark.createDataFrame([(1, "the cat")], "doc_id long, text string")
    w = {"n_words": 0.1, "stop_ratio": 2.0}
    got = df.select(
        linear_quality_score(F.col("text"), w, bias=-1.0).alias("p")
    ).first()["p"]
    z = -1.0 + 0.1 * 2 + 2.0 * 0.5
    assert got == pytest.approx(1 / (1 + math.exp(-z)), rel=1e-12)
    with pytest.raises(ValueError):
        linear_quality_score(F.col("text"), {"nope": 1.0})


def test_trained_classifier_separates_and_exports(spark):
    df = _labeled(spark)
    model, names = train_quality_classifier(df, "text", "label")
    scored = score_quality(df, model, "text", names)
    acc = scored.select(
        ((F.col("quality_prob") > 0.5).cast("double") == F.col("label"))
        .cast("double").alias("ok")
    ).agg(F.avg("ok")).first()[0]
    assert acc >= 0.95
    # coefficient export: linear_quality_score with the fitted weights
    # reproduces the model's probabilities (standardization folds into
    # coefficients at export in Spark ML — coefficients are already in
    # input space)
    w = dict(zip(names, model.coefficients.toArray().tolist()))
    lin = df.select(
        "doc_id",
        linear_quality_score(F.col("text"), w, float(model.intercept)).alias("p"),
    )
    ml = {r["doc_id"]: r["quality_prob"] for r in scored.collect()}
    for r in lin.collect():
        assert r["p"] == pytest.approx(ml[r["doc_id"]], abs=1e-9)


def test_training_reproducible(spark):
    df = _labeled(spark, n=120)
    m1, names = train_quality_classifier(df, "text", "label")
    m2, _ = train_quality_classifier(df, "text", "label")
    a = m1.coefficients.toArray()
    b = m2.coefficients.toArray()
    assert a == pytest.approx(b, rel=1e-8)
    assert m1.intercept == pytest.approx(m2.intercept, rel=1e-8)
