"""Model-based quality scoring: the FineWeb-Edu / quality-classifier
stage, Spark-native.

No Snow analog — training-data-pipeline capability: beyond rule
filters (text.gopher_flags), production pipelines score documents
with a trained classifier over cheap handcrafted features and keep
the top of the distribution.  Two layers:

- :func:`quality_feature_columns` — the shared feature map, pure
  Columns (word count, mean word length, stopword/punctuation/
  uppercase ratios), null-safe (empty docs feature as zeros so the
  model sees them instead of dropping rows).
- :func:`linear_quality_score` — sigmoid(w·x + b) with EXPLICIT
  weights, still one pure-Column expression: the deploy path once a
  model is trained (export coefficients, score JVM-side with zero
  Python) and the oracle-checkable path.
- :func:`train_quality_classifier` / :func:`score_quality` — Spark ML
  logistic regression over the same features (VectorAssembler +
  LogisticRegression pipeline).  Training aggregates gradients
  tree-wise (driver sees vectors ∝ feature count, never rows);
  inference is a JVM-side ``model.transform``.  Export the fitted
  coefficients into :func:`linear_quality_score` to drop even the
  assembler from the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import STOPWORDS, punctuation_ratio, uppercase_ratio, words


def quality_feature_columns(text_col: Column) -> dict[str, Column]:
    """The shared handcrafted feature map (name → Column), all pure
    JVM expressions.  Empty/null text yields all-zero features."""
    ws = words(text_col)
    n = F.size(ws)  # -1 for null arrays
    n_words = F.when(n > 0, n).otherwise(F.lit(0)).cast("double")
    total_chars = F.aggregate(
        F.coalesce(ws, F.array()), F.lit(0), lambda acc, w: acc + F.length(w)
    )
    mean_word_len = F.when(n > 0, total_chars / n).otherwise(F.lit(0.0))
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_ratio = F.when(
        n > 0, F.size(F.filter(ws, lambda w: F.array_contains(sw, w))) / n
    ).otherwise(F.lit(0.0))
    return {
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "stop_ratio": stop_ratio,
        "punct_ratio": F.coalesce(punctuation_ratio(text_col), F.lit(0.0)),
        "upper_ratio": F.coalesce(uppercase_ratio(text_col), F.lit(0.0)),
    }


def linear_quality_score(
    text_col: Column, weights: dict[str, float], bias: float = 0.0
) -> Column:
    """``sigmoid(Σ w_f · feature_f + bias)`` as one Column — the
    zero-Python deploy path for a trained linear model.  Unknown
    feature names raise."""
    feats = quality_feature_columns(text_col)
    unknown = set(weights) - set(feats)
    if unknown:
        raise ValueError(f"unknown features: {sorted(unknown)}")
    z = F.lit(float(bias))
    for name, w in sorted(weights.items()):
        z = z + F.lit(float(w)) * feats[name]
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def _assemble(df: DataFrame, text_col: str, feature_names: list[str]):
    from pyspark.ml.feature import VectorAssembler

    feats = quality_feature_columns(F.col(text_col))
    with_feats = df.select(
        "*", *[feats[f].alias(f"_qf_{f}") for f in feature_names]
    )
    assembler = VectorAssembler(
        inputCols=[f"_qf_{f}" for f in feature_names], outputCol="_qf_vec"
    )
    return assembler.transform(with_feats)


def train_quality_classifier(
    df: DataFrame,
    text_col: str,
    label_col: str,
    feature_names: list[str] | None = None,
    max_iter: int = 50,
    reg_param: float = 0.01,
):
    """Fit logistic regression over the shared features; returns
    ``(model, feature_names)``.  ``model.coefficients`` /
    ``model.intercept`` export directly into
    :func:`linear_quality_score` weights."""
    from pyspark.ml.classification import LogisticRegression

    feature_names = feature_names or sorted(
        quality_feature_columns(F.col(text_col)).keys()
    )
    assembled = _assemble(df, text_col, feature_names)
    lr = LogisticRegression(
        featuresCol="_qf_vec",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
        standardization=True,
    )
    return lr.fit(assembled), feature_names


def score_quality(
    df: DataFrame,
    model,
    text_col: str,
    feature_names: list[str],
    out_col: str = "quality_prob",
) -> DataFrame:
    """JVM-side inference: input rows plus P(label=1)."""
    from pyspark.ml.functions import vector_to_array

    assembled = _assemble(df, text_col, feature_names)
    scored = model.transform(assembled)
    return scored.select(
        *df.columns,
        vector_to_array(F.col(model.getProbabilityCol()))[1].alias(out_col),
    )
