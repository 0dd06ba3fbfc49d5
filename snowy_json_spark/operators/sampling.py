"""Deterministic sampling for training-mix construction.

No Snow analog — training-data-pipeline capability: assembling a
training mixture means sampling each source/language stratum at its own
rate, reproducibly, so that re-running the pipeline (or resuming a
partition manifest) selects byte-identical document sets.  Spark's
``df.sample`` / ``sampleBy`` are seeded per-partition-RNG: the selected
SET changes with partitioning, which breaks resumability and makes
results impossible to oracle.  Here selection is a pure function of the
document key:

    keep  ⇔  substr(md5(key || ':' || seed), 1, 4) < hex(⌊fraction·16⁴⌋)

- md5 prefix → uniform 16-bit bucket; fixed-width lowercase hex makes
  the lexicographic compare equal to the numeric compare, so the whole
  rule is ONE codegen'd string expression — no shuffle, no UDF, no RNG
  state, and any engine with md5 (DuckDB, Trino, Python) reproduces the
  exact row set.
- granularity is 1/65536 ≈ 0.0015%; fractions are floored to it
  (documented, deterministic).
- disjoint seeds give independent samples; ``train_test_split`` uses
  the same rule so the test set is a stable function of the key alone
  (adding data never moves an old key between splits).

Scale: selection is a scan-local filter — predicate-pushdown friendly,
zero shuffle, trivially correct at 10^12 rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 1 << 16  # md5 prefix width: 4 hex chars


def _threshold_hex(fraction: float) -> str | None:
    """4-char lowercase hex threshold, or None for keep-everything."""
    if fraction >= 1.0:
        return None
    n = max(int(fraction * BUCKETS), 0)
    return format(n, "04x")


def sample_bucket(key: Column, seed: str = "s0") -> Column:
    """The 4-hex-char uniform bucket of a key under ``seed``."""
    return F.substring(F.md5(F.concat(key, F.lit(":" + seed))), 1, 4)


def keep_fraction(key: Column, fraction: float, seed: str = "s0") -> Column:
    """Boolean: key selected at ``fraction`` (floored to 1/65536)."""
    t = _threshold_hex(fraction)
    if t is None:
        return key.isNotNull()
    return key.isNotNull() & (sample_bucket(key, seed) < F.lit(t))


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, seed: str = "s0"
) -> DataFrame:
    """Rows whose key falls in the ``fraction`` sample — a stable set,
    independent of partitioning/ordering.  Null keys never selected."""
    return df.filter(keep_fraction(F.col(key_col), fraction, seed))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: str = "s0",
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-mix operator:
    ``fractions`` maps stratum value → sampling rate; strata not listed
    use ``default_fraction``.  One codegen'd CASE over the same
    md5-bucket rule, so the selected set is reproducible and the rates
    are independent across strata (same key bucket, per-stratum
    thresholds)."""
    bucket = sample_bucket(F.col(key_col), seed)
    expr = None
    for value, fraction in sorted(fractions.items()):
        t = _threshold_hex(fraction)
        hit = F.lit(True) if t is None else bucket < F.lit(t)
        expr = (
            F.when(F.col(stratum_col) == value, hit)
            if expr is None
            else expr.when(F.col(stratum_col) == value, hit)
        )
    td = _threshold_hex(default_fraction)
    default_hit = F.lit(True) if td is None else bucket < F.lit(td)
    keep = default_hit if expr is None else expr.otherwise(default_hit)
    return df.filter(F.col(key_col).isNotNull() & keep)


def train_test_split(
    df: DataFrame,
    key_col: str,
    test_fraction: float,
    seed: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Input columns + ``out_col`` ∈ {'train','test'}: the test set is
    the ``test_fraction`` md5-bucket sample of the key, so membership
    is a pure key function — growing the corpus never migrates an
    existing key across the split (the leakage-safety property random
    splits lack).  Null keys go to 'train'."""
    return df.withColumn(
        out_col,
        F.when(
            keep_fraction(F.col(key_col), test_fraction, seed), F.lit("test")
        ).otherwise(F.lit("train")),
    )


def budget_fractions(
    df: DataFrame,
    stratum_col: str,
    weight_col: str,
    budgets: dict[str, int],
) -> dict[str, float]:
    """Per-stratum sampling fractions that hit a WEIGHT budget (token
    counts, bytes): ``min(budget / stratum_total, 1.0)``, floored to
    the md5-bucket granularity by the samplers that consume it.

    One partial-aggregated scan (shuffle rows ∝ strata); totals are
    integers so the fraction arithmetic is exactly reproducible by an
    oracle.  Strata absent from ``budgets`` get 0.0 — a mixture takes
    only what it asked for."""
    totals = {
        r["s"]: r["w"]
        for r in df.groupBy(F.col(stratum_col).alias("s"))
        .agg(F.sum(F.col(weight_col)).alias("w"))
        .collect()
    }
    return {
        s: min(b / totals[s], 1.0) if totals.get(s) else 0.0
        for s, b in budgets.items()
    }


def token_budget_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    weight_col: str,
    budgets: dict[str, int],
    seed: str = "budget",
) -> DataFrame:
    """Deterministic mixture sampling to per-stratum WEIGHT budgets
    (the "2T tokens: 60% web, 20% code, 20% books" construction):
    fractions from :func:`budget_fractions`, selection by the
    reproducible md5-bucket rule of :func:`stratified_sample`.  In
    expectation each stratum contributes ≈ its budget; the selected
    SET is a pure function of (corpus, budgets, seed)."""
    fr = budget_fractions(df, stratum_col, weight_col, budgets)
    return stratified_sample(df, key_col, stratum_col, fr, 0.0, seed)
