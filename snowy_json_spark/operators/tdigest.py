"""Mergeable t-digest quantile sketches (north-star: "t-digest quantile
sketches ... with KS/PSI thresholds").

No Snow analog — new capability.  ``percentile_approx`` (drift.py) gives
GK sketches; the t-digest (Dunning & Ertl, "Computing Extremely Accurate
Quantiles Using t-Digests", arXiv:1902.04023 — public algorithm) trades
uniform rank error for *relative* rank error: centroids near q=0/q=1 are
tiny, so tail quantiles (p99.9 latency, length outliers) stay accurate
at a fixed sketch size.

Implementation: the vectorized uniform-k-partition variant — sort,
assign each point the k-index ``floor(k1(q_mid))`` of its midpoint rank
under the scale function k1(q) = δ/(2π)·asin(2q−1), and merge runs of
equal k-index with ``np.add.reduceat``.  Every cluster spans < 1 k-unit,
which is exactly the t-digest size bound; the whole compress is numpy,
no Python-per-value loop.

Scale design (10^12 rows):
- Stage 1 (``tdigest_partial``): ``mapInPandas`` over the single value
  column — each Arrow batch compresses to ≤ ~2δ centroids and emits ONE
  digest row (a few KB).  Output rows ∝ input partitions, not input
  rows.
- Stage 2 (``tdigest_sketch``): two-level tree merge.  Partials are
  grouped by ``spark_partition_id() % fanin`` and merged with
  ``applyInPandas`` (≤ fanin rows out), then a final single-group merge
  produces the one-row sketch.  No task ever holds more than
  ``fanin × sketch`` bytes; add levels by raising ``fanin`` only if
  input partitions exceed fanin² (at 10^12 rows / 128 MB splits that is
  ~8M partials — fanin=2048 keeps level-1 tasks at ~8 MB).
- Digests merge associatively (same mechanism as the HLL merge in
  stats.py), so resumable runs can persist per-partition digest rows in
  the checkpoint manifest and merge across submissions.
"""

from __future__ import annotations

import math
from typing import Iterable, Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SKETCH_SCHEMA = (
    "means array<double>, weights array<double>, n bigint, lo double, hi double"
)
_SKETCH_COLS = ["means", "weights", "n", "lo", "hi"]


def _k1(q: np.ndarray, delta: float) -> np.ndarray:
    """t-digest scale function k1 (arXiv:1902.04023 §2.2)."""
    return (delta / (2.0 * math.pi)) * np.arcsin(np.clip(2.0 * q - 1.0, -1.0, 1.0))


def _compress(
    means: np.ndarray, weights: np.ndarray, delta: float
) -> tuple[np.ndarray, np.ndarray]:
    """Merge (mean, weight) points into ≤ ~2δ centroids, sorted by mean."""
    if means.size == 0:
        return means, weights
    order = np.argsort(means, kind="mergesort")  # stable → deterministic
    m, w = means[order], weights[order]
    total = w.sum()
    q_mid = (np.cumsum(w) - w / 2.0) / total
    k = np.floor(_k1(q_mid, delta))
    starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
    wsum = np.add.reduceat(w, starts)
    msum = np.add.reduceat(m * w, starts)
    return msum / wsum, wsum


def _sketch_row(m: np.ndarray, w: np.ndarray, n: int, lo: float, hi: float):
    return pd.DataFrame(
        [[list(map(float, m)), list(map(float, w)), int(n), float(lo), float(hi)]],
        columns=_SKETCH_COLS,
    )


def tdigest_partial(df: DataFrame, column: str, delta: float = 200.0) -> DataFrame:
    """Per-Arrow-batch digest rows: (means, weights, n, lo, hi).

    Output size ∝ number of batches (one small row each), never rows."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            v = pdf[column].to_numpy(dtype="float64", na_value=np.nan)
            v = v[~np.isnan(v)]
            if v.size == 0:
                continue
            m, w = _compress(v, np.ones_like(v), delta)
            yield _sketch_row(m, w, v.size, v.min(), v.max())

    return df.select(F.col(column).cast("double").alias(column)).mapInPandas(
        gen, _SKETCH_SCHEMA
    )


def _merge_rows(pdf: pd.DataFrame, delta: float) -> pd.DataFrame:
    m = np.concatenate([np.asarray(x, dtype="float64") for x in pdf["means"]])
    w = np.concatenate([np.asarray(x, dtype="float64") for x in pdf["weights"]])
    mm, ww = _compress(m, w, delta)
    return _sketch_row(mm, ww, pdf["n"].sum(), pdf["lo"].min(), pdf["hi"].max())


def tdigest_sketch(
    df: DataFrame, column: str, delta: float = 200.0, fanin: int = 32
) -> DataFrame:
    """One-row DataFrame (means, weights, n, lo, hi): the merged digest.

    Two-level tree merge bounds every merge task to ≤ fanin partials."""
    parts = tdigest_partial(df, column, delta)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        return _merge_rows(pdf[_SKETCH_COLS], delta)

    lvl1 = (
        parts.withColumn("_b", F.spark_partition_id() % fanin)
        .groupBy("_b")
        .applyInPandas(lambda pdf: merge(pdf), schema=_SKETCH_SCHEMA)
    )
    return lvl1.withColumn("_b", F.lit(0)).groupBy("_b").applyInPandas(
        lambda pdf: merge(pdf), schema=_SKETCH_SCHEMA
    )


# ---------------------------------------------------------------------------
# Driver-side evaluation on the (tiny) collected sketch
# ---------------------------------------------------------------------------


class TDigest:
    """Collected sketch: quantile / cdf evaluation, driver-side numpy."""

    def __init__(
        self,
        means: Sequence[float],
        weights: Sequence[float],
        n: int,
        lo: float,
        hi: float,
    ):
        self.means = np.asarray(means, dtype="float64")
        self.weights = np.asarray(weights, dtype="float64")
        self.n = n
        self.lo, self.hi = lo, hi

    @classmethod
    def from_row(cls, row) -> "TDigest":
        return cls(row["means"], row["weights"], row["n"], row["lo"], row["hi"])

    def _cum_mid(self) -> np.ndarray:
        return (np.cumsum(self.weights) - self.weights / 2.0) / self.weights.sum()

    def quantile(self, q: float | Iterable[float]) -> np.ndarray:
        """Interpolated quantile(s); exact at the recorded min/max."""
        qs = np.atleast_1d(np.asarray(q, dtype="float64"))
        xp = np.r_[0.0, self._cum_mid(), 1.0]
        fp = np.r_[self.lo, self.means, self.hi]
        return np.interp(qs, xp, fp)

    def cdf(self, x: float | Iterable[float]) -> np.ndarray:
        xs = np.atleast_1d(np.asarray(x, dtype="float64"))
        xp = np.r_[self.lo, self.means, self.hi]
        fp = np.r_[0.0, self._cum_mid(), 1.0]
        # non-decreasing xp required; centroid means are sorted
        return np.interp(xs, xp, fp, left=0.0, right=1.0)


def tdigest_quantiles(
    df: DataFrame,
    column: str,
    probs: Sequence[float],
    delta: float = 200.0,
    fanin: int = 32,
) -> list[float]:
    """Convenience: sketch → collect the one row → interpolate.

    Raises ``ValueError`` on an empty / all-null column (the sketch has
    no rows to interpolate; ``percentile_approx`` would return null)."""
    row = tdigest_sketch(df, column, delta, fanin).first()
    if row is None:
        raise ValueError(f"tdigest_quantiles: no non-null values in {column!r}")
    return [float(v) for v in TDigest.from_row(row).quantile(list(probs))]


def tdigest_ks(a: TDigest, b: TDigest) -> float:
    """Sup-norm CDF gap between two digests, evaluated on the union of
    their centroid means (+ endpoints) — the drift statistic fed to
    ``DriftThresholds.ks_fail`` when comparing a current snapshot's
    digest against the reference snapshot's (north-star drift surface)."""
    xs = np.unique(
        np.r_[a.means, b.means, a.lo, a.hi, b.lo, b.hi].astype("float64")
    )
    return float(np.max(np.abs(a.cdf(xs) - b.cdf(xs))))
