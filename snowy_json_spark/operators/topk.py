"""Skew-safe per-key top-k: domain caps without a hot window task.

No Snow analog — training-data-pipeline capability: corpus curation
caps how many documents any one domain may contribute (FineWeb-style
domain balancing), i.e. "keep the best ``k`` pages per host".  The
naive plan — ``row_number() OVER (PARTITION BY host ORDER BY score)``
— is the textbook unmitigated skew case: window functions cannot
partial-aggregate, so EVERY row of a hot host lands in one task, which
sorts all of them (a Zipfian crawl puts 10^8 rows of one CDN host into
a single sort).  AQE does not split window partitions.

The two-stage form restores the map-side-combine property top-k
actually has:

- stage 1 windows over ``(key, pmod(xxhash64(salt), n_buckets))`` —
  every task sorts ≤ rows/n_buckets — and keeps each bucket's local
  top-k;
- stage 2 windows over ``key`` on the ≤ k·n_buckets survivors.

Correct because the global top-k is a subset of the union of bucket
top-ks (any row beaten by ≥ k rows in its own bucket is beaten by ≥ k
rows globally).  Ties are broken by the trailing ``salt_col`` ordering
so results are deterministic and oracle-reproducible.

Measured (scripts/bench_skew.py, 16M rows, one host owning 50%):
the naive window's hot task dominates; the two-stage plan's largest
sort is 1/n_buckets of it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_key(
    df: DataFrame,
    key_col: str,
    order_by: list[Column],
    k: int,
    salt_col: str | None = None,
    n_buckets: int = 64,
    rank_col: str | None = None,
) -> DataFrame:
    """The top ``k`` rows of every ``key_col`` group under
    ``order_by`` (pass explicit asc/desc Columns; a unique tiebreaker
    last makes results deterministic).  ``salt_col`` (default: the
    first order column) feeds the stage-1 bucket hash — any column
    works, but a near-unique one spreads hot keys best.  With
    ``rank_col`` the final 1..k rank is kept as a column."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    salt = F.col(salt_col) if salt_col is not None else order_by[0]
    bucket = F.pmod(F.xxhash64(salt), F.lit(n_buckets))
    w1 = Window.partitionBy(F.col(key_col), F.col("_tkb")).orderBy(*order_by)
    stage1 = (
        df.withColumn("_tkb", bucket)
        .withColumn("_tkr", F.row_number().over(w1))
        .filter(F.col("_tkr") <= k)
        .drop("_tkr")
    )
    w2 = Window.partitionBy(F.col(key_col)).orderBy(*order_by)
    out = (
        stage1.drop("_tkb")
        .withColumn("_tkr", F.row_number().over(w2))
        .filter(F.col("_tkr") <= k)
    )
    if rank_col is not None:
        return out.withColumnRenamed("_tkr", rank_col)
    return out.drop("_tkr")


def domain_cap(
    df: DataFrame,
    url_col: str,
    score_col: str,
    max_per_host: int,
    id_col: str | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Keep at most ``max_per_host`` documents per url host, preferring
    the highest ``score_col`` — the domain-balancing curation stage.
    ``id_col`` (recommended) breaks score ties deterministically."""
    from .urls import url_host

    order = [F.col(score_col).desc()]
    if id_col is not None:
        order.append(F.col(id_col).asc())
    with_host = df.withColumn("_tkh", url_host(F.col(url_col)))
    out = top_k_per_key(
        with_host,
        "_tkh",
        order,
        max_per_host,
        salt_col=id_col if id_col is not None else score_col,
        n_buckets=n_buckets,
    )
    return out.drop("_tkh")
