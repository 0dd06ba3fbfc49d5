"""Skew-safe per-key top-k: domain caps without a hot window task.

No Snow analog — training-data-pipeline capability: corpus curation
caps how many documents any one domain may contribute (FineWeb-style
domain balancing), i.e. "keep the best ``k`` pages per host".  The
textbook worry is that ``row_number() OVER (PARTITION BY host ORDER BY
score)`` puts EVERY row of a hot host into one window task (a Zipfian
crawl puts 10^8 rows of one CDN host into a single sort, and AQE does
not split window partitions).

**Measured reality (scripts/bench_skew.py, SKEW_RESULT.json): Spark ≥
3.5 already fixes this for rank-limit filters.** The
``InferWindowGroupLimit`` optimizer rule rewrites
``row_number()/rank()/dense_rank() <= k`` into a ``WindowGroupLimit``
pair — a *Partial* map-side top-k before the shuffle and a *Final*
one after — so each mapper forwards at most ``k`` rows per key and
the hot host's reducer sees ≤ k·n_mappers rows, not 10^8.  On a
16M-row / 90%-hot corpus with 256-char payloads forced through the
window, the truly naive plan (rule disabled via
``spark.sql.optimizer.windowGroupLimitThreshold = -1``) takes 80.1 s
— one task sorting 14.4M wide rows — vs **5.4 s declarative window
(14.9×)** and **2.9 s explicit two-stage (27.4×)**.  On bare
metadata-width rows the ordering flips (window 2.4 s beats two-stage
7.4 s: the pruning happens in the same pass that reads the data,
while two-stage pays a full extra exchange) — the tradeoff is
row-width dependent, both are safe, and the unmitigated plan is the
only catastrophic one.

The default ``impl`` is the plain window — optimizer-maintained, no
tuning knob — and tests pin ``WindowGroupLimit ... Partial`` into the
physical plan, so if a Spark upgrade or conf change (threshold conf
above, or ``k`` over its 1000 default) silently drops the rewrite,
the plan test fails rather than the cluster.  ``impl="two_stage"``
keeps the manual form — stage-1 window over ``(key,
pmod(xxhash64(salt), n_buckets))`` keeping each bucket's local top-k
(correct because the global top-k is a subset of the union of bucket
top-ks: any row beaten by ≥ k rows in its own bucket is beaten by ≥ k
rows globally), stage-2 window over ``key`` on the ≤ k·n_buckets
survivors — for the cases the rule cannot cover (``k`` beyond the
threshold, percent-rank-style predicates) or wide-row corpora where
it measures faster.  Ties are broken by the trailing ``order_by``
tiebreaker so both impls are deterministic and oracle-reproducible.
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
    impl: str = "window",
) -> DataFrame:
    """The top ``k`` rows of every ``key_col`` group under
    ``order_by`` (pass explicit asc/desc Columns; a unique tiebreaker
    last makes results deterministic).

    ``impl="window"`` (default): one declarative window — Spark's
    ``InferWindowGroupLimit`` plans the map-side partial top-k (see
    module docstring; requires ``k`` ≤
    ``spark.sql.optimizer.windowGroupLimitThreshold``, default 1000).
    ``impl="two_stage"``: explicit bucketed stage-1 local top-k;
    ``salt_col`` is REQUIRED for it (the bucket hash needs a plain
    column — ``order_by`` entries carry asc/desc sort order, which
    cannot be hashed) — any column works, but a near-unique one
    spreads hot keys best.  With ``rank_col`` the final 1..k rank is
    kept."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if impl not in ("window", "two_stage"):
        raise ValueError(f"impl must be 'window' or 'two_stage', got {impl!r}")
    if impl == "two_stage" and salt_col is None:
        raise ValueError("impl='two_stage' requires salt_col")
    w2 = Window.partitionBy(F.col(key_col)).orderBy(*order_by)
    if impl == "window":
        staged = df
    else:
        salt = F.col(salt_col)
        bucket = F.pmod(F.xxhash64(salt), F.lit(n_buckets))
        w1 = Window.partitionBy(F.col(key_col), F.col("_tkb")).orderBy(*order_by)
        staged = (
            df.withColumn("_tkb", bucket)
            .withColumn("_tkr", F.row_number().over(w1))
            .filter(F.col("_tkr") <= k)
            .drop("_tkr", "_tkb")
        )
    out = (
        staged.withColumn("_tkr", F.row_number().over(w2))
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
    impl: str = "window",
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
        impl=impl,
    )
    return out.drop("_tkh")
