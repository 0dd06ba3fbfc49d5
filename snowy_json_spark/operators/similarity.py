"""Similarity search over embedding columns (`array<float>`).

Two tiers:

- **Brute-force cosine top-k** — the correctness baseline.  Dot product
  and norms computed JVM-side (``zip_with`` + ``aggregate``), top-k via
  a single ``orderBy(limit k)`` (Spark's TakeOrderedAndProject: each
  partition keeps a k-heap, driver merges k×partitions rows — no full
  sort, no full shuffle).
- **Random-hyperplane LSH buckets** — the 10^12-row path.  Sign-bit
  signature under D deterministic hyperplanes → bucket id; a query
  probes only its bucket (plus optional multi-probe neighbors at
  Hamming distance 1).  Recall tuned by n_planes / n_probes; verified
  against brute force in tests.

Also: pairwise cosine near-duplicate detection for the dedup suite
(embedding-cosine variant).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _vec_lit(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vec])


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    df: DataFrame,
    vec_col: str,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: (id, cosine) ordered desc.

    orderBy+limit compiles to TakeOrderedAndProject — per-partition
    k-heaps, no global sort."""
    q = _vec_lit(query)
    scored = df.select(
        F.col(id_col),
        cosine(F.col(vec_col).cast("array<double>"), q).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


# ---------------------------------------------------------------------------
# Random-hyperplane LSH
# ---------------------------------------------------------------------------


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim))


def bucket_expr(vec_col: Column, planes: np.ndarray) -> Column:
    """Bucket id = integer of sign bits under each hyperplane, computed
    JVM-side from literal plane arrays (no Python at runtime)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        d = dot(vec_col, _vec_lit(plane.tolist()))
        bit = F.when(d > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseOR(F.shiftleft(bit, i))
    return bucket


def with_lsh_bucket(
    df: DataFrame, vec_col: str, dim: int, n_planes: int = 12, seed: int = 42
) -> DataFrame:
    planes = hyperplanes(dim, n_planes, seed)
    return df.withColumn(
        "lsh_bucket", bucket_expr(F.col(vec_col).cast("array<double>"), planes)
    )


def _query_buckets(query: np.ndarray, planes: np.ndarray, n_probes: int) -> list[int]:
    """Home bucket + multi-probe neighbors: single-bit flips in order of
    smallest |margin| (most likely sign errors), then two-bit flips of
    the lowest-margin pairs (Hamming-2 probing).

    On clustered real-world embeddings the home bucket captures most
    neighbors; on near-uniform vectors the Hamming-2 ring is what keeps
    recall usable — tune n_probes to the recall/candidate-fraction
    tradeoff the workload needs."""
    import itertools

    margins = planes @ query
    n_planes = len(margins)
    home = 0
    for i, m in enumerate(margins):
        if m > 0:
            home |= 1 << i
    order = np.argsort(np.abs(margins))
    buckets = [home]
    for i in order:
        buckets.append(home ^ (1 << int(i)))
    for i, j in itertools.combinations(order[: min(n_planes, 6)], 2):
        buckets.append(home ^ (1 << int(i)) ^ (1 << int(j)))
    return buckets[:n_probes]


def lsh_topk(
    df_bucketed: DataFrame,
    vec_col: str,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    n_planes: int = 12,
    n_probes: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only rows in the query's probe buckets.

    The bucket filter prunes the scan to ~n_probes/2^n_planes of the
    table; on a bucket-partitioned layout this is partition pruning."""
    q = np.asarray(query, dtype=float)
    planes = hyperplanes(len(query), n_planes, seed)
    probes = _query_buckets(q, planes, n_probes)
    cand = df_bucketed.filter(F.col("lsh_bucket").isin(probes))
    qlit = _vec_lit(query)
    scored = cand.select(
        F.col(id_col),
        cosine(F.col(vec_col).cast("array<double>"), qlit).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: k-means coarse quantizer + cell probing
# ---------------------------------------------------------------------------


def train_ivf_centroids(
    df: DataFrame,
    vec_col: str,
    n_cells: int = 16,
    sample_fraction: float = 1.0,
    seed: int = 42,
) -> np.ndarray:
    """Train the coarse quantizer (k-means centroids) on a sample.

    Uses pyspark.ml KMeans — distributed Lloyd iterations; at 10^12
    rows you train on a small deterministic sample and broadcast the
    centroids (a few KB) everywhere else."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    sample = df if sample_fraction >= 1.0 else df.sample(sample_fraction, seed=seed)
    feats = sample.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=20).fit(feats)
    return np.array([np.asarray(c) for c in model.clusterCenters()])


def _nearest_cell_expr(vec_col: Column, centroids: np.ndarray) -> Column:
    """argmin_c ||v - c||² = argmax_c (v·c - ||c||²/2) — pure Column
    expressions over broadcast centroid literals (no UDF, no shuffle)."""
    best_idx = F.lit(0)
    best_score = dot(vec_col, _vec_lit(centroids[0].tolist())) - F.lit(
        float(np.dot(centroids[0], centroids[0]) / 2)
    )
    for i in range(1, len(centroids)):
        score = dot(vec_col, _vec_lit(centroids[i].tolist())) - F.lit(
            float(np.dot(centroids[i], centroids[i]) / 2)
        )
        better = score > best_score
        best_idx = F.when(better, F.lit(i)).otherwise(best_idx)
        best_score = F.when(better, score).otherwise(best_score)
    return best_idx


def _nearest_cell_udf(centroids: np.ndarray):
    """Vectorized cell assignment: one (batch × cells) matmul per Arrow
    batch against the closure-captured centroid matrix.

    Plan size is O(1) in n_cells — the chained-`when` Column path
    (:func:`_nearest_cell_expr`) duplicates the dot product per cell and
    explodes past a few dozen cells, a round-1 scale finding.  Same
    argmax tie-breaking (first maximum) as the expression path."""
    from pyspark.sql.types import IntegerType

    c = centroids.astype(np.float64)
    half = (c * c).sum(axis=1) / 2.0

    def batch(vecs: pd.Series) -> pd.Series:
        res = np.full(len(vecs), -1, dtype=np.int32)
        idxs = [i for i, v in enumerate(vecs) if v is not None]
        if idxs:
            m = np.array(
                [np.asarray(vecs.iloc[i], dtype=np.float64) for i in idxs]
            )
            res[np.asarray(idxs)] = (m @ c.T - half[None, :]).argmax(axis=1)
        return pd.Series(res)

    return F.pandas_udf(batch, IntegerType())


#: above this cell count the Column-expression path's plan gets deeper
#: than codegen handles gracefully; switch to the Arrow argmax UDF
IVF_EXPR_MAX_CELLS = 32


def with_ivf_cell(
    df: DataFrame, vec_col: str, centroids: np.ndarray, impl: str = "auto"
) -> DataFrame:
    """Assign each row its IVF cell.  On Iceberg this column becomes a
    partition key so probes prune at the scan.

    ``auto``: pure Column expressions up to IVF_EXPR_MAX_CELLS cells
    (zero Python), numpy argmax pandas UDF beyond (bounded plan size at
    the 1k-4k cells a 100-TB corpus needs)."""
    if impl == "auto":
        impl = "expr" if len(centroids) <= IVF_EXPR_MAX_CELLS else "arrow"
    if impl == "expr":
        v = F.col(vec_col).cast("array<double>")
        # null vectors get cell -1 in BOTH impls (the Arrow path's
        # convention) so the partition key never depends on which impl
        # `auto` picked
        cell = F.when(
            v.isNotNull(), _nearest_cell_expr(v, centroids).cast("int")
        ).otherwise(F.lit(-1).cast("int"))
    else:
        cell = _nearest_cell_udf(centroids)(F.col(vec_col))
    return df.withColumn("ivf_cell", cell)


def ivf_topk(
    df_celled: DataFrame,
    vec_col: str,
    query: list[float],
    centroids: np.ndarray,
    k: int = 10,
    n_probe: int = 3,
    id_col: str = "vec_id",
) -> DataFrame:
    """Score only rows in the ``n_probe`` cells nearest the query."""
    q = np.asarray(query, dtype=float)
    d2 = ((centroids - q[None, :]) ** 2).sum(axis=1)
    probe_cells = [int(i) for i in np.argsort(d2)[:n_probe]]
    cand = df_celled.filter(F.col("ivf_cell").isin(probe_cells))
    scored = cand.select(
        F.col(id_col),
        cosine(F.col(vec_col).cast("array<double>"), _vec_lit(query)).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


# ---------------------------------------------------------------------------
# embedding-cosine near-duplicates (dedup variant)
# ---------------------------------------------------------------------------


def cosine_near_duplicates(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    dim: int | None = None,
    n_planes: int = 48,
    n_bands: int = 4,
    seed: int = 42,
    max_bucket_rows: int | None = None,
) -> DataFrame:
    """Pairs with cosine ≥ threshold via banded random-hyperplane LSH
    (the minhash OR-amplification pattern, `dedup.lsh_candidate_pairs`).

    The ``n_planes``-bit sign signature is split into ``n_bands`` bands
    of r = n_planes/n_bands bits; a pair is a candidate when it collides
    in ANY band, then exact cosine verifies.  vs the old single-bucket
    join (one 10-bit bucket): each band key is much narrower (2^r
    buckets, r=12 default), so the per-bucket self-join shrinks ~2^(r-10)×
    while OR over bands RAISES recall — p_band = p_bit^r, recall =
    1-(1-p_band)^b (≈0.73 at cosine 0.95 with r=12,b=4, vs 0.35 for the
    single 10-bit bucket).  Clustered real-world embeddings can still
    produce hot buckets: ``max_bucket_rows`` drops band-buckets larger
    than the cap from candidate generation (documented recall trade —
    pairs colliding ONLY in dropped buckets are missed; other bands can
    still recover them).  Shuffle = rows × n_bands, never all-pairs."""
    if n_planes % n_bands:
        raise ValueError("n_planes must be divisible by n_bands")
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    bits_per = n_planes // n_bands
    mask = (1 << bits_per) - 1
    b = with_lsh_bucket(df, vec_col, dim, n_planes, seed)
    band_keys = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright(F.col("lsh_bucket"), i * bits_per)
                .bitwiseAND(F.lit(mask))
                .alias("bbits"),
            )
            for i in range(n_bands)
        ]
    )
    e = b.select(
        F.col(id_col), F.col(vec_col), F.explode(band_keys).alias("bk")
    ).select(id_col, vec_col, F.col("bk.band").alias("band"), F.col("bk.bbits").alias("bbits"))
    if max_bucket_rows is not None:
        keep = (
            e.groupBy("band", "bbits")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_bucket_rows)
            .select("band", "bbits")
        )
        e = e.join(keep, ["band", "bbits"])
    a = e.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "band", "bbits"
    )
    c = e.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "band", "bbits"
    )
    pairs = (
        a.join(c, ["band", "bbits"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "va", "vb")
        .dropDuplicates(["id_a", "id_b"])  # collide in ≥1 band → once
    )
    return pairs.select(
        "id_a",
        "id_b",
        cosine(
            F.col("va").cast("array<double>"), F.col("vb").cast("array<double>")
        ).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)


# ---------------------------------------------------------------------------
# batch k-NN join: top-k neighbors for EVERY row (multi-probe LSH)
# ---------------------------------------------------------------------------


def knn_join(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    dim: int | None = None,
    n_planes: int = 12,
    n_probes: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """(src_id, nbr_id, cosine, rnk≤k) for every row — the all-rows ANN
    workload (similarity graph construction, embedding near-dup
    scoring), not the single-query path of :func:`lsh_topk`.

    Each row probes its home bucket plus single-bit flips (Hamming-1
    ring; ``n_probes`` buckets total, default all n_planes+1); probe
    rows join candidate rows on the bucket key, exact cosine scores the
    survivors, and a per-src window keeps the top k.  Shuffle profile:
    candidates ∝ rows × avg_bucket_size × n_probes (bucketed, never the
    all-pairs square), then ONE hash-partition by src for the window.
    With n_planes=1 the two probes cover the whole bucket space, making
    the join exhaustive — exact k-NN, used by the driver oracle; at
    scale raise n_planes so avg_bucket_size = rows / 2^n_planes keeps
    the candidate count linear-ish."""
    if dim is None:
        first = df.select(vec_col).first()
        if first is None:  # empty input: empty result, not a crash
            return df.select(
                F.col(id_col).alias("src_id"),
                F.col(id_col).alias("nbr_id"),
                F.lit(0.0).alias("cosine"),
                F.lit(0).alias("rnk"),
            ).limit(0)
        dim = len(first[0])
    if n_probes is None:
        n_probes = n_planes + 1
    b = with_lsh_bucket(df, vec_col, dim, n_planes, seed)
    home = F.col("lsh_bucket")
    ring = F.array(home, *[home.bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)])
    probes = F.slice(ring, 1, n_probes)
    src = b.select(
        F.col(id_col).alias("src_id"),
        F.col(vec_col).alias("_sv"),
        F.explode(probes).alias("lsh_bucket"),
    )
    cand = b.select(
        F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("_nv"), "lsh_bucket"
    )
    scored = (
        src.join(cand, "lsh_bucket")
        .filter(F.col("src_id") != F.col("nbr_id"))
        .select(
            "src_id",
            "nbr_id",
            cosine(
                F.col("_sv").cast("array<double>"), F.col("_nv").cast("array<double>")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("src_id").orderBy(F.col("cosine").desc(), F.col("nbr_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


# ---------------------------------------------------------------------------
# int8 embedding quantization (storage path for trillion-row tables)
# ---------------------------------------------------------------------------


def quantize_embedding(vec: Column) -> Column:
    """struct(scale double, q array<tinyint>): symmetric per-vector int8
    quantization, q = round(v / scale) with scale = max|v| / 127.

    4× smaller than float32 on disk/shuffle (8× vs float64) — the
    standard storage format for web-scale embedding tables; cosine on
    dequantized vectors is within ~1e-2 of exact for unit-norm inputs.
    Pure Column arithmetic (array_max/transform/round), deterministic
    and oracle-checkable.  All-zero vectors quantize to scale 0 and
    zero codes; dequantize restores exact zeros."""
    v = vec.cast("array<double>")
    scale = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    q = F.when(
        scale > 0,
        F.transform(v, lambda x: F.round(x / scale).cast("tinyint")),
    ).otherwise(F.transform(v, lambda x: F.lit(0).cast("tinyint")))
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize_embedding(quant: Column) -> Column:
    """array<double>: q * scale — the lossy inverse of
    :func:`quantize_embedding`."""
    return F.transform(
        quant["q"], lambda x: x.cast("double") * quant["scale"]
    )
