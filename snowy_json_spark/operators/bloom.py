"""Bloom-filter seen-sets: membership against 10^8-key sets without a
join.

No Snow analog — training-data-pipeline capability: recurring crawl
ingestion asks "is this url already in the corpus?" for every incoming
document.  An anti-join against the corpus keys is exact but shuffles
(or broadcasts) the whole seen-set every run; a Bloom filter answers
with a fixed-size bitmap — no false NEGATIVES ever (a truly-seen key
always flags), false positives at a chosen rate ε, so it is safe as a
pre-filter (drop "seen" docs, or route only "maybe seen" docs into the
exact check, cutting the exact join's probe side by ~(1-ε)).

Spark-first shape:

- bit POSITIONS are JVM columns — ``pmod(xxhash64(key, seed_i), m)``
  per hash function, exploded to a flat long column — so no key bytes
  and no Python-side hashing ever touch the build;
- the build is one ``mapInPandas`` pass: each PARTITION accumulates a
  local numpy bitmap over its (vectorized) position batches and emits
  it once; partials (``n_partitions × m/8`` bytes) OR-merge on the
  driver.  Positions are coalesced to ≤ ``max_partials`` partitions
  first so a 10^9-bit filter collects at most ``max_partials`` × 128 MB
  rather than one partial per input split;
- probing is a scalar Arrow ``pandas_udf`` over the k JVM-computed
  position columns — ``(bitmap[pos>>3] >> (pos&7)) & 1`` vectorized in
  numpy, the bitmap shipped once per task in the closure.

Determinism: xxhash64 is seeded and stable, so the same corpus always
builds the same bitmap and the same probe outcomes — resumable runs and
the DuckDB-checked driver query rely on this.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_params(n_keys: int, fp_rate: float) -> tuple[int, int]:
    """Standard sizing: (m_bits, k) for ``n_keys`` at ``fp_rate``.
    m = -n·ln ε / ln²2 rounded up to a byte multiple, k = (m/n)·ln 2."""
    n_keys = max(n_keys, 1)
    m = int(math.ceil(-n_keys * math.log(fp_rate) / (math.log(2) ** 2)))
    m = max((m + 7) // 8 * 8, 64)
    k = max(int(round(m / n_keys * math.log(2))), 1)
    return m, k


def bit_positions(key: Column, m_bits: int, k: int, seed: int = 0) -> list[Column]:
    """The k bit positions of a key — k independent JVM xxhash64
    streams (salted by a per-function seed column), each mod m."""
    return [
        F.pmod(F.xxhash64(key, F.lit(seed * 1009 + i)), F.lit(m_bits))
        for i in range(k)
    ]


def build_bloom(
    df: DataFrame,
    key_col: str,
    m_bits: int,
    k: int,
    seed: int = 0,
    max_partials: int = 64,
) -> bytes:
    """Driver-held bitmap (``m_bits/8`` bytes) over the non-null keys.

    One scan at FULL parallelism: positions explode JVM-side to a flat
    long column and every natural input partition accumulates its own
    numpy bitmap over its Arrow batches, emitting it once.  The
    per-partition partials then tree-merge executor-side — a
    round-robin repartition to ≤ ``max_partials`` tasks, each OR-ing
    its share — so the driver collects at most ``max_partials``
    bitmaps however many input splits the scan had (the same
    treeAggregate shape Spark's own sketches use; never throttle the
    scan to the partial count)."""
    pos = (
        df.select(F.col(key_col).alias("_k"))
        .filter(F.col("_k").isNotNull())
        .select(F.explode(F.array(*bit_positions(F.col("_k"), m_bits, k, seed))).alias("pos"))
    )
    n_bytes = m_bits // 8

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bm = np.zeros(n_bytes, dtype=np.uint8)
        for b in batches:
            p = b["pos"].to_numpy(dtype=np.int64)
            np.bitwise_or.at(bm, p >> 3, np.left_shift(1, (p & 7)).astype(np.uint8))
        yield pd.DataFrame({"bm": [bm.tobytes()]})

    def or_merge(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bm = np.zeros(n_bytes, dtype=np.uint8)
        for b in batches:
            for raw in b["bm"]:
                bm |= np.frombuffer(raw, dtype=np.uint8)
        yield pd.DataFrame({"bm": [bm.tobytes()]})

    partials = (
        pos.mapInPandas(partial, "bm binary")
        .repartition(max_partials)
        .mapInPandas(or_merge, "bm binary")
        .collect()
    )
    out = np.zeros(n_bytes, dtype=np.uint8)
    for row in partials:
        out |= np.frombuffer(row["bm"], dtype=np.uint8)
    return out.tobytes()


def might_contain(
    key: Column, bitmap: bytes, m_bits: int, k: int, seed: int = 0
) -> Column:
    """Boolean: Bloom membership of ``key`` — false ⇒ definitely never
    added, true ⇒ added OR a false positive.  Positions stay JVM
    columns; the Arrow UDF only does the vectorized k bit tests.  Null
    keys → false."""
    bm = np.frombuffer(bitmap, dtype=np.uint8)
    if len(bm) * 8 != m_bits:
        raise ValueError(f"bitmap holds {len(bm) * 8} bits, expected {m_bits}")

    @F.pandas_udf("boolean")
    def test_bits(*pos_cols: pd.Series) -> pd.Series:
        hit = None
        for p in pos_cols:
            pv = p.to_numpy(dtype=np.int64)
            one = (bm[pv >> 3] >> (pv & 7).astype(np.uint8)) & 1
            hit = one if hit is None else (hit & one)
        return pd.Series(hit.astype(bool))

    return F.when(
        key.isNotNull(), test_bits(*bit_positions(key, m_bits, k, seed))
    ).otherwise(F.lit(False))


def seen_flags(
    df: DataFrame,
    key_col: str,
    bitmap: bytes,
    m_bits: int,
    k: int,
    seed: int = 0,
    out_col: str = "seen",
) -> DataFrame:
    """Input columns + ``out_col``: Bloom membership of the key against
    a previously built seen-set — the crawl-ingestion pre-filter."""
    return df.withColumn(
        out_col, might_contain(F.col(key_col), bitmap, m_bits, k, seed)
    )
