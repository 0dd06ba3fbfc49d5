"""Training-corpus sinks: deterministic shard and sorted layouts.

No Snow analog — pipeline capability: after curation the corpus must
land on disk in a layout downstream consumers can rely on:

- :func:`write_training_shards` — Hive-partitioned by a DETERMINISTIC
  shard key (``pmod(xxhash64(id), n_shards)`` — a pure key function,
  so re-running the writer on the same rows produces the same shard
  membership regardless of input partitioning; the same contract as
  `sampling.sample_bucket` and `packing.shard_of`).  A training job
  reading shards `k..k+m` gets a reproducible slice; a resumed writer
  overwrites shard directories idempotently.  Rows are sorted within
  each shard so output bytes are stable run-to-run.
- :func:`write_sorted_corpus` — range-partitioned + sorted layout
  (``repartitionByRange`` → ``sortWithinPartitions``): parquet
  min/max column statistics become effective (a reader filtering on
  the sort key skips whole files), and downstream merge-joins on the
  sort key avoid a shuffle-sort.
- :func:`read_shards` — partition-pruned read of a shard subset; the
  pruning happens at the scan (PartitionFilters), no data touched
  outside the requested shards.

Scale: both writers are one shuffle each (hash resp. range); neither
collects anything on the driver.  Shard count is the parallelism
contract — pick ``n_shards`` ≈ total_bytes / target_file_bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.packing import shard_of as shard_key  # one shared contract

SHARD_COL = "shard"


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Hive layout ``path/shard=K/...`` with deterministic membership
    and within-shard ordering (default: by ``id_col``).  One shuffle
    (repartition on the shard value) → one task per shard → one file
    per shard directory."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    sort_cols = sort_cols or [id_col]
    out = (
        df.withColumn(SHARD_COL, shard_key(F.col(id_col), n_shards))
        .repartition(n_shards, F.col(SHARD_COL))
        .sortWithinPartitions(SHARD_COL, *sort_cols)
    )
    out.write.mode(mode).partitionBy(SHARD_COL).format(fmt).save(path)


def read_shards(
    spark: SparkSession, path: str, shards: list[int] | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Read the sharded corpus; with ``shards`` given, the filter is a
    partition-column predicate, so pruning happens at file listing —
    verify with `.explain()` → ``PartitionFilters``."""
    df = spark.read.format(fmt).load(path)
    if shards is not None:
        df = df.filter(F.col(SHARD_COL).isin([int(s) for s in shards]))
    return df


def write_sorted_corpus(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Globally range-partitioned, within-file sorted layout on
    ``sort_cols`` — parquet row-group min/max statistics line up with
    the sort key, so selective readers skip files, and merge-joins on
    the key need no re-sort.  Range boundaries come from Spark's
    reservoir sampling of the key distribution, so files are
    balanced even under Zipfian keys (a hot key spans adjacent
    files instead of exploding one)."""
    if not sort_cols:
        raise ValueError("sort_cols must be non-empty")
    cols = [F.col(c) for c in sort_cols]
    out = df.repartitionByRange(*(([n_files] if n_files else []) + cols))
    out = out.sortWithinPartitions(*cols)
    out.write.mode(mode).format(fmt).save(path)
