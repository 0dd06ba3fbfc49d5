"""Shard/sorted sinks: determinism, pruning, ordering."""

from __future__ import annotations

import glob
import hashlib

import pytest

from pyspark.sql import functions as F

from snowy_json_spark.sources.shards import (
    read_shards,
    write_sorted_corpus,
    write_training_shards,
)


def _corpus(spark, n=500):
    return spark.range(n).select(
        F.concat(F.lit("https://h"), (F.col("id") % 17).cast("string"),
                 F.lit(".ex.com/p/"), F.col("id").cast("string")).alias("url"),
        (F.col("id") % 5).cast("string").alias("lang"),
        F.md5(F.col("id").cast("string")).alias("text"),
    )


def _digest(df):
    rows = sorted(map(tuple, df.collect()))
    return hashlib.md5(repr(rows).encode()).hexdigest()


def test_shard_write_deterministic_and_complete(spark, tmp_path):
    df = _corpus(spark)
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(df, p1, "url", 8)
    write_training_shards(df.repartition(13), p2, "url", 8)
    a, b = read_shards(spark, p1), read_shards(spark, p2)
    assert _digest(a) == _digest(b)
    assert a.count() == 500
    # membership is the pure key function, independent of layout
    assert (
        a.withColumn(
            "expect", F.pmod(F.xxhash64("url"), F.lit(8)).cast("int")
        ).filter(F.col("shard") != F.col("expect")).count() == 0
    )
    # one data file per shard directory
    for d in glob.glob(p1 + "/shard=*"):
        files = [f for f in glob.glob(d + "/*") if f.endswith(".parquet")]
        assert len(files) == 1, d


def test_shard_read_prunes_partitions(spark, tmp_path):
    df = _corpus(spark)
    p = str(tmp_path / "c")
    write_training_shards(df, p, "url", 8)
    sub = read_shards(spark, p, shards=[2, 5])
    assert set(r["shard"] for r in sub.select("shard").distinct().collect()) == {2, 5}
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "shard" in plan, plan
    full = read_shards(spark, p)
    want = full.filter(F.col("shard").isin([2, 5])).count()
    assert sub.count() == want > 0


def test_sorted_corpus_layout(spark, tmp_path):
    df = _corpus(spark)
    p = str(tmp_path / "sorted")
    write_sorted_corpus(df, p, ["lang", "url"], n_files=4)
    back = spark.read.parquet(p)
    assert _digest(back) == _digest(df)
    # every file individually sorted by (lang, url)
    for f in glob.glob(p + "/*.parquet"):
        rows = spark.read.parquet(f).select("lang", "url").collect()
        keys = [(r["lang"], r["url"]) for r in rows]
        assert keys == sorted(keys), f


def test_writer_params_validated(spark, tmp_path):
    df = _corpus(spark, n=10)
    with pytest.raises(ValueError):
        write_training_shards(df, str(tmp_path / "x"), "url", 0)
    with pytest.raises(ValueError):
        write_sorted_corpus(df, str(tmp_path / "y"), [])
