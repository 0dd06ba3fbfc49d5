"""Sequence-packing scale exhibit: 100M documents of metadata.

Packing moves only (id, token-count) metadata, so 100M rows is the
honest scale test for the shard fold itself (text joins back later,
co-partitioned).  Measures both layouts — chunk_spans (window cumsum)
and greedy_pack (per-shard applyInPandas fold, vectorized
searchsorted) — consumed through pack-level aggregates so every
per-row output is actually computed.

Usage: python scripts/bench_packing.py [--rows 100000000] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from snowy_json_spark.operators.packing import chunk_spans, greedy_pack
from snowy_json_spark.session import get_spark


def timed(fn, reps: int) -> tuple[float, list[float]]:
    times = []
    for i in range(reps):
        if i:
            time.sleep(min(45.0, max(8.0, 1.5 * times[-1])))
        t0 = time.monotonic()
        fn()
        times.append(round(time.monotonic() - t0, 3))
    return min(times), times


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000_000)
    ap.add_argument("--ctx", type=int, default=2048)
    ap.add_argument("--n-shards", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--cooldown", type=float, default=60.0)
    args = ap.parse_args()

    spark = get_spark("snowy-json-spark-pack-bench", cores=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    path = "/tmp/bench_pack_meta"
    (
        spark.range(args.rows, numPartitions=args.cpus * 2)
        .select(
            F.col("id").alias("doc_id"),
            # realistic web-doc token mix: mostly short, heavy tail past ctx
            (F.pmod(F.xxhash64("id"), F.lit(997)) + 1
             + F.when(F.pmod(F.xxhash64("id", F.lit(2)), F.lit(50)) == 0,
                      F.lit(4000)).otherwise(F.lit(0))).alias("n_tokens"),
        )
        .write.mode("overwrite").parquet(path)
    )
    meta = spark.read.parquet(path)
    n = meta.count()
    time.sleep(args.cooldown)

    def run_greedy():
        packed = greedy_pack(meta, "doc_id", "n_tokens", args.ctx,
                             n_shards=args.n_shards)
        return packed.agg(
            F.count(F.lit(1)), F.sum("pack_off"),
            F.sum(F.col("oversize").cast("long")),
            F.approx_count_distinct(F.concat_ws(":", "shard", "pack_id")),
        ).collect()

    def run_chunks():
        spans = chunk_spans(meta, "doc_id", "n_tokens", args.ctx,
                            n_shards=args.n_shards)
        return spans.agg(
            F.count(F.lit(1)), F.sum("start_off"), F.max("last_chunk"),
            F.sum("n_chunks"),
        ).collect()

    t_g, reps_g = timed(run_greedy, args.reps)
    time.sleep(args.cooldown)
    t_c, reps_c = timed(run_chunks, args.reps)

    print(
        json.dumps(
            {
                "metric": "packing_100m_metadata",
                "rows": n,
                "ctx": args.ctx,
                "n_shards": args.n_shards,
                "greedy_sec": round(t_g, 3),
                "greedy_docs_per_sec": round(n / t_g, 1),
                "chunk_sec": round(t_c, 3),
                "chunk_docs_per_sec": round(n / t_c, 1),
                "reps_greedy": reps_g,
                "reps_chunk": reps_c,
                "cpus": args.cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
