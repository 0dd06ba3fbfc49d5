"""Skew exhibit: hot-host per-key top-k, naive window vs two-stage.

The north rule calls out explicit skew mitigation; this measures it on
the per-key operation that genuinely skews.  A crawl's host
distribution is Zipfian — here the worst case: one host owns
``--hot-frac`` (default 0.5) of all rows, the rest spread over 100k
hosts.

Which op to measure was itself measured: a first version of this
script benchmarked ``groupBy(host).agg(count_distinct(url))`` naive vs
salted and found the naive plan NOT skewed (0.84× — i.e. salting
slightly behind), because Catalyst two-phases a lone count_distinct on
(host, url), spreading the hot host's urls in phase 1 already.  The
operation that DOES hit one reducer is the windowed per-host top-k
(domain caps à la FineWeb): ``row_number() OVER (PARTITION BY host
ORDER BY score)`` cannot partial-aggregate, every hot-host row lands
in ONE window task which sorts all of them, and AQE does not split
window partitions.  ``operators.topk.top_k_per_key`` restores the
map-side-combine property with a bucketed stage-1 local top-k; this
script measures naive vs two-stage on the same skewed input.

Protocol: same as bench.py/bench_scaling.py — min-of-reps with
cooldowns, all reps printed.  Output: ONE JSON line with both times
and the speedup.

Usage: python scripts/bench_skew.py [--rows 16000000] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from snowy_json_spark.operators.topk import top_k_per_key
from snowy_json_spark.session import get_spark


def timed(fn, reps: int, cooldown: float) -> tuple[float, list[float]]:
    times = []
    for i in range(reps):
        if i and cooldown:
            time.sleep(min(45.0, max(8.0, 1.5 * times[-1])))
        t0 = time.monotonic()
        fn()
        times.append(time.monotonic() - t0)
    return min(times), [round(t, 3) for t in times]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16_000_000)
    ap.add_argument("--hot-frac", type=float, default=0.5)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--cooldown", type=float, default=45.0)
    args = ap.parse_args()

    spark = get_spark("snowy-json-spark-skew", cores=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic skewed table: hot host owns hot_frac of rows
    hot_cut = int(args.hot_frac * 1_000_000)
    df = (
        spark.range(args.rows, numPartitions=args.cpus * 2)
        .select(
            F.when(
                F.pmod(F.xxhash64("id"), F.lit(1_000_000)) < hot_cut,
                F.lit("hot.example.com"),
            )
            .otherwise(
                F.concat(F.lit("h"), F.pmod("id", F.lit(100_000)).cast("string"),
                         F.lit(".example.com"))
            )
            .alias("host"),
            F.col("id").alias("doc_id"),
            F.pmod(F.xxhash64("id", F.lit(7)), F.lit(1_000_000)).alias("score"),
        )
    )
    path = "/tmp/bench_skew_pages"
    df.write.mode("overwrite").parquet(path)
    pages = spark.read.parquet(path)
    n = pages.count()
    time.sleep(args.cooldown)  # refill burst budget after generation

    order = [F.col("score").desc(), F.col("doc_id").asc()]

    def naive():
        # single window: every row of hot.example.com sorts in ONE task
        w = Window.partitionBy("host").orderBy(*order)
        return (
            pages.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= args.k)
            .count()
        )

    def two_stage():
        return top_k_per_key(
            pages, "host", order, args.k,
            salt_col="doc_id", n_buckets=args.cpus * 2,
        ).count()

    t_two, reps_two = timed(two_stage, args.reps, args.cooldown)
    time.sleep(args.cooldown)
    t_naive, reps_naive = timed(naive, args.reps, args.cooldown)

    print(
        json.dumps(
            {
                "metric": "skew_hot_host_topk",
                "rows": n,
                "hot_frac": args.hot_frac,
                "k": args.k,
                "naive_sec": round(t_naive, 3),
                "two_stage_sec": round(t_two, 3),
                "speedup": round(t_naive / t_two, 3),
                "reps_naive": reps_naive,
                "reps_two_stage": reps_two,
                "cpus": args.cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
