"""PageRank scale exhibit: 20M-edge Zipfian host graph.

The graph operator's scale shape is one edges⋈ranks join + one
partial-aggregating groupBy per iteration; this measures it on a
crawl-like graph — 1M hosts, 20M edges, destination popularity
Zipf-skewed (a few hub hosts receive a large share of in-links, the
case the partial aggregation must absorb).

Usage: python scripts/bench_pagerank.py [--edges 20000000] [--iters 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from snowy_json_spark.operators.graph import page_rank
from snowy_json_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=20_000_000)
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--cooldown", type=float, default=60.0)
    ap.add_argument("--redistribute", action="store_true",
                    help="measure redistribute_dangling=True (rank-mass "
                         "conserving mode; localCheckpoints EVERY iteration "
                         "— r05 VERDICT item 6 asks for its measured cost "
                         "next to the default mode)")
    args = ap.parse_args()

    spark = get_spark("snowy-json-spark-pr-bench", cores=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    path = "/tmp/bench_pr_edges"
    # Zipf-ish dst: square a uniform hash so low ids are hot hubs
    u = (
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(args.nodes)) / float(args.nodes)
    )
    (
        spark.range(args.edges, numPartitions=args.cpus * 2)
        .select(
            F.pmod(F.xxhash64("id"), F.lit(args.nodes)).alias("src"),
            (u * u * args.nodes).cast("long").alias("dst"),
        )
        .write.mode("overwrite").parquet(path)
    )
    edges = spark.read.parquet(path)
    n = edges.count()
    time.sleep(args.cooldown)

    def run():
        return (
            page_rank(edges, "src", "dst", n_iter=args.iters,
                      checkpoint_every=0 if not args.redistribute else 4,
                      redistribute_dangling=args.redistribute)
            .agg(F.sum("rank"), F.max("rank"), F.count(F.lit(1)))
            .collect()
        )

    times = []
    for i in range(args.reps):
        if i:
            time.sleep(min(60.0, max(10.0, 1.5 * times[-1])))
        t0 = time.monotonic()
        run()
        times.append(round(time.monotonic() - t0, 3))

    best = min(times)
    print(
        json.dumps(
            {
                "metric": "pagerank_20m_edges",
                "redistribute_dangling": args.redistribute,
                "edges": n,
                "nodes_space": args.nodes,
                "iters": args.iters,
                "sec": best,
                "edges_x_iters_per_sec": round(n * args.iters / best, 1),
                "reps": times,
                "cpus": args.cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
