"""LM perplexity throughput: train + score 1M Common-Crawl-style pages.

One-off exhibit for BENCH.md — min-of-reps with cooldowns, one JSON
line.  Usage: python scripts/bench_lm.py [--rows 1000000] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from snowy_json_spark.operators.lm import score_documents, train_word_lm
from snowy_json_spark.session import get_spark
from snowy_json_spark.sources.pages import generate_pages


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
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--vocab", type=int, default=100_000)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--cooldown", type=float, default=60.0)
    args = ap.parse_args()

    spark = get_spark("snowy-json-spark-lm-bench", cores=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    path = "/tmp/bench_lm_pages"
    generate_pages(spark, args.rows, args.cpus * 2).write.mode(
        "overwrite"
    ).parquet(path)
    pages = spark.read.parquet(path).select("url", "text")
    n = pages.count()
    time.sleep(args.cooldown)

    state = {}

    def train():
        state["vocab"], state["meta"] = train_word_lm(
            pages, "text", vocab_size=args.vocab, alpha=1.0
        )
        state["vocab"] = state["vocab"].cache()
        state["vocab"].count()

    def score():
        return (
            score_documents(pages, "url", "text", state["vocab"],
                            state["meta"]["oov_logp"])
            .agg({"cross_entropy": "avg"})
            .collect()
        )

    t_train, reps_train = timed(train, args.reps)
    time.sleep(args.cooldown)
    t_score, reps_score = timed(score, args.reps)

    print(
        json.dumps(
            {
                "metric": "lm_train_score_1m_pages",
                "rows": n,
                "vocab": state["meta"]["vocab_size"],
                "corpus_tokens": state["meta"]["n_tokens"],
                "train_sec": round(t_train, 3),
                "score_sec": round(t_score, 3),
                "score_docs_per_sec": round(n / t_score, 1),
                "reps_train": reps_train,
                "reps_score": reps_score,
                "cpus": args.cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
