"""Stage-isolation benchmarks for the r06 optimization round (guide §1.4).

NOT the driver bench — ``bench.py`` is frozen.  This file times individual
stages of the expensive queries with the noop sink so the computation is
measured, not the sink, and prints one JSON line per run.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [stage ...]

Stages (default: all):
  minhash_sig       signature UDF only (noop sink)
  minhash_pairs     sigs cached -> LSH candidate pairs (noop)
  minhash_est       full minhash_near_duplicates count (the bench query)
  simhash_full      full simhash_near_duplicates count
  pages_flag        single-pass flagged-table write (engine core scan)
  row_checks        compiled spec over lineitem, sum(passed)
  uniqueness        duplicate_keys_salted count
  referential       anti_join_violations count
  stats             column_stats collect
  ann               brute_force_topk collect
  curation          pure-column curation filter count
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from snowy_json_spark.operators.dedup import (  # noqa: E402
    estimated_jaccard,
    lsh_candidate_pairs,
    minhash_near_duplicates,
    minhash_signatures,
    simhash_near_duplicates,
)
from snowy_json_spark.operators.referential import anti_join_violations  # noqa: E402
from snowy_json_spark.operators.similarity import brute_force_topk  # noqa: E402
from snowy_json_spark.operators.stats import ColumnStatsSpec, column_stats  # noqa: E402
from snowy_json_spark.operators.uniqueness import duplicate_keys_salted  # noqa: E402
from snowy_json_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
COOLDOWN = int(os.environ.get("SPARK_GRAFT_COOLDOWN", "8"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    wanted = set(sys.argv[1:]) or None
    spark = get_spark("snowy-json-spark-bench-extra", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, list[float]] = {}

    def timed(name, fn, warm=True):
        if wanted is not None and name not in wanted:
            return
        spark.sparkContext.setJobDescription(name)
        if warm:
            fn()  # warmup rep: codegen + python workers
        ts = []
        for _ in range(REPS):
            if COOLDOWN:
                time.sleep(COOLDOWN)
            t0 = time.monotonic()
            fn()
            ts.append(round(time.monotonic() - t0, 3))
        timings[name] = ts
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({name: {"min": min(ts), "reps": ts}}), flush=True)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    timed(
        "minhash_sig",
        lambda: noop(
            minhash_signatures(docs, "doc_id", "text", n_hashes=64, shingle_k=5)
        ),
    )

    def pairs_only():
        sigs = minhash_signatures(
            docs, "doc_id", "text", n_hashes=64, shingle_k=5
        ).cache()
        noop(lsh_candidate_pairs(sigs, "doc_id", n_bands=16, rows_per_band=4))
        sigs.unpersist()

    timed("minhash_pairs", pairs_only)

    timed(
        "minhash_est",
        lambda: minhash_near_duplicates(
            docs, "doc_id", "text", threshold=0.5, n_hashes=64, n_bands=16
        ).count(),
    )

    timed(
        "simhash_full",
        lambda: simhash_near_duplicates(docs, "doc_id", "text", max_hamming=3).count(),
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    from snowy_json_spark.plans.compiler import compile_spec
    from snowy_json_spark.plans.report import with_verdict

    LINEITEM_SPEC = {
        "required": ["l_orderkey", "l_partkey", "l_quantity"],
        "properties": {
            "l_quantity": {"minimum": 0, "maximum": 100},
            "l_discount": {"minimum": 0, "maximum": 0.5},
            "l_extendedprice": {"exclusiveMinimum": 0},
            "l_returnflag": {"enum": ["A", "N", "R"]},
            "l_linestatus": {"pattern": "^[OF]$"},
            "l_tax": {"minimum": 0},
        },
    }
    plan = compile_spec(LINEITEM_SPEC, li.schema)
    timed(
        "row_checks",
        lambda: with_verdict(li, plan)
        .agg(F.sum(F.col("passed").cast("long")))
        .collect(),
    )

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    timed(
        "uniqueness",
        lambda: duplicate_keys_salted(orders, ["o_custkey", "o_orderstatus"]).count(),
    )
    timed(
        "referential",
        lambda: anti_join_violations(li, "l_orderkey", orders, "o_orderkey").count(),
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    timed(
        "stats",
        lambda: column_stats(
            ev,
            [
                ColumnStatsSpec("value"),
                ColumnStatsSpec("user_id"),
                ColumnStatsSpec("event_type"),
            ],
        ).collect(),
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qvec = [float(x) for x in emb.first()["embedding"]]
    timed("ann", lambda: brute_force_topk(emb, "embedding", qvec, k=10).collect())

    print(json.dumps({"all": {k: min(v) for k, v in timings.items()}, "sf": SF_DIR}))
    spark.stop()


if __name__ == "__main__":
    main()
