"""Benchmark: headline validation-engine queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "query_reps": {name: [...]},
   "sf": ..., "docs_per_sec": ...}

Measurement protocol (round-3 fix — the round-2 artifact swung 4×
with the sandbox's CPU-burst throttle): every query runs ``REPS``
times (default 3) with adaptive cooldowns between reps, and the
reported per-query number is the MIN over reps — the burst-speed
estimate, robust to whichever rep lands in a depleted-credit window
(same protocol as bench_scaling.py:22-66 and BENCH.md).  All reps are
printed in ``query_reps`` so a real regression (all reps slow) is
distinguishable from the throttle (one slow outlier).

Workload (mirrors the north-star surface):
- q_pages_validate : full engine run (row checks + uniqueness +
  referential + drift) over a generated Common-Crawl-style pages table
  sized to the SF tier — the flagship number.
- q_row_checks     : compiled row-spec select over lineitem (largest
  table — raw columnar check throughput).
- q_uniqueness     : salted duplicate detection on orders keys.
- q_referential    : broadcast anti-join lineitem→orders.
- q_stats          : single-pass column stats + HLL over events.
- q_minhash        : MinHash+LSH near-dup sweep over documents.
- q_simhash        : SimHash near-dup sweep over documents.
- q_ann            : brute-force cosine top-k over embeddings.
- q_curation       : one-scan pure-Column curation decision over the
  pages table (blocklist + gopher quality + mixture sample).
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from snowy_json_spark.engine import ValidationEngine  # noqa: E402
from snowy_json_spark.operators.dedup import (  # noqa: E402
    minhash_near_duplicates,
    simhash_near_duplicates,
)
from snowy_json_spark.operators.referential import anti_join_violations  # noqa: E402
from snowy_json_spark.operators.similarity import brute_force_topk  # noqa: E402
from snowy_json_spark.operators.stats import ColumnStatsSpec, column_stats  # noqa: E402
from snowy_json_spark.operators.uniqueness import duplicate_keys_salted  # noqa: E402
from snowy_json_spark.plans.compiler import compile_spec  # noqa: E402
from snowy_json_spark.plans.report import with_verdict  # noqa: E402
from snowy_json_spark.session import get_spark  # noqa: E402
from snowy_json_spark.sources.pages import (  # noqa: E402
    generate_pages,
    lang_ref,
    with_partition_cols,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# The sandbox throttles sustained CPU (BENCH.md): pause after the heavy
# untimed setup (1M-row generation) so the timed section starts with a
# refilled burst budget. Override with SPARK_GRAFT_COOLDOWN=0 to disable.
COOLDOWN = int(os.environ.get("SPARK_GRAFT_COOLDOWN", "75"))

# pages rows scaled to tier: sf0.1 → 1M rows (~ the tier's lineitem scale)
_SF_TO_PAGES = {"sf0.001": 10_000, "sf0.01": 100_000, "sf0.1": 1_000_000}
PAGES_ROWS = int(
    os.environ.get(
        "SPARK_GRAFT_PAGES_ROWS",
        _SF_TO_PAGES.get(os.path.basename(SF_DIR.rstrip("/")), 100_000),
    )
)

PAGES_SPEC = {
    "required": ["url", "warc_ts", "lang"],
    "properties": {
        "url": {"type": "string", "pattern": "^https://", "maxLength": 2048},
        "lang": {"type": "string", "pattern": "^[a-z]{2}$"},
        "text": {"type": ["string", "null"], "minLength": 1},
        "warc_ts": {
            "type": "timestamp",
            "minimum": "2026-07-01 00:00:00",
            "maximum": "2026-07-31 00:00:00",
        },
    },
    "x-table-checks": [
        {"id": "url_unique", "kind": "unique", "keys": ["url"]},
        {"id": "lang_valid", "kind": "referential", "column": "lang", "ref": "lang_ref"},
        {
            "id": "text_len_drift",
            "kind": "drift",
            "column": "text_len",
            "expr": "length(text)",
            "lo": 0,
            "hi": 1500,
            "buckets": 20,
            "group_by": "lang",
        },
    ],
}

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


#: reps per query; the reported number is the min (burst-speed estimate)
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def main() -> None:
    spark = get_spark("snowy-json-spark-bench", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    rep_log: dict[str, list[float]] = {}

    def timed(name: str, fn):
        """min-of-REPS with adaptive inter-rep cooldowns: a query that
        took t seconds gets ~1.5t (8..45 s) of idle before the next rep
        so the sandbox burst budget it spent refills; cheap queries
        barely deplete it and pay only the 8 s floor."""
        times: list[float] = []
        out = None
        for i in range(REPS):
            if i and COOLDOWN:
                time.sleep(min(45.0, max(8.0, 1.5 * times[-1])))
            t0 = time.monotonic()
            out = fn()
            times.append(time.monotonic() - t0)
        timings[name] = round(min(times), 3)
        rep_log[name] = [round(t, 3) for t in times]
        return out

    # -- q_pages_validate (flagship) --------------------------------------
    pages = with_partition_cols(generate_pages(spark, PAGES_ROWS, CPUS * 2))
    pages.write.mode("overwrite").parquet("/tmp/bench_pages")
    pages = spark.read.parquet("/tmp/bench_pages")
    dims = {"lang_ref": lang_ref(spark)}
    if COOLDOWN:
        time.sleep(COOLDOWN)  # refill the CPU-burst budget after generation
    eng = ValidationEngine(
        PAGES_SPEC, id_cols=["url"], partition_cols=["lang", "url_bucket"]
    )

    def run_pages():
        # single-pass flagship: ONE scan of the wide source into the
        # narrow flagged table; verdicts/violations/table checks all
        # read the flagged table (engine.run_single_pass)
        import shutil

        shutil.rmtree("/tmp/bench_out", ignore_errors=True)
        res = eng.run_single_pass(pages, "/tmp/bench_out", dims=dims)
        n = res.verdicts.agg(F.sum("row_count")).collect()[0][0]
        res.violations.count()
        res.table_violations.count()
        return n

    n_pages = timed("q_pages_validate", run_pages)

    # -- q_row_checks ------------------------------------------------------
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    plan = compile_spec(LINEITEM_SPEC, li.schema)
    timed(
        "q_row_checks",
        lambda: with_verdict(li, plan).agg(F.sum(F.col("passed").cast("long"))).collect(),
    )

    # -- q_uniqueness --------------------------------------------------------
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    timed(
        "q_uniqueness",
        lambda: duplicate_keys_salted(orders, ["o_custkey", "o_orderstatus"]).count(),
    )

    # -- q_referential -------------------------------------------------------
    timed(
        "q_referential",
        lambda: anti_join_violations(li, "l_orderkey", orders, "o_orderkey").count(),
    )

    # -- q_stats ---------------------------------------------------------------
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    timed(
        "q_stats",
        lambda: column_stats(
            ev,
            [ColumnStatsSpec("value"), ColumnStatsSpec("user_id"), ColumnStatsSpec("event_type")],
        ).collect(),
    )

    # -- q_minhash ---------------------------------------------------------------
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # untimed warmup: spawn pandas-UDF workers + codegen the signature
    # plan so rep 1 measures throughput, not cold start
    minhash_near_duplicates(
        docs.limit(64), "doc_id", "text", threshold=0.5, n_hashes=64, n_bands=16
    ).count()
    if COOLDOWN:
        time.sleep(COOLDOWN // 2)
    timed(
        "q_minhash",
        lambda: minhash_near_duplicates(
            docs, "doc_id", "text", threshold=0.5, n_hashes=64, n_bands=16
        ).count(),
    )

    # -- q_simhash ---------------------------------------------------------------
    simhash_near_duplicates(docs.limit(64), "doc_id", "text").count()  # warmup
    timed(
        "q_simhash",
        lambda: simhash_near_duplicates(docs, "doc_id", "text", max_hamming=3).count(),
    )

    # -- q_ann -------------------------------------------------------------------
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qvec = [float(x) for x in emb.first()["embedding"]]
    timed("q_ann", lambda: brute_force_topk(emb, "embedding", qvec, k=10).collect())

    # -- q_curation: one-scan pure-Column curation decision over the 1M
    # pages table (host blocklist suffix match + gopher quality rules +
    # deterministic mixture-sample keep) — the LLM-pipeline scan path
    from snowy_json_spark.operators.sampling import keep_fraction
    from snowy_json_spark.operators.text import gopher_flags
    from snowy_json_spark.operators.urls import blocked_domain_match

    def run_curation():
        keep = (
            blocked_domain_match(
                F.col("url"), ["ads.example.com", "tracker.net", "spam.org"]
            ).isNull()
            & gopher_flags(F.col("text"))["keep"]
            & keep_fraction(F.col("url"), 0.5, "bench")
        )
        return pages.filter(keep).count()

    timed("q_curation", run_curation)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "validation_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "query_reps": rep_log,
                "protocol": f"min-of-{REPS}, adaptive cooldowns (BENCH.md)",
                "sf": os.path.basename(SF_DIR.rstrip("/")),
                "cpus": CPUS,
                "pages_rows": PAGES_ROWS,
                "pages_docs_per_sec": round(n_pages / timings["q_pages_validate"], 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
