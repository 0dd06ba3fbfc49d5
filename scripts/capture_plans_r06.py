"""Capture .explain('formatted') for every bench query -> plans/r06/.

Usage: python scripts/capture_plans_r06.py <suffix>   (suffix: before|after)
Driver-only (no jobs executed); safe to run alongside other work.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from snowy_json_spark.operators.dedup import (  # noqa: E402
    minhash_near_duplicates,
    simhash_near_duplicates,
)
from snowy_json_spark.operators.referential import anti_join_violations  # noqa: E402
from snowy_json_spark.operators.sampling import keep_fraction  # noqa: E402
from snowy_json_spark.operators.similarity import brute_force_topk  # noqa: E402
from snowy_json_spark.operators.stats import ColumnStatsSpec, column_stats  # noqa: E402
from snowy_json_spark.operators.text import gopher_flags  # noqa: E402
from snowy_json_spark.operators.uniqueness import duplicate_keys_salted  # noqa: E402
from snowy_json_spark.operators.urls import blocked_domain_match  # noqa: E402
from snowy_json_spark.plans.compiler import compile_spec  # noqa: E402
from snowy_json_spark.plans.report import with_verdict  # noqa: E402
from snowy_json_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
SUFFIX = sys.argv[1] if len(sys.argv) > 1 else "before"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
os.makedirs(OUT, exist_ok=True)

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


def dump(name: str, df):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(OUT, f"{name}_{SUFFIX}.txt")
    with open(path, "w") as f:
        f.write(buf.getvalue())
    print("wrote", path)


def main() -> None:
    spark = get_spark("plan-capture-r06", cores=4)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    dump(
        "q_minhash",
        minhash_near_duplicates(
            docs, "doc_id", "text", threshold=0.5, n_hashes=64, n_bands=16
        ),
    )
    dump("q_simhash", simhash_near_duplicates(docs, "doc_id", "text", max_hamming=3))
    plan = compile_spec(LINEITEM_SPEC, li.schema)
    dump(
        "q_row_checks",
        with_verdict(li, plan).agg(F.sum(F.col("passed").cast("long"))),
    )
    dump("q_uniqueness", duplicate_keys_salted(orders, ["o_custkey", "o_orderstatus"]))
    dump("q_referential", anti_join_violations(li, "l_orderkey", orders, "o_orderkey"))
    dump(
        "q_stats",
        column_stats(
            ev,
            [
                ColumnStatsSpec("value"),
                ColumnStatsSpec("user_id"),
                ColumnStatsSpec("event_type"),
            ],
        ),
    )
    qvec = [0.1] * len(emb.select(F.size("embedding")).first()[0] * [1]) if False else None
    first = emb.first()["embedding"]
    dump("q_ann", brute_force_topk(emb, "embedding", [float(x) for x in first], k=10))

    # q_curation over the documents-shaped pages stand-in: use the real
    # pages generator projection (url/text) if a bench pages table exists,
    # else synthesize the same filter over documents columns.
    from snowy_json_spark.sources.pages import generate_pages, with_partition_cols

    pages = with_partition_cols(generate_pages(spark, 1000, 4))
    keep = (
        blocked_domain_match(
            F.col("url"), ["ads.example.com", "tracker.net", "spam.org"]
        ).isNull()
        & gopher_flags(F.col("text"))["keep"]
        & keep_fraction(F.col("url"), 0.5, "bench")
    )
    dump("q_curation", pages.filter(keep))

    # q_pages_validate core: the single-pass flagged projection (the one
    # scan that dominates) + the verdict agg over the flagged table.
    from snowy_json_spark.engine import ValidationEngine

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
    eng = ValidationEngine(
        PAGES_SPEC, id_cols=["url"], partition_cols=["lang", "url_bucket"]
    )
    plan2 = eng.compile(pages)
    from snowy_json_spark.plans.report import checks_array

    valid = F.coalesce(plan2.valid, F.lit(False))
    flagged = pages.select(
        "lang",
        "url_bucket",
        "url",
        F.expr("length(text)").alias("text_len"),
        valid.alias("passed"),
        checks_array(plan2).alias("violations"),
    )
    dump("q_pages_flagged_projection", flagged)

    spark.stop()


if __name__ == "__main__":
    main()
