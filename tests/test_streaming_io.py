"""Structured Streaming validation, table-IO seam, and byte-stable
result writing."""

from __future__ import annotations

import glob
import hashlib
import json
import time

import pytest
from pyspark.sql import functions as F

from snowy_json_spark.engine import ValidationEngine
from snowy_json_spark.sources.pages import generate_pages, lang_ref, with_partition_cols
from snowy_json_spark.sources.tables import load_spec, read_table, write_table
from snowy_json_spark.streaming.validate_stream import (
    stream_partition_verdicts,
    stream_violations,
)

SPEC = {
    "required": ["url", "lang"],
    "properties": {"lang": {"pattern": "^[a-z]{2}$"}},
}


def test_stream_violations_rate_source(spark, tmp_path):
    # rate source → synthesize url/lang columns → violations stream
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 500)
        .load()
        .select(
            F.concat(F.lit("https://h/"), F.col("value").cast("string")).alias("url"),
            F.when(F.col("value") % 10 == 0, F.lit("ZZ")).otherwise(F.lit("en")).alias("lang"),
            F.col("timestamp"),
        )
    )
    v = stream_violations(stream, SPEC, ["url"])
    q = (
        v.writeStream.format("memory")
        .queryName("viol_stream")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.monotonic() + 60
        rows = []
        while time.monotonic() < deadline:
            q.processAllAvailable()
            rows = spark.sql("SELECT * FROM viol_stream").collect()
            if rows:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert rows, "no violations arrived from the stream"
    assert all(r["constraint_id"] == "#/properties/lang/pattern" for r in rows)


def test_stream_windowed_partition_verdicts(spark):
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 500)
        .load()
        .select(
            F.concat(F.lit("https://h/"), F.col("value").cast("string")).alias("url"),
            F.lit("en").alias("lang"),
            F.col("timestamp"),
        )
    )
    pv = stream_partition_verdicts(
        stream, SPEC, ts_col="timestamp", window_duration="5 seconds",
        watermark="5 seconds", partition_cols=["lang"],
    )
    q = (
        pv.writeStream.format("memory")
        .queryName("verd_stream")
        .outputMode("update")
        .start()
    )
    try:
        deadline = time.monotonic() + 60
        rows = []
        while time.monotonic() < deadline:
            q.processAllAvailable()
            rows = spark.sql("SELECT * FROM verd_stream").collect()
            if rows:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert rows
    assert all(r["passed"] for r in rows)  # all lang='en' → clean


def test_table_io_seam(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    write_table(df, str(tmp_path / "t"))
    back = read_table(spark, str(tmp_path / "t"))
    assert back.collect() == df.collect()


def test_load_spec_json(tmp_path):
    p = tmp_path / "spec.json"
    p.write_text(json.dumps(SPEC))
    assert load_spec(str(p)) == SPEC


def _dir_digest(path: str) -> str:
    h = hashlib.sha256()
    for f in sorted(glob.glob(f"{path}/**/*.parquet", recursive=True)):
        h.update(open(f, "rb").read())
    return h.hexdigest()


def test_write_results_byte_stable(spark, tmp_path):
    pages = with_partition_cols(generate_pages(spark, 1500, 6), url_buckets=4)
    spec = {
        "required": ["url", "lang"],
        "properties": {"lang": {"pattern": "^[a-z]{2}$"}},
        "x-table-checks": [
            {"id": "url_unique", "kind": "unique", "keys": ["url"]},
            {"id": "lang_valid", "kind": "referential", "column": "lang", "ref": "lang_ref"},
        ],
    }
    eng = ValidationEngine(spec, id_cols=["url"], partition_cols=["lang"])
    dims = {"lang_ref": lang_ref(spark)}
    digests = []
    for run in ("r1", "r2"):
        res = eng.run(pages, dims=dims)
        out = str(tmp_path / run)
        eng.write_results(res, out)
        digests.append(
            (
                _dir_digest(f"{out}/verdicts"),
                _dir_digest(f"{out}/violations"),
                _dir_digest(f"{out}/table_violations"),
            )
        )
    assert digests[0] == digests[1], "two identical runs must write identical bytes"
    m = json.load(open(f"{tmp_path}/r1/metrics.json"))
    assert "stats" in m and "drift" in m
