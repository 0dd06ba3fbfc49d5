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


def test_streaming_curation_columns_are_stateless_safe(spark):
    """The curation column stack — blocklist match, gopher quality,
    Unicode canonicalization (Arrow UDF), deterministic sample — is
    stateless, so the SAME Columns must run unchanged on a stream and
    agree row-for-row with batch evaluation of identical input."""
    from snowy_json_spark.operators.normalize import canonical_text
    from snowy_json_spark.operators.sampling import keep_fraction
    from snowy_json_spark.operators.text import gopher_flags
    from snowy_json_spark.operators.urls import blocked_domain_match

    def curate(df):
        return df.select(
            "value",
            blocked_domain_match(
                F.col("url"), ["blocked.example"]
            ).isNotNull().alias("blocked"),
            gopher_flags(F.col("text"))["keep"].alias("quality_ok"),
            keep_fraction(F.col("url"), 0.5, "stream").alias("sampled"),
            canonical_text(F.col("text")).alias("canon"),
        )

    def synth(df):
        return df.select(
            "value",
            F.concat(
                F.when(F.col("value") % 7 == 0, F.lit("https://x.blocked.example/p/"))
                .otherwise(F.lit("https://ok.example.com/p/")),
                F.col("value").cast("string"),
            ).alias("url"),
            F.concat(
                F.lit("the quick brown fox jumps over the lazy dog cafe"),
                F.lit(chr(0x0301) + " "),
                F.repeat(F.lit("some words here again and again "),
                         (F.col("value") % 9 + 1).cast("int")),
            ).alias("text"),
        )

    stream = synth(
        spark.readStream.format("rate").option("rowsPerSecond", 500).load()
    )
    q = (
        curate(stream).writeStream.format("memory")
        .queryName("curation_stream").outputMode("append").start()
    )
    try:
        deadline = time.monotonic() + 60
        rows = []
        while time.monotonic() < deadline:
            q.processAllAvailable()
            rows = spark.sql("SELECT * FROM curation_stream").collect()
            if len(rows) >= 20:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert len(rows) >= 20, "stream produced too few rows"
    # batch-evaluate the same synthetic rows and compare exactly
    values = [r["value"] for r in rows]
    batch = {
        r["value"]: r
        for r in curate(
            synth(spark.range(max(values) + 1).select(F.col("id").alias("value")))
        ).collect()
        if r["value"] in set(values)
    }
    for r in rows:
        b = batch[r["value"]]
        assert (r["blocked"], r["quality_ok"], r["sampled"], r["canon"]) == (
            b["blocked"], b["quality_ok"], b["sampled"], b["canon"]
        ), r["value"]
    # both branches of the blocklist must appear
    assert {r["blocked"] for r in rows} == {True, False}
