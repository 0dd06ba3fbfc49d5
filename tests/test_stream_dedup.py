"""Streaming exact dedup with bounded state."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from snowy_json_spark.streaming.dedup_stream import stream_exact_dedup


def test_stream_exact_dedup(spark):
    # rate stream where every pair of rows shares the same text payload
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 200)
        .load()
        .select(
            F.col("timestamp"),
            F.col("value"),
            F.concat(F.lit("doc "), (F.col("value") / 2).cast("long").cast("string")).alias("text"),
        )
    )
    deduped = stream_exact_dedup(stream, "timestamp", "text", watermark="10 seconds")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.monotonic() + 60
        rows = []
        while time.monotonic() < deadline:
            q.processAllAvailable()
            rows = spark.sql("SELECT text FROM dedup_stream").collect()
            if len(rows) >= 5:
                break
            time.sleep(1)
    finally:
        q.stop()
    texts = [r["text"] for r in rows]
    assert texts, "nothing emitted"
    assert len(texts) == len(set(texts)), f"duplicates passed through: {texts}"
