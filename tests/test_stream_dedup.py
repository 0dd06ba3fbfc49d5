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


def test_stream_url_dedup_collapses_variants(spark):
    from snowy_json_spark.streaming.dedup_stream import stream_url_dedup

    # every 3 consecutive rows are variants of one logical URL
    logical = (F.col("value") / 3).cast("long").cast("string")
    m = F.col("value") % 3
    url = (
        F.when(m == 0, F.concat(F.lit("HTTPS://Site.COM:443/p/"), logical,
                                F.lit("?utm_source=t&b=2&a=1")))
        .when(m == 1, F.concat(F.lit("https://site.com/p/"), logical,
                               F.lit("?b=2&a=1#frag")))
        .otherwise(F.concat(F.lit("https://site.com/p/"), logical,
                            F.lit("?a=1&b=2")))
    )
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 300)
        .load()
        .select(F.col("timestamp"), url.alias("url"))
    )
    deduped = stream_url_dedup(stream, "timestamp", "url", watermark="10 seconds")
    q = (
        deduped.writeStream.format("memory")
        .queryName("url_dedup_stream")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.monotonic() + 60
        rows = []
        while time.monotonic() < deadline:
            q.processAllAvailable()
            rows = spark.sql("SELECT canonical_url FROM url_dedup_stream").collect()
            if len(rows) >= 5:
                break
            time.sleep(1)
    finally:
        q.stop()
    urls = [r["canonical_url"] for r in rows]
    assert urls, "nothing emitted"
    assert len(urls) == len(set(urls)), f"variants passed through: {urls}"
    assert all(u.startswith("https://site.com/p/") and "utm" not in u for u in urls)
