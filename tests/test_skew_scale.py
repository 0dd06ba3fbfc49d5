"""Tier-4 (SURVEY.md §5): hot-key skew at 1M rows — salted and plain
plans must agree, and skewed aggregations must complete with AQE."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snowy_json_spark.operators.uniqueness import duplicate_keys, duplicate_keys_salted
from snowy_json_spark.sources.pages import generate_pages, with_partition_cols


@pytest.fixture(scope="module")
def pages_1m(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("skew") / "pages")
    with_partition_cols(generate_pages(spark, 1_000_000, 64)).write.parquet(path)
    return spark.read.parquet(path)


def test_lang_skew_exists(spark, pages_1m):
    dist = {r["lang"]: r["count"] for r in pages_1m.groupBy("lang").count().collect()}
    assert dist["en"] / sum(dist.values()) > 0.55  # planted Zipf head


def test_salted_equals_plain_on_skewed_keys(spark, pages_1m):
    # (lang, url_bucket): 'en' buckets are ~60× hotter than tail langs
    plain = {
        (r["lang"], r["url_bucket"]): r["dup_count"]
        for r in duplicate_keys(pages_1m, ["lang", "url_bucket"]).collect()
    }
    salted = {
        (r["lang"], r["url_bucket"]): r["dup_count"]
        for r in duplicate_keys_salted(pages_1m, ["lang", "url_bucket"], salt_buckets=32).collect()
    }
    assert plain == salted
    assert plain  # hot keys actually duplicated


def test_salted_url_duplicates_at_scale(spark, pages_1m):
    plain = duplicate_keys(pages_1m, ["url"]).agg(
        F.count("*").alias("n"), F.sum("dup_count").alias("s")
    ).collect()[0]
    salted = duplicate_keys_salted(pages_1m, ["url"], salt_buckets=64).agg(
        F.count("*").alias("n"), F.sum("dup_count").alias("s")
    ).collect()[0]
    assert (plain["n"], plain["s"]) == (salted["n"], salted["s"])
    assert plain["n"] > 1000  # ~0.5% planted duplicate urls
