"""URL canonicalization: per-rule unit cases + dup-group collapse."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowy_json_spark.operators.urls import (
    canonical_duplicate_groups,
    canonicalize_url,
    host_bucket,
    url_host,
)


def canon(spark, url: str) -> str | None:
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(canonicalize_url(F.col("url")).alias("c")).first()["c"]


def test_host_and_scheme_lowercased(spark):
    assert (
        canon(spark, "HTTPS://WWW.Example.COM/Path")
        == "https://www.example.com/Path"  # path case preserved
    )


def test_default_port_dropped_nondefault_kept(spark):
    assert canon(spark, "https://a.com:443/x") == "https://a.com/x"
    assert canon(spark, "http://a.com:80/x") == "http://a.com/x"
    assert canon(spark, "http://a.com:8080/x") == "http://a.com:8080/x"


def test_fragment_dropped_empty_path_normalized(spark):
    assert canon(spark, "https://a.com#frag") == "https://a.com/"
    assert canon(spark, "https://a.com/p#frag") == "https://a.com/p"


def test_tracking_params_dropped_and_query_sorted(spark):
    assert (
        canon(spark, "https://a.com/p?utm_source=x&b=2&a=1")
        == "https://a.com/p?a=1&b=2"
    )
    assert canon(spark, "https://a.com/p?b=2&a=1") == "https://a.com/p?a=1&b=2"
    # all params tracking → no query at all
    assert canon(spark, "https://a.com/p?utm_campaign=z&gclid=1") == "https://a.com/p"
    # key match is exact: refresh is NOT the tracking key "ref"
    assert (
        canon(spark, "https://a.com/p?refresh=1&ref=tw")
        == "https://a.com/p?refresh=1"
    )


def test_non_url_yields_null(spark):
    assert canon(spark, "not a url") is None


def test_duplicate_groups_collapse_variants(spark):
    urls = [
        ("https://A.com/p?b=2&a=1",),
        ("https://a.com:443/p?a=1&b=2&utm_source=x",),
        ("https://a.com/p?a=1&b=2#frag",),
        ("https://b.com/q",),
    ]
    df = spark.createDataFrame(urls, "url string")
    groups = canonical_duplicate_groups(df).collect()
    assert len(groups) == 1
    assert groups[0]["canonical_url"] == "https://a.com/p?a=1&b=2"
    assert groups[0]["n_variants"] == 3


def test_host_bucket_deterministic(spark):
    df = spark.createDataFrame(
        [("https://x.com/1",), ("HTTPS://X.COM/2",)], "url string"
    )
    got = df.select(host_bucket(F.col("url")).alias("b")).distinct().collect()
    assert len(got) == 1  # same host (case-insensitive) → same bucket
