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
    # "ref" is content-significant (VCS branches, CMS pages) and is
    # KEPT by default (round-3 ADVICE); callers can opt in per corpus
    assert (
        canon(spark, "https://a.com/p?refresh=1&ref=tw")
        == "https://a.com/p?ref=tw&refresh=1"
    )
    from pyspark.sql import functions as F

    from snowy_json_spark.operators.urls import TRACKING_KEYS, canonicalize_url

    df = spark.createDataFrame([("https://a.com/p?refresh=1&ref=tw",)], "url string")
    got = df.select(
        canonicalize_url(
            F.col("url"), tracking_keys=TRACKING_KEYS + ("ref",)
        ).alias("c")
    ).first()["c"]
    assert got == "https://a.com/p?refresh=1"


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


def test_canonicalization_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) over a generated variant
    grid (schemes × hosts × ports × paths × queries × fragments)."""
    rows = []
    i = 0
    for scheme in ("https", "HTTPS", "http"):
        for host in ("A.com", "b.example.org"):
            for port in ("", ":443", ":8080"):
                for path in ("", "/x", "/x/y"):
                    for q in ("", "?b=2&a=1", "?utm_source=t&z=9"):
                        for frag in ("", "#sec"):
                            rows.append((i, f"{scheme}://{host}{port}{path}{q}{frag}"))
                            i += 1
    df = spark.createDataFrame(rows, "id long, url string")
    once = df.select("id", canonicalize_url(F.col("url")).alias("c1"))
    twice = once.select(
        "id", "c1", canonicalize_url(F.col("c1")).alias("c2")
    )
    bad = twice.filter(
        F.col("c1").isNotNull() & (F.col("c1") != F.col("c2"))
    ).collect()
    assert not bad, bad[:5]
    assert twice.filter(F.col("c1").isNotNull()).count() == len(rows)


def test_engine_unique_check_on_canonical_url(spark):
    from snowy_json_spark.engine import ValidationEngine

    df = spark.createDataFrame(
        [
            (1, "https://A.com/p?b=2&a=1"),
            (2, "https://a.com:443/p?a=1&b=2&utm_source=x"),
            (3, "https://a.com/q"),
        ],
        "id long, url string",
    )
    eng = ValidationEngine(
        {
            "properties": {},
            "x-table-checks": [
                {"id": "canon_unique", "kind": "unique", "keys": ["url"],
                 "canonicalize_urls": True}
            ],
        },
        id_cols=["id"],
    )
    res = eng.run(df)
    tv = res.table_violations.collect()
    assert len(tv) == 1  # the two variants collide on the canonical key
    assert "canon_unique" in tv[0]["constraint_id"]
    # raw-string uniqueness would have found nothing
    eng2 = ValidationEngine(
        {"properties": {},
         "x-table-checks": [{"id": "raw", "kind": "unique", "keys": ["url"]}]},
        id_cols=["id"],
    )
    assert eng2.run(df).table_violations.count() == 0
