"""URL canonicalization + host utilities for web-page tables.

No Snow analog — training-data-pipeline capability for the north-star
input shape (Common-Crawl-style pages keyed on ``url``): the same page
commonly appears under trivially-different URLs (case-variant host,
explicit default port, fragment, tracking parameters, unsorted query),
so uniqueness/dedup on the raw string under-merges.  All pure
``pyspark.sql.functions`` Column expressions (whole-stage codegen,
no UDF):

- scheme + host lowercased (path/query case is significant, host isn't)
- explicit default port dropped (``:443`` for https, ``:80`` for http)
- fragment dropped
- tracking parameters dropped (utm_*, fbclid, gclid, msclkid)
- remaining query parameters sorted (order-insensitive equality)
- empty path normalized to ``/``

Hot-host handling: ``host_bucket`` gives a deterministic shuffle key
(``pmod(xxhash64(host), n)``) for salting host-skewed joins/groups —
same convention as the engine's url_bucket partition column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: query parameter KEYS that never affect content identity (exact
#: match, except the utm_ family which matches by prefix — a bare
#: prefix match would wrongly drop e.g. refresh=1 under "fbclid").
#: Deliberately NOT included: "ref" — unlike the ad-click ids it is
#: content-significant on real sites (VCS web UIs use ?ref=<branch>,
#: CMSs use ?ref=<page>), so dropping it over-merges distinct pages
#: (round-3 ADVICE).  Callers who know their corpus can extend the
#: list via the ``tracking_keys`` parameter on the functions below.
TRACKING_KEYS = ("fbclid", "gclid", "msclkid")
TRACKING_PREFIXES = ("utm_",)


def url_host(col: Column) -> Column:
    """Lowercased host (authority minus userinfo/port)."""
    return F.lower(F.try_parse_url(col, F.lit("HOST")))


def _clean_query(
    col: Column,
    tracking_keys: tuple[str, ...] = TRACKING_KEYS,
    tracking_prefixes: tuple[str, ...] = TRACKING_PREFIXES,
) -> Column:
    """Sorted '&'-joined query with tracking params removed; null when
    nothing survives."""
    q = F.try_parse_url(col, F.lit("QUERY"))

    def is_tracking(p: Column) -> Column:
        key = F.substring_index(p, "=", 1)
        exact = F.array_contains(
            F.array(*[F.lit(k) for k in tracking_keys]), key
        )
        pref = F.exists(
            F.array(*[F.lit(t) for t in tracking_prefixes]),
            lambda t: key.startswith(t),
        )
        return exact | pref

    parts = F.filter(F.split(q, "&"), lambda p: (p != "") & ~is_tracking(p))
    joined = F.array_join(F.array_sort(parts), "&")
    return F.when(joined != "", joined)


def canonicalize_url(
    col: Column,
    tracking_keys: tuple[str, ...] = TRACKING_KEYS,
    tracking_prefixes: tuple[str, ...] = TRACKING_PREFIXES,
) -> Column:
    """Canonical form of an http(s) URL (see module docstring); null
    passes through as null, non-URL strings yield null host and are
    left to the caller's validity checks.  ``tracking_keys`` /
    ``tracking_prefixes`` let a caller opt in to corpus-specific
    parameters (e.g. add "ref" back for corpora where it IS a
    tracker)."""
    scheme = F.lower(F.try_parse_url(col, F.lit("PROTOCOL")))
    host = url_host(col)
    # parse_url HOST strips any port; recover NON-default ports from the
    # authority so :8080 stays distinct while :443/:80 normalize away
    auth = F.try_parse_url(col, F.lit("AUTHORITY"))
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    is_default = ((scheme == "https") & (port == "443")) | (
        (scheme == "http") & (port == "80")
    )
    port_part = F.when(
        (port != "") & ~is_default, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))
    path = F.try_parse_url(col, F.lit("PATH"))
    path = F.when((path.isNull()) | (path == ""), F.lit("/")).otherwise(path)
    q = _clean_query(col, tracking_keys, tracking_prefixes)
    base = F.concat(scheme, F.lit("://"), host, port_part, path)
    return F.when(
        col.isNotNull() & scheme.isNotNull() & host.isNotNull(),
        F.when(q.isNotNull(), F.concat(base, F.lit("?"), q)).otherwise(base),
    )


def host_bucket(col: Column, n_buckets: int = 1024) -> Column:
    """Deterministic host shuffle key for salting host-skewed work."""
    return F.pmod(F.xxhash64(url_host(col)), F.lit(n_buckets))


def with_canonical_url(
    df: DataFrame, url_col: str = "url", out_col: str = "canonical_url"
) -> DataFrame:
    return df.withColumn(out_col, canonicalize_url(F.col(url_col)))


def canonical_duplicate_groups(
    df: DataFrame, url_col: str = "url", min_count: int = 2
) -> DataFrame:
    """(canonical_url, n_variants): raw URLs that collapse to the same
    canonical form — partial-aggregated, shuffle rows ∝ distinct
    canonical urls."""
    return (
        with_canonical_url(df, url_col)
        .filter(F.col("canonical_url").isNotNull())
        .groupBy("canonical_url")
        .agg(F.count(F.lit(1)).alias("n_variants"))
        .filter(F.col("n_variants") >= min_count)
    )
