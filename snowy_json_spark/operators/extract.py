"""HTML → text extraction with byte-identity verification.

BASELINE.json input_hint: "per-row invariant vs the reference:
byte-identical extracted text per url".  This module is the engine-side
half of that contract:

- :func:`extract_text` — the extractor (JVM-side regexp for the
  synthetic markup; a real pipeline swaps in a trafilatura-style
  pandas UDF behind the same signature).
- :func:`extraction_violations` — rows whose stored ``text`` differs
  byte-for-byte from re-extraction of ``html`` (the oracle check),
  in the engine's standard violation shape.

All columnar: the binary html decodes once, the comparison is a string
equality inside codegen, and output is violation-proportional.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def extract_text(html_col: Column) -> Column:
    """Extract body text from the (synthetic) html payload.

    Deterministic inverse of the pages generator's wrapping; returns
    null for empty/undecodable payloads.  Swap this function for a real
    boilerplate-removal UDF in production — the verification operator
    below is extractor-agnostic."""
    s = html_col.cast("string")
    body = F.regexp_replace(s, r"(?s)^<html><body>(.*)</body></html>$", "$1")
    return F.when(
        html_col.isNull() | (F.length(html_col) == 0), F.lit(None).cast("string")
    ).otherwise(body)


def with_extracted_text(df: DataFrame, html_col: str = "html") -> DataFrame:
    return df.withColumn("extracted_text", extract_text(F.col(html_col)))


def extraction_violations(
    df: DataFrame,
    id_cols: list[str],
    html_col: str = "html",
    text_col: str = "text",
    constraint_id: str = "#/x-table-checks/text_extraction",
) -> DataFrame:
    """Rows where stored text ≠ re-extracted text, byte-for-byte.

    Null semantics: both null ⇒ consistent; exactly one null or any
    byte difference ⇒ violation."""
    extracted = extract_text(F.col(html_col))
    stored = F.col(text_col)
    consistent = (stored.isNull() & extracted.isNull()) | (
        stored.isNotNull() & extracted.isNotNull() & (stored == extracted)
    )
    bad = df.filter(~F.coalesce(consistent, F.lit(False)))
    return bad.select(
        *id_cols,
        F.lit(constraint_id).alias("constraint_id"),
        F.lit(f"/{text_col}").alias("instance_path"),
        F.concat(
            F.lit("stored="),
            F.coalesce(F.substring(stored, 1, 40), F.lit("∅")),
            F.lit(" extracted="),
            F.coalesce(F.substring(extracted, 1, 40), F.lit("∅")),
        ).alias("observed_value"),
    )


def extraction_report(
    df: DataFrame, html_col: str = "html", text_col: str = "text"
) -> DataFrame:
    """Aggregate consistency stats: one row, one pass."""
    extracted = extract_text(F.col(html_col))
    stored = F.col(text_col)
    match = stored.isNotNull() & extracted.isNotNull() & (stored == extracted)
    both_null = stored.isNull() & extracted.isNull()
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(match.cast("long")).alias("n_byte_identical"),
        F.sum(both_null.cast("long")).alias("n_both_missing"),
        F.sum((~F.coalesce(match | both_null, F.lit(False))).cast("long")).alias(
            "n_mismatched"
        ),
    )


def robots_noindex(html_col: Column) -> Column:
    """True when the page opts out of indexing via
    ``<meta name="robots" ... content="...noindex...">`` (either
    attribute order, any quoting, case-insensitive) or the
    ``googlebot`` variant — the crawl-pipeline courtesy filter
    (RefinedWeb/CCNet honor it before any content heuristic).  Pure
    JVM regexp over the decoded payload; null html → false (a missing
    page cannot opt out)."""
    s = F.lower(html_col.cast("string"))
    # per-TAG matching: extract each <meta ...> tag, then require the
    # name and content attributes independently WITHIN one tag — no
    # attribute-order assumption, and a robots meta in one tag can
    # never combine with a noindex in another.  The name value is
    # matched exactly (quoted, or bare terminated by space/'>'/'/'),
    # so name="googlebot-news" (a News-only opt-out) does not trip the
    # filter.  Limitation, documented: this is a regex-level filter —
    # the literal text name=robots content=noindex INSIDE another
    # attribute's quoted value still matches; full immunity needs an
    # HTML attribute parser.
    # (?<![\w-]) anchors the attribute NAME to a boundary so
    # data-name= / itemname= never satisfy the robots match
    name_pat = (
        r"(?<![\w-])name\s*=\s*(\"(robots|googlebot)\"|'(robots|googlebot)'"
        r"|(robots|googlebot)(?=[\s/>]))"
    )
    content_pat = (
        r"(?<![\w-])content\s*=\s*(\"[^\"]*noindex|'[^']*noindex"
        r"|[^\s>\"']*noindex)"
    )
    tags = F.regexp_extract_all(s, F.lit(r"<meta[^>]*>"), 0)
    hit = F.exists(tags, lambda t: t.rlike(name_pat) & t.rlike(content_pat))
    return F.coalesce(hit, F.lit(False))


def noindex_filter(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Drop pages that opt out of indexing; the cheapest respectful
    pre-filter, run before text heuristics ever read the body."""
    return df.filter(~robots_noindex(F.col(html_col)))


def extract_links(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """The crawl link graph's edge extractor: one row per ``href``
    found in the page — ``(src_url, link)`` — via
    ``regexp_extract_all`` + ``posexplode`` (pure JVM, no UDF).
    Matches quoted hrefs in ``<a>`` and ``<link>`` tags (tag name
    bounded by whitespace, so ``<article data-href=…>`` is not an
    anchor; the closing quote must equal the opening quote, so a URL
    containing the other quote char survives intact); relative links
    are kept as-is (resolution against the base url is a downstream
    join concern); pages with no links or null html contribute no
    rows."""
    s = F.col(html_col).cast("string")
    hrefs = F.regexp_extract_all(
        s,
        F.lit(r"<(?:a|link)\s[^>]*?(?<![\w-])href\s*=\s*([\"'])([^>]*?)\1"),
        2,
    )
    return df.select(
        F.col(url_col).alias("src_url"),
        F.posexplode(hrefs).alias("link_pos", "link"),
    )
