"""Streaming exact dedup with bounded state.

The batch dedup suite (operators/dedup.py) needs global state; the
streaming variant bounds it with a watermark:
``dropDuplicatesWithinWatermark`` keeps each content hash in state only
until the watermark passes its event time — at web-crawl scale the
state store holds one hash per document seen in the watermark window,
not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import content_hash


def stream_exact_dedup(
    stream_df: DataFrame,
    ts_col: str,
    text_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Emit only the first occurrence of each normalized content hash
    within the watermark window."""
    hashed = stream_df.withColumn("_content_hash", content_hash(F.col(text_col)))
    return (
        hashed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_content_hash"])
        .drop("_content_hash")
    )


def stream_url_dedup(
    stream_df: DataFrame,
    ts_col: str,
    url_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """First occurrence per canonical URL within the watermark — the
    streaming companion of ``urls.canonical_duplicate_groups`` for
    crawl-ingest: trivially-different variants of the same page (case,
    default port, fragment, tracking params, query order) arriving
    inside the window collapse onto one canonical key, so state holds
    one entry per canonical url per window.  URLs that fail to parse
    dedupe on their raw string (``coalesce``), never on a shared null.
    The output schema is the input plus a ``canonical_url`` column (the
    dedup key — kept because downstream joins/uniqueness want it);
    ``.drop("canonical_url")`` restores the input schema."""
    from ..operators.urls import canonicalize_url

    keyed = stream_df.withColumn(
        "canonical_url",
        F.coalesce(canonicalize_url(F.col(url_col)), F.col(url_col)),
    )
    return keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["canonical_url"]
    )
