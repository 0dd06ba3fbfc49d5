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
