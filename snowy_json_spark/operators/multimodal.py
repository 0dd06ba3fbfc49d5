"""Multimodal (image/audio/video) column plumbing.

Opaque ``binary`` payload columns + typed metadata, processed through
``mapInPandas`` in Arrow batches — the shape a real decode/feature
pipeline takes on Spark.  The codec layer itself is **stubbed**: the
image/audio libraries are not in this container, so the decode step is
a clearly-marked deterministic fake (or raises ``NotImplementedError``
in strict mode).  Everything Spark-side — schemas, batch iteration,
partition-preserving mapInPandas, metadata extraction — is real and
tested; swapping the fake for PIL/ffmpeg is a one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("n_bytes", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sha256", StringType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[str, int, int]:
    """STUB: deterministic fake decoder.

    A real implementation would be ``PIL.Image.open(io.BytesIO(b))``;
    this derives (format, width, height) from the payload hash so the
    pipeline shape (including failure on empty payloads) is testable
    without codec libraries."""
    if not payload:
        raise ValueError("empty payload")
    h = hashlib.sha256(payload).digest()
    fmt = ["jpeg", "png", "webp"][h[0] % 3]
    width = 160 + (h[1] % 64) * 16
    height = 120 + (h[2] % 48) * 16
    return fmt, width, height


def extract_image_metadata(
    df: DataFrame, url_col: str = "url", payload_col: str = "html", strict: bool = False
) -> DataFrame:
    """Arrow-batched metadata extraction over binary payloads.

    ``mapInPandas`` keeps partitioning (no shuffle) and streams Arrow
    record batches — constant memory per task regardless of payload
    sizes.  Invalid payloads become rows with null dimensions rather
    than task failures (error-row pattern, not fail-the-job)."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "url": pdf[url_col],
                "n_bytes": pdf[payload_col].map(lambda b: 0 if b is None else len(b)),
                "format": [],
                "width": [],
                "height": [],
                "sha256": [],
            }
            fmts, ws, hs, shas = [], [], [], []
            for b in pdf[payload_col]:
                if b is None or len(b) == 0:
                    if strict:
                        raise NotImplementedError(
                            "real decoder unavailable in this environment"
                        )
                    fmts.append(None)
                    ws.append(None)
                    hs.append(None)
                    shas.append(None)
                    continue
                payload = bytes(b)
                try:
                    fmt, w, h = _fake_decode(payload)
                    fmts.append(fmt)
                    ws.append(w)
                    hs.append(h)
                except ValueError:
                    fmts.append(None)
                    ws.append(None)
                    hs.append(None)
                shas.append(hashlib.sha256(payload).hexdigest())
            out["format"], out["width"], out["height"], out["sha256"] = (
                fmts,
                ws,
                hs,
                shas,
            )
            yield pd.DataFrame(out)

    return df.select(url_col, payload_col).mapInPandas(process, IMAGE_META_SCHEMA)


FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("frame_index", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    url_col: str = "url",
    payload_col: str = "html",
    every_n: int = 4,
    max_frames: int = 8,
) -> DataFrame:
    """STUB frame sampler: real pipeline shape (binary in → multiple
    binary frames out, 1→N row expansion inside mapInPandas).

    The 'frames' are deterministic byte slices standing in for decoded
    video frames; swap the slicer for an ffmpeg call in production."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, idxs, frames = [], [], []
            for u, b in zip(pdf[url_col], pdf[payload_col]):
                if b is None or len(b) == 0:
                    continue
                payload = bytes(b)
                chunk = max(len(payload) // (max_frames * every_n), 1)
                for i in range(0, min(max_frames, len(payload) // chunk or 1)):
                    urls.append(u)
                    idxs.append(i * every_n)
                    frames.append(payload[i * chunk : (i + 1) * chunk])
            yield pd.DataFrame({"url": urls, "frame_index": idxs, "frame": frames})

    return df.select(url_col, payload_col).mapInPandas(process, FRAME_SAMPLE_SCHEMA)


def payload_stats(df: DataFrame, payload_col: str = "html") -> DataFrame:
    """Pure-Column binary stats (no UDF): sizes and empty rate."""
    c = F.col(payload_col)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.avg(F.length(c)).alias("avg_bytes"),
        F.max(F.length(c)).alias("max_bytes"),
        F.avg((F.length(c) == 0).cast("double")).alias("empty_rate"),
    )
