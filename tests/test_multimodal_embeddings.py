"""Binary content embeddings + decode-stub plumbing."""

from __future__ import annotations

import struct
import zlib

import pytest

from pyspark.sql import functions as F

from snowy_json_spark.operators.multimodal import (
    byte_histogram_embedding,
    decode_image_stub,
)
from snowy_json_spark.operators.similarity import cosine_near_duplicates


def _png(w: int, h: int, extra: bytes = b"") -> bytes:
    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
    chunk += struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    return b"\x89PNG\r\n\x1a\n" + chunk + extra


def _payloads(spark):
    base = bytes(range(256)) * 40
    rows = [
        ("u1", base),
        ("u2", base[:-17] + b"X" * 17),      # near-identical to u1
        ("u3", bytes([7, 9]) * 5000),         # very different histogram
        ("u4", None),
        ("u5", b""),
    ]
    return spark.createDataFrame(rows, "url string, payload binary")


def test_byte_histogram_embedding_shape_and_norm(spark):
    df = _payloads(spark)
    out = {r["url"]: r for r in
           byte_histogram_embedding(df, "payload", "url", n_bins=64).collect()}
    # null/empty payloads dropped
    assert set(out) == {"u1", "u2", "u3"}
    for r in out.values():
        assert len(r["embedding"]) == 64
        assert abs(sum(x * x for x in r["embedding"]) - 1.0) < 1e-5
    assert out["u1"]["n_bytes"] == 256 * 40

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))

    assert cos(out["u1"]["embedding"], out["u2"]["embedding"]) > 0.999
    assert cos(out["u1"]["embedding"], out["u3"]["embedding"]) < 0.5


def test_histogram_embeddings_feed_cosine_near_dup(spark):
    df = _payloads(spark)
    emb = byte_histogram_embedding(df, "payload", "url", n_bins=64)
    pairs = cosine_near_duplicates(
        emb, "url", "embedding", threshold=0.99, dim=64
    ).collect()
    got = {tuple(sorted((r[0], r[1]))) for r in pairs}
    assert ("u1", "u2") in got
    assert all(p == ("u1", "u2") for p in got)


def test_embedding_params_validated(spark):
    df = _payloads(spark)
    with pytest.raises(ValueError):
        byte_histogram_embedding(df, "payload", "url", n_bins=48)


def test_decode_stub_dims_and_thumb(spark):
    rows = [
        ("a", _png(640, 480, b"\x00" * 500)),
        ("b", b"not an image at all"),
        ("c", None),
    ]
    df = spark.createDataFrame(rows, "url string, payload binary")
    got = decode_image_stub(df, "payload", grid=8).collect()
    # non-image and null payloads follow the decoder error path (dropped)
    assert [r["url"] for r in got] == ["a"]
    r = got[0]
    assert (r["format"], r["width"], r["height"]) == ("png", 640, 480)
    assert len(r["thumb"]) == 64
    assert all(0.0 <= x <= 1.0 for x in r["thumb"])
    # deterministic across re-evaluation
    again = decode_image_stub(df, "payload", grid=8).collect()[0]
    assert again["thumb"] == r["thumb"]
