"""Multimodal (image/audio/video) column plumbing.

Opaque ``binary`` payload columns + typed metadata, processed through
``mapInPandas`` in Arrow batches — the shape a real decode/feature
pipeline takes on Spark.  Container-header parsing (format, width,
height for JPEG/PNG/GIF/WebP) is REAL — pure struct parsing, no codec
libraries needed.  Full pixel decode / frame extraction would need
PIL/ffmpeg (not in this container): the frame SAMPLER below keeps the
real Spark shape (1→N binary expansion in mapInPandas) with a
clearly-marked byte-slice stand-in for the codec call.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
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

#: JPEG start-of-frame markers that carry dimensions (SOF0-15 minus
#: DHT 0xC4 / JPG 0xC8 / DAC 0xCC)
_JPEG_SOF = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}
#: standalone markers with no length field (RSTn, SOI, EOI, TEM)
_JPEG_STANDALONE = set(range(0xD0, 0xDA)) | {0x01}


def parse_image_header(payload: bytes) -> tuple[str, int, int]:
    """(format, width, height) from real container headers.

    Pure struct parsing — PNG IHDR, GIF logical screen descriptor,
    JPEG SOF segment scan, WebP VP8/VP8L/VP8X chunks.  Raises
    ``ValueError`` on anything unrecognized or truncated (the caller
    turns that into an error row, never a task failure)."""
    if not payload:
        raise ValueError("empty payload")
    # PNG: 8-byte signature, then IHDR chunk: len(4) 'IHDR' w(4BE) h(4BE)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        if len(payload) < 24 or payload[12:16] != b"IHDR":
            raise ValueError("truncated PNG")
        w, h = struct.unpack(">II", payload[16:24])
        return "png", w, h
    # GIF: 'GIF87a'/'GIF89a' then logical screen w(2LE) h(2LE)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        if len(payload) < 10:
            raise ValueError("truncated GIF")
        w, h = struct.unpack("<HH", payload[6:10])
        return "gif", w, h
    # JPEG: scan marker segments for a SOF
    if payload[:2] == b"\xff\xd8":
        i = 2
        n = len(payload)
        while i + 1 < n:
            if payload[i] != 0xFF:
                raise ValueError("bad JPEG marker stream")
            while i < n and payload[i] == 0xFF:
                i += 1  # fill bytes
            if i >= n:
                break
            marker = payload[i]
            i += 1
            if marker in _JPEG_STANDALONE:
                continue
            if i + 2 > n:
                break
            (seg_len,) = struct.unpack(">H", payload[i : i + 2])
            if marker in _JPEG_SOF:
                # segment: len(2) precision(1) height(2BE) width(2BE)
                if i + 7 > n:
                    raise ValueError("truncated JPEG SOF")
                h, w = struct.unpack(">HH", payload[i + 3 : i + 7])
                return "jpeg", w, h
            i += seg_len
        raise ValueError("no JPEG SOF segment")
    # WebP: RIFF container
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        chunk = payload[12:16]
        if chunk == b"VP8 " and len(payload) >= 30:
            # lossy: sync 9D 01 2A then 14-bit w/h little-endian
            if payload[23:26] != b"\x9d\x01\x2a":
                raise ValueError("bad VP8 sync code")
            w = struct.unpack("<H", payload[26:28])[0] & 0x3FFF
            h = struct.unpack("<H", payload[28:30])[0] & 0x3FFF
            return "webp", w, h
        if chunk == b"VP8L" and len(payload) >= 25:
            if payload[20] != 0x2F:
                raise ValueError("bad VP8L signature")
            bits = struct.unpack("<I", payload[21:25])[0]
            return "webp", (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1
        if chunk == b"VP8X" and len(payload) >= 30:
            w = int.from_bytes(payload[24:27], "little") + 1
            h = int.from_bytes(payload[27:30], "little") + 1
            return "webp", w, h
        raise ValueError("unknown WebP chunk")
    raise ValueError("unrecognized image container")


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
                        raise ValueError("empty payload in strict mode")
                    fmts.append(None)
                    ws.append(None)
                    hs.append(None)
                    shas.append(None)
                    continue
                payload = bytes(b)
                try:
                    fmt, w, h = parse_image_header(payload)
                    fmts.append(fmt)
                    ws.append(w)
                    hs.append(h)
                except ValueError:
                    if strict:
                        raise
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


MEDIA_META_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("n_bytes", LongType()),
        StructField("format", StringType()),
        StructField("duration_ms", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sha256", StringType()),
    ]
)

#: MPEG-1 Layer III bitrate (kbps) and sample-rate tables, header index
_MP3_BITRATES = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_MP3_RATES = [44100, 48000, 32000]


def parse_media_header(payload: bytes) -> tuple[str, int | None, int | None, int | None, int | None, int | None]:
    """(format, duration_ms, sample_rate, n_channels, width, height)
    from real audio/video container headers — pure struct parsing, no
    codec libraries (same approach as ``parse_image_header``):

    - WAV: RIFF/WAVE fmt chunk (channels, rate, byte-rate) + data size
      → exact duration.
    - FLAC: STREAMINFO block → rate, channels, total samples → exact
      duration.
    - MP4/ISO-BMFF: box walk to moov/mvhd (timescale+duration) and the
      first trak/tkhd (16.16 fixed-point presentation width/height).
    - MP3: optional ID3v2 skip, first frame header → rate/channels and
      a CBR duration ESTIMATE from the frame bitrate (VBR needs a full
      frame scan — documented approximation).

    Raises ``ValueError`` on unrecognized/truncated payloads; callers
    emit error rows, never task failures."""
    if not payload:
        raise ValueError("empty payload")
    # ---- WAV ----
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        i, n = 12, len(payload)
        rate = channels = byte_rate = data_size = None
        while i + 8 <= n:
            cid = payload[i : i + 4]
            (sz,) = struct.unpack("<I", payload[i + 4 : i + 8])
            if cid == b"fmt " and i + 24 <= n:
                channels, rate, byte_rate = struct.unpack(
                    "<HII", payload[i + 10 : i + 20]
                )
            elif cid == b"data":
                data_size = sz
            i += 8 + sz + (sz & 1)  # chunks are word-aligned
        if rate is None:
            raise ValueError("WAV without fmt chunk")
        dur = (
            int(data_size * 1000 / byte_rate)
            if data_size is not None and byte_rate
            else None
        )
        return "wav", dur, rate, channels, None, None
    # ---- FLAC ----
    if payload[:4] == b"fLaC":
        # first metadata block must be STREAMINFO (34 bytes)
        if len(payload) < 42 or (payload[4] & 0x7F) != 0:
            raise ValueError("FLAC without STREAMINFO")
        si = payload[8:42]
        bits = int.from_bytes(si[10:18], "big")
        rate = (bits >> 44) & 0xFFFFF
        channels = ((bits >> 41) & 0x7) + 1
        total_samples = bits & ((1 << 36) - 1)
        dur = int(total_samples * 1000 / rate) if rate and total_samples else None
        return "flac", dur, rate, channels, None, None
    # ---- MP4 / ISO base media ----
    if len(payload) >= 12 and payload[4:8] == b"ftyp":

        def boxes(buf: bytes, start: int, end: int):
            i = start
            while i + 8 <= end:
                (sz,) = struct.unpack(">I", buf[i : i + 4])
                typ = buf[i + 4 : i + 8]
                hdr = 8
                if sz == 1 and i + 16 <= end:  # 64-bit largesize
                    (sz,) = struct.unpack(">Q", buf[i + 8 : i + 16])
                    hdr = 16
                if sz < hdr:
                    return
                yield typ, i + hdr, min(i + sz, end)
                i += sz

        dur_ms = width = height = None
        for typ, b0, b1 in boxes(payload, 0, len(payload)):
            if typ != b"moov":
                continue
            for t2, c0, c1 in boxes(payload, b0, b1):
                if t2 == b"mvhd" and c1 - c0 >= 20:
                    ver = payload[c0]
                    if ver == 1 and c1 - c0 >= 28:
                        (ts,) = struct.unpack(">I", payload[c0 + 20 : c0 + 24])
                        (d,) = struct.unpack(">Q", payload[c0 + 24 : c0 + 32])
                    else:
                        ts, d = struct.unpack(">II", payload[c0 + 12 : c0 + 20])
                    if ts:
                        dur_ms = int(d * 1000 / ts)
                elif t2 == b"trak" and width is None:
                    for t3, d0, d1 in boxes(payload, c0, c1):
                        if t3 == b"tkhd" and d1 - d0 >= 84:
                            ver = payload[d0]
                            off = d0 + (96 if ver == 1 else 84) - 8
                            if off + 8 <= d1:
                                w_fx, h_fx = struct.unpack(
                                    ">II", payload[off : off + 8]
                                )
                                if w_fx and h_fx:
                                    width, height = w_fx >> 16, h_fx >> 16
        if dur_ms is None and width is None:
            raise ValueError("MP4 without moov/mvhd")
        return "mp4", dur_ms, None, None, width, height
    # ---- MP3 ----
    i = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        # syncsafe 28-bit tag size
        i = 10 + (
            (payload[6] << 21) | (payload[7] << 14) | (payload[8] << 7) | payload[9]
        )
    if i + 4 <= len(payload) and payload[i] == 0xFF and (payload[i + 1] & 0xE0) == 0xE0:
        hdr = payload[i : i + 4]
        if (hdr[1] & 0x18) == 0x18 and (hdr[1] & 0x06) == 0x02:  # MPEG-1 Layer III
            br_idx = hdr[2] >> 4
            sr_idx = (hdr[2] >> 2) & 0x3
            if 0 < br_idx < 15 and sr_idx < 3:
                bitrate = _MP3_BITRATES[br_idx] * 1000
                rate = _MP3_RATES[sr_idx]
                channels = 1 if (hdr[3] >> 6) == 3 else 2
                # CBR estimate over the AUDIO bytes only — the skipped
                # ID3v2 tag (which can carry megabytes of album art)
                # must not count as playing time
                dur = int((len(payload) - i) * 8 * 1000 / bitrate)
                return "mp3", dur, rate, channels, None, None
        raise ValueError("unsupported MP3 frame header")
    raise ValueError("unrecognized media container")


def extract_media_metadata(
    df: DataFrame, url_col: str = "url", payload_col: str = "html", strict: bool = False
) -> DataFrame:
    """Audio/video twin of ``extract_image_metadata``: Arrow-batched
    ``mapInPandas`` (no shuffle, constant memory per task), real header
    parsing, error-row pattern for invalid payloads."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {f.name: [] for f in MEDIA_META_SCHEMA.fields}
            for u, b in zip(pdf[url_col], pdf[payload_col]):
                payload = bytes(b) if b is not None else b""
                meta: tuple = (None,) * 6
                sha = hashlib.sha256(payload).hexdigest() if payload else None
                try:
                    meta = parse_media_header(payload)
                except ValueError:
                    if strict:
                        raise
                rows["url"].append(u)
                rows["n_bytes"].append(len(payload))
                for name, v in zip(
                    ("format", "duration_ms", "sample_rate", "n_channels", "width", "height"),
                    meta,
                ):
                    rows[name].append(v)
                rows["sha256"].append(sha)
            yield pd.DataFrame(rows)

    return df.select(url_col, payload_col).mapInPandas(process, MEDIA_META_SCHEMA)


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


def byte_histogram_embedding(
    df: DataFrame,
    payload_col: str,
    id_col: str = "url",
    n_bins: int = 64,
    log_scale: bool = True,
) -> DataFrame:
    """Content embedding for OPAQUE binary payloads — no decode needed:
    the L2-normalized (log-scaled) byte-value histogram, folded from
    256 values to ``n_bins``.  Near-identical binaries (same image
    re-saved, recompressed variants of one asset, watermarked copies)
    land close in cosine space, so this plugs straight into the
    oracle-checked embedding ops (`similarity.cosine_near_duplicates`,
    ANN top-k) — multimodal near-dup WITHOUT an image decoder in the
    hot path.  One mapInPandas pass, numpy `bincount` per payload.

    Emits ``(id, n_bytes, embedding array<float>)``; null/empty
    payloads are dropped (nothing to embed)."""
    if not 1 <= n_bins <= 256 or 256 % n_bins:
        raise ValueError(f"n_bins must divide 256, got {n_bins}")
    fold = 256 // n_bins
    schema = f"{id_col} string, n_bytes long, embedding array<float>"

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sizes, embs = [], [], []
            for u, b in zip(pdf[id_col], pdf[payload_col]):
                if b is None or len(b) == 0:
                    continue
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                hist = np.bincount(arr, minlength=256).reshape(n_bins, fold)
                v = hist.sum(axis=1).astype(np.float64)
                if log_scale:
                    v = np.log1p(v)
                norm = float(np.linalg.norm(v))
                if norm == 0.0:
                    continue
                ids.append(u)
                sizes.append(int(arr.size))
                embs.append((v / norm).astype(np.float32).tolist())
            if ids:  # empty frames mis-infer the list column dtype
                yield pd.DataFrame(
                    {id_col: ids, "n_bytes": sizes, "embedding": embs}
                )

    return df.select(id_col, payload_col).mapInPandas(process, schema)


def decode_image_stub(
    df: DataFrame,
    payload_col: str,
    url_col: str = "url",
    grid: int = 8,
) -> DataFrame:
    """STUB pixel decode with the REAL pipeline shape: header-parsed
    dimensions plus a ``grid×grid`` float "thumbnail" per image —
    deterministic byte-window means standing in for decoded pixels
    (PIL/ffmpeg are not in this container; swap ``_fake_pixels`` for
    ``PIL.Image.open(io.BytesIO(payload)).resize(...)`` in
    production, the schema/batching/partitioning stay identical).
    Emits ``(url, format, width, height, thumb array<float>)``;
    non-image or truncated payloads are dropped, matching what a real
    decoder's error path would filter."""
    schema = (
        f"{url_col} string, format string, width int, height int, "
        "thumb array<float>"
    )
    cells = grid * grid

    def _fake_pixels(payload: bytes) -> list[float]:
        arr = np.frombuffer(payload, dtype=np.uint8)
        pad = (-arr.size) % cells
        if pad:
            arr = np.pad(arr, (0, pad))
        return (
            (arr.reshape(cells, -1).mean(axis=1) / 255.0)
            .astype(np.float32)
            .tolist()
        )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {url_col: [], "format": [], "width": [], "height": [],
                    "thumb": []}
            for u, b in zip(pdf[url_col], pdf[payload_col]):
                if b is None or len(b) == 0:
                    continue
                try:
                    fmt, w, h = parse_image_header(bytes(b))
                except ValueError:
                    continue
                rows[url_col].append(u)
                rows["format"].append(fmt)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["thumb"].append(_fake_pixels(bytes(b)))
            if rows[url_col]:
                yield pd.DataFrame(rows)

    return df.select(url_col, payload_col).mapInPandas(process, schema)
