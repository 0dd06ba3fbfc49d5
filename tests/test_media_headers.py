"""Audio/video header parsing (WAV/FLAC/MP4/MP3) — synthetic container
bytes built field-by-field with struct, checked through both the pure
parser and the mapInPandas extraction operator."""

from __future__ import annotations

import struct

import pytest

from snowy_json_spark.operators.multimodal import (
    extract_media_metadata,
    parse_media_header,
)


def wav_bytes(rate=16000, channels=1, seconds=2, bits=16) -> bytes:
    byte_rate = rate * channels * bits // 8
    data = b"\x00" * (byte_rate * seconds)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, byte_rate, channels * bits // 8, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def flac_bytes(rate=44100, channels=2, total_samples=88200) -> bytes:
    bits = (rate << 44) | ((channels - 1) << 41) | (15 << 36) | total_samples
    si = struct.pack(">HH", 4096, 4096) + b"\x00" * 6 + bits.to_bytes(8, "big") + b"\x00" * 16
    return b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + si


def mp4_bytes(timescale=1000, duration=7500, width=640, height=360) -> bytes:
    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload) + 8) + typ + payload

    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00"  # version 0 + flags
        + struct.pack(">II", 0, 0)  # creation, modification
        + struct.pack(">II", timescale, duration)
        + b"\x00" * 80,
    )
    tkhd = box(
        b"tkhd",
        b"\x00\x00\x00\x07"
        + struct.pack(">IIII", 0, 0, 1, 0)  # creation mod track_id reserved
        + struct.pack(">I", duration)
        + b"\x00" * 52  # reserved+layer+group+volume+matrix
        + struct.pack(">II", width << 16, height << 16),
    )
    return ftyp + box(b"moov", mvhd + box(b"trak", tkhd))


def mp3_bytes(n_frames_worth=100) -> bytes:
    # MPEG-1 Layer III, 128 kbps (idx 9), 44100 Hz (idx 0), stereo
    hdr = bytes([0xFF, 0xFB, 0x90, 0x00])
    return hdr + b"\x00" * (417 * n_frames_worth)


def test_wav_exact_duration():
    fmt, dur, rate, ch, w, h = parse_media_header(wav_bytes(seconds=2))
    assert (fmt, dur, rate, ch, w, h) == ("wav", 2000, 16000, 1, None, None)


def test_flac_streaminfo():
    fmt, dur, rate, ch, w, h = parse_media_header(flac_bytes())
    assert (fmt, rate, ch) == ("flac", 44100, 2)
    assert dur == 2000  # 88200 samples at 44.1 kHz


def test_mp4_mvhd_tkhd():
    fmt, dur, rate, ch, w, h = parse_media_header(mp4_bytes())
    assert (fmt, dur, w, h) == ("mp4", 7500, 640, 360)
    assert rate is None and ch is None


def test_mp3_first_frame_cbr_estimate():
    b = mp3_bytes()
    fmt, dur, rate, ch, w, h = parse_media_header(b)
    assert (fmt, rate, ch) == ("mp3", 44100, 2)
    assert dur == pytest.approx(len(b) * 8 * 1000 / 128_000, abs=1)


def test_mp3_id3v2_skip():
    tag = b"ID3" + bytes([4, 0, 0, 0, 0, 0, 10]) + b"\x00" * 10
    fmt, dur, rate, ch, _, _ = parse_media_header(tag + mp3_bytes(10))
    assert fmt == "mp3" and rate == 44100


def test_garbage_raises():
    with pytest.raises(ValueError):
        parse_media_header(b"\x00\x01\x02\x03 not a container")
    with pytest.raises(ValueError):
        parse_media_header(b"")


def test_extract_media_metadata_operator(spark):
    rows = [
        ("u1", wav_bytes(seconds=1)),
        ("u2", mp4_bytes(duration=3000, timescale=1000)),
        ("u3", b"garbage"),  # → error row, not a task failure
        ("u4", None),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {
        r["url"]: r.asDict()
        for r in extract_media_metadata(df).collect()
    }
    assert got["u1"]["format"] == "wav" and got["u1"]["duration_ms"] == 1000
    assert got["u2"]["format"] == "mp4" and got["u2"]["width"] == 640
    assert got["u3"]["format"] is None and got["u3"]["n_bytes"] == 7
    assert got["u3"]["sha256"] is not None  # hash still recorded
    assert got["u4"]["format"] is None and got["u4"]["sha256"] is None


def test_mp3_duration_excludes_id3_tag():
    """A large ID3v2 tag (album art) must not count as playing time."""
    audio = mp3_bytes(50)
    tag_body = b"\x00" * 5000
    size = len(tag_body)
    syncsafe = bytes(
        [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
    )
    tagged = b"ID3" + bytes([4, 0, 0]) + syncsafe + tag_body + audio
    _, dur_plain, *_ = parse_media_header(audio)
    _, dur_tagged, *_ = parse_media_header(tagged)
    assert dur_tagged == pytest.approx(dur_plain, abs=2)
