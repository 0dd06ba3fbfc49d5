"""WARC source: writer↔parser round-trip, gzip members, corruption."""

from __future__ import annotations

import gzip

import pytest

from snowy_json_spark.sources.warc import (
    build_warc,
    parse_warc,
    parse_warc_blob,
    read_warc,
)


def _recs():
    return [
        {"rec_type": "warcinfo", "payload": b"software: test\r\n",
         "content_type": "application/warc-fields"},
        {"rec_type": "response", "url": "https://a.example.com/x",
         "warc_ts": "2026-01-02T03:04:05Z", "payload": "<html>héllo</html>"},
        {"rec_type": "response", "url": "https://b.example.com/y",
         "warc_ts": "2026-01-02T03:04:06Z", "payload": b""},
        {"rec_type": "request", "url": "https://a.example.com/x",
         "payload": b"GET /x HTTP/1.1\r\n"},
    ]


def test_roundtrip_plain():
    blob = build_warc(_recs())
    got = list(parse_warc_blob(blob, "f.warc"))
    assert [r["rec_type"] for r in got] == [
        "warcinfo", "response", "response", "request"]
    r = got[1]
    assert r["url"] == "https://a.example.com/x"
    assert r["warc_ts"] == "2026-01-02T03:04:05Z"
    assert r["http_status"] == 200
    assert r["payload"] == "<html>héllo</html>".encode("utf-8")
    # empty body survives framing
    assert got[2]["payload"] == b"" and got[2]["http_status"] == 200
    # non-response payloads pass through without HTTP envelope stripping
    assert got[3]["payload"] == b"GET /x HTTP/1.1\r\n"
    assert got[3]["http_status"] is None
    # offsets are monotonically increasing record starts
    offs = [r["record_offset"] for r in got]
    assert offs == sorted(offs) and offs[0] == 0


def test_roundtrip_gzip_members():
    blob = build_warc(_recs(), compress=True)
    assert blob[:2] == b"\x1f\x8b"
    got = list(parse_warc_blob(blob, "f.warc.gz"))
    assert len(got) == 4
    assert got[1]["payload"] == "<html>héllo</html>".encode("utf-8")
    # single-shot gzip.decompress sees the same records (multi-member)
    assert len(list(parse_warc(gzip.decompress(blob)))) == 4


def test_truncated_and_corrupt_records_raise():
    blob = build_warc(_recs())
    with pytest.raises(ValueError, match="truncated|terminator"):
        list(parse_warc(blob[:-6]))
    with pytest.raises(ValueError, match="magic"):
        list(parse_warc(b"NOTWARC" + blob))
    bad = blob.replace(b"Content-Length: ", b"Content-Spleen: ", 1)
    with pytest.raises(ValueError, match="Content-Length"):
        list(parse_warc(bad))


def test_read_warc_dataframe(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(build_warc(_recs()))
    (tmp_path / "b.warc.gz").write_bytes(build_warc(_recs()[1:3], compress=True))
    df = read_warc(spark, str(tmp_path) + "/*.warc*")
    rows = df.collect()
    assert len(rows) == 6
    by_file = {}
    for r in rows:
        by_file.setdefault(r["warc_file"].rsplit("/", 1)[-1], []).append(r)
    assert len(by_file["a.warc"]) == 4
    assert len(by_file["b.warc.gz"]) == 2
    resp = [r for r in by_file["b.warc.gz"] if r["url"] == "https://a.example.com/x"]
    assert resp[0]["payload"] == "<html>héllo</html>".encode("utf-8")
    assert resp[0]["http_status"] == 200
