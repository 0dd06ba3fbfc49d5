"""WARC source: read Common-Crawl-style WARC files into a DataFrame.

Reference scope analog: Snow reads instances from files/streams before
validating (``Main.java`` walks files; this engine's north-star input
is a Common-Crawl-style corpus, which ships as WARC).  A WARC/1.0 file
is a sequence of records, each ``WARC/1.0\\r\\n`` + header lines +
``\\r\\n\\r\\n`` + ``Content-Length`` octets of payload + ``\\r\\n\\r\\n``;
Common Crawl serves each record as its own gzip member concatenated
into a ``.warc.gz`` stream (multi-member gzip), so members can be
decompressed independently.

Spark-first shape: ``spark.read.format("binaryFile")`` lists and
splits *by file* — exactly how Common Crawl is consumed at scale (a
crawl is ~64k WARC files of ~1 GB; file count, not file size, is the
parallelism unit) — and a ``mapInPandas`` parser turns each blob into
record rows.  Parsing is pure per-file work: no shuffle at all until
the caller aggregates.  Response records' HTTP bodies are split from
their status line + headers JVM-free inside the same pass.

For payloads beyond memory-per-task, point ``binaryFile`` at the
(smaller) WAT/WET sidecars or raise executor memory; the parser
itself streams member-by-member and never materializes more than one
record's payload plus the compressed blob.
"""

from __future__ import annotations

import gzip
import io
import zlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

#: Output schema of :func:`read_warc` / :func:`parse_warc`.
WARC_SCHEMA = (
    "warc_file string, record_offset long, rec_type string, url string, "
    "warc_ts string, content_type string, http_status int, payload binary"
)


def _gzip_members(blob: bytes) -> Iterator[bytes]:
    """Decompress a multi-member gzip stream member-by-member (the
    Common Crawl layout: one member per WARC record).  A plain
    ``gzip.decompress`` would also work but hides member boundaries;
    streaming keeps peak memory at one member."""
    pos = 0
    n = len(blob)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        out = d.decompress(blob[pos:])
        out += d.flush()
        yield out
        consumed = (n - pos) - len(d.unused_data)
        if consumed <= 0:  # corrupt trailing bytes: stop, don't spin
            raise ValueError(f"gzip stream stalled at offset {pos}")
        pos += consumed


def _parse_headers(raw: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in raw.split(b"\r\n"):
        if not line:
            continue
        k, sep, v = line.partition(b":")
        if sep:
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1", "replace"
            )
    return headers


def parse_warc(blob: bytes, warc_file: str = "") -> Iterator[dict]:
    """Parse one (already decompressed) WARC byte stream into record
    dicts matching :data:`WARC_SCHEMA`.  Raises ``ValueError`` on a
    malformed or truncated record — a validation engine must not
    silently drop corrupt input."""
    pos = 0
    n = len(blob)
    while pos < n:
        # tolerate inter-record padding newlines
        while pos < n and blob[pos : pos + 2] in (b"\r\n",):
            pos += 2
        if pos >= n:
            return
        start = pos
        if not blob.startswith(b"WARC/", pos):
            raise ValueError(f"{warc_file}: no WARC magic at offset {pos}")
        hdr_end = blob.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError(f"{warc_file}: unterminated header at {pos}")
        first_nl = blob.find(b"\r\n", pos)
        headers = _parse_headers(blob[first_nl + 2 : hdr_end])
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError(f"{warc_file}: bad Content-Length at {pos}") from None
        body_start = hdr_end + 4
        body_end = body_start + length
        if body_end + 4 > n:
            raise ValueError(f"{warc_file}: truncated record at {pos}")
        if blob[body_end : body_end + 4] != b"\r\n\r\n":
            raise ValueError(f"{warc_file}: missing record terminator at {pos}")
        payload = blob[body_start:body_end]
        rec_type = headers.get("warc-type", "")
        content_type = headers.get("content-type", "")
        status: int | None = None
        if rec_type == "response" and content_type.startswith(
            "application/http"
        ):
            # split the HTTP envelope: status line + headers, then body
            http_end = payload.find(b"\r\n\r\n")
            if http_end >= 0:
                status_line = payload.split(b"\r\n", 1)[0]
                parts = status_line.split(b" ")
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
                payload = payload[http_end + 4 :]
        yield {
            "warc_file": warc_file,
            "record_offset": start,
            "rec_type": rec_type,
            "url": headers.get("warc-target-uri"),
            "warc_ts": headers.get("warc-date"),
            "content_type": content_type,
            "http_status": status,
            "payload": payload,
        }
        pos = body_end + 4


def parse_warc_blob(blob: bytes, warc_file: str = "") -> Iterator[dict]:
    """Parse a WARC blob, transparently handling per-record gzip
    (``.warc.gz``) by magic-byte sniffing."""
    if blob[:2] == b"\x1f\x8b":
        for member in _gzip_members(blob):
            yield from parse_warc(member, warc_file)
    else:
        yield from parse_warc(blob, warc_file)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC files under ``path`` (glob ok; ``.warc`` or ``.warc.gz``)
    as a DataFrame of records, one task per file via ``binaryFile`` —
    the Common-Crawl consumption pattern where the ~64k files per
    crawl, not the bytes within one, carry the parallelism."""
    raw = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for path_, content in zip(b["path"], b["content"]):
                recs = list(parse_warc_blob(bytes(content), str(path_)))
                if recs:
                    yield pd.DataFrame(recs)

    return raw.select("path", "content").mapInPandas(parse, WARC_SCHEMA)


def build_warc(records: list[dict], compress: bool = False) -> bytes:
    """Serialize record dicts (keys: ``rec_type``, ``url``,
    ``warc_ts``, ``payload``; response records get an HTTP/1.1 200
    envelope) into WARC bytes — the writer half of the round-trip,
    used by tests and fixture generation."""
    out = io.BytesIO()
    for i, rec in enumerate(records):
        payload = rec.get("payload", b"")
        if isinstance(payload, str):
            payload = payload.encode("utf-8")
        rec_type = rec.get("rec_type", "response")
        if rec_type == "response":
            envelope = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
            )
            body = envelope + payload
            ctype = "application/http; msgtype=response"
        else:
            body = payload
            ctype = rec.get("content_type", "application/octet-stream")
        headers = [
            b"WARC/1.0",
            b"WARC-Type: " + rec_type.encode(),
            b"WARC-Record-ID: <urn:uuid:%08d>" % i,
            b"Content-Type: " + ctype.encode(),
            b"Content-Length: " + str(len(body)).encode(),
        ]
        if rec.get("url"):
            headers.append(b"WARC-Target-URI: " + rec["url"].encode())
        if rec.get("warc_ts"):
            headers.append(b"WARC-Date: " + rec["warc_ts"].encode())
        record = b"\r\n".join(headers) + b"\r\n\r\n" + body + b"\r\n\r\n"
        if compress:
            record = gzip.compress(record)
        out.write(record)
    return out.getvalue()
