"""Property-based checks for the vectorized greedy fold and span
redaction — randomized inputs against naive Python references."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from snowy_json_spark.operators.packing import greedy_pack
from snowy_json_spark.operators.spans import redact_spans

CTX = 50

token_lists = st.lists(
    st.lists(st.integers(min_value=0, max_value=120), min_size=1, max_size=40),
    min_size=1,
    max_size=6,
)


def _ref_fold(toks, ctx):
    out, acc, cur = [], 0, 0
    for i, t in enumerate(toks):
        if i > 0 and acc + t > ctx:
            cur, acc = cur + 1, 0
        out.append((cur, acc, t > ctx))
        acc += t
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(shards=token_lists)
def test_greedy_pack_matches_fold_on_random_inputs(spark, shards):
    rows = []
    for s, toks in enumerate(shards):
        for i, t in enumerate(toks):
            rows.append((s, s * 1000 + i, t))
    df = spark.createDataFrame(rows, "shard int, doc_id long, n_tokens long")
    got = {
        (r["shard"], r["doc_id"]): (r["pack_id"], r["pack_off"], r["oversize"])
        for r in greedy_pack(df, "doc_id", "n_tokens", CTX,
                             shard_col="shard").collect()
    }
    for s, toks in enumerate(shards):
        for i, want in enumerate(_ref_fold(toks, CTX)):
            assert got[(s, s * 1000 + i)] == want, (s, i, toks)


span_lists = st.lists(
    st.tuples(st.integers(0, 30), st.integers(1, 12), st.sampled_from("abc")),
    min_size=0,
    max_size=6,
)


def _ref_redact(text, spans):
    """Independent reference: merge overlapping intervals (earliest
    start, then longest, donates the tag), replace right-to-left."""
    clipped = sorted(
        [(s, min(s + ln, len(text)), t) for s, ln, t in spans
         if s < min(s + ln, len(text))],
        key=lambda x: (x[0], -x[1]),
    )
    merged = []
    for start, end, tag in clipped:
        if merged and start < merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], end)
        else:
            merged.append([start, end, tag])
    out = text
    for start, end, tag in reversed(merged):
        out = out[:start] + f"<{tag.upper()}>" + out[end:]
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(text=st.text(alphabet="xyz w.", min_size=0, max_size=40),
       spans=span_lists)
def test_redact_spans_matches_reference(spark, text, spans):
    clipped = [
        {"start": s, "end": min(s + ln, len(text)), "tag": t}
        for s, ln, t in spans
        if s < len(text)
    ]
    pdf = pd.DataFrame({"doc_id": [1], "text": [text], "spans": [clipped]})
    df = spark.createDataFrame(
        pdf, "doc_id long, text string, "
             "spans array<struct<start:int,end:int,tag:string>>"
    )
    got = redact_spans(df, "text", out_col="clean").first()["clean"]
    assert got == _ref_redact(text, spans), (text, spans)


rec_strategy = st.lists(
    st.fixed_dictionaries({
        "rec_type": st.sampled_from(["response", "request", "warcinfo"]),
        "url": st.one_of(st.none(), st.text(
            alphabet="abc:/.-", min_size=1, max_size=30)),
        "warc_ts": st.one_of(st.none(),
                             st.just("2026-01-02T03:04:05Z")),
        "payload": st.binary(max_size=200),
    }),
    min_size=0,
    max_size=5,
)


@settings(max_examples=25, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(recs=rec_strategy, compress=st.booleans())
def test_warc_roundtrip_random_records(recs, compress):
    """Writer→parser round-trip holds for arbitrary payload bytes
    (including CRLF-laden payloads that could confuse framing), both
    plain and per-record-gzip."""
    from snowy_json_spark.sources.warc import build_warc, parse_warc_blob

    blob = build_warc(recs, compress=compress)
    got = list(parse_warc_blob(blob, "t"))
    assert len(got) == len(recs)
    for want, r in zip(recs, got):
        assert r["rec_type"] == want["rec_type"]
        assert r["url"] == (want["url"] or None)
        assert r["payload"] == want["payload"]
        if want["rec_type"] == "response":
            assert r["http_status"] == 200


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(texts=st.lists(
    st.text(min_size=0, max_size=60), min_size=1, max_size=6))
def test_canonical_text_idempotent_on_random_unicode(spark, texts):
    from snowy_json_spark.operators.normalize import canonical_text

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string")
    once = [r["t"] for r in df.select(
        canonical_text(F.col("text")).alias("t")).orderBy("id").collect()]
    df2 = spark.createDataFrame(
        [(i, t) for i, t in enumerate(once)], "id long, text string")
    twice = [r["t"] for r in df2.select(
        canonical_text(F.col("text")).alias("t")).orderBy("id").collect()]
    assert once == twice
