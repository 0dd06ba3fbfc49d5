"""Sequence packing: equality with reference folds, determinism."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from snowy_json_spark.operators.packing import (
    chunk_spans,
    greedy_pack,
    pack_utilization,
    shard_of,
)


def _corpus(spark, n=500, n_shards=8):
    # token counts span tiny → oversize (ctx 100 in the tests below)
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(140)) + 1).alias("n_tokens"),
        shard_of(F.col("id"), n_shards).alias("shard"),
    )


def _ref_greedy(rows, ctx):
    """Reference per-shard fold: first-fit in id order."""
    out = {}
    for shard in sorted({r["shard"] for r in rows}):
        docs = sorted((r for r in rows if r["shard"] == shard),
                      key=lambda r: r["doc_id"])
        acc, cur = 0, 0
        for i, r in enumerate(docs):
            t = r["n_tokens"]
            if i > 0 and acc + t > ctx:
                cur, acc = cur + 1, 0
            out[(shard, r["doc_id"])] = (cur, acc, t > ctx)
            acc += t
    return out


def test_greedy_matches_reference_fold(spark):
    df = _corpus(spark)
    got = greedy_pack(df, "doc_id", "n_tokens", 100, shard_col="shard").collect()
    ref = _ref_greedy([r.asDict() for r in df.collect()], 100)
    assert len(got) == len(ref)
    for r in got:
        pack_id, pack_off, oversize = ref[(r["shard"], r["doc_id"])]
        assert (r["pack_id"], r["pack_off"], r["oversize"]) == (
            pack_id, pack_off, oversize,
        ), r


def test_greedy_pack_never_overflows_except_oversize(spark):
    df = _corpus(spark)
    got = greedy_pack(df, "doc_id", "n_tokens", 100, shard_col="shard")
    per_pack = got.groupBy("shard", "pack_id").agg(
        F.sum("n_tokens").alias("tot"),
        F.count(F.lit(1)).alias("n"),
        F.max(F.col("oversize").cast("int")).alias("has_over"),
    )
    bad = per_pack.filter((F.col("tot") > 100) & (F.col("has_over") == 0)).count()
    assert bad == 0
    # an oversize doc is always alone in its pack
    alone = per_pack.filter(F.col("has_over") == 1)
    assert alone.filter(F.col("n") != 1).count() == 0


def test_greedy_deterministic_under_repartition(spark):
    df = _corpus(spark)
    a = sorted(map(tuple, greedy_pack(df, "doc_id", "n_tokens", 100,
                                      shard_col="shard").collect()))
    b = sorted(map(tuple, greedy_pack(df.repartition(13), "doc_id", "n_tokens",
                                      100, shard_col="shard").collect()))
    assert a == b


def test_chunk_spans_matches_cumsum(spark):
    df = _corpus(spark, n=300)
    got = {(r["shard"], r["doc_id"]): r
           for r in chunk_spans(df, "doc_id", "n_tokens", 64,
                                shard_col="shard").collect()}
    rows = [r.asDict() for r in df.collect()]
    for shard in {r["shard"] for r in rows}:
        off = 0
        for r in sorted((x for x in rows if x["shard"] == shard),
                        key=lambda x: x["doc_id"]):
            g = got[(shard, r["doc_id"])]
            assert g["start_off"] == off
            assert g["first_chunk"] == off // 64
            last = max(off // 64, (off + r["n_tokens"] - 1) // 64)
            assert g["last_chunk"] == last
            assert g["n_chunks"] == last - off // 64 + 1
            off += r["n_tokens"]


def test_chunk_spans_zero_token_doc(spark):
    pdf = pd.DataFrame({"doc_id": [1, 2, 3], "n_tokens": [64, 0, 10],
                        "shard": [0, 0, 0]})
    got = {r["doc_id"]: r
           for r in chunk_spans(spark.createDataFrame(pdf), "doc_id",
                                "n_tokens", 64, shard_col="shard").collect()}
    # doc 2 sits exactly on the boundary: spans one (empty) chunk
    assert got[2]["start_off"] == 64
    assert got[2]["first_chunk"] == got[2]["last_chunk"] == 1
    assert got[2]["n_chunks"] == 1
    assert got[3]["start_off"] == 64


def test_pack_utilization(spark):
    pdf = pd.DataFrame({"doc_id": [1, 2, 3, 4], "n_tokens": [60, 30, 90, 150],
                        "shard": [0, 0, 0, 0]})
    packed = greedy_pack(spark.createDataFrame(pdf), "doc_id", "n_tokens", 100,
                         shard_col="shard")
    u = pack_utilization(packed, 100).collect()
    assert len(u) == 1
    r = u[0]
    # packs: [60,30], [90], [150 oversize] → 3 packs, 330 tokens
    assert r["n_docs"] == 4 and r["n_packs"] == 3 and r["n_oversize"] == 1
    assert r["fill"] == round(330 / 300, 6)


def test_ctx_len_validated(spark):
    df = _corpus(spark, n=5)
    for fn in (chunk_spans, greedy_pack):
        try:
            fn(df, "doc_id", "n_tokens", 0, shard_col="shard")
        except ValueError:
            pass
        else:
            raise AssertionError("ctx_len=0 should raise")


def test_chunk_text_offsets_and_overlap(spark):
    from snowy_json_spark.operators.packing import chunk_text

    pdf = pd.DataFrame({"doc_id": [1, 2, 3],
                        "text": ["abcdefghij", "ab", None]})
    got = chunk_text(spark.createDataFrame(pdf), "doc_id", "text",
                     chunk_chars=8, overlap_chars=4).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_index"], r["start"], r["chunk"]))
    # len 10, step 4, stop at len-overlap-1=5 → starts 0,4
    assert by_doc[1] == [(0, 0, "abcdefgh"), (1, 4, "efghij")]
    # short text: one chunk
    assert by_doc[2] == [(0, 0, "ab")]
    # null text: no chunks
    assert 3 not in by_doc
    # overlap property: consecutive chunks share overlap_chars
    assert by_doc[1][0][2][-4:] == by_doc[1][1][2][:4]


def test_chunk_text_params_validated(spark):
    from snowy_json_spark.operators.packing import chunk_text

    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    for kwargs in ({"chunk_chars": 0}, {"chunk_chars": 4, "overlap_chars": 4}):
        try:
            chunk_text(df, "doc_id", "text", **kwargs)
        except ValueError:
            pass
        else:
            raise AssertionError(kwargs)
