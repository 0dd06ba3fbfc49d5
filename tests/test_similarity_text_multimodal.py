"""ANN similarity, text analysis, and multimodal plumbing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snowy_json_spark.operators.multimodal import (
    extract_image_metadata,
    payload_stats,
    sample_frames,
)
from snowy_json_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
    with_lsh_bucket,
)
from snowy_json_spark.operators.text import (
    detect_language,
    quality_score,
    regex_token_count,
    text_profile,
    token_count,
    winnowing_fingerprints,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_brute_force_topk(spark, embeddings):
    q = embeddings.first()["embedding"]
    top = brute_force_topk(embeddings, "embedding", list(q), k=5).collect()
    assert len(top) == 5
    # the query vector itself must rank first with cosine ≈ 1
    assert top[0]["cosine"] == pytest.approx(1.0, abs=1e-6)
    assert top[0]["cosine"] >= top[1]["cosine"] >= top[4]["cosine"]


def test_lsh_topk_recall(spark, embeddings):
    # sf embeddings are near-uniform random vectors — the hardest case
    # for cosine LSH (no cluster structure). planes=6/probes=16 gives
    # ~50% recall at ~25% candidate fraction; clustered real corpora do
    # far better at the same settings.
    dim = len(embeddings.first()["embedding"])
    bucketed = with_lsh_bucket(embeddings, "embedding", dim, n_planes=6).cache()
    hits = 0
    queries = [list(r["embedding"]) for r in embeddings.take(5)]
    for q in queries:
        exact = {r["vec_id"] for r in brute_force_topk(embeddings, "embedding", q, k=5).collect()}
        approx = {
            r["vec_id"]
            for r in lsh_topk(bucketed, "embedding", q, k=5, n_planes=6, n_probes=16).collect()
        }
        hits += len(exact & approx)
    recall = hits / 25
    assert recall >= 0.4, f"LSH recall too low: {recall}"


def test_lsh_prunes_candidates(spark, embeddings):
    dim = len(embeddings.first()["embedding"])
    bucketed = with_lsh_bucket(embeddings, "embedding", dim, n_planes=8)
    sizes = bucketed.groupBy("lsh_bucket").count().collect()
    assert len(sizes) > 10  # spread across buckets, not one giant bucket
    assert max(r["count"] for r in sizes) < 500


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def test_token_counts(spark):
    df = spark.createDataFrame(
        [("hello world foo",), ("one",), ("",)], "t string"
    )
    got = df.select(
        token_count(F.col("t")).alias("n"), regex_token_count(F.col("t")).alias("r")
    ).collect()
    assert [r["n"] for r in got] == [3, 1, 0]
    assert got[0]["r"] == 3


def test_detect_language(spark):
    df = spark.createDataFrame(
        [
            ("the cat is on the table and it is not happy",),
            ("der hund ist in den garten und das ist auch nicht gut",),
            ("le chat est dans la maison et il est avec le chien",),
            ("el perro es un animal y la casa es de su familia",),
            ("xyzzy qwerty plugh",),
        ],
        "t string",
    )
    got = [r["lang"] for r in df.select(detect_language(F.col("t")).alias("lang")).collect()]
    assert got == ["en", "de", "fr", "es", "und"]


def test_quality_score_ordering(spark):
    good = "this is a well formed paragraph of text that has the right density " * 3
    bad = "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"
    df = spark.createDataFrame([(good,), (bad,)], "t string")
    got = [r["q"] for r in df.select(quality_score(F.col("t")).alias("q")).collect()]
    assert got[0] > got[1]
    assert 0.0 <= got[1] <= got[0] <= 1.0


def test_winnowing_fingerprints(spark):
    df = spark.createDataFrame(
        [("abcdefghijklmnop",), ("abcdefghijklmnop",), ("zzzzzzzzzzzzzzzz",), ("",)],
        "t string",
    )
    got = df.select(winnowing_fingerprints(F.col("t")).alias("fp")).collect()
    assert got[0]["fp"] == got[1]["fp"]  # deterministic
    assert got[0]["fp"] != got[2]["fp"]
    assert got[3]["fp"] == []


def test_text_profile_on_documents(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    prof = text_profile(docs, "text", "doc_id")
    row = prof.first()
    assert row["n_tokens"] > 0 and row["n_chars"] > 0
    assert prof.count() == 500


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def binary_df(spark):
    rows = [
        ("u1", b"fake image bytes 1" * 10),
        ("u2", b"fake image bytes 2" * 20),
        ("u3", b""),
        ("u4", None),
    ]
    return spark.createDataFrame(rows, "url string, html binary")


def test_extract_image_metadata(spark, binary_df):
    meta = extract_image_metadata(binary_df).collect()
    by_url = {r["url"]: r for r in meta}
    assert by_url["u1"]["format"] in ("jpeg", "png", "webp")
    assert by_url["u1"]["width"] > 0 and by_url["u1"]["height"] > 0
    assert by_url["u1"]["sha256"] is not None
    # empty/None payloads become null-metadata rows, not failures
    assert by_url["u3"]["format"] is None
    assert by_url["u4"]["format"] is None
    # deterministic fake: same payload → same metadata
    again = {r["url"]: r for r in extract_image_metadata(binary_df).collect()}
    assert again["u1"] == by_url["u1"]


def test_sample_frames_row_expansion(spark, binary_df):
    frames = sample_frames(binary_df, max_frames=4).collect()
    urls = {r["url"] for r in frames}
    assert urls == {"u1", "u2"}  # empty payloads produce no frames
    u1 = [r for r in frames if r["url"] == "u1"]
    assert 1 <= len(u1) <= 4
    assert all(len(r["frame"]) > 0 for r in u1)


def test_payload_stats(spark, binary_df):
    s = payload_stats(binary_df).collect()[0]
    assert s["n_rows"] == 4
    assert s["max_bytes"] == 360
    assert s["empty_rate"] == pytest.approx(1 / 3)  # of the 3 non-null
