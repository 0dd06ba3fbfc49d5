"""Capstone e2e: WARC → extract → noindex → curate → LM gate → pack
→ shards, the full training-data pipeline composed from the shipped
operators, run twice for determinism."""

from __future__ import annotations

import glob
import hashlib

from pyspark.sql import functions as F

from snowy_json_spark.operators.lm import perplexity_filter, train_word_lm
from snowy_json_spark.operators.packing import greedy_pack
from snowy_json_spark.operators.pipeline import curate_documents
from snowy_json_spark.operators.text import token_count
from snowy_json_spark.operators.extract import extract_text, noindex_filter
from snowy_json_spark.sources.shards import read_shards, write_training_shards
from snowy_json_spark.sources.warc import build_warc, read_warc


GOOD = ("the quick brown fox jumps over the lazy dog and then walks back "
        "home through the quiet park while the evening settles in slowly "
        "over the rooftops and the streets empty out one by one tonight")


def _warc_files(tmp_path):
    def page(i, body, noindex=False):
        meta = '<meta name="robots" content="noindex">' if noindex else ""
        html = f"<html><body>{meta}{body}</body></html>"
        return {
            "rec_type": "response",
            "url": f"https://h{i % 7}.example.com/p/{i}",
            "warc_ts": "2026-01-02T03:04:05Z",
            "payload": html,
        }

    def filler(i):
        # 25 per-doc-unique words: cross-doc word Jaccard vs another
        # doc ~ 40/(40+25+25) ≈ 0.44 < 0.8, so distinct pages are NOT
        # near-dups of each other
        return " ".join(f"tail{i}word{j}" for j in range(25))

    recs = []
    for i in range(60):
        if i == 3:
            recs.append(page(i, GOOD + " " + filler(i), noindex=True))
        elif i == 10:
            recs.append(page(i, GOOD + " twin page body exactly"))
        elif i == 11:
            recs.append(page(i, GOOD + " twin page body exactly."))  # dup
        elif i % 5 == 0:
            recs.append(page(i, "$$ !! ?? @@ ##"))  # fails quality
        else:
            recs.append(page(i, GOOD + " " + filler(i)))
    (tmp_path / "a.warc").write_bytes(build_warc(recs[:30]))
    (tmp_path / "b.warc.gz").write_bytes(build_warc(recs[30:], compress=True))
    return str(tmp_path) + "/*.warc*"


def _run_pipeline(spark, glob_path, out_dir):
    pages = read_warc(spark, glob_path).filter(F.col("rec_type") == "response")
    pages = noindex_filter(pages, html_col="payload")
    docs = pages.select(
        "url", extract_text(F.col("payload")).alias("text")
    )
    cur = curate_documents(docs, "url", "text", min_jaccard=0.8, min_words=20)
    kept = cur.filter(F.col("keep")).select("url", "text")
    vocab, meta = train_word_lm(kept, "text", vocab_size=200)
    gated = perplexity_filter(
        kept, "url", "text", vocab, meta["oov_logp"], max_perplexity=1000.0
    ).filter(F.col("keep")).select("url", "text")
    packed = greedy_pack(
        gated.withColumn("n_tokens", token_count(F.col("text"))),
        "url", "n_tokens", 64, n_shards=4,
    )
    final = gated.join(packed.select("url", "pack_id", "pack_off"), "url")
    write_training_shards(final, out_dir, "url", 4)
    return read_shards(spark, out_dir)


def _digest(df):
    rows = sorted(map(tuple, df.collect()))
    return hashlib.md5(repr(rows).encode()).hexdigest()


def test_full_pipeline_composes_and_is_deterministic(spark, tmp_path):
    glob_path = _warc_files(tmp_path)
    out1 = _run_pipeline(spark, glob_path, str(tmp_path / "run1"))
    rows = {r["url"]: r for r in out1.collect()}

    # the noindex page never enters the corpus
    assert not any(u.endswith("/p/3") for u in rows)
    # quality-failed pages (i % 5 == 0, gibberish) are gone
    assert not any(u.endswith("/p/5") or u.endswith("/p/20") for u in rows)
    # exactly one of the near-dup twins survives
    twins = [u for u in rows if u.endswith("/p/10") or u.endswith("/p/11")]
    assert len(twins) == 1
    # the healthy pages made it through with pack metadata
    survivors = [u for u in rows if "word7" in rows[u]["text"]]
    assert len(survivors) >= 40
    assert all(rows[u]["pack_id"] >= 0 for u in rows)
    # every output file sits in a shard directory
    assert glob.glob(str(tmp_path / "run1") + "/shard=*")

    # determinism: the whole chain reproduces byte-identical results
    out2 = _run_pipeline(spark, glob_path, str(tmp_path / "run2"))
    assert _digest(out1) == _digest(out2)
