"""Unigram LM training + perplexity scoring: hand-computed equality."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from snowy_json_spark.operators.lm import (
    perplexity_filter,
    score_documents,
    train_word_lm,
)


def _corpus(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat"),
        (3, "zebra quark"),
        (4, None),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_word_lm_counts_and_logp(spark):
    df = _corpus(spark)
    vocab, meta = train_word_lm(df, "text", vocab_size=3, alpha=1.0)
    # corpus tokens: the×3 sat×2 cat on mat dog zebra quark = 11
    assert meta["n_tokens"] == 11
    assert meta["vocab_size"] == 3
    got = {r["word"]: r["logp"] for r in vocab.collect()}
    # top-3 by (count desc, word asc): the(3), sat(2), cat(1) — 'cat'
    # wins the count-1 tie alphabetically
    assert set(got) == {"the", "sat", "cat"}
    denom = 11 + 1.0 * 4
    assert got["the"] == pytest.approx(math.log(4 / denom), rel=1e-12)
    assert got["cat"] == pytest.approx(math.log(2 / denom), rel=1e-12)
    assert meta["oov_logp"] == pytest.approx(math.log(1 / denom), rel=1e-12)


def test_score_documents_exact(spark):
    df = _corpus(spark)
    vocab, meta = train_word_lm(df, "text", vocab_size=3, alpha=1.0)
    got = {r["doc_id"]: r for r in
           score_documents(df, "doc_id", "text", vocab, meta["oov_logp"]).collect()}
    denom = 11 + 4.0
    lp = {"the": math.log(4 / denom), "sat": math.log(3 / denom),
          "cat": math.log(2 / denom)}
    oov = math.log(1 / denom)
    # doc 1: the cat sat on the mat → 2×the + sat + cat + 2×oov
    want1 = 2 * lp["the"] + lp["sat"] + lp["cat"] + 2 * oov
    assert got[1]["n_words"] == 6
    assert got[1]["logprob"] == pytest.approx(want1, rel=1e-12)
    assert got[1]["cross_entropy"] == pytest.approx(-want1 / 6, rel=1e-12)
    assert got[1]["perplexity"] == pytest.approx(math.exp(-want1 / 6), rel=1e-12)
    # doc 3 is pure OOV
    assert got[3]["logprob"] == pytest.approx(2 * oov, rel=1e-12)
    # empty/null docs keep rows with null entropy
    for d in (4, 5):
        assert got[d]["n_words"] == 0
        assert got[d]["cross_entropy"] is None
        assert got[d]["perplexity"] is None


def test_perplexity_filter_band_and_empty(spark):
    df = _corpus(spark)
    vocab, meta = train_word_lm(df, "text", vocab_size=3, alpha=1.0)
    # doc 3 (all OOV) has the highest perplexity: exp(-oov) = denom
    out = {r["doc_id"]: r for r in
           perplexity_filter(df, "doc_id", "text", vocab, meta["oov_logp"],
                             max_perplexity=14.0).collect()}
    assert out[3]["perplexity"] == pytest.approx(15.0, rel=1e-12)
    assert out[3]["keep"] is False
    assert out[1]["keep"] is True and out[2]["keep"] is True
    # empty docs: keep flag is a real boolean, default False
    assert out[4]["keep"] is False and out[5]["keep"] is False
    kept_empty = {r["doc_id"]: r for r in
                  perplexity_filter(df, "doc_id", "text", vocab,
                                    meta["oov_logp"], max_perplexity=14.0,
                                    keep_empty=True).collect()}
    assert kept_empty[4]["keep"] is True
    # schema: original columns + perplexity + keep
    assert set(out[1].asDict()) == {"doc_id", "text", "perplexity", "keep"}


def test_vocab_cut_is_deterministic_and_bounded(spark):
    df = _corpus(spark)
    a, _ = train_word_lm(df, "text", vocab_size=4, alpha=0.5)
    b, _ = train_word_lm(df.repartition(7), "text", vocab_size=4, alpha=0.5)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    assert a.count() == 4


def test_params_validated(spark):
    df = _corpus(spark)
    with pytest.raises(ValueError):
        train_word_lm(df, "text", vocab_size=0)
    with pytest.raises(ValueError):
        train_word_lm(df, "text", alpha=0.0)


def test_scoring_plan_is_broadcast_join(spark):
    """The model join must broadcast (model ≤ V rows by construction);
    a shuffle join here would move every exploded word twice."""
    df = _corpus(spark)
    vocab, meta = train_word_lm(df, "text", vocab_size=3)
    plan = (
        score_documents(df, "doc_id", "text", vocab, meta["oov_logp"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan


def test_log_likelihood_ratio_matches_two_single_scores(spark):
    from snowy_json_spark.operators.lm import dsir_select, log_likelihood_ratio

    df = _corpus(spark)
    target, tm = train_word_lm(df.filter(F.col("doc_id") <= 2), "text",
                               vocab_size=3)
    corpus, cm = train_word_lm(df, "text", vocab_size=3)
    got = {r["doc_id"]: r for r in
           log_likelihood_ratio(df, "doc_id", "text", target,
                                tm["oov_logp"], corpus,
                                cm["oov_logp"]).collect()}
    st = {r["doc_id"]: r for r in
          score_documents(df, "doc_id", "text", target, tm["oov_logp"]).collect()}
    sc = {r["doc_id"]: r for r in
          score_documents(df, "doc_id", "text", corpus, cm["oov_logp"]).collect()}
    for d in (1, 2, 3):
        assert got[d]["target_logprob"] == pytest.approx(st[d]["logprob"], rel=1e-12)
        assert got[d]["corpus_logprob"] == pytest.approx(sc[d]["logprob"], rel=1e-12)
        assert got[d]["log_ratio"] == pytest.approx(
            st[d]["logprob"] - sc[d]["logprob"], rel=1e-12)
    for d in (4, 5):
        assert got[d]["n_words"] == 0 and got[d]["log_ratio"] is None
    # selection gate: null-safe keep
    sel = {r["doc_id"]: r for r in
           dsir_select(df, "doc_id", "text", target, tm["oov_logp"],
                       corpus, cm["oov_logp"], min_log_ratio=-1.0).collect()}
    for d in (1, 2, 3):
        assert sel[d]["keep"] == (got[d]["log_ratio"] >= -1.0)
    assert sel[4]["keep"] is False and sel[5]["keep"] is False


def test_llr_single_explode_two_broadcasts(spark):
    """Document text must move once: one Generate (explode) feeding two
    BroadcastHashJoins."""
    from snowy_json_spark.operators.lm import log_likelihood_ratio

    df = _corpus(spark)
    target, tm = train_word_lm(df.filter(F.col("doc_id") <= 2), "text",
                               vocab_size=3)
    corpus, cm = train_word_lm(df, "text", vocab_size=3)
    # materialize the models (as a pipeline would) so the plan under
    # test is the scoring path, not the training subplans
    target = target.cache(); target.count()
    corpus = corpus.cache(); corpus.count()
    plan = (
        log_likelihood_ratio(df, "doc_id", "text", target, tm["oov_logp"],
                             corpus, cm["oov_logp"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # two model joins broadcast (the doc_id spine join is independent
    # and may broadcast too, so >= 2); the scoring path explodes the
    # text exactly once — the scoring Generate is the only one that
    # retains doc_id (training explodes drop it; cached training plans
    # still print in the tree)
    import re
    assert plan.count("BroadcastHashJoin") >= 2, plan
    scoring_explodes = [
        m for m in re.findall(r"Generate explode[^\n]*", plan)
        if "doc_id" in m
    ]
    assert len(scoring_explodes) == 1, plan
