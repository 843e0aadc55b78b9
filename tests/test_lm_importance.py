"""Tests for the bigram-LM perplexity scorer (operators/lm_score.py) and
the DSIR hashed-n-gram importance weighting (operators/importance.py)."""

import math

import pytest
from pyspark.sql import functions as F


def _r(x, p):
    """The shared cross-engine rounding contract: floor(x*1eP + 0.5)/1eP."""
    return math.floor(x * 10**p + 0.5) / 10**p


@pytest.fixture(scope="module")
def tiny_corpus(spark):
    rows = [
        (0, "a b a"),
        (1, "a b"),
        (2, "c"),  # one token -> no bigrams
        (3, ""),  # empty
        (4, None),  # null
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lm_perplexity_hand_computed(spark, tiny_corpus):
    from invoice_ocr_reconciler_spark.operators.lm_score import (
        lm_perplexity,
        train_bigram_lm,
    )

    model = train_bigram_lm(tiny_corpus)
    # counts: c1 = {a:3, b:2, c:1}, V = 3, c2 = {"a b":2, "b a":1}
    assert {r["w1"]: r["c1"] for r in model["unigrams"].collect()} == {
        "a": 3, "b": 2, "c": 1
    }
    assert {r["gram"]: r["c2"] for r in model["bigrams"].collect()} == {
        "a b": 2, "b a": 1
    }
    assert model["vocab"].collect()[0]["vocab_size"] == 3

    out = {r["doc_id"]: r.asDict()
           for r in lm_perplexity(tiny_corpus, model, k=0.5).collect()}
    assert len(out) == 5

    # python replica of the scoring contract (k=0.5, V=3)
    lp_ab = _r(math.log((2 + 0.5) / (3 + 0.5 * 3)), 8)
    lp_ba = _r(math.log((1 + 0.5) / (2 + 0.5 * 3)), 8)
    avg0 = _r((lp_ab + lp_ba) / 2, 6)
    assert out[0]["n_bigrams"] == 2
    assert out[0]["avg_logp"] == pytest.approx(avg0, abs=1e-9)
    assert out[0]["ppl"] == pytest.approx(_r(math.exp(-avg0), 4), abs=1e-9)
    # doc 1's single bigram is the more frequent one -> lower ppl than doc 0
    assert out[1]["n_bigrams"] == 1
    assert out[1]["ppl"] < out[0]["ppl"]
    # no-bigram docs: n=0, NULL scores
    for i in (2, 3, 4):
        assert out[i]["n_bigrams"] == 0
        assert out[i]["avg_logp"] is None and out[i]["ppl"] is None


def test_lm_unseen_bigram_smoothing(spark, tiny_corpus):
    from invoice_ocr_reconciler_spark.operators.lm_score import (
        lm_perplexity,
        train_bigram_lm,
    )

    model = train_bigram_lm(tiny_corpus)
    probe = spark.createDataFrame(
        [(10, "c a"), (11, "z z")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r.asDict()
           for r in lm_perplexity(probe, model, k=0.5).collect()}
    # unseen bigram, seen context c: ln(0.5 / (1 + 1.5))
    assert out[10]["avg_logp"] == pytest.approx(
        _r(_r(math.log(0.5 / 2.5), 8), 6), abs=1e-9
    )
    # fully unseen context: ln(k / kV) = ln(1/V)
    assert out[11]["avg_logp"] == pytest.approx(
        _r(_r(math.log(0.5 / 1.5), 8), 6), abs=1e-9
    )
    # add-k artifact, asserted deliberately: an unseen context backs off to
    # uniform 1/V, which can beat a seen context that never precedes w2
    assert out[10]["ppl"] > out[11]["ppl"]


def test_lm_broadcast_parity_and_partition_invariance(spark, tiny_corpus):
    from invoice_ocr_reconciler_spark.operators.lm_score import (
        lm_perplexity,
        train_bigram_lm,
    )

    model = train_bigram_lm(tiny_corpus)
    a = sorted(lm_perplexity(tiny_corpus, model, broadcast_model=True)
               .collect())
    b = sorted(lm_perplexity(tiny_corpus.repartition(7), model,
                             broadcast_model=False).collect())
    assert a == b


@pytest.fixture(scope="module")
def dsir_frames(spark):
    target = spark.createDataFrame(
        [(100, "clean wiki prose about science"),
         (101, "more clean prose about history")],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(0, "clean prose about science"),     # target-like
         (1, "buy cheap pills online casino"),  # off-target
         (2, ""),                               # empty
         (3, None)],
        "doc_id long, text string",
    )
    return raw, target


def test_dsir_scores_target_like_docs_higher(spark, dsir_frames):
    from invoice_ocr_reconciler_spark.operators.importance import (
        dsir_log_weights,
    )

    raw, target = dsir_frames
    out = {r["doc_id"]: r.asDict()
           for r in dsir_log_weights(raw, target).collect()}
    assert len(out) == 4
    # n_grams = unigrams + bigrams: 4 tokens -> 4 + 3 = 7
    assert out[0]["n_grams"] == 7
    assert out[1]["n_grams"] == 9  # 5 tokens -> 5 + 4
    assert out[0]["log_weight"] > out[1]["log_weight"]
    for i in (2, 3):
        assert out[i]["n_grams"] == 0 and out[i]["log_weight"] is None


def test_dsir_select_deterministic_topn(spark, dsir_frames):
    from invoice_ocr_reconciler_spark.operators.importance import (
        dsir_log_weights,
        dsir_select,
    )

    raw, target = dsir_frames
    scores = dsir_log_weights(raw, target)
    picked = dsir_select(scores, 2).collect()
    assert [r["doc_id"] for r in picked] == [0, 1]  # by weight desc
    assert [r["sel_rank"] for r in picked] == [1, 2]
    # NULL-weight docs are never selected ahead of scored ones
    all4 = dsir_select(scores, 4).collect()
    assert [r["doc_id"] for r in all4][:2] == [0, 1]
    assert {r["doc_id"] for r in all4[2:]} == {2, 3}


def test_dsir_partition_and_broadcast_invariance(spark, dsir_frames):
    from invoice_ocr_reconciler_spark.operators.importance import (
        dsir_log_weights,
    )

    raw, target = dsir_frames
    a = sorted(dsir_log_weights(raw, target).collect())
    b = sorted(
        dsir_log_weights(
            raw.repartition(5), target.repartition(3), broadcast_model=False
        ).collect()
    )
    assert a == b


def test_dsir_degenerate_inputs(spark, dsir_frames):
    from invoice_ocr_reconciler_spark.operators.importance import (
        dsir_log_weights,
    )

    raw, target = dsir_frames
    empty = spark.createDataFrame([], "doc_id long, text string")
    # empty raw corpus -> empty result, no crash
    assert dsir_log_weights(empty, target).count() == 0
    # gramless target -> loud failure, not silently-NULL weights (which
    # would make dsir_select pick the first n docs by id)
    import pytest

    with pytest.raises(ValueError, match="target corpus has no grams"):
        dsir_log_weights(raw, empty)
    blank_target = spark.createDataFrame(
        [(0, ""), (1, None)], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="target corpus has no grams"):
        dsir_log_weights(raw, blank_target)
