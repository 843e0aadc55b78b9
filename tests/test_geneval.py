"""Unit tests for operators/geneval.py (ROUGE-N + corpus BLEU)."""

import math

import pytest

from invoice_ocr_reconciler_spark.operators.geneval import (
    bleu_corpus,
    rouge_n,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "ref_text", "hyp_text"])


def _by_key(df):
    return {(r["doc_id"], r["n"]): r.asDict() for r in df.collect()}


def test_rouge1_hand_computed(spark):
    # ref: the cat sat on the mat ; hyp: the cat the cat
    # unigram clip: the min(2,2)=2, cat min(2,1)=1 -> I=3, H=4, R=6
    out = _by_key(
        rouge_n(_mk(spark, [(1, "the cat sat on the mat", "the cat the cat")]))
    )
    m = out[(1, 1)]
    assert (m["n_hyp"], m["n_ref"], m["n_clip"]) == (4, 6, 3)
    assert m["precision"] == pytest.approx(3 / 4)
    assert m["recall"] == pytest.approx(3 / 6)
    assert m["f1"] == pytest.approx(2 * 3 / (4 + 6), abs=0)
    # bigrams: hyp {the cat x2, cat the}; ref has "the cat" once -> clip 1
    b = out[(1, 2)]
    assert (b["n_hyp"], b["n_ref"], b["n_clip"]) == (3, 5, 1)


def test_identity_is_perfect(spark):
    out = _by_key(rouge_n(_mk(spark, [(1, "a b c d", "a b c d")])))
    for n in (1, 2):
        assert out[(1, n)]["f1"] == 1.0


def test_short_doc_zero_pools_null_ratios(spark):
    out = _by_key(rouge_n(_mk(spark, [(1, "word", "word")]), ns=(1, 2)))
    assert out[(1, 2)]["n_hyp"] == 0 and out[(1, 2)]["n_ref"] == 0
    assert out[(1, 2)]["f1"] is None
    assert out[(1, 1)]["f1"] == 1.0


def test_empty_and_null_sides(spark):
    out = _by_key(rouge_n(_mk(spark, [(1, "", "a b"), (2, None, None)])))
    assert out[(1, 1)]["precision"] == 0.0  # hyp grams, zero clip
    assert out[(1, 1)]["recall"] is None  # no ref evidence
    assert out[(2, 1)]["f1"] is None


def test_bad_ns_raises():
    with pytest.raises(ValueError):
        rouge_n(None, ns=())
    with pytest.raises(ValueError):
        rouge_n(None, ns=(0,))


def test_bleu_perfect_corpus(spark):
    row = bleu_corpus(
        _mk(spark, [(1, "a b c d e", "a b c d e"), (2, "x y z w", "x y z w")])
    ).collect()[0]
    assert row["bleu"] == 1.0 and row["brevity_ok"] is True
    assert row["p_1"] == 1.0 and row["p_4"] == 1.0
    assert row["bp_exponent"] == 0.0


def test_bleu_geometric_mean_matches_manual(spark):
    df = _mk(spark, [(1, "a b c d e f", "a b c x e f")])
    row = bleu_corpus(df).collect()[0].asDict()
    ps = [row[f"p_{n}"] for n in (1, 2, 3, 4)]
    assert row["hyp_len"] == 6 and row["ref_len"] == 6
    want = math.sqrt(math.sqrt(ps[0] * ps[1] * ps[2] * ps[3]))
    assert row["bleu"] == pytest.approx(want, abs=0)


def test_bleu_zero_ngram_precision_scores_zero(spark):
    # no 4-gram overlap at all -> p_4 = 0 -> bleu 0.0 (not NULL: evidence
    # of total miss)
    df = _mk(spark, [(1, "a b c d e", "a b x d e")])
    row = bleu_corpus(df).collect()[0]
    assert row["p_4"] == 0.0 and row["bleu"] == 0.0


def test_bleu_brevity_bite_publishes_exponent_not_guess(spark):
    df = _mk(spark, [(1, "a b c d e f g h", "a b c d")])  # c=4 < r=8
    row = bleu_corpus(df).collect()[0]
    assert row["brevity_ok"] is False and row["bleu"] is None
    assert row["bp_exponent"] == pytest.approx(1.0 - 8 / 4)
    assert math.exp(row["bp_exponent"]) == pytest.approx(math.exp(-1.0))


def test_bleu_empty_corpus(spark):
    df = spark.createDataFrame(
        [], "doc_id long, ref_text string, hyp_text string"
    )
    row = bleu_corpus(df).collect()[0]
    assert row["hyp_len"] == 0 and row["bleu"] is None


def test_partitioning_invariance(spark):
    rows = [
        (i, " ".join(f"w{(i + j) % 9}" for j in range(12)),
         " ".join(f"w{(i + j * 2) % 9}" for j in range(10)))
        for i in range(30)
    ]
    df = _mk(spark, rows)
    a = rouge_n(df.repartition(1)).collect()
    b = rouge_n(df.repartition(8)).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    ra = bleu_corpus(df.repartition(1)).collect()[0].asDict()
    rb = bleu_corpus(df.repartition(8)).collect()[0].asDict()
    assert ra == rb
