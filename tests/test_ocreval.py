"""Unit tests for operators/ocreval.py (CER + coded-word WER)."""

import pytest

from invoice_ocr_reconciler_spark.operators.ocreval import (
    CODE_ALPHABET,
    cer_wer,
    cer_wer_summary,
)


def _score(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "ref_text", "hyp_text"])
    return {r["doc_id"]: r.asDict() for r in cer_wer(df).collect()}


def _py_word_lev(a, b):
    # reference DP for word-level Levenshtein
    a, b = a.lower().split(), b.lower().split()
    prev = list(range(len(b) + 1))
    for i, wa in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, wb in enumerate(b, 1):
            cur[j] = min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (wa != wb)
            )
        prev = cur
    return prev[-1]


def test_alphabet_properties():
    assert len(CODE_ALPHABET) == 91
    assert len(set(CODE_ALPHABET)) == 91
    for bad in ("'", '"', "\\"):
        assert bad not in CODE_ALPHABET
    assert all(33 <= ord(c) <= 126 for c in CODE_ALPHABET)


def test_identity_and_substitution(spark):
    out = _score(
        spark,
        [
            (1, "the cat sat", "the cat sat"),
            (2, "the cat sat", "the bat sat"),
        ],
    )
    assert out[1]["cer"] == 0.0 and out[1]["wer"] == 0.0
    assert out[2]["word_dist"] == 1 and out[2]["wer"] == pytest.approx(1 / 3)
    assert out[2]["char_dist"] == 1


def test_matches_python_dp_on_randomish_pairs(spark):
    rows = []
    for i in range(25):
        ref = " ".join(f"w{(i * 7 + j * 3) % 13}" for j in range(1 + i % 9))
        hyp = " ".join(f"w{(i * 5 + j * 11) % 13}" for j in range(1 + (i + 4) % 9))
        rows.append((i, ref, hyp))
    out = _score(spark, rows)
    for i, ref, hyp in rows:
        assert out[i]["word_dist"] == _py_word_lev(ref, hyp), (ref, hyp)


def test_case_insensitive_words(spark):
    out = _score(spark, [(1, "The CAT", "the cat")])
    assert out[1]["word_dist"] == 0 and out[1]["wer"] == 0.0
    assert out[1]["char_dist"] > 0  # chars keep case


def test_empty_and_null_refs(spark):
    out = _score(spark, [(1, "", "hello"), (2, None, None)])
    assert out[1]["cer"] is None and out[1]["char_dist"] == 5
    assert out[1]["wer"] is None and out[1]["word_dist"] == 1
    assert out[2]["char_dist"] == 0 and out[2]["cer"] is None


def test_vocab_overflow_publishes_null_not_wrong(spark):
    ref = " ".join(f"u{i}" for i in range(60))
    hyp = " ".join(f"v{i}" for i in range(60))  # 120 distinct > 91
    out = _score(spark, [(1, ref, hyp)])
    assert out[1]["coded"] is False
    assert out[1]["word_dist"] is None and out[1]["wer"] is None
    assert out[1]["cer"] is not None  # char path unaffected


def test_summary_pools(spark):
    df = spark.createDataFrame(
        [
            (1, "a b", "a c"),  # 1 word edit / 2 ref words
            (2, "x y z", "x y z"),  # 0 / 3
            (3, "", "k"),  # excluded from both pools (no ref)
            (4, " ".join(f"u{i}" for i in range(95)), "u0"),  # uncodable
        ],
        ["doc_id", "ref_text", "hyp_text"],
    )
    row = cer_wer_summary(cer_wer(df)).collect()[0].asDict()
    assert row["n_rows"] == 4
    assert row["n_coded"] == 2 and row["n_uncoded"] == 1
    assert row["word_dist_total"] == 1 and row["ref_words_total"] == 5
    assert row["corpus_wer"] == pytest.approx(0.2)
    assert row["corpus_cer"] is not None


def test_partitioning_invariance(spark):
    rows = [
        (i, f"a b c w{i} d", f"a x c w{i}")
        for i in range(40)
    ]
    df1 = spark.createDataFrame(rows, ["doc_id", "ref_text", "hyp_text"])
    a = cer_wer(df1.repartition(1)).collect()
    b = cer_wer(df1.repartition(7)).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
