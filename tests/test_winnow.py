"""Unit tests for operators/winnow.py (MOSS winnowing fingerprints)."""

import hashlib

import pytest

from invoice_ocr_reconciler_spark.operators.winnow import winnow_fingerprints


def _u60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_winnow(text: str, k: int, w: int):
    toks = [t for t in text.lower().split() if t]
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [_u60(g) for g in grams]
    if not hs:
        return set()
    picks = set()
    n_win = max(len(hs) - w + 1, 1)
    for j in range(n_win):
        s = hs[j : j + w]
        mv = min(s)
        # rightmost occurrence of the min
        idx = len(s) - 1 - s[::-1].index(mv)
        picks.add((j + idx + 1, mv))  # 1-based gram position
    return picks


def _spark_winnow(spark, text, k=5, w=4):
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    return {
        (r["pos"], r["fp"])
        for r in winnow_fingerprints(df, k=k, w=w).collect()
    }


def test_matches_python_reference(spark):
    texts = [
        "a b c d e f g h i j k l m n o p",
        "x y x y x y x y x y x y",
        "one two three four five six seven eight nine ten",
        "w w w w w w w w w w",  # all-equal hashes: rightmost rule bites
    ]
    for t in texts:
        assert _spark_winnow(spark, t) == _py_winnow(t, 5, 4), t


def test_local_match_guarantee(spark):
    # Theorem 1: a shared run of >= w + k - 1 tokens must share a pick.
    k, w = 5, 4
    shared = " ".join(f"s{i}" for i in range(k + w - 1))  # exactly w+k-1
    a = "pre1 pre2 pre3 " + shared + " tail1 tail2"
    b = "zz1 zz2 zz3 zz4 zz5 " + shared + " qq1"
    fa = {fp for _, fp in _spark_winnow(spark, a, k, w)}
    fb = {fp for _, fp in _spark_winnow(spark, b, k, w)}
    assert fa & fb, "guaranteed shared fingerprint missing"


def test_short_doc_single_window(spark):
    # 6 tokens, k=5 -> 2 grams < w windows -> ONE whole-array window
    out = _spark_winnow(spark, "a b c d e f", 5, 4)
    assert len(out) == 1


def test_too_short_doc_empty(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, "")], ["doc_id", "text"]
    )
    assert winnow_fingerprints(df, k=5, w=4).count() == 0


def test_density_bound(spark):
    # expected density ~ 2/(w+1); assert the hard upper bound (every
    # window picks at most one new fingerprint) and a sane lower bound
    text = " ".join(f"t{(i * 17) % 101}" for i in range(300))
    picks = _spark_winnow(spark, text, 5, 4)
    n_grams = 300 - 5 + 1
    n_windows = n_grams - 4 + 1
    assert len(picks) <= n_windows
    assert len(picks) >= n_grams // 4  # >= 1 pick per w disjoint windows


def test_bad_params_raise():
    with pytest.raises(ValueError):
        winnow_fingerprints(None, k=0)
    with pytest.raises(ValueError):
        winnow_fingerprints(None, w=0)


def test_partitioning_invariance(spark):
    rows = [
        (i, " ".join(f"w{(i * 31 + j * 7) % 53}" for j in range(40)))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = winnow_fingerprints(df.repartition(1)).collect()
    b = winnow_fingerprints(df.repartition(8)).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
