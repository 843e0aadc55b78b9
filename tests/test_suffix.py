"""Exact duplicated-span detection (operators/suffix.py) vs a pure-Python
brute-force reference: prefix-doubling window keys must behave exactly like
comparing raw window contents, for power-of-two and odd window lengths."""

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.operators.suffix import (
    exact_span_profile,
    remove_exact_spans,
    window_keys_col,
)


def _toks(txt):
    return [t for t in (txt or "").lower().split() if t]


def _ref_profile(rows, L, min_docs=2):
    wins = {
        i: {tuple(ts[s : s + L]) for s in range(len(ts) - L + 1)}
        for i, ts in ((i, _toks(t)) for i, t in rows)
    }
    cnt = Counter(w for ws in wins.values() for w in ws)
    return {
        i: (len(ws), sum(1 for w in ws if cnt[w] >= min_docs))
        for i, ws in wins.items()
        if ws
    }


def _ref_remove(rows, L, min_docs=2):
    lower = {i: _toks(t) for i, t in rows}
    raw = {i: (t2 or "").split() for i, t2 in rows}
    cnt = Counter(
        w
        for ts in lower.values()
        for w in {tuple(ts[s : s + L]) for s in range(len(ts) - L + 1)}
    )
    out = {}
    for i, ts in lower.items():
        rem = set()
        for s in range(len(ts) - L + 1):
            if cnt[tuple(ts[s : s + L])] >= min_docs:
                rem.update(range(s, s + L))
        kept = [raw[i][j] for j in range(len(ts)) if j not in rem]
        out[i] = (" ".join(kept), len(ts), len(ts) - len(kept))
    return out


def _corpus(seed=7, n_docs=24, vocab=14, max_len=40):
    """Small-vocab random corpus (forces natural window collisions) plus
    explicit shared passages and degenerate docs."""
    rng = random.Random(seed)
    words = [f"w{j}" for j in range(vocab)]
    shared = " ".join(rng.choice(words) for _ in range(19))
    rows = []
    for i in range(n_docs):
        body = " ".join(
            rng.choice(words) for _ in range(rng.randrange(0, max_len))
        )
        if i % 3 == 0:  # embed the shared passage mid-document
            body = body + " " + shared + " " + body
        rows.append((f"d{i}", body))
    rows.append(("empty", ""))
    rows.append(("null", None))
    rows.append(("short", "one two three"))
    rows.append(("CASE", "Alpha BETA " + shared.upper() + " Tail"))
    return rows


@pytest.mark.parametrize("L", [1, 5, 8, 13, 16])
def test_profile_matches_bruteforce(spark, L):
    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"])
        for r in exact_span_profile(df, min_len=L).collect()
    }
    assert got == _ref_profile(rows, L)


@pytest.mark.parametrize("L", [5, 8, 16])
def test_remove_matches_bruteforce(spark, L):
    rows = _corpus(seed=11)
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        r["doc_id"]: (
            r["text_clean"],
            r["n_tokens"],
            r["n_removed_tokens"],
        )
        for r in remove_exact_spans(df, min_len=L).collect()
    }
    ref = _ref_remove(rows, L)
    assert set(got) == {i for i, _ in rows}  # every input doc reports
    for i in ref:
        assert got[i] == ref[i], i


def test_keys_are_content_exact(spark):
    # md5-per-token at round 0 prevents concat ambiguity: ("ab","c") and
    # ("a","bc") must NOT share a window key even though the joined text
    # is identical
    df = spark.createDataFrame(
        [("x", "ab c ab c"), ("y", "a bc a bc")],
        "doc_id string, text string",
    )
    prof = {
        r["doc_id"]: r["n_dup_windows"]
        for r in exact_span_profile(df, min_len=2).collect()
    }
    assert prof == {"x": 0, "y": 0}


def test_keys_align_across_documents(spark):
    toks = F.split(F.lit("p q r s t u v w"), " ")
    keys = spark.range(1).select(
        window_keys_col(toks, 3).alias("k")
    ).collect()[0]["k"]
    assert len(keys) == 6  # 8 - 3 + 1 windows
    assert len(set(keys)) == 6  # all windows distinct => all keys distinct
    toks2 = F.split(F.lit("z z r s t z z z"), " ")
    keys2 = spark.range(1).select(
        window_keys_col(toks2, 3).alias("k")
    ).collect()[0]["k"]
    # the shared window "r s t" (start 3 in both) yields the SAME key
    assert keys[2] == keys2[2]
    assert keys[0] != keys2[0]


def test_degenerate_all_duplicate_corpus(spark):
    # 200 copies of one 64-token doc: group-count design means no pair
    # explosion — profile is tiny and the cut removes every token
    body = " ".join(f"t{i % 9}" for i in range(64))
    df = spark.createDataFrame(
        [(f"c{i}", body) for i in range(200)], "doc_id string, text string"
    )
    prof = exact_span_profile(df, min_len=16).collect()
    assert len(prof) == 200
    assert all(
        r["n_dup_windows"] == r["n_windows"] and r["dup_window_frac"] == 1.0
        for r in prof
    )
    cut = remove_exact_spans(df, min_len=16).limit(5).collect()
    assert all(
        r["text_clean"] == "" and r["n_removed_tokens"] == 64 for r in cut
    )
