"""RAKE keyphrases (operators/keyphrases.py) and count-min sketch
(operators/cmsketch.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.operators.cmsketch import (
    build_cm_sketch,
    cm_estimate,
    merge_cm_sketches,
)
from invoice_ocr_reconciler_spark.operators.keyphrases import (
    candidate_phrases,
    rake_keyphrases,
)

# --- RAKE ---------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_candidate_phrase_splitting(spark):
    df = _docs(
        spark,
        [(1, "Deep learning systems, and the deep learning pipeline.")],
    )
    got = {
        (r["phrase"], r["n_words"])
        for r in candidate_phrases(df).collect()
    }
    # stopwords ("and", "the") and punctuation both delimit
    assert ("deep learning systems", 3) in got
    assert ("deep learning pipeline", 3) in got
    assert not any("and" in p.split() for p, _ in got)


def test_rake_hand_scores(spark):
    # one doc, phrases: "deep learning" x2 and "rates" x1
    # freq: deep=2 learning=2 rates=1; deg: deep=4 learning=4 rates=1
    # score(deep)=score(learning)=2.0 -> phrase "deep learning" = 4.0
    # score(rates)=1.0
    df = _docs(spark, [(1, "deep learning and deep learning of rates")])
    out = {r["phrase"]: r for r in rake_keyphrases(df, top_k=5).collect()}
    assert out["deep learning"]["score_nanos"] == 4_000_000_000
    assert out["deep learning"]["n_occ"] == 2
    assert out["rates"]["score_nanos"] == 1_000_000_000
    assert out["deep learning"]["rank"] == 1


def test_rake_degree_rewards_longer_phrases(spark):
    # "alpha" appears alone and inside a 3-word phrase: its degree
    # evidence lifts the long phrase above an equally frequent loner
    df = _docs(
        spark,
        [
            (1, "alpha beta gamma. alpha. delta. delta."),
        ],
    )
    out = {r["phrase"]: r for r in rake_keyphrases(df, top_k=5).collect()}
    assert out["alpha beta gamma"]["rank"] == 1
    # deg(alpha)=4 freq=2 -> 2; deg(beta)=deg(gamma)=3 freq=1 -> 3 each
    assert out["alpha beta gamma"]["score_nanos"] == 8_000_000_000
    # deg(delta)=2 freq(delta)=2 -> score 1
    assert out["delta"]["score_nanos"] == 1_000_000_000


def test_rake_max_phrase_words_and_topk(spark):
    long_run = " ".join(f"tok{i}" for i in range(6))
    df = _docs(spark, [(1, f"{long_run}. one. two. three. four.")])
    out = rake_keyphrases(df, top_k=2).collect()
    assert len(out) == 2  # top_k bound
    assert all(r["n_words"] <= 4 for r in out)
    phrases = {
        r["phrase"] for r in rake_keyphrases(df, top_k=10).collect()
    }
    assert long_run not in phrases  # 6-word run capped away entirely


def test_rake_null_and_empty(spark):
    df = _docs(spark, [(1, None), (2, ""), (3, "the and of")])
    assert rake_keyphrases(df).count() == 0


# --- count-min ----------------------------------------------------------


def _terms(spark, words):
    return spark.createDataFrame([(w,) for w in words], "term string")


def test_cm_one_sided_bound_and_exactness(spark):
    words = [f"w{i % 50}" for i in range(500)] + ["rare"] * 3
    items = _terms(spark, words)
    sk = build_cm_sketch(items, depth=4, width=512)
    probes = _terms(spark, [f"w{i}" for i in range(50)] + ["rare", "absent"])
    est = {r["term"]: r["est"] for r in cm_estimate(sk, probes).collect()}
    exact = {f"w{i}": 10 for i in range(50)}
    exact["rare"] = 3
    exact["absent"] = 0
    for t, x in exact.items():
        assert est[t] >= x, t  # the one-sided guarantee
    # 51 distinct terms into 512 buckets x 4 rows: min over rows is
    # almost surely exact; require it for the bulk of the probes
    hits = sum(1 for t, x in exact.items() if est[t] == x)
    assert hits >= 45


def test_cm_merge_equals_whole(spark):
    words = [f"t{i % 20}" for i in range(200)]
    a = build_cm_sketch(_terms(spark, words[:90]))
    b = build_cm_sketch(_terms(spark, words[90:]))
    merged = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in merge_cm_sketches(a, b).collect()
    }
    whole = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in build_cm_sketch(_terms(spark, words)).collect()
    }
    assert merged == whole


def test_cm_weighted_and_guards(spark):
    items = spark.createDataFrame(
        [("x", 5), ("x", 2), ("y", 1)], "term string, w long"
    )
    sk = build_cm_sketch(items, weight_col="w")
    est = {
        r["term"]: r["est"]
        for r in cm_estimate(sk, _terms(spark, ["x", "y"])).collect()
    }
    assert est["x"] >= 7 and est["y"] >= 1
    with pytest.raises(ValueError):
        build_cm_sketch(items, depth=0)
    with pytest.raises(ValueError):
        merge_cm_sketches()
    # probing with a config that differs from the build stamp raises
    # instead of silently under-counting
    with pytest.raises(ValueError):
        cm_estimate(sk, _terms(spark, ["x"]), width=512)


def test_cm_sketch_bounded_and_null_terms(spark):
    items = spark.createDataFrame(
        [(None,), ("a",), ("b",)], "term string"
    )
    sk = build_cm_sketch(items, depth=4, width=512)
    rows = sk.collect()
    assert len(rows) <= 4 * 512
    assert sum(r["cnt"] for r in rows) == 2 * 4  # null excluded
