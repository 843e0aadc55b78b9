"""Unit tests for operators/preference.py:dpo_pairs."""

import pytest

from invoice_ocr_reconciler_spark.operators.preference import dpo_pairs


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, ["prompt_id", "completion_id", "score"]
    )


def _collect(df):
    return [r.asDict() for r in df.collect()]


def test_basic_pairing_best_with_worst(spark):
    rows = [(1, f"c{i}", float(s)) for i, s in enumerate([10, 40, 20, 30])]
    out = _collect(dpo_pairs(_mk(spark, rows), max_pairs=3, min_margin=0.0))
    # n=4 -> floor(n/2)=2 pairs: (c1=40, c0=10), (c3=30, c2=20)
    assert len(out) == 2
    assert out[0]["chosen_id"] == "c1" and out[0]["rejected_id"] == "c0"
    assert out[0]["margin"] == 30.0 and out[0]["pair_rank"] == 1
    assert out[1]["chosen_id"] == "c3" and out[1]["rejected_id"] == "c2"
    assert out[1]["margin"] == 10.0 and out[1]["n_completions"] == 4


def test_odd_count_median_left_out(spark):
    rows = [(1, f"c{i}", float(i)) for i in range(5)]  # scores 0..4
    out = _collect(dpo_pairs(_mk(spark, rows), max_pairs=5, min_margin=0.0))
    # floor(5/2)=2 pairs; median c2 appears nowhere
    assert len(out) == 2
    used = {o["chosen_id"] for o in out} | {o["rejected_id"] for o in out}
    assert "c2" not in used and len(used) == 4


def test_single_completion_yields_nothing(spark):
    out = _collect(dpo_pairs(_mk(spark, [(1, "c0", 5.0)])))
    assert out == []


def test_min_margin_filters(spark):
    rows = [(1, "a", 100.0), (1, "b", 90.0), (1, "c", 10.0), (1, "d", 5.0)]
    out = _collect(dpo_pairs(_mk(spark, rows), max_pairs=2, min_margin=50.0))
    # pair1 (a,d) margin 95 kept; pair2 (b,c) margin 80 kept
    assert len(out) == 2
    out = _collect(dpo_pairs(_mk(spark, rows), max_pairs=2, min_margin=90.0))
    assert len(out) == 1 and out[0]["chosen_id"] == "a"


def test_max_pairs_cap(spark):
    rows = [(1, f"c{i}", float(i)) for i in range(10)]
    out = _collect(dpo_pairs(_mk(spark, rows), max_pairs=2, min_margin=0.0))
    assert len(out) == 2  # capped below floor(10/2)=5


def test_tie_break_mirror_determinism(spark):
    # all scores equal: best order c0,c1,c2,c3 (id asc), worst order
    # c3,c2,c1,c0 (id desc) -> pairs (c0,c3), (c1,c2), margins 0
    rows = [(1, f"c{i}", 7.0) for i in range(4)]
    out = _collect(dpo_pairs(_mk(spark, rows), max_pairs=4, min_margin=0.0))
    assert [(o["chosen_id"], o["rejected_id"]) for o in out] == [
        ("c0", "c3"),
        ("c1", "c2"),
    ]


def test_duplicates_collapse_max_score(spark):
    rows = [(1, "a", 1.0), (1, "a", 9.0), (1, "b", 2.0)]
    out = _collect(dpo_pairs(_mk(spark, rows)))
    assert len(out) == 1
    assert out[0]["chosen_id"] == "a" and out[0]["chosen_score"] == 9.0
    assert out[0]["n_completions"] == 2


def test_bad_max_pairs_raises():
    with pytest.raises(ValueError):
        dpo_pairs(None, max_pairs=0)


def test_partitioning_invariance(spark):
    rows = [
        (p, f"c{i}", float((p * 13 + i * 7) % 23))
        for p in range(20)
        for i in range(6)
    ]
    df = _mk(spark, rows)
    a = _collect(dpo_pairs(df.repartition(1), max_pairs=3, min_margin=2.0))
    b = _collect(dpo_pairs(df.repartition(9), max_pairs=3, min_margin=2.0))
    assert a == b and len(a) > 0
