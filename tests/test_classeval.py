"""Tests for the classifier/score evaluation band
(operators/classeval.py): confusion P/R/F1, exact ROC-AUC, calibration
bins + ECE — pinned against hand computations and brute-force
references."""

import math

import pytest

from invoice_ocr_reconciler_spark.operators.classeval import (
    MACRO,
    MICRO,
    calibration_bins,
    confusion_eval,
    roc_auc,
)


def _rows(df):
    return {r["label"]: r.asDict() for r in df.collect()}


def test_confusion_multiclass_hand_checked(spark):
    # gold: a a a b b c   pred: a a b b c c
    data = [("a", "a"), ("a", "a"), ("a", "b"),
            ("b", "b"), ("b", "c"), ("c", "c")]
    df = spark.createDataFrame(data, "gold string, pred string")
    out = _rows(confusion_eval(df))
    a, b, c = out["a"], out["b"], out["c"]
    assert (a["tp"], a["fp"], a["fn"], a["support"]) == (2, 0, 1, 3)
    assert (b["tp"], b["fp"], b["fn"], b["support"]) == (1, 1, 1, 2)
    assert (c["tp"], c["fp"], c["fn"], c["support"]) == (1, 1, 0, 1)
    assert a["precision"] == 1.0 and a["recall"] == pytest.approx(2 / 3)
    assert a["f1"] == pytest.approx(4 / 5)  # 2*2/(4+0+1)
    assert b["precision"] == 0.5 and b["recall"] == 0.5 and b["f1"] == 0.5
    assert c["precision"] == 0.5 and c["recall"] == 1.0
    assert c["f1"] == pytest.approx(2 / 3)
    micro = out[MICRO]
    # single-label multiclass: micro P = R = F1 = accuracy = 4/6
    assert micro["tp"] == 4 and micro["fp"] == 2 and micro["fn"] == 2
    assert micro["precision"] == pytest.approx(4 / 6)
    assert micro["recall"] == pytest.approx(4 / 6)
    assert micro["f1"] == pytest.approx(4 / 6)
    macro = out[MACRO]
    assert macro["support"] == 3  # n_classes
    assert macro["precision"] == pytest.approx(2 / 3, abs=1e-8)
    assert macro["recall"] == pytest.approx((2 / 3 + 0.5 + 1) / 3, abs=1e-8)
    assert macro["f1"] == pytest.approx((0.8 + 0.5 + 2 / 3) / 3, abs=1e-8)


def test_confusion_one_sided_classes_and_nulls(spark):
    # 'd' appears only in pred (precision 0/…, recall NULL->support 0);
    # 'e' appears only in gold (no predictions: precision NULL,
    # zero_division=0 in the macro). NULL rows are dropped.
    data = [("a", "a"), ("e", "d"), (None, "a"), ("a", None)]
    df = spark.createDataFrame(data, "gold string, pred string")
    out = _rows(confusion_eval(df))
    assert set(out) == {"a", "d", "e", MICRO, MACRO}
    d, e = out["d"], out["e"]
    assert (d["tp"], d["fp"], d["fn"], d["support"]) == (0, 1, 0, 0)
    assert d["precision"] == 0.0 and d["recall"] is None
    assert (e["tp"], e["fp"], e["fn"], e["support"]) == (0, 0, 1, 1)
    assert e["precision"] is None and e["recall"] == 0.0
    # macro with zero_division=0: precisions (1, 0, 0)/3
    assert out[MACRO]["precision"] == pytest.approx(1 / 3, abs=1e-8)


def _brute_auc(pairs):
    pos = [s for y, s in pairs if y]
    neg = [s for y, s in pairs if not y]
    num = sum(
        1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg
    )
    return num / (len(pos) * len(neg))


def test_roc_auc_matches_brute_force_with_ties(spark):
    pairs = [(1, 5), (1, 3), (1, 3), (0, 3), (0, 2), (1, 2),
             (0, 1), (0, 5), (1, 9), (0, 0)]
    df = spark.createDataFrame(
        [(y, float(s)) for y, s in pairs], "label int, score double"
    )
    row = roc_auc(df).collect()[0]
    assert row["n_pos"] == 5 and row["n_neg"] == 5
    assert row["auc_den2"] == 2 * 25
    assert row["auc"] == pytest.approx(_brute_auc(pairs), abs=1e-12)
    # exact integer numerator identity: auc = num2 / den2
    assert row["auc_num2"] / row["auc_den2"] == pytest.approx(row["auc"])


def test_roc_auc_perfect_random_and_degenerate(spark):
    perfect = spark.createDataFrame(
        [(1, 10.0), (1, 9.0), (0, 2.0), (0, 1.0)], "label int, score double"
    )
    assert roc_auc(perfect).collect()[0]["auc"] == 1.0
    all_tied = spark.createDataFrame(
        [(1, 5.0), (0, 5.0), (1, 5.0), (0, 5.0)], "label int, score double"
    )
    assert roc_auc(all_tied).collect()[0]["auc"] == 0.5
    one_class = spark.createDataFrame(
        [(1, 1.0), (1, 2.0)], "label int, score double"
    )
    r = roc_auc(one_class).collect()[0]
    assert r["n_neg"] == 0 and r["auc"] is None


def test_roc_auc_grouped(spark):
    df = spark.createDataFrame(
        [("g1", 1, 2.0), ("g1", 0, 1.0),  # perfect in g1
         ("g2", 1, 1.0), ("g2", 0, 2.0)],  # inverted in g2
        "grp string, label int, score double",
    )
    out = {r["grp"]: r["auc"] for r in roc_auc(df, group_cols=("grp",)).collect()}
    assert out == {"g1": 1.0, "g2": 0.0}


def test_calibration_bins_and_ece(spark):
    # bin 0: probs .05/.05 labels 0,1 -> conf .05, acc .5
    # bin 9: probs .95/1.0 labels 1,1 -> right edge 1.0 joins bin 9
    data = [(0.05, 0), (0.05, 1), (0.95, 1), (1.0, 1),
            (None, 1), (0.5, None), (1.5, 0)]  # dropped rows
    df = spark.createDataFrame(data, "prob double, label int")
    rows = {r["bin"]: r.asDict() for r in calibration_bins(df).collect()}
    assert set(rows) == {-1, 0, 9}
    b0, b9, tot = rows[0], rows[9], rows[-1]
    assert b0["n"] == 2 and b0["n_pos"] == 1
    assert b0["confidence"] == pytest.approx(0.05, abs=1e-9)
    assert b0["accuracy"] == 0.5
    assert b0["calib_gap"] == pytest.approx(0.45, abs=1e-9)
    assert b9["n"] == 2 and b9["n_pos"] == 2
    assert b9["confidence"] == pytest.approx(0.975, abs=1e-9)
    assert b9["accuracy"] == 1.0
    assert b9["calib_gap"] == pytest.approx(0.025, abs=1e-9)
    # ECE = (2/4)*0.45 + (2/4)*0.025
    assert tot["n"] == 4
    assert tot["calib_gap"] == pytest.approx(0.2375, abs=1e-9)
    # TOTAL pools per-bin gaps, not the marginal gap
    assert tot["gap_nanos"] == b0["gap_nanos"] + b9["gap_nanos"]


def test_calibration_perfectly_calibrated_bin(spark):
    # 4 rows at p=0.75, 3 positive -> |sum_p - n_pos| = |3.0 - 3| = 0
    df = spark.createDataFrame(
        [(0.75, 1), (0.75, 1), (0.75, 1), (0.75, 0)], "prob double, label int"
    )
    rows = {r["bin"]: r.asDict() for r in calibration_bins(df).collect()}
    assert rows[7]["gap_nanos"] == 0 and rows[-1]["calib_gap"] == 0.0
    with pytest.raises(ValueError):
        calibration_bins(df, n_bins=0)


def test_spearman_perfect_inverse_and_ties(spark):
    from invoice_ocr_reconciler_spark.operators.profile import spearman_corr

    mono = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 25), (4, 99)], "x long, y long"
    )
    assert spearman_corr(mono, "x", "y").collect()[0]["rho"] == pytest.approx(
        1.0
    )
    inv = spark.createDataFrame(
        [(1, 9), (2, 7), (3, 5), (4, 2)], "x long, y long"
    )
    assert spearman_corr(inv, "x", "y").collect()[0][
        "rho"
    ] == pytest.approx(-1.0)
    # tie-averaged ranks vs scipy-style hand computation:
    # x = 1,2,2,4 -> ranks 1, 2.5, 2.5, 4 ; y = 1,2,3,4 -> 1..4
    tied = spark.createDataFrame(
        [(1, 1), (2, 2), (2, 3), (4, 4)], "x long, y long"
    )
    rx = [1.0, 2.5, 2.5, 4.0]
    ry = [1.0, 2.0, 3.0, 4.0]
    n = 4
    mx, my = sum(rx) / n, sum(ry) / n
    cov = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    expect = cov / math.sqrt(
        sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
    )
    got = spearman_corr(tied, "x", "y").collect()[0]
    assert got["rho"] == pytest.approx(expect, abs=1e-12)
    # doubled-rank pools are exact integers: sx2 = 2*sum(rank) = n(n+1)
    assert got["sx2"] == 2 * sum(rx) and got["sy2"] == 2 * sum(ry)


def test_spearman_constant_side_and_groups(spark):
    from invoice_ocr_reconciler_spark.operators.profile import spearman_corr

    const = spark.createDataFrame(
        [(5, 1), (5, 2), (5, 3)], "x long, y long"
    )
    assert spearman_corr(const, "x", "y").collect()[0]["rho"] is None
    grouped = spark.createDataFrame(
        [("a", 1, 1), ("a", 2, 2), ("a", 3, 3),
         ("b", 1, 3), ("b", 2, 2), ("b", 3, 1)],
        "g string, x long, y long",
    )
    out = {
        r["g"]: r["rho"]
        for r in spearman_corr(grouped, "x", "y", group_cols=("g",)).collect()
    }
    assert out["a"] == pytest.approx(1.0)
    assert out["b"] == pytest.approx(-1.0)
