"""Unit tests for operators/clustereval.py (pairwise / ARI / B-cubed)."""

from itertools import combinations

import pytest

from invoice_ocr_reconciler_spark.operators.clustereval import cluster_eval


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, ["item_id", "pred_cluster", "gold_cluster"]
    )


def _row(spark, rows):
    return cluster_eval(_mk(spark, rows)).collect()[0].asDict()


def _py_pairwise(rows):
    tp = p = g = 0
    for (_, pa, ga), (_, pb, gb) in combinations(rows, 2):
        sp, sg = pa == pb, ga == gb
        p += sp
        g += sg
        tp += sp and sg
    return tp, p, g


def test_identical_clusterings_perfect(spark):
    rows = [(i, f"c{i % 3}", f"c{i % 3}") for i in range(12)]
    r = _row(spark, rows)
    assert r["pair_precision"] == 1.0 and r["pair_recall"] == 1.0
    assert r["pair_f1"] == 1.0 and r["ari"] == 1.0
    assert r["bcubed_precision"] == 1.0 and r["bcubed_f1"] == 1.0


def test_matches_python_pairwise_reference(spark):
    rows = [
        (i, f"p{(i * 7) % 4}", f"g{(i * 3) % 5}") for i in range(40)
    ]
    r = _row(spark, rows)
    tp, p, g = _py_pairwise(rows)
    assert (r["tp_pairs"], r["pred_pairs"], r["gold_pairs"]) == (tp, p, g)
    assert r["pair_f1"] == pytest.approx(2 * tp / (p + g), abs=0)


def test_ari_matches_sklearn_formula(spark):
    # hand case from Hubert & Arabie style examples
    rows = (
        [(i, "a", "x") for i in range(0, 3)]
        + [(i, "a", "y") for i in range(3, 5)]
        + [(i, "b", "x") for i in range(5, 6)]
        + [(i, "b", "y") for i in range(6, 10)]
    )
    r = _row(spark, rows)
    tp, p, g = _py_pairwise(rows)
    n = len(rows)
    cn2 = n * (n - 1) // 2
    num = 2 * (cn2 * tp - p * g)
    den = cn2 * (p + g) - 2 * p * g
    assert (r["ari_num"], r["ari_den"]) == (num, den)
    assert r["ari"] == pytest.approx(num / den, abs=0)


def test_all_singletons_pred_ari_defined_cases(spark):
    # pred all singletons vs gold one cluster: P=0, TP=0 -> precision
    # NULL, recall 0; ARI denominator = cn2*G > 0 -> ari = -... finite
    rows = [(i, f"s{i}", "one") for i in range(6)]
    r = _row(spark, rows)
    assert r["pair_precision"] is None and r["pair_recall"] == 0.0
    assert r["ari"] is not None
    # both sides all singletons: P=G=0 -> ARI undefined (0/0) -> NULL
    rows2 = [(i, f"s{i}", f"t{i}") for i in range(6)]
    r2 = _row(spark, rows2)
    assert r2["ari_den"] == 0 and r2["ari"] is None
    assert r2["bcubed_f1"] == 1.0  # every item alone in both = perfect


def test_bcubed_hand_computed(spark):
    # pred merges gold's {x,x,y}: bcubed precision per item:
    # items in pred 'a' with gold x: 2/3 each; gold y item: 1/3
    # recall: x items 2/2=1, y item 1/1=1
    rows = [(1, "a", "x"), (2, "a", "x"), (3, "a", "y")]
    r = _row(spark, rows)
    want_p = (2 / 3 + 2 / 3 + 1 / 3) / 3
    assert r["bcubed_precision"] == pytest.approx(want_p, abs=1e-9)
    assert r["bcubed_recall"] == 1.0


def test_null_assignments_dropped_and_counted(spark):
    rows = [(1, "a", "x"), (2, None, "x"), (3, "a", None), (4, "a", "x")]
    r = _row(spark, rows)
    assert r["n_items"] == 2 and r["n_dropped"] == 2
    assert r["pair_f1"] == 1.0


def test_duplicate_items_first_wins(spark):
    rows = [(1, "b", "x"), (1, "a", "x"), (2, "a", "x")]
    r = _row(spark, rows)
    assert r["n_items"] == 2  # min() picks 'a' for item 1
    assert r["pair_precision"] == 1.0


def test_empty_input(spark):
    df = spark.createDataFrame(
        [], "item_id long, pred_cluster string, gold_cluster string"
    )
    r = cluster_eval(df).collect()[0].asDict()
    assert r["n_items"] == 0 and r["ari"] is None
    assert r["pair_f1"] is None and r["bcubed_f1"] is None


def test_partitioning_invariance(spark):
    rows = [
        (i, f"p{(i * 11) % 6}", f"g{(i * 5) % 7}") for i in range(60)
    ]
    a = cluster_eval(_mk(spark, rows).repartition(1)).collect()[0].asDict()
    b = cluster_eval(_mk(spark, rows).repartition(9)).collect()[0].asDict()
    assert a == b
