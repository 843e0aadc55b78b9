"""Unit tests for operators/ireval.py (P@k/R@k/MRR/MAP@k/nDCG@k).

Hand-computed fixtures pin every metric; the lcm/discount exactness
contracts are asserted directly (AP addends integral, discounts match
the driver-side literals)."""

import math

import pytest

from invoice_ocr_reconciler_spark.operators.ireval import (
    _AP_LCM,
    _discounts,
    ir_metrics,
    ir_metrics_macro,
)


def _mk(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def _by_q(df):
    return {r["query_id"]: r.asDict() for r in df.collect()}


def test_hand_computed_single_query(spark):
    # ranks by score desc: d1(9) d2(8) d3(7) d4(6); rel: d1=2, d3=1, d9=1
    runs = _mk(
        spark,
        [(1, "d1", 9.0), (1, "d2", 8.0), (1, "d3", 7.0), (1, "d4", 6.0)],
        ["query_id", "doc_id", "score"],
    )
    qrels = _mk(
        spark,
        [(1, "d1", 2), (1, "d3", 1), (1, "d9", 1)],
        ["query_id", "doc_id", "rel"],
    )
    m = _by_q(ir_metrics(runs, qrels, k=10))[1]
    assert m["n_ret"] == 4 and m["n_rel"] == 3 and m["hits"] == 2
    assert m["precision_k"] == pytest.approx(2 / 10)
    assert m["recall_k"] == pytest.approx(2 / 3)
    assert m["rr"] == pytest.approx(1.0)
    # AP@10 = (1/1 + 2/3) / min(3, 10) = (5/3)/3 = 5/9 — exactly, via lcm
    assert m["ap_k"] == pytest.approx(5 / 9, abs=0)
    d = _discounts(10)
    dcg = 3 * d[0] + 1 * d[2]  # gain 2^2-1 at rank1, 2^1-1 at rank3
    idcg = 3 * d[0] + 1 * d[1] + 1 * d[2]  # ideal: rel 2,1,1
    assert m["dcg_scaled"] == dcg and m["idcg_scaled"] == idcg
    assert m["ndcg_k"] == pytest.approx(dcg / idcg, abs=0)


def test_no_relevant_hit_and_unjudged_query(spark):
    runs = _mk(
        spark,
        [(1, "a", 2.0), (1, "b", 1.0), (2, "a", 1.0)],
        ["query_id", "doc_id", "score"],
    )
    qrels = _mk(spark, [(1, "z", 1)], ["query_id", "doc_id", "rel"])
    out = _by_q(ir_metrics(runs, qrels, k=10))
    q1 = out[1]
    assert q1["hits"] == 0 and q1["rr"] is None
    assert q1["ap_k"] == 0.0 and q1["recall_k"] == 0.0
    assert q1["ndcg_k"] == 0.0  # idcg > 0, dcg 0
    q2 = out[2]  # retrieved but never judged: no evidence -> NULLs
    assert q2["n_rel"] == 0
    assert q2["recall_k"] is None and q2["ap_k"] is None
    assert q2["ndcg_k"] is None and q2["rr"] is None
    assert q2["precision_k"] == 0.0


def test_qrels_only_query_gets_zero_row(spark):
    runs = _mk(spark, [(1, "a", 1.0)], ["query_id", "doc_id", "score"])
    qrels = _mk(
        spark, [(7, "x", 1), (7, "y", 2)], ["query_id", "doc_id", "rel"]
    )
    q7 = _by_q(ir_metrics(runs, qrels, k=10))[7]
    assert q7["n_ret"] == 0 and q7["hits"] == 0
    assert q7["recall_k"] == 0.0 and q7["ap_k"] == 0.0
    assert q7["ndcg_k"] == 0.0 and q7["idcg_scaled"] > 0


def test_rank_cutoff_and_tiebreak(spark):
    # 12 docs, equal scores -> doc_id asc is the order; rel doc 'd11'
    # sits outside k=10 so it must not count
    runs = _mk(
        spark,
        [(1, f"d{i:02d}", 5.0) for i in range(12)],
        ["query_id", "doc_id", "score"],
    )
    qrels = _mk(
        spark, [(1, "d11", 3), (1, "d00", 1)], ["query_id", "doc_id", "rel"]
    )
    m = _by_q(ir_metrics(runs, qrels, k=10))[1]
    assert m["n_ret"] == 10 and m["hits"] == 1
    assert m["rr"] == pytest.approx(1.0)
    # idcg counts BOTH rels (ideal ranking ignores the run)
    d = _discounts(10)
    assert m["idcg_scaled"] == 7 * d[0] + 1 * d[1]
    assert m["dcg_scaled"] == 1 * d[0]


def test_duplicates_collapse_max(spark):
    runs = _mk(
        spark,
        [(1, "a", 1.0), (1, "a", 9.0), (1, "b", 5.0)],
        ["query_id", "doc_id", "score"],
    )
    qrels = _mk(
        spark, [(1, "b", 1), (1, "b", 2)], ["query_id", "doc_id", "rel"]
    )
    m = _by_q(ir_metrics(runs, qrels, k=10))[1]
    assert m["n_ret"] == 2  # duplicate run row collapsed
    d = _discounts(10)
    assert m["dcg_scaled"] == 3 * d[1]  # max rel=2 at rank 2


def test_ap_lcm_exact_for_all_ranks():
    for r in range(1, 11):
        assert _AP_LCM % r == 0
    want = [int(math.floor(1e12 / math.log2(r + 1) + 0.5)) for r in range(1, 11)]
    assert _discounts(10) == want
    assert _discounts(10)[0] == 10**12  # rank 1: 1/log2(2) = 1


def test_k_bounds():
    with pytest.raises(ValueError):
        ir_metrics(None, None, k=11)
    with pytest.raises(ValueError):
        ir_metrics(None, None, k=0)


def test_macro_rollup_nanos_mean(spark):
    runs = _mk(
        spark,
        [(1, "a", 2.0), (1, "b", 1.0), (2, "x", 2.0)],
        ["query_id", "doc_id", "score"],
    )
    qrels = _mk(
        spark, [(1, "a", 1), (2, "y", 1)], ["query_id", "doc_id", "rel"]
    )
    per_q = ir_metrics(runs, qrels, k=10)
    row = ir_metrics_macro(per_q, k=10).collect()[0].asDict()
    assert row["n_queries"] == 2 and row["k"] == 10
    # q1: P=0.1 R=1 RR=1 AP=1 nDCG=1 ; q2: P=0 R=0 RR NULL AP=0 nDCG=0
    assert row["mean_precision_k"] == pytest.approx(0.05)
    assert row["mean_recall_k"] == pytest.approx(0.5)
    assert row["mrr"] == pytest.approx(1.0)  # only defined for q1
    assert row["map_k"] == pytest.approx(0.5)
    assert row["mean_ndcg_k"] == pytest.approx(0.5)


def test_partitioning_invariance(spark):
    import pyspark.sql.functions as F

    rows = [
        (q, f"d{i}", float((q * 7 + i * 13) % 11))
        for q in range(4)
        for i in range(30)
    ]
    rels = [
        (q, f"d{i}", 1 + (q + i) % 3)
        for q in range(4)
        for i in range(0, 30, 4)
    ]
    runs = _mk(spark, rows, ["query_id", "doc_id", "score"])
    qrels = _mk(spark, rels, ["query_id", "doc_id", "rel"])
    a = ir_metrics(runs.repartition(1), qrels.repartition(1), k=10)
    b = ir_metrics(runs.repartition(7), qrels.repartition(5), k=10)
    assert [r.asDict() for r in a.collect()] == [
        r.asDict() for r in b.collect()
    ]
    assert a.where(F.col("ndcg_k") > 1.0).count() == 0
