"""Chao1 richness + event transition matrix."""

import datetime as dt

from invoice_ocr_reconciler_spark.operators.events import event_transitions
from invoice_ocr_reconciler_spark.operators.profile import chao_richness


def test_chao1_hand_computed(spark):
    # counts: a=3, b=2, c=2, d=1 -> V=4, N=8, N1=1, N2=2
    docs = spark.createDataFrame(
        [("a a a b b c",), ("c d",)], "text string"
    )
    r = chao_richness(docs).collect()[0]
    assert (r.v_obs, r.n_tok, r.n1, r.n2) == (4, 8, 1, 2)
    # chao1 = 4 + 1*0/(2*3) = 4.0 ; coverage = 1 - 1/8
    assert r.chao1 == 4.0
    assert r.coverage == 0.875


def test_chao1_singleton_heavy(spark):
    # all singletons: V=3, N1=3, N2=0 -> chao1 = 3 + 3*2/2 = 6.0
    docs = spark.createDataFrame([("x y z",)], "text string")
    r = chao_richness(docs).collect()[0]
    assert r.chao1 == 6.0 and r.coverage == 0.0


def test_transitions_counts_and_probs(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: a -> b -> a ; user 2: a -> b
        (1, 1, t0, "a"),
        (2, 1, t0 + dt.timedelta(minutes=1), "b"),
        (3, 1, t0 + dt.timedelta(minutes=2), "a"),
        (4, 2, t0, "a"),
        (5, 2, t0 + dt.timedelta(minutes=1), "b"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, event_type string"
    )
    got = {
        (r.from_type, r.to_type): (r.n, r.n_from, r.p)
        for r in event_transitions(ev).collect()
    }
    assert got == {
        ("a", "b"): (2, 2, 1.0),
        ("b", "a"): (1, 1, 1.0),
    }


def test_transitions_no_cross_user_leak(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, t0, "a"),
        (2, 2, t0 + dt.timedelta(minutes=1), "b"),  # different user
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, event_type string"
    )
    assert event_transitions(ev).count() == 0


def test_cm_inner_product_upper_bound_and_exactness(spark):
    from invoice_ocr_reconciler_spark.operators.cmsketch import (
        build_cm_sketch,
        cm_inner_product,
    )

    a = spark.createDataFrame(
        [("k1",)] * 3 + [("k2",)] * 2 + [("k9",)], "term string"
    )
    b = spark.createDataFrame(
        [("k1",)] * 4 + [("k2",)] * 1 + [("k7",)] * 5, "term string"
    )
    # true inner product = 3*4 + 2*1 = 14; with a huge width there are
    # no collisions so the estimate is EXACT
    est = cm_inner_product(
        build_cm_sketch(a, width=1 << 20),
        build_cm_sketch(b, width=1 << 20),
    ).collect()[0].est
    assert est == 14
    # tiny width forces collisions: still an upper bound, never below
    est_small = cm_inner_product(
        build_cm_sketch(a, width=2), build_cm_sketch(b, width=2)
    ).collect()[0].est
    assert est_small >= 14


def test_cm_inner_product_disjoint_keys_zero_not_null(spark):
    """Sparse-sketch semantics: with disjoint key sets and a width large
    enough to avoid collisions, NO (row,bucket) pair joins — the row spine
    must force est = 0 (a collision-free hash row proves the true inner
    product is 0), never NULL or a loose min over a row subset."""
    from invoice_ocr_reconciler_spark.operators.cmsketch import (
        build_cm_sketch,
        cm_inner_product,
    )

    a = spark.createDataFrame([("k1",), ("k2",)], "term string")
    b = spark.createDataFrame([("k8",), ("k9",)], "term string")
    est = cm_inner_product(
        build_cm_sketch(a, width=1 << 20),
        build_cm_sketch(b, width=1 << 20),
    ).collect()[0].est
    assert est == 0


def test_cm_inner_product_config_mismatch_raises(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    from invoice_ocr_reconciler_spark.operators.cmsketch import (
        build_cm_sketch,
        cm_inner_product,
    )

    a = spark.createDataFrame([("k1",)], "term string")
    with pytest.raises((Py4JJavaError, PySparkException, Exception)):
        cm_inner_product(
            build_cm_sketch(a, width=64), build_cm_sketch(a, width=128)
        ).collect()


def test_dispersion_index_hand_computed(spark):
    import datetime as dt

    from invoice_ocr_reconciler_spark.operators.events import (
        dispersion_index,
    )

    t0 = dt.datetime(2024, 1, 1, 12)
    rows = []
    eid = 0
    # user 1: 4 events on one day, span 4 days -> bursty
    for _ in range(4):
        rows.append((eid, 1, t0)); eid += 1
    # user 2: 1 event per day over all 4 days -> metronomic
    for k in range(4):
        rows.append((eid, 2, t0 + dt.timedelta(days=k))); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz"
    )
    got = {r.user_id: r for r in dispersion_index(ev).collect()}
    # user1: sx=4, sxx=16, N=4 -> fano = (64-16)/16 = 3.0
    assert got[1].fano == 3.0 and got[1].active_days == 1
    # user2: sx=4, sxx=4, N=4 -> fano = (16-16)/16 = 0.0
    assert got[2].fano == 0.0 and got[2].active_days == 4
    assert got[1].mean_per_day == 1.0 == got[2].mean_per_day
