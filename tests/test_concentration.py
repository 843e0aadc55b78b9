"""Concentration metrics (operators/profile.py:concentration_metrics)."""

from invoice_ocr_reconciler_spark.operators.profile import (
    concentration_metrics,
)


def _run(spark, counts, **kw):
    rows = []
    for g, n in counts.items():
        rows += [(g,)] * n
    df = spark.createDataFrame(rows, "source string")
    return concentration_metrics(df, **kw).collect()[0]


def test_uniform_distribution(spark):
    r = _run(spark, {"a": 10, "b": 10, "c": 10, "d": 10})
    assert r.hhi == 0.25          # 4 * (1/4)^2
    assert r.gini == 0.0
    assert r.top1_share == 0.25


def test_monopoly(spark):
    r = _run(spark, {"a": 100})
    assert (r.n_groups, r.hhi, r.gini, r.top1_share) == (1, 1.0, 0.0, 1.0)


def test_skewed_hand_computed(spark):
    # counts 1, 3: N=4, G=2; hhi = (1+9)/16; ranks asc: (1->1, 3->2)
    # gini = (1*2 + 3*4 - 3*4) / (2*4) = 2/8 = 0.25
    r = _run(spark, {"a": 3, "b": 1})
    assert r.hhi == 0.625
    assert r.gini == 0.25
    assert r.top1_share == 0.75
    assert r.top10_share == 1.0


def test_tie_order_does_not_change_gini(spark):
    # two tied groups + one big: tied ranks are consecutive; swapping
    # them cannot change the sum (pinned by equality across key renames)
    a = _run(spark, {"a": 5, "b": 5, "z": 20})
    b = _run(spark, {"z": 5, "a": 5, "b": 20})
    assert a.gini == b.gini and a.hhi == b.hhi
