"""Kaplan–Meier survival + chi-square independence cells."""

from invoice_ocr_reconciler_spark.operators.profile import (
    chi2_independence,
    kaplan_meier,
)


def _km(spark, rows):
    df = spark.createDataFrame(rows, "duration long, event int")
    return {r.t: r for r in kaplan_meier(df).collect()}


def test_km_textbook_curve(spark):
    # classic: deaths at t=1 (1 of 4) and t=3 (1 of 2), censored at t=2
    got = _km(spark, [(1, 1), (2, 0), (3, 1), (3, 0)])
    assert (got[1].n_risk, got[1].d, got[1].c) == (4, 1, 0)
    assert got[1].survival == 0.75
    # t=2: censoring only, survival unchanged
    assert (got[2].n_risk, got[2].d, got[2].survival) == (3, 0, 0.75)
    # t=3: 1 death of 2 at risk -> 0.75 * 0.5
    assert (got[3].n_risk, got[3].d, got[3].survival) == (2, 1, 0.375)


def test_km_everyone_dies_pins_zero(spark):
    got = _km(spark, [(1, 1), (2, 1)])
    assert got[1].survival == 0.5
    assert got[2].survival == 0.0  # last at-risk dies: exact 0, no ln(0)


def test_km_all_censored_flat_one(spark):
    got = _km(spark, [(1, 0), (2, 0)])
    assert got[1].survival == 1.0 and got[2].survival == 1.0


def test_chi2_hand_computed(spark):
    # perfectly independent 2x2: contributions all zero
    rows = (
        [("en", "s1")] * 20 + [("en", "s2")] * 20
        + [("de", "s1")] * 10 + [("de", "s2")] * 10
    )
    df = spark.createDataFrame(rows, "lang string, source string")
    out = chi2_independence(df, "lang", "source").collect()
    assert all(r.contrib == 0.0 for r in out)
    got = {(r.lang, r.source): r.expected for r in out}
    assert got[("en", "s1")] == 20.0 and got[("de", "s2")] == 10.0


def test_chi2_skewed_cell(spark):
    # 2x2 with association: o=[ [30,10],[10,30] ], margins 40/40, N=80
    rows = (
        [("a", "x")] * 30 + [("a", "y")] * 10
        + [("b", "x")] * 10 + [("b", "y")] * 30
    )
    df = spark.createDataFrame(rows, "lang string, source string")
    out = {(r.lang, r.source): r for r in chi2_independence(
        df, "lang", "source").collect()}
    # every expected = 40*40/80 = 20; contrib = (30-20)^2/20 = 5
    assert all(v.expected == 20.0 for v in out.values())
    assert all(v.contrib == 5.0 for v in out.values())
