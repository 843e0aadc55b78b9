"""Good–Turing profile + distinctive-terms (operators/profile.py)."""

from invoice_ocr_reconciler_spark.operators.profile import (
    distinctive_terms,
    good_turing,
)


def _docs(spark, rows, with_source=False):
    if with_source:
        return spark.createDataFrame(rows, "source string, text string")
    return spark.createDataFrame([(t,) for t in rows], "text string")


def test_good_turing_hand_computed(spark):
    # counts: a=3, b=2, c=2, d=1 -> N_1=1, N_2=2, N_3=1; N=8
    out = good_turing(_docs(spark, ["a a a b b c", "c d"]))
    got = [(r.r, r.n_r, r.n_next, r.r_star, r.p_mass) for r in out.collect()]
    assert got == [
        (0, 0, 1, None, 0.125),
        (1, 1, 2, 4.0, 0.125),
        (2, 2, 1, 1.5, 0.5),
        (3, 1, 0, 0.0, 0.375),
    ]


def test_good_turing_max_r_cutoff_and_gaps(spark):
    # e appears 5x, f once: r=5 kept with N_6=0; r in 2..4 absent (gap)
    out = good_turing(_docs(spark, ["e e e e e f"]), max_r=4)
    got = {r.r: (r.n_r, r.n_next) for r in out.collect()}
    assert set(got) == {0, 1}  # r=5 beyond max_r, gaps not fabricated
    assert got[1] == (1, 0)


def test_good_turing_empty_corpus(spark):
    out = good_turing(_docs(spark, [""])).collect()
    assert len(out) == 1 and out[0].r == 0
    assert out[0].p_mass is None  # 0/0 -> NULL, not a crash


def test_distinctive_terms_hand_computed(spark):
    docs = _docs(
        spark, [("g1", "x x x y"), ("g2", "y y z")], with_source=True
    )
    out = distinctive_terms(docs, top_k=1, min_count=1)
    got = {r.source: (r.term, r.k_g, r.k_rest, r.rr, r.rank) for r in out.collect()}
    # (g1,x): (3+1)(3+3)/((0+1)(4+3)) = 24/7; (g2,z): (1+1)(4+3)/((0+1)(3+3)) = 14/6
    assert got["g1"] == ("x", 3, 0, 3.428571, 1)
    assert got["g2"] == ("z", 1, 0, 2.333333, 1)


def test_distinctive_terms_min_count_and_tiebreak(spark):
    docs = _docs(
        spark,
        [("g1", "b b a a q"), ("g2", "q q q q")],
        with_source=True,
    )
    out = distinctive_terms(docs, top_k=5, min_count=2)
    g1 = [(r.term, r.rank) for r in out.collect() if r.source == "g1"]
    # a and b have identical counts -> identical rr -> term asc tie-break;
    # q (k_g=1) is cut by min_count=2 in g1
    assert g1 == [("a", 1), ("b", 2)]


def test_benford_hand_computed(spark):
    from invoice_ocr_reconciler_spark.operators.profile import (
        benford_first_digit,
    )

    # amounts: first digits 1,1,2,9 plus excluded junk (0, -5, NULL)
    df = spark.createDataFrame(
        [(123.0,), (0.19,), (2000.5,), (9.99,), (0.0,), (-5.0,), (None,)],
        "amt double",
    )
    out = {r.digit: r for r in benford_first_digit(df, "amt").collect()}
    assert len(out) == 9
    assert out[1].n == 2 and out[2].n == 1 and out[9].n == 1
    assert out[3].n == 0  # zero-observation digits present
    assert out[1].frac == 0.5
    # expected for d=1: 4 * 0.301029995664 = 1.204119982656 -> 1.2041
    assert out[1].expected == 1.2041


def test_benford_sub_one_amounts_use_first_significant_digit(spark):
    from invoice_ocr_reconciler_spark.operators.profile import (
        benford_first_digit,
    )

    df = spark.createDataFrame([(0.07,), (0.5,)], "amt double")
    out = {r.digit: r.n for r in benford_first_digit(df, "amt").collect()}
    assert out[7] == 1 and out[5] == 1


def test_amount_anomalies_hand_computed(spark):
    from invoice_ocr_reconciler_spark.operators.profile import (
        amount_anomalies,
    )

    rows = [
        (100.00,),   # cents_00 + mult_100
        (1000.00,),  # cents_00 + mult_100 + mult_1000
        (100.50,),   # none
        (250.00,),   # cents_00 only (not mult_100)
        (4950.0,),   # just below 5000 (2% band)
        (5050.0,),   # just above
        (4800.0,),   # outside band
        (0.0,), (-3.0,), (None,),  # excluded
    ]
    df = spark.createDataFrame(rows, "amt double")
    r = amount_anomalies(df, "amt").collect()[0]
    assert r.n_pos == 7
    assert r.n_cents_00 == 6          # all but 100.50
    assert r.n_mult_100 == 3          # 100, 1000, 4800
    assert r.n_mult_1000 == 1         # 1000
    assert (r.n_just_below, r.n_just_above) == (1, 1)
    assert r.below_share == 0.5


def test_benford_by_group_min_n_and_chi2(spark):
    from invoice_ocr_reconciler_spark.operators.profile import (
        benford_by_group,
    )

    rows = [("a", float(x)) for x in ([1] * 30 + [2] * 18 + [3] * 12)] + [
        ("tiny", 5.0)
    ] * 3
    df = spark.createDataFrame(rows, "grp string, amt double")
    out = benford_by_group(df, "amt", "grp", min_n=20).collect()
    assert [r.grp for r in out] == ["a"]  # tiny dropped by min_n
    r = out[0]
    assert (r.n, r.n1, r.n2, r.n3) == (60, 30, 18, 12)
    # chi2 > 0 (60 amounts can't match Benford exactly) and finite
    assert r.chi2 > 0.0
