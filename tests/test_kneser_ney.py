"""Interpolated Kneser–Ney bigram LM (operators/lm_score.py)."""

from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.operators.lm_score import (
    kneser_ney_bigrams,
)


def _docs(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def test_kn_hand_computed(spark):
    # bigrams: (a,b) x2, (a,c) x1, (b,c) x1
    out = kneser_ney_bigrams(
        _docs(spark, ["a b", "a b", "a c", "b c"])
    ).collect()
    got = {(r.w1, r.w2): r for r in out}
    # p(b|a) = 1.25/3 + 0.75*2/3 * (1/3) = 0.583333333
    assert got[("a", "b")].p_kn == 0.583333333
    # p(c|a) = 0.25/3 + 0.5 * (2/3) = 0.416666667
    assert got[("a", "c")].p_kn == 0.416666667
    # p(c|b) = 0.25/1 + 0.75*1 * (2/3) = 0.75
    assert got[("b", "c")].p_kn == 0.75
    assert got[("a", "b")].c_ctx == 3 and got[("a", "b")].n1_fol == 2
    assert got[("a", "c")].n1_cont == 2  # c follows both a and b


def test_kn_mass_telescopes_to_one(spark):
    # per context w1: sum over FULL vocab of p_kn == 1; over observed
    # bigrams it equals 1 - lam * (unseen continuation mass)
    out = kneser_ney_bigrams(
        _docs(spark, ["a b a c a b b c c a"])
    )
    rows = out.collect()
    # reconstruct the full-vocab sum per context: observed p_kn plus
    # lam * p_cont(w2) for unseen (w1, w2)
    cont = {}
    b_types = rows[0].c_ab and len({(r.w1, r.w2) for r in rows})
    for r in rows:
        cont[r.w2] = r.n1_cont
    vocab = {r.w1 for r in rows} | {r.w2 for r in rows}
    by_ctx = {}
    for r in rows:
        by_ctx.setdefault(r.w1, []).append(r)
    for w1, rs in by_ctx.items():
        lam = rs[0].lam
        seen = {r.w2 for r in rs}
        total = sum(r.p_kn for r in rs) + sum(
            lam * cont.get(w2, 0) / b_types
            for w2 in vocab - seen
        )
        assert abs(total - 1.0) < 1e-6, (w1, total)


def test_kn_discount_floor(spark):
    # a singleton bigram's ML term is max(1 - 0.75, 0)/c = 0.25/c, never
    # negative even with discount > count impossible here; check c_ab=1
    out = kneser_ney_bigrams(_docs(spark, ["x y"])).collect()
    r = out[0]
    # p(y|x) = 0.25/1 + 0.75*1/1 * (1/1) = 1.0
    assert (r.w1, r.w2, r.c_ab, r.p_kn) == ("x", "y", 1, 1.0)
