"""Systematic PPS sampling (operators/sampling.py:pps_systematic)."""

from invoice_ocr_reconciler_spark.operators.sampling import pps_systematic


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, w long")


def test_pick_count_equals_n(spark):
    rows = [(i, (i % 7) + 1) for i in range(100)]
    out = pps_systematic(_df(spark, rows), "w", 10, id_col="doc_id")
    assert sum(r.n_picks for r in out.collect()) == 10


def test_heavy_row_multi_pick(spark):
    # one row holds 80% of the mass -> with n=5 it must absorb 4 picks
    rows = [(1, 80), (2, 10), (3, 10)]
    out = {r.doc_id: r.n_picks for r in pps_systematic(
        _df(spark, rows), "w", 5).collect()}
    assert out[1] == 4
    assert sum(out.values()) == 5


def test_zero_weight_excluded_and_deterministic(spark):
    rows = [(1, 0), (2, 5), (3, 5), (4, -2)]
    a = pps_systematic(_df(spark, rows), "w", 2).collect()
    b = pps_systematic(_df(spark, rows), "w", 2).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    ids = {r.doc_id for r in a}
    assert 1 not in ids and 4 not in ids


def test_bucket_boundaries_exact(spark):
    # tiny bucket width forces multi-bucket cumsum; totals must still
    # telescope exactly
    rows = [(i, 3) for i in range(50)]
    out = pps_systematic(
        _df(spark, rows), "w", 6, bucket_width=8
    ).collect()
    assert sum(r.n_picks for r in out) == 6
    assert max(r.cum for r in out) <= 150


def test_overflow_fails_loudly(spark):
    """total_weight * n_samples >= 2^63 must raise (round-3 ADVICE), not
    wrap to negative/garbage n_picks under non-ANSI BIGINT multiply."""
    import pytest

    rows = [(1, 2**61), (2, 2**61)]  # total 2^62; n=4 -> 2^64 overflows
    with pytest.raises(Exception, match="overflow"):
        pps_systematic(_df(spark, rows), "w", 4).collect()


def test_under_limit_still_exact(spark):
    # just below the guard: total*n < 2^63 stays on the exact path
    rows = [(1, 2**60), (2, 2**60)]  # total 2^61; n=3 -> 3*2^61 < 2^63
    out = pps_systematic(_df(spark, rows), "w", 3).collect()
    assert sum(r.n_picks for r in out) == 3
