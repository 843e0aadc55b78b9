"""Log-bucketed quantile sketch (operators/qsketch.py): bucket math vs a
Python reference, the <1/m relative-error bound vs exact nearest-rank
percentiles, and cell-wise mergeability."""

import math
import random

import pytest

from invoice_ocr_reconciler_spark.operators.qsketch import (
    merge_sketches,
    quantile_sketch,
    sketch_quantiles,
)

M = 16


def _ref_bucket(v, m=M):
    if v == 0:
        return (-1, 0, 0)
    e = v.bit_length() - 1
    p = 1 << e
    if p < m:
        return (e, v - p, v)
    w = p // m
    sub = (v - p) // w
    return (e, sub, p + sub * w)


def _exact_nearest_rank(vals, pct):
    s = sorted(vals)
    r = max(1, math.ceil(pct * len(s) / 100))
    return s[r - 1]


def _vals(seed=4, n=4000):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        # mixed magnitudes: heavy small values + a long tail
        out.append(int(rng.lognormvariate(5, 2.2)))
    out += [0, 0, 1, 2, 3, 15, 16, 17, (1 << 40) + 12345]
    return out


def test_buckets_match_reference(spark):
    vals = _vals(n=800)
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        (r["e"], r["sub"], r["lo"]): r["cnt"]
        for r in quantile_sketch(df, "v").collect()
    }
    ref = {}
    for v in vals:
        ref[_ref_bucket(v)] = ref.get(_ref_bucket(v), 0) + 1
    assert got == ref


def test_relative_error_bound(spark):
    vals = _vals()
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    sk = quantile_sketch(df, "v")
    out = {
        r["pct"]: r["est_lo"]
        for r in sketch_quantiles(sk, [1, 10, 50, 90, 99]).collect()
    }
    for pct, est in out.items():
        exact = _exact_nearest_rank(vals, pct)
        # est is the lower bound of the bucket holding the exact value:
        # est <= exact and the bucket spans < 1/M of its base
        assert est <= exact
        assert exact <= est + max(1, est // M), (pct, est, exact)


def test_small_values_are_exact(spark):
    vals = [0, 1, 2, 3, 5, 7, 11, 13, 15] * 10
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    sk = quantile_sketch(df, "v")
    out = {
        r["pct"]: r["est_lo"]
        for r in sketch_quantiles(sk, [10, 50, 90]).collect()
    }
    for pct, est in out.items():
        assert est == _exact_nearest_rank(vals, pct)  # width-1 buckets


def test_merge_equals_whole(spark):
    vals = _vals(seed=8, n=1500)
    a, b = vals[:700], vals[700:]
    df = lambda xs: spark.createDataFrame([(v,) for v in xs], "v long")  # noqa: E731
    merged = merge_sketches(
        quantile_sketch(df(a), "v"), quantile_sketch(df(b), "v")
    )
    whole = quantile_sketch(df(vals), "v")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_nulls_and_negatives_excluded(spark):
    df = spark.createDataFrame(
        [(None,), (-5,), (0,), (9,)], "v long"
    )
    sk = quantile_sketch(df, "v").collect()
    assert sum(r["cnt"] for r in sk) == 2


def test_rejects_non_power_of_two():
    with pytest.raises(ValueError):
        quantile_sketch(None, "v", m=12)  # validated before df use
