"""Truncation-recall curve (operators/matryoshka.py): full width anchors
at 1.0, informative prefixes recover, and parity with a numpy reference."""

import math
import random

from invoice_ocr_reconciler_spark.operators.matryoshka import (
    truncation_recall,
)

DIM = 16


def _vecs(seed=6, n=40):
    # Matryoshka-shaped: component i decays as 1/(1+i) so prefixes carry
    # most of the cosine mass and recall grows with width
    rng = random.Random(seed)
    return {
        i: [rng.uniform(-1, 1) / (1.0 + j) for j in range(DIM)]
        for i in range(n)
    }


def _ref_topk(vecs, dims, k=5, n_queries=8):
    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return 0.0 if na * nb == 0 else dot / (na * nb)

    def topk(d):
        out = {}
        for q in range(n_queries):
            scored = sorted(
                (
                    (round(cos(vecs[q][:d], vecs[c][:d]), 6), -c)
                    for c in vecs
                    if c != q
                ),
                reverse=True,
            )[:k]
            out[q] = {-c for _s, c in scored}
        return out

    full = topk(DIM)
    res = {}
    for d in dims:
        td = topk(d)
        hits = sum(len(td[q] & full[q]) for q in td)
        res[d] = hits
    return res, n_queries * 5


def test_curve_matches_reference_and_anchors(spark):
    vecs = _vecs()
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    queries = df.filter("vec_id < 8")
    dims = [2, 4, 8, DIM]
    got = {
        r["dim"]: (r["hits"], r["total"], r["recall_at_k"])
        for r in truncation_recall(df, queries, dims).collect()
    }
    ref_hits, total = _ref_topk(vecs, dims)
    assert set(got) == set(dims)
    for d in dims:
        assert got[d][0] == ref_hits[d], d
        assert got[d][1] == total
    assert got[DIM][2] == 1.0  # full width is the anchor
    assert got[2][2] < 1.0  # narrow prefixes must lose something here
    assert got[4][2] <= got[8][2] <= 1.0  # decay-shaped data recovers


def test_rejects_empty_dims(spark):
    import pytest

    with pytest.raises(ValueError):
        truncation_recall(None, None, [])
