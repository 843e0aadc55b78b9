"""Silhouette (operators/kmeans.py) and MMR diversification
(operators/mmr.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.operators.kmeans import (
    GRID,
    silhouette_score,
)
from invoice_ocr_reconciler_spark.operators.mmr import mmr_diversify

# --- silhouette ---------------------------------------------------------


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def _sil_ref(vecs, cents, assign):
    """Simplified-silhouette reference with the operator's exact
    quantization: dist_q per centroid, sqrt ratio, nanos snap."""

    def dq(v, c):
        return sum(
            math.floor((a - b) * (a - b) * GRID + 0.5) for a, b in zip(v, c)
        )

    out = {}
    for vid, v in vecs:
        j = assign[vid]
        aq = dq(v, cents[j])
        bq = min(dq(v, c) for i, c in enumerate(cents) if i != j)
        m = max(aq, bq)
        s = 0.0 if m == 0 else (math.sqrt(bq) - math.sqrt(aq)) / math.sqrt(m)
        out[vid] = math.floor(s * 1e9 + 0.5)
    return out


def test_silhouette_well_separated(spark):
    # two tight far-apart blobs: silhouette ~ 1 everywhere, none negative
    rows = [(i, [0.0 + i * 0.001, 0.0]) for i in range(5)] + [
        (10 + i, [100.0 + i * 0.001, 0.0]) for i in range(5)
    ]
    cents = [[0.002, 0.0], [100.002, 0.0]]
    out = {
        r["cluster"]: r
        for r in silhouette_score(_emb(spark, rows), cents).collect()
    }
    assert out[-1]["n"] == 10 and out[-1]["n_negative"] == 0
    assert out[-1]["silhouette"] > 0.99
    assert out[0]["n"] == 5 and out[1]["n"] == 5


def test_silhouette_misassignment_negative(spark):
    # a point assigned to the FAR centroid scores negative and is counted
    rows = [(1, [0.0, 0.0]), (2, [100.0, 0.0])]
    cents = [[0.0, 0.0], [100.0, 0.0]]
    bad = spark.createDataFrame([(1, 1), (2, 1)], "vec_id long, cluster int")
    out = {
        r["cluster"]: r
        for r in silhouette_score(
            _emb(spark, rows), cents, assignments=bad
        ).collect()
    }
    assert out[1]["n"] == 2
    assert out[1]["n_negative"] == 1  # vec 1 sits on centroid 0
    assert out[-1]["n_negative"] == 1


def test_silhouette_reference_parity(spark):
    import hashlib

    def h(s, m):
        return int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "big") % m

    rows = [
        (i, [h(f"x:{i}", 1000) / 100.0, h(f"y:{i}", 1000) / 100.0])
        for i in range(40)
    ]
    cents = [[2.0, 2.0], [8.0, 3.0], [5.0, 9.0]]
    assign = {i: h(f"a:{i}", 3) for i in range(40)}
    adf = spark.createDataFrame(
        list(assign.items()), "vec_id long, cluster int"
    )
    got = {
        r["cluster"]: r
        for r in silhouette_score(
            _emb(spark, rows), cents, assignments=adf
        ).collect()
    }
    ref = _sil_ref(rows, cents, assign)
    by_c: dict[int, list[int]] = {}
    for vid, sn in ref.items():
        by_c.setdefault(assign[vid], []).append(sn)
    for c, sns in by_c.items():
        assert got[c]["sum_s_nanos"] == sum(sns)
        assert got[c]["n"] == len(sns)
    assert got[-1]["sum_s_nanos"] == sum(ref.values())


def test_silhouette_guards(spark):
    with pytest.raises(ValueError):
        silhouette_score(_emb(spark, [(1, [0.0])]), [[0.0]])
    # out-of-range / NULL clusters are excluded, not crashed on
    rows = [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [2.0, 0.0])]
    adf = spark.createDataFrame(
        [(1, 0), (2, 7), (3, None)], "vec_id long, cluster int"
    )
    out = silhouette_score(
        _emb(spark, rows), [[0.0, 0.0], [9.0, 0.0]], assignments=adf
    ).collect()
    total = [r for r in out if r["cluster"] == -1][0]
    assert total["n"] == 1


def test_silhouette_point_on_two_centroids_zero(spark):
    # max(a, b) == 0: s defined as 0, not NULL/NaN
    rows = [(1, [0.0, 0.0])]
    adf = spark.createDataFrame([(1, 0)], "vec_id long, cluster int")
    out = silhouette_score(
        _emb(spark, rows), [[0.0, 0.0], [0.0, 0.0]], assignments=adf
    ).collect()
    total = [r for r in out if r["cluster"] == -1][0]
    assert total["sum_s_nanos"] == 0 and total["silhouette"] == 0.0


# --- MMR ----------------------------------------------------------------


def _cands(spark, rows):
    return spark.createDataFrame(
        rows,
        "query_id long, doc_id string, rel_q long, embedding array<double>",
    )


def test_mmr_diversifies_near_duplicates(spark):
    # three near-identical high-relevance docs + one distinct mid-
    # relevance doc: pure relevance would pick the clones back to back;
    # MMR at lambda=0.5 must interleave the distinct doc at round 2
    e1 = [1.0, 0.0]
    rows = [
        (1, "a", 1000, e1),
        (1, "b", 999, e1),
        (1, "c", 998, e1),
        (1, "d", 900, [0.0, 1.0]),
    ]
    out = mmr_diversify(_cands(spark, rows), k=3).collect()
    order = [r["doc_id"] for r in sorted(out, key=lambda r: r["round"])]
    assert order[0] == "a"  # relevance argmax
    assert order[1] == "d"  # the diverse doc jumps the clones
    assert order[2] == "b"


def test_mmr_pure_relevance_at_lambda_one(spark):
    e1 = [1.0, 0.0]
    rows = [
        (1, "a", 1000, e1),
        (1, "b", 999, e1),
        (1, "c", 998, e1),
        (1, "d", 900, [0.0, 1.0]),
    ]
    out = mmr_diversify(_cands(spark, rows), k=3, lam_m=1000).collect()
    order = [r["doc_id"] for r in sorted(out, key=lambda r: r["round"])]
    assert order == ["a", "b", "c"]  # sim term weighted zero


def test_mmr_round1_and_tiebreak(spark):
    # equal scores tie-break to the LOWEST doc id, deterministically
    rows = [
        (1, "z", 500, [1.0, 0.0]),
        (1, "y", 500, [0.0, 1.0]),
    ]
    out = mmr_diversify(_cands(spark, rows), k=2).collect()
    r1 = [r for r in out if r["round"] == 1][0]
    assert r1["doc_id"] == "y"
    assert r1["max_sim_q"] == 0 and r1["score_q"] == 500 * 500


def test_mmr_fewer_candidates_than_k(spark):
    rows = [(1, "a", 10, [1.0]), (1, "b", 5, [0.0])]
    out = mmr_diversify(_cands(spark, rows), k=5).collect()
    assert len(out) == 2


def test_mmr_partition_invariance(spark):
    import hashlib

    def h(s, m):
        return int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "big") % m

    rows = [
        (
            q,
            f"d{i}",
            h(f"r:{q}:{i}", 1000),
            [h(f"e:{q}:{i}:{j}", 100) / 50.0 for j in range(4)],
        )
        for q in range(3)
        for i in range(10)
    ]
    a = mmr_diversify(_cands(spark, rows).repartition(1), k=4).collect()
    b = mmr_diversify(_cands(spark, rows).repartition(7), k=4).collect()
    key = lambda r: (r["query_id"], r["round"])  # noqa: E731
    assert sorted(map(tuple, a), key=lambda t: (t[0], t[2])) == sorted(
        map(tuple, b), key=lambda t: (t[0], t[2])
    )
    # guards
    with pytest.raises(ValueError):
        mmr_diversify(_cands(spark, rows), k=0)
    with pytest.raises(ValueError):
        mmr_diversify(_cands(spark, rows), lam_m=1001)
