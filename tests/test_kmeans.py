"""Distributed Lloyd k-means (operators/kmeans.py) vs a pure-Python
reference of the SAME quantized algorithm: md5-order seeding, integer
dist_q, integer-grid centroid accumulation."""

import hashlib
import math
import random

from invoice_ocr_reconciler_spark.operators.kmeans import (
    GRID,
    assign_clusters,
    fit_kmeans,
    kmeans_assign,
    seed_centroids,
)

DIM = 6


def _ref(ids, vecs, k, n_iter):
    order = sorted(
        range(len(ids)),
        key=lambda i: (
            hashlib.md5(str(ids[i]).encode()).hexdigest(),
            ids[i],
        ),
    )
    cents = [list(map(float, vecs[i])) for i in order[:k]]

    def distq(v, c):
        return sum(
            int(math.floor((a - b) * (a - b) * GRID + 0.5))
            for a, b in zip(v, c)
        )

    hist, assign = [], []
    for _ in range(n_iter):
        assign = []
        for v in vecs:
            ds = [distq(v, c) for c in cents]
            m = min(ds)
            assign.append((ds.index(m), m))
        hist.append(sum(m for _, m in assign))
        new = [list(c) for c in cents]
        for j in range(k):
            members = [vecs[i] for i, (a, _) in enumerate(assign) if a == j]
            if members:
                n = len(members)
                new[j] = [
                    (
                        sum(
                            int(math.floor(float(v[d]) * GRID + 0.5))
                            for v in members
                        )
                        / n
                    )
                    / GRID
                    for d in range(DIM)
                ]
        cents = new
    final = []
    for v in vecs:
        ds = [distq(v, c) for c in cents]
        m = min(ds)
        final.append((ds.index(m), m))
    return cents, hist, final


def _data(seed=5, n=60):
    rng = random.Random(seed)
    ids = list(range(n))
    vecs = [
        [rng.uniform(-1, 1) + (i % 3) * 2.5 for _ in range(DIM)]
        for i in ids
    ]
    return ids, vecs


def test_fit_matches_python_reference(spark):
    ids, vecs = _data()
    df = spark.createDataFrame(
        list(zip(ids, vecs)), "vec_id long, embedding array<double>"
    )
    cents, hist = fit_kmeans(df, k=3, dim=DIM, n_iter=3)
    ref_cents, ref_hist, ref_final = _ref(ids, vecs, 3, 3)
    assert hist == ref_hist
    assert cents == ref_cents  # exact: same quantized arithmetic
    got = {
        r["vec_id"]: (r["cluster"], r["dist_q"])
        for r in assign_clusters(df, cents).collect()
    }
    assert got == {i: rf for i, rf in zip(ids, ref_final)}


def test_deterministic_across_parallelism(spark):
    ids, vecs = _data(seed=9, n=80)
    df = spark.createDataFrame(
        list(zip(ids, vecs)), "vec_id long, embedding array<double>"
    )
    a = sorted(
        map(tuple, kmeans_assign(df.repartition(2), 3, DIM, n_iter=3).collect())
    )
    b = sorted(
        map(tuple, kmeans_assign(df.repartition(7), 3, DIM, n_iter=3).collect())
    )
    assert a == b


def test_inertia_never_increases(spark):
    ids, vecs = _data(seed=13, n=90)
    df = spark.createDataFrame(
        list(zip(ids, vecs)), "vec_id long, embedding array<double>"
    )
    _, hist = fit_kmeans(df, k=4, dim=DIM, n_iter=4)
    # Lloyd is monotone in the true objective; the 2^-20 quantization can
    # wiggle single grid units, never more than a unit per row
    for a, b in zip(hist, hist[1:]):
        assert b <= a + len(ids)


def test_empty_cluster_and_malformed_rows(spark):
    # two tight far-apart blobs but k=3: one seed goes empty and must
    # keep its previous centroid; NULL / wrong-dim rows are ignored
    rows = [(i, [0.0 + i * 1e-4] * DIM) for i in range(10)]
    rows += [(100 + i, [50.0 + i * 1e-4] * DIM) for i in range(10)]
    rows += [(999, None), (998, [1.0, 2.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kmeans_assign(df, k=3, dim=DIM, n_iter=3).collect()
    assert len(out) == 20  # malformed rows excluded
    by_blob = {r["vec_id"] // 100: set() for r in out}
    for r in out:
        by_blob[r["vec_id"] // 100].add(r["cluster"])
    # each blob lands in exactly one cluster and the blobs differ
    assert all(len(s) == 1 for s in by_blob.values())
    assert by_blob[0] != by_blob[1]


def test_seed_is_top_k_by_md5(spark):
    ids, vecs = _data(seed=2, n=25)
    df = spark.createDataFrame(
        list(zip(ids, vecs)), "vec_id long, embedding array<double>"
    )
    got = seed_centroids(df, 4)
    order = sorted(
        ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )
    assert got == [vecs[i] for i in order[:4]]
