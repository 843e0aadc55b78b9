"""Tests for graph-structure quality signals (operators/graph.py):
Newman modularity and degree assortativity — pinned against known
closed-form values on tiny graphs."""

import pytest

from invoice_ocr_reconciler_spark.operators.graph import (
    degree_assortativity,
    modularity,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _comms(spark, pairs):
    return spark.createDataFrame(pairs, "node long, community string")


def test_modularity_two_triangles_one_bridge(spark):
    # Classic barbell: triangles {0,1,2} and {3,4,5} joined by (2,3).
    # m=7; intra=6; deg sums per community: 7 each -> sum dc^2 = 98.
    # Q = (4*7*6 - 98) / (4*49) = 70/196 = 5/14.
    e = _edges(
        spark,
        [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)],
    )
    c = _comms(
        spark,
        [(0, "L"), (1, "L"), (2, "L"), (3, "R"), (4, "R"), (5, "R")],
    )
    row = modularity(e, c).collect()[0]
    assert row["n_nodes"] == 6 and row["n_edges"] == 7
    assert row["n_communities"] == 2 and row["intra_edges"] == 6
    assert (row["q_num"], row["q_den"]) == (70, 196)
    assert row["modularity"] == pytest.approx(5 / 14, abs=1e-12)


def test_modularity_all_one_community_is_zero_ish(spark):
    # One community holding every edge: Q = 1 - 1 = 0 exactly.
    e = _edges(spark, [(0, 1), (1, 2), (0, 2)])
    c = _comms(spark, [(0, "a"), (1, "a"), (2, "a")])
    row = modularity(e, c).collect()[0]
    assert row["q_num"] == 0 and row["modularity"] == 0.0


def test_modularity_singleton_fallback_and_canonicalization(spark):
    # Node 2 unlabeled -> its own '__n2' community; self-loops and
    # duplicate/reversed edges dropped before anything counts.
    e = _edges(spark, [(0, 1), (1, 0), (1, 1), (1, 2)])
    c = _comms(spark, [(0, "a"), (1, "a")])
    row = modularity(e, c).collect()[0]
    assert row["n_edges"] == 2 and row["n_communities"] == 2
    assert row["intra_edges"] == 1
    # deg: a=3 (0:1 + 1:2), __n2=1 -> Q = (8*1 - 10)/16
    assert (row["q_num"], row["q_den"]) == (-2, 16)


def test_modularity_dup_labels_first_wins(spark):
    e = _edges(spark, [(0, 1)])
    c = _comms(spark, [(0, "a"), (0, "z"), (1, "a")])
    row = modularity(e, c).collect()[0]
    assert row["n_communities"] == 1 and row["intra_edges"] == 1


def test_assortativity_star_is_minus_one(spark):
    # Star K1,4: every edge joins deg-4 hub to deg-1 leaf -> r = -1.
    e = _edges(spark, [(0, 1), (0, 2), (0, 3), (0, 4)])
    row = degree_assortativity(e).collect()[0]
    assert row["n_edges"] == 4 and row["s1"] == 8
    assert row["r"] == pytest.approx(-1.0, abs=1e-12)


def test_assortativity_cycle_is_null(spark):
    # 4-cycle: degree-regular, zero variance -> NULL.
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    row = degree_assortativity(e).collect()[0]
    assert row["r"] is None


def test_assortativity_matches_numpy_pearson(spark):
    import numpy as np

    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (3, 4), (4, 5), (5, 6),
             (6, 3), (2, 7)]
    e = _edges(spark, pairs)
    deg = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs, ys = [], []
    for a, b in pairs:  # both orientations of each undirected edge
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    expect = np.corrcoef(xs, ys)[0, 1]
    row = degree_assortativity(e).collect()[0]
    assert row["r"] == pytest.approx(float(expect), abs=1e-12)
    # exact moment identity: r from the published BIGINT pools
    num = row["s1"] * row["sxy"] - row["sx"] ** 2
    den = row["s1"] * row["sxx"] - row["sx"] ** 2
    assert row["r"] == pytest.approx(num / den)
