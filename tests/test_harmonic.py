"""Harmonic centrality from HyperBall sketches."""

from invoice_ocr_reconciler_spark.operators.hyperball import (
    harmonic_centrality,
    hyperball,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def test_star_center_dominates(spark):
    # center 0 reaches 5 leaves at distance 1; leaves reach nothing
    pairs = [(0, i) for i in range(1, 6)]
    got = {r.node: r.harmonic for r in harmonic_centrality(
        _edges(spark, pairs), n_iter=2).collect()}
    assert got[0] > max(got[i] for i in range(1, 6))


def test_distance_discounting(spark):
    # path 0 -> 1 -> 2 -> 3: node 0 collects 1/1 + 1/2 + 1/3 discounted
    # neighbors; node 2 only 1/1 — strict ordering 0 > 1 > 2 > 3-ish
    pairs = [(0, 1), (1, 2), (2, 3)]
    got = {r.node: r.harmonic for r in harmonic_centrality(
        _edges(spark, pairs), n_iter=3).collect()}
    assert got[0] > got[1] > got[2]
    assert got[3] == 0.0  # sink reaches no one


def test_ball_est_matches_hyperball(spark):
    pairs = [(0, 1), (1, 2), (2, 0), (0, 3)]
    e = _edges(spark, pairs)
    hc = {r.node: r.ball_est for r in harmonic_centrality(
        e, n_iter=3).collect()}
    hb = {r.node: round(r.ball_est, 6) for r in hyperball(
        e, n_iter=3).collect()}
    for n, v in hb.items():
        assert abs(hc[n] - v) < 1e-9


def test_empty_graph(spark):
    out = harmonic_centrality(_edges(spark, []))
    assert out.collect() == []
