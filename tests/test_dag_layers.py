"""Longest-path DAG layering (operators/graph.py:dag_layers)."""

import pytest

from invoice_ocr_reconciler_spark.operators.graph import dag_layers


def _run(spark, pairs, **kw):
    edges = spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )
    return {r.node: r.layer for r in dag_layers(edges, **kw).collect()}


def test_longest_path_not_bfs(spark):
    # 1->2->3 plus skip 1->3: layer(3) must be 2 (longest), not 1
    assert _run(spark, [(1, 2), (2, 3), (1, 3)]) == {1: 0, 2: 1, 3: 2}


def test_multiple_sources(spark):
    got = _run(spark, [(1, 3), (2, 3), (3, 4)])
    assert got == {1: 0, 2: 0, 3: 1, 4: 2}


def test_diamond(spark):
    got = _run(spark, [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)])
    assert got == {1: 0, 2: 1, 3: 1, 4: 2, 5: 3}


def test_cycle_raises_loudly(spark):
    with pytest.raises(RuntimeError, match="cycle|max_depth"):
        _run(spark, [(1, 2), (2, 1)], max_depth=6)


def test_depth_exactly_at_cap_converges(spark):
    # path of depth 3 with max_depth=3: the final raise happens in round
    # 3 and the +1 convergence round observes the empty frontier — must
    # converge, not raise
    got = _run(spark, [(1, 2), (2, 3), (3, 4)], max_depth=3)
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}
