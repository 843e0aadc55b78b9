"""Strongly connected components (operators/graph.py:scc)."""

import pytest

from invoice_ocr_reconciler_spark.operators.graph import scc


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def _run(spark, pairs, **kw):
    return {
        r.node: r.scc_id for r in scc(_edges(spark, pairs), **kw).collect()
    }


def test_single_cycle(spark):
    got = _run(spark, [(1, 2), (2, 3), (3, 1)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_dag_is_all_singletons(spark):
    got = _run(spark, [(1, 2), (2, 3), (1, 3)])
    assert got == {1: 1, 2: 2, 3: 3}


def test_two_cycles_joined_by_dag_edge_stay_separate(spark):
    got = _run(spark, [(1, 2), (2, 1), (2, 3), (3, 4), (4, 3)])
    assert got == {1: 1, 2: 1, 3: 3, 4: 3}


def test_figure_eight_is_one_scc(spark):
    # two cycles sharing node 2 -> mutually reachable -> one component
    got = _run(spark, [(1, 2), (2, 1), (2, 3), (3, 2)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_color_shadowed_scc_needs_second_peel_round(spark):
    # 9 -> 1, 1 <-> 2: the 2-cycle is colored 9 in round one (not a
    # member), peels in round two after 9's singleton is removed
    got = _run(spark, [(9, 1), (1, 2), (2, 1)])
    assert got == {9: 9, 1: 1, 2: 1}
    with pytest.raises(RuntimeError, match="max_outer"):
        _run(spark, [(9, 1), (1, 2), (2, 1)], max_outer=1)


def test_self_loop_and_isolated_sink(spark):
    got = _run(spark, [(5, 5), (5, 7)])
    assert got == {5: 5, 7: 7}


def test_empty_graph(spark):
    out = scc(_edges(spark, []))
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == ["node", "scc_id"]


def test_max_inner_exhaustion_raises_not_splits(spark):
    """A ring whose diameter exceeds max_inner must RAISE, never silently
    split the SCC across two ids (the 'false root' would confine a proper
    subset and the nodes would leave `remaining`, dodging the outer raise)."""
    n = 12
    ring = [(i, (i + 1) % n) for i in range(n)]
    with pytest.raises(RuntimeError, match="max_inner"):
        _run(spark, ring, max_inner=3)


def test_long_descending_cycle_converges(spark):
    # a 12-cycle with ids descending along edges stresses the inner
    # coloring fixpoint (max id walks the whole ring)
    n = 12
    ring = [(i, (i + 1) % n) for i in range(n)]
    got = _run(spark, ring)
    assert set(got.values()) == {0}
    assert len(got) == n
