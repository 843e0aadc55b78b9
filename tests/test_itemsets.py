"""Frequent-itemset mining + association rules (operators/itemsets.py)
and SCC condensation (operators/graph.py:condensation)."""

from invoice_ocr_reconciler_spark.operators.graph import condensation, scc
from invoice_ocr_reconciler_spark.operators.itemsets import (
    association_rules,
    frequent_pairs,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


CORPUS = [
    "milk bread",
    "milk bread butter",
    "milk bread",
    "milk tea",
    "tea butter",
]


def test_frequent_pairs_hand_computed(spark):
    out = frequent_pairs(_docs(spark, CORPUS), min_support=2).collect()
    got = {(r.t1, r.t2): r for r in out}
    # supports: milk 4, bread 3, butter 2, tea 2; n_docs 5
    # pairs >= 2: (bread, milk) 3
    assert set(got) == {("bread", "milk")}
    r = got[("bread", "milk")]
    assert (r.supp_ab, r.supp_a, r.supp_b) == (3, 3, 4)
    assert r.conf_a_b == 1.0          # bread -> milk always
    assert r.conf_b_a == 0.75         # milk -> bread 3/4
    assert r.lift == 1.25             # 3*5/(3*4)


def test_pairs_are_set_based_not_positional(spark):
    # duplicates inside a doc count once; non-adjacent terms still pair
    out = frequent_pairs(
        _docs(spark, ["a x a y a", "a q y"]), min_support=2
    ).collect()
    got = {(r.t1, r.t2): r.supp_ab for r in out}
    assert got == {("a", "y"): 2}


def test_max_items_cap_drops_mega_basket(spark):
    wide = " ".join(f"w{i}" for i in range(10))
    out = frequent_pairs(
        _docs(spark, [wide, wide]), min_support=2, max_items=5
    )
    assert out.count() == 0  # both baskets capped away, no pairs


def test_association_rules_direction_and_threshold(spark):
    pairs = frequent_pairs(_docs(spark, CORPUS), min_support=2)
    rules = association_rules(pairs, min_conf=0.8).collect()
    assert [(r.antecedent, r.consequent, r.conf) for r in rules] == [
        ("bread", "milk", 1.0)
    ]
    both = association_rules(pairs, min_conf=0.5).collect()
    assert {(r.antecedent, r.consequent) for r in both} == {
        ("bread", "milk"),
        ("milk", "bread"),
    }


def test_condensation_collapses_scc_edges(spark):
    # 1 <-> 2 -> 3 -> 4 -> 3 : SCCs {1,2} and {3,4}; two cross links? no —
    # only 2->3 crosses; in-SCC edges vanish
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 4), (4, 3)], "src long, dst long"
    )
    comps = scc(edges)
    out = condensation(edges, comps).collect()
    assert [(r.scc_a, r.scc_b, r.n_links) for r in out] == [(1, 3, 1)]


def test_condensation_counts_parallel_cross_links(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (2, 3)], "src long, dst long"
    )
    comps = scc(edges)
    out = condensation(edges, comps).collect()
    assert [(r.scc_a, r.scc_b, r.n_links) for r in out] == [(1, 3, 2)]


def test_canonical_best_keeps_highest_score(spark):
    from invoice_ocr_reconciler_spark.operators.cluster import canonical_best

    docs = spark.createDataFrame(
        [(1, 10), (2, 50), (3, 50), (9, 7)], "doc_id long, n_chars long"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "doc_a long, doc_b long"
    )
    out = {r.doc_id: r for r in canonical_best(docs, pairs, "n_chars").collect()}
    # component {1,2,3}: 2 and 3 tie at 50 -> lower id 2 survives
    assert out[2].is_canonical and out[2].keep_rank == 1
    assert not out[1].is_canonical and not out[3].is_canonical
    assert out[3].keep_rank == 2 and out[1].keep_rank == 3
    # singleton 9 survives trivially
    assert out[9].is_canonical and out[9].component == 9
