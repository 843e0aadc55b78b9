"""Anchor-dictionary entity linking (operators/entitylink.py)."""

from invoice_ocr_reconciler_spark.operators.entitylink import (
    build_surface_dict,
    link_mentions,
)


def _anchors(spark, rows):
    return spark.createDataFrame(rows, "anchor string, link string")


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_dict_most_common_sense_and_commonness(spark):
    rows = (
        [("big apple", "city")] * 3
        + [("big apple", "fruit")] * 1
        + [("apple", "fruit")] * 2
        + [("rare", "x")] * 1       # below min_count
        + [("a b c", "y")] * 5      # over max_tokens
    )
    out = {r.surface: r for r in build_surface_dict(
        _anchors(spark, rows)).collect()}
    assert set(out) == {"big apple", "apple"}
    r = out["big apple"]
    assert (r.target, r.n_links, r.n_surface, r.n_targets) == (
        "city", 3, 4, 2
    )
    assert r.commonness == 0.75


def test_dict_tie_breaks_by_target(spark):
    rows = [("x", "b"), ("x", "a")]
    out = build_surface_dict(_anchors(spark, rows), min_count=2).collect()
    assert out[0].target == "a"


def test_dict_normalizes_anchor_case_and_spacing(spark):
    rows = [("  Big   APPLE ", "city"), ("big apple", "city")]
    out = build_surface_dict(_anchors(spark, rows)).collect()
    assert out[0].surface == "big apple" and out[0].n_surface == 2


def test_maximal_match_suppresses_covered_unigrams(spark):
    d = build_surface_dict(
        _anchors(
            spark,
            [("big apple", "city")] * 2 + [("apple", "fruit")] * 2
            + [("big", "adj")] * 2,
        )
    )
    out = link_mentions(_docs(spark, ["i love big apple pie"]), d).collect()
    got = [(r.pos, r.n_tokens, r.surface, r.target) for r in out]
    # 'big apple' wins at pos 2-3; bare 'big'/'apple' inside it are
    # suppressed; no other mentions
    assert got == [(2, 2, "big apple", "city")]


def test_overlapping_bigrams_resolve_greedy_left_to_right(spark):
    """'a b' at p and 'b c' at p+1 both match the dictionary: greedy
    maximal munch keeps 'a b', drops 'b c' (token b may not be claimed
    twice), and a third consecutive match 'c d' at p+2 survives again."""
    d = build_surface_dict(
        _anchors(
            spark,
            [("alpha beta", "t1")] * 2
            + [("beta gamma", "t2")] * 2
            + [("gamma delta", "t3")] * 2
            + [("gamma", "u1")] * 2,
        )
    )
    out = link_mentions(
        _docs(spark, ["alpha beta gamma delta end", "x beta gamma y"]), d
    ).collect()
    got = [(r.doc_id, r.pos, r.n_tokens, r.surface) for r in out]
    # doc 0: islands {0,1,2}; keep offsets 0 and 2 -> 'alpha beta' +
    # 'gamma delta'; unigram 'gamma' suppressed (covered by kept bigram)
    # doc 1: lone 'beta gamma' island keeps itself
    assert got == [
        (0, 0, 2, "alpha beta"),
        (0, 2, 2, "gamma delta"),
        (1, 1, 2, "beta gamma"),
    ]


def test_rejected_bigram_frees_its_unigram(spark):
    """When 'beta gamma' loses to 'alpha beta', the token 'gamma' is NOT
    covered, so a dictionary unigram at that position links."""
    d = build_surface_dict(
        _anchors(
            spark,
            [("alpha beta", "t1")] * 2
            + [("beta gamma", "t2")] * 2
            + [("gamma", "u1")] * 2,
        )
    )
    out = link_mentions(_docs(spark, ["alpha beta gamma end"]), d).collect()
    got = [(r.pos, r.n_tokens, r.surface) for r in out]
    assert got == [(0, 2, "alpha beta"), (2, 1, "gamma")]


def test_uncovered_unigram_still_links(spark):
    d = build_surface_dict(
        _anchors(spark, [("apple", "fruit")] * 2 + [("big apple", "city")] * 2)
    )
    out = link_mentions(_docs(spark, ["apple juice"]), d).collect()
    assert [(r.pos, r.surface, r.target) for r in out] == [
        (0, "apple", "fruit")
    ]
