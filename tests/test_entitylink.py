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


def test_uncovered_unigram_still_links(spark):
    d = build_surface_dict(
        _anchors(spark, [("apple", "fruit")] * 2 + [("big apple", "city")] * 2)
    )
    out = link_mentions(_docs(spark, ["apple juice"]), d).collect()
    assert [(r.pos, r.surface, r.target) for r in out] == [
        (0, "apple", "fruit")
    ]
