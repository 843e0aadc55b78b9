"""Units for the preference / label-QA / corpus-statistics bands:
bt_strengths, cohen/fleiss kappa, temperature_sampling, ngram_diversity,
bootstrap_ci, class_tfidf_topics, validate_conversations."""

import math

import pytest
from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.operators.labelqa import (
    cohen_kappa_pairs,
    fleiss_kappa,
)
from invoice_ocr_reconciler_spark.operators.preference import (
    bt_strengths,
    bt_strengths_reference,
)
from invoice_ocr_reconciler_spark.operators.profile import (
    bootstrap_ci,
    ngram_diversity,
)
from invoice_ocr_reconciler_spark.operators.sampling import temperature_sampling
from invoice_ocr_reconciler_spark.operators.sft import validate_conversations
from invoice_ocr_reconciler_spark.operators.tfidf import class_tfidf_topics


# --- Bradley-Terry ---------------------------------------------------------

COMPS = [
    ("A", "B"), ("A", "B"), ("A", "C"), ("B", "C"), ("B", "C"), ("A", "C"),
]


def test_bt_matches_python_reference(spark):
    df = spark.createDataFrame(COMPS, "winner string, loser string")
    out = {r.item: r.strength for r in bt_strengths(df, n_iter=3).collect()}
    assert out == bt_strengths_reference(COMPS, n_iter=3)


def test_bt_leaderboard_order_and_counts(spark):
    df = spark.createDataFrame(COMPS, "winner string, loser string")
    rows = {r.item: r for r in bt_strengths(df, n_iter=3).collect()}
    assert rows["A"].rank == 1 and rows["C"].rank == 3
    assert rows["A"].wins == 4 and rows["C"].wins == 0
    assert all(r.n_games == 4 for r in rows.values())
    # zero-win item pinned at strength 0 by the MM update
    assert rows["C"].strength == 0.0


def test_bt_partitioning_invariance(spark):
    df = spark.createDataFrame(COMPS * 10, "winner string, loser string")
    a = sorted(map(tuple, bt_strengths(df, n_iter=2).collect()))
    b = sorted(map(tuple, bt_strengths(df.repartition(7), n_iter=2).collect()))
    assert a == b


def test_bt_empty(spark):
    df = spark.createDataFrame([], "winner string, loser string")
    assert bt_strengths(df).count() == 0


# --- kappa -----------------------------------------------------------------


def _labels(spark, rows):
    return spark.createDataFrame(
        rows, "item_id long, rater string, label string"
    )


def test_cohen_hand_example(spark):
    # a=[x,x,y,y], b=[x,x,y,x]: po=3/4, sum a_k*b_k = 2*3+2*1 = 8,
    # kappa = (4*3-8)/(16-8) = 0.5
    rows = [
        (1, "a", "x"), (2, "a", "x"), (3, "a", "y"), (4, "a", "y"),
        (1, "b", "x"), (2, "b", "x"), (3, "b", "y"), (4, "b", "x"),
    ]
    r = cohen_kappa_pairs(_labels(spark, rows)).collect()[0]
    assert (r.n_items, r.agree, r.kappa_num, r.kappa_den) == (4, 3, 4, 8)
    assert r.po == 0.75 and r.pe == 0.5 and r.kappa == 0.5


def test_cohen_perfect_and_degenerate(spark):
    # identical raters over 2 labels -> kappa 1
    rows = []
    for i in range(10):
        lab = "x" if i % 2 else "y"
        rows += [(i, "a", lab), (i, "b", lab)]
    r = cohen_kappa_pairs(_labels(spark, rows)).collect()[0]
    assert r.kappa == 1.0
    # single shared label everywhere -> pe = 1 -> kappa NULL
    rows = [(i, r_, "x") for i in range(5) for r_ in ("a", "b")]
    r = cohen_kappa_pairs(_labels(spark, rows)).collect()[0]
    assert r.kappa_den == 0 and r.kappa is None


def test_cohen_pairs_only_corated(spark):
    # rater c rates a disjoint item set -> pairs with c have no rows
    rows = [(1, "a", "x"), (1, "b", "x"), (99, "c", "y")]
    pairs = {(r.rater_a, r.rater_b) for r in
             cohen_kappa_pairs(_labels(spark, rows)).collect()}
    assert pairs == {("a", "b")}


def _fleiss_py(items):
    # items: list of per-item category-count dicts (constant R assumed)
    R = sum(next(iter(items)).values()) if items else 0
    N = len(items)
    s2 = sum(c * c for it in items for c in it.values())
    po_num, po_den = s2 - N * R, N * R * (R - 1)
    cols = {}
    for it in items:
        for k, v in it.items():
            cols[k] = cols.get(k, 0) + v
    pe_num, pe_den = sum(v * v for v in cols.values()), (N * R) ** 2
    num = po_num * pe_den - pe_num * po_den
    den = po_den * (pe_den - pe_num)
    return num / den


def test_fleiss_matches_python(spark):
    rows, items = [], []
    import hashlib

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    for i in range(30):
        counts = {}
        for r_ in ("a", "b", "c"):
            lab = ["x", "y", "z"][h(f"{r_}:{i}") % 3]
            counts[lab] = counts.get(lab, 0) + 1
            rows.append((i, r_, lab))
        items.append(counts)
    out = fleiss_kappa(_labels(spark, rows), n_raters=3).collect()[0]
    expect = _fleiss_py(items)
    assert abs(out.kappa - expect) < 1e-9
    assert out.n_items == 30


def test_fleiss_drops_incomplete_items(spark):
    rows = [(1, "a", "x"), (1, "b", "x"), (1, "c", "x"),
            (2, "a", "x"), (2, "b", "x")]  # item 2 has only 2 ratings
    out = fleiss_kappa(_labels(spark, rows), n_raters=3).collect()[0]
    assert out.n_items == 1


# --- temperature sampling ---------------------------------------------------


def _langdocs(spark, counts):
    rows = []
    i = 0
    for lang, n in counts.items():
        for _ in range(n):
            rows.append((i, lang))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_temperature_alpha1_is_proportional(spark):
    docs = _langdocs(spark, {"en": 120, "de": 60, "fr": 20})
    out = {r.group: r for r in
           temperature_sampling(docs, alpha=1.0).collect()}
    for r in out.values():
        assert r.weight == r.p_raw
        assert r.rate_ppm == 1000000
        assert r.sampled == r.n_docs


def test_temperature_alpha_half_upsamples_tail(spark):
    docs = _langdocs(spark, {"en": 160, "fr": 10})
    out = {r.group: r for r in
           temperature_sampling(docs, alpha=0.5).collect()}
    # tail share grows, head share shrinks
    assert out["fr"].weight > out["fr"].p_raw
    assert out["en"].weight < out["en"].p_raw
    assert abs(sum(r.weight for r in out.values()) - 1.0) < 1e-6
    # realized counts respect the ppm thresholds deterministically
    again = {r.group: r.sampled for r in
             temperature_sampling(docs.repartition(5), alpha=0.5).collect()}
    assert again == {g: r.sampled for g, r in out.items()}


def test_temperature_null_group_folds_to_und(spark):
    docs = spark.createDataFrame(
        [(1, "en"), (2, None), (3, None)], "doc_id long, lang string"
    )
    groups = {r.group for r in temperature_sampling(docs).collect()}
    assert groups == {"en", "und"}


def test_temperature_target_total_caps_rates(spark):
    docs = _langdocs(spark, {"en": 100, "fr": 10})
    out = temperature_sampling(docs, alpha=0.5, target_total=20).collect()
    for r in out:
        assert r.rate_ppm <= 1000000
    assert sum(r.expected_docs for r in out) <= 22  # near target, fr capped


# --- ngram diversity ---------------------------------------------------------


def test_ngram_diversity_hand_case(spark):
    docs = spark.createDataFrame(
        [(1, "en", "a b c a b"), (2, "en", "a b c"),
         (3, "de", "x"), (4, "de", None)],
        "doc_id long, lang string, text string",
    )
    out = {(r.group, r.n): r for r in ngram_diversity(docs).collect()}
    assert out[("en", 1)].total_grams == 8
    assert out[("en", 1)].distinct_grams == 3
    assert out[("en", 2)].total_grams == 6  # 'a b','b c','c a','a b' + 'a b','b c'
    assert out[("en", 2)].distinct_grams == 3
    assert out[("en", 3)].distinct_ratio == 0.75
    # de has one 1-token doc: zero bigrams row present with NULL ratio
    assert out[("de", 2)].total_grams == 0
    assert out[("de", 2)].distinct_ratio is None


def test_ngram_diversity_flags_template_flood(spark):
    uniq = [(i, "en", f"w{i} x{i} y{i} z{i}") for i in range(20)]
    dup = [(i, "de", "same old line again") for i in range(20)]
    out = {(r.group, r.n): r for r in
           ngram_diversity(spark.createDataFrame(
               uniq + dup, "doc_id long, lang string, text string")).collect()}
    assert out[("de", 2)].distinct_ratio < 0.1 < out[("en", 2)].distinct_ratio


# --- bootstrap CI ------------------------------------------------------------


def test_bootstrap_constant_collapses(spark):
    docs = spark.createDataFrame(
        [(i, 42) for i in range(30)], "doc_id long, v long"
    )
    r = bootstrap_ci(docs, "v", b_resamples=50).collect()[0]
    assert r.point_mean == r.ci_lo == r.ci_hi == 42.0


def test_bootstrap_brackets_and_determinism(spark):
    docs = spark.createDataFrame(
        [(i, (i * 37) % 100) for i in range(80)], "doc_id long, v long"
    )
    r1 = bootstrap_ci(docs, "v", b_resamples=100).collect()[0]
    r2 = bootstrap_ci(docs.repartition(7), "v", b_resamples=100).collect()[0]
    assert r1 == r2
    assert r1.ci_lo <= r1.point_mean <= r1.ci_hi
    assert r1.ci_lo < r1.ci_hi


def test_bootstrap_empty(spark):
    docs = spark.createDataFrame([], "doc_id long, v long")
    r = bootstrap_ci(docs, "v").collect()[0]
    assert r.n_items == 0 and r.point_mean is None


# --- class TF-IDF topics -----------------------------------------------------


def test_cluster_topics_distinctive_terms_win(spark):
    rows = [(i, "en" if i % 2 else "de",
             ("apple banana " * 4 if i % 2 else "kirsche apfel " * 4)
             + "common words here")
            for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = class_tfidf_topics(docs, top_k=2)
    top = {(r.group, r.rnk): r.term for r in out.collect()}
    assert top[("en", 1)] in ("apple", "banana")
    assert top[("de", 1)] in ("apfel", "kirsche")
    # shared terms never beat class-exclusive ones
    assert "common" not in top.values()


def test_cluster_topics_min_tf_and_topk(spark):
    rows = [(1, "en", "rare word"), (2, "en", "alpha beta alpha beta "
            "alpha beta gamma gamma gamma delta")]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = class_tfidf_topics(docs, top_k=2, min_class_tf=3).collect()
    terms = {r.term for r in out}
    assert "rare" not in terms and len(out) <= 2
    assert all(r.tf_class >= 3 for r in out)


# --- SFT conversation validation ---------------------------------------------

CASES = [
    (1, [("user", "hi"), ("assistant", "hello")], None),
    (2, [("system", "s"), ("user", "hi"), ("assistant", "ok"),
         ("user", "more"), ("assistant", "fine")], None),
    (3, [("user", "hi"), ("user", "again"), ("assistant", "ok")],
     "repeated_role"),
    (4, [("assistant", "hi")], "bad_start"),
    (5, [], "empty_conv"),
    (6, [("user", "hi"), ("assistant", "  ")], "empty_turn"),
    (7, [("user", "hi"), ("tool", "x"), ("assistant", "ok")], "bad_role"),
    (8, [("user", "hi"), ("assistant", "ok"), ("user", "bye")], "bad_end"),
    (9, [("user", "a"), ("system", "late"), ("assistant", "ok")],
     "late_system"),
    (10, [("user", "a"), ("assistant", None)], "empty_turn"),
]


def test_validate_conversations_matrix(spark):
    cdf = spark.createDataFrame(
        [(i, t) for i, t, _ in CASES],
        "conv_id long, turns array<struct<role:string,content:string>>",
    )
    out = {r.conv_id: r for r in validate_conversations(cdf).collect()}
    for i, turns, expect in CASES:
        r = out[i]
        assert r.first_violation == expect, (i, r)
        assert r.valid == (expect is None)
        assert r.n_turns == len(turns)


def test_validate_conversations_total_over_nulls(spark):
    # NULL role folds to '' (bad_role), NULL turns folds to empty_conv —
    # three-valued logic must never leak NULL into valid/first_violation
    cdf = spark.createDataFrame(
        [
            (1, [("user", "hi"), (None, "x"), ("assistant", "ok")]),
            (2, None),
        ],
        "conv_id long, turns array<struct<role:string,content:string>>",
    )
    out = {r.conv_id: r for r in validate_conversations(cdf).collect()}
    assert out[1].valid is False and out[1].bad_role
    assert out[1].first_violation == "bad_role"
    assert out[2].valid is False and out[2].n_turns == 0
    assert out[2].first_violation == "empty_conv"


def test_validate_conversations_flag_independence(spark):
    # one conversation tripping several flags: precedence picks the first
    cdf = spark.createDataFrame(
        [(1, [("assistant", ""), ("assistant", "x"), ("user", "y")])],
        "conv_id long, turns array<struct<role:string,content:string>>",
    )
    r = validate_conversations(cdf).collect()[0]
    assert r.bad_start and r.repeated_role and r.empty_turn and r.bad_end
    assert r.first_violation == "bad_start"
