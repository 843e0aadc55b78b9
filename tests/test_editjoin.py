"""Deletion-neighborhood edit-distance join (operators/editjoin.py)."""

from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.operators.editjoin import (
    canonical_spelling,
    deletion_keys,
    typo_pairs,
)


def _terms(spark, rows):
    return spark.createDataFrame(rows, "term string, cnt long")


def _pairs(spark, rows, **kw):
    return {
        (r.t1, r.t2): (r.c1, r.c2, r.lev)
        for r in typo_pairs(_terms(spark, rows), **kw).collect()
    }


def test_deletion_keys_distinct_and_complete(spark):
    got = (
        spark.range(1)
        .select(deletion_keys("'cab'").alias("k"))
        .collect()[0]
        .k
    )
    assert sorted(got) == ["ab", "ca", "cab", "cb"]
    # repeated letters collapse: 'aab' deletes to 'ab' twice
    got2 = (
        spark.range(1)
        .select(deletion_keys("'aab'").alias("k"))
        .collect()[0]
        .k
    )
    assert sorted(got2) == ["aa", "aab", "ab"]


def test_all_three_edit_classes_found(spark):
    rows = [
        ("table", 100),
        ("tible", 2),   # substitution
        ("tble", 3),    # deletion
        ("tabble", 4),  # insertion
        ("chair", 50),  # unrelated
    ]
    got = _pairs(spark, rows)
    assert set(got) == {
        ("table", "tible"),    # substitution
        ("table", "tble"),     # deletion
        ("tabble", "table"),   # insertion (t1 < t2 lexicographic)
        ("tble", "tible"),     # deletion vs substitution, also edit-1
    }
    assert got[("table", "tble")] == (100, 3, 1)


def test_distance_two_candidates_are_dropped(spark):
    # 'ab'/'ba' share deletion keys 'a' and 'b' but levenshtein is 2
    got = _pairs(spark, [("ab", 1), ("ba", 1)])
    assert got == {}


def test_min_len_filter(spark):
    # default min_len=2 drops 1-char terms (their deletion key is ''),
    # so no pairs survive here
    assert _pairs(spark, [("a", 1), ("b", 1), ("ab", 1)]) == {}
    # min_len=1 admits them: 'a'~'ab', 'a'~'b' (via the '' key), 'ab'~'b'
    got = _pairs(spark, [("a", 1), ("b", 1), ("ab", 1)], min_len=1)
    assert set(got) == {("a", "ab"), ("a", "b"), ("ab", "b")}


def test_hot_key_cap_bounds_degenerate_groups(spark):
    # 10 terms a<x>b share only key 'ab'; cap=5 drops the group entirely
    rows = [(f"a{c}b", 1) for c in "cdefghijkl"]
    assert _pairs(spark, rows, hot_key_cap=5) == {}
    full = _pairs(spark, rows)  # default cap: all C(10,2) sub-pairs
    assert len(full) == 45
    assert all(v[2] == 1 for v in full.values())


def test_pair_order_and_dedup(spark):
    got = typo_pairs(
        _terms(spark, [("cat", 9), ("cats", 1)]), min_len=3
    ).collect()
    assert [(r.t1, r.t2) for r in got] == [("cat", "cats")]


def test_canonical_spelling_ratio_and_best_fix(spark):
    pairs = typo_pairs(
        _terms(
            spark,
            [("table", 100), ("tible", 2), ("tuble", 30), ("tble", 3)],
        ),
        min_len=3,
    )
    got = {r.typo: (r.fix, r.fix_cnt) for r in canonical_spelling(pairs).collect()}
    # tible: neighbors table(100), tuble(30) both >=4x2 -> highest wins
    assert got["tible"] == ("table", 100)
    # tble: table(100)>=12, tuble(30)>=12 -> table
    assert got["tble"] == ("table", 100)
    # tuble(30): table(100) < 4*30 -> not eligible; absent
    assert "tuble" not in got
    assert "table" not in got
