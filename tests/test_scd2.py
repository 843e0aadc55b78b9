"""SCD type-2 history collapse (operators/mutate.py:scd2_history)."""

import datetime as dt

from invoice_ocr_reconciler_spark.operators.mutate import scd2_history

T0 = dt.datetime(2024, 1, 1)


def _caps(spark, rows):
    data = [
        (u, T0 + dt.timedelta(days=d), dig) for (u, d, dig) in rows
    ]
    return spark.createDataFrame(
        data, "url string, ts timestamp_ntz, digest string"
    )


def _hist(spark, rows, **kw):
    return scd2_history(_caps(spark, rows), **kw).collect()


def test_runs_collapse_and_interval_chain(spark):
    got = _hist(
        spark,
        [
            ("u", 0, "a"),
            ("u", 1, "a"),
            ("u", 2, "b"),
            ("u", 3, "b"),
            ("u", 4, "a"),  # reverting content is a NEW version
        ],
    )
    assert [(r.version, r.digest, r.n_captures) for r in got] == [
        (1, "a", 2),
        (2, "b", 2),
        (3, "a", 1),
    ]
    # valid_to chains to the next version's valid_from; last is open
    assert got[0].valid_to == got[1].valid_from
    assert got[1].valid_to == got[2].valid_from
    assert got[2].valid_to is None
    assert [r.is_current for r in got] == [False, False, True]
    assert got[0].valid_from == T0


def test_single_capture_is_one_current_version(spark):
    got = _hist(spark, [("u", 0, "a")])
    assert [(r.version, r.n_captures, r.is_current) for r in got] == [
        (1, 1, True)
    ]


def test_null_safe_change_detection(spark):
    got = _hist(
        spark,
        [("u", 0, None), ("u", 1, None), ("u", 2, "a"), ("u", 3, None)],
    )
    # NULL->NULL unchanged; NULL->'a' and 'a'->NULL are changes
    assert [(r.version, r.digest, r.n_captures) for r in got] == [
        (1, None, 2),
        (2, "a", 1),
        (3, None, 1),
    ]


def test_keys_are_independent(spark):
    got = _hist(
        spark,
        [("u", 0, "a"), ("v", 0, "a"), ("v", 1, "b")],
    )
    by_key = {}
    for r in got:
        by_key.setdefault(r.url, []).append(r.version)
    assert by_key == {"u": [1], "v": [1, 2]}


def test_multi_attr_change(spark):
    df = spark.createDataFrame(
        [
            ("u", T0, "a", 200),
            ("u", T0 + dt.timedelta(days=1), "a", 404),  # status flips
            ("u", T0 + dt.timedelta(days=2), "a", 404),
        ],
        "url string, ts timestamp_ntz, digest string, status int",
    )
    got = scd2_history(df, attr_cols=("digest", "status")).collect()
    assert [(r.version, r.status, r.n_captures) for r in got] == [
        (1, 200, 1),
        (2, 404, 2),
    ]
