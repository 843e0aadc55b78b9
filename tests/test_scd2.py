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


def test_duplicate_payments_window_rule(spark):
    import datetime as dt

    from invoice_ocr_reconciler_spark.operators.mutate import (
        duplicate_payments,
    )

    d = dt.date(2024, 1, 10)
    rows = [
        # (id, payer, amount, date)
        (1, 7, 100.0, d),
        (2, 7, 100.0, d + dt.timedelta(days=3)),    # dup of 1
        (3, 7, 100.0, d + dt.timedelta(days=20)),   # outside window
        (4, 7, 250.0, d + dt.timedelta(days=1)),    # different amount
        (5, 8, 100.0, d + dt.timedelta(days=2)),    # different payer
        (6, 7, 100.0, d + dt.timedelta(days=22)),   # dup of 3 (chain)
    ]
    df = spark.createDataFrame(
        rows, "payment_id long, payer long, amount double, pay_date date"
    )
    got = {r.payment_id: r for r in duplicate_payments(
        df, key_cols=("payer",)).collect()}
    assert set(got) == {2, 6}
    assert got[2].prev_id == 1 and got[2].gap_days == 3
    assert got[6].prev_id == 3 and got[6].gap_days == 2


def test_duplicate_payments_same_day_tiebreak(spark):
    import datetime as dt

    from invoice_ocr_reconciler_spark.operators.mutate import (
        duplicate_payments,
    )

    d = dt.date(2024, 2, 1)
    df = spark.createDataFrame(
        [(9, 1, 50.0, d), (4, 1, 50.0, d)],
        "payment_id long, payer long, amount double, pay_date date",
    )
    got = duplicate_payments(df, key_cols=("payer",)).collect()
    # same-day pair: lower id is "first", higher id flagged with gap 0
    assert [(r.payment_id, r.prev_id, r.gap_days) for r in got] == [
        (9, 4, 0)
    ]
