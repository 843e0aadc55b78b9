"""Funnel + retention-cohort operators (operators/events.py).

The funnel is the greedy earliest-advance chain: t1 = first step-1 event,
t_{i+1} = first step-(i+1) event strictly after t_i and within the window.
Every branch the fold can take is pinned here on hand-built event frames:
advance, window expiry, strictly-after (equal ts does NOT advance), wrong
order, stage-0 users, and the summary's cumulative/conversion arithmetic.
"""

import datetime as dt

from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.operators.events import (
    funnel_stages,
    funnel_summary,
    retention_cohorts,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    """rows: (event_id, user_id, minutes_after_t0, event_type)"""
    data = [
        (int(e), int(u), T0 + dt.timedelta(minutes=m), t)
        for (e, u, m, t) in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp_ntz, event_type string"
    )


STEPS = ["signup", "view", "purchase"]


def _stages(spark, rows, window_minutes=60.0):
    df = funnel_stages(
        _ev(spark, rows), STEPS, window_minutes=window_minutes
    )
    return {r.user_id: r for r in df.collect()}


def test_full_conversion_and_times(spark):
    got = _stages(
        spark,
        [
            (1, 1, 0, "signup"),
            (2, 1, 10, "view"),
            (3, 1, 20, "purchase"),
        ],
    )[1]
    assert got.stage_reached == 3
    assert got.t_first == T0
    assert got.t_last == T0 + dt.timedelta(minutes=20)


def test_greedy_uses_first_occurrence_not_best(spark):
    # first signup at t=0; view at t=70 is outside the 60-min window even
    # though a later signup (t=50) would have caught it — greedy semantics
    got = _stages(
        spark,
        [
            (1, 1, 0, "signup"),
            (2, 1, 50, "signup"),
            (3, 1, 70, "view"),
            (4, 1, 80, "purchase"),
        ],
    )[1]
    assert got.stage_reached == 1
    assert got.t_last == T0


def test_window_expiry_stops_funnel(spark):
    got = _stages(
        spark,
        [(1, 1, 0, "signup"), (2, 1, 61, "view"), (3, 1, 62, "purchase")],
    )[1]
    assert got.stage_reached == 1


def test_equal_ts_does_not_advance(spark):
    # view at exactly t1 is not strictly after the signup
    got = _stages(
        spark, [(1, 1, 5, "signup"), (2, 1, 5, "view")]
    )[1]
    assert got.stage_reached == 1


def test_out_of_order_steps_do_not_count(spark):
    got = _stages(
        spark,
        [(1, 1, 0, "view"), (2, 1, 5, "purchase"), (3, 1, 10, "signup")],
    )[1]
    assert got.stage_reached == 1  # only the trailing signup counts


def test_stage_zero_user_kept(spark):
    got = _stages(spark, [(1, 1, 0, "view"), (2, 2, 0, "signup")])
    assert got[1].stage_reached == 0
    assert got[1].t_first is None and got[1].t_last is None
    assert got[2].stage_reached == 1


def test_unbounded_window(spark):
    got = _stages(
        spark,
        [(1, 1, 0, "signup"), (2, 1, 10_000, "view"), (3, 1, 20_000, "purchase")],
        window_minutes=None,
    )[1]
    assert got.stage_reached == 3


def test_summary_cumulative_and_conversions(spark):
    rows = [
        # u1 completes; u2 reaches view; u3 reaches signup; u4 stage 0
        (1, 1, 0, "signup"), (2, 1, 1, "view"), (3, 1, 2, "purchase"),
        (4, 2, 0, "signup"), (5, 2, 1, "view"),
        (6, 3, 0, "signup"),
        (7, 4, 0, "view"),
    ]
    out = funnel_summary(_ev(spark, rows), STEPS, window_minutes=60.0)
    got = [(r.stage, r.step, r.n_users, r.conv_from_first, r.conv_from_prev)
           for r in out.collect()]
    assert got == [
        (1, "signup", 3, 1.0, 1.0),
        (2, "view", 2, 0.666667, 0.666667),
        (3, "purchase", 1, 0.333333, 0.5),
    ]


def test_summary_drops_empty_tail_stage(spark):
    out = funnel_summary(
        _ev(spark, [(1, 1, 0, "signup")]), STEPS, window_minutes=60.0
    )
    assert [(r.stage, r.n_users) for r in out.collect()] == [(1, 1)]


def test_retention_matrix(spark):
    # u1 first week w0, active w0+w2; u2 first w0, active w0 only;
    # u3 first w2, active w2+w3
    rows = [
        (1, 1, 0, "purchase"),
        (2, 1, 14 * 24 * 60, "purchase"),
        (3, 2, 60, "purchase"),
        (4, 3, 14 * 24 * 60 + 5, "purchase"),
        (5, 3, 21 * 24 * 60, "purchase"),
    ]
    out = retention_cohorts(_ev(spark, rows))
    got = [
        (str(r.cohort_week), r.offset_weeks, r.n_active, r.cohort_size,
         r.retention)
        for r in out.collect()
    ]
    assert got == [
        ("2024-01-01", 0, 2, 2, 1.0),
        ("2024-01-01", 2, 1, 2, 0.5),
        ("2024-01-15", 0, 1, 1, 1.0),
        ("2024-01-15", 1, 1, 1, 1.0),
    ]


def test_retention_week_is_monday_truncated(spark):
    # 2024-01-07 is a Sunday -> cohort week 2024-01-01
    rows = [(1, 1, 6 * 24 * 60, "purchase")]
    out = retention_cohorts(_ev(spark, rows)).collect()
    assert str(out[0].cohort_week) == "2024-01-01"
