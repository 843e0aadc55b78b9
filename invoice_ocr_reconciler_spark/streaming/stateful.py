"""Custom stateful streaming operators (beyond the reference's batch surface).

The reference has no streaming at all (SURVEY.md §2.9); these are the
forward-looking training-data-pipeline pieces over the same pages schema:

- ``dedup_stream``: cross-micro-batch exact dedup — the first document seen
  for a fingerprint wins, across batches AND across query restarts (state
  lives in the Spark state store under the stream checkpoint). This is the
  streaming analog of the batch first-wins duplicate window
  (operators/reconcile.py:with_duplicate_flags; reference semantics at
  backend/reconciliationEngine.js:43-51).
- ``host_window_counts``: per-host event-time windowed counts with a
  watermark — the standard late-data-bounded streaming aggregation.

At 10^12-document scale the state store is the sizing concern: state here is
one boolean-sized row per distinct fingerprint, hash-partitioned by the
group key — the same key layout as the batch dedup exchange.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("fingerprint", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
    ]
)

# state: has this fingerprint been emitted already (and by which url)
DEDUP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("first_url", T.StringType(), False),
    ]
)


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """First url (lexicographic, stable) wins per fingerprint; later batches
    emit nothing for a fingerprint whose state exists."""
    if state.exists:
        # drain the iterator (required) without emitting
        for _ in pdfs:
            pass
        yield pd.DataFrame(columns=[f.name for f in DEDUP_OUT_SCHEMA.fields])
        return
    rows = pd.concat(list(pdfs), ignore_index=True)
    if len(rows) == 0:
        yield pd.DataFrame(columns=[f.name for f in DEDUP_OUT_SCHEMA.fields])
        return
    first = rows.sort_values("url", kind="mergesort").iloc[0]
    state.update((str(first["url"]),))
    yield pd.DataFrame(
        {
            "fingerprint": [key[0]],
            "url": [first["url"]],
            "warc_ts": [first["warc_ts"]],
        }
    )


def dedup_stream(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """Streaming exact dedup: one output row per NEW fingerprint.

    ``pages`` is a streaming frame with (url, warc_ts, <text_col>). The
    fingerprint is the batch pipeline's md5-of-normalized-text (byte parity
    with functions/text.py:fingerprint_col), so batch and stream agree on
    what a duplicate is.
    """
    from invoice_ocr_reconciler_spark.functions.text import fingerprint_col

    keyed = pages.select(
        fingerprint_col(F.col(text_col)).alias("fingerprint"), "url", "warc_ts"
    )
    return keyed.groupBy("fingerprint").applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def host_window_counts(
    pages: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Per-host tumbling event-time window counts, late data bounded by the
    watermark (rows later than max(warc_ts) - watermark are dropped)."""
    from invoice_ocr_reconciler_spark.sources.pages import host_col

    return (
        pages.withWatermark("warc_ts", watermark)
        .select(host_col().alias("host"), "warc_ts")
        .groupBy(F.window("warc_ts", window).alias("w"), "host")
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host",
            "n_pages",
        )
    )


def user_session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Streaming gap sessions via Spark's native session_window: sessions
    merge while events arrive within `gap`, close `gap` after the last event
    once the watermark passes — the streaming analog of the batch
    operators/events.py:sessionize.

    Boundary note: session_window starts a NEW session when the inter-event
    gap is exactly equal to `gap`, while the batch operator keeps it in the
    same session (strict `>` test). With microsecond event times an exact
    tie is a measure-zero case; the batch operator is authoritative.

    State is one (user, open-session) range per key in the state store,
    merged incrementally — no per-event state growth.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), user_col)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 2).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            F.col(user_col),
            "n_events",
            "value_sum",
        )
    )
