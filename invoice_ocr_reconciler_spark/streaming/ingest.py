"""Optional continuous ingestion via Structured Streaming (SURVEY.md §2.9).

The reference is strictly request/response batch, and batch-incremental
resume (resume.py) is the parity mechanism. This module is the forward-
looking path: a file-source stream over arriving pages parquet, the SAME
extraction mapInPandas stage, and an AvailableNow-triggered sink — so a
landing zone can be drained incrementally with Spark-managed checkpoints
instead of our per-bucket manifest. Per-row purity makes the two modes
byte-equivalent per url.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from invoice_ocr_reconciler_spark.datagen import PAGES_SCHEMA
from invoice_ocr_reconciler_spark.extraction.udfs import extract_pages


def read_pages_stream(spark: SparkSession, landing_path: str, max_files: int = 64) -> DataFrame:
    """File-source stream over a landing directory of pages parquet."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(landing_path)
    )


def start_extract_stream(
    spark: SparkSession,
    landing_path: str,
    output_path: str,
    checkpoint_path: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Drain the landing zone through extraction into parquet.

    ``available_now=True`` processes everything present then stops (the
    batch-drain trigger); False runs continuously per micro-batch.
    """
    stream = read_pages_stream(spark, landing_path)
    extracted = extract_pages(stream)
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_writeback_stream(
    spark: SparkSession,
    results_landing_path: str,
    results_schema,
    table_path: str,
    output_path: str,
    checkpoint_path: str,
    status_col: str = "status",
    inv_key: str = "url",
    res_key: str = "invoice_url",
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming status write-back: drain arriving reconciliation results
    and MERGE each micro-batch's statuses into the invoices table — the
    continuous analog of the reference's per-result UPDATE loop
    (backend/server.js:531-550) built from the same batch operator
    (operators/mutate.py:status_writeback) via foreachBatch.

    Each micro-batch rewrites ``output_path`` from the CURRENT table state
    (read fresh every batch so consecutive batches compound) — exactly-once
    per batch rides on Spark's streaming checkpoint (batch id replay is
    idempotent: the write-back of the same results is a no-op overwrite).
    On Iceberg, foreachBatch would issue MERGE INTO snapshot commits; here
    the parquet stand-in swaps output atomically per batch.

    A micro-batch carrying TWO results for one url fails the batch (the
    underlying MERGE enforces key-unique updates) instead of fanning the
    invoice row out — producers must emit one result per url per batch;
    across batches later updates compound normally.
    """
    import os
    import shutil

    from invoice_ocr_reconciler_spark.operators.mutate import status_writeback

    def apply_batch(results_batch: DataFrame, batch_id: int) -> None:
        if not results_batch.take(1):
            return
        src = output_path if os.path.isdir(output_path) else table_path
        current = spark.read.parquet(src)
        updated = status_writeback(
            current, results_batch, status_col=status_col,
            inv_key=inv_key, res_key=res_key,
        )
        tmp = f"{output_path}__batch{batch_id}"
        updated.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(output_path):
            shutil.rmtree(output_path)
        os.replace(tmp, output_path)

    stream = (
        spark.readStream.schema(results_schema)
        .option("maxFilesPerTrigger", 64)
        .json(results_landing_path)
    )
    writer = stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_cdx_stream(
    spark: SparkSession,
    landing_path: str,
    out_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Continuous capture-index maintenance: drain arriving pages parquet
    through the CDX projection into an append-only index directory.

    The streaming complement of sources/cdx.cdx_merge: a monthly batch
    merge re-sorts the world; this keeps a LIVE index current as crawl
    segments land. The projection is the same pure-codegen cdx_index
    column set (sort=False — per-microbatch range sorting would fight
    the file source; compact with cdx_merge on a schedule, the classic
    hot/cold index split). File-source + checkpoint gives exactly-once
    appends across restarts; Trigger.AvailableNow drains the backlog
    and stops, which is also how the test pins semantics.
    """
    from invoice_ocr_reconciler_spark.sources.cdx import cdx_index

    stream = (
        spark.readStream.schema(
            "url string, warc_ts timestamp, html binary, text string, lang string"
        )
        .option("maxFilesPerTrigger", 64)
        .parquet(landing_path)
    )
    idx = cdx_index(stream, sort=False)
    writer = (
        idx.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_dedup_stream(
    spark: SparkSession,
    landing_path: str,
    output_path: str,
    checkpoint_path: str,
    dedup_within: str = "1 hour",
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming exact URL dedup at the ingest edge: drop re-fetches of a
    url that arrive within the watermark horizon, BEFORE the expensive
    extraction stage runs on them.

    Built on ``dropDuplicatesWithinWatermark`` (not plain
    ``dropDuplicates``): the dedup state for a url is EVICTED once the
    watermark passes ``warc_ts + dedup_within``, so state is bounded by
    the re-fetch horizon instead of growing with the full crawl history —
    the only shape that survives a 10^12-capture stream. Re-captures
    farther apart than the horizon are intentionally kept (they are
    legitimate revisits; cross-horizon collapse belongs to the batch CDX
    `cdx_latest` view, and full-history custom state to
    streaming/stateful.py's dedup_stream).
    """
    stream = read_pages_stream(spark, landing_path)
    deduped = stream.withWatermark("warc_ts", dedup_within).dropDuplicatesWithinWatermark(
        ["url"]
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
