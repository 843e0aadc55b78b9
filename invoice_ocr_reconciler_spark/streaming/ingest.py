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
