"""Small shared plan utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def with_scan_parallelism(df: DataFrame) -> DataFrame:
    """Ensure a CPU-bound stage is fed at least defaultParallelism partitions.

    A small corpus in one parquet file yields ONE scan split, which serializes
    every downstream Arrow/pandas UDF onto a single core. When the upstream
    partition count is below the cluster's default parallelism, repartition up
    — exactly the case where the extra exchange is cheap (the data is small by
    construction). At web scale the scan has thousands of file splits and this
    is a no-op, so the hot path never pays the shuffle.

    Values are partition-invariant everywhere this is used (pure per-row
    functions; pinned by the two-parallelism determinism tests).
    """
    if df.isStreaming:  # .rdd is illegal on streaming frames; micro-batch
        return df  # parallelism is the source's concern (maxFilesPerTrigger)
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
