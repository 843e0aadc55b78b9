"""Pages-table storage: explicit hash partitioning on url + skew salting.

The north_rule requires explicit hash partitioning on ``url`` and salting of
skewed hosts. Production target is Iceberg ``PARTITIONED BY (bucket(N, url))``
with snapshot-commit writes (the Iceberg catalog gate lives in session.py);
in the sandbox (no Iceberg jar) the same layout is realized as Parquet under
``url_bucket=K/`` directories — identical pruning + co-location semantics,
different metadata layer. Cited mapping: SURVEY.md §1.3, §4.3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 64


def url_bucket_col(n_buckets: int = DEFAULT_BUCKETS):
    """Deterministic hash bucket of url (xxhash64, sign-folded)."""
    return F.pmod(F.xxhash64(F.col("url")), F.lit(n_buckets)).cast("int")


def host_col():
    return F.regexp_extract(F.col("url"), r"^https?://([^/]+)/", 1)


def detect_hot_hosts(pages: DataFrame, top_n: int = 8, min_share: float = 0.01) -> list[str]:
    """Frequency-sketch pass for skew: hosts above min_share of the corpus.

    ONE job / one column-pruned scan of url: the corpus total is folded into
    the same aggregation as a window over the grouped counts (the round-1
    shape ran pages.count() first — a second full scan per pipeline run).
    The window's single-partition input is the per-HOST count frame, already
    collapsed by the partial+final agg, not the page rows; the subsequent
    orderBy().limit() is a distributed TakeOrdered over <= 1/min_share
    qualifying rows, not a full sort."""
    w_all = Window.partitionBy()
    hot = (
        pages.select(host_col().alias("host"))
        .groupBy("host")
        .count()
        .withColumn("total", F.sum("count").over(w_all))
        .filter(F.col("count") >= F.col("total") * min_share)
        # host asc tiebreak: equal-count hosts otherwise make the top-N cut
        # nondeterministic, which would break checkpoint-rerun salt parity
        .orderBy(F.col("count").desc(), F.col("host"))
        .limit(top_n)
        .collect()
    )
    return [r["host"] for r in hot]


def salt_hot_hosts(pages: DataFrame, hot_hosts: list[str], salt_buckets: int = 16) -> DataFrame:
    """Deterministic salt column: hot hosts spread over ``salt_buckets``
    sub-keys, cold hosts keep salt 0. Salt is a pure function of url
    (xxhash64) so reruns checkpoint-match (SURVEY.md §4.3-2)."""
    host = host_col()
    is_hot = host.isin(hot_hosts) if hot_hosts else F.lit(False)
    salt = F.when(is_hot, F.pmod(F.xxhash64(F.col("url"), F.lit(1)), F.lit(salt_buckets))).otherwise(
        F.lit(0)
    )
    return pages.withColumn("host", host).withColumn("salt", salt.cast("int"))


def write_pages_bucketed(
    pages: DataFrame, path: str, n_buckets: int = DEFAULT_BUCKETS, mode: str = "overwrite"
) -> None:
    """Write hash-partitioned on url: url_bucket=K directories, one sorted
    file per bucket partition (min/max url file skipping downstream)."""
    (
        pages.withColumn("url_bucket", url_bucket_col(n_buckets))
        .repartition(n_buckets, "url_bucket")
        .sortWithinPartitions("url")
        .write.partitionBy("url_bucket")
        .mode(mode)
        .parquet(path)
    )


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def compact_pages_bucketed(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    n_buckets: int | None = None,
) -> dict:
    """Small-file compaction for the url_bucket=K layout.

    Incremental ingest (streaming micro-batches, per-bucket resumable
    appends) accumulates many small parquet files per bucket; at scale the
    resulting task explosion + footer overhead dominates scan cost. This
    rewrites the table so each bucket holds ceil(bucket_bytes /
    target_file_bytes) url-sorted files, preserving the bucket layout
    (url_bucket column and directory scheme) and every row byte-for-byte.

    The rewrite lands in `<path>.compacting` and atomically swaps in via
    rename (the parquet stand-in for Iceberg's rewrite_data_files +
    snapshot commit; on object stores the swap is the catalog pointer
    flip). Returns {files_before, files_after, rows}.
    """
    import glob
    import os
    import shutil

    files_before = len(glob.glob(os.path.join(path, "url_bucket=*", "*.parquet")))
    df = spark.read.parquet(path)  # url_bucket comes back as a partition col
    if n_buckets is None:
        n_buckets = (
            df.agg(F.max("url_bucket").alias("m")).collect()[0]["m"] or 0
        ) + 1
    total_bytes = sum(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(path, "url_bucket=*", "*.parquet"))
    )
    per_bucket_files = max(
        1, int(-(-total_bytes // n_buckets // target_file_bytes))
    )
    tmp = path.rstrip("/") + ".compacting"
    shutil.rmtree(tmp, ignore_errors=True)
    # deterministic sub-file id INSIDE each bucket: repartitioning on the
    # raw url would scatter a bucket across partitions and re-create one
    # small file per (task, bucket) pair — the exact problem being fixed
    sub = F.pmod(F.xxhash64(F.col("url")), F.lit(per_bucket_files))
    (
        df.withColumn("_sub", sub)
        .repartition(n_buckets * per_bucket_files, "url_bucket", F.col("_sub"))
        .sortWithinPartitions("url_bucket", "_sub", "url")
        .drop("_sub")
        .write.partitionBy("url_bucket")
        .mode("overwrite")
        .parquet(tmp)
    )
    rows = spark.read.parquet(tmp).count()
    old = path.rstrip("/") + ".compacted-old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    files_after = len(glob.glob(os.path.join(path, "url_bucket=*", "*.parquet")))
    return {"files_before": files_before, "files_after": files_after, "rows": rows}
