"""Bucketed tables: shuffle-free (co-located) joins for repeated big joins.

The parquet ``url_bucket=K/`` layout (sources/pages.py) gives PRUNING but
Spark's planner cannot prove co-partitioning from directory names alone —
a join of two such tables still exchanges both sides. Spark's native
bucketing (``DataFrameWriter.bucketBy(n, key).sortBy(key)`` +
``saveAsTable``) records the bucket spec in the catalog, so a join of two
tables bucketed on the SAME key with the SAME bucket count plans as a
SortMergeJoin with ZERO Exchange operators: at 100 TB the dominant cost of
a fact-fact join (re-shuffling both sides every run) is paid ONCE at write
time and amortized over every subsequent join/groupBy on the bucket key.
This is the session-catalog analog of Iceberg's storage-partitioned join
over ``bucket(N, key)`` transforms (the production target; session.py
gate) — identical physical idea, different metadata layer.

Scale notes:
  - bucket count sizes the per-task work of every future join: at 10^12
    rows pick buckets so one bucket of the LARGER table fits an executor
    (e.g. 2^13-2^15), never the default.
  - ``sortBy(key)`` makes each bucket file sorted, so the SMJ's per-task
    sort also disappears for key-ordered reads.
  - one-side-bucketed joins still save one Exchange (Spark shuffles only
    the unbucketed side when bucket counts allow).

Reference scope: the reference app (single SQLite file,
/root/reference/backend/db.js) has no physical-layout controls at all;
this module is part of the 100 TB re-architecture (SURVEY.md §4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog table bucketed (and bucket-sorted) on
    ``key``. Format is parquet; the bucket spec lives in the session
    catalog, which is what lets the planner elide the join exchange.
    ``path`` makes the table external (data at that location) — without it
    Spark writes into the session warehouse directory, which defaults to
    ``cwd/spark-warehouse``; always pass it in library/test contexts."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, key)
    if path:
        w = w.option("path", path)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_equi_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-key same-count bucketed tables: SMJ, no Exchange."""
    return spark.table(left_table).join(spark.table(right_table), key, how)


def bucketed_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: orders x customer as same-key bucketed tables, then a
    co-located SortMergeJoin + bucket-key rollup — ZERO shuffle exchanges
    end to end (tests/test_bucketed.py asserts exchange_count == 0, and 2
    on the unbucketed control). The one-time bucketed write is the cost
    this layout amortizes; every later join/agg on custkey rides free.

    Tables are session-scoped (in-memory catalog) with data under /tmp
    keyed by the input dir, so repeated calls overwrite deterministically.
    The merge hint pins SMJ: at sf0.01 the planner would otherwise
    broadcast the small side (also exchange-free, but then the run would
    not witness the bucketed path this query exists to demonstrate).
    """
    import hashlib

    from pyspark.sql import functions as F

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = f"/tmp/spark_graft_bucketed/{tag}"
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .withColumnRenamed("o_custkey", "custkey")
    )
    customer = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .withColumnRenamed("c_custkey", "custkey")
    )
    lt, rt = f"bk_orders_{tag}", f"bk_customer_{tag}"
    for df, name, sub in ((orders, lt, "orders"), (customer, rt, "customer")):
        write_bucketed(df, name, "custkey", 8, path=f"{base}/{sub}")
    return (
        spark.table(lt)
        .join(spark.table(rt).hint("merge"), "custkey")
        .groupBy("custkey", "c_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
        )
    )


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the EXECUTED plan.

    The evidence function for co-location claims: a co-located bucketed
    join must report 0. Uses the final (post-AQE) physical plan string —
    counts only shuffle exchanges, not broadcast exchanges, since a
    broadcast is precisely the other legitimate way to avoid a shuffle.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    )
