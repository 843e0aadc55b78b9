"""Shuffle-skew diagnostics: measure a key's partition balance BEFORE
paying for the shuffle it would drive.

At 100 TB the difference between a 40-minute job and a 12-hour straggler
is usually ONE hot key. This operator answers, from a cheap
key-cardinality pass, the question every groupBy/join plan review asks:
"if I shuffle on these keys into P partitions, what lands where?" —
per-partition row mass, key counts, the heaviest key, and integer-exact
hot flags. It is the measurement half of the salting/AQE mitigation
already used by `sources/pages.py:detect_hot_hosts` and the skew-salted
aggregation plan (the fix half); run this first, salt what it flags.

Scale shape: ONE partial-agg groupBy over the key columns (map-side
combine collapses the corpus to key cardinality), then a second groupBy
at KEY cardinality onto the modelled partition id, then a 1-row totals
broadcast — nothing after the first agg ever touches corpus-sized data,
and the diagnostic itself cannot become the straggler it hunts.

Partition model: ``portable=True`` (default) places keys with the repo's
engine-portable md5 bucket (sampling.hash_bucket_col) so the DuckDB
oracle replays placement bit-for-bit — a uniform-hash MODEL of Spark's
HashPartitioner, same placement statistics, different constants.
``portable=False`` uses Spark's real Murmur3 (`F.hash`) — the exact
partition ids a real exchange would produce (not oracle-replayable; the
unit tests pin it instead).

All report arithmetic is integer-exact cross-engine: shares in ppm via
floor division, hot flags as products (n_rows * P > factor * total), the
top key via a zero-padded count||key string max — no float anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.operators.sampling import hash_bucket_col

# unit separator joins key COLUMNS; record separator splits count||key —
# they must differ, or the top-key extraction of a multi-column key would
# return only the key's last column
_SEP = "\x1f"
_CK_SEP = "\x1e"


def skew_report(
    df: DataFrame,
    key_cols: list[str],
    n_partitions: int = 32,
    hot_factor: int = 2,
    portable: bool = True,
) -> DataFrame:
    """Per-modelled-partition balance report for a prospective shuffle key.

    -> one row per NON-EMPTY partition: (partition, n_rows, n_keys,
    max_key_rows, top_key, share_ppm, hot) where
      - top_key: the heaviest key routed there (ties: lexicographically
        largest key — deterministic under any partitioning),
      - share_ppm: floor(n_rows * 1e6 / total_rows) — integer exact,
      - hot: n_rows * n_partitions > hot_factor * total_rows, i.e. the
        partition carries more than hot_factor x its fair share (pure
        integer product — both engines agree on every borderline).

    Keys are compared as strings (NULL folds to '' — NULL keys all hash
    together, which is exactly the skew hazard worth surfacing).
    """
    if not key_cols:
        raise ValueError("key_cols must name at least one column")
    key = F.concat_ws(
        _SEP, *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in key_cols]
    )
    keyed = df.select(key.alias("key")).groupBy("key").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    if portable:
        part = hash_bucket_col(F.col("key"), n_partitions)
    else:
        part = F.pmod(F.hash(F.col("key")), F.lit(n_partitions)).cast("long")
    # zero-padded count || sep || key: max() picks (count, key) lexicographic
    tagged = keyed.select(
        part.alias("partition"),
        "cnt",
        F.concat(
            F.lpad(F.col("cnt").cast("string"), 20, "0"), F.lit(_CK_SEP), F.col("key")
        ).alias("ck"),
    )
    per_part = tagged.groupBy("partition").agg(
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_key_rows"),
        F.substring_index(F.max("ck"), _CK_SEP, -1).alias("top_key"),
    )
    totals = keyed.agg(F.sum("cnt").alias("_total"))
    return (
        per_part.crossJoin(F.broadcast(totals))
        .select(
            "partition",
            "n_rows",
            "n_keys",
            "max_key_rows",
            "top_key",
            # bigint `div`: true integer division (a double divide + cast
            # can land at x.99999... and truncate one off the exact ppm)
            F.expr("(n_rows * 1000000L) div _total").alias("share_ppm"),
            (
                F.col("n_rows") * F.lit(n_partitions)
                > F.lit(hot_factor) * F.col("_total")
            ).alias("hot"),
        )
    )
