"""Snapshot diff (CDC-style) between two crawls of the same keyed table.

Re-crawls of a web corpus produce a new snapshot keyed by url; incremental
processing wants exactly the added / removed / changed keys so downstream
stages (extraction, dedup signatures, index updates) touch only the delta —
at 10^12 rows, reprocessing everything because 0.1% changed is the failure
mode this operator exists to prevent.

Plan: one full-outer shuffle join on the key, comparing content
fingerprints (functions/text.py:fingerprint_col or any stable digest).
When both snapshots are written bucketed on the key (sources/pages.py
layout), the join is co-located — no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    fp_col: str = "fingerprint",
    include_unchanged: bool = False,
) -> DataFrame:
    """-> (key, change, old_fp, new_fp); change in
    {'added','removed','changed'} (+ 'unchanged' when requested)."""
    o = old.select(F.col(key_col).alias("key"), F.col(fp_col).alias("old_fp"))
    n = new.select(F.col(key_col).alias("key"), F.col(fp_col).alias("new_fp"))
    j = o.join(n, "key", "full_outer").select(
        "key",
        "old_fp",
        "new_fp",
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") != F.col("new_fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("change"),
    )
    if not include_unchanged:
        j = j.filter(F.col("change") != "unchanged")
    return j.select("key", "change", "old_fp", "new_fp")


def apply_count_delta(
    old_counts: DataFrame,
    deltas: DataFrame,
    key_col: str = "key",
    n_col: str = "n",
) -> DataFrame:
    """Incremental-view maintenance for grouped counts: merge a (key, dn)
    delta frame into an existing (key, n) aggregate; zero-count keys drop
    out. Equivalent to recomputing the aggregate over the new snapshot, at
    the cost of |delta| instead of |corpus| — the point of keeping a diff.
    """
    o = old_counts.select(F.col(key_col).alias("_k"), F.col(n_col).alias("_n"))
    d = deltas.select(F.col(key_col).alias("_k"), F.col(n_col).alias("_dn"))
    return (
        o.join(d, "_k", "full_outer")
        .select(
            F.col("_k").alias(key_col),
            (
                F.coalesce(F.col("_n"), F.lit(0))
                + F.coalesce(F.col("_dn"), F.lit(0))
            ).alias(n_col),
        )
        .filter(F.col(n_col) > 0)
    )
