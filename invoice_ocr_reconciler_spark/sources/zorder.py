"""Z-order (Morton) clustering layout: multi-column data skipping.

A single-column sorted layout gives tight per-file min/max bounds on THAT
column and useless (~full-range) bounds on every other: a conjunctive
predicate `date BETWEEN .. AND price BETWEEN ..` can only skip on one
dimension. Interleaving the bits of both columns' bucket positions (the
Morton / Z-order curve — public technique behind Delta's OPTIMIZE ZORDER
and Iceberg's sort-order rewrites) makes file boundaries axis-aligned
boxes in 2-D value space: per-file bounds are moderately tight on BOTH
columns, so 2-D box predicates prune most files. At 100 TB this is the
difference between scanning one dimension's survivors (often most of the
table) and scanning a few true intersecting files.

Everything here is whole-stage-codegen column arithmetic, one pass:
  - bucketize each column into 2^bits uniform cells between its global
    min/max (ONE tiny agg, broadcast back via a 1-row cross join —
    uniform cells keep the formula exactly replayable in the DuckDB
    oracle; production corpora with heavy skew should swap in
    approxQuantile boundaries, same interleave, noted below);
  - interleave the bucket bits into the Morton key;
  - chunk = the key's top bits — a DETERMINISTIC contiguous-range
    assignment (unlike repartitionByRange's sampled partitioner), so the
    layout, its per-chunk bounds, and the oracle replay are all pure
    functions of the data.

Reference scope: the reference app (single SQLite file) has no physical
layout; this is part of the 100 TB re-architecture (SURVEY.md §2.12).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

BITS = 8  # cells per dimension = 2^BITS


def _bucket(v: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Uniform cell index 0..2^bits-1 of v between [mn, mx]; a constant
    column (mx == mn) lands every row in cell 0. NULL values land in cell
    0 too (min/max aggs ignore them, so they have no position on the
    axis): a NULL zkey would otherwise drop the row into a nondeterminism
    bucket (Hive default partition) outside every chunk's stats."""
    n = 1 << bits
    span = mx - mn
    raw = F.floor((v - mn) / span * n)
    # the NULL guard must come FIRST: least(n-1, NULL) is n-1 (least skips
    # NULLs), which silently dropped NULL rows into the TOP cell
    return (
        F.when(v.isNull(), F.lit(0))
        .when(span > 0, F.least(F.lit(n - 1), raw))
        .otherwise(F.lit(0))
    ).cast("long")


def _interleave(x: Column, y: Column, bits: int) -> Column:
    """Morton key: bit k of x -> bit 2k, bit k of y -> bit 2k+1."""
    z = F.lit(0).cast("long")
    for k in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, k).bitwiseAND(F.lit(1)), 2 * k)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, k).bitwiseAND(F.lit(1)), 2 * k + 1)
        )
    return z


def zorder_key(
    df: DataFrame, col_x: Column, col_y: Column, bits: int = BITS
) -> DataFrame:
    """Append `zkey` (Morton order of the two columns' uniform cells).

    The min/max agg is one job over two pruned columns; the 1-row result
    joins back as a broadcast cross join, so the keying pass itself is a
    single codegen projection over the scan.
    """
    bounds = df.agg(
        F.min(col_x).alias("_mnx"),
        F.max(col_x).alias("_mxx"),
        F.min(col_y).alias("_mny"),
        F.max(col_y).alias("_mxy"),
    )
    bx = _bucket(col_x, F.col("_mnx"), F.col("_mxx"), bits)
    by = _bucket(col_y, F.col("_mny"), F.col("_mxy"), bits)
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("zkey", _interleave(bx, by, bits))
        .drop("_mnx", "_mxx", "_mny", "_mxy")
    )


def zorder_chunk_stats(
    df: DataFrame,
    col_x: Column,
    col_y: Column,
    n_chunks_log2: int = 6,
    bits: int = BITS,
) -> DataFrame:
    """Per-chunk row counts and min/max bounds of both columns under the
    z-order layout — the skipping metadata a lakehouse table format would
    store per file. chunk = zkey's top `n_chunks_log2` bits (contiguous
    Morton ranges, deterministic). Returns (chunk, n_rows, min_x, max_x,
    min_y, max_y) — the evidence that BOTH columns' per-chunk spans are
    bounded, which is what makes 2-D box predicates prune.
    """
    shift = 2 * bits - n_chunks_log2
    keyed = zorder_key(df, col_x, col_y, bits).withColumn(
        "chunk", F.shiftright(F.col("zkey"), shift).cast("int")
    )
    return keyed.groupBy("chunk").agg(
        F.count("*").alias("n_rows"),
        F.round(F.min(col_x), 6).alias("min_x"),
        F.round(F.max(col_x), 6).alias("max_x"),
        F.round(F.min(col_y), 6).alias("min_y"),
        F.round(F.max(col_y), 6).alias("max_y"),
    )


def write_zorder_layout(
    df: DataFrame,
    col_x: Column,
    col_y: Column,
    path: str,
    n_chunks_log2: int = 6,
    bits: int = BITS,
) -> None:
    """Materialize the layout: one parquet directory per Morton chunk,
    rows z-sorted within each — the physical form whose directory/file
    stats a reader (or Iceberg/Delta metadata) skips on."""
    shift = 2 * bits - n_chunks_log2
    keyed = zorder_key(df, col_x, col_y, bits).withColumn(
        "chunk", F.shiftright(F.col("zkey"), shift).cast("int")
    )
    (
        keyed.repartition("chunk")
        .sortWithinPartitions("zkey")
        .write.mode("overwrite")
        .partitionBy("chunk")
        .parquet(path)
    )


def pruning_fraction(
    stats: list,
    x_lo: float,
    x_hi: float,
    y_lo: float,
    y_hi: float,
) -> float:
    """Fraction of chunks a 2-D box predicate can SKIP given their bounds
    (collected rows of zorder_chunk_stats). Pure metadata arithmetic —
    exactly what a min/max-pruning reader computes before touching data."""
    if not stats:
        return 0.0
    skipped = sum(
        1
        for r in stats
        if r["max_x"] < x_lo
        or r["min_x"] > x_hi
        or r["max_y"] < y_lo
        or r["min_y"] > y_hi
    )
    return skipped / len(stats)
