"""Mergeable quantile sketch — log-bucketed histograms for corpus metrics.

operators/events.py's grouped percentiles are EXACT but shuffle every row
by group; at 10^12 rows a monitoring pipeline wants the sketch trade
instead: a bounded table of log-spaced buckets (the HdrHistogram /
DDSketch idea — relative-error quantiles from exponent buckets) that is
  - one partial-agg groupBy whose exchange is <= n_buckets cells per map
    task regardless of corpus size (like operators/sketch.py count-min),
  - mergeable across days / partitions / clusters by cell-wise addition,
  - INTEGER END TO END: bucket ids come from the binary length of the
    value (floor(log2) with no floating log), bounds from integer
    shifts/divisions, and quantile estimates are bucket lower bounds —
    so estimates are bit-identical across engines and parallelism, and
    the DuckDB oracle replays the whole pipeline value-exactly.

Guarantee: for nonneg integer metrics (n_chars, token counts, byte
sizes, latencies), a bucket at exponent e >= log2(m) spans
[lo, lo + 2^e/m), so the estimate's relative error is < 1/m (6.25% at
the default m=16); values below 2^log2(m) get EXACT single-value
buckets. The nearest-rank quantile definition is rank = ceil(p*N/100)
(classic nearest-rank, integer ceiling division).

Scope: values must fit in int64 with headroom (v < 2^55 documented);
NULL and negative values are excluded (they carry no magnitude).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SUB_BUCKETS = 16  # m: sub-buckets per octave — power of two, rel. err < 1/m


def quantile_sketch(
    df: DataFrame, value_col: str, m: int = SUB_BUCKETS
) -> DataFrame:
    """The sketch as a (e, sub, lo, cnt) table, <= 64*m + 1 rows.

    e = floor(log2(v)) via binary-string length (never a floating log —
    log2(2^53-1) vs ulp rounding can flip a floor); sub = which of m
    equal slices of the octave; lo = the bucket's exact lower bound.
    Values in octaves narrower than m (v < m) land in width-1 buckets
    (exact). v = 0 is its own bucket (e = -1, lo = 0)."""
    if m < 1 or (m & (m - 1)) != 0:
        raise ValueError("m must be a power of two")
    v = F.col(value_col).cast("long")
    base = df.select(v.alias("v")).filter(v.isNotNull() & (v >= 0))
    e = F.when(F.col("v") == 0, F.lit(-1)).otherwise(
        F.length(F.conv(F.col("v").cast("string"), 10, 2)) - 1
    )
    withp = base.select(
        "v",
        e.cast("int").alias("e"),
    ).select(
        "v",
        "e",
        F.expr(
            "CASE WHEN e < 0 THEN CAST(0 AS BIGINT) "
            "ELSE shiftleft(CAST(1 AS BIGINT), e) END"
        ).alias("p"),
    )
    # all-integer bucket math: p is a power of two, and when p >= m the
    # slice width p div m is exact (m a power of two); Spark's `/` on
    # longs is DOUBLE division, so every division here is F.expr(' div ')
    width = F.expr(f"p div {m}")
    with_sub = withp.withColumn(
        "sub",
        F.when(F.col("e") < 0, F.lit(0).cast("long"))
        .when(F.col("p") < m, F.col("v") - F.col("p"))
        .otherwise(F.expr(f"(v - p) div (p div {m})")),
    )
    with_lo = with_sub.withColumn(
        "lo",
        F.when(F.col("e") < 0, F.lit(0).cast("long"))
        .when(F.col("p") < m, F.col("v"))
        .otherwise(F.col("p") + F.col("sub") * width),
    )
    return (
        with_lo.groupBy("e", "sub", "lo")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_sketches(*sketches: DataFrame) -> DataFrame:
    """Cell-wise addition — the mergeability that makes the sketch worth
    its error bound (per-day sketches roll up without rescanning)."""
    it = iter(sketches)
    out = next(it)
    for s in it:
        out = out.unionByName(s)
    return out.groupBy("e", "sub", "lo").agg(F.sum("cnt").alias("cnt"))


def sketch_quantiles(
    sketch: DataFrame, percentiles: list[int]
) -> DataFrame:
    """(pct, n_total, rank, est_lo) per requested integer percentile —
    nearest-rank over the cumulative bucket counts; est_lo is the lower
    bound of the bucket containing that rank (all integers).

    The cumulative window is a single partition over the BOUNDED sketch
    table (<= 64*m+1 rows) — the point of sketching is that this final
    step is driver-scale no matter the corpus."""
    w = Window.orderBy("e", "sub").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = sketch.select(
        "e", "sub", "lo", "cnt", F.sum("cnt").over(w).alias("cum")
    )
    total = cum.agg(F.sum("cnt").cast("long").alias("n_total"))
    pcts = ", ".join(str(int(p)) for p in percentiles)
    ps = total.selectExpr(
        "n_total", f"explode(array({pcts})) AS pct"
    ).select(
        "pct",
        "n_total",
        F.greatest(
            F.lit(1).cast("long"),
            F.expr("(pct * n_total + 99) div 100"),  # ceil, integer-exact
        ).alias("rank"),
    )
    hit = ps.join(cum, F.col("cum") >= F.col("rank"), "left").groupBy(
        "pct", "n_total", "rank"
    ).agg(F.min("lo").alias("est_lo"))
    return hit.orderBy("pct")
