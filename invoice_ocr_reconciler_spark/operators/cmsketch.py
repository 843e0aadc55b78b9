"""Count-min sketch — mergeable frequency summaries with a one-sided
error bound (Cormode & Muthukrishnan 2005).

heavy_hitters finds the exact top terms; sketch_quantiles summarizes a
numeric column. This band covers the third classic summary: answer
"how often does ANY term occur" from a table of d x w counters instead
of a vocabulary-sized table. The sketch is the streaming/federated
complement to the exact groupBy — per-shard sketches built
independently merge by cell-wise ADDITION (a groupBy sum), so a
1000-executor fleet can summarize 10^12 rows into d*w longs with one
bounded exchange, and an ingest edge can maintain it incrementally.

Guarantee: est(t) >= true(t) always (counters only over-count via
collisions), and est(t) <= true(t) + eps * N with probability
1 - delta for w = ceil(e/eps), d = ceil(ln(1/delta)) — the published
bound. With the defaults (d=4, w=1024) that is eps ~ 0.27% of total
mass per row pair, delta ~ e^-4.

Exactness contract: the d row hashes are md5_u60 of "cm:<row>:<term>"
(the shared engine-portable hash of functions/text.py) mod w — no RNG,
no seed object; counters are exact BIGINT sums; the estimate is a
least() over d integers. Everything replays in DuckDB verbatim.

Distributed shape: build = one token projection + ONE partial-agg
groupBy whose exchange carries at most d*w rows per map task
(map-side combine does the heavy fold, the sketch_quantiles plan);
estimate = the terms frame hashed the same way, joined to the d*w-row
sketch (broadcast — the sketch is tiny by construction), one
least()-fold groupBy per term. Zero Python.

Reference scope: training-data extension (SURVEY.md §2.12); count-min
is public knowledge (Cormode & Muthukrishnan, "An improved data stream
summary: the count-min sketch and its applications", J. Algorithms
2005).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from invoice_ocr_reconciler_spark.functions.text import md5_u60

DEFAULT_DEPTH = 4  # d hash rows: delta = e^-d
DEFAULT_WIDTH = 1024  # w counters per row: eps = e / w


def _bucket(term, row: int, width: int):
    """Row-salted md5 bucket — the one hash both engines share."""
    return (
        md5_u60(F.concat(F.lit(f"cm:{row}:"), term)) % F.lit(width)
    ).cast("int")


def build_cm_sketch(
    items: DataFrame,
    term_col: str = "term",
    weight_col: str | None = None,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """items(term[, weight]) -> sketch(row, bucket, cnt): at most
    depth * width rows. NULL terms are excluded; without `weight_col`
    every row counts 1. Sketches over different shards (or days) of
    the same (depth, width) config merge with merge_cm_sketches."""
    if depth < 1 or width < 1:
        raise ValueError(f"need depth/width >= 1, got {depth}/{width}")
    term = F.col(term_col).cast("string")
    wgt = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    base = items.where(term.isNotNull()).select(
        term.alias("_t"), wgt.alias("_w")
    )
    rows = base.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("row"),
                        _bucket(F.col("_t"), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell"),
        "_w",
    )
    return (
        rows.groupBy(
            F.col("cell.row").alias("row"),
            F.col("cell.bucket").alias("bucket"),
        )
        .agg(F.sum("_w").cast("long").alias("cnt"))
        # config stamp: cm_estimate / merge read it back so a probe or
        # merge with a mismatched (depth, width) fails loudly instead of
        # silently under-counting
        .select(
            "row",
            "bucket",
            "cnt",
            F.lit(depth).cast("int").alias("depth"),
            F.lit(width).cast("int").alias("width"),
        )
    )


def merge_cm_sketches(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of same-config sketches — the mergeability that
    makes the summary shard-parallel. The config stamp rides through
    (max() of equal values) so the merged sketch stays self-describing;
    mixing configs raises at estimate time via the stamp check."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    stamped = "depth" in out.columns and "width" in out.columns
    agg = [F.sum("cnt").cast("long").alias("cnt")]
    if stamped:
        agg += [
            F.max("depth").cast("int").alias("depth"),
            F.max("width").cast("int").alias("width"),
        ]
    return out.groupBy("row", "bucket").agg(*agg)


def cm_estimate(
    sketch: DataFrame,
    terms: DataFrame,
    term_col: str = "term",
    depth: int | None = None,
    width: int | None = None,
) -> DataFrame:
    """terms(term) -> (term, est): est = min over the d counters the
    term hashes to; a term the sketch never saw estimates as 0 (its
    cells are absent -> coalesce). The join side is the sketch —
    broadcast by construction (d*w rows).

    depth/width default to the values recorded in the sketch's
    metadata columns (build_cm_sketch stamps them) — probing with a
    DIFFERENT config than the build silently under-counts and voids
    the one-sided guarantee, so a config mismatch between an explicit
    argument and the sketch's stamp raises."""
    if "depth" in sketch.columns and "width" in sketch.columns:
        stamped = sketch.select("depth", "width").first()
        if depth is None:
            depth = int(stamped["depth"])
        elif depth != stamped["depth"]:
            raise ValueError(
                f"depth {depth} != sketch's build depth {stamped['depth']}"
            )
        if width is None:
            width = int(stamped["width"])
        elif width != stamped["width"]:
            raise ValueError(
                f"width {width} != sketch's build width {stamped['width']}"
            )
        sketch = sketch.drop("depth", "width")
    else:  # un-stamped sketch frame (e.g. a hand-built cell table)
        depth = DEFAULT_DEPTH if depth is None else depth
        width = DEFAULT_WIDTH if width is None else width
    term = F.col(term_col).cast("string")
    probes = terms.where(term.isNotNull()).select(term.alias("term")).distinct()
    cells = probes.select(
        "term",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("row"),
                        _bucket(F.col("term"), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell"),
    ).select("term", F.col("cell.row").alias("row"), F.col("cell.bucket").alias("bucket"))
    joined = cells.join(broadcast(sketch), ["row", "bucket"], "left").select(
        "term", F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt")
    )
    return joined.groupBy("term").agg(F.min("cnt").cast("long").alias("est"))


def cm_inner_product(sketch_a: DataFrame, sketch_b: DataFrame) -> DataFrame:
    """Join-size / inner-product estimate from two count-min sketches
    (Cormode & Muthukrishnan 2005 §4.2): for each hash row d,
    sum_w A[d][w]·B[d][w] over-counts a·b = sum_t fA(t)·fB(t) only via
    collisions, so min over rows is an UPPER BOUND on the true inner
    product — |R join S on k| estimated from d·w counters per side
    without touching either table again. The classic AQP join-size
    estimator a cost-based planner runs before picking a join strategy.

    Config stamps must match (loud failure, not silent under-count).
    Returns ONE row: (est,). Exact BIGINT arithmetic throughout.
    """
    for s in (sketch_a, sketch_b):
        if "depth" not in s.columns or "width" not in s.columns:
            raise ValueError("sketch missing config stamp")
    a = sketch_a.select(
        "row", "bucket", F.col("cnt").alias("ca"),
        F.col("depth").alias("da"), F.col("width").alias("wa"),
    )
    b = sketch_b.select(
        "row", "bucket", F.col("cnt").alias("cb"),
        F.col("depth").alias("db"), F.col("width").alias("wb"),
    )
    joined = a.join(b, ["row", "bucket"])
    per_row = joined.groupBy("row").agg(
        F.sum(F.col("ca") * F.col("cb")).cast("long").alias("ip"),
        F.max(
            (F.col("da") != F.col("db")) | (F.col("wa") != F.col("wb"))
        ).alias("_mismatch"),
    )
    # sketches are sparse: a hash row with NO colliding buckets proves the
    # true inner product is 0, so left-join per_row onto the full
    # 0..depth-1 row spine and coalesce absent rows to ip=0 — min() then
    # runs over every row (est=0 when any row has zero collisions) instead
    # of a collided-rows subset, and an empty join yields 0, not NULL
    spine = (
        sketch_a.groupBy()
        .agg(F.max("depth").alias("_d"))
        .select(
            F.explode(F.sequence(F.lit(0), F.col("_d") - 1)).alias("row")
        )
    )
    per_row = spine.join(per_row, "row", "left").select(
        F.coalesce(F.col("ip"), F.lit(0)).alias("ip"),
        F.coalesce(F.col("_mismatch"), F.lit(False)).alias("_mismatch"),
    )
    # config check must run on the data actually joined
    return per_row.groupBy().agg(
        F.min("ip").cast("long").alias("est"),
        F.max("_mismatch").alias("_bad"),
    ).select(
        F.when(
            F.col("_bad"),
            F.raise_error("cm_inner_product: mismatched sketch configs"),
        ).otherwise(F.coalesce(F.col("est"), F.lit(0))).alias("est")
    )
