"""Count-min sketch heavy hitters — mergeable frequency estimates.

The Cormode & Muthukrishnan 2005 sketch, expressed as plain DataFrame
aggregation: cell (d, b) holds count of rows whose key hashes to bucket b
under hash family member d; the estimate for a key is min over d of its
cells — always an OVER-estimate (never under), with error <= 2N/width at
probability 1 - (1/2)^depth.

Why a sketch when groupBy(key) is exact? The sketch table is depth*width
rows NO MATTER the key cardinality: at 10^12 URLs a per-key groupBy
shuffles billions of distinct keys, the sketch shuffles <= 4096 cells
(map-side combine collapses everything else), is mergeable across
days/partitions by cell-wise addition, and can serve point queries without
rescanning the corpus.

Candidate enumeration (a sketch cannot list keys) uses the repo's
deterministic md5 row-sample: any key covering >= ~1/sample_pct rows
appears in the sample w.h.p.; the documented miss-risk is keys hot enough
to matter but absent from the sample — raise sample_pct or feed a known
key list. Hash buckets use the same md5-prefix idiom as
operators/sampling.py, so the whole pipeline is value-replayable in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.operators.sampling import hash_bucket_col

DEPTH = 4
WIDTH = 1024


def _cells(key, depth: int, width: int):
    """Array of (d, bucket) structs for one key — the d-th family member is
    md5 with a 'cm<d>:' domain-separation prefix."""
    return F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                hash_bucket_col(
                    F.concat(F.lit(f"cm{d}:"), key.cast("string")), width
                ).alias("b"),
            )
            for d in range(depth)
        ]
    )


def count_min_table(
    df: DataFrame, key_col: str, depth: int = DEPTH, width: int = WIDTH
) -> DataFrame:
    """The sketch as a (d, b, cnt) table, <= depth*width rows. One explode
    (xdepth pre-agg inflation, collapsed map-side) + one partial-agg
    groupBy whose exchange is bounded by the table size, not the corpus."""
    return (
        df.select(F.explode(_cells(F.col(key_col), depth, width)).alias("x"))
        .select("x.d", "x.b")
        .groupBy("d", "b")
        .agg(F.count("*").alias("cnt"))
    )


def cm_estimate(
    candidates: DataFrame,
    sketch: DataFrame,
    key_col: str,
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """(key, cm_count) for each candidate key: min over the key's depth
    cells. The sketch (<= depth*width rows) is broadcast.

    LEFT join + coalesce-to-0: the docstring invites feeding a known key
    list, and a fed key whose cells are all empty must report cm_count=0
    (its true count), not vanish — and a key with only SOME cells present
    must min over the zero cells too, not just the survivors (an inner
    join would inflate its estimate)."""
    cand = candidates.select(
        F.col(key_col),
        F.explode(_cells(F.col(key_col), depth, width)).alias("x"),
    ).select(key_col, "x.d", "x.b")
    return (
        cand.join(F.broadcast(sketch), ["d", "b"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cm_count"))
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    id_col: str,
    k: int = 10,
    depth: int = DEPTH,
    width: int = WIDTH,
    sample_pct: int = 2,
) -> DataFrame:
    """Top-k keys by count-min estimate: sketch pass + md5-sampled
    candidate enumeration + broadcast estimate join. Returns
    (key, cm_count) ordered by (cm_count desc, key). Deterministic
    end-to-end; cm_count >= true count always (CM guarantee, test-pinned).
    """
    sketch = count_min_table(df, key_col, depth, width)
    candidates = (
        df.filter(hash_bucket_col(F.col(id_col), 100) < int(sample_pct))
        .select(key_col)
        .distinct()
    )
    return (
        cm_estimate(candidates, sketch, key_col, depth, width)
        .orderBy(F.col("cm_count").desc(), key_col)
        .limit(int(k))
    )
