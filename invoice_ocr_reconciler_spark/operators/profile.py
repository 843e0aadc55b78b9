"""Column profiling — the data-quality summary every ingest run wants.

One job over the table produces, per column: non-null / null counts,
distinct count, and min/max rendered as strings. This is the operational
check that catches schema drift, null floods, and constant columns before
a 100 TB pipeline burns a day on poisoned input.

Plan shape: ONE wide aggregate over a single scan (all columns' stats as
parallel aggregate expressions — Catalyst computes them in one pass with
map-side partials), then a per-row explode of the 1-row result into the
long (column, stats...) layout. Exact distinct counts add one expand +
shuffle per column (Spark's multi-countDistinct planning); at corpus
scale pass ``approx_distinct=True`` to switch every distinct to the
mergeable HLL sketch (`approx_count_distinct`), which removes the expand
entirely — the documented 10^12-row mode (the same exact-vs-sketch split
as approx_distinct_users).

Cross-engine value contract: fractional min/max ride the repo's rounding
grid and a fixed-scale DECIMAL cast before the string render, so the
DuckDB oracle replays them byte-exactly; timestamps/dates/ints/strings
cast directly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from invoice_ocr_reconciler_spark.functions.text import roundn

_FRACTIONAL = (T.DoubleType, T.FloatType)


def _render(col: Column, dtype: T.DataType) -> Column:
    """String render of a min/max value with a cross-engine contract:
    fractional values round to the 1e-6 grid and render via DECIMAL(38,6)
    (fixed scale digits in both engines); everything else casts directly."""
    if isinstance(dtype, _FRACTIONAL):
        return roundn(col, 6).cast("decimal(38,6)").cast("string")
    return col.cast("string")


def corpus_report(
    docs: DataFrame,
    text_col: str = "text",
    lang_of_interest: str = "en",
) -> DataFrame:
    """One-row corpus health report — the dashboard a 100 TB ingest run
    prints before anything expensive: volume, emptiness, exact-dup rate,
    quality and language mix, all from ONE aggregate over ONE scan.

    -> (n_docs, n_empty, total_tokens, mean_tokens, uniq_fingerprints,
        exact_dup_rate, mean_quality, lang_share): every text-derived
    input (fingerprint, token count, quality score, language prediction)
    is a codegen expression feeding parallel aggregates, so the whole
    report is one job with map-side partials — no per-metric count()
    storm. The distinct-fingerprint count is the one expand+shuffle
    (exact, matching dedup_exact's notion of duplication); fractions ride
    the 1e-6 grid. Empty docs (zero tokens) still fingerprint and count —
    they ARE corpus health signal.
    """
    from invoice_ocr_reconciler_spark.functions.text import (
        fingerprint_col,
        lang_id_cols,
        quality_score_cols,
        token_count_col,
    )

    t = F.col(text_col)
    base = docs.select(
        fingerprint_col(t).alias("_fp"),
        token_count_col(t).alias("_tok"),
        quality_score_cols(t)["quality_score"].alias("_q"),
        lang_id_cols(t)["lang_pred"].alias("_lang"),
    )
    n = F.count("*")
    uniq = F.count_distinct(F.col("_fp"))
    return base.agg(
        n.alias("n_docs"),
        F.coalesce(F.sum((F.col("_tok") == 0).cast("long")), F.lit(0)).alias(
            "n_empty"
        ),
        F.coalesce(F.sum("_tok"), F.lit(0)).alias("total_tokens"),
        F.when(n > 0, roundn(F.avg("_tok"), 6)).alias("mean_tokens"),
        uniq.alias("uniq_fingerprints"),
        F.when(n > 0, roundn(1.0 - uniq / n, 6)).alias("exact_dup_rate"),
        F.when(n > 0, roundn(F.avg("_q"), 6)).alias("mean_quality"),
        F.when(
            n > 0,
            roundn(
                F.sum((F.col("_lang") == lang_of_interest).cast("long")) / n, 6
            ),
        ).alias("lang_share"),
    )


def column_profile(
    df: DataFrame,
    cols: list[str] | None = None,
    approx_distinct: bool = False,
) -> DataFrame:
    """-> (column, n_nonnull, n_null, n_distinct, min_value, max_value),
    one row per profiled column, computed in one aggregate job.

    ``cols`` defaults to every column; ``approx_distinct=True`` swaps the
    exact distinct for the HLL sketch (rsd 2%) — the at-scale mode.
    """
    if cols is None:
        cols = [f.name for f in df.schema.fields]
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    aggs = []
    for c in cols:
        col = F.col(c)
        distinct = (
            F.approx_count_distinct(c, rsd=0.02)
            if approx_distinct
            else F.countDistinct(col)
        )
        aggs += [
            F.count(col).alias(f"{c}__nn"),
            # sum() over zero rows is NULL, not 0 — coalesce keeps the
            # empty-table profile numeric
            F.coalesce(F.sum(F.isnull(col).cast("long")), F.lit(0)).alias(
                f"{c}__nul"
            ),
            distinct.alias(f"{c}__nd"),
            _render(F.min(col), dtypes[c]).alias(f"{c}__mn"),
            _render(F.max(col), dtypes[c]).alias(f"{c}__mx"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__nn").alias("n_nonnull"),
                F.col(f"{c}__nul").alias("n_null"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__mn").alias("min_value"),
                F.col(f"{c}__mx").alias("max_value"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("p")).select("p.*")
