"""Data-recipe planning: mixture epochs and curriculum ordering.

The two bookkeeping operators every pretraining run needs between
curation and the data loader:

* ``mixture_plan`` — the LLaMA-style mixture table: given target source
  weights and a total token budget, how many tokens (and therefore
  epochs/repeat factors) each source contributes, with explicit capping
  when a source is too small to meet its share (the "epochs over
  low-resource sources" column of every data-recipe table).
* ``curriculum_order`` — a deterministic easy-to-hard ordering with
  round-robin source interleaving inside each difficulty decile, so no
  contiguous training window is dominated by one source (the
  anti-source-block shuffle used when full global shuffling is
  undesirable for curriculum reasons).

Cross-engine contract: targets and normalized weights are computed
driver-side from the weights dict (exact Python floats embedded as
literals in both engines), token counts use the whitespace token rule
shared with the token_count query, epochs ride the 1e-6 grid, and the
curriculum position is a pure function of (decile, within-rank, source,
id) so both engines derive identical orderings.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.functions.text import roundn, tokens_col


def mixture_plan(
    docs: DataFrame,
    weights: dict,
    token_budget: int,
    source_col: str = "source",
    text_col: str = "text",
    max_epochs: float = 4.0,
) -> DataFrame:
    """One row per source (union of sources in the data and in the plan):

      (source, n_docs, tokens_available, weight, tokens_target, epochs,
       capped, tokens_planned)

    * weight       — normalized share from `weights` (NULL: source present
                     in the data but absent from the plan; it gets 0 target).
    * tokens_target— floor(budget * weight + 0.5), computed driver-side so
                     both engines see identical integers.
    * epochs       — min(target / available, max_epochs) on the 1e-6 grid;
                     NULL when the source has no tokens (planned-but-empty
                     sources surface as shortfall rows, not crashes).
    * capped       — the source is too small for its share at max_epochs.
    * tokens_planned — min(target, floor(available * max_epochs + 0.5)):
                     what the loader will actually draw.

    Shape at scale: ONE partial-agg groupBy over the corpus (count +
    token-sum); everything after runs on the source-sized frame. The
    when-chain literal plan table keeps the big side free of joins.
    """
    total_w = float(sum(weights.values()))
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    wnorm = {s: float(w) / total_w for s, w in weights.items()}
    targets = {
        s: int(math.floor(int(token_budget) * wn + 0.5))
        for s, wn in wnorm.items()
    }

    spark = docs.sparkSession
    src = F.coalesce(F.col(source_col).cast("string"), F.lit("und"))
    agg = docs.groupBy(src.alias("source")).agg(
        F.count("*").alias("n_docs"),
        F.coalesce(F.sum(F.size(tokens_col(F.col(text_col)))), F.lit(0)).alias(
            "tokens_available"
        ),
    )
    plan = spark.createDataFrame(
        [(s, wnorm[s], targets[s]) for s in sorted(weights)],
        "source string, weight double, tokens_target long",
    )
    full = agg.join(plan, "source", "full_outer").select(
        "source",
        F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
        F.coalesce("tokens_available", F.lit(0)).alias("tokens_available"),
        roundn(F.col("weight"), 9).alias("weight"),
        F.coalesce("tokens_target", F.lit(0)).alias("tokens_target"),
    )
    avail = F.col("tokens_available")
    tgt = F.col("tokens_target")
    cap = F.lit(float(max_epochs))
    epochs_raw = roundn(tgt / avail, 6)
    # least() skips NULLs, so the empty-source NULL must gate the whole
    # expression, not ride into least(NULL, cap) -> cap
    epochs = F.when(avail > 0, F.least(epochs_raw, cap))
    capped = ((avail > 0) & (epochs_raw > cap)) | ((avail == 0) & (tgt > 0))
    planned_cap = F.floor(avail * cap + F.lit(0.5)).cast("long")
    return full.select(
        "*",
        epochs.alias("epochs"),
        capped.alias("capped"),
        F.least(tgt, planned_cap).alias("tokens_planned"),
    ).orderBy("source")


def curriculum_order(
    docs: DataFrame,
    difficulty_col: str = "n_chars",
    source_col: str = "source",
    id_col: str = "doc_id",
    n_buckets: int = 10,
) -> DataFrame:
    """(id, source, difficulty, decile, rr, position): easy-to-hard
    curriculum with per-decile round-robin source interleaving.

    * decile — per-SOURCE ntile over (difficulty, id): each source
      contributes its own easy->hard ramp (and the window is partitioned
      by source — no global-window barrier on the corpus).
    * rr     — the row's rank inside its (source, decile) cell; ordering
      by (decile, rr, source, id) interleaves sources round-robin within
      each decile.
    * position — row_number over that total order. At corpus scale the
      total order itself is the deliverable (a distributed range sort,
      the shard-writer's input); the materialized position column is
      the bounded-set / audit form.

    NULL difficulties sort first within their source (they are the
    "easiest": nothing to read); NULL sources fold to 'und'.
    """
    src = F.coalesce(F.col(source_col).cast("string"), F.lit("und"))
    diff = F.col(difficulty_col)
    base = docs.select(
        F.col(id_col).alias("id"),
        src.alias("source"),
        diff.alias("difficulty"),
    )
    w_src = Window.partitionBy("source").orderBy(
        F.col("difficulty").asc_nulls_first(), F.col("id")
    )
    with_decile = base.withColumn(
        "decile", F.ntile(int(n_buckets)).over(w_src)
    )
    w_cell = Window.partitionBy("source", "decile").orderBy(
        F.col("difficulty").asc_nulls_first(), F.col("id")
    )
    with_rr = with_decile.withColumn("rr", F.row_number().over(w_cell))
    w_total = Window.orderBy("decile", "rr", "source", "id")
    return with_rr.withColumn(
        "position", F.row_number().over(w_total)
    ).orderBy("position")
