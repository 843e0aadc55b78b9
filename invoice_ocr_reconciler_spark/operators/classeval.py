"""Classifier/score evaluation: confusion-matrix P/R/F1, exact ROC-AUC,
calibration bins + ECE.

The quality-classifier band (operators/classifier.py), the language
router (per-host language routing), the soft-404 detector and the
license gate all emit hard labels or scores; this band is their quality
gate against a labeled slice — the supervised counterpart of
cluster_eval (unsupervised assignments) and ir_metrics (rankings).
Reference analog: the reconciliation engine's match/mismatch verdicts
graded against a hand-checked register
(/root/reference/backend/reconciliationEngine.js:160-195 emits the
labels; the reference never grades them — this is the missing gate).

  * confusion_eval — multiclass confusion cells -> per-class
    (tp, fp, fn, support) as exact BIGINTs with single-division
    precision/recall/F1 (the extraction_f1 harmonic identity:
    f1 = 2tp/(2tp+fp+fn)), plus '__micro__' (pooled cells) and
    '__macro__' (per-class metrics snapped to integer nanos, summed
    as BIGINTs, one division — the ir_metrics_macro contract;
    zero_division=0: a class with no predictions contributes
    precision 0, sklearn's convention).
  * roc_auc — tie-corrected Mann-Whitney AUC per group WITHOUT a
    per-row global sort: ONE groupBy collapses the corpus to distinct
    (group, score) cells with (pos, neg) counts, a window over CELLS
    (bounded by the score grid, not the row count) accumulates
    negatives-below, and AUC's numerator is the exact BIGINT
       auc_num2 = sum_cells pos * (2*cum_neg_below + neg)
    over auc_den2 = 2*n_pos*n_neg (ties contribute the standard 1/2
    via the odd `neg` term). One division; no float ever pools.
  * calibration_bins — reliability diagram + ECE: equal-width bins on
    [0,1], per-bin confidence = sum of probs snapped to integer NANOS
    (BIGINT pool), accuracy = n_pos/n, per-bin gap_nanos =
    |sum_p_nanos - n_pos*1e9| exact; the TOTAL row's calib_gap
    (= sum of per-bin gap_nanos / (N*1e9)) IS the expected calibration
    error (Naeini et al. 2015 / Guo et al. 2017).

Distributed shape: every op collapses rows to bounded cell tables with
map-side partial aggs before anything else — confusion cells are
bounded by |labels|^2, AUC cells by the per-group score grid,
calibration by n_bins — so nothing downstream scales with the corpus.
Zero Python, no corpus-wide windows (roc_auc's window orders CELLS
within a group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_NANOS = 1e9

MICRO = "__micro__"
MACRO = "__macro__"


def _nanos(x):
    """Snap an exact-division double to the integer-nanos grid (the
    ir_metrics_macro contract)."""
    return F.floor(x * F.lit(_NANOS) + F.lit(0.5)).cast("long")


def confusion_eval(
    df: DataFrame,
    gold_col: str = "gold",
    pred_col: str = "pred",
) -> DataFrame:
    """Multiclass confusion rollup -> one row per class seen in either
    column + '__micro__' and '__macro__' rows:
    (label, tp, fp, fn, support, precision, recall, f1).

    precision = tp/(tp+fp), recall = tp/(tp+fn) = tp/support,
    f1 = 2tp/(2tp+fp+fn) — all single divisions of exact BIGINTs.
    Macro averages snap each per-class metric to nanos with
    zero_division=0 (undefined precision counts as 0, sklearn's
    default), so the macro mean is a BIGINT sum + one division.
    Micro tp == micro-precision == micro-recall denominator share:
    in single-label multiclass, sum(fp) == sum(fn), so the micro row's
    precision/recall/f1 coincide (= accuracy) — kept as three columns
    for schema uniformity. Rows with a NULL on either side are
    excluded (absence of a label is not a class).
    """
    g = F.col(gold_col).cast("string")
    p = F.col(pred_col).cast("string")
    cells = (
        df.select(g.alias("g"), p.alias("p"))
        .where(F.col("g").isNotNull() & F.col("p").isNotNull())
        .groupBy("g", "p")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tp = cells.where(F.col("g") == F.col("p")).select(
        F.col("g").alias("label"), F.col("n").alias("tp")
    )
    by_pred = cells.groupBy(F.col("p").alias("label")).agg(
        F.sum("n").cast("long").alias("n_pred")
    )
    by_gold = cells.groupBy(F.col("g").alias("label")).agg(
        F.sum("n").cast("long").alias("support")
    )
    per = (
        by_gold.join(by_pred, "label", "full_outer")
        .join(tp, "label", "left")
        .select(
            "label",
            F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
            (F.coalesce("n_pred", F.lit(0)) - F.coalesce("tp", F.lit(0)))
            .cast("long")
            .alias("fp"),
            (F.coalesce("support", F.lit(0)) - F.coalesce("tp", F.lit(0)))
            .cast("long")
            .alias("fn"),
            F.coalesce("support", F.lit(0)).cast("long").alias("support"),
        )
    )
    prec = F.when(
        (F.col("tp") + F.col("fp")) > 0,
        F.col("tp").cast("double") / (F.col("tp") + F.col("fp")),
    )
    rec = F.when(
        (F.col("tp") + F.col("fn")) > 0,
        F.col("tp").cast("double") / (F.col("tp") + F.col("fn")),
    )
    f1 = F.when(
        (F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn")) > 0,
        (F.lit(2.0) * F.col("tp"))
        / (F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn")),
    )
    scored = per.select(
        "label", "tp", "fp", "fn", "support",
        prec.alias("precision"), rec.alias("recall"), f1.alias("f1"),
    )
    micro = scored.agg(
        F.lit(MICRO).alias("label"),
        F.sum("tp").cast("long").alias("tp"),
        F.sum("fp").cast("long").alias("fp"),
        F.sum("fn").cast("long").alias("fn"),
        F.sum("support").cast("long").alias("support"),
    ).select(
        "label", "tp", "fp", "fn", "support",
        prec.alias("precision"), rec.alias("recall"), f1.alias("f1"),
    )
    z = lambda c: _nanos(F.coalesce(F.col(c), F.lit(0.0)))  # noqa: E731
    macro = scored.agg(
        F.lit(MACRO).alias("label"),
        F.lit(None).cast("long").alias("tp"),
        F.lit(None).cast("long").alias("fp"),
        F.lit(None).cast("long").alias("fn"),
        F.count(F.lit(1)).cast("long").alias("support"),  # = n_classes
        F.sum(z("precision")).alias("_sp"),
        F.sum(z("recall")).alias("_sr"),
        F.sum(z("f1")).alias("_sf"),
    ).select(
        "label", "tp", "fp", "fn", "support",
        F.when(
            F.col("support") > 0,
            F.col("_sp").cast("double") / F.col("support") / F.lit(_NANOS),
        ).alias("precision"),
        F.when(
            F.col("support") > 0,
            F.col("_sr").cast("double") / F.col("support") / F.lit(_NANOS),
        ).alias("recall"),
        F.when(
            F.col("support") > 0,
            F.col("_sf").cast("double") / F.col("support") / F.lit(_NANOS),
        ).alias("f1"),
    )
    return scored.unionByName(micro).unionByName(macro).orderBy("label")


def roc_auc(
    df: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Exact tie-corrected ROC-AUC per group -> (group..., n_pos, n_neg,
    auc_num2, auc_den2, auc), one row per group.

    AUC = P(score_pos > score_neg) + P(==)/2 — the Mann-Whitney
    statistic. Computed over (group, score) CELLS: after the collapse,
    walking cells by ascending score with the running negative count
    gives   auc_num2 = sum pos_cell * (2*neg_below + neg_cell)
    (each tied cell contributes pos*neg once, not twice: the half).
    auc_den2 = 2*n_pos*n_neg. Both BIGINT-exact; `auc` is the single
    division (NULL when a group lacks a class). Labels are truthy ints
    (anything != 0 is positive); NULL labels/scores are excluded.

    Scale: the only window runs over distinct scores WITHIN a group —
    on grid-valued scores (ppm quality scores, ranker outputs) that is
    thousands of cells regardless of corpus size. A continuous score
    degrades to per-row cells; quantize upstream if the grid matters.
    """
    gb = [F.col(c) for c in group_cols]
    lab = F.col(label_col).cast("long")
    base = df.where(
        lab.isNotNull() & F.col(score_col).isNotNull()
    ).select(
        *group_cols,
        F.col(score_col).alias("_score"),
        F.when(lab != 0, F.lit(1)).otherwise(F.lit(0)).alias("_pos"),
    )
    cells = base.groupBy(*gb, F.col("_score")).agg(
        F.sum("_pos").cast("long").alias("pos"),
        F.sum(F.lit(1) - F.col("_pos")).cast("long").alias("neg"),
    )
    w = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        .orderBy(F.col("_score").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = cells.select(
        *group_cols,
        "pos",
        "neg",
        (
            F.col("pos")
            * (
                F.lit(2) * F.coalesce(F.sum("neg").over(w), F.lit(0))
                + F.col("neg")
            )
        ).alias("num2"),
    )
    out = contrib.groupBy(*gb).agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("neg").cast("long").alias("n_neg"),
        F.sum("num2").cast("long").alias("auc_num2"),
    )
    den = (F.lit(2) * F.col("n_pos") * F.col("n_neg")).cast("long")
    return out.select(
        *group_cols,
        "n_pos",
        "n_neg",
        "auc_num2",
        den.alias("auc_den2"),
        F.when(den > 0, F.col("auc_num2").cast("double") / den).alias("auc"),
    )


def calibration_bins(
    df: DataFrame,
    prob_col: str = "prob",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram + ECE -> one row per non-empty bin, ordered,
    plus a TOTAL row (bin = -1):
    (bin, n, n_pos, sum_p_nanos, confidence, accuracy, gap_nanos,
    calib_gap).

    bin = least(floor(p*n_bins), n_bins-1) — the right edge closes the
    last bin. confidence = sum_p_nanos/(n*1e9) with each prob snapped
    to nanos BEFORE pooling (no float accumulation order); accuracy =
    n_pos/n. Per-bin gap_nanos = |sum_p_nanos - n_pos*1e9| is n*|conf -
    acc| exactly, so calib_gap = gap_nanos/(n*1e9) is that bin's
    reliability gap. The TOTAL row pools n/n_pos/sum_p_nanos as
    marginals but sums the PER-BIN gap_nanos, so its calib_gap is the
    expected calibration error ECE = sum_b (n_b/N)*|conf_b - acc_b|.
    Rows with NULL prob/label or prob outside [0,1] are excluded (an
    out-of-range "probability" is an upstream bug, not a bin).
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    p = F.col(prob_col).cast("double")
    lab = F.col(label_col).cast("long")
    base = df.where(
        p.isNotNull() & lab.isNotNull() & (p >= 0.0) & (p <= 1.0)
    ).select(
        F.least(
            F.floor(p * F.lit(float(n_bins))).cast("int"),
            F.lit(n_bins - 1),
        ).alias("bin"),
        _nanos(p).alias("p_nanos"),
        F.when(lab != 0, F.lit(1)).otherwise(F.lit(0)).alias("pos"),
    )
    bins = base.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("p_nanos").cast("long").alias("sum_p_nanos"),
    )
    gap = F.abs(
        F.col("sum_p_nanos") - F.col("n_pos") * F.lit(int(_NANOS))
    ).cast("long")
    per_bin = bins.select(
        "bin", "n", "n_pos", "sum_p_nanos", gap.alias("gap_nanos")
    )
    total = per_bin.agg(
        F.lit(-1).cast("int").alias("bin"),
        F.sum("n").cast("long").alias("n"),
        F.sum("n_pos").cast("long").alias("n_pos"),
        F.sum("sum_p_nanos").cast("long").alias("sum_p_nanos"),
        F.sum("gap_nanos").cast("long").alias("gap_nanos"),
    )
    out = per_bin.unionByName(total)
    return out.select(
        "bin",
        "n",
        "n_pos",
        "sum_p_nanos",
        F.when(
            F.col("n") > 0,
            F.col("sum_p_nanos").cast("double") / F.col("n") / F.lit(_NANOS),
        ).alias("confidence"),
        F.when(
            F.col("n") > 0, F.col("n_pos").cast("double") / F.col("n")
        ).alias("accuracy"),
        "gap_nanos",
        F.when(
            F.col("n") > 0,
            F.col("gap_nanos").cast("double") / F.col("n") / F.lit(_NANOS),
        ).alias("calib_gap"),
    ).orderBy("bin")
