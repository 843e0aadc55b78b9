"""Extraction-quality scoring: token-level P/R/F1 against gold text.

The boilerplate-removal literature's standard metric (CleanEval, Barbaresi's
trafilatura evaluation, the boilerpipe benchmark): score an extractor by
token-MULTISET precision/recall/F1 of its output against gold main-content
text, per document plus a corpus rollup. At pipeline scale this is the
regression harness for the extraction stage itself — re-run the extractor
over a pinned gold slice on every change and gate on corpus F1 (the batch
analog of the reference's golden-fixture extraction tests,
/root/reference/backend tests' byte-compare, relaxed to token overlap so it
can score *candidate* extractors, not only the shipped one).

Multiset scoring: for each distinct token t,
    inter_t = min(count_pred(t), count_gold(t))
and with I = sum_t inter_t, P̂ = |pred tokens|, Ĝ = |gold tokens|:
    precision = I/P̂     recall = I/Ĝ     f1 = 2I/(P̂+Ĝ)
(2I/(P̂+Ĝ) is the exact harmonic-F1 identity for multiset overlap — one
integer ratio, no intermediate rounding). All three are single divisions
of exact 64-bit integers, so the doubles are bit-identical across engines
with NO rounding grid.

Plan shape at corpus scale:
  - one union of the two exploded sides with a side tag, ONE shuffle on
    (doc_id, token) with map-side partial aggs (the hot-stopword key is
    salted by doc_id by construction), then a second partial-agg
    groupBy(doc_id) carrying 3 ints per (doc, token) row;
  - a final broadcast-friendly left join back to the id spine so empty
    docs (no tokens on either side) still report a row (0/0/0, NULL
    ratios — no evidence, not a perfect score);
  - tokenization is the shared `tokens_col` contract (functions/text.py)
    so the DuckDB oracle replays one tokenizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.functions.text import tokens_col


def extraction_f1(
    pairs: DataFrame,
    id_col: str = "doc_id",
    pred_col: str = "pred_text",
    gold_col: str = "gold_text",
) -> DataFrame:
    """One row per DISTINCT id: (id, n_pred, n_gold, n_inter, precision,
    recall, f1). NULL metric where its denominator is 0. ``pairs`` is
    expected keyed by `id_col`; if duplicate ids do arrive, their token
    multisets pool into ONE output row for that id (never duplicated
    spine rows carrying merged counts — that would double-count in the
    summary rollup)."""
    idc = F.col(id_col)
    pred = pairs.select(
        idc, F.explode(tokens_col(F.col(pred_col))).alias("tok")
    ).withColumn("is_pred", F.lit(1))
    gold = pairs.select(
        idc, F.explode(tokens_col(F.col(gold_col))).alias("tok")
    ).withColumn("is_pred", F.lit(0))
    per_tok = (
        pred.unionByName(gold)
        .groupBy(id_col, "tok")
        .agg(
            F.sum(F.when(F.col("is_pred") == 1, 1).otherwise(0)).alias("cp"),
            F.sum(F.when(F.col("is_pred") == 0, 1).otherwise(0)).alias("cg"),
        )
    )
    per_doc = per_tok.groupBy(id_col).agg(
        F.sum("cp").cast("bigint").alias("n_pred"),
        F.sum("cg").cast("bigint").alias("n_gold"),
        F.sum(F.least("cp", "cg")).cast("bigint").alias("n_inter"),
    )
    spine = pairs.select(idc).distinct()
    out = spine.join(per_doc, id_col, "left").select(
        idc,
        F.coalesce("n_pred", F.lit(0)).cast("bigint").alias("n_pred"),
        F.coalesce("n_gold", F.lit(0)).cast("bigint").alias("n_gold"),
        F.coalesce("n_inter", F.lit(0)).cast("bigint").alias("n_inter"),
    )
    ratio = lambda num, den: F.when(  # noqa: E731 — exact int/int division
        F.col(den) > 0, F.col(num).cast("double") / F.col(den)
    )
    return out.select(
        idc,
        "n_pred",
        "n_gold",
        "n_inter",
        ratio("n_inter", "n_pred").alias("precision"),
        ratio("n_inter", "n_gold").alias("recall"),
        F.when(
            (F.col("n_pred") + F.col("n_gold")) > 0,
            (F.lit(2.0) * F.col("n_inter")) / (F.col("n_pred") + F.col("n_gold")),
        ).alias("f1"),
    )


def extraction_f1_summary(scored: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Corpus rollup of `extraction_f1` output: micro-averaged P/R/F1
    (pooled counts — the convention benchmark tables report) plus doc
    counts. One row; exact integer pools, single divisions."""
    agg = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_pred").cast("bigint").alias("t_pred"),
        F.sum("n_gold").cast("bigint").alias("t_gold"),
        F.sum("n_inter").cast("bigint").alias("t_inter"),
    )
    return agg.select(
        "n_docs",
        "t_pred",
        "t_gold",
        "t_inter",
        F.when(F.col("t_pred") > 0, F.col("t_inter").cast("double") / F.col("t_pred"))
        .alias("micro_precision"),
        F.when(F.col("t_gold") > 0, F.col("t_inter").cast("double") / F.col("t_gold"))
        .alias("micro_recall"),
        F.when(
            (F.col("t_pred") + F.col("t_gold")) > 0,
            (F.lit(2.0) * F.col("t_inter")) / (F.col("t_pred") + F.col("t_gold")),
        ).alias("micro_f1"),
    )
