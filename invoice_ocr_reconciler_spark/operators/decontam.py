"""Benchmark decontamination for training-data curation.

The standard pretraining hygiene pass (reference semantics: the n-gram
overlap decontamination used by GPT-3/Gopher/Llama data pipelines, public
method): a document is CONTAMINATED if it shares any word n-gram with a
benchmark/eval set. Contaminated documents are flagged (and typically
dropped) so the training corpus cannot memorize evaluation answers.

Plan shape at 10^12-document scale:
  - the benchmark side (eval sets: 10^4..10^6 items) collapses to a
    DISTINCT n-gram set once — tiny next to the corpus — and is BROADCAST,
    so the corpus never shuffles: one scan, per-row gram generation in
    codegen, a broadcast-hash semi join, one partial-agg groupBy(doc_id)
    that only carries hit rows;
  - with `broadcast_bench=False` the same pipeline degrades gracefully to
    a shuffle-hash join for pathologically large benchmark sets;
  - gram generation is the shared tokens_col/_word_ngrams contract
    (functions/text.py) — pure array codegen, no Python crossing anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.functions.text import _word_ngrams, tokens_col


def benchmark_ngrams(
    benchmark: DataFrame, n: int = 13, text_col: str = "text"
) -> DataFrame:
    """DISTINCT word n-grams of the benchmark set -> one `gram` column.
    Documents shorter than n tokens contribute nothing (no partial grams:
    a sub-n overlap is not an n-gram hit)."""
    toks = tokens_col(F.col(text_col))
    return (
        benchmark.select(
            F.explode(F.array_distinct(_word_ngrams(toks, n))).alias("gram")
        )
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    broadcast_bench: bool = True,
) -> DataFrame:
    """Flag documents sharing >=1 word n-gram with the benchmark set.

    Returns one row per input document:
      (doc_id, n_hit_grams, contaminated)
    n_hit_grams counts the document's DISTINCT grams that appear anywhere
    in the benchmark; contaminated = 1 iff n_hit_grams > 0.
    """
    bench_grams = benchmark_ngrams(benchmark, n, bench_text_col)
    if broadcast_bench:
        bench_grams = F.broadcast(bench_grams)
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(_word_ngrams(tokens_col(F.col(text_col)), n))
        ).alias("gram"),
    )
    hits = (
        doc_grams.join(bench_grams, "gram")  # semi-style: bench side is distinct
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit_grams"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_hit_grams"), F.lit(0)).alias("n_hit_grams"),
            (F.coalesce(F.col("n_hit_grams"), F.lit(0)) > 0)
            .cast("int")
            .alias("contaminated"),
        )
    )
