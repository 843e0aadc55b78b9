"""Counts-based n-gram language-model perplexity for quality filtering.

The CCNet / Wenzek et al. 2020 curation pass (public method): score every
document with a language model trained on a trusted corpus and keep the
low-perplexity head (or the middle band) — the classic KenLM quality
filter used by CCNet, LLaMA and RedPajama data pipelines. KenLM itself is
a native library, so the model here is the transparent counts-based
equivalent: an add-k-smoothed bigram LM whose training and scoring are
both plain DataFrame aggregations — every number is replayable in SQL,
which KenLM's binary format is not.

Model (standard add-k bigram smoothing):

    p(w2 | w1) = (c(w1 w2) + k) / (c(w1) + k * V)
    nll(doc)   = -(1/n) * sum over bigrams of ln p(w2|w1)
    ppl(doc)   = exp(nll)

with V = training vocabulary size and c(.) training counts. Unseen
bigrams and unseen contexts degrade gracefully through the smoothing
(c = 0 -> k / (c(w1) + kV) resp. k / kV = 1/V).

Plan shape at 10^12-document scale:
  - TRAINING is two partial-agg groupBys over the trusted corpus's grams
    (map-side combined; the exchange carries one row per distinct
    unigram/bigram, bounded by vocabulary not corpus size). The trusted
    corpus is orders of magnitude smaller than the raw crawl (CCNet uses
    Wikipedia), so this is the cheap side.
  - SCORING never shuffles the corpus: the model tables are BROADCAST
    (a bigram table over a bounded vocabulary is megabytes), the per-doc
    bigram explode + two broadcast-hash joins + one partial-agg
    groupBy(doc_id) carry only (doc_id, logp) pairs through the single
    exchange. With `broadcast_model=False` the joins degrade to shuffle
    joins for pathologically large models.
  - ln() is rounded onto a 1e-8 grid per term before summing (the tfidf
    precedent: libm implementations differ by <= 1 ulp; the grid makes
    the cross-engine sums bit-comparable after the final 1e-6 round).

Tokenization is the shared `tokens_col` contract (functions/text.py), so
the DuckDB oracle replays one tokenizer for every gram-based operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.functions.text import (
    _word_ngrams,
    roundn,
    tokens_col,
)

ADD_K = 0.5  # add-k smoothing mass; 0.5 = Jeffreys prior


def train_bigram_lm(
    corpus: DataFrame, text_col: str = "text"
) -> dict[str, DataFrame]:
    """Train the counts model -> {'unigrams', 'bigrams', 'vocab'}.

    unigrams: (w1, c1) — token occurrence counts (the bigram-context
    denominator counts every token occurrence, matching the classic
    conditional MLE denominator sum_w2 c(w1 w2) up to the final token).
    bigrams:  (gram, c2) — space-joined bigram counts.
    vocab:    1 row (vocab_size) — distinct token count, for k*V.
    """
    toks = corpus.select(tokens_col(F.col(text_col)).alias("toks"))
    unigrams = (
        toks.select(F.explode("toks").alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("c1"))
    )
    bigrams = (
        toks.select(F.explode(_word_ngrams(F.col("toks"), 2)).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("c2"))
    )
    vocab = unigrams.agg(F.count("*").alias("vocab_size"))
    return {"unigrams": unigrams, "bigrams": bigrams, "vocab": vocab}


def lm_perplexity(
    docs: DataFrame,
    model: dict[str, DataFrame],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = ADD_K,
    broadcast_model: bool = True,
) -> DataFrame:
    """Score documents against a trained bigram LM.

    Returns one row per input document:
      (doc_id, n_bigrams, avg_logp, ppl)
    avg_logp is the mean ln p(w2|w1) over the document's bigrams (1e-6
    grid); ppl = exp(-avg_logp) (1e-4 grid). Documents with < 2 tokens
    have no bigrams: n_bigrams = 0, avg_logp / ppl NULL (no evidence is
    not the same as perplexity 1 — callers treating short docs as
    low-quality should filter on n_bigrams).
    """
    uni, big, vocab = model["unigrams"], model["bigrams"], model["vocab"]
    if broadcast_model:
        uni, big, vocab = F.broadcast(uni), F.broadcast(big), F.broadcast(vocab)

    doc_bigrams = docs.select(
        F.col(id_col),
        F.explode(_word_ngrams(tokens_col(F.col(text_col)), 2)).alias("gram"),
    ).withColumn("w1", F.split_part(F.col("gram"), F.lit(" "), F.lit(1)))

    # per-term log-probability on the 1e-8 grid (see module docstring)
    scored = (
        doc_bigrams.join(big, "gram", "left")
        .join(uni, "w1", "left")
        .crossJoin(vocab)
        .select(
            F.col(id_col),
            roundn(
                F.log(
                    (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(k))
                    / (
                        F.coalesce(F.col("c1"), F.lit(0))
                        + F.lit(k) * F.col("vocab_size")
                    )
                ),
                8,
            ).alias("logp"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"), F.sum("logp").alias("sum_logp")
    )
    avg = roundn(F.col("sum_logp") / F.col("n_bigrams"), 6)
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            avg.alias("avg_logp"),
            roundn(F.exp(-avg), 4).alias("ppl"),
        )
    )


def kneser_ney_bigrams(
    docs: DataFrame,
    *,
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """Interpolated Kneser–Ney bigram probabilities (Kneser & Ney 1995;
    the Chen & Goodman 1998 interpolated form with a fixed absolute
    discount) — the smoothing the real KenLM filter uses, as transparent
    DataFrame aggregations:

        p_kn(w2|w1) = max(c(w1w2) - D, 0)/c(w1.)
                      + D·N1+(w1·)/c(w1.) · N1+(·w2)/B

    where N1+(w1·) = distinct followers of w1, N1+(·w2) = distinct
    contexts preceding w2 (the continuation count — KN's innovation:
    'Francisco' is frequent but follows only 'San'), B = distinct bigram
    types. The probability mass per context telescopes to exactly 1 over
    the vocabulary (pinned by test).

    Plan: ONE bigram explode -> (w1, w2) partial-agg counts; context and
    continuation tables are re-aggregations of that vocabulary-sized
    frame (broadcast); B rides a 1-row crossJoin. The p_kn expression is
    written with an exact operator order both engines evaluate
    identically in IEEE doubles (integer counts, single promotions), then
    lands on the 9-grid.

    Output: one row per OBSERVED bigram (w1, w2, c_ab, c_ctx, n1_fol,
    n1_cont, lam, p_kn), ordered (w1, w2).
    """
    from invoice_ocr_reconciler_spark.functions.text import (
        roundn,
        tokens_col,
    )

    toks = docs.select(tokens_col(F.col(text_col)).alias("toks"))
    m = F.greatest(F.size("toks") - 1, F.lit(0))
    bg = toks.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("toks"), 1, m),
                F.slice(F.col("toks"), 2, m),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    bc = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c_ab")
    )
    ctx = bc.groupBy("w1").agg(
        F.sum("c_ab").cast("long").alias("c_ctx"),
        F.count(F.lit(1)).cast("long").alias("n1_fol"),
    )
    cont = bc.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("n1_cont")
    )
    btot = bc.groupBy().agg(F.count(F.lit(1)).cast("long").alias("b_types"))

    d = float(discount)
    p_kn = (
        F.greatest(F.col("c_ab") - F.lit(d), F.lit(0.0)) / F.col("c_ctx")
        + F.lit(d)
        * F.col("n1_fol")
        / F.col("c_ctx")
        * (F.col("n1_cont") / F.col("b_types"))
    )
    lam = F.lit(d) * F.col("n1_fol") / F.col("c_ctx")
    return (
        bc.join(F.broadcast(ctx), "w1")
        .join(F.broadcast(cont), "w2")
        .crossJoin(F.broadcast(btot))
        .select(
            "w1",
            "w2",
            "c_ab",
            "c_ctx",
            "n1_fol",
            "n1_cont",
            roundn(lam, 9).alias("lam"),
            roundn(p_kn, 9).alias("p_kn"),
        )
        .orderBy("w1", "w2")
    )
