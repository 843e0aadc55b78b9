"""DSIR-style hashed n-gram importance weighting for data selection.

The public method of Xie et al. 2023 ("Data Selection for Language Models
via Importance Resampling"): estimate how target-like each raw-corpus
document is by comparing two bag-of-hashed-n-gram distributions — one
fitted on a small trusted TARGET corpus, one on the RAW crawl — and score
each raw document with its log importance weight

    log w(doc) = sum over gram occurrences g of
                   [ ln p_target(bucket(g)) - ln p_raw(bucket(g)) ]

where bucket(.) hashes unigrams and bigrams into B buckets and both
distributions are add-k smoothed:  p(b) = (c(b) + k) / (N + k * B).
High log w = looks like the target; DSIR then samples the raw corpus
proportionally. The deterministic analog here ranks by (log_weight desc,
doc_id) — reproducible across runs and partitionings, which a Gumbel draw
is not.

Plan shape at 10^12-document scale:
  - both bucket-count fits are one partial-agg groupBy over B <= ~1e6
    buckets (map-side combined; the exchange carries at most B rows
    regardless of corpus size). The target corpus is small by
    construction; the raw fit is one scan of the corpus.
  - the lambda table (bucket -> ln p_t - ln p_r) has AT MOST B rows and is
    BROADCAST, so scoring never shuffles the corpus: per-row gram
    generation in codegen, one broadcast-hash join, one partial-agg
    groupBy(doc_id) carrying (doc_id, lambda) pairs.
  - the bucket hash is the md5-prefix idiom every sampling oracle already
    replays (stratified_sample / mixture_sample), so the whole pipeline —
    fit, smoothing, scoring — is value-replayable in DuckDB.
  - ln() rides the 1e-8 grid before summation (tfidf precedent), the
    final score the 1e-6 grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.functions.text import (
    _word_ngrams,
    roundn,
    tokens_col,
)

N_BUCKETS = 4096
ADD_K = 0.5


def _doc_grams(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, gram) — one row per unigram AND bigram occurrence (counts,
    not distinct: DSIR features are bag-of-n-gram counts)."""
    toks = tokens_col(F.col(text_col))
    grams = F.concat(toks, _word_ngrams(toks, 2))
    return docs.select(F.col(id_col), F.explode(grams).alias("gram"))


def _bucket(gram) -> F.Column:
    """md5-prefix hash bucket — the repo's single hash-decision idiom
    (operators/sampling.py:hash_bucket_col), replayed in DuckDB as
    ('0x' || substr(md5(gram), 1, 8))::UBIGINT % B."""
    from invoice_ocr_reconciler_spark.operators.sampling import hash_bucket_col

    return hash_bucket_col(gram, N_BUCKETS)


def _bucket_log_probs(
    corpus: DataFrame, text_col: str, id_col: str, k: float, alias: str
) -> DataFrame:
    """(bucket, ln_p_<alias>) — smoothed log bucket probabilities.

    Buckets with zero count are absent; consumers coalesce to the
    floor probability ln(k / (N + k*B)), carried on the total row.
    """
    counts = (
        _doc_grams(corpus, text_col, id_col)
        .select(_bucket(F.col("gram")).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("c"))
    )
    total = counts.agg(F.sum("c").alias("n_total"))
    return counts.crossJoin(F.broadcast(total)).select(
        "bucket",
        roundn(
            F.log(
                (F.col("c") + F.lit(k))
                / (F.col("n_total") + F.lit(k) * F.lit(float(N_BUCKETS)))
            ),
            8,
        ).alias(f"ln_p_{alias}"),
        roundn(
            F.log(
                F.lit(k)
                / (F.col("n_total") + F.lit(k) * F.lit(float(N_BUCKETS)))
            ),
            8,
        ).alias(f"ln_floor_{alias}"),
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = ADD_K,
    broadcast_model: bool = True,
) -> DataFrame:
    """Log importance weight of every raw document vs the target corpus.

    Returns (doc_id, n_grams, log_weight): n_grams is the document's
    unigram+bigram occurrence count; log_weight the summed per-gram
    log-ratio (1e-6 grid). Documents with no grams (empty text) get
    n_grams = 0 and log_weight NULL.

    Raises ValueError when the TARGET corpus contributes zero grams (empty
    frame / all-empty text): a gramless target fits no distribution, every
    lambda would be NULL, and dsir_select over all-NULL weights would
    "select" the first n docs by id — a deterministic-looking but
    meaningless cut. A misconfigured target path must fail loudly, not
    pick arbitrary data. (The check is one row off a tiny pre-aggregated
    frame — train-time cost, not per-doc.)
    """
    # persisted: the emptiness probe below and the lambda join both read it
    t_probs = _bucket_log_probs(target, text_col, id_col, k, "t").persist()
    if t_probs.limit(1).count() == 0:
        raise ValueError(
            "DSIR target corpus has no grams (empty frame or all-empty "
            "text) — cannot fit the target distribution"
        )
    lam = (
        t_probs
        .join(
            _bucket_log_probs(raw, text_col, id_col, k, "r"),
            "bucket",
            "full_outer",
        )
    )
    # absent bucket on either side -> that side's floor probability. The
    # floor constants ride every row of their side; pull one instance of
    # each through a 1-row agg so rows missing a side still know it.
    floors = F.broadcast(
        lam.agg(
            F.max("ln_floor_t").alias("f_t"), F.max("ln_floor_r").alias("f_r")
        )
    )
    lam = lam.crossJoin(floors).select(
        "bucket",
        (
            F.coalesce(F.col("ln_p_t"), F.col("f_t"))
            - F.coalesce(F.col("ln_p_r"), F.col("f_r"))
        ).alias("lam"),
    )
    if broadcast_model:
        lam = F.broadcast(lam)

    per_doc = (
        _doc_grams(raw, text_col, id_col)
        .select(F.col(id_col), _bucket(F.col("gram")).alias("bucket"))
        .join(lam, "bucket", "left")  # every raw bucket exists in lam
        .groupBy(id_col)
        .agg(F.count("*").alias("n_grams"), F.sum("lam").alias("sum_lam"))
    )
    return (
        raw.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            roundn(F.col("sum_lam"), 6).alias("log_weight"),
        )
    )


def dsir_select(
    scores: DataFrame, n_keep: int, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic top-n selection by (log_weight desc, doc_id asc) —
    the reproducible analog of DSIR's importance resampling draw. NULL
    log_weight (empty docs) sorts last and is never selected before any
    scored document.

    Scale shape: orderBy().limit(n) compiles to TakeOrderedAndProject —
    each partition keeps its local top-n and only n_keep rows reach the
    driver-side merge; the rank window then runs over those n_keep rows
    only (never a global sort of the corpus)."""
    from pyspark.sql import Window

    order = [F.col("log_weight").desc_nulls_last(), F.col(id_col)]
    top = scores.orderBy(*order).limit(n_keep)
    return top.withColumn(
        "sel_rank", F.row_number().over(Window.orderBy(*order)).cast("int")
    )
