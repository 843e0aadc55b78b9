"""Text-generation eval: ROUGE-N per document + corpus BLEU.

The summarization/translation counterpart of extraction_f1 and
ocr_eval: score generated text against references with the two
standard n-gram metrics. At pipeline scale this gates distillation
and synthetic-data generation runs (regenerate a pinned eval slice on
every model/prompt change, gate on corpus ROUGE/BLEU).

ROUGE-N (Lin 2004): clipped n-gram overlap — for each distinct gram,
min(count_hyp, count_ref) — with
    precision = I/H    recall = I/R    f1 = 2I/(H+R)
(the extraction_f1 exact harmonic identity; all three are single
divisions of exact BIGINT pools — no rounding grid).

BLEU (Papineni 2002), corpus-level: modified n-gram precision p_n =
sum_clip_n / sum_hyp_n for n = 1..4 pooled over the corpus, geometric
mean computed as sqrt(sqrt(p1*p2*p3*p4)) — multiplication and sqrt are
IEEE-exact cross-engine (the temperature_sampling sqrt contract), so
no log()/exp() enters the geometric mean. The brevity penalty's
exp(1 - r/c) is the one genuinely libm-bound term, so it is published
as the exact exponent `bp_exponent` = 1 - r/c (single division) plus
the `brevity_ok` flag (c >= r -> BP == 1, the common case for
verbose generators); `bleu` is the full score when brevity_ok (== the
geometric mean exactly) and NULL otherwise — never a cross-engine
libm coin-flip. Downstream dashboards apply exp() to the published
exponent if they want the penalized scalar.

Plan shape: the two exploded sides union with a side tag and shuffle
ONCE on (doc, n, gram) with map-side partial aggs, then a partial-agg
groupBy(doc) — the extraction_f1 shape widened by the n dimension.
BLEU adds one 1-row corpus agg on top. Tokenization is the shared
tokens_col / _word_ngrams contract so the DuckDB oracle replays one
tokenizer and one gram builder. Zero Python, no corpus-wide window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.functions.text import (
    _word_ngrams,
    tokens_col,
)


def _gram_side(
    pairs: DataFrame, id_col: str, text_col: str, ns: tuple[int, ...], tag: int
) -> DataFrame:
    toks = tokens_col(F.col(text_col))
    legs = []
    for n in ns:
        legs.append(
            pairs.select(
                F.col(id_col),
                F.lit(int(n)).alias("n"),
                F.explode(_word_ngrams(toks, n)).alias("gram"),
                F.lit(tag).alias("is_hyp"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


def rouge_n(
    pairs: DataFrame,
    ns: tuple[int, ...] = (1, 2),
    id_col: str = "doc_id",
    ref_col: str = "ref_text",
    hyp_col: str = "hyp_text",
) -> DataFrame:
    """Per-(doc, n) ROUGE-N: (id, n, n_hyp, n_ref, n_clip, precision,
    recall, f1), ordered by (id, n). Every (doc in pairs) × (n in ns)
    row is present — docs too short for an n publish 0 pools and NULL
    ratios (no evidence, not a perfect score)."""
    ns = tuple(int(n) for n in ns)
    if not ns or any(n < 1 for n in ns):
        raise ValueError(f"ns must be non-empty positive ints, got {ns!r}")
    hyp = _gram_side(pairs, id_col, hyp_col, ns, 1)
    ref = _gram_side(pairs, id_col, ref_col, ns, 0)
    per_gram = (
        hyp.unionByName(ref)
        .groupBy(id_col, "n", "gram")
        .agg(
            F.sum(F.when(F.col("is_hyp") == 1, 1).otherwise(0)).alias("ch"),
            F.sum(F.when(F.col("is_hyp") == 0, 1).otherwise(0)).alias("cr"),
        )
    )
    per_doc = per_gram.groupBy(id_col, "n").agg(
        F.sum("ch").cast("long").alias("n_hyp"),
        F.sum("cr").cast("long").alias("n_ref"),
        F.sum(F.least("ch", "cr")).cast("long").alias("n_clip"),
    )
    grid = pairs.select(id_col).distinct().crossJoin(
        F.broadcast(
            pairs.sparkSession.createDataFrame(
                [(int(n),) for n in ns], "n int"
            )
        )
    )
    out = grid.join(per_doc, [id_col, "n"], "left").select(
        id_col,
        F.col("n").cast("int").alias("n"),
        F.coalesce("n_hyp", F.lit(0)).cast("long").alias("n_hyp"),
        F.coalesce("n_ref", F.lit(0)).cast("long").alias("n_ref"),
        F.coalesce("n_clip", F.lit(0)).cast("long").alias("n_clip"),
    )
    ratio = lambda num, den: F.when(  # noqa: E731 — exact int/int division
        F.col(den) > 0, F.col(num).cast("double") / F.col(den)
    )
    return out.select(
        id_col,
        "n",
        "n_hyp",
        "n_ref",
        "n_clip",
        ratio("n_clip", "n_hyp").alias("precision"),
        ratio("n_clip", "n_ref").alias("recall"),
        F.when(
            (F.col("n_hyp") + F.col("n_ref")) > 0,
            (F.lit(2.0) * F.col("n_clip"))
            / (F.col("n_hyp") + F.col("n_ref")),
        ).alias("f1"),
    ).orderBy(id_col, "n")


def bleu_corpus(
    pairs: DataFrame,
    id_col: str = "doc_id",
    ref_col: str = "ref_text",
    hyp_col: str = "hyp_text",
) -> DataFrame:
    """Corpus BLEU-4 components: one row (hyp_len, ref_len, clip_1..4,
    tot_1..4, p_1..p_4, bp_exponent, brevity_ok, bleu).

    `bleu` = sqrt(sqrt(p1*p2*p3*p4)) when brevity_ok (c >= r, BP = 1)
    and every p_n > 0; 0.0 when some pooled p_n == 0; NULL when the
    brevity penalty would bite (apply exp(bp_exponent) downstream) or
    the corpus is empty. Exact BIGINT pools; the only doubles are the
    four single divisions, their product, and two IEEE sqrts."""
    scored = rouge_n(pairs, ns=(1, 2, 3, 4), id_col=id_col,
                     ref_col=ref_col, hyp_col=hyp_col)
    g = scored.groupBy().pivot("n", [1, 2, 3, 4]).agg(
        F.sum("n_clip").alias("clip"),
        F.sum("n_hyp").alias("tot"),
    )
    # pivot yields columns 1_clip, 1_tot, ... 4_clip, 4_tot
    lens = pairs.agg(
        F.sum(F.size(tokens_col(F.col(hyp_col)))).cast("long").alias(
            "hyp_len"
        ),
        F.sum(F.size(tokens_col(F.col(ref_col)))).cast("long").alias(
            "ref_len"
        ),
    )
    base = g.crossJoin(lens)
    cols = [
        F.coalesce("hyp_len", F.lit(0)).cast("long").alias("hyp_len"),
        F.coalesce("ref_len", F.lit(0)).cast("long").alias("ref_len"),
    ]
    ps = []
    for n in (1, 2, 3, 4):
        clip = F.coalesce(f"{n}_clip", F.lit(0)).cast("long")
        tot = F.coalesce(f"{n}_tot", F.lit(0)).cast("long")
        cols.append(clip.alias(f"clip_{n}"))
        cols.append(tot.alias(f"tot_{n}"))
        p = F.when(tot > 0, clip.cast("double") / tot)
        cols.append(p.alias(f"p_{n}"))
        ps.append(p)
    hyp_len = F.coalesce("hyp_len", F.lit(0))
    ref_len = F.coalesce("ref_len", F.lit(0))
    bp_exp = F.when(
        hyp_len > 0, F.lit(1.0) - ref_len.cast("double") / hyp_len
    )
    brevity_ok = hyp_len >= ref_len
    prod = ps[0] * ps[1] * ps[2] * ps[3]
    geo = F.sqrt(F.sqrt(prod))
    cols.append(bp_exp.alias("bp_exponent"))
    cols.append(brevity_ok.alias("brevity_ok"))
    cols.append(
        F.when(
            (hyp_len > 0) & brevity_ok & prod.isNotNull(),
            F.when(prod > 0, geo).otherwise(F.lit(0.0)),
        ).alias("bleu")
    )
    return base.select(*cols)
