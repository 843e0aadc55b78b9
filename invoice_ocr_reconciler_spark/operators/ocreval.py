"""OCR/transcription quality eval: CER + exact word-level WER.

The reference is an OCR app (Tesseract worker, /root/reference/backend/
server.js:110-134) whose extraction quality is pinned by golden-fixture
byte compares. The corpus-scale analog when goldens CAN'T be byte-exact
(a new OCR engine, an ASR pass, a layout-parser candidate) is the
standard edit-distance metric pair:

  CER = levenshtein_chars(ref, hyp) / len_chars(ref)
  WER = levenshtein_words(ref, hyp) / len_words(ref)

Character path: both engines ship a native levenshtein; Spark's is
codepoint-based while DuckDB's is BYTE-based, so the cross-engine
oracle contract holds on ASCII text (the synthetic corpus; non-ASCII
rows still score correctly on the Spark side — only the DuckDB replay
needs the ASCII restriction, documented here).

Word path — exact word-level Levenshtein WITHOUT a Python DP loop:
each row builds its LOCAL vocabulary (sorted distinct words of ref+hyp,
pure array ops), codes every word as ONE single-byte ASCII character
via its vocabulary position into a 91-char literal alphabet, and runs
the native char levenshtein on the coded strings — char edits on the
coded strings ARE word edits, exactly. Rows whose local vocabulary
exceeds the alphabet (|vocab| > 91) publish NULL word metrics with
`coded = false` instead of a wrong number; utterance/segment-level
transcripts (the unit WER is defined over in the ASR literature) sit
far below the bound, and long documents route through sentence_split
first (operators/spans.py precedent). Everything is pure codegen —
zero joins, zero shuffles, zero Python: scan-bound at 10^12 rows.

Tokenization is the shared `tokens_col` contract (lowercased
whitespace split), so WER is case-insensitive — the Kaldi/espnet
convention — and the DuckDB oracle replays one tokenizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.functions.text import tokens_col

# 91 printable ASCII chars: 33..126 minus quote/double-quote/backslash so
# the SAME literal embeds safely in the DuckDB oracle SQL.
CODE_ALPHABET = "".join(
    chr(c) for c in range(33, 127) if chr(c) not in {"'", '"', "\\"}
)


def cer_wer(
    pairs: DataFrame,
    id_col: str = "doc_id",
    ref_col: str = "ref_text",
    hyp_col: str = "hyp_text",
) -> DataFrame:
    """Per-row CER/WER: (id, n_ref_chars, n_hyp_chars, char_dist, cer,
    n_ref_words, n_hyp_words, word_dist, wer, coded), ordered by id.

    NULL cer when the reference is empty (0 denominator — no evidence,
    not a perfect score); NULL word metrics with coded=false when the
    row's local vocabulary exceeds the 91-char coding alphabet.
    Distances remain published for empty-reference rows (char_dist =
    insertions needed), matching sclite's handling.
    """
    ref = F.coalesce(F.col(ref_col), F.lit(""))
    hyp = F.coalesce(F.col(hyp_col), F.lit(""))
    rw, hw = tokens_col(ref), tokens_col(hyp)
    vocab = F.array_sort(F.array_distinct(F.concat(rw, hw)))
    code = lambda words: F.concat_ws(  # noqa: E731
        "",
        F.transform(
            words,
            lambda w: F.substring(
                F.lit(CODE_ALPHABET),
                F.array_position(vocab, w).cast("int"),
                F.lit(1),
            ),
        ),
    )
    codable = F.size(vocab) <= len(CODE_ALPHABET)
    out = pairs.select(
        F.col(id_col),
        F.length(ref).cast("long").alias("n_ref_chars"),
        F.length(hyp).cast("long").alias("n_hyp_chars"),
        F.levenshtein(ref, hyp).cast("long").alias("char_dist"),
        F.size(rw).cast("long").alias("n_ref_words"),
        F.size(hw).cast("long").alias("n_hyp_words"),
        F.when(codable, F.levenshtein(code(rw), code(hw)).cast("long")).alias(
            "word_dist"
        ),
        codable.alias("coded"),
    )
    return out.select(
        id_col,
        "n_ref_chars",
        "n_hyp_chars",
        "char_dist",
        F.when(
            F.col("n_ref_chars") > 0,
            F.col("char_dist").cast("double") / F.col("n_ref_chars"),
        ).alias("cer"),
        "n_ref_words",
        "n_hyp_words",
        "word_dist",
        F.when(
            (F.col("n_ref_words") > 0) & F.col("coded"),
            F.col("word_dist").cast("double") / F.col("n_ref_words"),
        ).alias("wer"),
        "coded",
    ).orderBy(id_col)


def cer_wer_summary(scored: DataFrame) -> DataFrame:
    """Corpus rollup: pooled CER/WER (total edits / total reference
    length — the convention benchmark tables report) plus row counts.
    WER pools only coded rows and publishes how many were skipped, so
    a silent coverage gap can't read as a perfect score. Exact BIGINT
    pools, one division per ratio."""
    coded = F.col("coded") & (F.col("n_ref_words") > 0)
    g = scored.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("char_dist").cast("long").alias("char_dist_total"),
        F.sum("n_ref_chars").cast("long").alias("ref_chars_total"),
        F.sum(F.when(coded, F.col("word_dist"))).cast("long").alias(
            "word_dist_total"
        ),
        F.sum(F.when(coded, F.col("n_ref_words"))).cast("long").alias(
            "ref_words_total"
        ),
        F.sum(coded.cast("long")).cast("long").alias("n_coded"),
        F.sum((~F.col("coded")).cast("long")).cast("long").alias("n_uncoded"),
    )
    return g.select(
        "n_rows",
        "n_coded",
        "n_uncoded",
        "char_dist_total",
        "ref_chars_total",
        F.when(
            F.col("ref_chars_total") > 0,
            F.col("char_dist_total").cast("double")
            / F.col("ref_chars_total"),
        ).alias("corpus_cer"),
        F.coalesce("word_dist_total", F.lit(0)).cast("long").alias(
            "word_dist_total"
        ),
        F.coalesce("ref_words_total", F.lit(0)).cast("long").alias(
            "ref_words_total"
        ),
        F.when(
            F.coalesce("ref_words_total", F.lit(0)) > 0,
            F.col("word_dist_total").cast("double")
            / F.col("ref_words_total"),
        ).alias("corpus_wer"),
    )
