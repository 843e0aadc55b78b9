"""LM training-objective data preparation: span corruption, FIM, chat
template rendering.

The last mile between a curated corpus and a data loader — the
transforms that turn clean text into objective-specific training
examples:

* ``span_corruption`` — T5-style denoising (Raffel et al. 2020 §3.1.4):
  mask short spans, replace each with a sentinel token, emit
  (input_text, target_text). Deterministic variant: the token stream is
  cut into fixed windows; each window masks one md5-derived span
  (length 2-4, offset hashed from (doc, window)), and the sentinel id
  is the WINDOW ordinal — a documented simplification of T5's
  sequential numbering that keeps every expression O(tokens) codegen
  (sequential ids would need a per-element prefix count, the HOF
  capture trap). ~15% of tokens mask at the default window of 20.
* ``fim_transform`` — fill-in-the-middle (Bavarian et al. 2022 /
  StarCoder): md5-derived double cut into prefix/middle/suffix, emitted
  in PSM order with <PRE>/<SUF>/<MID> markers; docs under 3 tokens pass
  through unmasked with fim_applied = false.
* ``render_chat_template`` — serialize (role, content) turns to the
  im_start/im_end wire format and report the loss-mask accounting
  (assistant-chars to train on vs total) plus the first/last assistant
  span offsets — the numbers a masking bug corrupts first.

All three are single codegen projections over a PRIOR tokens/turns
projection (the functions/text.py HOF-capture contract): zero joins,
zero shuffles, zero Python — scan-bound at 10^12 documents, and every
md5 decision is replayable by the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.functions.text import md5_u60, tokens_col

WINDOW = 20
PRE, SUF, MID = "<PRE>", "<SUF>", "<MID>"
IM_START, IM_END = "<|im_start|>", "<|im_end|>"


def span_corruption(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = WINDOW,
) -> DataFrame:
    """(id, n_tokens, n_masked, input_text, target_text); see module
    docstring. Windows shorter than span_len + 2 are left unmasked (the
    tail window of most documents), so empty/short docs pass through
    with n_masked = 0 and target_text = ''."""
    w = int(window)
    toked = docs.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("toks")
    )
    toks = F.col("toks")
    n = F.size(toks)
    n_win = F.ceil(n / F.lit(float(w))).cast("int")
    did = F.col(id_col).cast("string")

    def per_window(wi: Column) -> Column:
        wtoks = F.slice(toks, wi * w + 1, w)
        wsize = F.size(wtoks)
        span_len = (
            md5_u60(F.concat(F.lit("sl:"), did, F.lit(":"), wi.cast("string")))
            % 3
            + 2
        ).cast("int")
        s = (
            md5_u60(F.concat(F.lit("ss:"), did, F.lit(":"), wi.cast("string")))
            % F.greatest(wsize - span_len, F.lit(1))
        ).cast("int")
        masked = wsize >= span_len + 2
        sentinel = F.concat(
            F.lit("<extra_id_"), wi.cast("string"), F.lit(">")
        )
        inp = F.when(
            masked,
            F.concat(
                F.slice(wtoks, 1, s),
                F.array(sentinel),
                F.slice(wtoks, s + span_len + 1, wsize),
            ),
        ).otherwise(wtoks)
        tgt = F.when(
            masked,
            F.concat(F.array(sentinel), F.slice(wtoks, s + 1, span_len)),
        ).otherwise(F.array().cast("array<string>"))
        return F.struct(
            inp.alias("inp"),
            tgt.alias("tgt"),
            F.when(masked, span_len).otherwise(F.lit(0)).alias("nm"),
        )

    wins = F.transform(
        F.sequence(F.lit(0), F.greatest(n_win - 1, F.lit(0))), per_window
    )
    wins = F.when(n > 0, wins).otherwise(
        F.array().cast(
            "array<struct<inp:array<string>,tgt:array<string>,nm:int>>"
        )
    )
    return toked.select(
        id_col,
        n.alias("n_tokens"),
        F.coalesce(
            F.aggregate(
                wins, F.lit(0), lambda acc, x: acc + x["nm"]
            ),
            F.lit(0),
        ).alias("n_masked"),
        F.array_join(F.flatten(F.transform(wins, lambda x: x["inp"])), " ").alias(
            "input_text"
        ),
        F.array_join(F.flatten(F.transform(wins, lambda x: x["tgt"])), " ").alias(
            "target_text"
        ),
    )


def fim_transform(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_tokens, cut1, cut2, fim_applied, fim_text): PSM
    fill-in-the-middle. cut1 in [1, n-2], cut2 in [cut1+1, n-1] (both
    md5-derived), so prefix/middle/suffix are all non-empty; docs with
    fewer than 3 tokens emit fim_applied = false and the plain text."""
    toked = docs.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("toks")
    )
    toks = F.col("toks")
    n = F.size(toks)
    did = F.col(id_col).cast("string")
    c1 = (md5_u60(F.concat(F.lit("f1:"), did)) % F.greatest(n - 2, F.lit(1)) + 1).cast(
        "int"
    )
    c2 = (
        c1
        + 1
        + (
            md5_u60(F.concat(F.lit("f2:"), did))
            % F.greatest(n - c1 - 1, F.lit(1))
        ).cast("int")
    )
    applied = n >= 3
    prefix = F.array_join(F.slice(toks, 1, c1), " ")
    middle = F.array_join(F.slice(toks, c1 + 1, c2 - c1), " ")
    suffix = F.array_join(F.slice(toks, c2 + 1, n - c2), " ")
    fim = F.concat_ws(
        " ", F.lit(PRE), prefix, F.lit(SUF), suffix, F.lit(MID), middle
    )
    return toked.select(
        id_col,
        n.alias("n_tokens"),
        F.when(applied, c1).alias("cut1"),
        F.when(applied, c2).alias("cut2"),
        applied.alias("fim_applied"),
        F.when(applied, fim)
        .otherwise(F.array_join(toks, " "))
        .alias("fim_text"),
    )


def render_chat_template(
    convs: DataFrame,
    turns_col: str = "turns",
    id_col: str = "conv_id",
) -> DataFrame:
    """(id, n_turns, n_assistant, rendered, total_chars, mask_chars,
    first_mask_start, last_mask_end): the im_start/im_end serialization

        <|im_start|>role\\ncontent<|im_end|>\\n   per turn

    with SFT loss-mask accounting: mask_chars counts the content chars
    of assistant turns (the tokens a trainer computes loss on);
    first_mask_start/last_mask_end are the 0-based char offsets of the
    first assistant-content start and last assistant-content end in
    `rendered` (NULL when no assistant turn). Offsets are derivable in
    one pass because each turn's rendered length is role-length +
    content-length + the constant wrapper width."""
    projected = convs.select(
        F.col(id_col).alias("conv_id"),
        F.coalesce(
            F.transform(
                F.col(turns_col),
                lambda t: F.struct(
                    F.coalesce(t["role"], F.lit("")).alias("role"),
                    F.coalesce(t["content"], F.lit("")).alias("content"),
                ),
            ),
            F.array().cast("array<struct<role:string,content:string>>"),
        ).alias("turns"),
    )
    turns = F.col("turns")
    wrapper = len(IM_START) + 1 + len(IM_END) + 1  # '\n' after role + after end
    piece_len = lambda t: (  # noqa: E731
        F.length(t["role"]) + F.length(t["content"]) + F.lit(wrapper)
    )
    rendered = F.aggregate(
        turns,
        F.lit(""),
        lambda acc, t: F.concat(
            acc,
            F.lit(IM_START),
            t["role"],
            F.lit("\n"),
            t["content"],
            F.lit(IM_END),
            F.lit("\n"),
        ),
    )
    # fold carrying (offset so far, first assistant content start,
    # last assistant content end) — one O(turns) pass, no re-render
    acc0 = F.struct(
        F.lit(0).alias("off"),
        F.lit(None).cast("int").alias("first_s"),
        F.lit(None).cast("int").alias("last_e"),
    )

    def step(acc, t):
        is_a = t["role"] == "assistant"
        content_start = (
            acc["off"] + F.lit(len(IM_START)) + F.length(t["role"]) + F.lit(1)
        )
        content_end = content_start + F.length(t["content"])
        return F.struct(
            (acc["off"] + piece_len(t)).alias("off"),
            F.coalesce(
                acc["first_s"], F.when(is_a, content_start.cast("int"))
            ).alias("first_s"),
            F.when(is_a, content_end.cast("int"))
            .otherwise(acc["last_e"])
            .alias("last_e"),
        )

    spans = F.aggregate(turns, acc0, step)
    assistant = F.filter(turns, lambda t: t["role"] == "assistant")
    return projected.select(
        "conv_id",
        F.size(turns).alias("n_turns"),
        F.size(assistant).alias("n_assistant"),
        rendered.alias("rendered"),
        F.length(rendered).alias("total_chars"),
        F.coalesce(
            F.aggregate(
                assistant, F.lit(0), lambda acc, t: acc + F.length(t["content"])
            ),
            F.lit(0),
        ).alias("mask_chars"),
        spans["first_s"].alias("first_mask_start"),
        spans["last_e"].alias("last_mask_end"),
    )
