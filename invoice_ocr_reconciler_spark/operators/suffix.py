"""EXACT duplicated-span detection — the suffix-array path of Lee et al.
2022, re-shaped for Spark as prefix-doubling window fingerprints.

operators/spans.py trades recall for cost: it hashes every w-token window
but EXCHANGES only a content-keyed 1/p sample, so a shared run of L tokens
is found with probability 1 - (1 - 1/p)^(L - w + 1) — high for long runs,
never 1. This module is the exact counterpart: every window of length
``min_len`` gets a fingerprint and every fingerprint is counted, so a
cross-document verbatim run of >= min_len tokens is detected with
probability 1 (up to 128-bit md5 collisions: < 1e-14 even at 10^12-window
corpora, and the DuckDB oracle cross-checks with RAW window text, a
collision-free independent method).

Why prefix doubling instead of hashing each window directly? Direct
hashing concatenates min_len tokens per window — O(n_tokens * min_len)
character work per document, which at the span lengths the dedup
literature uses (Lee et al. cut at 50 tokens) is 10-50x the document
size. Prefix doubling is the suffix-array construction trick (Manber &
Myers 1990) cut short at round k = floor(log2 L): after round j every
position carries a fingerprint of its 2^j-token prefix, built from two
HALF-length fingerprints (zip_with of two aligned slices + one md5 of 64
hex chars), so round j costs O(n) fixed-width hashes regardless of L.
Any window length L in [2^k, 2^(k+1)) is then keyed by the classic
sparse-table pair — the 2^k-prefix fingerprints at positions i and
i + L - 2^k, whose union covers exactly tokens i .. i+L-1 (they overlap;
equality of both halves <=> equality of all L tokens). Total work:
O(n_tokens * log(min_len)) fixed-width md5 calls, all inside one codegen
projection — no shuffle, no Python.

Plan shape at 10^12 documents:
  - fingerprinting: one codegen pass per row (log2(L)+2 zip_with levels
    over per-document arrays — arrays never leave the row);
  - ONE exchange of (32-hex key, doc_id) distinct pairs — n_tokens-sized,
    the price of exact recall (Lee et al.'s suffix array is likewise
    corpus-sized); spans.py remains the 1/p-cost sampled alternative;
  - per-key doc counts are a partial-agg groupBy — a boilerplate window
    shared by 10^8 documents map-side combines, it never forms pairs
    (no self-join anywhere: this operator cannot pair-explode on
    degenerate corpora, unlike LSH bucket joins);
  - removal joins the duplicated starts back as ONE array row per
    document and cuts tokens against MERGED coverage intervals (codegen
    fold), so an all-boilerplate document costs O(n_tokens) not
    O(n_tokens * n_dup_windows).

Reference scope note: the reference app has no corpus operators
(SURVEY.md §2.12 — training-data extension beyond
/root/reference/backend). Cited papers are public (PAPERS.md).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.functions.text import roundn, tokens_col

MIN_LEN = 16  # tokens per exact window (Lee et al. use 50 BPE tokens)


def _floor_pow2(n: int) -> int:
    k = 1
    while k * 2 <= n:
        k *= 2
    return k


def window_keys_col(toks: Column, min_len: int = MIN_LEN) -> Column:
    """Array of 32-hex fingerprints, one per ``min_len``-token window of an
    ALREADY-MATERIALIZED token-array column (callers tokenize in a prior
    projection — a captured tokenization expression would re-evaluate per
    element, the O(len²) HOF trap documented in functions/text.py).

    Key equality <=> window-content equality, up to md5 collisions: the
    round-j fingerprint is md5(fp_{j-1}[i] || fp_{j-1}[i + 2^(j-1)]) — a
    collision-free encoding of tokens i..i+2^j-1 by induction — and the
    final key pairs the two (possibly overlapping) 2^k-prefix fingerprints
    that cover the L-token window. Documents shorter than min_len yield
    an empty array.
    """
    if min_len < 1:
        raise ValueError("min_len must be >= 1")
    n = F.size(toks)
    # round 0: per-token fingerprints (fixed-width from the start so every
    # later md5 hashes exactly 64 hex chars, independent of token length)
    fp = F.transform(toks, lambda t: F.md5(t))
    pow2 = _floor_pow2(min_len)
    span = 1  # tokens covered by each fp entry
    while span < pow2:
        half = span
        span *= 2
        m = n - span + 1
        fp = F.when(
            n >= span,
            F.zip_with(
                F.slice(fp, 1, m),
                F.slice(fp, half + 1, m),
                lambda a, b: F.md5(F.concat(a, b)),
            ),
        ).otherwise(F.array().cast("array<string>"))
    m = n - min_len + 1
    if min_len == pow2:
        return F.when(n >= min_len, F.slice(fp, 1, m)).otherwise(
            F.array().cast("array<string>")
        )
    off = min_len - pow2  # second half starts off positions later
    return F.when(
        n >= min_len,
        F.zip_with(
            F.slice(fp, 1, m),
            F.slice(fp, off + 1, m),
            lambda a, b: F.md5(F.concat(a, b)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def exact_window_keys(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = MIN_LEN,
) -> DataFrame:
    """(id, start, wkey) for EVERY min_len-token window of every document
    — 1-based starts, the positional spine of the exact dedup family."""
    return (
        docs.select(
            F.col(id_col), tokens_col(F.col(text_col)).alias("__toks")
        )
        .select(
            F.col(id_col),
            F.posexplode(window_keys_col(F.col("__toks"), min_len)).alias(
                "pos0", "wkey"
            ),
        )
        .select(
            F.col(id_col), (F.col("pos0") + 1).alias("start"), F.col("wkey")
        )
    )


def exact_span_profile(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = MIN_LEN,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document EXACT duplicated-window profile: (id, n_windows,
    n_dup_windows, dup_window_frac) over the document's DISTINCT window
    fingerprints (a passage repeated inside one document is not
    cross-document duplication — the spans.py convention). Documents
    shorter than min_len are absent (no window is defined on them).
    Exact-recall twin of spans.py:duplicated_spans: same output shape,
    probability-1 detection, n_tokens-sized (not 1/p) exchange.
    """
    keys = (
        docs.select(
            F.col(id_col), tokens_col(F.col(text_col)).alias("__toks")
        )
        .select(
            F.col(id_col),
            F.explode(window_keys_col(F.col("__toks"), min_len)).alias(
                "wkey"
            ),
        )
        .distinct()
    )
    counts = keys.groupBy("wkey").agg(F.count("*").alias("n_docs"))
    return (
        keys.join(counts, "wkey")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_windows"),
            F.sum((F.col("n_docs") >= min_docs).cast("long")).alias(
                "n_dup_windows"
            ),
        )
        .withColumn(
            "dup_window_frac",
            roundn(F.col("n_dup_windows") / F.col("n_windows"), 8),
        )
    )


def _coverage_intervals(starts: Column, window: int) -> Column:
    """Merge 1-based window starts into disjoint [lo, hi) coverage
    intervals (hi exclusive) — a codegen fold over the SORTED starts, so
    the per-token cut below scans O(n_intervals) (typically a handful)
    instead of O(n_dup_windows) raw starts."""
    empty = F.array().cast("array<struct<lo:int,hi:int>>")
    # try_element_at, not element_at: Spark's And() does not short-circuit,
    # so the guard inside the when() condition still evaluates the lookup
    # on the empty accumulator (ANSI mode would throw on element_at)
    last = lambda acc: F.try_element_at(acc, F.lit(-1))  # noqa: E731
    return F.aggregate(
        F.sort_array(starts),
        empty,
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (s <= last(acc)["hi"]),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        last(acc)["lo"].alias("lo"),
                        F.greatest(last(acc)["hi"], s + window).alias("hi"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(
                acc,
                F.array(F.struct(s.alias("lo"), (s + window).alias("hi"))),
            )
        ),
    )


def remove_exact_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = MIN_LEN,
    min_docs: int = 2,
) -> DataFrame:
    """The ExactSubstr CUT of Lee et al. 2022, exact-recall edition: every
    token covered by ANY min_len-token window that appears verbatim in
    >= min_docs documents is removed; survivors re-join with single
    spaces (whitespace-normalized, raw token CASE kept — fingerprints
    hash the lowercased tokens and the two tokenizations align
    position-for-position, the remove_duplicated_spans contract).
    Returns (id, text_clean, n_tokens, n_removed_tokens) for EVERY input
    document.

    Plan: the (wkey, id, start) exchange and per-key doc counts are the
    two partial-agg'd shuffles of exact_span_profile; duplicated starts
    come back as ONE array row per document, are folded into merged
    coverage intervals in codegen, and the cut is a filter over
    (token, position) pairs x intervals.
    """
    span_pos = exact_window_keys(docs, text_col, id_col, min_len)
    counts = (
        span_pos.select("wkey", F.col(id_col))
        .distinct()
        .groupBy("wkey")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )
    dup_starts = (
        span_pos.join(counts, "wkey")
        .groupBy(id_col)
        .agg(F.collect_set("start").alias("dup_starts"))
    )
    joined = docs.select(
        F.col(id_col), F.col(text_col).alias("_text")
    ).join(dup_starts, id_col, "left")
    raw_toks = F.filter(
        F.split(F.trim(F.coalesce(F.col("_text"), F.lit(""))), r"\s+"),
        lambda t: t != "",
    )
    ivs = _coverage_intervals(
        F.coalesce(F.col("dup_starts"), F.array().cast("array<int>")),
        min_len,
    )
    # sequence(1, 0) is DESCENDING in Spark — empty token arrays must
    # short-circuit instead of zip-padding a phantom element
    pairs = F.when(
        F.size(raw_toks) > 0,
        F.zip_with(
            raw_toks,
            F.sequence(F.lit(1), F.size(raw_toks)),
            lambda t, i: F.struct(t.alias("t"), i.alias("i")),
        ),
    ).otherwise(F.array().cast("array<struct<t:string,i:int>>"))
    kept = F.filter(
        pairs,
        lambda p: ~F.exists(
            ivs, lambda iv: (iv["lo"] <= p["i"]) & (p["i"] < iv["hi"])
        ),
    )
    return joined.select(
        F.col(id_col),
        F.concat_ws(" ", F.transform(kept, lambda p: p["t"])).alias(
            "text_clean"
        ),
        F.size(raw_toks).cast("long").alias("n_tokens"),
        (F.size(raw_toks) - F.size(kept)).cast("long").alias(
            "n_removed_tokens"
        ),
    )
