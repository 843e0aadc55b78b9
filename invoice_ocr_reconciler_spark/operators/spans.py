"""Exact duplicated-span detection — substring-level dedup for corpora.

Document-level dedup (exact fingerprint, MinHash, SimHash — operators/
dedup.py) misses the dominant failure mode of web corpora: long VERBATIM
passages (licenses, boilerplate, quoted articles) embedded inside
otherwise-distinct documents. Lee et al. 2022 ("Deduplicating Training
Data Makes Language Models Better") remove such spans with a suffix
array; a distributed suffix array is not a Spark-shaped computation, so
this operator uses the classic fingerprint-sampling equivalent
(Manber 1994 / Broder 1997, the scheme winnowing refines): hash EVERY
w-token window of every document and keep the windows whose fingerprint
is 0 mod p — a CONTENT-keyed 1/p sample.

Content-keyed selection is the load-bearing choice. A positional stride
(every p-th window) samples each document on its own offset grid, so two
documents sharing a long verbatim run select DIFFERENT windows of the run
whenever their grids are out of phase — shared passages become invisible.
Keying the choice on the window's own hash makes the selected set a pure
function of the window TEXT: any run of >= w tokens shared by two
documents yields the same candidate windows in both, and each survives
selection in both or in neither. Expected recall for a shared run of L
tokens is 1 - (1 - 1/p)^(L - w + 1) — p trades cost for span-length
sensitivity, it never desynchronizes the two sides.

Plan shape at 10^12 documents:
  - fingerprinting is one codegen pass per row (sequence + transform +
    filter inside the array — no Python, no shuffle): ~n_tokens md5 calls
    per document, then ONLY the selected ~n_tokens/p fingerprints explode.
  - the exchange carries (16-hex fp, doc_id) pairs — 24 bytes/row at
    ~1/p of token count, the same order as the MinHash band exchange.
  - per-fp doc counts are a partial-agg groupBy; the flag join back to
    the span rows reuses the fp hash partitioning (no third exchange),
    and the per-doc rollup is another partial agg.
  - md5 (not xxhash) keeps the whole pipeline value-replayable in the
    DuckDB oracle; at production scale swap _SPAN_HEX for a 64-bit
    rolling hash and the plan is unchanged.

Reference scope note: the reference app has no corpus operators at all
(SURVEY.md §2.12 — training-data extension, beyond
/root/reference/backend). Cited papers are public (PAPERS.md).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.functions.text import roundn, tokens_col

WINDOW = 8  # tokens per span fingerprint
SELECT_MOD = 4  # keep fingerprints == 0 mod p: expected 1/p of windows
_FP_HEX = 16  # fingerprint width kept for the exchange (64 bits)


def _selected_span_fps(toks: Column, window: int, select_mod: int) -> Column:
    """Array of selected 16-hex window fingerprints for one document,
    from an ALREADY-MATERIALIZED token-array column (callers tokenize in
    a prior projection: the transform lambda below slices ``toks`` per
    window, and a captured raw-tokenization expression would be
    re-evaluated per element — O(n_windows x tokenize) per document).

    All (size - window + 1) windows are hashed; a window survives iff the
    first 8 hex chars of its md5, as an integer, are 0 mod select_mod —
    the content-keyed choice shared by every document. Documents shorter
    than `window` yield an empty array (no span is defined on them).
    """
    sz = F.size(toks)
    starts = F.when(
        sz >= window, F.sequence(F.lit(1), sz - window + 1)
    ).otherwise(F.array().cast("array<int>"))
    fps = F.transform(
        starts,
        lambda s: F.substring(
            F.md5(F.concat_ws(" ", F.slice(toks, s, window))), 1, _FP_HEX
        ),
    )
    return F.filter(
        fps,
        lambda fp: F.conv(F.substring(fp, 1, 8), 16, 10).cast("long")
        % select_mod
        == 0,
    )


def span_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = WINDOW,
    select_mod: int = SELECT_MOD,
) -> DataFrame:
    """(id, fp): each document's DISTINCT selected span fingerprints.

    Distinct-per-document (one exchange, partial-agg'd) so that a passage
    repeated INSIDE one document does not count as cross-document
    duplication downstream.
    """
    return (
        docs.select(
            F.col(id_col), tokens_col(F.col(text_col)).alias("__toks")
        )
        .select(
            F.col(id_col),
            F.explode(
                _selected_span_fps(F.col("__toks"), window, select_mod)
            ).alias("fp"),
        )
        .distinct()
    )


def _selected_spans(toks: Column, window: int, select_mod: int) -> Column:
    """Array of (s, fp) structs — the selected windows of one document WITH
    their 1-based start positions: the positional twin of
    _selected_span_fps (same windows, same content-keyed survival rule;
    same pre-materialized token-array contract), for operators that must
    LOCATE spans rather than just count them. One md5 per window: the
    fingerprint is computed once inside the struct and the selection
    filter reads it back."""
    sz = F.size(toks)
    starts = F.when(
        sz >= window, F.sequence(F.lit(1), sz - window + 1)
    ).otherwise(F.array().cast("array<int>"))
    withfp = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("s"),
            F.substring(
                F.md5(F.concat_ws(" ", F.slice(toks, s, window))), 1, _FP_HEX
            ).alias("fp"),
        ),
    )
    return F.filter(
        withfp,
        lambda p: F.conv(F.substring(p["fp"], 1, 8), 16, 10).cast("long")
        % select_mod
        == 0,
    )


def remove_duplicated_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = WINDOW,
    select_mod: int = SELECT_MOD,
    min_docs: int = 2,
) -> DataFrame:
    """Cut cross-document duplicated spans OUT of the text (the removal
    step of Lee et al. 2022's ExactSubstr dedup, over the same sampled
    fingerprints duplicated_spans counts).

    A token is removed iff it is covered by at least one SELECTED window
    whose fingerprint appears in >= min_docs documents; the surviving
    tokens are re-joined with single spaces (dedup corpora run on
    whitespace-normalized text — original inter-token whitespace is not
    preserved, original token CASE is: fingerprints hash the lowercased
    tokens, the rebuilt text keeps the raw ones, and the two tokenizations
    align position-for-position because lower() never changes whitespace).
    Documents with no duplicated span pass through with text_clean = the
    normalized original.

    Returns (id, text_clean, n_tokens, n_removed_tokens) for EVERY input
    document.

    Plan shape: the (fp, doc) exchange and the per-fp doc counts are the
    same two partial-agg'd shuffles as duplicated_spans; the dup-start
    lists come back as ONE array row per document (collect_list over the
    join, bounded by ~n_tokens/p starts/doc), broadcast-joined or
    hash-joined back to the corpus, and the cut itself is a codegen
    filter over positions x dup-starts (worst case O(n_tokens * n_dup/p)
    per doc — the dup list is the 1/p sample, never the full window set).
    The corpus text crosses one exchange at most (the final join is on
    id; with the bucketed pages layout it co-locates).
    """
    # (id, start, fp) for every selected window — positions kept, unlike
    # span_fingerprints' distinct (fp, id) projection; the struct array is
    # built (and each window hashed) once per document, so nothing bigger
    # than a 24-byte pair rides the explode
    span_pos = docs.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("__toks")
    ).select(
        F.col(id_col),
        F.explode(
            _selected_spans(F.col("__toks"), window, select_mod)
        ).alias("sp"),
    ).select(
        F.col(id_col),
        F.col("sp.s").alias("start"),
        F.col("sp.fp").alias("fp"),
    )
    counts = (
        span_pos.select("fp", F.col(id_col)).distinct()
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )
    dup_starts = (
        span_pos.join(counts, "fp")
        .groupBy(id_col)
        .agg(F.collect_set("start").alias("dup_starts"))
    )
    raw_toks = F.filter(
        F.split(F.trim(F.coalesce(F.col("_text"), F.lit(""))), r"\s+"),
        lambda t: t != "",
    )
    joined = docs.select(F.col(id_col), F.col(text_col).alias("_text")).join(
        dup_starts, id_col, "left"
    )
    ds = F.coalesce(F.col("dup_starts"), F.array().cast("array<int>"))
    toks = raw_toks
    # guard: sequence(1, 0) is DESCENDING in Spark, so an empty token
    # array must short-circuit instead of zip-padding a phantom element
    pairs = F.when(
        F.size(toks) > 0,
        F.zip_with(
            toks,
            F.sequence(F.lit(1), F.size(toks)),
            lambda t, i: F.struct(t.alias("t"), i.alias("i")),
        ),
    ).otherwise(F.array().cast("array<struct<t:string,i:int>>"))
    kept = F.filter(
        pairs,
        lambda p: ~F.exists(
            ds, lambda s: (s <= p["i"]) & (p["i"] < s + window)
        ),
    )
    return joined.select(
        F.col(id_col),
        F.concat_ws(" ", F.transform(kept, lambda p: p["t"])).alias(
            "text_clean"
        ),
        F.size(toks).cast("long").alias("n_tokens"),
        (F.size(toks) - F.size(kept)).cast("long").alias("n_removed_tokens"),
    )


def duplicated_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = WINDOW,
    select_mod: int = SELECT_MOD,
    min_docs: int = 2,
    persist_spans: bool = False,
) -> DataFrame:
    """Per-document duplicated-span profile.

    Returns (id, n_spans, n_dup_spans, dup_span_frac): of the document's
    distinct selected span fingerprints, how many appear in >= min_docs
    documents, and the fraction (1e-8 grid). Documents with zero selected
    spans (shorter than `window`, or no fingerprint survived selection)
    are absent — they carry no span evidence either way. Callers cut on
    dup_span_frac to drop boilerplate-heavy documents, or join
    span_fingerprints back to locate the shared passages.

    The span frame feeds both the per-fp counts and the flag join, so
    Catalyst plans the fingerprint pass twice. That is the intended
    default at corpus scale: recomputing one codegen scan is CPU-linear,
    while materializing ~n_tokens/p 24-byte rows (persist) is a
    corpus-sized storage bill. `persist_spans=True` flips the tradeoff
    for corpora that fit executor storage. The counts side stays a
    partial-agg groupBy + join (NOT a count window over fp): a
    boilerplate span shared by 10^8 documents is a single window
    partition — one task — whereas the groupBy combines it map-side.
    """
    spans = span_fingerprints(docs, text_col, id_col, window, select_mod)
    if persist_spans:
        spans = spans.persist()
    counts = spans.groupBy("fp").agg(F.count("*").alias("n_docs"))
    return (
        spans.join(counts, "fp")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_spans"),
            F.sum((F.col("n_docs") >= min_docs).cast("long")).alias(
                "n_dup_spans"
            ),
        )
        .withColumn(
            "dup_span_frac",
            roundn(F.col("n_dup_spans") / F.col("n_spans"), 8),
        )
    )
