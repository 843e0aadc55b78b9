"""Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003, the MOSS
local fingerprinting scheme).

The dedup band's missing guarantee: MinHash/SimHash estimate GLOBAL
similarity; the suffix/spans band finds exact duplicated substrings at
a fixed window. Winnowing sits between them — a bounded-density
fingerprint set with a LOCAL guarantee: any shared token run of at
least w + k - 1 tokens between two documents is certain to share at
least one selected fingerprint (Theorem 1 of the paper). That makes it
the standard code-plagiarism / quote-syndication detector: index the
selected fingerprints, join on them, verify candidates.

Scheme: hash every k-token gram (md5_u60 of the space-joined gram —
the engine-portable shared hash), slide a window of w consecutive gram
hashes, select the minimum of each window — ties broken by RIGHTMOST
occurrence (the paper's rule, which minimizes selections across
windows) — and emit the distinct (position, hash) picks. Expected
density is 2/(w+1) of all grams, so the index is ~2/(w+1) the size of
a full k-gram postings table.

Implementation is PURE CODEGEN — one projection over a prior tokens
array, array ops only (hash transform, per-window slice + array_min +
rightmost array_position via the reversed slice), one explode, zero
joins/shuffles/Python: scan-bound at 10^12 documents. Per-doc work is
O(grams * w). Documents with >= k tokens but fewer than w windows
collapse to one whole-array window (every doc with a gram gets >= 1
fingerprint); shorter documents emit nothing.

Downstream matching composes with the existing capped-bucket pair
machinery (operators/dedup.py HOT_BUCKET_CAP precedent): group by
fp, cap degenerate buckets, generate pairs inside array exprs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.functions.text import (
    _word_ngrams,
    md5_u60,
    tokens_col,
)


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Selected fingerprints per document: (id, pos, fp) exploded,
    ordered by (id, pos). `pos` is the 1-based gram position of the
    selected hash; consecutive windows that select the same (pos, fp)
    collapse (array_distinct) — the paper's selection-set semantics."""
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k} w={w}")
    # the HOF-capture contract (BENCH/BASELINE.md): the gram-hash array
    # MUST be a materialized column before any per-window lambda slices
    # it — a captured expression re-evaluates tokenize+ngrams+md5 for
    # the WHOLE document once per window (O(len^2) md5 calls; measured
    # 507s for this query at sf0.1 before the fix, 0.5s after)
    hashed = docs.select(
        F.col(id_col),
        F.transform(
            _word_ngrams(tokens_col(F.col(text_col)), k),
            lambda g: md5_u60(g),
        ).alias("_h"),
    )
    hashes = F.col("_h")
    m = F.size(hashes)
    n_win = F.greatest(m - F.lit(w - 1), F.lit(1))
    # window j (1-based): slice of w hashes (or the whole array when
    # m < w); rightmost-min via array_position on the reversed slice
    def pick(j):
        s = F.slice(hashes, j, w)
        minv = F.array_min(s)
        rp = F.array_position(F.reverse(s), minv)  # 1-based from the end
        pos = j + F.least(F.size(s), F.lit(w)) - rp.cast("int")
        return F.struct(pos.cast("int").alias("pos"), minv.alias("fp"))

    picks = F.array_distinct(
        F.transform(F.sequence(F.lit(1), n_win), pick)
    )
    # second HOF-shape contract (measured, not guessed): explode runs
    # INLINE in the same select as the picks expression, and the
    # zero-gram guard is a per-element null-fp filter, NOT a CASE over
    # the array — wrapping the array in CASE WHEN and exploding a named
    # column through an extra select boundary made Catalyst re-evaluate
    # the generator per output row (22.6s -> 0.34s at sf0.01 for the
    # identical selection set). An empty hash array yields one pick
    # with fp = array_min([]) = NULL, which the filter drops.
    valid = F.filter(picks, lambda x: x["fp"].isNotNull())
    out = hashed.select(F.col(id_col), F.explode(valid).alias("p"))
    return out.select(
        id_col,
        F.col("p.pos").alias("pos"),
        F.col("p.fp").alias("fp"),
    ).orderBy(id_col, "pos", "fp")
