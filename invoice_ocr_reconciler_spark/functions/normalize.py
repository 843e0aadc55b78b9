"""Vendor / amount normalization as pure column expressions (JVM-side).

Reimplements the reference's normalizers (reference:
backend/reconciliationEngine.js:8-23) with built-in pyspark.sql.functions so
the whole key-prep stage stays inside whole-stage codegen — no Python
crossing on the join's hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# word-bounded legal suffixes, optional trailing dot
# (reference: backend/reconciliationEngine.js:19)
_LEGAL_SUFFIX_RE = (
    r"\b(ltd|limited|inc|incorporated|llc|corp|corporation|co|company|pvt|private)\b\.?"
)


def normalize_vendor_col(col: Column) -> Column:
    """lowercase -> drop legal suffixes -> strip non-[a-z0-9 ] -> collapse ws -> trim.

    reference: backend/reconciliationEngine.js:15-23; null -> '' (JS returns '').
    """
    c = F.lower(F.coalesce(col, F.lit("")))
    c = F.regexp_replace(c, _LEGAL_SUFFIX_RE, "")
    c = F.regexp_replace(c, r"[^a-z0-9\s]", "")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def normalize_amount_col(col: Column) -> Column:
    """Strip [$ , whitespace], cast to double, null/NaN -> 0.0.

    reference: backend/reconciliationEngine.js:8-13 (parseFloat(..)||0).
    """
    as_str = F.regexp_replace(col.cast("string"), r"[$,\s]", "")
    d = as_str.cast("double")
    return F.when(d.isNull() | F.isnan(d), F.lit(0.0)).otherwise(d)


def vendor_block_key(norm_col: Column) -> Column:
    """Block key for the blocked similarity join (SURVEY.md §4.3-3).

    First token of the normalized vendor; fallback = 4-char prefix when the
    name is a single run. Each ledger record lands in exactly ONE block, so
    per-block greedy assignment is globally exact (no cross-block contention
    by construction).
    """
    first_token = F.element_at(F.split(norm_col, " ", 2), 1)
    return F.when(
        (first_token.isNotNull()) & (F.length(first_token) > 0), first_token
    ).otherwise(F.substring(norm_col, 1, 4))


_SND_FROM = "BFPVCGJKQSXZDTLMNRAEIOUY"
_SND_TO = "111122222222334556000000"


def soundex_code(name: Column) -> Column:
    """American Soundex (Russell 1918; the NARA standard) as a pure
    codegen expression — THE classic phonetic blocking key for record
    linkage (Smith/Smyth/Schmidt collide where equi-blocking separates
    them; composes with fs_linkage and sorted_neighborhood_pairs).

    Standard rules implemented exactly: first letter kept; H/W dropped
    from the REST before coding (codes separated only by h/w merge);
    vowels code 0 (separators — they survive until after the adjacent
    collapse, so codes separated by a vowel do NOT merge); the first
    letter's code participates in the collapse (PFISTER -> P236, not
    P123); adjacent-duplicate collapse is a 2-pass literal replace chain
    per digit (RE2-portable — NO backreference regex, the markdown_export
    ordered-chain contract); zeros stripped, right-padded to 4.
    NULL/letterless input -> NULL.

    Verified against the published vectors: ROBERT/RUPERT -> R163,
    ASHCRAFT -> A261, TYMCZAK -> T522, PFISTER -> P236, HONEYMAN -> H555.
    """
    u = F.upper(F.regexp_replace(F.coalesce(name, F.lit("")), "[^A-Za-z]", ""))
    first = F.substring(u, 1, 1)
    rest = F.translate(u.substr(F.lit(2), F.length(u)), "HW", "")
    coded = F.concat(
        F.translate(first, _SND_FROM, _SND_TO),
        F.translate(rest, _SND_FROM, _SND_TO),
    )
    for d in "123456":
        coded = F.replace(coded, F.lit(d + d), F.lit(d))
        coded = F.replace(coded, F.lit(d + d), F.lit(d))
    tail = F.replace(coded.substr(F.lit(2), F.length(coded)), F.lit("0"), F.lit(""))
    out = F.rpad(F.concat(first, F.substring(tail, 1, 3)), 4, "0")
    return F.when(F.length(u) > 0, out)
