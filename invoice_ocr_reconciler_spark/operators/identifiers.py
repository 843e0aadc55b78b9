"""Scholarly/bibliographic identifier harvest + license detection +
reply-chain cleanup — the "provenance and reuse" band of web-text
curation.

* ``extract_identifiers`` — DOIs, arXiv ids, and ISBN-13s lifted from
  text, one row per mention, with an integer-exact ISBN-13 checksum
  validation flag (weights 1,3,1,3,... mod 10 — computed as a codegen
  aggregate over the digit array, no Python). Academic-corpus pipelines
  key dedup/linking on these; invalid-checksum ISBNs are the classic
  OCR-noise signal.
* ``detect_license`` — license classification from the canonical header
  phrases (the Stack/StarCoder-style permissive-license gate): MIT,
  Apache-2.0, GPL, BSD, CC-BY(-SA), with a fixed precedence chain and a
  `permissive` flag. Phrase matching is lowercased `contains` — no
  regex needed, trivially RE2/Java-identical.
* ``strip_reply_chains`` — email/forum quote cleanup: drops lines
  quoted with any depth of leading '>' and the "On ... wrote:"
  attribution line above them, reporting quoted-line count and max
  quote depth. The mailing-list/forum analog of boilerplate stripping.

All three are single codegen projections (plus one explode for the
mention rows) — scan-bound at 10^12 documents, zero joins, zero
shuffles, zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# RE2-portable (no lookaround); DOI suffix charset per Crossref guidance
DOI_RE = r"\b10\.[0-9]{4,9}/[-._;()/:A-Za-z0-9]+"
ARXIV_RE = r"\barXiv:[0-9]{4}\.[0-9]{4,5}(?:v[0-9]+)?"
ISBN13_RE = r"\b97[89][0-9]{10}\b"


def _isbn13_valid(ident: Column) -> Column:
    """Integer-exact ISBN-13 checksum: sum(digit_i * (1,3,1,3,...)) % 10
    == 0, as a codegen aggregate over the 13-digit array."""
    # split('', '') leaves empty-string elements — filter before casting
    digits = F.filter(F.split(ident, ""), lambda t: t != "")
    weighted = F.aggregate(
        F.zip_with(
            F.slice(digits, 1, 13),
            F.sequence(F.lit(0), F.lit(12)),
            lambda d, i: d.cast("int")
            * F.when(i % 2 == 0, F.lit(1)).otherwise(F.lit(3)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return weighted % 10 == 0


def extract_identifiers(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, kind, ident, is_valid): one row per identifier mention, in
    document order per kind. `is_valid` is the ISBN-13 checksum for
    ISBNs and TRUE for DOIs/arXiv ids (their registries, not their
    syntax, define validity). Documents without identifiers emit no
    rows (pair with a left join for coverage stats)."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    kinds = [
        ("doi", DOI_RE),
        ("arxiv", ARXIV_RE),
        ("isbn13", ISBN13_RE),
    ]
    def _tagged(kind: str, pat: str):
        # closure, NOT a default arg: a 2-param lambda would make pyspark
        # bind the element INDEX to the second parameter
        return F.transform(
            F.regexp_extract_all(text, F.lit(pat), F.lit(0)),
            lambda m: F.struct(F.lit(kind).alias("kind"), m.alias("ident")),
        )

    parts = [_tagged(kind, pat) for kind, pat in kinds]
    exploded = docs.select(
        F.col(id_col), F.explode(F.concat(*parts)).alias("m")
    ).select(
        id_col, F.col("m.kind").alias("kind"), F.col("m.ident").alias("ident")
    )
    return exploded.select(
        "*",
        F.when(F.col("kind") == "isbn13", _isbn13_valid(F.col("ident")))
        .otherwise(F.lit(True))
        .alias("is_valid"),
    )


# (license, permissive, [required phrases, all lowercase contains]) in
# PRECEDENCE order — first match wins; phrases from the canonical headers
LICENSE_RULES = (
    ("MIT", True, ("permission is hereby granted",)),
    ("Apache-2.0", True, ("apache license", "version 2.0")),
    ("GPL", False, ("gnu general public license",)),
    ("BSD", True, ("redistribution and use in source and binary forms",)),
    ("CC-BY-SA", False, ("creative commons", "sharealike")),
    ("CC-BY", True, ("creative commons", "attribution")),
)


def detect_license(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, license, permissive): first LICENSE_RULES entry whose phrases
    ALL appear (lowercased) wins; no match -> ('none', false). The
    coarse corpus gate — a real compliance pass layers SPDX ids and
    per-file scanners on top; this is the bulk filter that decides what
    even reaches them."""
    low = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    lic = None
    perm = None
    for name, permissive, phrases in LICENSE_RULES:
        cond = None
        for p in phrases:
            c = F.contains(low, F.lit(p))
            cond = c if cond is None else (cond & c)
        lic = (
            F.when(cond, F.lit(name))
            if lic is None
            else lic.when(cond, F.lit(name))
        )
        perm = (
            F.when(cond, F.lit(permissive))
            if perm is None
            else perm.when(cond, F.lit(permissive))
        )
    return docs.select(
        F.col(id_col),
        lic.otherwise(F.lit("none")).alias("license"),
        perm.otherwise(F.lit(False)).alias("permissive"),
    )


# quote markers: any run of '>' (with optional spaces between) at line
# start; attribution: a line starting 'on ' and ending 'wrote:' (case-
# insensitive via lower() before matching — RE2-portable, no inline flags)
_QUOTE_RE = r"^\s*>"
_DEPTH_STRIP_RE = r"[^>]"
_ATTRIB_RE = r"^on .*wrote:$"


def strip_reply_chains(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_lines, n_quoted, n_attrib, max_depth, text_clean): removes
    quoted reply lines ('> ...' at any depth) and 'On ... wrote:'
    attribution lines; max_depth counts the deepest '>' nesting seen.
    Empty/NULL docs pass through as empty with zero counts."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    projected = docs.select(
        F.col(id_col), F.split(text, "\n").alias("lines")
    )
    lines = F.col("lines")
    is_quote = lambda l: l.rlike(_QUOTE_RE)  # noqa: E731
    is_attrib = lambda l: F.lower(F.trim(l)).rlike(_ATTRIB_RE)  # noqa: E731
    quoted = F.filter(lines, is_quote)
    kept = F.filter(lines, lambda l: ~is_quote(l) & ~is_attrib(l))
    # depth of one quoted line = count of '>' chars in its marker prefix;
    # the whole-line '>' count equals the marker depth for marker chars
    # only, so strip non-'>' chars after trimming the leading run
    depth_of = lambda l: F.length(  # noqa: E731
        F.regexp_replace(
            F.regexp_extract(l, r"^\s*((?:>\s*)+)", 1), _DEPTH_STRIP_RE, ""
        )
    )
    max_depth = F.coalesce(
        F.array_max(F.transform(quoted, depth_of)), F.lit(0)
    )
    n_lines = F.size(lines)
    n_quoted = F.size(quoted)
    n_kept = F.size(kept)
    return projected.select(
        id_col,
        n_lines.alias("n_lines"),
        n_quoted.alias("n_quoted"),
        (n_lines - n_quoted - n_kept).alias("n_attrib"),
        max_depth.alias("max_depth"),
        F.array_join(kept, "\n").alias("text_clean"),
    )
