"""HTML -> Markdown export and heading-scoped section chunking — the
structure-preserving complement to the plain-text WET export.

Modern training-data pipelines keep document STRUCTURE (headings,
lists, links, emphasis) because markdown survives tokenization and
carries section semantics the flat WET rendering throws away; and RAG /
long-context chunkers split at section boundaries, not fixed token
windows, so retrieval units stay topically coherent.

Both operators are pure whole-stage-codegen regex pipelines over a
RESTRICTED, documented tag grammar (the html_outline / wet_export
discipline — a deterministic transducer, not a browser): comments and
script/style/nav subtrees are dropped; h1-h6, p, br, li, a[href],
b/strong, i/em translate; every other tag strips to its text. The
rule set is engine-portable RE2: no backreferences (h1-h6 are SIX
unrolled rules, not one back-referencing rule), no lookaround
(sections split on an injected \\x01 sentinel, not a lookahead), and
[\\s\\S] instead of dotall-dot inside element bodies.

``markdown_export``  pages(url, html) -> (url, markdown)
``section_chunks``   pages(url, html) -> one row per heading-scoped
    section: (url, sec_idx, level, heading, content, n_chars); level 0
    is the pre-heading preamble (dropped when empty). Chunkers that
    need token caps compose operators/chunking.py downstream.

Reference scope: extends the reference's single text-render path
(/root/reference/backend/server.js:110-134) — SURVEY.md §2.12. The
grammar is public knowledge (CommonMark element mapping).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SEP = "\x01"

# (pattern, replacement) in APPLICATION ORDER — the operator contract
# the DuckDB oracle replays rule-for-rule (replacement spelled \\1
# there, $1 here; same semantics). All RE2-portable.
MD_RULES: tuple[tuple[str, str], ...] = (
    # drop invisible/structural subtrees first. Tag NAMES are always
    # closed with (?:\s[^>]*)?> — a bare [^>]* would make <b match
    # <body, <p match <pre, <i match <img (found by test, kept as the
    # contract's one sharp edge to document)
    (r"(?is)<!--[\s\S]*?-->", " "),
    (r"(?is)<(?:script|style|noscript|nav|header|footer)(?:\s[^>]*)?>[\s\S]*?</\s*(?:script|style|noscript|nav|header|footer)\s*>", " "),
    # links BEFORE emphasis/blocks so the anchor body still has its tags
    (r'(?is)<a\s[^>]*href="([^"]*)"[^>]*>([\s\S]*?)</a\s*>', "[$2]($1)"),
    # h1..h6 unrolled (no backreference)
    (r"(?is)<h1(?:\s[^>]*)?>([\s\S]*?)</h1\s*>", "\n\n# $1\n\n"),
    (r"(?is)<h2(?:\s[^>]*)?>([\s\S]*?)</h2\s*>", "\n\n## $1\n\n"),
    (r"(?is)<h3(?:\s[^>]*)?>([\s\S]*?)</h3\s*>", "\n\n### $1\n\n"),
    (r"(?is)<h4(?:\s[^>]*)?>([\s\S]*?)</h4\s*>", "\n\n#### $1\n\n"),
    (r"(?is)<h5(?:\s[^>]*)?>([\s\S]*?)</h5\s*>", "\n\n##### $1\n\n"),
    (r"(?is)<h6(?:\s[^>]*)?>([\s\S]*?)</h6\s*>", "\n\n###### $1\n\n"),
    (r"(?is)<(?:b|strong)(?:\s[^>]*)?>([\s\S]*?)</(?:b|strong)\s*>", "**$1**"),
    (r"(?is)<(?:i|em)(?:\s[^>]*)?>([\s\S]*?)</(?:i|em)\s*>", "*$1*"),
    (r"(?i)<li(?:\s[^>]*)?>", "\n- "),
    (r"(?i)<br\s*/?>", "\n"),
    (r"(?i)<p(?:\s[^>]*)?>", "\n\n"),
    # strip every remaining tag
    (r"(?is)<[^>]+>", " "),
    # entities (amp LAST so &amp;lt; decodes to the literal "&lt;")
    (r"&nbsp;", " "),
    (r"&quot;", '"'),
    (r"&#39;", "'"),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&amp;", "&"),
    # whitespace canonicalization
    (r"\r\n?", "\n"),
    (r"[ \t]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n{3,}", "\n\n"),
    # edge trim incl. newlines (trim() strips spaces only)
    (r"^\s+", ""),
    (r"\s+$", ""),
)


def markdown_col(html: Column) -> Column:
    """The shared html -> markdown expression (one codegen chain)."""
    out = F.coalesce(html, F.lit(""))
    for pat, rep in MD_RULES:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(out)


def markdown_export(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, markdown) — one codegen projection, zero shuffles/Python.
    `html_col` may be string or binary (utf-8 decoded)."""
    col = F.col(html_col)
    if dict(pages.dtypes).get(html_col) == "binary":
        col = col.cast("string")
    return pages.select(
        F.col(url_col).alias("url"), markdown_col(col).alias("markdown")
    )


def section_chunks(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Heading-scoped sections of the markdown rendering -> (url,
    sec_idx, level, heading, content, n_chars).

    A sentinel is injected before every heading line ((?m) anchor — no
    lookaround) and the document splits on it: each piece is one
    section. level = the #-run length of the piece's first line (0 for
    the preamble piece), heading = that line's text, content =
    everything after it, n_chars = length(content). Empty pieces (e.g.
    an empty preamble before an immediate h1) are dropped; sec_idx is
    the 0-based document order AFTER the drop, so it is dense."""
    md = markdown_col(
        F.col(html_col).cast("string")
        if dict(pages.dtypes).get(html_col) == "binary"
        else F.col(html_col)
    )
    # whitespace trim incl. newlines: trim() strips spaces only, and
    # split pieces carry the \n\n block padding
    wtrim = lambda c: F.regexp_replace(  # noqa: E731
        F.regexp_replace(c, r"^\s+", ""), r"\s+$", ""
    )
    marked = F.regexp_replace(md, r"(?m)^(#{1,6} )", _SEP + "$1")
    pieces = F.filter(
        F.transform(F.split(marked, _SEP), wtrim),
        lambda p: p != "",
    )
    secs = F.transform(
        pieces,
        lambda p: F.struct(
            F.length(F.regexp_extract(p, r"^(#{1,6}) ", 1))
            .cast("int")
            .alias("level"),
            F.regexp_extract(p, r"^#{1,6} ([^\n]*)", 1).alias("heading"),
            wtrim(
                F.when(
                    F.regexp_extract(p, r"^(#{1,6}) ", 1) != "",
                    F.regexp_replace(p, r"^#{1,6} [^\n]*\n?", ""),
                ).otherwise(p)
            ).alias("content"),
        ),
    )
    out = pages.select(
        F.col(url_col).alias("url"), F.posexplode(secs).alias("sec_idx", "s")
    )
    return out.select(
        "url",
        F.col("sec_idx").cast("int"),
        F.col("s.level").alias("level"),
        F.col("s.heading").alias("heading"),
        F.col("s.content").alias("content"),
        F.length("s.content").cast("long").alias("n_chars"),
    )
