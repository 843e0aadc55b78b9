"""Boilerpipe NumWords/LinkDensity classification — a FOURTH main-content
extractor policy.

Kohlschuetter, Fankhauser & Nejdl, "Boilerplate Detection using Shallow
Text Features" (WSDM 2010) showed that two features — the number of
words in a block and its link density — plus the SAME two features of
the neighboring blocks, classify content vs boilerplate almost as well
as the full feature set. The published densitometric decision tree
(boilerpipe's NumWordsRulesClassifier) is:

    if curr_linkDensity > 1/3:                       BOILERPLATE
    elif prev_linkDensity <= 5/9:
        if curr_numWords > 16:                       CONTENT
        elif next_numWords > 15:                     CONTENT
        elif prev_numWords > 4:                      CONTENT
        else:                                        BOILERPLATE
    else:  # prev_linkDensity > 5/9 (link-heavy context)
        if curr_numWords > 40:                       CONTENT
        elif next_numWords > 17:                     CONTENT
        else:                                        BOILERPLATE

What makes this the informative fourth A/B arm: html_extract thresholds
per-block densities, justext propagates labels through a two-pass
context rule, readability scores per-block attribute hints — boilerpipe
is the LAG/LEAD policy (a block is judged by its neighbors' shallow
features), so compare_extractors now spans all four published policy
families over the identical segmentation.

Exactness contract (the justext cross-multiplication rule — no float
thresholds anywhere): link density comparisons are cleared divisions,
    curr: 3 * link_words >  1 * n_words     (density > 1/3)
    prev: 9 * link_words <= 5 * n_words     (density <= 5/9)
and word counts are exact integers, so Spark and DuckDB can never
disagree on a borderline block. Blocks beyond the document edge count
as empty (0 words, density 0 <= 5/9 — boilerpipe's start/end handling).

Three consumers (the readability.py triple):
  - ``extract_main_text_boilerpipe`` — pure-function extractor over
    html_extract's segmentation + rendering (byte-identical per url);
  - ``boilerpipe_classify`` — the same rule over any (doc, idx, text)
    segment frame: one codegen projection + two per-document lag/lead
    windows, zero Python (oracle-checked);
  - ``extract_pages_boilerpipe`` — the Arrow-batched page extractor in
    the extraction/udfs.py shape, feeding compare_extractors' 4-way F1.

Reference scope: extends the reference's single OCR extraction pass
(/root/reference/backend/server.js:110-134) — SURVEY.md §2.12.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# published thresholds as exact rationals (numerator, denominator)
CURR_DENSITY_NUM, CURR_DENSITY_DEN = 1, 3  # curr link density > 1/3
PREV_DENSITY_NUM, PREV_DENSITY_DEN = 5, 9  # prev link density <= 5/9
CURR_WORDS_LO = 16
CURR_WORDS_HI = 40
NEXT_WORDS_LO = 15
NEXT_WORDS_HI = 17
PREV_WORDS = 4

_WORD_RE = re.compile(r"\S+")
_ANCHOR_RE = re.compile(r"(?is)<a\b[^>]*>(.*?)</a>")
# the segment-frame link-word proxy both engines share: a whitespace
# token is a "link word" iff it is a bare URL (no raw markup survives
# the shared segmentation, so anchors degrade to their hrefs/urls)
_URL_TOKEN_SRC = r"^https?://"


def _n_words(text: str) -> int:
    return len(_WORD_RE.findall(text))


def _classify(
    curr_words: int,
    curr_link: int,
    prev_words: int,
    prev_link: int,
    next_words: int,
) -> bool:
    """The shared keep rule (Python side), cleared-division exact."""
    if curr_words <= 0:
        return False
    if CURR_DENSITY_DEN * curr_link > CURR_DENSITY_NUM * curr_words:
        return False
    if PREV_DENSITY_DEN * prev_link <= PREV_DENSITY_NUM * prev_words:
        if curr_words > CURR_WORDS_LO:
            return True
        if next_words > NEXT_WORDS_LO:
            return True
        return prev_words > PREV_WORDS
    if curr_words > CURR_WORDS_HI:
        return True
    return next_words > NEXT_WORDS_HI


def extract_main_text_boilerpipe(html_text: str) -> str:
    """Boilerplate strip via the NumWords/LinkDensity tree over
    html_extract's segmentation/rendering (byte-identical-per-url pure
    function). Link words here are the words of anchor element bodies
    in the RAW block — the paper's definition — counted before tags are
    stripped."""
    from invoice_ocr_reconciler_spark.extraction.html_extract import (
        _BLOCK_SPLIT_RE,
        _CELL_END_RE,
        _COMMENT_RE,
        _DROP_SUBTREE_RE,
        _LINE_BREAK_RE,
        _visible_text,
    )

    doc = _COMMENT_RE.sub(" ", html_text)
    doc = _DROP_SUBTREE_RE.sub(" ", doc)
    doc = _CELL_END_RE.sub("  ", doc)
    doc = _LINE_BREAK_RE.sub("\n", doc)

    blocks: list[tuple[str, int, int]] = []  # (text, n_words, link_words)
    for raw_block in _BLOCK_SPLIT_RE.split(doc):
        text = _visible_text(raw_block)
        if not text:
            continue
        link_words = sum(
            _n_words(_visible_text(m.group(1)))
            for m in _ANCHOR_RE.finditer(raw_block)
        )
        blocks.append((text, _n_words(text), link_words))

    kept: list[str] = []
    for i, (text, n_words, link_words) in enumerate(blocks):
        prev_words, prev_link = (
            (blocks[i - 1][1], blocks[i - 1][2]) if i > 0 else (0, 0)
        )
        next_words = blocks[i + 1][1] if i + 1 < len(blocks) else 0
        if _classify(n_words, link_words, prev_words, prev_link, next_words):
            kept.append(text)
    return "\n".join(kept)


def boilerpipe_classify(
    segments: DataFrame,
    text_col: str = "seg_text",
    doc_col: str = "doc_id",
    idx_col: str = "chunk_id",
) -> DataFrame:
    """Adds (n_words, link_words, prev_words, prev_link_words,
    next_words, keep) to a segment frame — one codegen feature
    projection plus lag/lead over a single per-document window (both
    windows share one sort: ONE exchange on doc, never corpus-global).
    Link words are bare-URL whitespace tokens (the segment frames this
    operator sees are post-segmentation text, where anchors have
    degraded to their urls). Blocks past either document edge count as
    empty — coalesce(lag/lead, 0)."""
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
        lambda t: t != "",
    )
    feats = segments.select(
        "*",
        F.size(toks).cast("long").alias("n_words"),
        F.size(F.filter(toks, lambda t: t.rlike(_URL_TOKEN_SRC)))
        .cast("long")
        .alias("link_words"),
    )
    w = Window.partitionBy(doc_col).orderBy(F.col(idx_col).asc())
    ctx = feats.select(
        "*",
        F.coalesce(F.lag("n_words", 1).over(w), F.lit(0))
        .cast("long")
        .alias("prev_words"),
        F.coalesce(F.lag("link_words", 1).over(w), F.lit(0))
        .cast("long")
        .alias("prev_link_words"),
        F.coalesce(F.lead("n_words", 1).over(w), F.lit(0))
        .cast("long")
        .alias("next_words"),
    )
    cw, cl = F.col("n_words"), F.col("link_words")
    pw, pl = F.col("prev_words"), F.col("prev_link_words")
    nw = F.col("next_words")
    curr_dense = (
        F.lit(CURR_DENSITY_DEN) * cl > F.lit(CURR_DENSITY_NUM) * cw
    )
    prev_plain = (
        F.lit(PREV_DENSITY_DEN) * pl <= F.lit(PREV_DENSITY_NUM) * pw
    )
    keep = F.when(cw <= 0, F.lit(False)).otherwise(
        F.when(curr_dense, F.lit(False)).otherwise(
            F.when(
                prev_plain,
                (cw > CURR_WORDS_LO)
                | (nw > NEXT_WORDS_LO)
                | (pw > PREV_WORDS),
            ).otherwise((cw > CURR_WORDS_HI) | (nw > NEXT_WORDS_HI))
        )
    )
    return ctx.select("*", keep.alias("keep"))


def extract_payload_boilerpipe(payload: bytes | None) -> str:
    """Dispatch like html_extract.extract_payload (PDFs share the
    layout parser — the tree is an HTML block policy)."""
    from invoice_ocr_reconciler_spark.extraction.html_extract import (
        extract_pdf_text,
    )

    if not payload:
        return ""
    if payload[:4] == b"%PDF":
        return extract_pdf_text(payload)
    return extract_main_text_boilerpipe(
        payload.decode("utf-8", errors="replace")
    )


def extract_pages_boilerpipe(pages: DataFrame) -> DataFrame:
    """pages(url, html, ...) -> (url, extracted_text) under the
    boilerpipe policy — the extraction/udfs.py Arrow-batched,
    column-pruned shape."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("extracted_text", T.StringType(), True),
        ]
    )

    def _batches(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "extracted_text": [
                        extract_payload_boilerpipe(p) for p in pdf["html"]
                    ],
                }
            )

    return pages.select("url", "html").mapInPandas(_batches, schema=schema)
