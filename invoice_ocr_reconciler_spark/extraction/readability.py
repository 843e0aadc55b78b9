"""Arc90/Readability-style block scoring — a THIRD main-content extractor.

The Readability.js (Arc90) family scores candidate blocks instead of
thresholding densities: content-y class/id names push a block up,
navigation-y names push it down, commas and raw length add evidence,
and link density discounts the total. This is the policy that powers
Firefox Reader View and the readability-lxml lineage — the natural A/B
against the density heuristic (html_extract) and the stopword-density
two-pass (justext).

Scoring, adapted to this repo's shared segmentation and kept INTEGER
(the justext cross-multiplication contract — no float thresholds):

    base  = min(n_chars // 100, 3) + n_commas
    hint  = +25 if a positive class/id hint matches the block's raw
            attributes, -25 if a negative one does (both -> net 0)
    keep  iff n_chars > 0 and
          (base + hint) * (n_chars - link_chars) >= KEEP_THRESHOLD * n_chars

i.e. score * (1 - link_density) >= KEEP_THRESHOLD with the division
cleared. Unlike justext there is NO context pass: Arc90 scoring is
per-block (its sibling-bonus refinement is a documented simplification
away) — which is exactly what makes the three-way extractor comparison
informative.

Three consumers:
  - ``extract_main_text_readability`` — drop-in pure-function extractor
    over html_extract's segmentation + text rendering (the policy is the
    only difference, so extraction_f1 deltas isolate it);
  - ``readability_classify`` — the same rule over any (id, idx, text[,
    attrs]) segment frame as whole-stage-codegen expressions, zero
    Python, zero shuffles (oracle-checked);
  - ``extract_pages_readability`` — the Arrow-batched page extractor in
    the extraction/udfs.py shape, feeding compare_extractors' 3-way F1.

Reference scope: like justext.py, this extends the reference's single
OCR extraction pass (backend/server.js:110-134) — SURVEY.md §2.12.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEEP_THRESHOLD = 2  # score units after the link-density discount
HINT_BONUS = 25
MAX_LEN_SCORE = 3  # Arc90's cap: +1 per 100 chars, at most +3

# the published Arc90 regexPatterns, trimmed to RE2-portable word lists
POSITIVE_HINT_SRC = r"(article|body|content|entry|main|post|text)"
NEGATIVE_HINT_SRC = (
    r"(banner|comment|footer|menu|nav|promo|share|sidebar|sponsor|widget)"
)
_ATTR_RE = re.compile(r"(?i)\b(?:class|id)\s*=\s*[\"']([^\"']*)[\"']")
_POS_RE = re.compile(POSITIVE_HINT_SRC)
_NEG_RE = re.compile(NEGATIVE_HINT_SRC)


def _score_keep(
    n_chars: int, n_commas: int, link_chars: int, pos_hint: bool, neg_hint: bool
) -> bool:
    """The one keep rule both engines share (Python side)."""
    if n_chars <= 0:
        return False
    base = min(n_chars // 100, MAX_LEN_SCORE) + n_commas
    hint = (HINT_BONUS if pos_hint else 0) - (HINT_BONUS if neg_hint else 0)
    return (base + hint) * (n_chars - link_chars) >= KEEP_THRESHOLD * n_chars


def extract_main_text_readability(html_text: str) -> str:
    """Boilerplate strip via Arc90 block scoring over html_extract's
    segmentation/rendering (byte-identical-per-url pure function)."""
    from invoice_ocr_reconciler_spark.extraction.html_extract import (
        _BLOCK_SPLIT_RE,
        _CELL_END_RE,
        _COMMENT_RE,
        _DROP_SUBTREE_RE,
        _LINE_BREAK_RE,
        _link_chars,
        _visible_text,
    )

    doc = _COMMENT_RE.sub(" ", html_text)
    doc = _DROP_SUBTREE_RE.sub(" ", doc)
    doc = _CELL_END_RE.sub("  ", doc)
    doc = _LINE_BREAK_RE.sub("\n", doc)

    kept: list[str] = []
    for raw_block in _BLOCK_SPLIT_RE.split(doc):
        text = _visible_text(raw_block)
        if not text:
            continue
        attrs = " ".join(m.group(1) for m in _ATTR_RE.finditer(raw_block))
        low_attrs = attrs.lower()
        if _score_keep(
            len(text),
            text.count(","),
            _link_chars(raw_block),
            bool(_POS_RE.search(low_attrs)),
            bool(_NEG_RE.search(low_attrs)),
        ):
            kept.append(text)
    return "\n".join(kept)


def readability_classify(
    segments: DataFrame,
    text_col: str = "seg_text",
    attrs_col: str | None = None,
) -> DataFrame:
    """Adds (n_chars, n_commas, link_chars, pos_hint, neg_hint,
    score_scaled, keep) to a segment frame — one codegen projection,
    zero joins/shuffles/Python. `score_scaled` is the cleared-division
    lhs (base+hint)*(n_chars-link_chars), published so the threshold
    comparison is auditable. Without `attrs_col` both hints are false
    (plain-text segments score on length/commas/links alone)."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(text)
    n_commas = n_chars - F.length(F.replace(text, F.lit(","), F.lit("")))
    link_chars = n_chars - F.length(
        F.regexp_replace(text, r"https?://\S+", F.lit(""))
    )
    if attrs_col is None:
        pos_hint = F.lit(False)
        neg_hint = F.lit(False)
    else:
        low_attrs = F.lower(F.coalesce(F.col(attrs_col), F.lit("")))
        pos_hint = low_attrs.rlike(POSITIVE_HINT_SRC)
        neg_hint = low_attrs.rlike(NEGATIVE_HINT_SRC)
    feats = segments.select(
        "*",
        n_chars.alias("n_chars"),
        n_commas.alias("n_commas"),
        link_chars.alias("link_chars"),
        pos_hint.alias("pos_hint"),
        neg_hint.alias("neg_hint"),
    )
    base = F.least(
        F.floor(F.col("n_chars") / 100).cast("long"), F.lit(MAX_LEN_SCORE)
    ) + F.col("n_commas")
    hint = F.when(F.col("pos_hint"), F.lit(HINT_BONUS)).otherwise(
        F.lit(0)
    ) - F.when(F.col("neg_hint"), F.lit(HINT_BONUS)).otherwise(F.lit(0))
    score = (base + hint) * (F.col("n_chars") - F.col("link_chars"))
    return feats.select(
        "*",
        score.cast("long").alias("score_scaled"),
        (
            (F.col("n_chars") > 0)
            & (score >= F.lit(KEEP_THRESHOLD) * F.col("n_chars"))
        ).alias("keep"),
    )


def extract_payload_readability(payload: bytes | None) -> str:
    """Dispatch like html_extract.extract_payload (PDFs share the layout
    parser — Arc90 is an HTML block policy)."""
    from invoice_ocr_reconciler_spark.extraction.html_extract import (
        extract_pdf_text,
    )

    if not payload:
        return ""
    if payload[:4] == b"%PDF":
        return extract_pdf_text(payload)
    return extract_main_text_readability(
        payload.decode("utf-8", errors="replace")
    )


def extract_pages_readability(pages: DataFrame) -> DataFrame:
    """pages(url, html, ...) -> (url, extracted_text) under the Arc90
    policy — the extraction/udfs.py Arrow-batched, column-pruned shape."""
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
                        extract_payload_readability(p) for p in pdf["html"]
                    ],
                }
            )

    return pages.select("url", "html").mapInPandas(_batches, schema=schema)
