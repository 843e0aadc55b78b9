"""Image-text pair mining from page HTML — the LAION/CC-pairs recipe.

Multimodal training corpora (CLIP-style) are mined from web pages as
(image url, caption) pairs where the caption is the image's ``alt``
text (Schuhmann et al., LAION-400M/5B: Common Crawl WAT/WARC -> <img>
alt-text pairs, filtered by length and later by CLIP score). This
operator is the extraction step of that recipe over the same pages
table the rest of the engine reads; downstream, the pairs join to the
fetched-image table by img_url and flow into multimodal_features /
multimodal_phash_pairs for the decode/near-dup stages.

Same zero-shuffle codegen shape as functions/urls.py:extract_links —
lenient binary->string cast (one junk payload must never fail a
10^12-row scan), regexp_extract_all over ``<img ...>`` tags in document
order, per-tag attribute extraction inside an array transform, explode,
then URL resolution of the src against the page url. RE2-safe (no
lookaround — the oracle replays every regex in DuckDB).

Filter semantics (the published LAION cuts that are decidable without
fetching the image):
  - src empty, ``data:`` inline, ``javascript:`` -> dropped (not
    fetchable/crawlable);
  - caption = whitespace-normalized alt; pairs whose caption is shorter
    than ``min_alt_chars`` (default 5, the LAION cut) or longer than
    ``max_alt_chars`` are dropped — empty/missing alt and decorative
    "x"/"logo" stubs carry no supervision;
  - img_pos is the 1-based position among ALL img tags of the page
    BEFORE any drop, so kept pairs have stable positions under filter-
    policy changes (the extract_links link_pos contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def image_caption_pairs(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    min_alt_chars: int = 5,
    max_alt_chars: int = 512,
) -> DataFrame:
    """-> (url, img_url, caption, img_pos): one row per kept <img> of
    every page; src resolved absolute, caption whitespace-normalized.

    Attribute order inside the tag does not matter (src/alt are each
    extracted by their own regex over the tag text); values are taken
    from double-quoted attributes, the house convention shared with
    extract_links/extract_anchors.
    """
    html = F.col(html_col).cast("string")
    tags = F.regexp_extract_all(html, F.lit(r"(<img\s[^>]*>)"), 1)
    # attribute names are boundary-anchored ((?:^|[^\w-])) so lazy-load
    # markup's data-src / data-alt never shadows or substitutes for the
    # real attribute (an unanchored src=" also matches INSIDE data-src=")
    parsed = F.transform(
        tags,
        lambda e: F.struct(
            F.regexp_extract(e, r'(?:^|[^\w-])src="([^"]*)"', 1).alias("raw"),
            F.trim(
                F.regexp_replace(
                    F.regexp_extract(e, r'(?:^|[^\w-])alt="([^"]*)"', 1),
                    r"\s+",
                    " ",
                )
            ).alias("caption"),
        ),
    )
    ex = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(parsed).alias("_p0", "_t"),
    ).select(
        "url",
        F.col("_t.raw").alias("_raw"),
        F.col("_t.caption").alias("caption"),
        (F.col("_p0") + 1).cast("int").alias("img_pos"),
    )
    raw = F.col("_raw")
    scheme = F.lower(F.regexp_extract(F.col("url"), r"^(?i)(https?):", 1))
    base = F.concat(
        scheme,
        F.lit("://"),
        F.regexp_extract(F.col("url"), r"^(?i)https?://([^/?#]+)", 1),
    )
    from invoice_ocr_reconciler_spark.functions.urls import page_dir_col

    dir_ = page_dir_col(F.col("url"))
    resolved = (
        F.when(raw.rlike(r"^(?i)https?://"), raw)
        .when(raw.startswith("//"), F.concat(scheme, F.lit(":"), raw))
        .when(raw.startswith("/"), F.concat(base, raw))
        .when(
            (raw == "") | raw.rlike(r"^(?i)(data:|javascript:)"),
            F.lit(None).cast("string"),
        )
        .otherwise(F.concat(dir_, raw))
    )
    return (
        ex.select(
            "url",
            resolved.alias("img_url"),
            "caption",
            "img_pos",
        )
        .filter(
            F.col("img_url").isNotNull()
            & (F.length("caption") >= int(min_alt_chars))
            & (F.length("caption") <= int(max_alt_chars))
        )
    )
