"""Bitext candidate mining — cross-language page alignment by URL slot.

Multilingual sites publish the same page under parallel language paths
(`/en/about` vs `/fr/about`, `?lang=de`); pairing those documents is how
parallel corpora are mined from a crawl at scale (the URL-structure pass
that seeds ParaCrawl/CCMatrix-style pipelines before any content scoring).

Extends the reference's key-normalize-then-join reconciliation shape
(backend/reconciliationEngine.js:15-23 normalize, :53-67 index+match) to
language slots: the "normalized key" is the url with its language marker
hollowed out, and the "match" is an exact self-join on that slot.

Scale shape: one scan -> codegen slot projection -> self equi-join on
(slot). Group size per slot is bounded by the language inventory (a few
dozen), so the join can't go quadratic the way similarity joins can; no
UDF, no broadcast needed (both sides are the same partitioned frame).
All regexes are RE2-safe so the DuckDB oracle replays the real slotting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# language markers recognized in order: a /xx/ path segment, then a
# lang=xx query param. Two-letter codes only — the common case; region
# variants (en-US) are a documented second pass.
_SEG_PAT = r"^(https?://[^/]+)/([a-z]{2})(/|$)"
_QP_PAT = r"[?&]lang=([a-z]{2})\b"


def bitext_candidates(
    pages: DataFrame, url_col: str = "url", lang_col: str = "lang"
) -> DataFrame:
    """Pair same-slot, different-language documents.

    A url participates when a language marker is found AND it agrees with
    the document's own lang column (disagreement means the marker was a
    false positive — e.g. /it/ in /item/ — or the page is mislabelled;
    either way it would poison the pair).

    -> (slot, lang_a, url_a, lang_b, url_b) with lang_a < lang_b, one row
    per unordered cross-language pair in the slot.
    """
    u = F.col(url_col)
    seg = F.regexp_extract(u, _SEG_PAT, 2)
    qp = F.regexp_extract(u, _QP_PAT, 1)
    marker = F.when(seg != "", seg).when(qp != "", qp)
    slot = F.when(
        seg != "", F.regexp_replace(u, _SEG_PAT, r"$1/*$3")
    ).otherwise(F.regexp_replace(u, r"([?&])lang=[a-z]{2}\b", r"$1lang=*"))
    tagged = (
        pages.select(
            u.alias("url"), F.col(lang_col).alias("lang"), marker.alias("marker"),
            slot.alias("slot"),
        )
        .filter(F.col("marker").isNotNull() & (F.col("marker") == F.col("lang")))
    )
    a = tagged.select(
        "slot", F.col("lang").alias("lang_a"), F.col("url").alias("url_a")
    )
    b = tagged.select(
        "slot", F.col("lang").alias("lang_b"), F.col("url").alias("url_b")
    )
    return a.join(b, "slot").filter(F.col("lang_a") < F.col("lang_b"))
