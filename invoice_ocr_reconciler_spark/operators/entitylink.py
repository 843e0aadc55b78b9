"""Anchor-dictionary entity linking — the classic wikification baseline
(Mihalcea & Csomai 2007; Milne & Witten 2008): the web's anchor text IS a
surface-form dictionary (what people call a page), and the
most-common-sense baseline links each mention to its most-linked target.
Search, knowledge-graph population and weak-supervision labeling all
start exactly here.

Pipeline:
  1. build_surface_dict: (surface -> top target) from harvested anchors
     (functions/urls.py:extract_anchors / graph.py:anchor_text_index
     lineage), with commonness = top target share — the dictionary is
     vocabulary-sized and broadcast-eligible;
  2. link_mentions: scan documents for dictionary surfaces (uni- and
     bigram candidates from the shared tokens_col contract), equi-join
     on the surface — never a scan-per-surface — and resolve overlaps by
     MAXIMAL MATCH: a unigram mention covered by an accepted bigram
     mention is suppressed (relational anti join on covered positions,
     the standard longest-match-wins rule).

All counts exact; commonness is a single BIGINT divide on the 6-grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_surface_dict(
    anchors: DataFrame,
    *,
    anchor_col: str = "anchor",
    link_col: str = "link",
    min_count: int = 2,
    max_tokens: int = 2,
) -> DataFrame:
    """(surface, target, n_links, n_surface, commonness, n_targets):
    top target per lowercased surface by (count desc, target asc) — the
    min-of-struct codegen aggregate, not a window (anchor_text_index
    contract) — keeping only surfaces of <= max_tokens tokens seen >=
    min_count times. commonness = top-target share of the surface's
    links (the Milne–Witten prior); n_targets = sense ambiguity.
    """
    from invoice_ocr_reconciler_spark.functions.text import tokens_col

    surf = F.concat_ws(" ", tokens_col(F.col(anchor_col)))
    base = (
        anchors.select(
            surf.alias("surface"), F.col(link_col).alias("target")
        )
        .where(
            (F.col("surface") != "")
            & (F.size(F.split(F.col("surface"), " ")) <= int(max_tokens))
        )
        .groupBy("surface", "target")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    top = F.min(F.struct((-F.col("cnt")).alias("neg"), F.col("target")))
    agg = base.groupBy("surface").agg(
        F.sum("cnt").cast("long").alias("n_surface"),
        F.count(F.lit(1)).cast("long").alias("n_targets"),
        top.alias("_top"),
    )
    from invoice_ocr_reconciler_spark.functions.text import roundn

    return agg.where(F.col("n_surface") >= int(min_count)).select(
        "surface",
        F.col("_top.target").alias("target"),
        (-F.col("_top.neg")).cast("long").alias("n_links"),
        "n_surface",
        roundn((-F.col("_top.neg")) / F.col("n_surface"), 6).alias(
            "commonness"
        ),
        "n_targets",
    )


def link_mentions(
    docs: DataFrame,
    surface_dict: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Mentions of dictionary surfaces in documents, longest match wins.

    Candidates are every token position's unigram and bigram (posexplode
    over the shared tokenization); each joins the broadcast dictionary
    on the surface string. Overlapping bigram matches resolve GREEDY
    LEFT-TO-RIGHT (standard maximal munch): within each island of
    consecutive matched start positions only the even offsets from the
    island start survive, so no token is ever claimed by two mentions
    ('a b' at p beats 'b c' at p+1; 'c d' at p+2 survives again). Kept
    bigrams then suppress unigram mentions at their two covered
    positions via one anti join on (doc, position) — no regex scan, no
    per-surface pass.

    Output: (doc_id, pos, n_tokens, surface, target, commonness).
    """
    from pyspark.sql import Window
    from invoice_ocr_reconciler_spark.functions.text import tokens_col

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_col(F.col(text_col))).alias("pos", "tok"),
    )
    uni = toks.select("doc_id", "pos", F.col("tok").alias("surface"))
    nxt = toks.select(
        "doc_id", (F.col("pos") - 1).alias("pos"), F.col("tok").alias("t2")
    )
    bi = (
        uni.join(nxt, ["doc_id", "pos"])
        .select(
            "doc_id",
            "pos",
            F.concat_ws(" ", "surface", "t2").alias("surface"),
        )
    )
    d = F.broadcast(
        surface_dict.select("surface", "target", "commonness")
    )
    bi_m = bi.join(d, "surface").select(
        "doc_id", "pos", F.lit(2).alias("n_tokens"),
        "surface", "target", "commonness",
    )
    # greedy left-to-right among overlapping bigram matches: gaps-and-
    # islands over start positions (per-doc window — documents are
    # bounded-length, the same shape the unigram suppression uses), keep
    # even offsets from each island's start
    wd = Window.partitionBy("doc_id").orderBy("pos")
    wisl = Window.partitionBy("doc_id", "_isl")
    bi_m = (
        bi_m.withColumn(
            "_gap",
            F.when(F.col("pos") - F.lag("pos").over(wd) == 1, 0).otherwise(1),
        )
        .withColumn(
            "_isl",
            F.sum("_gap").over(wd.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn("_start", F.min("pos").over(wisl))
        .where((F.col("pos") - F.col("_start")) % 2 == 0)
        .drop("_gap", "_isl", "_start")
    )
    covered = bi_m.select("doc_id", "pos").union(
        bi_m.select("doc_id", (F.col("pos") + 1).alias("pos"))
    )
    uni_m = (
        uni.join(d, "surface")
        .join(covered, ["doc_id", "pos"], "left_anti")
        .select(
            "doc_id", "pos", F.lit(1).alias("n_tokens"),
            "surface", "target", "commonness",
        )
    )
    return bi_m.unionByName(uni_m).orderBy("doc_id", "pos", "n_tokens")
