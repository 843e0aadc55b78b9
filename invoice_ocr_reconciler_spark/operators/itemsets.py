"""Frequent-itemset / association-rule mining over token baskets.

Market-basket analysis applied to a text corpus: basket = the DISTINCT
token set of a document, support = document frequency. Frequent pairs and
their association rules (confidence, lift) surface topic collocations that
positional PMI (operators/tfidf.py:collocations) cannot — terms that
co-occur anywhere in a page, not only adjacently. The same operator mines
(host, token), (lang, template) or any other basketized co-occurrence.

Distributed Apriori shape (the SON/park-chen-yu lineage, relationally):

- the ONLY quadratic step — in-basket pair generation — happens inside
  per-document arrays already pruned to frequent items and capped at
  `max_items` (degenerate mega-docs are DROPPED, the HOT_*_CAP contract
  elsewhere in this repo: a capped basket contributes no pairs, loudly
  documented), so per-doc work is <= C(max_items, 2) and corpus work is
  linear in documents;
- unigram supports are vocabulary-sized (broadcastable); candidate pairs
  never leave the executors un-aggregated (map-side partial counts);
- all metrics are exact BIGINT-product rationals on the 6-grid — no log,
  no libm (conf = supp_ab/supp_a; lift = supp_ab·N/(supp_a·supp_b)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# in-basket pair enumeration over a sorted array: (i, j>i) structs
_PAIR_EXPR = """
    flatten(transform(items, (a, i) ->
      transform(slice(items, i + 2, size(items) - i - 1), b ->
        struct(a AS t1, b AS t2))))
"""


def frequent_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_support: int = 10,
    max_items: int = 64,
) -> DataFrame:
    """All token pairs with document-frequency support >= min_support,
    with both directional confidences and lift.

    Output: (t1, t2, supp_ab, supp_a, supp_b, conf_a_b, conf_b_a, lift),
    t1 < t2, ordered by (supp_ab desc, t1, t2).
    """
    from invoice_ocr_reconciler_spark.functions.text import (
        roundn,
        tokens_col,
    )

    baskets = docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_sort(F.array_distinct(tokens_col(F.col(text_col)))).alias(
            "items"
        ),
    ).where(
        (F.size("items") > 0) & (F.size("items") <= int(max_items))
    )
    ex = baskets.select("doc_id", F.explode("items").alias("t"))
    uni = ex.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("supp"))
    freq = uni.where(F.col("supp") >= int(min_support))
    n_docs = baskets.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )

    pruned = (
        ex.join(F.broadcast(freq.select("t")), "t", "left_semi")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("t")).alias("items"))
    )
    pc = (
        pruned.select(F.explode(F.expr(_PAIR_EXPR)).alias("p"))
        .select("p.t1", "p.t2")
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).cast("long").alias("supp_ab"))
        .where(F.col("supp_ab") >= int(min_support))
    )
    sa = freq.select(F.col("t").alias("t1"), F.col("supp").alias("supp_a"))
    sb = freq.select(F.col("t").alias("t2"), F.col("supp").alias("supp_b"))
    out = (
        pc.join(F.broadcast(sa), "t1")
        .join(F.broadcast(sb), "t2")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "t1",
            "t2",
            "supp_ab",
            "supp_a",
            "supp_b",
            roundn(F.col("supp_ab") / F.col("supp_a"), 6).alias("conf_a_b"),
            roundn(F.col("supp_ab") / F.col("supp_b"), 6).alias("conf_b_a"),
            roundn(
                F.col("supp_ab")
                * F.col("n_docs")
                / (F.col("supp_a") * F.col("supp_b")),
                6,
            ).alias("lift"),
        )
    )
    return out.orderBy(F.col("supp_ab").desc(), "t1", "t2")


def association_rules(
    pairs: DataFrame,
    *,
    min_conf: float = 0.6,
) -> DataFrame:
    """Directional rules antecedent -> consequent from frequent_pairs()
    output, kept when confidence >= min_conf. Lift is direction-free.

    Output: (antecedent, consequent, supp_ab, conf, lift), ordered by
    (conf desc, antecedent, consequent).
    """
    fwd = pairs.select(
        F.col("t1").alias("antecedent"),
        F.col("t2").alias("consequent"),
        "supp_ab",
        F.col("conf_a_b").alias("conf"),
        "lift",
    )
    bwd = pairs.select(
        F.col("t2").alias("antecedent"),
        F.col("t1").alias("consequent"),
        "supp_ab",
        F.col("conf_b_a").alias("conf"),
        "lift",
    )
    return (
        fwd.unionByName(bwd)
        .where(F.col("conf") >= float(min_conf))
        .orderBy(F.col("conf").desc(), "antecedent", "consequent")
    )
