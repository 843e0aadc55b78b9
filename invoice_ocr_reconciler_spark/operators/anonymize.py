"""Coreference-preserving PII pseudonymization.

functions/pii.py's flat redaction maps every email to the same
``<EMAIL>`` token — destroying coreference ("write to a@x.com or
b@y.com, a@x.com is faster" loses that two addresses exist and which
one repeats). The training-data-friendly form is CONSISTENT
pseudonymization: every occurrence of the same entity gets the same
numbered placeholder (``<EMAIL_17>``), distinct entities get distinct
numbers, corpus-wide — the anonymization used when downstream tasks
(QA, summarization, linking) must survive the scrub.

Two numbering modes:
  * ``dense`` — placeholders ``<EMAIL_k>`` with k = dense rank of the
    entity ordered by (md5(entity), entity): stable, reproducible,
    leak-free (rank order is hash order, not frequency or lexicographic
    order, so numbers reveal nothing about the entity). The global rank
    window runs over DISTINCT entities — bounded by the entity
    vocabulary, fine for eval/probe corpora; the single-partition
    window is this mode's documented bound.
  * ``hash`` — placeholders ``<EMAIL_h8hex>`` from md5(entity) directly:
    no global window, no barrier, fully map-side after one distinct —
    the 10^12-document path. Same consistency guarantee (collisions
    2^-32 per pair).

Replacement folds each document's OWN entity list (sorted longest-first
so an entity that is a substring of a sibling entity — 'a@b.com' inside
'xa@b.com' — cannot corrupt it) with a literal `replace` per entity:
F.aggregate over a sorted struct array, zero Python. The DuckDB oracle
replays the fold with list_reduce.

Shape at scale: one regexp extraction pass, one distinct over (entity)
(partial-agg), one broadcast join of the entity->placeholder map, one
groupBy(doc) to collect the per-doc map, one left join back. The text
column crosses exactly two exchanges (collect + join-back) in dense
mode and the corpus is never exploded beyond its entity mentions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.functions.pii import EMAIL_RE
from invoice_ocr_reconciler_spark.functions.text import md5_u60


def pseudonymize(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    pattern: str = EMAIL_RE,
    token_prefix: str = "EMAIL",
    numbering: str = "dense",
    dense_cap: int = 1_000_000,
) -> DataFrame:
    """(id, n_mentions, n_entities, text_pseudo) — see module docstring.

    `pattern` must be RE2-portable (the pii.py contract) so the oracle
    can replay extraction. Documents without matches pass through with
    n_mentions = n_entities = 0 and text_pseudo == the original text
    (NULL text coalesces to '').

    Dense numbering ranks the full entity dictionary in ONE window
    partition (the ranks must be globally dense), so it is gated by
    ``dense_cap`` — above it the call fails LOUDLY pointing at
    numbering='hash', the scale path whose placeholders need no global
    ordering (the bootstrap_ci bounded-input precedent).
    """
    if numbering not in ("dense", "hash"):
        raise ValueError(f"unknown numbering mode: {numbering!r}")
    text = F.coalesce(F.col(text_col), F.lit(""))
    mentions = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.regexp_extract_all(text, F.lit(pattern), F.lit(0))
        ).alias("entity"),
    )
    per_doc_mentions = mentions.groupBy("_id").agg(
        F.count("*").alias("n_mentions")
    )
    distinct_pairs = mentions.distinct()
    entities = distinct_pairs.select("entity").distinct()
    if numbering == "dense":
        # one count job to enforce the single-partition-window bound
        n_ent = entities.count()
        if n_ent > int(dense_cap):
            raise ValueError(
                f"pseudonymize: dense numbering ranks the entity "
                f"dictionary in one window partition and got {n_ent} "
                f"entities > dense_cap={dense_cap}; use numbering='hash' "
                "(the scale path) or raise dense_cap explicitly"
            )
        w = Window.orderBy(md5_u60(F.col("entity")), F.col("entity"))
        mapping = entities.select(
            "entity",
            F.concat(
                F.lit(f"<{token_prefix}_"),
                F.dense_rank().over(w).cast("string"),
                F.lit(">"),
            ).alias("ph"),
        )
    else:
        mapping = entities.select(
            "entity",
            F.concat(
                F.lit(f"<{token_prefix}_"),
                F.substring(F.md5(F.col("entity")), 1, 8),
                F.lit(">"),
            ).alias("ph"),
        )
    # longest-first fold order: struct sorts by leading field, so a
    # negative length prefix gives substring-safe replacement order
    per_doc_map = (
        distinct_pairs.join(F.broadcast(mapping), "entity")
        .groupBy("_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.length("entity")).alias("nl"),
                        F.col("entity").alias("entity"),
                        F.col("ph").alias("ph"),
                    )
                )
            ).alias("ents"),
            F.count("*").alias("n_entities"),
        )
    )
    joined = docs.join(
        per_doc_map, docs[id_col] == per_doc_map["_id"], "left"
    ).join(
        per_doc_mentions.withColumnRenamed("_id", "_id2"),
        docs[id_col] == F.col("_id2"),
        "left",
    )
    folded = F.aggregate(
        F.col("ents"),
        text,
        lambda acc, e: F.replace(acc, e["entity"], e["ph"]),
    )
    return joined.select(
        F.col(id_col),
        F.coalesce("n_mentions", F.lit(0)).alias("n_mentions"),
        F.coalesce("n_entities", F.lit(0)).alias("n_entities"),
        F.when(F.col("ents").isNotNull(), folded)
        .otherwise(text)
        .alias("text_pseudo"),
    )
