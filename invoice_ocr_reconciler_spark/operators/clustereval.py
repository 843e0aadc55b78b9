"""Clustering evaluation: pairwise P/R/F1, Adjusted Rand Index, B-cubed.

The dedup and community bands all emit cluster assignments
(dedup_components, dedup_canonical, mirror_clusters, label_propagation,
kmeans_assign) — this is their quality gate against a gold clustering
(a labeled slice, a previous trusted run, or the exact-method output at
small scale — e.g. grade minhash components against ngram_jaccard_exact
components). Standard metric triple:

  * Pairwise: TP = same-cluster-in-both pairs; precision = TP/P,
    recall = TP/G, f1 = 2TP/(P+G) (the extraction_f1 exact harmonic
    identity). P/G/TP are sums of C(x,2) = x(x-1)/2 over the
    contingency table — exact BIGINTs.
  * Adjusted Rand Index (Hubert & Arabie 1985), chance-corrected:
        ARI = (C(n,2)*TP - P*G) / (C(n,2)*(P+G)/2 - P*G)
    published as the EXACT integer fraction (ari_num, ari_den) =
    (2*(C(n,2)*TP - P*G), C(n,2)*(P+G) - 2*P*G) plus the one-division
    double — the kappa bigint contract. The products bound the input:
    C(n,2)*P < 2^63 holds for n up to ~50k items, the labeled-eval-
    slice scale this op is for (the bootstrap_ci bounded-input
    precedent, documented, NOT a silent overflow).
  * B-cubed (Bagga & Baldwin 1998): per-item precision n_cg/|C(i)| and
    recall n_cg/|G(i)| — computed at the CONTINGENCY CELL level
    (sum_ij n_ij * (n_ij/a_i), no per-item join), each cell's single
    exact division snapped to integer nanos and summed as BIGINTs (the
    ir_metrics_macro contract), one division per mean.

Distributed shape: ONE groupBy (pred, gold) collapses the assignment
table to contingency cells with map-side partial aggs; everything
after runs over cells (bounded by distinct cluster pairs) — two more
partial-agg groupBys for the marginals and 1-row rollups. Items with a
NULL assignment on either side are excluded and counted (n_dropped) —
absence of a label is not a singleton cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NANOS = 1e9


def _c2(x):  # C(x, 2) as exact BIGINT
    return (x * (x - F.lit(1))) / F.lit(2)


def cluster_eval(
    assignments: DataFrame,
    id_col: str = "item_id",
    pred_col: str = "pred_cluster",
    gold_col: str = "gold_cluster",
) -> DataFrame:
    """One row: (n_items, n_dropped, tp_pairs, pred_pairs, gold_pairs,
    pair_precision, pair_recall, pair_f1, ari_num, ari_den, ari,
    bcubed_precision, bcubed_recall, bcubed_f1).

    Duplicate item ids are an input error; first-wins via min() on both
    labels keeps the op total and deterministic. NULL metrics where the
    denominator has no evidence (no pairs on a side; ari_den == 0 when
    both clusterings are all-singletons or one cluster — ARI undefined).
    """
    p, g = F.col(pred_col).cast("string"), F.col(gold_col).cast("string")
    base = assignments.groupBy(F.col(id_col).alias("item")).agg(
        F.min(p).alias("p"), F.min(g).alias("g")
    )
    dropped = base.where(F.col("p").isNull() | F.col("g").isNull())
    kept = base.where(F.col("p").isNotNull() & F.col("g").isNotNull())

    cells = kept.groupBy("p", "g").agg(F.count("*").cast("long").alias("nij"))
    a = cells.groupBy("p").agg(F.sum("nij").cast("long").alias("ai"))
    b = cells.groupBy("g").agg(F.sum("nij").cast("long").alias("bj"))

    nanos = lambda x: F.floor(x * F.lit(_NANOS) + F.lit(0.5)).cast(  # noqa: E731
        "long"
    )
    cell_stats = (
        cells.join(a, "p")
        .join(b, "g")
        .agg(
            F.sum(_c2(F.col("nij"))).cast("long").alias("tp_pairs"),
            F.sum(F.col("nij")).cast("long").alias("n_items"),
            # B-cubed pools: item-weighted per-cell exact divisions
            F.sum(
                F.col("nij") * nanos(F.col("nij").cast("double") / F.col("ai"))
            )
            .cast("long")
            .alias("bcp_nanos"),
            F.sum(
                F.col("nij") * nanos(F.col("nij").cast("double") / F.col("bj"))
            )
            .cast("long")
            .alias("bcr_nanos"),
        )
    )
    pp = a.agg(F.sum(_c2(F.col("ai"))).cast("long").alias("pred_pairs"))
    gp = b.agg(F.sum(_c2(F.col("bj"))).cast("long").alias("gold_pairs"))
    nd = dropped.agg(F.count("*").cast("long").alias("n_dropped"))

    row = cell_stats.crossJoin(pp).crossJoin(gp).crossJoin(nd)
    n = F.coalesce("n_items", F.lit(0))
    tp = F.coalesce("tp_pairs", F.lit(0))
    P = F.coalesce("pred_pairs", F.lit(0))
    G = F.coalesce("gold_pairs", F.lit(0))
    cn2 = (n * (n - 1) / 2).cast("long")
    ari_num = F.lit(2) * (cn2 * tp - P * G)
    ari_den = cn2 * (P + G) - F.lit(2) * P * G
    bcp = F.when(n > 0, F.col("bcp_nanos").cast("double") / n / F.lit(_NANOS))
    bcr = F.when(n > 0, F.col("bcr_nanos").cast("double") / n / F.lit(_NANOS))
    return row.select(
        n.cast("long").alias("n_items"),
        F.coalesce("n_dropped", F.lit(0)).cast("long").alias("n_dropped"),
        tp.cast("long").alias("tp_pairs"),
        P.cast("long").alias("pred_pairs"),
        G.cast("long").alias("gold_pairs"),
        F.when(P > 0, tp.cast("double") / P).alias("pair_precision"),
        F.when(G > 0, tp.cast("double") / G).alias("pair_recall"),
        F.when(
            (P + G) > 0, (F.lit(2.0) * tp) / (P + G)
        ).alias("pair_f1"),
        ari_num.cast("long").alias("ari_num"),
        ari_den.cast("long").alias("ari_den"),
        F.when(ari_den != 0, ari_num.cast("double") / ari_den).alias("ari"),
        bcp.alias("bcubed_precision"),
        bcr.alias("bcubed_recall"),
        F.when(
            (n > 0) & ((bcp + bcr) > 0),
            F.lit(2.0) * bcp * bcr / (bcp + bcr),
        ).alias("bcubed_f1"),
    )
