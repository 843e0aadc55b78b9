"""Label-quality QA: inter-annotator agreement (Cohen / Fleiss kappa).

Supervised filters, preference data, and eval sets all start from human
(or judge-model) labels; the first data-QA question is whether the
annotators agree beyond chance. The standard statistics:

  * Cohen's kappa per rater PAIR (Cohen 1960), on the items the two
    raters co-rated:  kappa = (p_o - p_e) / (1 - p_e)  with chance
    agreement p_e from the pair's own label marginals.
  * Fleiss' kappa (Fleiss 1971) for the whole pool, on items rated by
    exactly R raters.

Both reduce to EXACT integer arithmetic — no floating intermediates
until the final published ratio:

  Cohen:   kappa = (n*agree - sum_k a_k*b_k) / (n*n - sum_k a_k*b_k)
  Fleiss:  p_o = (S2 - N*R) / (N*R*(R-1)),  S2 = sum_i sum_k n_ik^2
           p_e = sum_k c_k^2 / (N*R)^2,     c_k = sum_i n_ik
           kappa = (po_num*pe_den - pe_num*po_den)
                   / (po_den*(pe_den - pe_num))

so the DuckDB oracle replays bigint-for-bigint and the value-hash
check is exact (the PMI-collocations no-log contract). The exact
numerator/denominator are published alongside the rounded double.

Distributed shape: one groupBy(item) collapse of the label log, then
item-local pair expansion (bounded by raters-per-item squared, a small
constant) and partial-agg rollups — the label log is the only big
input and it shuffles once on item.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.functions.text import roundn

KAPPA_PLACES = 9


def cohen_kappa_pairs(
    labels: DataFrame,
    id_col: str = "item_id",
    rater_col: str = "rater",
    label_col: str = "label",
) -> DataFrame:
    """Cohen's kappa for every rater pair that co-rated >= 1 item.

    Output: (rater_a, rater_b, n_items, agree, kappa_num, kappa_den,
    po, pe, kappa) ordered by (rater_a, rater_b); rater_a < rater_b.
    kappa is NULL when kappa_den == 0 (degenerate: every co-rated item
    got the single same label from both raters — p_e == 1).
    Duplicate (item, rater) rows are an input error; first-wins via
    min(label) keeps the op total and deterministic.
    """
    i, r, l = F.col(id_col), F.col(rater_col), F.col(label_col)
    one = labels.groupBy(i.alias("item"), r.alias("rater")).agg(
        F.min(l).alias("label")
    )
    a = one.select(
        "item", F.col("rater").alias("rater_a"), F.col("label").alias("la")
    )
    b = one.select(
        "item", F.col("rater").alias("rater_b"), F.col("label").alias("lb")
    )
    # item-local pair expansion: co-group on item, raters-per-item is a
    # small constant so this is a narrow fan-out, not an n^2 join
    paired = a.join(b, "item").where(F.col("rater_a") < F.col("rater_b"))

    base = paired.groupBy("rater_a", "rater_b").agg(
        F.count("*").alias("n_items"),
        F.sum((F.col("la") == F.col("lb")).cast("long")).alias("agree"),
    )
    ak = paired.groupBy("rater_a", "rater_b", F.col("la").alias("lab")).agg(
        F.count("*").alias("a_k")
    )
    bk = paired.groupBy("rater_a", "rater_b", F.col("lb").alias("lab")).agg(
        F.count("*").alias("b_k")
    )
    # only labels used by BOTH sides contribute to sum a_k*b_k (absent
    # side -> marginal 0) — inner join is the correct sparse product
    sum_ab = (
        ak.join(bk, ["rater_a", "rater_b", "lab"])
        .groupBy("rater_a", "rater_b")
        .agg(F.sum(F.col("a_k") * F.col("b_k")).alias("sum_ab"))
    )
    n = F.col("n_items")
    sab = F.coalesce(F.col("sum_ab"), F.lit(0))
    num = n * F.col("agree") - sab
    den = n * n - sab
    return (
        base.join(sum_ab, ["rater_a", "rater_b"], "left")
        .select(
            "rater_a",
            "rater_b",
            "n_items",
            "agree",
            num.alias("kappa_num"),
            den.alias("kappa_den"),
            roundn(F.col("agree") / n, KAPPA_PLACES).alias("po"),
            roundn(sab / (n * n), KAPPA_PLACES).alias("pe"),
            F.when(den != 0, roundn(num / den, KAPPA_PLACES)).alias("kappa"),
        )
        .orderBy("rater_a", "rater_b")
    )


def fleiss_kappa(
    labels: DataFrame,
    n_raters: int,
    id_col: str = "item_id",
    rater_col: str = "rater",
    label_col: str = "label",
) -> DataFrame:
    """Fleiss' kappa over items rated by EXACTLY `n_raters` raters
    (others are dropped — Fleiss requires a constant panel size).

    Output: one row (n_items, n_raters, kappa_num, kappa_den, po, pe,
    kappa); kappa NULL when the denominator is 0 (p_e == 1) or no item
    qualifies. Exact bigint numerator/denominator published.
    """
    i, r, l = F.col(id_col), F.col(rater_col), F.col(label_col)
    one = labels.groupBy(i.alias("item"), r.alias("rater")).agg(
        F.min(l).alias("label")
    )
    counts = one.groupBy("item", "label").agg(F.count("*").alias("n_ik"))
    full = (
        counts.groupBy("item")
        .agg(F.sum("n_ik").alias("r_total"))
        .where(F.col("r_total") == int(n_raters))
        .select("item")
    )
    counts = counts.join(full, "item")
    per_label = counts.groupBy("label").agg(F.sum("n_ik").alias("c_k"))
    stats = counts.agg(
        F.count_distinct("item").alias("n_items"),
        F.coalesce(F.sum(F.col("n_ik") * F.col("n_ik")), F.lit(0)).alias("s2"),
    ).crossJoin(
        per_label.agg(
            F.coalesce(F.sum(F.col("c_k") * F.col("c_k")), F.lit(0)).alias(
                "pe_num"
            )
        )
    )
    R = F.lit(int(n_raters))
    nr = F.col("n_items") * R
    po_num = F.col("s2") - nr
    po_den = nr * (R - 1)
    pe_den = nr * nr
    k_num = po_num * pe_den - F.col("pe_num") * po_den
    k_den = po_den * (pe_den - F.col("pe_num"))
    return stats.select(
        "n_items",
        R.alias("n_raters"),
        F.when(F.col("n_items") > 0, k_num).alias("kappa_num"),
        F.when(F.col("n_items") > 0, k_den).alias("kappa_den"),
        F.when(F.col("n_items") > 0, roundn(po_num / po_den, KAPPA_PLACES)).alias(
            "po"
        ),
        F.when(F.col("n_items") > 0, roundn(F.col("pe_num") / pe_den, KAPPA_PLACES)).alias(
            "pe"
        ),
        F.when(
            (F.col("n_items") > 0) & (k_den != 0),
            roundn(k_num / k_den, KAPPA_PLACES),
        ).alias("kappa"),
    )
