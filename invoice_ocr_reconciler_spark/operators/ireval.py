"""IR evaluation: P@k / R@k / MRR / MAP@k / nDCG@k against a qrels table.

The retrieval stack (bm25_search, bm25f_search, ann_*, rrf_fusion,
phrase_search, prf_expand) needs a regression harness the same way the
extraction stage has extraction_f1: score any run table against graded
relevance judgments with the trec_eval metric set, per query plus a
macro rollup. This is the gate a retrieval change must pass before it
ships as the data-curation retriever (hard_negatives, margin_mine and
decontaminate_semantic all consume ranked candidates — their quality IS
retrieval quality).

Every metric is exact-integer arithmetic until one final division, so
the DuckDB oracle replays bit-for-bit with no rounding-grid slack on
the per-query rows (the extraction_f1 / kappa contract):

  * P@k       = hits / k                      (one int/int division)
  * R@k       = hits / n_rel                  (one int/int division)
  * RR        = 1 / first_rel_rank            (one int/int division)
  * AP@k      = (sum_r L*cumhits_r/r) / (L * min(n_rel, k))
                with L = lcm(1..k), so every addend L*cumhits/r is an
                EXACT integer (r divides L) — no float accumulation
                order to disagree on; one final division.
  * nDCG@k    = dcg_scaled / idcg_scaled with the rank discounts
                1/log2(rank+1) precomputed DRIVER-side as 1e12-scaled
                integer literals (floor(1e12/log2(r+1)+0.5)); gains
                2^rel - 1 are integers, so dcg/idcg are exact integer
                sums and ndcg is one division. No engine ever calls
                log() — the collocations no-libm contract.

Distributed shape at 10^12-doc scale: the run table shuffles ONCE on
query_id for the rank window, is cut to rank <= k immediately (k rows
per query survive), and everything downstream is k-bounded per query:
the qrels join is on (query_id, doc_id) with map-side partial aggs, the
ideal-DCG pass shuffles qrels once on query_id. No corpus-wide window,
no cross join, no Python. NULL metrics where the denominator has no
evidence (no judged-relevant docs -> recall/AP NULL; no relevant hit ->
RR NULL; empty ideal -> nDCG NULL) — absence of judgments is not a
perfect score.

Reference analog: the reconciliation-match quality counters the
reference publishes per session (/root/reference/backend/server.js:542-545
matched/mismatched/missing rollup) — re-expressed as the standard
ranked-retrieval metric set over any (runs, qrels) pair.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# lcm(1..10): every AP addend L*cumhits/rank is integral for k <= 10.
_AP_LCM = 2520
MAX_K = 10


def _discounts(k: int) -> list[int]:
    """1e12-scaled integer rank discounts floor(1e12/log2(r+1)+0.5) for
    r = 1..k — computed once on the driver with Python's libm, shipped
    as LITERALS to both engines so neither ever evaluates log()."""
    return [int(math.floor(1e12 / math.log2(r + 1) + 0.5)) for r in range(1, k + 1)]


def ir_metrics(
    runs: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    score_col: str = "score",
    rel_col: str = "rel",
) -> DataFrame:
    """Per-query ranked-retrieval metrics at cutoff `k` (k <= 10 so the
    AP lcm and discount table stay exact).

    runs:  (query_id, doc_id, score) — duplicates collapse max-score
    qrels: (query_id, doc_id, rel)   — graded, rel >= 1 means relevant;
           duplicates collapse max-rel
    Output one row per query in runs UNION qrels: (query_id, n_ret,
    n_rel, hits, precision_k, recall_k, rr, ap_k, dcg_scaled,
    idcg_scaled, ndcg_k), ordered by query_id.
    """
    if not 1 <= k <= MAX_K:
        raise ValueError(f"k must be in 1..{MAX_K}, got {k}")
    disc = F.array(*[F.lit(d) for d in _discounts(k)])

    q, d = F.col(query_col), F.col(doc_col)
    run1 = runs.groupBy(q.alias("query_id"), d.alias("doc_id")).agg(
        F.max(score_col).alias("score")
    )
    rel1 = qrels.groupBy(q.alias("query_id"), d.alias("doc_id")).agg(
        F.max(rel_col).cast("long").alias("rel")
    )

    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    topk = (
        run1.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .join(rel1, ["query_id", "doc_id"], "left")
        .withColumn("rel", F.coalesce("rel", F.lit(0)))
    )

    # cumulative hits up to each rank feeds the exact-integer AP addend
    wc = Window.partitionBy("query_id").orderBy("rank")
    hit = (F.col("rel") > 0).cast("long")
    topk = topk.withColumn("cumhits", F.sum(hit).over(wc))
    # 2^rel is exact in double for any graded rel; long cast loses nothing
    gain = F.pow(F.lit(2.0), F.col("rel")).cast("long") - 1

    per_q = topk.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_ret"),
        F.sum(hit).cast("long").alias("hits"),
        F.min(F.when(F.col("rel") > 0, F.col("rank"))).alias("first_rel_rank"),
        F.sum(
            F.when(
                F.col("rel") > 0,
                # rank divides L, so the double division is exact and the
                # long cast loses nothing — the sum is pure BIGINT
                (F.lit(_AP_LCM) * F.col("cumhits") / F.col("rank")).cast(
                    "long"
                ),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("ap_num"),
        F.sum(gain * F.element_at(disc, F.col("rank"))).cast("long").alias(
            "dcg_scaled"
        ),
    )

    # ideal DCG: qrels ranked by rel desc (doc tiebreak), top-k, same
    # literal discounts — one shuffle of qrels on query_id
    wi = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("doc_id").asc()
    )
    ideal = (
        rel1.where(F.col("rel") > 0)
        .withColumn("irank", F.row_number().over(wi))
        .where(F.col("irank") <= k)
        .groupBy("query_id")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("rel")).cast("long") - 1)
                * F.element_at(disc, F.col("irank"))
            )
            .cast("long")
            .alias("idcg_scaled")
        )
    )
    nrel = rel1.where(F.col("rel") > 0).groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_rel")
    )

    spine = (
        run1.select("query_id")
        .unionByName(rel1.select("query_id"))
        .distinct()
    )
    out = (
        spine.join(per_q, "query_id", "left")
        .join(nrel, "query_id", "left")
        .join(ideal, "query_id", "left")
    )
    n_rel = F.coalesce("n_rel", F.lit(0))
    hits = F.coalesce("hits", F.lit(0))
    ap_den = F.lit(_AP_LCM) * F.least(n_rel, F.lit(k))
    return out.select(
        "query_id",
        F.coalesce("n_ret", F.lit(0)).cast("long").alias("n_ret"),
        n_rel.cast("long").alias("n_rel"),
        hits.cast("long").alias("hits"),
        (hits.cast("double") / k).alias("precision_k"),
        F.when(n_rel > 0, hits.cast("double") / n_rel).alias("recall_k"),
        F.when(
            F.col("first_rel_rank").isNotNull(),
            F.lit(1.0) / F.col("first_rel_rank"),
        ).alias("rr"),
        F.when(
            n_rel > 0,
            F.coalesce("ap_num", F.lit(0)).cast("double") / ap_den,
        ).alias("ap_k"),
        F.coalesce("dcg_scaled", F.lit(0)).cast("long").alias("dcg_scaled"),
        F.coalesce("idcg_scaled", F.lit(0)).cast("long").alias("idcg_scaled"),
        F.when(
            F.coalesce("idcg_scaled", F.lit(0)) > 0,
            F.coalesce("dcg_scaled", F.lit(0)).cast("double")
            / F.col("idcg_scaled"),
        ).alias("ndcg_k"),
    ).orderBy("query_id")


def ir_metrics_macro(per_query: DataFrame, k: int = 10) -> DataFrame:
    """Macro rollup of `ir_metrics` output: one row with the mean of
    each metric over the queries where it is defined (trec_eval's
    convention of averaging over judged queries).

    Cross-engine exactness: each per-query metric is snapped to integer
    NANOS (floor(x*1e9+0.5) — the values are single exact divisions, so
    the snap is deterministic), summed as BIGINTs (no float accumulation
    order), and divided once by the defined-query count.
    """
    nanos = lambda c: F.floor(  # noqa: E731
        F.col(c) * F.lit(1e9) + F.lit(0.5)
    ).cast("long")
    aggs = [F.count("*").cast("long").alias("n_queries")]
    for c, out in (
        ("precision_k", "mean_precision_k"),
        ("recall_k", "mean_recall_k"),
        ("rr", "mrr"),
        ("ap_k", "map_k"),
        ("ndcg_k", "mean_ndcg_k"),
    ):
        aggs.append(F.sum(nanos(c)).alias(f"_s_{c}"))
        aggs.append(F.count(F.col(c)).cast("long").alias(f"_n_{c}"))
    g = per_query.agg(*aggs)
    cols = [F.col("n_queries"), F.lit(int(k)).alias("k")]
    for c, out in (
        ("precision_k", "mean_precision_k"),
        ("recall_k", "mean_recall_k"),
        ("rr", "mrr"),
        ("ap_k", "map_k"),
        ("ndcg_k", "mean_ndcg_k"),
    ):
        cols.append(
            F.when(
                F.col(f"_n_{c}") > 0,
                F.col(f"_s_{c}").cast("double")
                / F.col(f"_n_{c}")
                / F.lit(1e9),
            ).alias(out)
        )
    return g.select(*cols)
