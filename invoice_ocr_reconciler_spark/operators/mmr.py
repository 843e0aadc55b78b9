"""Maximal Marginal Relevance (MMR) result diversification
(Carbonell & Goldstein, SIGIR 1998).

A retrieval stack that only ranks by relevance returns near-duplicate
mirrors and template families in a block (exactly what the dedup band
shows web corpora are full of); MMR re-ranks a candidate list by
greedily picking, at every step, the candidate with the best

    score = lambda * rel(q, c)  -  (1 - lambda) * max_{s in S} sim(c, s)

trade-off against the already-selected set S. It is THE standard
diversifier for search results and for picking diverse few-shot /
training exemplars out of an embedding neighborhood.

Exactness contract (the kmeans GRID discipline — no float pools):
  - rel and sim are integer-quantized dot products,
    dot_q(a, b) = sum_i floor(a_i * b_i * GRID + 0.5), order-free
    BIGINT sums (F.zip_with + F.aggregate; DuckDB list_sum replays);
  - lambda rides as integer thousandths (lam_m), so
    score_q = lam_m * rel_q - (1000 - lam_m) * max_sim_q is BIGINT;
  - every argmax breaks ties on the LOWEST candidate id via a
    min(struct(-score, id)) pick — partition-order free.

Greedy is inherently sequential in k, so the operator unrolls k
ROUNDS of bounded joins (the bt_strengths/hits shape): each round
joins the remaining candidates of a query against that query's <= k
selected rows (never candidates x candidates), takes the per-query
max-score row, and unions it into the selection. Per-query work is
O(k * C) for a C-candidate list; rounds shuffle frames bounded by
queries * C. The corpus itself is only touched by the candidate
generation upstream. Zero Python; the candidate frame and each round's
pick localCheckpoint (the bpe.py lineage guard) so the plan stays
round-sized instead of doubling per round.

Reference scope: training-data extension (SURVEY.md §2.12); MMR is
public knowledge (Carbonell & Goldstein 1998, "The use of MMR,
diversity-based reranking for reordering documents and producing
summaries").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GRID = 1 << 20  # the kmeans.py quantization grid


def dot_q(a: Column, b: Column) -> Column:
    """Integer-quantized dot product: per-term quantization BEFORE the
    order-free BIGINT sum (see module docstring)."""
    terms = F.zip_with(
        a,
        b,
        # explicit double promotion: float*float would multiply in FLOAT
        # precision on the Spark side while the oracle multiplies doubles
        lambda x, y: F.floor(
            x.cast("double") * y.cast("double") * GRID + F.lit(0.5)
        ).cast("long"),
    )
    return F.aggregate(terms, F.lit(0).cast("long"), lambda acc, t: acc + t)


def mmr_diversify(
    candidates: DataFrame,
    k: int = 5,
    lam_m: int = 500,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rel_col: str = "rel_q",
    vec_col: str = "embedding",
) -> DataFrame:
    """candidates(query, doc, rel_q BIGINT, embedding) -> the k-row MMR
    selection per query: (query, doc, round, rel_q, max_sim_q,
    score_q), round 1..k in pick order.

    Round 1 has no selected set: max_sim_q = 0 and the pick is the
    pure-relevance argmax (the MMR base case). lam_m is lambda in
    integer thousandths (500 = the canonical 0.5). Queries with fewer
    than k candidates return them all; duplicate (query, doc) rows
    must be pre-deduplicated upstream (selection joins on doc id).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not 0 <= lam_m <= 1000:
        raise ValueError(f"lam_m must be in [0, 1000], got {lam_m}")
    # localCheckpoint (the bpe.py/bt_strengths lineage guard): the
    # candidate frame feeds every round twice and each round references
    # all prior picks, so without truncation the physical plan doubles
    # per round (374 BNLJ nodes at k=4 when audited). Cluster runs that
    # need executor-loss tolerance should checkpoint() upstream instead.
    cand = candidates.select(
        F.col(query_col).alias("q"),
        F.col(id_col).alias("d"),
        F.col(rel_col).cast("long").alias("rel_q"),
        F.col(vec_col).alias("v"),
    ).localCheckpoint(eager=True)

    def pick(scored: DataFrame, rnd: int) -> DataFrame:
        """Per-query argmax with the lowest-id tie-break."""
        top = scored.groupBy("q").agg(
            F.min(F.struct((-F.col("score_q")).alias("neg"), F.col("d"))).alias(
                "_t"
            )
        )
        return (
            scored.join(
                top.select(
                    "q",
                    F.col("_t.d").alias("d"),
                    (-F.col("_t.neg")).alias("score_q"),
                ),
                ["q", "d", "score_q"],
            )
            .select(
                "q",
                "d",
                F.lit(rnd).cast("int").alias("round"),
                "rel_q",
                "max_sim_q",
                "score_q",
            )
        )

    lam = F.lit(lam_m).cast("long")
    r1 = pick(
        cand.select(
            "q",
            "d",
            "rel_q",
            F.lit(0).cast("long").alias("max_sim_q"),
            (lam * F.col("rel_q")).alias("score_q"),
        ),
        1,
    ).localCheckpoint(eager=True)
    selected = r1
    for rnd in range(2, k + 1):
        sel_vecs = selected.select("q", F.col("d").alias("sd")).join(
            cand.select("q", F.col("d").alias("sd"), F.col("v").alias("sv")),
            ["q", "sd"],
        )
        remaining = cand.join(
            selected.select("q", "d"), ["q", "d"], "left_anti"
        )
        scored = (
            remaining.join(sel_vecs, "q")
            .select(
                "q", "d", "rel_q", dot_q(F.col("v"), F.col("sv")).alias("s")
            )
            .groupBy("q", "d", "rel_q")
            .agg(F.max("s").cast("long").alias("max_sim_q"))
            .select(
                "q",
                "d",
                "rel_q",
                "max_sim_q",
                (
                    lam * F.col("rel_q")
                    - (F.lit(1000).cast("long") - lam) * F.col("max_sim_q")
                ).alias("score_q"),
            )
        )
        nxt = pick(scored, rnd).localCheckpoint(eager=True)
        selected = selected.unionByName(nxt)
    return selected.select(
        F.col("q").alias(query_col),
        F.col("d").alias(id_col),
        "round",
        "rel_q",
        "max_sim_q",
        "score_q",
    ).orderBy(query_col, "round")
