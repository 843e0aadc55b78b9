"""Distributed k-means (Lloyd's algorithm) — full-corpus centroid fits.

operators/similarity.py:fit_ivf_centroids and operators/pq.py fit their
quantizers on a driver-side deterministic sample (sample_cap rows) — the
standard IVF/PQ shape, but a documented limitation when the corpus is
too diverse for a 4k-row sample. This operator is the full-corpus
alternative: every Lloyd round is ONE distributed job — a codegen
assignment pass (distances to k broadcast-literal centroids, no Python,
no join) followed by a partial-agg groupBy whose exchange carries at
most k rows of (count + dim quantized component sums) per map task. The
only driver-side data is the k x dim centroid table itself.

Determinism contract (the repo-wide requirement that every operator
produce identical output at any parallelism, and that oracles replay it
value-exactly):
  - distances are INTEGER-quantized per component BEFORE summation:
    dist_q = sum_i floor((a_i - c_i)^2 * 2^20 + 0.5) — integer addition
    is order-free, so partition order cannot flip an argmin, and DuckDB's
    list_sum (unspecified summation order) agrees exactly;
  - centroid updates accumulate floor(a_i * 2^20 + 0.5) as 64-bit
    integers (the integer-grid accumulation idiom of
    operators/chunking.py's mean pooling); the new component is
    (sum_q / n) / 2^20 — one double division, identical in both engines;
  - ties in argmin break to the LOWEST cluster index; seeding is the k
    rows with the smallest (md5(vec_id), vec_id) — content-free,
    deterministic, and a TakeOrderedAndProject (top-k, never a full
    sort) in the physical plan;
  - empty clusters keep their previous centroid.

At 10^12 rows: assignment is embarrassingly parallel (k*dim literal
doubles ride the closure); each round's shuffle is k*(dim+1) longs per
map task — independent of corpus size; n_iter rounds = n_iter linear
scans. Literal-centroid plans suit k up to a few hundred; larger k wants
the broadcast-join assignment of operators/similarity.py:ivf_assign.

Reference scope: training-data extension (SURVEY.md §2.12); k-means is
public knowledge (Lloyd 1982; the k-means|| seeding of Bahmani et al.
2012 is noted as the production seeding upgrade — md5-order seeding here
keeps the oracle replayable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GRID = 1 << 20  # quantization grid for distances and component sums


def _dist_q(vec: Column, cent: list[float]) -> Column:
    """Integer-quantized squared distance from `vec` to one literal
    centroid: per-component quantization BEFORE the (order-free) integer
    sum — see module docstring."""
    c = F.array(*[F.lit(float(x)) for x in cent])
    terms = F.zip_with(
        vec,
        c,
        lambda a, b: F.floor((a - b) * (a - b) * GRID + F.lit(0.5)).cast(
            "long"
        ),
    )
    return F.aggregate(terms, F.lit(0).cast("long"), lambda acc, x: acc + x)


def assign_clusters(
    vectors: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, dist_q): nearest centroid per vector, lowest-index
    tie-break — one codegen projection, no shuffle."""
    if not centroids:
        raise ValueError("centroids must be non-empty")
    vec = F.col(vec_col)
    dists = F.array(*[_dist_q(vec, c) for c in centroids])
    return vectors.select(
        F.col(id_col),
        (F.array_position(dists, F.array_min(dists)) - 1)
        .cast("int")
        .alias("cluster"),
        F.array_min(dists).alias("dist_q"),
    )


def seed_centroids(
    vectors: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """The k rows with the smallest (md5(id), id) — deterministic,
    content-independent, top-k not full-sort."""
    rows = (
        vectors.select(
            F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
        )
        .orderBy(F.md5(F.col("_id").cast("string")), F.col("_id"))
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"need >= {k} vectors to seed, got {len(rows)}")
    return [[float(x) for x in r["_v"]] for r in rows]


def fit_kmeans(
    vectors: DataFrame,
    k: int,
    dim: int,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[float]], list[int]]:
    """Full-corpus Lloyd fit. Returns (centroids, inertia_history) where
    inertia_history[t] is the EXACT integer sum of dist_q under the
    round-t assignment (comparable across runs and engines; n_iter+0
    entries, one per completed assignment pass).

    Rows whose vector is NULL or not exactly `dim` long are ignored by
    the fit (a malformed row must not poison a centroid)."""
    base = vectors.select(F.col(id_col), F.col(vec_col).alias("_v")).filter(
        F.size(F.col("_v")) == dim
    )
    base = base.persist()
    try:
        cents = seed_centroids(base, k, id_col, "_v")
        history: list[int] = []
        vec = F.col("_v")
        for _ in range(n_iter):
            # assignment columns computed in-place (no join back for _v);
            # codegen subexpression elimination shares the dists array
            dists = F.array(*[_dist_q(vec, c) for c in cents])
            assigned = base.select(
                vec,
                (F.array_position(dists, F.array_min(dists)) - 1)
                .cast("int")
                .alias("cluster"),
                F.array_min(dists).alias("dist_q"),
            )
            qcols = [
                F.sum(
                    F.floor(
                        F.col("_v").getItem(i).cast("double") * GRID
                        + F.lit(0.5)
                    ).cast("long")
                ).alias(f"s{i}")
                for i in range(dim)
            ]
            stats = (
                assigned.groupBy("cluster")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("dist_q").alias("inertia"),
                    *qcols,
                )
                .collect()
            )
            history.append(int(sum(r["inertia"] for r in stats)))
            new_cents = [list(c) for c in cents]  # empty cluster keeps old
            for r in stats:
                j = r["cluster"]
                n = r["n"]
                new_cents[j] = [
                    (float(r[f"s{i}"]) / n) / GRID for i in range(dim)
                ]
            cents = new_cents
        return cents, history
    finally:
        base.unpersist()


def kmeans_assign(
    vectors: DataFrame,
    k: int,
    dim: int,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fit on the full corpus, then the final assignment frame
    (id, cluster, dist_q) — the one-call form the query surface uses."""
    cents, _ = fit_kmeans(vectors, k, dim, n_iter, id_col, vec_col)
    valid = vectors.filter(F.size(F.col(vec_col)) == dim)
    return assign_clusters(valid, cents, id_col, vec_col)


def silhouette_score(
    vectors: DataFrame,
    centroids: list[list[float]],
    assignments: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Simplified (centroid-based) silhouette — the internal cluster-
    quality gate -> one row per cluster plus a TOTAL row (cluster = -1):
    (cluster, n, n_negative, sum_s_nanos, silhouette).

    The classic silhouette needs all pairwise distances (O(n^2)); the
    simplified form (Hruschka et al. 2004, sklearn's "works at scale"
    recommendation) replaces mean-to-cluster distances with distances
    to CENTROIDS:  a(i) = d(i, own centroid),  b(i) = min over other
    centroids,  s(i) = (b - a) / max(a, b)  (0 when max = 0).

    Exactness: a/b derive from the SAME integer-quantized dist_q as
    assign_clusters, and the GRID factor cancels inside the ratio —
        s = (sqrt(bq) - sqrt(aq)) / sqrt(max(aq, bq))
    two IEEE sqrts and one division (the spearman_corr contract); each
    s snaps to integer nanos BEFORE pooling (the calibration_bins
    contract), so per-cluster means are BIGINT sums + one division.

    With `assignments` (id, cluster) the score grades an ARBITRARY
    labeling against the centroid geometry — negative s (published as
    n_negative) marks points closer to a foreign centroid, the
    misassignment signal. Without it, nearest-centroid assignment is
    used (s >= 0 by construction; the k-selection elbow companion).
    Rows with NULL or out-of-range clusters are excluded.

    One codegen distance projection (k literal centroids), at most one
    node-dim assignment join, one partial-agg groupBy bounded by k.
    """
    k = len(centroids)
    if k < 2:
        raise ValueError(f"silhouette needs >= 2 centroids, got {k}")
    dim = len(centroids[0])
    base = vectors.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    ).filter(F.size(F.col("_v")) == dim)
    if assignments is None:
        vec = F.col("_v")
        dists = F.array(*[_dist_q(vec, c) for c in centroids])
        assigned = base.select(
            "_id",
            "_v",
            (F.array_position(dists, F.array_min(dists)) - 1)
            .cast("int")
            .alias("cluster"),
        )
    else:
        amap = assignments.select(
            F.col(id_col).alias("_id"),
            F.col("cluster").cast("int").alias("cluster"),
        )
        assigned = base.join(amap, "_id")
    assigned = assigned.filter(
        F.col("cluster").isNotNull()
        & (F.col("cluster") >= 0)
        & (F.col("cluster") < k)
    )
    vec = F.col("_v")
    dcols = [_dist_q(vec, c) for c in centroids]
    own_q = F.element_at(F.array(*dcols), F.col("cluster") + 1)
    # min over the OTHER clusters: the own slot is masked with a
    # sentinel above any reachable dist_q, so least() needs no NULLs
    sentinel = F.lit(1 << 62).cast("long")
    other_q = F.least(
        *[
            F.when(F.col("cluster") == j, sentinel).otherwise(dcols[j])
            for j in range(k)
        ]
    )
    per = assigned.select(
        "cluster", own_q.alias("aq"), other_q.alias("bq")
    )
    s = F.when(F.greatest(F.col("aq"), F.col("bq")) == 0, F.lit(0.0)).otherwise(
        (F.sqrt(F.col("bq").cast("double")) - F.sqrt(F.col("aq").cast("double")))
        / F.sqrt(F.greatest(F.col("aq"), F.col("bq")).cast("double"))
    )
    rows = per.select(
        "cluster",
        F.floor(s * F.lit(1e9) + F.lit(0.5)).cast("long").alias("s_nanos"),
    )
    by_cluster = rows.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("s_nanos") < 0, 1).otherwise(0))
        .cast("long")
        .alias("n_negative"),
        F.sum("s_nanos").cast("long").alias("sum_s_nanos"),
    )
    total = by_cluster.agg(
        F.lit(-1).cast("int").alias("cluster"),
        F.sum("n").cast("long").alias("n"),
        F.sum("n_negative").cast("long").alias("n_negative"),
        F.sum("sum_s_nanos").cast("long").alias("sum_s_nanos"),
    )
    out = by_cluster.select(
        F.col("cluster").cast("int").alias("cluster"),
        "n",
        "n_negative",
        "sum_s_nanos",
    ).unionByName(total)
    return out.select(
        "cluster",
        "n",
        "n_negative",
        "sum_s_nanos",
        F.when(
            F.col("n") > 0,
            F.col("sum_s_nanos").cast("double") / F.col("n") / F.lit(1e9),
        ).alias("silhouette"),
    ).orderBy("cluster")


def kmeans_silhouette(
    vectors: DataFrame,
    k: int,
    dim: int,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fit on the full corpus, then grade the fit's own nearest-centroid
    assignment — the one-call k-selection form (sweep k, compare the
    TOTAL row's silhouette)."""
    cents, _ = fit_kmeans(vectors, k, dim, n_iter, id_col, vec_col)
    return silhouette_score(
        vectors, cents, assignments=None, id_col=id_col, vec_col=vec_col
    )
