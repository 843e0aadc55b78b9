"""HyperBall: neighborhood-function estimation over the web graph.

HyperANF / HyperBall (Boldi, Rosa & Vigna, WWW 2011; Boldi & Vigna,
2013) — THE web-scale algorithm for ball sizes, effective diameter and
centralities on graphs where exact per-node BFS is impossible: each node
carries a HyperLogLog sketch of its out-ball; one synchronous round
max-merges every node's sketch with its successors' sketches, so after t
rounds the sketch estimates |{w : dist(v,w) <= t}|. Work per round is
one edge-sized join + a partial-agg max — the same relational shape as
`pagerank`, with registers instead of mass. (Exact distances from a
small seed set are `bfs_distance`; this is the all-nodes estimate.)

Engine-portable determinism (no RNG, no platform hash):
  - the HLL hash is the repo's md5 convention: idx = u60 % m,
    rank = leading-zeros-within-60-bits + 1 = 61 - bitlength(u60)
    (u60 = first 15 md5 hex digits — fits BIGINT in both engines; the
    0-probability u60 == 0 caps at rank 61);
  - sketches are SPARSE (node, reg_idx, reg_val) rows — absent register
    = 0, exactly the HLL zero register. Initial state is ONE row per
    node; rows per node are bounded by m. Max-merge is a groupBy max,
    which combines map-side — a hub's million in-neighbors collapse
    inside the scan, never in one reducer row;
  - the raw estimate alpha_m * m^2 / sum(2^-reg) is made cross-engine
    exact by summing the registers as the INTEGER s_scaled =
    (m - n_present) * 2^30 + sum(2^(30 - min(reg, 30))) (powers of two
    are exact; the 30-cap only matters past 2^30-node balls, far above
    the raw estimator's useful range) and dividing once at the end.

Raw HLL estimator only (no small/large-range corrections): this is the
sketch CONTRACT — unit tests pin determinism, monotone growth, and
saturation, not absolute accuracy (HLL raw error is ~1.04/sqrt(m)).
m = 16 keeps the oracle compact; production uses m = 2^10..2^14.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from invoice_ocr_reconciler_spark.functions.text import md5_u60 as _u60

M_REGS = 16
ALPHA_16 = 0.673  # Flajolet et al. 2007 alpha_m for m=16


def hyperball(
    edges: DataFrame,
    n_iter: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    m: int = M_REGS,
    alpha: float | None = None,
    truncate_lineage: bool = True,
) -> DataFrame:
    """(node, n_regs, s_scaled, ball_est) after ``n_iter`` merge rounds:
    ball_est estimates |{w : dist(node, w) <= n_iter}| along out-edges
    (self included — every ball contains its center). Empty edges ->
    empty result. ``alpha=None`` derives the HLL bias constant from m
    (Flajolet et al. 2007: 0.673/0.697/0.709 for m=16/32/64, else
    0.7213/(1+1.079/m)) so overriding m alone never silently pairs a
    big register file with the m=16 constant."""
    if alpha is None:
        alpha = {16: ALPHA_16, 32: 0.697, 64: 0.709}.get(
            int(m), 0.7213 / (1 + 1.079 / int(m))
        )
    sketch = None
    for sketch, _it in _rounds(
        edges, n_iter, src_col, dst_col, m, truncate_lineage
    ):
        pass
    term = F.expr("shiftleft(1L, 30 - least(reg_val, 30))")
    per_node = sketch.groupBy("node").agg(
        F.count(F.lit(1)).cast("int").alias("n_regs"),
        F.sum(term).cast("bigint").alias("s_present"),
    )
    s_scaled = (
        (F.lit(m) - F.col("n_regs")).cast("bigint") * F.lit(1073741824)
        + F.col("s_present")
    )
    return per_node.select(
        "node",
        "n_regs",
        s_scaled.alias("s_scaled"),
        (
            F.lit(float(alpha))
            * F.lit(float(m * m))
            * F.lit(1073741824.0)
            / s_scaled
        ).alias("ball_est"),
    )


def _rounds(edges, n_iter, src_col, dst_col, m, truncate_lineage):
    """Yield (sketch, t) for t = 0..n_iter — the shared merge engine.

    Each round reads the previous sketch TWICE (join side + union side),
    so without materialization the plan tree doubles per round
    (2^n_iter leaf scans). A LAZY persist breaks the double-reference
    while keeping the whole run ONE job — measured on a 4M-node graph
    at 2->8 cores: persist 117s->31s (0.937 scaling efficiency) vs
    per-round eager localCheckpoint 163s->77s (0.53; the eager RDD
    materialization serializes every round into a scheduling barrier).
    localCheckpoint is kept only as a periodic lineage cut for DEEP
    runs; persisted prior rounds are released at each cut.
    """
    src, dst = F.col(src_col), F.col(dst_col)
    nodes = (
        edges.select(src.alias("node"))
        .union(edges.select(dst.alias("node")))
        .distinct()
    )
    nstr = F.col("node").cast("string")
    r = _u60(F.concat(F.lit("hbrank:"), nstr))
    sketch = nodes.select(
        "node",
        (_u60(F.concat(F.lit("hbidx:"), nstr)) % m).cast("int").alias("reg_idx"),
        F.when(r == 0, F.lit(61))
        .otherwise(F.lit(61) - F.length(F.bin(r)))
        .cast("int")
        .alias("reg_val"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    checkpoint_every = 8
    persisted = [sketch]
    nb_edges = edges.select(src.alias("node"), dst.alias("nb"))
    yield sketch, 0
    for it in range(1, int(n_iter) + 1):
        contrib = nb_edges.join(
            sketch.select(
                F.col("node").alias("nb"), "reg_idx", "reg_val"
            ),
            "nb",
        ).select("node", "reg_idx", "reg_val")
        sketch = (
            contrib.unionByName(sketch)
            .groupBy("node", "reg_idx")
            .agg(F.max("reg_val").alias("reg_val"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        persisted.append(sketch)
        if truncate_lineage and it % checkpoint_every == 0:
            sketch = sketch.localCheckpoint(eager=True)
            for df in persisted:
                df.unpersist()
            persisted = []
        yield sketch, it


def hyperball_curve(
    edges: DataFrame,
    n_iter: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    m: int = M_REGS,
    truncate_lineage: bool = True,
) -> DataFrame:
    """HyperANF's headline output — the neighborhood function N(t) as a
    (n_iter+1)-row curve of EXACT INTEGER register aggregates:

      (t, n_nodes, total_regs, total_s_scaled)

    total_s_scaled = sum over nodes of the per-node integer register sum
    (= n_nodes*m*2^30 - total_regs*2^30 + sum over rows of the shifted
    register term — computed row-level, no per-node groupBy needed). It
    DECREASES monotonically as balls grow, so the curve's shape is the
    neighborhood function's: effective-diameter estimation reads the t
    where it flattens. Integer outputs keep the whole curve value-hash
    stable cross-engine (a float N(t) would sum estimator doubles in
    engine-dependent order).

    One driver-collected row per round — the convergence-check pattern:
    each round's persisted sketch is materialized by its own 1-row agg
    and then REUSED by the next round's join, so the per-round actions
    add no recompute over a single-action run.
    """
    rows = []
    term = F.expr("shiftleft(1L, 30 - least(reg_val, 30))")
    for sketch, t in _rounds(
        edges, n_iter, src_col, dst_col, m, truncate_lineage
    ):
        agg = sketch.agg(
            F.countDistinct("node").cast("bigint").alias("n"),
            F.count(F.lit(1)).cast("bigint").alias("r"),
            F.coalesce(F.sum(term), F.lit(0)).cast("bigint").alias("p"),
        ).collect()[0]
        n, nr, p = int(agg["n"]), int(agg["r"]), int(agg["p"])
        rows.append(
            (t, n, nr, n * m * 1073741824 - nr * 1073741824 + p)
        )
    return edges.sparkSession.createDataFrame(
        rows,
        "t int, n_nodes bigint, total_regs bigint, total_s_scaled bigint",
    )


def _per_node_est(sketch: DataFrame, m: int, alpha: float) -> DataFrame:
    """(node, est) raw-HLL ball estimate from a sparse register frame —
    the exact-integer s_scaled divide shared by hyperball()."""
    term = F.expr("shiftleft(1L, 30 - least(reg_val, 30))")
    per = sketch.groupBy("node").agg(
        F.count(F.lit(1)).cast("int").alias("n_regs"),
        F.sum(term).cast("bigint").alias("s_present"),
    )
    s_scaled = (
        (F.lit(m) - F.col("n_regs")).cast("bigint") * F.lit(1073741824)
        + F.col("s_present")
    )
    return per.select(
        "node",
        (
            F.lit(float(alpha)) * F.lit(float(m * m)) * F.lit(1073741824.0)
            / s_scaled
        ).alias("est"),
    )


def harmonic_centrality(
    edges: DataFrame,
    n_iter: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    m: int = M_REGS,
    alpha: float | None = None,
    truncate_lineage: bool = True,
) -> DataFrame:
    """Truncated harmonic centrality from HyperBall sketches — the
    centrality HyperBall was BUILT for (Boldi & Vigna 2013; "Axioms for
    centrality" 2014):

        H(v) ~= sum_{t=1..n_iter} (|B(v,t)| - |B(v,t-1)|) / t

    — nodes reachable at distance t contribute 1/t. Computed on
    OUT-balls; pass pre-reversed edges for the classic "how close is
    everyone to v" in-variant. Ball sizes are the raw-HLL estimates, so
    this is the estimator's truncated-sum form, not exact BFS.

    Determinism contract: per-round estimates divide exact integers; the
    t-terms accumulate through a FIXED chain of per-round node joins
    (never a union+sum, whose float addition order is engine-dependent);
    deltas clamp at 0 (register monotonicity makes negatives impossible,
    the clamp documents it). Output (node, ball_est, harmonic) on the
    6-grid, plus the final-round ball estimate for context.
    """
    from invoice_ocr_reconciler_spark.functions.text import roundn

    if alpha is None:
        alpha = {16: ALPHA_16, 32: 0.697, 64: 0.709}.get(
            int(m), 0.7213 / (1 + 1.079 / int(m))
        )
    acc = None
    prev = None
    last = None
    for sketch, t in _rounds(
        edges, n_iter, src_col, dst_col, m, truncate_lineage
    ):
        est = _per_node_est(sketch, int(m), float(alpha))
        last = est
        if t == 0:
            prev = est
            acc = est.select("node", F.lit(0.0).alias("h"))
            continue
        delta = (
            est.select("node", F.col("est").alias("e_now"))
            .join(prev.select("node", F.col("est").alias("e_prev")), "node")
            .select(
                "node",
                (
                    F.greatest(
                        F.col("e_now") - F.col("e_prev"), F.lit(0.0)
                    )
                    / F.lit(float(t))
                ).alias("term"),
            )
        )
        acc = acc.join(delta, "node").select(
            "node", (F.col("h") + F.col("term")).alias("h")
        )
        prev = est
    if acc is None or last is None:
        spark = edges.sparkSession
        return spark.createDataFrame(
            [], "node long, ball_est double, harmonic double"
        )
    return (
        acc.join(last, "node")
        .select(
            "node",
            roundn(F.col("est"), 6).alias("ball_est"),
            roundn(F.col("h"), 6).alias("harmonic"),
        )
        .orderBy("node")
    )
