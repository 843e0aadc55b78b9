"""Connected components over near-duplicate pair sets + canonical-doc cut.

Pairwise near-dup detection (MinHash / SimHash / n-gram Jaccard in
operators/dedup.py) yields an EDGE LIST; real web-scale dedup needs the
transitive closure of those edges — one cluster per group of mutually-similar
documents, keep one representative per cluster. The keep-lowest-paired-id
shortcut in operators/curation.py is the cheap approximation; this module is
the exact version.

Algorithm: alternating large-star / small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC 2014) — converges in O(log n)
rounds on any graph, vs O(diameter) for naive label propagation. Each round
is a bounded number of shuffles (one groupBy + one join per star op) over the
edge list only; node labels never leave the JVM. Lineage is truncated every
round (localCheckpoint) so the plan does not grow with iterations — the
standard guard for iterative DataFrame algorithms. At 10^12 docs the edge
list after LSH banding is orders of magnitude smaller than the corpus, so
every shuffle here is on the small derived table, never the documents.

Convergence is detected with an order-independent edge-set signature
(count + sum of per-edge xxhash64) — one cheap agg per round instead of a
full subtract().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# O(log n) expected; the signature fixpoint test stops earlier on real data.
MAX_CC_ROUNDS = 25


def _symmetric(edges: DataFrame) -> DataFrame:
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return edges.union(rev).filter(F.col("src") != F.col("dst")).distinct()


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) + {u}).

    The paper's map phase emits each edge in BOTH directions so the reduce
    sees the full neighborhood — star outputs are oriented (bigger ->
    smaller), so without the re-symmetrize every round after the first
    would see only half of each neighborhood.
    """
    sym = _symmetric(edges)
    m = sym.groupBy("src").agg(F.min("dst").alias("_mn"))
    m = m.select("src", F.least(F.col("_mn"), F.col("src")).alias("m"))
    return (
        sym.join(m, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect every smaller-or-equal neighbor of u (and u itself) to the min.

    The paper's map phase orients each edge (max -> min); large-star output
    is already oriented that way (src = v > u >= m = dst), so orienting
    reduces to a no-op filter kept for self-containedness.
    """
    le = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    m = le.groupBy("src").agg(F.min("dst").alias("m"))
    moved = le.join(m, "src").select(
        F.col("dst").alias("src"), F.col("m").alias("dst")
    )
    self_edge = m.select("src", F.col("m").alias("dst"))
    return (
        moved.union(self_edge)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _signature(edges: DataFrame) -> tuple:
    # bit_xor: order-independent and overflow-free under ANSI mode (edges
    # are distinct, so xor cancellation of repeated rows cannot occur)
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("h"),
    ).collect()[0]
    return (row["n"], row["h"])


def connected_components(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_rounds: int = MAX_CC_ROUNDS,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """-> (doc_id, component) for every node in `pairs`; component = min
    reachable id. Exact transitive closure via large-star/small-star.

    `checkpoint_dir`: durable (HDFS/object-store) checkpoints for cluster
    runs — a lost executor can otherwise force replaying every round,
    because localCheckpoint storage dies with its executor. Local/test
    runs default to localCheckpoint (no extra I/O).

    Lifecycle: pass a per-run scratch directory and delete it after the
    result is materialized — each round writes a checkpoint there (up to
    max_rounds copies of the shrinking edge list) and Spark does not
    garbage-collect them. Note setCheckpointDir is session-global.
    """
    spark = pairs.sparkSession
    # ids ride the rounds as longs (8-byte shuffle rows). A silent cast of
    # a non-numeric id type would turn every edge into NULL<->NULL, drop
    # them all in _symmetric's src != dst filter, and "succeed" with an
    # empty result — fail loudly instead.
    from pyspark.sql import types as T

    for side in (id_a, id_b):
        dt = pairs.schema[side].dataType
        if not isinstance(
            dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
        ):
            raise TypeError(
                f"connected_components needs integral ids; column "
                f"{side!r} is {dt.simpleString()} — map ids to longs "
                f"(e.g. xxhash64) before clustering"
            )
    if checkpoint_dir:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)
        _ckpt = lambda df, eager: df.checkpoint(eager=eager)
    else:
        _ckpt = lambda df, eager: df.localCheckpoint(eager=eager)
    edges = _ckpt(
        _symmetric(
            pairs.select(
                F.col(id_a).cast("long").alias("src"),
                F.col(id_b).cast("long").alias("dst"),
            )
        ),
        True,
    )
    # derived AFTER the checkpoint so the final labeling join reads the
    # materialized round-0 edges instead of replaying scan+union+distinct
    nodes = edges.select("src").distinct()
    # Star contraction never empties a >=2-node component (the star edges
    # persist), so an empty round-0 edge set means the input had no edges
    # at all — skip the whole loop. Well-thresholded near-dup graphs are
    # often empty, and each round below costs real scheduling even on
    # nothing.
    if edges.isEmpty():
        return nodes.select(
            F.col("src").alias("doc_id"), F.col("src").alias("component")
        )
    prev = None
    converged = False
    for _ in range(max_rounds):
        # non-eager: the signature agg is the action that materializes the
        # checkpoint, so each round costs ONE job, not checkpoint+agg
        edges = _ckpt(_small_star(_large_star(edges)), False)
        sig = _signature(edges)
        if sig == prev:
            converged = True
            break
        prev = sig
    if not converged:
        # the final labeling assumes a converged star graph; labeling an
        # unconverged one silently splits true clusters across components
        raise RuntimeError(
            f"connected_components did not converge within {max_rounds} "
            f"rounds — raise max_rounds (star contraction needs "
            f"O(log n) rounds)"
        )
    # post-convergence the graph is a union of stars: every non-root points
    # at its component min. Roots get their own id via the left join.
    labels = edges.groupBy("src").agg(F.min("dst").alias("_c"))
    return (
        nodes.join(labels, "src", "left")
        .select(
            F.col("src").alias("doc_id"),
            F.least(F.coalesce(F.col("_c"), F.col("src")), F.col("src")).alias(
                "component"
            ),
        )
    )


def canonical_docs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "doc_a",
    id_b: str = "doc_b",
) -> DataFrame:
    """Annotate every doc with its near-dup component and canonical flag.

    Docs in no pair are their own singleton component. The cluster min is
    the canonical survivor (keep-first web-dedup rule, applied exactly
    instead of per-pair). Join is on the component table — LSH-derived and
    tiny relative to the corpus, so Spark broadcasts it at real scale.
    """
    comp = connected_components(pairs, id_a=id_a, id_b=id_b)
    return docs.join(
        comp.withColumnRenamed("doc_id", id_col), id_col, "left"
    ).select(
        docs["*"],
        F.coalesce(F.col("component"), F.col(id_col).cast("long")).alias(
            "component"
        ),
        (
            F.coalesce(F.col("component"), F.col(id_col).cast("long"))
            == F.col(id_col).cast("long")
        ).alias("is_canonical"),
    )


def takedown_closure(
    docs: DataFrame,
    pairs: DataFrame,
    seeds: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "doc_a",
    id_b: str = "doc_b",
) -> DataFrame:
    """Propagate a removal request set through the near-dup graph ->
    (doc_id, component, is_seed, n_seeds, removed): every document
    sharing a near-dup COMPONENT with a seeded doc is flagged for
    removal, with the audit trail (which component, how many independent
    requests hit it) a compliance reviewer needs.

    This is the takedown/right-to-be-forgotten batch operator a
    web-scale corpus requires: removing only the requested url leaves
    its mirror copies, near-identical syndications, and re-crawls in the
    training set — the request has to close over the duplicate relation
    (the same closure group_split uses for leakage, reused here for
    deletion). Non-seeded singleton docs keep component = own id and
    removed = false, so the output is a full-corpus audit table; feed
    `filter(removed)` to delete_rows for the actual mutation.

    Plan: the component table is the post-LSH pair closure — tiny next
    to the corpus — so both the seed labeling join and the corpus
    annotation join broadcast at real scale. One groupBy(component) at
    seed cardinality; the corpus itself is touched by exactly ONE left
    join, no shuffle of payload columns beyond the id.
    """
    comp = connected_components(pairs, id_a=id_a, id_b=id_b)
    ids = docs.select(F.col(id_col).cast("long").alias(id_col))
    labeled = ids.join(
        comp.withColumnRenamed("doc_id", id_col), id_col, "left"
    ).select(
        id_col,
        F.coalesce(F.col("component"), F.col(id_col)).alias("component"),
    )
    seed_ids = seeds.select(
        F.col(id_col).cast("long").alias(id_col)
    ).distinct()
    seeded = labeled.join(
        seed_ids.withColumn("_seed", F.lit(1)), id_col, "left"
    )
    per_comp = (
        seeded.filter(F.col("_seed").isNotNull())
        .groupBy("component")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_seeds"))
    )
    return seeded.join(F.broadcast(per_comp), "component", "left").select(
        id_col,
        "component",
        F.col("_seed").isNotNull().alias("is_seed"),
        F.coalesce(F.col("n_seeds"), F.lit(0)).cast("bigint").alias("n_seeds"),
        (F.coalesce(F.col("n_seeds"), F.lit(0)) > 0).alias("removed"),
    )


def canonical_best(
    docs: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    id_a: str = "doc_a",
    id_b: str = "doc_b",
) -> DataFrame:
    """Keep-BEST survivor selection within near-dup components: instead
    of canonical_docs' keep-first (min id) rule, the member with the
    highest `score_col` survives (ties -> lowest id) — the Dolma /
    RefinedWeb-style choice where the longest or highest-quality copy of
    a syndicated article is retained, not the one crawled first.

    One window over (component) ordered (score desc, id asc) after the
    same component join as canonical_docs; singletons survive trivially.
    Adds (component, keep_rank, is_canonical).
    """
    comp = connected_components(pairs, id_a=id_a, id_b=id_b)
    labeled = docs.join(
        comp.withColumnRenamed("doc_id", id_col), id_col, "left"
    ).select(
        docs["*"],
        F.coalesce(F.col("component"), F.col(id_col).cast("long")).alias(
            "component"
        ),
    )
    w = Window.partitionBy("component").orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    return labeled.withColumn(
        "keep_rank", F.row_number().over(w).cast("int")
    ).withColumn("is_canonical", F.col("keep_rank") == 1)
