"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: JVM-side dot product via zip_with/aggregate
  (whole-stage codegen, no Python crossing) against a broadcast query set —
  the correctness baseline;
- LSH-bucketed ANN (random hyperplanes): deterministic signature via a
  pandas UDF + numpy, bucket join, exact cosine re-rank within buckets —
  the 100 TB scale path (touches only colliding buckets instead of the
  full corpus per query).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_sim(a: Column, b: Column) -> Column:
    denom = _norm(a) * _norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(_dot(a, b) / denom)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (query set broadcast).

    Output: (query_id, neighbor_id, cosine, rank); self-pairs excluded.
    Rank orders by cosine rounded to 6 places with neighbor_id tiebreak so
    results are stable across engines and summation orders.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_sim(F.col("q_vec"), F.col("c_vec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# --- LSH (random hyperplane) ANN ---

N_PLANES = 8  # 256 buckets; raise with corpus size (multi-probe is the recall knob)


def _planes(dim: int, seed: str = "ann-lsh-v1") -> np.ndarray:
    """Deterministic hyperplanes: md5-derived uniform values, no RNG object."""
    raw = np.array(
        [
            [
                int.from_bytes(hashlib.md5(f"{seed}:{p}:{d}".encode()).digest()[:4], "big")
                for d in range(dim)
            ]
            for p in range(N_PLANES)
        ],
        dtype=np.float64,
    )
    return raw / (1 << 31) - 1.0  # roughly uniform in [-1, 1)


LSH_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("bucket", T.IntegerType(), False),
    ]
)


def lsh_buckets(vectors: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            if planes is None:
                planes = _planes(mat.shape[1])
            signs = (mat @ planes.T) > 0
            buckets = (signs * (1 << np.arange(N_PLANES))).sum(axis=1).astype("int32")
            yield pd.DataFrame({"vec_id": pdf[id_col].astype("int64"), "bucket": buckets})

    return vectors.select(id_col, vec_col).mapInPandas(gen, schema=LSH_SCHEMA)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: join on LSH bucket, exact cosine re-rank within bucket.

    Recall < 1 by construction (single probe); the bucket join replaces the
    full cross product — at 10^12 vectors each query touches ~1/2^16 of the
    corpus. Multi-probe (flipping low-margin bits) is the standard recall
    knob; not needed for the sandbox scale.
    """
    cb = lsh_buckets(corpus, id_col, vec_col).withColumnRenamed("vec_id", "neighbor_id")
    qb = lsh_buckets(queries, id_col, vec_col).withColumnRenamed("vec_id", "query_id")
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")).join(
        cb, "neighbor_id"
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")).join(
        qb, "query_id"
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_sim(F.col("q_vec"), F.col("c_vec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_cosine_dedup(
    vectors: DataFrame,
    threshold: float = 0.995,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
) -> DataFrame:
    """Embedding near-dup pairs: LSH bucket self-join + cosine >= threshold.

    ``exact=True`` scores every (a < b) pair — O(n^2), the oracle-verifiable
    correctness baseline (same role brute_force_topk plays for ANN); the
    default LSH-bucketed path is the 100 TB scale path (recall < 1 by
    construction, single probe)."""
    if exact:
        left = vectors.select(F.col(id_col).alias("doc_a"), F.col(vec_col).alias("va"))
        right = vectors.select(F.col(id_col).alias("doc_b"), F.col(vec_col).alias("vb"))
        return (
            left.crossJoin(F.broadcast(right))
            .filter(F.col("doc_a") < F.col("doc_b"))
            .withColumn("cosine", F.round(cosine_sim(F.col("va"), F.col("vb")), 6))
            .filter(F.col("cosine") >= threshold)
            .select("doc_a", "doc_b", "cosine")
        )
    b = lsh_buckets(vectors, id_col, vec_col)
    v = vectors.select(F.col(id_col), F.col(vec_col)).join(b, id_col)
    left = v.select(F.col("bucket"), F.col(id_col).alias("doc_a"), F.col(vec_col).alias("va"))
    right = v.select(F.col("bucket"), F.col(id_col).alias("doc_b"), F.col(vec_col).alias("vb"))
    return (
        left.join(right, "bucket")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("cosine", F.round(cosine_sim(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("doc_a", "doc_b", "cosine")
        .dropDuplicates(["doc_a", "doc_b"])
    )
