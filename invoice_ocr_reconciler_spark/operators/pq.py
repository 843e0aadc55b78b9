"""Product quantization (PQ) for embedding-column ANN — the memory-bound
scale path beyond IVF-SQ8.

PQ (Jégou et al., "Product Quantization for Nearest Neighbor Search",
TPAMI 2011) splits each d-dim vector into ``m`` subvectors and vector-
quantizes each subspace against its own ``k``-entry codebook, so a
768-float document embedding compresses to m bytes (m=8, k=256 — here the
test-scale defaults are smaller). Search uses Asymmetric Distance
Computation (ADC): per query, an (m x k) table of exact subspace distances
is built ONCE, and each corpus vector's distance is m table lookups over
its codes — no float vector ever rides the scan.

Where it sits in this repo's ANN ladder:
  brute_force_topk   exact, the correctness baseline;
  lsh/ivf_topk       prune WHICH vectors are scored (recall loss from
                     missed candidates);
  ivf_sq8_topk       8x smaller scan payload, per-dim scalar quant;
  pq_topk            m-byte codes — 100-1000x smaller than raw floats,
                     the shape that holds when 10^12 x 768-float vectors
                     (3 PB raw) must be scanned from memory.

Determinism contract (the fit_ivf_centroids one): hash-filtered sample,
first-k init, stable argmin with lowest-index tie-break, emptied
centroids keep their previous position — reruns at any parallelism
reproduce the codebooks bit-for-bit. ADC distances are rounded on the
1e-6 grid BEFORE ranking with (dist asc, id asc) total order, so the
top-k is unique and partition-invariant. Like BPE/MinHash/IVF, the fit is
iterative/driver-side and the operator is pinned by pytest goldens +
recall guards instead of a SQL oracle (rows-only CORRECTNESS entry).

Reference parity: the reference repo has no ANN at all (the fuzzy matcher
scores candidate pairs directly, backend/server.js reconcile path); this
module is part of the additional LLM-training-data surface.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from invoice_ocr_reconciler_spark.util import with_scan_parallelism


def fit_pq_codebooks(
    vectors: DataFrame,
    m: int = 4,
    k: int = 16,
    n_iter: int = 10,
    sample_cap: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Fit per-subspace L2 k-means codebooks driver-side -> array of
    shape (m, k, d/m). d must be divisible by m.

    Same sampling/determinism scheme as similarity.fit_ivf_centroids:
    a deterministic xxhash64 keep-filter (unbiased, no global sort) top-
    capped at ``sample_cap`` rows, init = the first k subvectors,
    argmin ties to the lowest index, an emptied centroid keeps its
    previous position. Empty corpus -> (0, 0, 0) array.
    """
    from invoice_ocr_reconciler_spark.operators.similarity import (
        deterministic_sample_matrix,
    )

    mat = deterministic_sample_matrix(vectors, sample_cap, id_col, vec_col)
    if mat.size == 0:
        return np.zeros((0, 0, 0), dtype=np.float64)
    return _pq_codebooks_from_sample(mat, m, k, n_iter)


def _pq_codebooks_from_sample(
    mat: np.ndarray, m: int, k: int, n_iter: int
) -> np.ndarray:
    """The per-subspace Lloyd loop shared by the Spark fit and the
    oracle-side local twin (fit_pq_codebooks_local) — one definition so
    both produce bit-identical codebooks from the same sample matrix."""
    d = mat.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub_d = d // m
    kk = min(k, len(mat))
    books = np.zeros((m, kk, sub_d), dtype=np.float64)
    for j in range(m):
        sub = mat[:, j * sub_d : (j + 1) * sub_d]
        cent = sub[:kk].copy()
        for _ in range(n_iter):
            # (n, kk) squared L2; stable argmin -> lowest index on ties
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(kk):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[j] = cent
    return books


def fit_pq_codebooks_local(
    ids: np.ndarray,
    vecs: np.ndarray,
    m: int = 4,
    k: int = 16,
    n_iter: int = 10,
    sample_cap: int = 4096,
) -> np.ndarray:
    """Driver/oracle-side twin of fit_pq_codebooks over in-memory arrays:
    identical deterministic sample (similarity.local_sample_matrix) and
    identical Lloyd loop, so it reproduces the Spark fit BIT-FOR-BIT
    without a SparkSession — the ann_pq oracle feeds these codebooks to
    DuckDB as a table (the fitted-centroid contract)."""
    from invoice_ocr_reconciler_spark.operators.similarity import (
        local_sample_matrix,
    )

    mat = local_sample_matrix(ids, vecs, sample_cap)
    if mat.size == 0:
        return np.zeros((0, 0, 0), dtype=np.float64)
    return _pq_codebooks_from_sample(mat, m, k, n_iter)


def _encode_mat(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, d) float -> (n, m) int32 codes via per-subspace stable argmin."""
    m, _, sub_d = books.shape
    codes = np.empty((mat.shape[0], m), dtype=np.int32)
    for j in range(m):
        sub = mat[:, j * sub_d : (j + 1) * sub_d]
        d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = np.argmin(d2, axis=1)
    return codes


def pq_encode(
    vectors: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes array<int>): one vectorized Arrow crossing; the
    codes table is what a serving/scan tier persists (m ints per doc)."""
    books = codebooks.copy()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            codes = _encode_mat(mat, books)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].astype("int64"),
                    "codes": list(codes),
                }
            )

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("codes", T.ArrayType(T.IntegerType()), False),
        ]
    )
    return (
        with_scan_parallelism(vectors.select(id_col, vec_col))
        .mapInPandas(gen, schema=schema)
        .withColumnRenamed("vec_id", id_col)
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_queries: bool = True,
) -> DataFrame:
    """ADC top-k -> (query_id, neighbor_id, adc_dist, nb_rank): approximate
    nearest neighbors by summed per-subspace table lookups over the codes.

    Plan shape: the corpus crosses Python ONCE to encode (m ints per
    row); each query crosses once to emit its flattened (m*k) distance
    table. The scoring join is then PURE CODEGEN: broadcast the tiny
    (query_id, table) side, and each corpus row's distance is
    aggregate(transform(codes, (c, j) -> table[j*k + c]), sum) — m array
    lookups per row, no floats from the corpus side, no Python in the
    O(corpus x queries) stage. Distances round on the 1e-6 grid before
    the (dist asc, id) rank so the cut is total-ordered and partition-
    invariant. At real scale feed IVF-probed cells instead of the full
    corpus as `corpus` (IVF+PQ composition — the operators compose
    because both key on id_col).
    """
    books = codebooks.copy()
    m, kk, _ = books.shape
    codes = pq_encode(corpus, books, id_col=id_col, vec_col=vec_col)

    def tables(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            sub_d = mat.shape[1] // m
            out = np.empty((mat.shape[0], m * kk), dtype=np.float64)
            for j in range(m):
                sub = mat[:, j * sub_d : (j + 1) * sub_d]
                d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(
                    axis=2
                )
                out[:, j * kk : (j + 1) * kk] = d2
            yield pd.DataFrame(
                {
                    "query_id": pdf[id_col].astype("int64"),
                    "adc_table": list(out),
                }
            )

    tschema = T.StructType(
        [
            T.StructField("query_id", T.LongType(), False),
            T.StructField("adc_table", T.ArrayType(T.DoubleType()), False),
        ]
    )
    q_tab = (
        queries.select(id_col, vec_col)
        .mapInPandas(tables, schema=tschema)
        .select("query_id", "adc_table")
    )
    if broadcast_queries:
        q_tab = F.broadcast(q_tab)
    # ADC sum in codegen: codes[j] picks table[j*kk + code] (1-based
    # element_at); the captured refs are plain columns, so the HOF lambda
    # re-evaluation hazard (see functions/text.py n-gram note) doesn't bite
    dist = F.aggregate(
        F.transform(
            F.col("codes"),
            lambda c, j: F.element_at(
                F.col("adc_table"), (j * kk + c + 1).cast("int")
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        codes.crossJoin(q_tab)
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn("adc_dist", F.round(dist, 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col(id_col)
    )
    return (
        scored.withColumn("nb_rank", F.row_number().over(w))
        .filter(F.col("nb_rank") <= k)
        .select(
            "query_id", F.col(id_col).alias("neighbor_id"), "adc_dist", "nb_rank"
        )
    )
