"""Product-quantization ANN: codebook determinism, encode parity,
planted-neighbor recall, ADC exactness (the BPE/MinHash/IVF rows-only
contract — pytest goldens instead of a SQL oracle)."""

from __future__ import annotations

import numpy as np
import pytest


def _planted(spark, n_bg=60, n_clusters=4, sib=5, dim=16, seed=11):
    """Queries 0..3, each with `sib` near-copies (sigma 0.01) in a far-apart
    cluster, plus isotropic background noise; every vector unit-normalized
    so cosine (brute force) and L2 (ADC) orders agree."""
    rng = np.random.RandomState(seed)
    cent = rng.randn(n_clusters, dim) * 6
    rows = []
    vid = 0
    for c in range(n_clusters):
        for _ in range(sib + 1):  # member 0 of each cluster is the query
            v = cent[c] + rng.randn(dim) * 0.01
            rows.append((vid, (v / np.linalg.norm(v)).tolist()))
            vid += 1
    for _ in range(n_bg):
        v = rng.randn(dim)
        rows.append((vid, (v / np.linalg.norm(v)).tolist()))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q_ids = [c * (sib + 1) for c in range(n_clusters)]
    return df, df.filter(df.vec_id.isin(q_ids)), q_ids


def test_pq_encode_matches_numpy_reference(spark):
    from invoice_ocr_reconciler_spark.operators.pq import (
        _encode_mat,
        fit_pq_codebooks,
        pq_encode,
    )

    df, _, _ = _planted(spark)
    books = fit_pq_codebooks(df, m=4, k=16)
    assert books.shape == (4, 16, 4)
    mat = np.array([r["embedding"] for r in df.orderBy("vec_id").collect()])
    expect = _encode_mat(mat, books)
    got = {r["vec_id"]: list(r["codes"]) for r in pq_encode(df, books).collect()}
    assert all(got[i] == list(expect[i]) for i in got)


def test_pq_codebooks_deterministic_across_partitioning(spark):
    from invoice_ocr_reconciler_spark.operators.pq import fit_pq_codebooks

    df, _, _ = _planted(spark)
    a = fit_pq_codebooks(df, m=4, k=8)
    b = fit_pq_codebooks(df.repartition(13), m=4, k=8)
    assert np.array_equal(a, b)


def test_pq_topk_recalls_planted_neighbors(spark):
    """Each query's 5 near-copies share its codes, so ADC puts them at
    the minimum distance — recall vs the exact baseline stays high even
    at a tiny code budget."""
    from invoice_ocr_reconciler_spark.operators.pq import (
        fit_pq_codebooks,
        pq_topk,
    )
    from invoice_ocr_reconciler_spark.operators.similarity import (
        brute_force_topk,
    )

    df, q, _ = _planted(spark)
    books = fit_pq_codebooks(df, m=4, k=16)
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_topk(df, q, books, k=5).collect()
    }
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(df, q, k=5).collect()
    }
    assert len(truth & approx) / len(truth) >= 0.8


def test_pq_adc_distance_is_exact_table_sum(spark):
    """ADC distance of a corpus vector == the summed per-subspace L2 of
    its RECONSTRUCTION (codebook entries) to the query — verified
    against numpy to the rounding grid."""
    from invoice_ocr_reconciler_spark.operators.pq import (
        _encode_mat,
        fit_pq_codebooks,
        pq_topk,
    )

    df, q, q_ids = _planted(spark)
    books = fit_pq_codebooks(df, m=4, k=16)
    m, kk, sub_d = books.shape
    rows = {r["vec_id"]: np.array(r["embedding"]) for r in df.collect()}
    out = pq_topk(df, q, books, k=3).collect()
    for r in out:
        qv = rows[r["query_id"]]
        code = _encode_mat(rows[r["neighbor_id"]][None, :], books)[0]
        d = sum(
            ((qv[j * sub_d : (j + 1) * sub_d] - books[j][code[j]]) ** 2).sum()
            for j in range(m)
        )
        assert abs(r["adc_dist"] - round(d, 6)) <= 1e-6


def test_pq_empty_corpus_and_bad_dim(spark):
    from invoice_ocr_reconciler_spark.operators.pq import fit_pq_codebooks

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert fit_pq_codebooks(empty, m=4, k=8).shape == (0, 0, 0)
    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError):
        fit_pq_codebooks(df, m=2, k=4)


def test_pq_topk_partition_invariant(spark):
    from invoice_ocr_reconciler_spark.operators.pq import (
        fit_pq_codebooks,
        pq_topk,
    )

    df, q, _ = _planted(spark)
    books = fit_pq_codebooks(df, m=4, k=16)
    a = sorted(map(tuple, pq_topk(df, q, books, k=5).collect()))
    b = sorted(
        map(tuple, pq_topk(df.repartition(9), q, books, k=5).collect())
    )
    assert a == b


def test_fit_pq_codebooks_local_bit_identical(spark):
    """fit_pq_codebooks_local (pure numpy) must reproduce the Spark-side
    fit bit-for-bit -- the contract that lets the ann_pq oracle feed the
    codebooks to DuckDB as a table."""
    import numpy as np

    from invoice_ocr_reconciler_spark.operators.pq import (
        fit_pq_codebooks,
        fit_pq_codebooks_local,
    )

    rng = np.random.default_rng(11)
    n, dim = 200, 32
    ids = np.arange(n, dtype=np.int64)
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in ids],
        "vec_id long, embedding array<float>",
    )
    for m, k in ((4, 8), (8, 16)):
        b_spark = fit_pq_codebooks(df, m=m, k=k)
        b_local = fit_pq_codebooks_local(
            ids, vecs.astype(np.float64), m=m, k=k
        )
        assert np.array_equal(b_spark, b_local)
