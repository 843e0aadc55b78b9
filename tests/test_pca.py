"""PCA band (operators/pca.py): exact-integer moments, numpy parity,
deterministic basis, projection quality."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.operators.pca import (
    GRID,
    covariance_stats,
    pca_fit,
    pca_project,
)


def _toy(rng, n=300):
    # anisotropic cloud: variance concentrated along two known axes
    base = rng.standard_normal((n, 2)) * np.array([5.0, 2.0])
    lift = np.zeros((n, 6))
    lift[:, 0] = base[:, 0]
    lift[:, 2] = base[:, 1]
    lift[:, 4] = 0.1 * rng.standard_normal(n)
    return np.round(lift, 4)


@pytest.fixture(scope="module")
def cloud(spark):
    rng = np.random.default_rng(7)
    mat = _toy(rng)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id int, embedding array<double>",
    )
    return df, mat


class TestMoments:
    def test_exact_vs_numpy(self, spark, cloud):
        df, mat = cloud
        q = np.floor(mat * GRID + 0.5).astype(np.int64)
        rows = covariance_stats(df).collect()
        n = next(r.s for r in rows if r.i == -1)
        assert n == mat.shape[0]
        for r in rows:
            if r.j == -1 and r.i >= 0:
                assert r.s == int(q[:, r.i].sum())
            elif r.i >= 0:
                assert r.s == int((q[:, r.i] * q[:, r.j]).sum())

    def test_partition_invariance(self, spark, cloud):
        df, _ = cloud
        one = {(r.i, r.j): r.s for r in covariance_stats(df.coalesce(1)).collect()}
        many = {
            (r.i, r.j): r.s for r in covariance_stats(df.repartition(13)).collect()
        }
        assert one == many


class TestFit:
    def test_recovers_planted_axes(self, spark, cloud):
        df, mat = cloud
        model = pca_fit(df, k=2)
        c0, c1 = np.array(model["components"][0]), np.array(model["components"][1])
        # top component points along dim 0, second along dim 2
        assert abs(c0[0]) > 0.99 and abs(c1[2]) > 0.99
        # sign convention: dominant coefficient positive
        assert c0[int(np.argmax(np.abs(c0)))] > 0
        assert sum(model["explained"]) <= 1.0 + 1e-9
        assert model["explained"][0] > model["explained"][1] > 0.0

    def test_matches_numpy_eigh(self, spark, cloud):
        df, mat = cloud
        model = pca_fit(df, k=3)
        q = np.floor(mat * GRID + 0.5) / GRID  # the quantized cloud
        cov = np.cov(q, rowvar=False, bias=True)
        vals = np.linalg.eigvalsh(cov)[::-1]
        got = np.array(model["explained"]) * vals.sum()
        assert np.allclose(got, vals[:3], atol=1e-6)

    def test_empty_and_bad_k(self, spark):
        empty = spark.createDataFrame([], "vec_id int, embedding array<double>")
        with pytest.raises(ValueError):
            pca_fit(empty, k=2)
        df = spark.createDataFrame(
            [(0, [1.0, 2.0])], "vec_id int, embedding array<double>"
        )
        with pytest.raises(ValueError):
            pca_fit(df, k=3)


class TestProject:
    def test_projection_matches_numpy_and_is_pure_codegen(self, spark, cloud):
        df, mat = cloud
        model = pca_fit(df, k=2)
        out = pca_project(df, model).orderBy("vec_id")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "Arrow" not in plan
        got = np.array([r.reduced for r in out.collect()])
        comps = np.array(model["components"])
        want = (mat - np.array(model["mean"])) @ comps.T
        want = np.floor(want * 1e6 + 0.5) / 1e6
        assert np.allclose(got, want, atol=2e-6)

    def test_reduced_space_preserves_neighbors(self, spark, cloud):
        # variance lives in dims 0/2; nearest neighbors by the top-2
        # projection agree with full-space neighbors for most queries
        df, mat = cloud
        model = pca_fit(df, k=2)
        red = np.array(
            [r.reduced for r in pca_project(df, model).orderBy("vec_id").collect()]
        )

        def top1(m, i):
            d = ((m - m[i]) ** 2).sum(axis=1)
            d[i] = np.inf
            return int(np.argmin(d))

        agree = sum(top1(mat, i) == top1(red, i) for i in range(40))
        assert agree >= 32


class TestRandomProjection:
    def test_signs_deterministic_and_engine_free(self, spark):
        from invoice_ocr_reconciler_spark.operators.pca import rp_signs

        a = rp_signs(8, 3)
        assert a == rp_signs(8, 3)
        assert a != rp_signs(8, 3, seed="rp-v2")
        assert all(s in (1, -1) for row in a for s in row)
        # roughly balanced at realistic width
        flat = [s for row in rp_signs(64, 8) for s in row]
        assert 0.35 < (flat.count(1) / len(flat)) < 0.65

    def test_matches_numpy_and_pure_codegen(self, spark, cloud):
        from invoice_ocr_reconciler_spark.operators.pca import rp_project, rp_signs

        df, mat = cloud
        out = rp_project(df, dim=6, k=4).orderBy("vec_id")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "Arrow" not in plan
        got = np.array([r.reduced for r in out.collect()])
        signs = np.array(rp_signs(6, 4))
        q = np.floor(mat * 1_000_000 + 0.5)
        want = (q @ signs.T) * (1.0 / (1_000_000 * 4 ** 0.5))
        want = np.floor(want * 1e6 + 0.5) / 1e6
        assert np.allclose(got, want, atol=2e-6)

    def test_jl_distance_preservation(self, spark, cloud):
        # pairwise distance ratios concentrate around 1 in the projection
        from invoice_ocr_reconciler_spark.operators.pca import rp_project

        df, mat = cloud
        red = np.array(
            [r.reduced for r in rp_project(df, dim=6, k=6).orderBy("vec_id").collect()]
        )
        rng = np.random.default_rng(3)
        idx = rng.integers(0, len(mat), size=(60, 2))
        ratios = []
        for a, b in idx:
            if a == b:
                continue
            d_full = np.linalg.norm(mat[a] - mat[b])
            d_red = np.linalg.norm(red[a] - red[b])
            if d_full > 1e-9:
                ratios.append(d_red / d_full)
        ratios = np.array(ratios)
        assert 0.5 < np.median(ratios) < 1.5

    def test_partition_invariance(self, spark, cloud):
        from invoice_ocr_reconciler_spark.operators.pca import rp_project

        df, _ = cloud
        one = rp_project(df.coalesce(1), dim=6, k=3).orderBy("vec_id").collect()
        many = rp_project(df.repartition(11), dim=6, k=3).orderBy("vec_id").collect()
        assert [r.reduced for r in one] == [r.reduced for r in many]


def test_pca_fit_local_bit_identical(spark):
    """pca_fit_local (pure numpy/bigint moments) must reproduce the Spark
    fit bit-for-bit -- the contract that lets the pca_recall oracle feed
    the fitted components/mean to DuckDB as tables."""
    import numpy as np

    from invoice_ocr_reconciler_spark.operators.pca import (
        pca_fit,
        pca_fit_local,
    )

    rng = np.random.default_rng(13)
    n, dim = 120, 12
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    m_spark = pca_fit(df, k=8)
    m_local = pca_fit_local(vecs.astype(np.float64), k=8)
    assert m_spark["components"] == m_local["components"]
    assert m_spark["explained"] == m_local["explained"]
    assert m_spark["mean"] == m_local["mean"]
    assert m_spark["n"] == m_local["n"]
