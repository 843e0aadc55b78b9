"""Tests for SemDeDup-style semantic dedup (operators/similarity.py:
semantic_dedup): planted duplicate groups, the farthest-from-centroid
survivor rule, chain grouping via connected components, partition
invariance, and degenerate inputs."""

import math

import pytest
from pyspark.sql import functions as F


def _unit(v):
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


@pytest.fixture(scope="module")
def planted(spark):
    """Three tight groups around orthogonal directions + two singletons.

    Group A (ids 0-2): tiny perturbations of e0 — mutual cosine ~1.
    Group B (ids 10-11): perturbations of e1.
    Singletons (ids 20, 21): e2 and a diagonal far from everything.
    """
    rows = [
        (0, _unit([1.0, 0.001, 0.0, 0.0])),
        (1, _unit([1.0, 0.0, 0.001, 0.0])),
        (2, _unit([1.0, 0.0, 0.0, 0.001])),
        (10, _unit([0.001, 1.0, 0.0, 0.0])),
        (11, _unit([0.0, 1.0, 0.001, 0.0])),
        (20, _unit([0.0, 0.0, 1.0, 0.0])),
        (21, _unit([0.5, -0.5, -0.5, 0.5])),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_groups_found_and_one_survivor_each(planted):
    from invoice_ocr_reconciler_spark.operators.similarity import semantic_dedup

    out = {r["vec_id"]: r.asDict()
           for r in semantic_dedup(planted, eps=0.05, n_centroids=4).collect()}
    assert len(out) == 7  # every input row present
    # groups resolved: A = {0,1,2} share one component, B = {10,11} another
    comp_a = {out[i]["component"] for i in (0, 1, 2)}
    comp_b = {out[i]["component"] for i in (10, 11)}
    assert len(comp_a) == 1 and len(comp_b) == 1 and comp_a != comp_b
    # exactly one survivor per group
    assert sum(out[i]["is_kept"] for i in (0, 1, 2)) == 1
    assert sum(out[i]["is_kept"] for i in (10, 11)) == 1
    # singletons are their own component and kept
    for i in (20, 21):
        assert out[i]["component"] == i and out[i]["is_kept"]


def test_survivor_is_farthest_from_centroid(planted):
    from invoice_ocr_reconciler_spark.operators.similarity import semantic_dedup

    rows = semantic_dedup(planted, eps=0.05, n_centroids=4).collect()
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r["component"], []).append(r)
    for members in by_comp.values():
        if len(members) < 2:
            continue
        kept = [m for m in members if m["is_kept"]][0]
        expected = min(members, key=lambda m: (m["cent_sim"], m["vec_id"]))
        assert kept["vec_id"] == expected["vec_id"]


def test_chain_grouping_not_per_doc_max(spark):
    """a~b and b~c but a!~c: connected components puts all three in ONE
    group (two survivors would leak a near-dup pair under per-doc max-sim
    thresholding; CC keeps exactly one)."""
    from invoice_ocr_reconciler_spark.operators.similarity import semantic_dedup

    theta = 0.25  # cos(theta)~0.969 > 1-eps; cos(2*theta)~0.878 < 1-eps
    rows = [
        (0, [1.0, 0.0]),
        (1, [math.cos(theta), math.sin(theta)]),
        (2, [math.cos(2 * theta), math.sin(2 * theta)]),
    ]
    docs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup(docs, eps=0.05, n_centroids=1).collect()
    comps = {r["vec_id"]: r["component"] for r in out}
    assert comps[0] == comps[1] == comps[2]
    assert sum(r["is_kept"] for r in out) == 1


def test_partition_invariance(planted):
    from invoice_ocr_reconciler_spark.operators.similarity import semantic_dedup

    a = sorted(map(tuple, semantic_dedup(planted, eps=0.05, n_centroids=4).collect()))
    b = sorted(map(tuple, semantic_dedup(
        planted.repartition(5), eps=0.05, n_centroids=4).collect()))
    assert a == b


def test_no_dups_corpus_all_kept(spark):
    from invoice_ocr_reconciler_spark.operators.similarity import semantic_dedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = semantic_dedup(emb, eps=0.05, n_centroids=4)
    pdf = out.toPandas()
    assert len(pdf) == emb.count()
    assert pdf["is_kept"].all()  # max pairwise cosine ~0.47 in this corpus
    assert (pdf["component"] == pdf["vec_id"]).all()


def test_empty_corpus(spark):
    from invoice_ocr_reconciler_spark.operators.similarity import semantic_dedup

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert semantic_dedup(empty).count() == 0


# --- round-5: the oracle-side local fit twin --------------------------------


def test_xxhash64_long_matches_spark(spark):
    """xxhash64_long is the sample-selection hash behind the oracle-side
    fit replay -- it must equal Spark's xxhash64(bigint) bit-for-bit,
    including negatives and the extremes."""
    from invoice_ocr_reconciler_spark.operators.similarity import xxhash64_long

    ids = [0, 1, -1, 42, -42, 499, 2**62, -(2**62), 2**63 - 1, -(2**63)]
    df = spark.createDataFrame([(i,) for i in ids], "v long").select(
        "v", F.xxhash64("v").alias("h")
    )
    got = {r["v"]: r["h"] for r in df.collect()}
    assert got == {i: xxhash64_long(i) for i in ids}


def test_fit_ivf_centroids_local_bit_identical(spark):
    """fit_ivf_centroids_local (pandas/numpy, no Spark) must reproduce the
    Spark-side fit bit-for-bit on the same vectors -- the contract that
    lets the semantic_dedup oracle feed fitted centroids to DuckDB as a
    table and value-check everything downstream of the fit."""
    import numpy as np

    from invoice_ocr_reconciler_spark.operators.similarity import (
        fit_ivf_centroids,
        fit_ivf_centroids_local,
    )

    rng = np.random.default_rng(7)
    n, dim = 300, 16
    ids = np.arange(n, dtype=np.int64)
    # float32 storage like the embeddings table, including a zero vector
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    vecs[17] = 0.0
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in ids],
        "vec_id long, embedding array<float>",
    )
    for k, cap in ((4, 64), (8, 4096)):
        c_spark = fit_ivf_centroids(df, n_centroids=k, sample_cap=cap)
        c_local = fit_ivf_centroids_local(
            ids, vecs.astype(np.float64), n_centroids=k, sample_cap=cap
        )
        assert np.array_equal(c_spark, c_local)


def test_semantic_dedup_oracle_generates_and_is_data_scoped(monkeypatch):
    """_semantic_dedup_oracle embeds the fitted centroids for the sf dir
    in $SPARK_GRAFT_ORACLE_SF_DIR and returns '' (rows-only fallback)
    when the parquet is unreadable instead of crashing oracle_sql()."""
    import __spark_entry__ as entry

    sql = entry._semantic_dedup_oracle()
    assert "cent(centroid_id, cvec)" in sql and "is_kept" in sql
    # the threshold is repr(1.0 - eps) -- the exact Python double Spark
    # compares to (here 1.0 - 0.65 rounds to exactly 0.35)
    assert repr(1.0 - 0.65) in sql
    monkeypatch.setenv("SPARK_GRAFT_ORACLE_SF_DIR", "/nonexistent")
    assert entry._semantic_dedup_oracle() == ""
