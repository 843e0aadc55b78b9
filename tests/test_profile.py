"""Tests for the one-job column profiler (operators/profile.py)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def messy(spark):
    rows = [
        (1, "a", 1.5, None),
        (2, "b", None, "x"),
        (3, None, 2.25, "x"),
        (4, "a", -0.5, None),
    ]
    return spark.createDataFrame(
        rows, "k long, s string, d double, n string"
    )


def test_profile_counts_and_renders(messy):
    from invoice_ocr_reconciler_spark.operators.profile import column_profile

    out = {r["column"]: r.asDict() for r in column_profile(messy).collect()}
    assert set(out) == {"k", "s", "d", "n"}
    assert out["k"]["n_nonnull"] == 4 and out["k"]["n_null"] == 0
    assert out["k"]["n_distinct"] == 4
    assert out["k"]["min_value"] == "1" and out["k"]["max_value"] == "4"
    assert out["s"]["n_null"] == 1 and out["s"]["n_distinct"] == 2
    assert out["s"]["min_value"] == "a" and out["s"]["max_value"] == "b"
    # fractional render: 1e-6 grid + DECIMAL(38,6) fixed scale
    assert out["d"]["min_value"] == "-0.500000"
    assert out["d"]["max_value"] == "2.250000"
    assert out["d"]["n_nonnull"] == 3 and out["d"]["n_null"] == 1
    assert out["n"]["n_distinct"] == 1  # nulls don't count as a value


def test_profile_subset_and_approx(messy):
    from invoice_ocr_reconciler_spark.operators.profile import column_profile

    out = column_profile(messy, cols=["k"], approx_distinct=True).collect()
    assert len(out) == 1 and out[0]["column"] == "k"
    # HLL at rsd=0.02 is exact at this cardinality
    assert out[0]["n_distinct"] == 4


def test_profile_all_null_column(spark):
    from invoice_ocr_reconciler_spark.operators.profile import column_profile

    df = spark.createDataFrame([(1, None), (2, None)], "k long, v string")
    out = {r["column"]: r.asDict() for r in column_profile(df).collect()}
    assert out["v"]["n_nonnull"] == 0 and out["v"]["n_null"] == 2
    assert out["v"]["n_distinct"] == 0
    assert out["v"]["min_value"] is None and out["v"]["max_value"] is None


def test_profile_empty_frame(spark):
    from invoice_ocr_reconciler_spark.operators.profile import column_profile

    df = spark.createDataFrame([], "k long, v string")
    out = {r["column"]: r.asDict() for r in column_profile(df).collect()}
    # empty input still yields one profile row per column, all-zero counts
    assert set(out) == {"k", "v"}
    assert out["k"]["n_nonnull"] == 0 and out["k"]["n_null"] == 0
    assert out["k"]["n_distinct"] == 0 and out["k"]["min_value"] is None


# ------------------------------------------------------------ Heaps fit


def test_heaps_fit_linear_vocab_growth_beta_one(spark):
    """One brand-new token per doc: V(n) = n exactly, so the log-log OLS
    slope is exactly 1 and every checkpoint has n_tokens == n_types."""
    from invoice_ocr_reconciler_spark.operators.profile import heaps_fit

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(64)], "doc_id long, text string"
    )
    rows = heaps_fit(docs, n_checkpoints=4).collect()
    assert rows and all(r["n_tokens"] == r["n_types"] for r in rows)
    assert all(r["heaps_beta"] == 1.0 for r in rows)
    by_ck = {r["ck"]: r for r in rows}
    assert by_ck[3]["n_prefix_docs"] == 64 and by_ck[3]["n_types"] == 64
    assert by_ck[0]["n_prefix_docs"] == 8


def test_heaps_fit_template_corpus_saturates_to_zero(spark):
    """All docs identical: the vocabulary never grows past doc 0, so the
    fitted beta is exactly 0 (y constant across checkpoints)."""
    from invoice_ocr_reconciler_spark.operators.profile import heaps_fit

    docs = spark.createDataFrame(
        [(i, "same three tokens") for i in range(32)],
        "doc_id long, text string",
    )
    rows = heaps_fit(docs, n_checkpoints=4).collect()
    assert rows and all(r["heaps_beta"] == 0.0 for r in rows)
    assert all(r["n_types"] == 3 for r in rows)


def test_heaps_fit_partition_invariant(spark):
    from invoice_ocr_reconciler_spark.operators.profile import heaps_fit

    docs = spark.createDataFrame(
        [(i, f"w{i % 7} w{i % 13} common") for i in range(50)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, heaps_fit(docs).collect()))
    b = sorted(map(tuple, heaps_fit(docs.repartition(11)).collect()))
    assert a == b


def test_heaps_fit_empty_corpus_empty_output(spark):
    from invoice_ocr_reconciler_spark.operators.profile import heaps_fit

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert heaps_fit(docs).count() == 0
