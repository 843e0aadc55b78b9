"""Shuffle-skew diagnostics (operators/skew.py)."""

import pytest
from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.operators.skew import skew_report


@pytest.fixture(scope="module")
def hot_df(spark):
    # 900 rows of one hot key + 10 rows each of 10 cold keys
    rows = [("hot",)] * 900 + [(f"cold{i}",) for i in range(10) for _ in range(10)]
    return spark.createDataFrame(rows, "k string")


class TestSkewReport:
    def test_mass_conserved_and_hot_flagged(self, spark, hot_df):
        rep = skew_report(hot_df, ["k"], n_partitions=8).collect()
        assert sum(r.n_rows for r in rep) == 1000
        assert sum(r.n_keys for r in rep) == 11
        hot = [r for r in rep if r.hot]
        assert len(hot) == 1
        assert hot[0].top_key == "hot" and hot[0].max_key_rows == 900
        assert hot[0].share_ppm == (hot[0].n_rows * 1_000_000) // 1000

    def test_balanced_keys_nothing_hot(self, spark):
        df = spark.range(0, 512).select(F.col("id").cast("string").alias("k"))
        rep = skew_report(df, ["k"], n_partitions=4).collect()
        assert not any(r.hot for r in rep)
        assert sum(r.n_rows for r in rep) == 512

    def test_top_key_tie_breaks_lexicographically(self, spark):
        # two keys, same count, forced into one partition (n_partitions=1)
        df = spark.createDataFrame([("a",), ("b",), ("a",), ("b",)], "k string")
        rep = skew_report(df, ["k"], n_partitions=1).collect()
        assert len(rep) == 1 and rep[0].top_key == "b"

    def test_null_keys_counted_together(self, spark):
        df = spark.createDataFrame([(None,), (None,), ("x",)], "k string")
        rep = skew_report(df, ["k"], n_partitions=1).collect()
        assert rep[0].n_keys == 2 and rep[0].n_rows == 3

    def test_spark_hash_mode_places_like_real_partitioner(self, spark, hot_df):
        rep = skew_report(hot_df, ["k"], n_partitions=8, portable=False)
        rows = rep.collect()
        assert sum(r.n_rows for r in rows) == 1000
        # the hot partition is the one Murmur3 actually routes "hot" to
        expected = spark.createDataFrame([("hot",)], "k string").select(
            F.pmod(F.hash("k"), F.lit(8)).cast("long").alias("p")
        ).collect()[0].p
        hot = [r for r in rows if r.hot]
        assert len(hot) == 1 and hot[0].partition == expected

    def test_multi_key_and_partition_invariance(self, spark):
        rows = [(f"h{i % 3}", f"p{i % 5}") for i in range(200)]
        df = spark.createDataFrame(rows, "a string, b string")
        one = skew_report(df.coalesce(1), ["a", "b"], n_partitions=4)
        many = skew_report(df.repartition(9), ["a", "b"], n_partitions=4)
        assert [r.asDict() for r in one.orderBy("partition").collect()] == [
            r.asDict() for r in many.orderBy("partition").collect()
        ]

    def test_empty_key_cols_raises(self, spark, hot_df):
        with pytest.raises(ValueError):
            skew_report(hot_df, [])
