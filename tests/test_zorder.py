"""Z-order layout (sources/zorder.py): Morton keying, chunk bounds,
multi-column pruning evidence, and the physical partitioned write."""

import statistics

from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark.sources.zorder import (
    pruning_fraction,
    write_zorder_layout,
    zorder_chunk_stats,
    zorder_key,
)

SF = "/root/testdata/sf0.001"


def _orders(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    return o.withColumn(
        "_ep", F.unix_timestamp(F.col("o_orderdate")).cast("double")
    )


class TestZorderKey:
    def test_interleave_known_values(self, spark):
        # x=0b11, y=0b01 -> z = x0<<0 | y0<<1 | x1<<2 | y1<<3 = 1|2|4 = 7
        df = spark.createDataFrame([(3, 1)], "x long, y long")
        from invoice_ocr_reconciler_spark.sources.zorder import _interleave

        got = df.select(
            _interleave(F.col("x"), F.col("y"), 2).alias("z")
        ).collect()[0]["z"]
        assert got == 7

    def test_key_covers_rows_and_is_partition_invariant(self, spark):
        o = _orders(spark)
        k1 = zorder_key(o.repartition(2), F.col("o_totalprice"), F.col("_ep"))
        k2 = zorder_key(o.repartition(13), F.col("o_totalprice"), F.col("_ep"))
        r1 = sorted(
            (r["o_orderkey"], r["zkey"])
            for r in k1.select("o_orderkey", "zkey").collect()
        )
        r2 = sorted(
            (r["o_orderkey"], r["zkey"])
            for r in k2.select("o_orderkey", "zkey").collect()
        )
        assert r1 == r2 and len(r1) == o.count()

    def test_constant_column_lands_cell_zero(self, spark):
        df = spark.createDataFrame(
            [(float(i), 5.0) for i in range(10)], "x double, y double"
        )
        keyed = zorder_key(df, F.col("x"), F.col("y"))
        # y constant -> every odd bit 0 -> zkey == interleave(bx, 0)
        assert all(r["zkey"] >= 0 for r in keyed.collect())
        ymax = keyed.agg(F.max("zkey")).collect()[0][0]
        # all-odd-bits-zero upper bound: sum of even bits only
        assert ymax <= sum(1 << (2 * k) for k in range(8))


class TestZorderChunks:
    def test_chunk_stats_cover_all_rows(self, spark):
        o = _orders(spark)
        st = zorder_chunk_stats(o, F.col("o_totalprice"), F.col("_ep"))
        rows = st.collect()
        assert sum(r["n_rows"] for r in rows) == o.count()
        assert all(0 <= r["chunk"] < 64 for r in rows)
        assert all(
            r["min_x"] <= r["max_x"] and r["min_y"] <= r["max_y"]
            for r in rows
        )

    def test_both_dims_bounded_and_price_pruning_beats_linear(self, spark):
        o = _orders(spark)
        st = zorder_chunk_stats(
            o, F.col("o_totalprice"), F.col("_ep")
        ).collect()
        gx = (min(r["min_x"] for r in st), max(r["max_x"] for r in st))
        gy = (min(r["min_y"] for r in st), max(r["max_y"] for r in st))
        span_x = statistics.mean(
            (r["max_x"] - r["min_x"]) / (gx[1] - gx[0]) for r in st
        )
        span_y = statistics.mean(
            (r["max_y"] - r["min_y"]) / (gy[1] - gy[0]) for r in st
        )
        # the z-order claim: BOTH dims bounded well below full range
        assert span_x < 0.5 and span_y < 0.5
        # price-only box predicate: z-order prunes, a date-sorted linear
        # layout cannot prune at all (its per-chunk price span ~ full)
        x_lo = gx[0] + 0.45 * (gx[1] - gx[0])
        x_hi = gx[0] + 0.55 * (gx[1] - gx[0])
        zf = pruning_fraction(st, x_lo, x_hi, gy[0], gy[1])
        n = 64
        mnmx = o.agg(F.min("_ep").alias("mn"), F.max("_ep").alias("mx"))
        lin = (
            o.crossJoin(F.broadcast(mnmx))
            .withColumn(
                "chunk",
                F.least(
                    F.lit(n - 1),
                    F.floor(
                        (F.col("_ep") - F.col("mn"))
                        / (F.col("mx") - F.col("mn"))
                        * n
                    ),
                ).cast("int"),
            )
            .groupBy("chunk")
            .agg(
                F.min("o_totalprice").alias("min_x"),
                F.max("o_totalprice").alias("max_x"),
                F.min("_ep").alias("min_y"),
                F.max("_ep").alias("max_y"),
            )
            .collect()
        )
        lf = pruning_fraction(lin, x_lo, x_hi, gy[0], gy[1])
        assert zf > 0.4 and zf > lf

    def test_empty_input(self, spark):
        o = _orders(spark).filter(F.lit(False))
        assert (
            zorder_chunk_stats(o, F.col("o_totalprice"), F.col("_ep")).count()
            == 0
        )


class TestZorderWrite:
    def test_layout_roundtrip_and_chunk_dirs(self, spark, tmp_path):
        o = _orders(spark)
        path = str(tmp_path / "zo")
        write_zorder_layout(
            o, F.col("o_totalprice"), F.col("_ep"), path, n_chunks_log2=4
        )
        back = spark.read.parquet(path)
        assert back.count() == o.count()
        # chunk is a partition column; every chunk dir's zkeys are a
        # contiguous Morton range sorted within the file
        chunks = back.select("chunk").distinct().count()
        assert 1 <= chunks <= 16
        bad = back.filter(
            F.shiftright(F.col("zkey"), 16 - 4).cast("int") != F.col("chunk")
        ).count()
        assert bad == 0


def test_zorder_null_values_land_in_cell_zero(spark):
    from pyspark.sql import functions as F

    from invoice_ocr_reconciler_spark.sources.zorder import zorder_key

    rows = [(0, 1.0, 10.0), (1, None, 20.0), (2, 5.0, None), (3, None, None),
            (4, 9.0, 30.0)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    out = {r["id"]: r["zkey"] for r in
           zorder_key(df, F.col("x"), F.col("y")).collect()}
    # every row gets a NON-NULL key (NULL axis values -> cell 0), so no row
    # can fall outside the chunk layout / stats
    assert all(v is not None for v in out.values())
    assert out[3] == 0  # both axes null -> origin cell
