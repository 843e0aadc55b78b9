"""Determinism across parallelism (SURVEY.md §5.2-5, north_rule contract):
same input at different partition counts + shuffle partitions -> identical
per-url extracted bytes and identical reconciliation output."""

from pyspark.sql import functions as F

from invoice_ocr_reconciler_spark import datagen
from invoice_ocr_reconciler_spark.pipeline import run_pipeline

N = 150


def _signature(out):
    texts = {
        r["url"]: r["extracted_text"]
        for r in out["invoices"].select("url", "extracted_text").collect()
    }
    results = sorted(
        map(
            tuple,
            out["results"]
            .select("invoice_url", "record_id", "match_status", "discrepancy",
                    "confidence_score")
            .collect(),
        )
    )
    return texts, results


def test_identical_output_across_partitioning(spark):
    out_a = run_pipeline(
        datagen.pages_df(spark, N, partitions=2), datagen.ledger_df(spark, 25, N),
        include_text=True,
    )
    out_b = run_pipeline(
        datagen.pages_df(spark, N, partitions=13), datagen.ledger_df(spark, 25, N),
        include_text=True,
    )
    texts_a, results_a = _signature(out_a)
    texts_b, results_b = _signature(out_b)
    assert texts_a == texts_b  # byte-identical per url
    assert results_a == results_b


def test_fused_paths_byte_identical(spark):
    """mapInArrow fused == mapInPandas fused == two-stage composition."""
    from invoice_ocr_reconciler_spark.pipeline import (
        _make_extract_parse_batches,
        extract_and_parse,
    )
    from invoice_ocr_reconciler_spark.functions.parse_fields import FIELDS_SCHEMA

    pages = datagen.pages_df(spark, 200)
    arrow = sorted(map(str, extract_and_parse(pages, fused=True).collect()))
    pandas_fused = sorted(
        map(
            str,
            pages.select("url", "html")
            .mapInPandas(_make_extract_parse_batches(True), schema=FIELDS_SCHEMA)
            .collect(),
        )
    )
    two_stage = sorted(map(str, extract_and_parse(pages, fused=False).collect()))
    assert arrow == pandas_fused == two_stage
    # text-free output == text-bearing output minus the text column
    slim = sorted(map(str, extract_and_parse(pages, include_text=False).collect()))
    slim_ref = sorted(
        map(str, extract_and_parse(pages, fused=True).drop("extracted_text").collect())
    )
    assert slim == slim_ref


def test_curation_identical_across_partitioning(spark):
    """Curation (incl. the MinHash near-dup stage) is partition-invariant:
    same curated id set and stage counters at different partition counts."""
    from pyspark.sql import Row

    from invoice_ocr_reconciler_spark.operators.curation import curate_documents

    rows = [
        Row(doc_id=i,
            text=("the data and value of table " * 12) + f" tail {i % 17} {i % 5}")
        for i in range(120)
    ]

    def run(parts):
        df = spark.createDataFrame(rows).repartition(parts)
        out = curate_documents(df, min_quality=0.4)
        ids = sorted(r["doc_id"] for r in out["curated"].collect())
        stats = out["stats"].collect()[0].asDict()
        return ids, stats

    ids_a, stats_a = run(2)
    ids_b, stats_b = run(11)
    assert ids_a == ids_b
    assert stats_a == stats_b


def test_mutation_identical_across_partitioning(spark):
    """MERGE output is partition-invariant (full-outer join + projection)."""
    from pyspark.sql import Row

    from invoice_ocr_reconciler_spark.operators.mutate import upsert

    target = [Row(url=f"u{i}", status="pending", amount=float(i)) for i in range(200)]
    updates = [Row(url=f"u{i}", status="matched", amount=float(i) + 0.5)
               for i in range(0, 300, 3)]

    def run(parts):
        t = spark.createDataFrame(target).repartition(parts)
        u = spark.createDataFrame(updates).repartition(max(parts - 1, 1))
        return sorted(map(tuple, upsert(t, u, key="url").collect()))

    assert run(2) == run(13)
