"""End-to-end pipeline: pages -> extract -> parse fields -> reconcile.

The Spark shape of the reference's three entry points (SURVEY.md §3):
E1 ingest/extract (backend/server.js:285-344), E2 reconcile
(backend/server.js:508-563), E3 aggregate dashboards (backend/server.js:236-277).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from invoice_ocr_reconciler_spark.extraction.udfs import extract_pages
from invoice_ocr_reconciler_spark.functions.parse_fields import parse_invoice_fields
from invoice_ocr_reconciler_spark.operators.reconcile import reconcile


def extract_and_parse(pages: DataFrame) -> DataFrame:
    """pages -> structured invoice rows (E1). One Arrow round-trip per stage."""
    extracted = extract_pages(pages)
    return parse_invoice_fields(extracted)


def run_pipeline(
    pages: DataFrame,
    ledger: DataFrame,
    broadcast_ledger: bool = True,
    with_amount_suggestions: bool = True,
) -> dict[str, DataFrame]:
    """Full extract+reconcile; returns results/missing_records/summary plus
    the intermediate ``invoices`` frame for inspection."""
    invoices = extract_and_parse(pages)
    out = reconcile(
        invoices,
        ledger,
        broadcast_ledger=broadcast_ledger,
        with_amount_suggestions=with_amount_suggestions,
    )
    out["invoices"] = invoices
    return out
