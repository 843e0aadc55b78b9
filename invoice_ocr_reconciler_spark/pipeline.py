"""End-to-end pipeline: pages -> extract -> parse fields -> reconcile.

The Spark shape of the reference's three entry points (SURVEY.md §3):
E1 ingest/extract (backend/server.js:285-344), E2 reconcile
(backend/server.js:508-563), E3 aggregate dashboards (backend/server.js:236-277).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from invoice_ocr_reconciler_spark.extraction.udfs import extract_pages
from invoice_ocr_reconciler_spark.functions.parse_fields import (
    FIELDS_SCHEMA,
    parse_invoice_fields,
)
from invoice_ocr_reconciler_spark.operators.reconcile import reconcile


def _extract_parse_rows(urls, htmls) -> list[dict]:
    # one Python crossing for both stages: the two-stage path ships the full
    # extracted text JVM->Python->JVM->Python; fused, the text never leaves
    # the worker between extraction and field parsing. Same pure functions,
    # byte-identical output (pinned by tests).
    from invoice_ocr_reconciler_spark.extraction.html_extract import extract_payload
    from invoice_ocr_reconciler_spark.functions.parse_fields import parse_invoice_text

    rows = []
    for url, payload in zip(urls, htmls):
        text = extract_payload(payload)
        rows.append({"url": url, "extracted_text": text, **parse_invoice_text(text, url)})
    return rows


def _extract_parse_arrow(batches):
    # Arrow-native batches skip the pandas construction on both sides
    # (~15% over mapInPandas on the dominant stage; byte-equal, tested)
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_type

    atype = to_arrow_type(FIELDS_SCHEMA)
    names = [f.name for f in FIELDS_SCHEMA.fields]
    for batch in batches:
        rows = _extract_parse_rows(
            batch.column("url").to_pylist(), batch.column("html").to_pylist()
        )
        yield pa.RecordBatch.from_arrays(
            [pa.array([r[n] for r in rows], type=atype.field(n).type) for n in names],
            names=names,
        )


def _extract_parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [f.name for f in FIELDS_SCHEMA.fields]
    for pdf in batches:
        yield pd.DataFrame(
            _extract_parse_rows(pdf["url"], pdf["html"]), columns=cols
        )


def extract_and_parse(pages: DataFrame, fused: bool = True) -> DataFrame:
    """pages -> structured invoice rows (E1).

    ``fused=True`` (default) runs extraction + field parsing in a single
    Arrow-native crossing (mapInArrow); ``fused=False`` composes the
    standalone operators (two crossings) — kept for operator-level testing
    and reuse. All three paths are byte-identical (tested).
    """
    if fused:
        pruned = pages.select("url", "html")
        try:
            return pruned.mapInArrow(_extract_parse_arrow, schema=FIELDS_SCHEMA)
        except Exception:  # pandas fallback if the arrow path is unavailable
            return pruned.mapInPandas(_extract_parse_batches, schema=FIELDS_SCHEMA)
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
