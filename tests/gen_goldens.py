"""Regenerate golden fixtures (SURVEY.md §5.2). Run: python tests/gen_goldens.py

Goldens pin the CURRENT semantics of extraction + parsing + reconciliation;
any behavioral drift (regex change, scorer change, block change) fails
tests/test_golden.py until the change is intentional and goldens regenerated.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
N_PAGES = 120
N_LEDGER = 30
SAMPLE_TEXT_URLS = list(range(0, 24, 3))  # full-byte fixtures for these indexes


def main() -> None:
    from invoice_ocr_reconciler_spark import datagen
    from invoice_ocr_reconciler_spark.extraction.html_extract import extract_payload
    from invoice_ocr_reconciler_spark.functions.parse_fields import parse_invoice_text

    os.makedirs(os.path.join(GOLDEN_DIR, "extracted"), exist_ok=True)

    fields_golden = {}
    for i in range(N_PAGES):
        page = datagen.make_page(i)
        text = extract_payload(page["html"])
        f = parse_invoice_text(text, page["url"])
        fields_golden[page["url"]] = {
            "extracted_md5": hashlib.md5(text.encode("utf-8")).hexdigest(),
            "invoice_number": f["invoice_number"],
            "vendor_name": f["vendor_name"],
            "invoice_date": f["invoice_date"],
            "due_date": f["due_date"],
            "subtotal": f["subtotal"],
            "tax": f["tax"],
            "total_amount": f["total_amount"],
            "currency": f["currency"],
            "confidence": f["confidence"],
            "n_line_items": len(f["line_items"]),
        }
        if i in SAMPLE_TEXT_URLS:
            name = hashlib.md5(page["url"].encode()).hexdigest()[:16] + ".txt"
            with open(os.path.join(GOLDEN_DIR, "extracted", name), "wb") as fh:
                fh.write(text.encode("utf-8"))

    with open(os.path.join(GOLDEN_DIR, "fields.json"), "w") as fh:
        json.dump(fields_golden, fh, indent=1, sort_keys=True)

    # reconciliation golden: full Spark pipeline on the same corpus
    from invoice_ocr_reconciler_spark.session import get_spark
    from invoice_ocr_reconciler_spark.pipeline import run_pipeline

    spark = get_spark(
        app_name="gen-goldens", cores=4, shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    out = run_pipeline(
        datagen.pages_df(spark, N_PAGES), datagen.ledger_df(spark, N_LEDGER, N_PAGES)
    )
    results = [
        {
            "invoice_url": r["invoice_url"],
            "record_id": r["record_id"],
            "match_status": r["match_status"],
            "discrepancy": round(r["discrepancy"], 6) if r["discrepancy"] is not None else None,
            "flag_reason": r["flag_reason"],
            "confidence_score": r["confidence_score"],
            "suggestions": [s.asDict() for s in r["suggestions"]] if r["suggestions"] else [],
        }
        for r in out["results"].collect()
    ]
    results.sort(key=lambda r: r["invoice_url"])
    summary = out["summary"].collect()[0].asDict()
    missing = sorted(r["record_id"] for r in out["missing_records"].collect())
    with open(os.path.join(GOLDEN_DIR, "reconciliation.json"), "w") as fh:
        json.dump(
            {"results": results, "summary": summary, "missing_records": missing},
            fh, indent=1, sort_keys=True,
        )
    spark.stop()
    print(f"goldens written: {len(fields_golden)} field rows, "
          f"{len(results)} reconcile rows, {len(SAMPLE_TEXT_URLS)} text files")


if __name__ == "__main__":
    main()
