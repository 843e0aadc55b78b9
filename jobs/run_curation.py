"""Cluster job entrypoint: spark-submit --py-files dist/invoice_ocr_reconciler_spark.zip \
    jobs/run_curation.py --docs <parquet> --out <path> [--min-quality 0.55]
    [--langs en,fr] [--near-dup-threshold 0.7] [--no-near-dup]
    [--exact-components] [--max-top2gram-frac 0.2] [--redact-pii]
    [--sample-rates en=60,fr=100] [--gopher] [--benchmark <parquet>]
    [--decontam-n 13]

Training-data curation over a documents table (doc_id, text, ...):
annotate -> exact-dedup (first wins) -> quality/language filter ->
optional repetition cut -> optional Gopher rule filter -> optional
benchmark decontamination -> MinHash near-dup drop (pairwise-approx or exact
connected components) -> optional deterministic stratified sampling ->
optional PII redaction; writes the curated table plus a one-row
audit-stats JSON — the per-run lineage record (input / dropped-per-stage /
kept / tokens).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# `python jobs/run_curation.py` puts jobs/ (not the repo root) on sys.path;
# under spark-submit --py-files the zip provides the package instead
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="documents parquet path")
    ap.add_argument("--out", required=True, help="output root")
    ap.add_argument("--min-quality", type=float, default=0.55)
    ap.add_argument("--langs", default="en", help="comma-separated lang_pred keep-list")
    ap.add_argument("--near-dup-threshold", type=float, default=0.7)
    ap.add_argument("--no-near-dup", action="store_true")
    ap.add_argument("--exact-components", action="store_true",
                    help="exact CC clustering instead of pairwise keep-lower")
    ap.add_argument("--max-top2gram-frac", type=float, default=None,
                    help="drop docs whose top word-2-gram exceeds this fraction")
    ap.add_argument("--redact-pii", action="store_true")
    ap.add_argument("--sample-rates", default=None,
                    help="per-lang keep rates out of 100, e.g. en=60,fr=100")
    ap.add_argument("--sample-default-rate", type=int, default=0)
    ap.add_argument("--gopher", action="store_true",
                    help="drop docs failing the Gopher quality rules")
    ap.add_argument("--benchmark", default=None,
                    help="benchmark parquet (text column) for n-gram decontamination")
    ap.add_argument("--decontam-n", type=int, default=13)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        from invoice_ocr_reconciler_spark.session import get_spark

        spark = get_spark(app_name="curation")

    from invoice_ocr_reconciler_spark.operators.curation import curate_documents

    docs = spark.read.parquet(args.docs)
    rates = None
    if args.sample_rates:
        rates = {
            k: int(v)
            for k, v in (kv.split("=") for kv in args.sample_rates.split(","))
        }
    out = curate_documents(
        docs,
        min_quality=args.min_quality,
        langs=tuple(args.langs.split(",")),
        near_dup_threshold=args.near_dup_threshold,
        with_near_dup=not args.no_near_dup,
        near_dup_exact=args.exact_components,
        max_top2gram_frac=args.max_top2gram_frac,
        redact_pii=args.redact_pii,
        sample_rates=rates,
        sample_default_rate=args.sample_default_rate,
        gopher=args.gopher,
        benchmark=(spark.read.parquet(args.benchmark) if args.benchmark else None),
        decontam_n=args.decontam_n,
    )
    out["curated"].write.mode("overwrite").parquet(f"{args.out}/curated")
    stats = out["stats"].collect()[0].asDict()
    with open(f"{args.out.rstrip('/')}_stats.json", "w") as fh:
        json.dump(stats, fh, sort_keys=True)
    print(json.dumps(stats, sort_keys=True))


if __name__ == "__main__":
    main()
