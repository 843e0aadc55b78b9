"""End-to-end corpus build job: crawl parquet -> training-ready shards.

spark-submit --py-files dist/invoice_ocr_reconciler_spark.zip \
    jobs/run_corpus_build.py --pages <parquet> --out <dir> \
    [--blocklist domains.txt] [--min-quality 0.55] [--langs en]
    [--token-budget N] [--n-shards 64] [--gopher] [--line-dedup-max-df 3]
    [--near-dup-exact | --no-near-dup]

Writes <out>/docs (parquet, partitioned by shard, pos-ordered within) and
<out>/stats.json (the reconciling per-stage counters + health report).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--pages", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--blocklist", default=None, help="text file, one domain per line")
    p.add_argument("--min-quality", type=float, default=0.55)
    p.add_argument("--langs", default="en", help="comma-separated")
    p.add_argument("--token-budget", type=int, default=None)
    p.add_argument("--n-shards", type=int, default=64)
    p.add_argument("--gopher", action="store_true")
    p.add_argument("--line-dedup-max-df", type=int, default=None)
    p.add_argument("--near-dup-exact", action="store_true")
    p.add_argument("--no-near-dup", action="store_true")
    p.add_argument("--cores", type=int, default=None)
    args = p.parse_args()

    from invoice_ocr_reconciler_spark.operators.build import build_corpus
    from invoice_ocr_reconciler_spark.session import get_spark

    spark = get_spark(app_name="corpus-build", cores=args.cores)
    pages = spark.read.parquet(args.pages)
    blocklist = None
    if args.blocklist:
        with open(args.blocklist) as fh:
            domains = [(line.strip(),) for line in fh if line.strip()]
        blocklist = spark.createDataFrame(domains, "domain string")

    out = build_corpus(
        pages,
        blocklist=blocklist,
        min_quality=args.min_quality,
        langs=tuple(args.langs.split(",")),
        with_near_dup=not args.no_near_dup,
        near_dup_exact=args.near_dup_exact,
        gopher=args.gopher,
        line_dedup_max_df=args.line_dedup_max_df,
        token_budget=args.token_budget,
        n_shards=args.n_shards,
    )
    (
        out["docs"]
        .repartition("shard")
        .sortWithinPartitions("pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(os.path.join(args.out, "docs"))
    )
    stats = out["stats"].collect()[0].asDict()
    with open(os.path.join(args.out, "stats.json"), "w") as fh:
        json.dump(stats, fh, indent=2)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
