"""Crawl indexing job: pages parquet -> the crawl-ops control tables.

spark-submit --py-files dist/invoice_ocr_reconciler_spark.zip \
    jobs/run_crawl_index.py --pages <parquet> --out <dir> \
    [--merge-into <existing-cdx-dir>] [--trap-share 0.5] \
    [--trap-min-urls 100] [--mirror-cap 64]

Writes under <out>/:
  cdx/            SURT-keyed capture index, range-sorted (surt_key, ts14)
                  — merged with --merge-into's index when given
  host_profile/   per-host dup/volume/quality table (policy input)
  url_templates/  per-host path templates with trap flags
  mirror_pairs/   cross-host mirror evidence (capped pair generation)
  mirror_clusters/ transitive mirror groups (host -> cluster_rep)
  stats.json      row counts per table

One pages scan feeds the CDX build; the analysis tables each run their
own scan of the (column-pruned) inputs — at 10^12 rows schedule them as
separate stages of one job rather than separate jobs, so the scan cache
and the shuffle service amortize across them.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--pages", required=True, help="parquet with url/warc_ts/html[/text]")
    p.add_argument("--out", required=True)
    p.add_argument("--merge-into", default=None, help="existing cdx parquet dir")
    p.add_argument("--trap-share", type=float, default=0.5)
    p.add_argument("--trap-min-urls", type=int, default=100)
    p.add_argument("--mirror-cap", type=int, default=64)
    p.add_argument("--cores", type=int, default=None)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from invoice_ocr_reconciler_spark.functions.urls import (
        host_of_url_col,
        url_templates,
    )
    from invoice_ocr_reconciler_spark.operators.graph import (
        mirror_clusters,
        mirror_hosts,
    )
    from invoice_ocr_reconciler_spark.operators.profile import host_profile
    from invoice_ocr_reconciler_spark.session import get_spark
    from invoice_ocr_reconciler_spark.sources.cdx import cdx_index, cdx_merge

    spark = get_spark(app_name="crawl-index", cores=args.cores)
    pages = spark.read.parquet(args.pages)
    stats: dict[str, int] = {}

    idx = cdx_index(pages)
    if args.merge_into:
        idx = cdx_merge(spark.read.parquet(args.merge_into), idx)
    idx.write.mode("overwrite").parquet(f"{args.out}/cdx")
    stats["cdx"] = spark.read.parquet(f"{args.out}/cdx").count()

    tmpl = url_templates(
        pages,
        trap_share=args.trap_share,
        trap_min_urls=args.trap_min_urls,
    )
    tmpl.write.mode("overwrite").parquet(f"{args.out}/url_templates")
    stats["url_templates"] = spark.read.parquet(f"{args.out}/url_templates").count()

    # host-keyed text analyses want a text column; fall back to the
    # lenient binary->string view when the pages carry only raw payloads
    text_col = (
        F.col("text")
        if "text" in pages.columns
        else F.col("html").cast("string")
    )
    hosted = pages.select(
        host_of_url_col(F.col("url")).alias("host"), text_col.alias("text")
    )
    host_profile(hosted).write.mode("overwrite").parquet(
        f"{args.out}/host_profile"
    )
    stats["host_profile"] = spark.read.parquet(f"{args.out}/host_profile").count()

    pairs = mirror_hosts(hosted, max_hosts_per_fp=args.mirror_cap).persist()
    pairs.write.mode("overwrite").parquet(f"{args.out}/mirror_pairs")
    stats["mirror_pairs"] = pairs.count()
    mirror_clusters(pairs).write.mode("overwrite").parquet(
        f"{args.out}/mirror_clusters"
    )
    stats["mirror_clusters"] = spark.read.parquet(
        f"{args.out}/mirror_clusters"
    ).count()

    with open(f"{args.out}/stats.json", "w") as fh:
        json.dump(stats, fh, indent=2, sort_keys=True)
    print(json.dumps(stats, sort_keys=True))


if __name__ == "__main__":
    main()
