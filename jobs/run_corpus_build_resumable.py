"""Checkpointed corpus-build job over a url_bucket=K pages layout.

spark-submit --py-files dist/invoice_ocr_reconciler_spark.zip \
    jobs/run_corpus_build_resumable.py --pages <bucketed parquet> \
    --out <dir> [--phase extract|finish|all] [--min-quality 0.55]
    [--langs en] [--n-shards 64] [--near-dup-exact | --no-near-dup]
    [--cores N]

Phase 'extract' (collapse -> extract -> NFC clean) commits per url bucket
to <out>/manifest — kill it anywhere and a rerun resumes exactly the
incomplete buckets (operators/build.py:build_corpus_resumable). Phase
'finish' runs the corpus-wide dedup/shard/report stages over the cleaned
buckets and writes <out>/docs + <out>/stats.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--pages", required=True, help="url_bucket=K parquet root")
    p.add_argument("--out", required=True)
    p.add_argument("--phase", default="all", choices=("extract", "finish", "all"))
    p.add_argument("--min-quality", type=float, default=0.55)
    p.add_argument("--langs", default="en")
    p.add_argument("--n-shards", type=int, default=64)
    p.add_argument("--near-dup-exact", action="store_true")
    p.add_argument("--no-near-dup", action="store_true")
    p.add_argument("--cores", type=int, default=None)
    args = p.parse_args()

    from invoice_ocr_reconciler_spark.operators.build import (
        build_corpus_resumable,
    )
    from invoice_ocr_reconciler_spark.session import get_spark

    spark = get_spark(app_name="corpus-build-resumable", cores=args.cores)
    out = build_corpus_resumable(
        spark,
        args.pages,
        args.out,
        min_quality=args.min_quality,
        langs=tuple(args.langs.split(",")),
        with_near_dup=not args.no_near_dup,
        near_dup_exact=args.near_dup_exact,
        n_shards=args.n_shards,
        phase=args.phase,
    )
    result: dict = {"phase": args.phase}
    if "run" in out:
        result["run"] = {
            "processed": sorted(out["run"]["processed"]),
            "skipped": sorted(out["run"]["skipped"]),
        }
    if "docs" in out:
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
        result["stats"] = stats
    print(json.dumps(result))


if __name__ == "__main__":
    main()
