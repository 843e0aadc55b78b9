"""Scaling-efficiency evidence for the exact set-similarity join
(operators/setjoin.py) — the shuffle-heaviest of the round-2 operators:
same corpus, N vs 4N cores, throughput + efficiency appended to the
measurement record.

Usage: python tools/run_scaling_setjoin.py [n_docs] [N_cores]

The corpus is the sf0.1 documents table tiled with md5-salted variant
texts to the requested size (deterministic — no RNG), so the join does
real shuffle work (signatures, postings exchange, verify joins) at a
scale where fixed session overhead is amortized. Each leg runs in its
own process (getOrCreate pins the first master).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORPUS = "/tmp/setjoin_scaling_corpus"

_LEG_SRC = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from invoice_ocr_reconciler_spark.session import get_spark
from invoice_ocr_reconciler_spark.operators.setjoin import (
    prefix_filtered_jaccard_join,
)
cores = {cores}
spark = get_spark(app_name="setjoin-scaling-%d" % cores, cores=cores,
                  shuffle_partitions=max(2 * cores, 8),
                  extra_conf={{"spark.ui.showConsoleProgress": "false"}})
docs = spark.read.parquet({corpus!r})
walls = []
n = None
for _ in range(2):
    spark.catalog.clearCache()
    t0 = time.monotonic()
    n = prefix_filtered_jaccard_join(
        docs, tau_num=7, tau_den=10, gram_n=3
    ).count()
    walls.append(time.monotonic() - t0)
print(json.dumps({{"cores": cores, "wall": min(walls), "pairs": n}}))
"""


def build_corpus(n_docs: int) -> None:
    from pyspark.sql import functions as F

    from invoice_ocr_reconciler_spark.session import get_spark

    spark = get_spark(
        app_name="setjoin-scaling-datagen",
        cores=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n_base = base.count()
    tiles = (n_docs + n_base - 1) // n_base
    # tile k: ids shift by k*1e6; every 4th doc of each tile drops its
    # last 2 tokens (planted near-dups per tile, like q_setjoin_prefix)
    parts = []
    for k in range(tiles):
        sp = F.split(F.col("text"), " ")
        text_k = F.when(
            F.col("doc_id") % 4 == 0,
            F.array_join(
                F.slice(
                    sp, 1, F.greatest(F.size(sp) - 2, F.lit(0)).cast("int")
                ),
                " ",
            ),
        ).otherwise(
            # salt non-variant tiles so tiles aren't exact clones
            F.concat_ws(
                " ",
                F.col("text"),
                F.md5(F.concat(F.lit(f"tile{k}:"), F.col("doc_id").cast("string"))),
            )
        )
        parts.append(
            base.select(
                (F.col("doc_id") + k * 1_000_000).alias("doc_id"),
                (text_k if k else F.col("text")).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out = out.limit(n_docs).repartition(64)
    out.write.mode("overwrite").parquet(CORPUS)
    spark.stop()


def run_leg(cores: int) -> dict:
    src = _LEG_SRC.format(repo=REPO, cores=cores, corpus=CORPUS)
    proc = subprocess.run(
        [sys.executable, "-c", src],
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
    n_cores = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    t0 = time.monotonic()
    build_corpus(n_docs)
    legs = [run_leg(n_cores), run_leg(4 * n_cores)]
    assert legs[0]["pairs"] == legs[1]["pairs"], "output differs across cores"
    eff = (legs[0]["wall"] / legs[1]["wall"]) / 4.0
    rec = {
        "job": "setjoin_prefix",
        "n_docs": n_docs,
        "legs": legs,
        "scaling_efficiency": round(eff, 3),
        "total_harness_sec": round(time.monotonic() - t0, 1),
    }
    print(json.dumps(rec, sort_keys=True))


if __name__ == "__main__":
    main()
