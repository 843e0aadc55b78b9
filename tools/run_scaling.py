"""Scaling-efficiency evidence (BASELINE.md protocol): same job, same input,
two parallelism levels (local[8] = N, local[32] = 4N) -> BENCH/BASELINE.md.

Usage: python tools/run_scaling.py [n_pages] [n_ledger]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAGES_PATH = "/tmp/bench_pages_parquet"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH")


def build_input(n_pages: int) -> None:
    from invoice_ocr_reconciler_spark import datagen
    from invoice_ocr_reconciler_spark.session import get_spark
    from invoice_ocr_reconciler_spark.sources.pages import write_pages_bucketed

    spark = get_spark(app_name="scaling-datagen", cores=32,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    write_pages_bucketed(datagen.pages_df(spark, n_pages, partitions=64), PAGES_PATH)
    spark.stop()


def run_once(cores: int, n_pages: int, n_ledger: int) -> dict:
    from invoice_ocr_reconciler_spark import datagen
    from invoice_ocr_reconciler_spark.pipeline import run_pipeline
    from invoice_ocr_reconciler_spark.session import get_spark

    spark = get_spark(app_name=f"scaling-{cores}", cores=cores,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    pages = spark.read.parquet(PAGES_PATH)
    ledger = datagen.ledger_df(spark, n_ledger, n_pages)
    t0 = time.monotonic()
    out = run_pipeline(pages, ledger)
    n_results = out["results"].count()
    statuses = {
        r["match_status"]: r["count"]
        for r in out["results"].groupBy("match_status").count().collect()
    }
    wall = time.monotonic() - t0
    spark.stop()
    return {
        "cores": cores,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_pages / wall, 1),
        "n_results": n_results,
        "statuses": statuses,
    }


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    n_ledger = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    os.makedirs(OUT, exist_ok=True)

    if not os.path.exists(PAGES_PATH):
        build_input(n_pages)

    r8 = run_once(8, n_pages, n_ledger)
    r32 = run_once(32, n_pages, n_ledger)
    assert r8["n_results"] == r32["n_results"], "output drift across parallelism!"
    assert r8["statuses"] == r32["statuses"], "status drift across parallelism!"
    eff = (r32["docs_per_sec"] / r8["docs_per_sec"]) / 4

    results = {"n_pages": n_pages, "n_ledger": n_ledger, "N": r8, "4N": r32,
               "scaling_efficiency": round(eff, 3)}
    print(json.dumps(results))

    with open(os.path.join(OUT, "BASELINE.md"), "w") as fh:
        fh.write(f"""# BENCH/BASELINE — measured results

## Scaling efficiency (north_rule: >= 0.8 from N to 4N)

Protocol per BASELINE.md: the full extract+reconcile pipeline on the same
{n_pages:,}-page deterministic corpus (written once to parquet, hash-bucketed
on url), at two parallelism levels in this sandbox (no real cluster):

| config | cores | wall (s) | docs/sec |
|---|---|---|---|
| N  (local[8])  | 8  | {r8['wall_sec']} | {r8['docs_per_sec']} |
| 4N (local[32]) | 32 | {r32['wall_sec']} | {r32['docs_per_sec']} |

**Scaling efficiency = (throughput_4N / throughput_N) / 4 = {eff:.3f}**

Output identity across parallelism: both runs produced {r8['n_results']:,}
result rows with identical per-status counts {r8['statuses']}
(the determinism contract; also enforced by tests/test_determinism.py).

Ledger: {n_ledger:,} records. Local mode caveat: a single JVM on one host —
shuffle is via local disk, so this under-states network-shuffle costs and
over-states small-core throughput vs a real 4N-executor cluster; the job is
embarrassingly parallel in its dominant stage (extraction mapInPandas), which
is exactly the stage that scales linearly with executors.

## Per-round bench

`python bench.py` prints the driver-contract JSON line (headline query wall
times at $SPARK_GRAFT_SF_DIR). The flagship metric is
`extract_reconcile_docs_per_sec`.
""")
    print(f"wrote {OUT}/BASELINE.md")


if __name__ == "__main__":
    main()
