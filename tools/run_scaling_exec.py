"""Scaling evidence with SEPARATE EXECUTOR JVMS (local-cluster mode).

`tools/run_scaling.py` measures N vs 4N as local[] thread counts inside one
JVM — a conservative analog that under-states real clusters (one GC, one
allocator, one shuffle service shared by all "executors"). Spark's
local-cluster[E, C, M] master launches E genuine executor PROCESSES with C
cores and M MB each: own JVM, own GC, own Python worker pool, shuffle over
local sockets. This is the closest in-sandbox shape to "N executors vs 4N
executors" the north rule asks for.

Usage: python tools/run_scaling_exec.py [n_pages] [n_ledger] [cores_per_exec]
Legs: N = 1 executor, 4N = 4 executors (same cores/memory per executor).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.run_scaling import (  # noqa: E402
    LEDGER_PATH,
    OUT,
    PAGES_PATH,
    build_input,
    warm_page_cache,
)

EXEC_MEM_MB = 10240


def _leg(executors: int, cores_per: int, n_pages: int) -> dict:
    from invoice_ocr_reconciler_spark.pipeline import run_pipeline
    from invoice_ocr_reconciler_spark.session import get_spark

    spark = get_spark(
        app_name=f"scaling-exec-{executors}",
        cores=cores_per,
        executors=executors,
        executor_mem_mb=EXEC_MEM_MB,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    pages = spark.read.parquet(PAGES_PATH)
    ledger = spark.read.parquet(LEDGER_PATH)
    run_pipeline(pages.limit(2000), ledger)["results"].count()  # steady-state
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
        "executors": executors,
        "cores_per_executor": cores_per,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_pages / wall, 1),
        "n_results": n_results,
        "statuses": statuses,
    }


def run_once(executors: int, cores_per: int, n_pages: int) -> dict:
    proc = subprocess.run(
        [
            sys.executable, os.path.abspath(__file__), "--leg",
            str(executors), str(cores_per), str(n_pages),
        ],
        capture_output=True, text=True, check=True,
    )
    last = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(last)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--leg":
        print(json.dumps(_leg(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))))
        return
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
    n_ledger = int(sys.argv[2]) if len(sys.argv) > 2 else 12_000
    cores_per = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    os.makedirs(OUT, exist_ok=True)
    if not os.path.exists(PAGES_PATH) or not os.path.exists(LEDGER_PATH):
        build_input(n_pages, n_ledger)
    gib = warm_page_cache(PAGES_PATH, LEDGER_PATH)
    print(f"page cache warmed: {gib:.1f} GiB", flush=True)
    reps = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "2"))

    def best_of(executors: int) -> dict:
        runs = []
        for i in range(reps):
            warm_page_cache(PAGES_PATH, LEDGER_PATH)
            r = run_once(executors, cores_per, n_pages)
            print(
                f"leg executors={executors}x{cores_per} rep={i + 1}/{reps}: "
                f"{r['wall_sec']}s ({r['docs_per_sec']} docs/s)",
                flush=True,
            )
            runs.append(r)
        best = max(runs, key=lambda r: r["docs_per_sec"])
        best["all_reps_wall_sec"] = [r["wall_sec"] for r in runs]
        return best

    rn = best_of(1)
    r4n = best_of(4)
    assert rn["n_results"] == r4n["n_results"], "output drift across executors!"
    assert rn["statuses"] == r4n["statuses"], "status drift across executors!"
    eff = (r4n["docs_per_sec"] / rn["docs_per_sec"]) / 4
    results = {
        "mode": "local-cluster (separate executor JVMs)",
        "n_pages": n_pages,
        "n_ledger": n_ledger,
        "N": rn,
        "4N": r4n,
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
