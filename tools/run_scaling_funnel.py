"""Scaling-efficiency evidence for the single-shuffle fold family
(operators/events.py:funnel_summary — groupBy(user) + codegen array
fold), the operator class added in the round-2 continuation session.

Usage: python tools/run_scaling_funnel.py [n_events] [N_cores]

Deterministic corpus (no RNG): n_events events over n_events/80 users,
timestamps placed by a Weyl-style integer mix over a 30-day span,
event types hash-assigned over the 5-type alphabet. Each leg runs in
its own process (getOrCreate pins the first master); best-of-2 walls;
the determinism invariant is the full 4-row funnel table (counts must
be IDENTICAL across parallelism levels or the run fails loudly).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORPUS = "/tmp/funnel_scaling_corpus"

_LEG_SRC = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from invoice_ocr_reconciler_spark.session import get_spark
from invoice_ocr_reconciler_spark.operators.events import funnel_summary
cores = {cores}
executors = {executors}
kw = dict(cores=cores,
          shuffle_partitions=max(2 * cores * max(executors, 1), 8),
          extra_conf={{"spark.ui.showConsoleProgress": "false"}})
if executors:
    kw.update(executors=executors, executor_mem_mb=8192)
spark = get_spark(app_name="funnel-scaling-%d-%d" % (executors, cores), **kw)
ev = spark.read.parquet({corpus!r})
walls, rows = [], None
for _ in range(2):
    spark.catalog.clearCache()
    t0 = time.monotonic()
    out = funnel_summary(
        ev, ["signup", "view", "click", "purchase"],
        window_minutes=1440.0,
    ).collect()
    walls.append(time.monotonic() - t0)
    rows = sorted((r.stage, r.step, r.n_users) for r in out)
print(json.dumps({{"cores": cores, "wall": min(walls), "rows": rows}}))
"""


def build_corpus(n_events: int) -> None:
    from pyspark.sql import functions as F

    from invoice_ocr_reconciler_spark.session import get_spark

    spark = get_spark(
        app_name="funnel-scaling-datagen",
        cores=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    n_users = max(n_events // 80, 1)
    types = F.array(
        F.lit("signup"), F.lit("view"), F.lit("click"),
        F.lit("purchase"), F.lit("error"),
    )
    df = (
        spark.range(n_events)
        .select(
            F.col("id").alias("event_id"),
            F.pmod(F.col("id"), F.lit(n_users)).alias("user_id"),
            F.timestamp_seconds(
                F.lit(1704067200).cast("long")
                + F.pmod(
                    F.col("id") * F.lit(2654435761),
                    F.lit(30 * 86400),
                ).cast("long")
            ).cast("timestamp_ntz").alias("ts"),
            F.element_at(
                types,
                (F.pmod(F.xxhash64(F.col("id")), F.lit(5)) + 1).cast("int"),
            ).alias("event_type"),
        )
    )
    df.write.mode("overwrite").parquet(CORPUS)
    spark.stop()


def run_leg(cores: int, executors: int = 0) -> dict:
    src = _LEG_SRC.format(
        repo=REPO, cores=cores, executors=executors, corpus=CORPUS
    )
    out = subprocess.run(
        [sys.executable, "-c", src],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    n_cores = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    # --exec: N = 1 executor vs 4N = 4 executor JVMS (n_cores each) —
    # separate GC/allocator per executor, the faithful cluster proxy
    # (tools/run_scaling_exec.py rationale); default stays local[] threads
    exec_mode = "--exec" in sys.argv
    t0 = time.monotonic()
    build_corpus(n_events)
    print(f"corpus built in {time.monotonic() - t0:.1f}s", file=sys.stderr)
    if exec_mode:
        small = run_leg(n_cores, executors=1)
        big = run_leg(n_cores, executors=4)
    else:
        small = run_leg(n_cores)
        big = run_leg(4 * n_cores)
    if small["rows"] != big["rows"]:
        raise SystemExit(
            f"DETERMINISM VIOLATION: {small['rows']} != {big['rows']}"
        )
    eff = small["wall"] / (4 * big["wall"])
    print(json.dumps({
        "op": "funnel_summary",
        "mode": "executor-jvms" if exec_mode else "threads",
        "n_events": n_events,
        "N": n_cores,
        "wall_N": round(small["wall"], 2),
        "wall_4N": round(big["wall"], 2),
        "events_per_sec_N": round(n_events / small["wall"]),
        "events_per_sec_4N": round(n_events / big["wall"]),
        "scaling_efficiency": round(eff, 3),
        "funnel_rows_identical": True,
    }))


if __name__ == "__main__":
    main()
