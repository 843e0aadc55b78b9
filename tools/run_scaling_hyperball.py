"""Scaling-efficiency evidence for the iterative graph class
(operators/hyperball.py) — per-round edge-join + partial-agg max-merge,
the same relational shape as pagerank/trust_rank, measured end to end:
same graph, N vs 4N cores, throughput + efficiency printed as one JSON
record. Output is exact-deterministic, so the harness also asserts the
full sketch checksum (count, sum n_regs, sum s_scaled) is IDENTICAL
across parallelism levels — the north-rule invariant for this op class.

Usage: python tools/run_scaling_hyperball.py [n_nodes] [N_cores]

The graph is the synthetic modular-outlink family the link-graph
queries use (two modular edges per non-dangling node + a hub), scaled
to n_nodes — deterministic, no RNG, built once and reused by both legs.
Each leg runs in its own process (getOrCreate pins the first master).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EDGES = "/tmp/hyperball_scaling_edges"

_LEG_SRC = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from invoice_ocr_reconciler_spark.session import get_spark
from invoice_ocr_reconciler_spark.operators.hyperball import hyperball
cores = {cores}
spark = get_spark(app_name="hyperball-scaling-%d" % cores, cores=cores,
                  shuffle_partitions=max(2 * cores, 8),
                  extra_conf={{"spark.ui.showConsoleProgress": "false"}})
edges = spark.read.parquet({edges!r})
walls = []
chk = None
for _ in range(2):
    spark.catalog.clearCache()
    t0 = time.monotonic()
    out = hyperball(edges, n_iter=3)
    row = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_regs").alias("r"),
        F.sum("s_scaled").alias("s"),
    ).collect()[0]
    walls.append(time.monotonic() - t0)
    chk = [int(row["n"]), int(row["r"]), int(row["s"])]
print(json.dumps({{"cores": cores, "wall": min(walls), "checksum": chk}}))
"""


def build_graph(n_nodes: int) -> None:
    from pyspark.sql import functions as F

    from invoice_ocr_reconciler_spark.session import get_spark

    spark = get_spark(
        app_name="hyperball-scaling-datagen",
        cores=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    ids = spark.range(n_nodes).select(F.col("id").alias("i"))
    i = F.col("i")
    base = ids.filter(i % 5 != 0)
    e1 = base.select(i.alias("src"), ((i * 7 + 1) % n_nodes).alias("dst"))
    e2 = base.select(i.alias("src"), ((i * 13 + 2) % n_nodes).alias("dst"))
    e3 = ids.filter(i % 10 == 3).select(
        i.alias("src"), F.lit(0).cast("long").alias("dst")
    )
    e1.union(e2).union(e3).repartition(64).write.mode("overwrite").parquet(
        EDGES
    )
    spark.stop()


def run_leg(cores: int) -> dict:
    src = _LEG_SRC.format(repo=REPO, cores=cores, edges=EDGES)
    proc = subprocess.run(
        [sys.executable, "-c", src],
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_cores = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    t0 = time.monotonic()
    build_graph(n_nodes)
    legs = [run_leg(n_cores), run_leg(4 * n_cores)]
    assert legs[0]["checksum"] == legs[1]["checksum"], "output differs"
    eff = (legs[0]["wall"] / legs[1]["wall"]) / 4.0
    rec = {
        "job": "hyperball",
        "n_nodes": n_nodes,
        "legs": legs,
        "scaling_efficiency": round(eff, 3),
        "total_harness_sec": round(time.monotonic() - t0, 1),
    }
    print(json.dumps(rec, sort_keys=True))


if __name__ == "__main__":
    main()
