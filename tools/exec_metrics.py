"""Executed-metrics collection via the Spark UI REST API.

Static plan audits (tools/plan_audit.py) prove a plan has no cartesian
products or stray Python nodes, but cannot see RUNTIME pathologies:
superlinear shuffle growth, or one straggler partition doing 50x the
median work. This module runs a query under a job group, then reads the
stage metrics the UI REST API exposes for exactly that query's jobs:

- total shuffle read/write bytes (the scale currency — a query whose
  shuffle bytes grow faster than its input is the 100-TB red flag),
- per-stage task-level skew: max/median shuffle-read bytes and max/median
  task time across tasks (taskSummary quantiles), the straggler signal.

Used by tools/scale_rehearsal.py (sf scaling exponents) and the
executed-metrics audit gate (tests/test_exec_audit.py).
"""

from __future__ import annotations

import json
import time
import urllib.request
from dataclasses import dataclass, field


def _get(url: str):
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read().decode())


@dataclass
class QueryMetrics:
    name: str
    wall_sec: float
    rows: int
    shuffle_read_bytes: int
    shuffle_write_bytes: int
    max_task_skew: float  # max over stages of max/median task time
    max_shuffle_skew: float  # max over stages of max/median shuffle-read
    n_stages: int
    stages: list = field(default_factory=list)


class ExecMetrics:
    """Run callables producing DataFrames; collect per-query stage metrics.

    The SparkSession must have the UI enabled (spark.ui.enabled=true);
    pass extra_conf={"spark.ui.enabled": "true"} to get_spark.
    """

    def __init__(self, spark):
        self.spark = spark
        self.base = spark.sparkContext.uiWebUrl
        if not self.base:
            raise RuntimeError(
                "Spark UI disabled — build the session with "
                'extra_conf={"spark.ui.enabled": "true"}'
            )
        app = _get(f"{self.base}/api/v1/applications")[0]["id"]
        self.api = f"{self.base}/api/v1/applications/{app}"

    def _stages_for_group(self, group: str) -> list[int]:
        jobs = _get(f"{self.api}/jobs")
        sids: list[int] = []
        for j in jobs:
            if j.get("jobGroup") == group:
                sids.extend(j.get("stageIds", []))
        return sorted(set(sids))

    def _stage_metrics(self, sid: int) -> dict | None:
        try:
            attempts = _get(f"{self.api}/stages/{sid}")
        except Exception:
            return None
        done = [a for a in attempts if a.get("status") == "COMPLETE"]
        if not done:
            return None
        st = done[-1]
        out = {
            "stage_id": sid,
            "shuffle_read": int(st.get("shuffleReadBytes", 0)),
            "shuffle_write": int(st.get("shuffleWriteBytes", 0)),
            "num_tasks": int(st.get("numCompleteTasks", 0)),
            "task_skew": 1.0,
            "shuffle_skew": 1.0,
        }
        # task quantiles: [min, median, max]
        if out["num_tasks"] >= 2:
            try:
                ts = _get(
                    f"{self.api}/stages/{sid}/{st['attemptId']}/taskSummary"
                    "?quantiles=0.0,0.5,1.0"
                )
                rt = ts.get("executorRunTime") or []
                if len(rt) == 3 and rt[1] > 0:
                    out["task_skew"] = rt[2] / rt[1]
                srm = (ts.get("shuffleReadMetrics") or {}).get(
                    "readBytes"
                ) or []
                if len(srm) == 3 and srm[1] > 0:
                    out["shuffle_skew"] = srm[2] / srm[1]
            except Exception:
                pass
        return out

    def run(self, name: str, fn) -> QueryMetrics:
        """fn() -> DataFrame; executes .count() under a job group."""
        sc = self.spark.sparkContext
        group = f"exec-metrics:{name}:{time.time_ns()}"
        sc.setJobGroup(group, name, interruptOnCancel=False)
        t0 = time.monotonic()
        try:
            rows = fn().count()
        finally:
            sc.setJobGroup(None, None)
        wall = time.monotonic() - t0
        stages = [
            m
            for sid in self._stages_for_group(group)
            if (m := self._stage_metrics(sid)) is not None
        ]
        return QueryMetrics(
            name=name,
            wall_sec=round(wall, 3),
            rows=rows,
            shuffle_read_bytes=sum(s["shuffle_read"] for s in stages),
            shuffle_write_bytes=sum(s["shuffle_write"] for s in stages),
            max_task_skew=round(
                max([s["task_skew"] for s in stages] or [1.0]), 2
            ),
            max_shuffle_skew=round(
                max([s["shuffle_skew"] for s in stages] or [1.0]), 2
            ),
            n_stages=len(stages),
            stages=stages,
        )
