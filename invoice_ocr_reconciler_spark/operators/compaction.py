"""Small-file compaction for parquet table directories.

The 100 TB operational problem this solves: incremental / streaming /
per-bucket writers (streaming/resume.py, sources/pages.py) accumulate
many small parquet files per partition directory; at web scale the
driver's file listing, the scan's task-per-file scheduling, and the
footer-open overhead come to dominate read cost long before the bytes
do (the classic "small files problem" — the maintenance job every table
format ships: Iceberg `rewrite_data_files`, Delta OPTIMIZE). This is
the plain-parquet batch analog, in two composable halves:

  - `plan_compaction`: pure metadata — list the leaf files, bin them
    with first-fit-decreasing into `target_bytes` bins per partition
    directory. No data is read; the plan is a DataFrame (inspectable,
    loggable, joinable with lineage) with one row per file:
    (partition_dir, file, bytes, bin, bin_bytes, n_bin_files).
    Deterministic: files sorted by (bytes DESC, name) before packing.
  - `compact_table`: executes — reads only partition dirs whose plan
    wants fewer files than exist, rewrites each with exactly the
    planned bin count (coalesce — a LOCAL merge, no shuffle: compaction
    must not pay an exchange to glue files together), and commits
    write-tmp + atomic os.replace per partition dir (the
    CheckpointManifest convention, streaming/resume.py:70 — a killed
    compaction leaves every partition either old or new, never mixed).
    Untouched partitions are never rewritten (no churn, resumable).

Driver-side file listing is a deliberate choice: the listing is
metadata (1 row per FILE, not per data row) — at 10^6 files that is
megabytes on the driver, and table formats keep exactly this metadata
in their manifests anyway.
"""

from __future__ import annotations

import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


@dataclass
class _FileInfo:
    partition_dir: str  # relative to table root ('' = unpartitioned root)
    name: str
    bytes: int


def _list_parquet_files(table_dir: str) -> list[_FileInfo]:
    out: list[_FileInfo] = []
    for root, _dirs, files in os.walk(table_dir):
        rel = os.path.relpath(root, table_dir)
        rel = "" if rel == "." else rel
        for f in files:
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                out.append(
                    _FileInfo(rel, f, os.path.getsize(os.path.join(root, f)))
                )
    return out


def _pack_ffd(sizes: list[tuple[str, int]], target: int) -> dict[str, int]:
    """First-fit-decreasing bin packing -> {name: bin}. A file larger
    than `target` gets its own bin (never split — parquet files are
    atomic units here)."""
    bins: list[int] = []  # remaining capacity per bin
    assign: dict[str, int] = {}
    for name, size in sorted(sizes, key=lambda t: (-t[1], t[0])):
        placed = False
        for i, rem in enumerate(bins):
            if size <= rem:
                bins[i] = rem - size
                assign[name] = i
                placed = True
                break
        if not placed:
            bins.append(max(target - size, 0))
            assign[name] = len(bins) - 1
    return assign


def plan_compaction(
    spark: SparkSession,
    table_dir: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
) -> DataFrame:
    """One row per data file with its assigned output bin; see module
    docstring. `needs_rewrite` marks partition dirs where packing
    reduces the file count."""
    files = _list_parquet_files(table_dir)
    by_dir: dict[str, list[_FileInfo]] = {}
    for fi in files:
        by_dir.setdefault(fi.partition_dir, []).append(fi)
    rows = []
    for pdir, infos in sorted(by_dir.items()):
        assign = _pack_ffd([(fi.name, fi.bytes) for fi in infos], target_bytes)
        n_bins = len(set(assign.values()))
        bin_bytes: dict[int, int] = {}
        bin_files: dict[int, int] = {}
        for fi in infos:
            b = assign[fi.name]
            bin_bytes[b] = bin_bytes.get(b, 0) + fi.bytes
            bin_files[b] = bin_files.get(b, 0) + 1
        for fi in sorted(infos, key=lambda x: x.name):
            b = assign[fi.name]
            rows.append(
                (
                    fi.partition_dir,
                    fi.name,
                    fi.bytes,
                    b,
                    bin_bytes[b],
                    bin_files[b],
                    n_bins < len(infos),
                )
            )
    schema = (
        "partition_dir string, file string, bytes long, bin int, "
        "bin_bytes long, n_bin_files int, needs_rewrite boolean"
    )
    return spark.createDataFrame(rows, schema)


def compact_table(
    spark: SparkSession,
    table_dir: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
) -> dict:
    """Execute `plan_compaction` in place. Returns
    {'rewritten_dirs', 'skipped_dirs', 'files_before', 'files_after'}."""
    plan = plan_compaction(spark, table_dir, target_bytes).collect()
    by_dir: dict[str, list] = {}
    for r in plan:
        by_dir.setdefault(r["partition_dir"], []).append(r)
    rewritten, skipped, before, after = [], [], 0, 0
    for pdir, rows in sorted(by_dir.items()):
        before += len(rows)
        n_bins = len({r["bin"] for r in rows})
        if not rows[0]["needs_rewrite"]:
            skipped.append(pdir)
            after += len(rows)
            continue
        src = os.path.join(table_dir, pdir) if pdir else table_dir
        tmp = f"{src}.__compact_tmp_{uuid.uuid4().hex[:8]}"
        # coalesce = local concatenation of input splits, no exchange
        spark.read.parquet(src).coalesce(n_bins).write.mode(
            "overwrite"
        ).parquet(tmp)
        old = f"{src}.__compact_old_{uuid.uuid4().hex[:8]}"
        os.replace(src, old)  # atomic swap-out
        os.replace(tmp, src)  # atomic swap-in
        shutil.rmtree(old)
        rewritten.append(pdir)
        # count what was actually written: the scan may have packed the
        # small inputs into fewer splits than planned bins (coalesce can
        # only reduce), which compacts even harder than the plan
        after += sum(
            1
            for f in os.listdir(src)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
    return {
        "rewritten_dirs": rewritten,
        "skipped_dirs": skipped,
        "files_before": before,
        "files_after": after,
    }
