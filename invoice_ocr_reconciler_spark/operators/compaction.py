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
    (partition_dir, file, bytes, bin, bin_bytes, n_bin_files). Hidden
    and Spark-internal entries (`_temporary`, `_SUCCESS`, dot-files,
    in-flight compaction temps) are pruned exactly like Spark's own
    path filter — abandoned task output must never be compacted into
    the table. Deterministic: files sorted (bytes DESC, name) first.
  - `compact_table`: executes — rewrites ONLY LEAF partition dirs whose
    plan wants fewer files than exist. A dir with data-bearing
    subdirectories is never rewritten (nested layouts keep data in
    leaves; rewriting an inner node would suck child partitions into it
    via partition discovery), and the rewrite reads the planned FILES
    explicitly, never the directory. Each rewrite merges with
    `coalesce` (a LOCAL merge — compaction must not pay an exchange to
    glue files together) into a DOT-PREFIXED temp dir (invisible to
    Spark readers), then commits with two renames: src -> hidden old,
    temp -> src. A crash at ANY point leaves readers seeing either the
    old or the new files, never a mix — and the next `compact_table`
    run repairs the one non-atomic window (src swapped out, temp not
    yet swapped in) by restoring the hidden old dir; completed-swap
    leftovers and dead temps are garbage-collected. Untouched
    partitions are never rewritten (no churn, resumable).

Driver-side file listing is a deliberate choice: the listing is
metadata (1 row per FILE, not per data row) — at 10^6 files that is
megabytes on the driver, and table formats keep exactly this metadata
in their manifests anyway.
"""

from __future__ import annotations

import os
import re
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024

# hidden commit-artifact names: .{basename}.__cold_{hex} (swapped-out old
# data) and .{basename}.__ctmp_{hex} (in-flight rewrite) — dot-prefixed so
# Spark's path filter ignores them mid-commit
_ARTIFACT_RE = re.compile(r"^\.(?P<base>.+)\.__c(?P<kind>old|tmp)_[0-9a-f]+$")


@dataclass
class _FileInfo:
    partition_dir: str  # relative to table root ('' = unpartitioned root)
    name: str
    bytes: int


def _is_hidden(name: str) -> bool:
    return name.startswith((".", "_"))


def _list_parquet_files(table_dir: str) -> list[_FileInfo]:
    out: list[_FileInfo] = []
    for root, dirs, files in os.walk(table_dir):
        # prune hidden/internal dirs (Spark _temporary, our commit temps)
        dirs[:] = [d for d in dirs if not _is_hidden(d)]
        rel = os.path.relpath(root, table_dir)
        rel = "" if rel == "." else rel
        for f in files:
            if f.endswith(".parquet") and not _is_hidden(f):
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


def _recover_interrupted(table_dir: str) -> list[str]:
    """Repair artifacts a killed compact_table left behind; returns the
    repaired relative dirs. Temps are always dead (a temp is renamed
    away the instant it is complete and committed); an old dir whose
    visible sibling is missing marks the one crash window between the
    two commit renames — restore it; an old dir whose sibling exists is
    a completed swap's leftover — delete it."""
    repaired: list[str] = []
    roots = [os.path.dirname(os.path.abspath(table_dir)) or os.sep]
    for root, dirs, _files in os.walk(table_dir):
        dirs[:] = [d for d in dirs if not _ARTIFACT_RE.match(d)]
        roots.append(root)
    for root in roots:
        for name in sorted(os.listdir(root)):
            m = _ARTIFACT_RE.match(name)
            if not m:
                continue
            full = os.path.join(root, name)
            target = os.path.join(root, m.group("base"))
            if m.group("kind") == "tmp":
                shutil.rmtree(full)
            elif not os.path.exists(target):
                os.replace(full, target)
                repaired.append(os.path.relpath(target, table_dir))
            else:
                shutil.rmtree(full)
    return repaired


def compact_table(
    spark: SparkSession,
    table_dir: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
) -> dict:
    """Execute `plan_compaction` in place (leaf dirs only — see module
    docstring). Returns {'rewritten_dirs', 'skipped_dirs',
    'recovered_dirs', 'files_before', 'files_after'}."""
    recovered = _recover_interrupted(table_dir)
    plan = plan_compaction(spark, table_dir, target_bytes).collect()
    by_dir: dict[str, list] = {}
    for r in plan:
        by_dir.setdefault(r["partition_dir"], []).append(r)
    # a dir is a leaf iff no other planned dir nests strictly under it
    non_leaf = {
        p
        for p in by_dir
        for q in by_dir
        if q != p and (p == "" or q.startswith(p + os.sep))
    }
    rewritten, skipped, before, after = [], [], 0, 0
    for pdir, rows in sorted(by_dir.items()):
        before += len(rows)
        n_bins = len({r["bin"] for r in rows})
        if not rows[0]["needs_rewrite"] or pdir in non_leaf:
            skipped.append(pdir)
            after += len(rows)
            continue
        src = os.path.join(table_dir, pdir) if pdir else table_dir
        parent, base = os.path.dirname(src), os.path.basename(src)
        token = uuid.uuid4().hex[:8]
        tmp = os.path.join(parent, f".{base}.__ctmp_{token}")
        old = os.path.join(parent, f".{base}.__cold_{token}")
        # read the PLANNED FILES explicitly — never the directory, so
        # partition discovery cannot pull nested dirs into the rewrite
        paths = [os.path.join(src, r["file"]) for r in rows]
        # coalesce = local concatenation of input splits, no exchange
        spark.read.parquet(*paths).coalesce(n_bins).write.mode(
            "overwrite"
        ).parquet(tmp)
        os.replace(src, old)  # swap-out (readers now see nothing here)
        os.replace(tmp, src)  # swap-in (readers see the new files)
        # the rewrite replaces exactly the PLANNED data files: carry any
        # other entries the old dir held (Spark _temporary leftovers,
        # stray hidden files — nested DATA dirs can't appear here, the
        # leaf-only guard excluded those dirs entirely) into the new dir
        # before discarding the old one
        planned = {r["file"] for r in rows}
        for entry in os.listdir(old):
            dst = os.path.join(src, entry)
            if entry not in planned and not os.path.exists(dst):
                os.replace(os.path.join(old, entry), dst)
        shutil.rmtree(old)
        rewritten.append(pdir)
        # count what was actually written: the scan may have packed the
        # small inputs into fewer splits than planned bins (coalesce can
        # only reduce), which compacts even harder than the plan
        after += sum(
            1
            for f in os.listdir(src)
            if f.endswith(".parquet") and not _is_hidden(f)
        )
    return {
        "rewritten_dirs": rewritten,
        "skipped_dirs": skipped,
        "recovered_dirs": recovered,
        "files_before": before,
        "files_after": after,
    }
