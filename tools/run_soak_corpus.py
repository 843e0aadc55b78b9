"""Full-corpus soak: 1.2M-page resumable corpus build with a REAL mid-run
kill (round-4 verdict item 3).

Protocol:
  1. build the 1.2M-page bucketed input (tools/run_scaling.build_input —
     the same corpus the executor-scaling legs use; reused if present);
  2. leg A: jobs/run_corpus_build_resumable.py --phase extract in a child
     process, SIGKILL'd after --kill-after seconds (default 150) — a real
     kill mid-flight, not a cooperative stop;
  3. snapshot the manifest (committed buckets + attempt counters);
  4. leg B: the same job with --phase all — it must resume exactly the
     incomplete buckets (leg-A commits keep attempt == 1) and finish the
     corpus-wide dedup/shard/report stages;
  5. assertions: disjoint recompute, all buckets complete, and the stats
     row reconciles (n_pages_in == every drop counter + n_final);
  6. prints one JSON line with the soak numbers (phase walls, docs/sec,
     per-bucket rows/bytes spread from the manifest lineage).

Usage: python tools/run_soak_corpus.py [n_pages] [--kill-after SEC]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.run_scaling import PAGES_PATH, build_input, warm_page_cache  # noqa: E402

OUT_ROOT = "/tmp/soak_corpus_build"
LANGS = "en,fr,es,de,unknown"


def _manifest_state(out_root: str) -> dict[int, int]:
    state = {}
    for mf in glob.glob(f"{out_root}/manifest/bucket-*.json"):
        with open(mf) as fh:
            e = json.load(fh)
        b = int(os.path.basename(mf)[len("bucket-") : -len(".json")])
        state[b] = e["attempt"]
    return state


def _job(phase: str, near_dup_exact: bool = False) -> list[str]:
    cmd = [
        sys.executable,
        os.path.join(REPO, "jobs", "run_corpus_build_resumable.py"),
        "--pages", PAGES_PATH,
        "--out", OUT_ROOT,
        "--phase", phase,
        "--min-quality", "0.0",
        "--langs", LANGS,
        "--n-shards", "64",
    ]
    if near_dup_exact:
        cmd.append("--near-dup-exact")
    return cmd


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("n_pages", nargs="?", type=int, default=1_200_000)
    ap.add_argument("--kill-after", type=float, default=150.0)
    # round-5 verdict item 6: the exact-CC near-dup variant is the one a
    # correctness-first 100-TB run picks (iterative connected components
    # instead of the one-shot band-group approximation) -- soak it too
    ap.add_argument("--near-dup-exact", action="store_true")
    args = ap.parse_args()

    if not os.path.isdir(PAGES_PATH):
        build_input(args.n_pages, max(args.n_pages // 100, 1))
    import shutil

    shutil.rmtree(OUT_ROOT, ignore_errors=True)
    warm_page_cache(PAGES_PATH)

    # leg A: extract phase, killed mid-run
    t0 = time.monotonic()
    child = subprocess.Popen(
        _job("extract", args.near_dup_exact), stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL, start_new_session=True,
    )
    # poll during the wait so a leg that FINISHES before kill-after doesn't
    # crash killpg with ProcessLookupError — fall through to the
    # "kill landed after completion" assertion below instead
    deadline = time.monotonic() + args.kill_after
    while time.monotonic() < deadline and child.poll() is None:
        time.sleep(1.0)
    if child.poll() is None:
        try:
            os.killpg(os.getpgid(child.pid), signal.SIGKILL)
        except ProcessLookupError:
            pass  # exited between poll and killpg
    child.wait()
    legA_wall = round(time.monotonic() - t0, 1)
    after_kill = _manifest_state(OUT_ROOT)
    assert after_kill, "kill landed before any bucket committed; raise --kill-after"
    assert len(after_kill) < 64, "kill landed after completion; lower --kill-after"
    assert all(a == 1 for a in after_kill.values())

    # leg B: resume + finish in a fresh process
    t1 = time.monotonic()
    out = subprocess.run(
        _job("all", args.near_dup_exact),
        capture_output=True, text=True, check=True,
    )
    legB_wall = round(time.monotonic() - t1, 1)
    result = json.loads(out.stdout.strip().splitlines()[-1])

    final = _manifest_state(OUT_ROOT)
    resumed = sorted(set(result["run"]["processed"]))
    committed_legA = sorted(after_kill)
    assert set(resumed).isdisjoint(after_kill), "resume recomputed a committed bucket"
    assert set(result["run"]["skipped"]) == set(after_kill)
    assert len(final) == 64 and all(a == 1 for a in final.values())

    stats = result["stats"]
    drops = (
        stats["n_collapsed"] + stats["n_blocked"] + stats["n_exact_dup"]
        + stats["n_filtered_out"] + stats["n_repetition_out"]
        + stats["n_gopher_out"] + stats["n_contaminated"]
        + stats["n_near_dup"] + stats["n_budget_out"]
    )
    assert stats["n_pages_in"] == drops + stats["n_final"], "counters do not reconcile"

    rows = []
    bts = []
    for mf in glob.glob(f"{OUT_ROOT}/manifest/bucket-*.json"):
        with open(mf) as fh:
            e = json.load(fh)
        rows.append(e["rows"])
        bts.append(e["bytes"])
    print(
        json.dumps(
            {
                "soak": "corpus_build_resumable"
                        + ("_exact_cc" if args.near_dup_exact else ""),
                "n_pages": stats["n_pages_in"],
                "legA_wall_sec_killed": legA_wall,
                "legA_buckets_committed": len(committed_legA),
                "legB_wall_sec_resume_and_finish": legB_wall,
                "legB_buckets_resumed": len(resumed),
                "docs_per_sec_end_to_end": round(
                    stats["n_pages_in"] / (legA_wall + legB_wall), 1
                ),
                "stats": stats,
                "bucket_rows_min_max": [min(rows), max(rows)],
                "bucket_bytes_min_max": [min(bts), max(bts)],
                "resume_assertions": "passed",
            }
        )
    )


if __name__ == "__main__":
    main()
