#!/usr/bin/env python
"""Multi-JVM scaling control: 4 CONCURRENT local[8] executors vs 1.

The 8->32 single-JVM run (`bench_scaling.py --levels 8,32`) conflates
two effects: (a) does the PLAN scale to 4x the parallelism, and
(b) does one box's shared memory subsystem / GC scale to 4x the
threads.  A real 4x-bigger cluster adds whole executors — separate
JVMs with separate heaps, and (across nodes) separate memory
controllers — so (b) is a sandbox artifact, not a property of the
pipeline.

This control isolates (b): run the IDENTICAL job (same input, same
plan, same local[8] JVM shape) as 4 concurrent subprocesses and
compare aggregate throughput with one such JVM running alone.
Per-JVM parallelism, task sizing, shuffle partitioning, and plan are
all byte-identical — Spark cannot tell the difference — so ANY
throughput loss per JVM is shared-hardware contention, and

    eff_hw   = wall_single / wall_concurrent      (per-JVM slowdown)
    eff_plan = eff_single_jvm_8_to_32 / eff_hw    (what Spark loses)

Usage: python scripts/scaling_multijvm.py [--pages N] [--jvms 4]
       [--cpus 8] [--trials 2] [--stage reduce|all]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
SCALER = REPO / "bench_scaling.py"


def launch(cpus: int, pages: int, trials: int, stage: str, tag: str,
           driver_memory: str):
    return subprocess.Popen(
        [sys.executable, str(SCALER), "--worker-cpus", str(cpus),
         "--pages", str(pages), "--trials", str(trials),
         "--stage", stage, "--driver-memory", driver_memory,
         "--warehouse-root", f"/dev/shm/spark_mj_{tag}"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True, cwd=REPO,
    )


def harvest(proc, siblings=()) -> dict:
    try:
        out, _ = proc.communicate(timeout=5400)
    except subprocess.TimeoutExpired:
        for p in (proc, *siblings):
            p.kill()
        raise
    lines = [l for l in out.splitlines() if l.startswith("WORKER_RESULT ")]
    if not lines:
        # don't leave sibling JVMs chewing the box after a failure
        for p in siblings:
            p.kill()
        raise SystemExit(f"worker produced no result (rc={proc.returncode})")
    return json.loads(lines[-1].removeprefix("WORKER_RESULT "))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=48_000_000)
    ap.add_argument("--jvms", type=int, default=4)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--stage", default="reduce", choices=("all", "reduce"))
    # 48g x 4 concurrent JVMs balloons past the box's 125 GiB (G1 under
    # no heap pressure grew to ~33 GiB RSS each and the OOM killer took
    # one worker out); 16g is ample for the reduce stage at local[8]
    ap.add_argument("--driver-memory", default="16g")
    args = ap.parse_args()

    # phase 1: one JVM alone (the N-executor baseline)
    t0 = time.perf_counter()
    single = harvest(
        launch(args.cpus, args.pages, args.trials, args.stage, "single",
               args.driver_memory)
    )
    single_wall = time.perf_counter() - t0

    # phase 2: the same JVM shape x jvms, concurrently (the 4N-executor
    # cluster, minus the separate hardware a real one brings)
    t0 = time.perf_counter()
    procs = [
        launch(args.cpus, args.pages, args.trials, args.stage, f"c{i}",
               args.driver_memory)
        for i in range(args.jvms)
    ]
    concurrent = [
        harvest(p, siblings=[q for q in procs if q is not p])
        for p in procs
    ]
    concurrent_wall = time.perf_counter() - t0

    per_jvm_best = [c["sec"] for c in concurrent]
    # aggregate throughput: each JVM processed `pages` in its own best
    # trial; the fleet's rate is the sum of per-JVM rates
    agg = sum(args.pages / s for s in per_jvm_best)
    base = args.pages / single["sec"]
    eff_hw = agg / (args.jvms * base)
    summary = {
        "pages": args.pages,
        "stage": args.stage,
        "jvms": args.jvms,
        "cpus_per_jvm": args.cpus,
        "single": single,
        "concurrent": concurrent,
        "single_phase_wall_s": round(single_wall, 1),
        "concurrent_phase_wall_s": round(concurrent_wall, 1),
        "single_docs_per_sec": round(base, 1),
        "aggregate_docs_per_sec": round(agg, 1),
        "hw_scaling_efficiency": round(eff_hw, 3),
    }
    print(json.dumps(summary, indent=2))
    (REPO / "_work" / "scaling_multijvm_result.json").write_text(
        json.dumps(summary)
    )


if __name__ == "__main__":
    main()
