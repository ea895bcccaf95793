#!/usr/bin/env python3
"""Engine-internal scaling diagnosis: work invariance across parallelism.

The gated throughput protocol (scripts/scaling.py) shows WHAT efficiency
the host allowed; this script shows the ENGINE adds no parallelism-induced
work — the strongest rebuttal to "maybe the engine itself stops scaling".
Method: run the identical flagship job at local[N] and local[4N] (fresh
JVM each, same pre-materialized input), and read Spark's own stage
metrics (REST API /api/v1/applications/<id>/stages) for the timed run —
summed executor task CPU time, task run time, and GC time, as deltas over
a post-warmup snapshot.

Interpretation:
* Σ task CPU time ~equal across configs → per-row engine work is
  independent of parallelism (no serial section amplified, no extra
  per-task recompute).  A modest 4N increase is expected from the
  per-worker row memo: 4x more workers each warm their own memo, so
  repeated rows are recomputed in more places — bounded, documented
  redundancy.
* Σ task RUN time >> Σ CPU time at 4N → tasks sat waiting for cores
  (host starvation), which is hardware, not engine.

Writes BENCH/SCALING_DIAGNOSIS.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
INPUT_DIR = os.environ.get("SCALING_INPUT_DIR", "/tmp/spark_graft_scaling_input")


def _stage_totals(ui_url: str, app_id: str) -> dict:
    with urllib.request.urlopen(
        f"{ui_url}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    return {
        "cpu_ns": sum(s.get("executorCpuTime", 0) for s in stages),
        "run_ms": sum(s.get("executorRunTime", 0) for s in stages),
        "gc_ms": sum(s.get("jvmGcTime", 0) for s in stages),
    }


def _subtree_cpu_seconds() -> float:
    """CPU seconds (utime+stime) of this process's whole subtree — the JVM
    plus every pyspark.daemon Python worker it forked.  Captures the Arrow
    UDF kernels' CPU, which executorCpuTime (JVM threads only) cannot see.
    Reused daemon workers persist across jobs, so snapshot deltas are
    accurate; only CPU of processes that EXIT between snapshots is lost
    (workers are reused, so ~none)."""
    tck = os.sysconf("SC_CLK_TCK")

    def children(pid):
        out = []
        try:
            for t in os.listdir(f"/proc/{pid}/task"):
                with open(f"/proc/{pid}/task/{t}/children") as f:
                    out += [int(x) for x in f.read().split()]
        except Exception:
            pass
        return out

    total, stack, seen = 0.0, [os.getpid()], set()
    while stack:
        p = stack.pop()
        if p in seen:
            continue
        seen.add(p)
        try:
            with open(f"/proc/{p}/stat") as f:
                rest = f.read().rsplit(") ", 1)[1].split()
            total += (int(rest[11]) + int(rest[12])) / tck  # utime+stime
        except Exception:
            pass
        stack += children(p)
    return total


def child(cpus: int, seed: int) -> None:
    from pyspark.sql import functions as F

    from ocr_corrector_spark.plans.pipeline import correct_pipeline
    from ocr_corrector_spark.session import get_spark
    from ocr_corrector_spark.sources.transcripts import gen_transcripts

    spark = get_spark(
        app_name=f"scaling-diag-{cpus}",
        cpus=cpus,
        shuffle_partitions=max(32, cpus),
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    df = spark.read.parquet(os.path.join(INPUT_DIR, f"seed{seed}")).persist()
    n_turns = df.count()

    def run(frame):
        correct_pipeline(frame, spark, order_output=True).agg(
            F.sum(F.length("text_corrected")), F.count(F.lit(1))
        ).collect()

    # warm every worker (per-worker import/unpickle ramp), then snapshot
    run(gen_transcripts(spark, n_convs=max(64, cpus * 8), seed=99).repartition(cpus * 2))
    time.sleep(1)  # let the status store catch up
    before = _stage_totals(ui, app_id)
    cpu_before = _subtree_cpu_seconds()
    t0 = time.perf_counter()
    run(df)
    wall = time.perf_counter() - t0
    time.sleep(1)
    after = _stage_totals(ui, app_id)
    cpu_after = _subtree_cpu_seconds()

    jvm_cpu = (after["cpu_ns"] - before["cpu_ns"]) / 1e9
    subtree_cpu = cpu_after - cpu_before
    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_turns": n_turns,
                "wall_sec": round(wall, 3),
                "task_cpu_sec": round(jvm_cpu, 3),
                "task_run_sec": round((after["run_ms"] - before["run_ms"]) / 1e3, 3),
                "gc_sec": round((after["gc_ms"] - before["gc_ms"]) / 1e3, 3),
                # whole-subtree CPU (JVM + python workers + this driver)
                "subtree_cpu_sec": round(subtree_cpu, 3),
            }
        )
    )
    spark.stop()


def run_child(cpus: int, seed: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", str(cpus), str(seed)],
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), int(sys.argv[3]))
        return
    n = int(os.environ.get("SCALING_N", "8"))
    seed = int(os.environ.get("SCALING_SEED", "1"))
    a = run_child(n, seed)
    b = run_child(4 * n, seed)
    cpu_ratio = (
        b["subtree_cpu_sec"] / a["subtree_cpu_sec"] if a["subtree_cpu_sec"] else None
    )
    jvm_ratio = b["task_cpu_sec"] / a["task_cpu_sec"] if a["task_cpu_sec"] else None
    summary = {
        "generated_utc": datetime.now(timezone.utc).isoformat(timespec="seconds"),
        "n_cores": n,
        "n4_cores": 4 * n,
        "config_N": a,
        "config_4N": b,
        "total_cpu_ratio_4N_over_N": round(cpu_ratio, 3),
        "jvm_task_cpu_ratio_4N_over_N": round(jvm_ratio, 3),
    }
    print(json.dumps(summary))
    with open(os.path.join(REPO, "BENCH", "SCALING_DIAGNOSIS.md"), "w") as f:
        f.write(
            f"""# Scaling diagnosis — engine work invariance ({summary['generated_utc']})

Identical flagship job (same pre-materialized {a['n_turns']:,}-turn input,
seed {seed}) at local[{n}] and local[{4 * n}], fresh JVM each.  Two CPU
accountings, both as deltas over a post-warmup snapshot:

* **process-subtree CPU** — utime+stime of the driver's whole process
  tree from /proc (JVM + every forked pyspark.daemon Python worker), i.e.
  ALL engine compute including the Arrow UDF kernels;
* **JVM task CPU** — Spark's executorCpuTime over completed stages (REST
  API), the JVM-side orchestration/codegen share.

| metric | local[{n}] | local[{4 * n}] |
|---|---|---|
| wall seconds | {a['wall_sec']} | {b['wall_sec']} |
| process-subtree CPU seconds (JVM + Python workers) | {a['subtree_cpu_sec']} | {b['subtree_cpu_sec']} |
| Σ JVM task CPU seconds | {a['task_cpu_sec']} | {b['task_cpu_sec']} |
| Σ task run seconds (incl. Python compute + waits) | {a['task_run_sec']} | {b['task_run_sec']} |
| JVM GC seconds | {a['gc_sec']} | {b['gc_sec']} |

**Total engine CPU ratio 4N/N = {summary['total_cpu_ratio_4N_over_N']}**
(JVM-only ratio {summary['jvm_task_cpu_ratio_4N_over_N']}).  A ratio ≈ 1
means the engine performs the same total work per row regardless of
parallelism — no serial section amplified, no per-task recompute; the
expected excess over 1.0 is the per-worker row memo warming in 4x more
workers (bounded redundancy, operators/correct.py) plus oversubscription
cache effects.  When wall-clock efficiency (BENCH/scaling_evidence.json)
reads below this CPU ratio, the gap is time the host did not schedule the
work — contention/frequency scaling, not engine structure.
"""
        )


if __name__ == "__main__":
    main()
