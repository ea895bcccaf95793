#!/usr/bin/env python3
"""Scaling-efficiency evidence (BASELINE.json north_rule: throughput
scaling efficiency >= 0.8 from N to 4N executors).

No real cluster exists in this sandbox, so per the documented protocol
(BASELINE.md) the same job runs at two parallelism levels — local[N] and
local[4N] — on the SAME input, each in a fresh subprocess (fresh JVM).
Efficiency = throughput(4N) / (4 * throughput(N)).

Writes BENCH/BASELINE.md and prints the JSON summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import date

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        # larger input so compute dominates fixed per-job overhead — the
        # scaling-efficiency ratio needs the compute-bound regime
        SPARK_GRAFT_SCALE_MULT=os.environ.get("SPARK_GRAFT_SCALE_MULT", "48"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("SCALING_N", "8"))
    r_n = run_bench(n, sf_dir)
    r_4n = run_bench(4 * n, sf_dir)

    thr_n = r_n["corrected_turns_per_sec"]
    thr_4n = r_4n["corrected_turns_per_sec"]
    eff = thr_4n / (4 * thr_n)

    summary = {
        "sf_dir": sf_dir,
        "n_cores": n,
        "n4_cores": 4 * n,
        "n_turns": r_n["n_turns"],
        "turns_per_sec_N": thr_n,
        "turns_per_sec_4N": thr_4n,
        "scaling_efficiency": round(eff, 3),
        "bench_N": r_n,
        "bench_4N": r_4n,
    }
    print(json.dumps(summary))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH/BASELINE — measured numbers ({date.today().isoformat()})

Protocol (BASELINE.md): the reference publishes no benchmark numbers, so the
baseline is driver-defined — corrected turns/sec on the synthetic OCR-noised
transcripts table with per-turn equality vs reference semantics, and scaling
efficiency from N to 4N parallelism evidenced by running the identical job at
`local[{n}]` and `local[{4 * n}]` on the same input (fresh JVM each; no real
cluster in this sandbox).

Each config times 3 reps of the full extraction+correction pipeline, each
rep on a distinct-seed input of identical size/shape (defeats the worker
row-memo across reps; see bench.py), input fixed at 128 partitions at both
core counts.  min-of-3 is the steady-state estimator — this sandbox shows
sporadic multi-second environmental stalls, so all reps are reported.

| metric | value |
|---|---|
| input turns | {r_n['n_turns']} |
| sf dir | {sf_dir} |
| corrected turns/sec @ local[{n}] | {thr_n} |
| corrected turns/sec @ local[{4 * n}] | {thr_4n} |
| per-core turns/sec @ local[{n}] | {thr_n / n:.1f} |
| per-core turns/sec @ local[{4 * n}] | {thr_4n / (4 * n):.1f} |
| scaling efficiency thr(4N)/(4·thr(N)) | {eff:.3f} |
| target | ≥ 0.8 |
| flagship rep seconds @ local[{n}] | {r_n['flagship_reps']} |
| flagship rep seconds @ local[{4 * n}] | {r_4n['flagship_reps']} |

Per-query wall seconds @ local[{4 * n}]:

| query | sec |
|---|---|
"""
            + "\n".join(
                f"| {k} | {v} |" for k, v in r_4n["queries"].items()
            )
            + "\n"
        )


if __name__ == "__main__":
    main()
