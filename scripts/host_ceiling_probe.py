"""Standalone host-ceiling sampler: alternate pure-Python busy-loop
capacity measurements at N and 4N workers (no Spark, no JVM, no
coordination) and log per-sample efficiency eff = cap(4N) / (4·cap(N)).

This is the direct, engine-free measurement of the bound that
BENCH/scaling_evidence.json's host_ceiling block derives from in-round
probes: if the host's own busy loop — the most parallel workload that
can exist — never reaches 0.8 N→4N efficiency, no engine can.

Samples are SKIPPED while scripts/scaling.py is running (the gated hunt
owns the machine during its rounds; concurrent burns would depress both
measurements).  Appends JSON lines to the path in argv[2] (default
/tmp/host_ceiling.jsonl) until the deadline in argv[1] seconds (default
3600).

Usage: python scripts/host_ceiling_probe.py [seconds] [out.jsonl]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(os.environ.get("SCALING_N", "4"))


def _hunt_running() -> bool:
    out = subprocess.run(["ps", "ax", "-o", "pid=,args="], capture_output=True, text=True).stdout
    return any(
        "scripts/scaling.py" in line and "host_ceiling" not in line
        for line in out.splitlines()
    )


def main() -> None:
    deadline = time.time() + int(sys.argv[1]) if len(sys.argv) > 1 else time.time() + 3600
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/host_ceiling.jsonl"
    from bench import measure_capacity

    while time.time() < deadline:
        if _hunt_running():
            time.sleep(20)
            continue
        # N → 4N → N triple, same shape as the gated protocol, so a
        # capacity swing mid-sample shows up as pre/post disagreement
        c_n_pre = measure_capacity(N)
        c_4n = measure_capacity(4 * N)
        c_n_post = measure_capacity(N)
        c_n = (c_n_pre + c_n_post) / 2
        rec = {
            "utc": datetime.now(timezone.utc).isoformat(timespec="seconds"),
            "n_workers": N,
            "cap_n_pre": c_n_pre,
            "cap_4n": c_4n,
            "cap_n_post": c_n_post,
            "host_eff": round(c_4n / (4 * c_n), 3) if c_n else None,
            "stability": round(
                abs(c_n_pre - c_n_post) / max(c_n_pre, c_n_post), 3
            ),
        }
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        # low duty cycle: the gated hunt's watcher probes share this host
        time.sleep(45)


if __name__ == "__main__":
    main()
