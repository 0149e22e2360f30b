"""Standalone executors_small scaling run (local-cluster[1,4] vs [4,4]).

The main bench's executor mode (8 -> 32 cores) reads against a host whose
own memory-parallelism ceiling from 8 to 32 processes is ~0.67-0.73 — the
HIGH level is saturated, so no workload can express 0.8 there. This run
measures the SAME 1-vs-4-executor criterion at 4 -> 16 cores, where the
box still has headroom, giving the second bracket point (see BASELINE.md).

Usage:  python tools/bench_exec_small.py [max_windows] [deadline_sec]
Prints one JSON line (same window schema as bench.py's scaling sections).
Env overrides (SPARK_GRAFT_BENCH_*) apply — e.g. SCALE_MULT to shrink
epochs; this script never rewrites BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main() -> None:
    max_windows = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    deadline = time.time() + (float(sys.argv[2]) if len(sys.argv) > 2 else 1800.0)
    total = bench.EPOCH_EVENTS * (bench.SCALE_MULT + 1)
    events = bench._events_cached(total) or bench.generate_events(total)
    tmp = tempfile.mkdtemp(prefix="kcp_exsmall_", dir=bench.SHM)
    run = bench._ScalingRun(tmp, events, "executors_small")
    run.max_windows = min(run.max_windows, max_windows)
    run.deadline_ts = deadline
    try:
        while not run.done() and time.time() + run.est_cost() <= deadline:
            run.step()
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    out = run.summary() or {"windows": []}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
