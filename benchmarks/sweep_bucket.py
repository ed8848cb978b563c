"""Sweep the VMEM-cliff bucket size at the 4x bench scale (VERDICT r2 #5).

Each configuration runs bench.py in a FRESH subprocess (a crashed/wedged
TPU state then can't poison the rest of the sweep) with BENCH_NODES=1<<19,
BENCH_EDGES=1<<18 (~2.3M incidence entries: every gather table sits above
the ~110 MB VMEM window) and a different ops/bucketed.py bucket_rows.

Run: python benchmarks/sweep_bucket.py [bucket_rows ...]
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(bucket_rows: int) -> str:
    env = dict(
        os.environ,
        BENCH_NODES=str(1 << 19),
        BENCH_EDGES=str(1 << 18),
        BENCH_BUCKET_ROWS=str(bucket_rows),
        BENCH_CALLS="3",
    )
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
    return lines[-1] if lines else f"FAILED: {r.stderr[-300:]}"


def main():
    values = [int(v) for v in sys.argv[1:]] or [
        65536, 98304, 131072, 196608, 262144,
    ]
    for v in values:
        print(f"bucket_rows={v:7d}: ", end="", flush=True)
        print(run_one(v), flush=True)


if __name__ == "__main__":
    main()
