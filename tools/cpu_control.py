"""Spark-free VM scaling ceiling: an embarrassingly parallel pure-CPU
burn (no shuffle, no IO, no shared state) run at 8 and 32 workers via
multiprocessing. Whatever efficiency THIS job achieves from 8 -> 32
workers is the hardware ceiling for any workload on this box (all-core
turbo drop + hypervisor co-tenancy); the kernel's raw efficiency is
normalized against it in BENCH.md. Usage: python tools/cpu_control.py
[work_units] — prints one JSON line and appends nothing.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _burn(n: int) -> int:
    # integer hash mixing — branch-free ALU work, no memory traffic
    x = 0x9E3779B97F4A7C15
    for i in range(n):
        x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
        x = (x ^ (x >> 27)) * 0x94D049BB133111EB & 0xFFFFFFFFFFFFFFFF
        x ^= i
    return x


def measure(workers: int, units: int, reps: int = 3) -> float:
    """Best-of-reps wall time to complete `workers x units` total work
    spread over `workers` processes (fixed work per worker would let
    the 8-level finish early per core; fixed TOTAL work divided evenly
    is the cluster-faithful form: same job, more workers)."""
    total = units * 32  # fixed total job, independent of worker count
    per = total // workers
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        with mp.Pool(workers) as p:
            p.map(_burn, [per] * workers)
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    units = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    # optional worker pair (default 8->32), e.g. `cpu_control.py 2000000 4 16`
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 4 * lo
    t8 = measure(lo, units)
    t32 = measure(hi, units)
    speedup = t8 / t32
    eff = speedup / (hi / lo)
    print(json.dumps({
        f"t_{lo}workers_sec": round(t8, 2),
        f"t_{hi}workers_sec": round(t32, 2),
        f"speedup_{lo}_to_{hi}": round(speedup, 3),
        "ceiling_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
