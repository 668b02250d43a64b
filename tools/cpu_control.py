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
    t8 = measure(8, units)
    t32 = measure(32, units)
    speedup = t8 / t32
    eff = speedup / 4.0
    print(json.dumps({
        "t_8workers_sec": round(t8, 2),
        "t_32workers_sec": round(t32, 2),
        "speedup_8_to_32": round(speedup, 3),
        "ceiling_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
