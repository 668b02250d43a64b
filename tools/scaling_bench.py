"""Two-cluster-size scaling evidence (sandbox form of the north rule's
N -> 4N executor criterion): run the SAME north-star kernel — frontier
URLs scheduled+deduped — at local[8] and local[32] on the same input,
in fresh JVMs, and report throughput at both plus scaling efficiency

    eff = (thr_4N / thr_N) / 4        (>= 0.8 required)

Writes BENCH.md. Usage: python tools/scaling_bench.py [n_frontier]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys
sys.path.insert(0, {repo!r})
from moca_spark.session import get_spark
from moca_spark.bench_core import frontier_schedule_dedup
cores = int(sys.argv[1]); n = int(sys.argv[2])
spark = get_spark(app_name=f"scale-{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
# warmup (JIT + codegen caches), then the measured run
frontier_schedule_dedup(spark, n_frontier=n // 10, n_candidates=n // 10,
                        n_hosts=2000, partitions=cores * 2)
r = frontier_schedule_dedup(spark, n_frontier=n, n_candidates=n,
                            n_hosts=20000, partitions=cores * 2)
print("RESULT " + json.dumps(r))
spark.stop()
"""


def run(cores: int, n: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO), str(cores), str(n)],
        capture_output=True, text=True, timeout=1200,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(f"no result from local[{cores}]:\n{out.stderr[-2000:]}")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    r8 = run(8, n)
    r32 = run(32, n)
    thr8, thr32 = r8["urls_per_sec"], r32["urls_per_sec"]
    eff = (thr32 / thr8) / 4.0
    md = f"""# BENCH — north-star kernel scaling evidence

North rule: throughput scaling efficiency >= 0.8 from N to 4N
executors. Sandbox form (driver instruction): same job, same input, at
`local[8]` (N) and `local[32]` (4N), fresh JVM each.

Job: frontier schedule+dedup kernel (`moca_spark/bench_core.py`) —
salted top-K politeness slice, candidate consolidation, exact
anti-join dedup vs seen, min-depth frontier merge — on a synthetic
Zipf frontier of {n:,} URLs + {n:,} candidates over 20,000 hosts
(generated lazily with `spark.range`; forced with a noop sink).

| parallelism | schedule s | dedup+merge s | total s | URLs/s |
|---|---|---|---|---|
| local[8]  (N)  | {r8['schedule_sec']} | {r8['dedup_merge_sec']} | {r8['total_sec']} | {thr8:,} |
| local[32] (4N) | {r32['schedule_sec']} | {r32['dedup_merge_sec']} | {r32['total_sec']} | {thr32:,} |

**Scaling efficiency = (thr_4N / thr_N) / 4 = ({thr32:,} / {thr8:,}) / 4
= {eff:.3f}** {'(PASS >= 0.8)' if eff >= 0.8 else '(below 0.8 — see notes)'}

Notes
- Single-box caveat: local[8] and local[32] share one JVM heap, memory
  bandwidth and SSD, so this under-reports true multi-executor scaling
  (a real 4N-executor cluster adds memory/IO bandwidth with cores; a
  single box does not — the 4N run here is bandwidth-capped).
- Skew handling: the kernel runs the salted two-phase top-K
  (operators/wave.py), so the Zipf head host does not serialize the
  schedule stage.
- Shuffle partitions scale with cores (2x cores) as they would
  per-executor on a cluster; AQE coalesces the tail.
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(md)
    print(json.dumps({"thr_local8": thr8, "thr_local32": thr32,
                      "efficiency": round(eff, 3), "n": n}))


if __name__ == "__main__":
    main()
