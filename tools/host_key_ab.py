"""Same-JVM A/B of the politeness-partition key: hash64 vs string.

Round-5 de-stringing (operators/wave.py HOST_KEY_MODE): the slice
exchange and both rank windows partition on ``xxhash64(host)`` instead
of the host STRING, and slice ties break on the 64-bit ``_key`` before
(run_id, url) — so the DRAM-bound sort/exchange hot path compares and
hashes 8-byte longs, with the strings demoted to payload.

This tool measures exactly that change on the north-star kernel
(bench_core.frontier_schedule_dedup, lsm mode), inside ONE JVM per
core count with modes interleaved rep-by-rep — same heap, same
executor state, same box weather — the same-JVM discipline round 4
used for the `_key`-led sort A/B. Per-mode medians + the hash64/string
throughput ratio are reported at each core count.

Usage: python tools/host_key_ab.py [n_frontier] [reps] [cores ...]
       (defaults: 8_000_000 3 8 32; idle box only)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import gc, json, sys, tempfile
sys.path.insert(0, {repo!r})
import moca_spark.operators.wave as wave
from moca_spark.session import get_spark
from moca_spark.bench_core import frontier_schedule_dedup

cores = int(sys.argv[1]); n = int(sys.argv[2]); reps = int(sys.argv[3])
MODES = ("hash64", "string")
spark = get_spark(app_name=f"hkab-{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
tmp = tempfile.mkdtemp(prefix=f"hkab-{{cores}}-")

def one(mode):
    wave.HOST_KEY_MODE = mode
    r = frontier_schedule_dedup(spark, n_frontier=n, n_candidates=n,
                                n_hosts=20000, partitions=64,
                                materialize_dir=tmp)
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    return r

one(MODES[0])  # warmup (discarded)
runs = {{m: [] for m in MODES}}
for i in range(reps):
    # alternate which mode goes first so slow drift cancels
    for m in (MODES if i % 2 == 0 else MODES[::-1]):
        runs[m].append(one(m))
out = {{"cores": cores}}
for m in MODES:
    rs = sorted(runs[m], key=lambda r: r["total_sec"])
    med = rs[len(rs) // 2]
    out[m] = {{"urls_per_sec": med["urls_per_sec"],
              "schedule_sec": med["schedule_sec"],
              "dedup_merge_sec": med["dedup_merge_sec"],
              "all": [r["urls_per_sec"] for r in runs[m]]}}
out["hash64_over_string"] = round(
    out["hash64"]["urls_per_sec"] / out["string"]["urls_per_sec"], 3)
print("RESULT " + json.dumps(out))
spark.stop()
import shutil
shutil.rmtree(tmp, ignore_errors=True)
"""


def heap_gb(cores: int) -> int:
    want = 3 * cores
    try:
        total = (os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
                 ) // (1 << 30)
    except (ValueError, OSError, AttributeError):
        total = want
    return max(min(want, int(total * 0.75)), 2)


def run(cores: int, n: int, reps: int) -> dict:
    env = dict(os.environ, MOCA_DRIVER_MEM=f"{heap_gb(cores)}g")
    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO),
         str(cores), str(n), str(reps)],
        capture_output=True, text=True, timeout=3600, env=env,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(f"no result local[{cores}]:\n{out.stderr[-1500:]}")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cores = [int(c) for c in sys.argv[3:]] or [8, 32]
    out = {"n": n, "reps": reps, "levels": {}}
    for c in cores:
        out["levels"][str(c)] = run(c, n, reps)
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
