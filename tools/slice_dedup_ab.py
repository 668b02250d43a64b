"""A/B the slice_split dedup implementation: window-sort vs _key-led window vs sort-agg.

slice_split (operators/wave.py) dedupes the LSM frontier inside the
(host, salt) slice exchange. Two ways to collapse duplicate (run, url)
rows to their min-(depth, seq) survivor:

  window  — row_number over (host, salt, _key, run, url) ordered by
            (depth, seq): a FULL SORT of every partition, then a
            second full sort for the rank window — two O(frontier)
            sorts per wave;
  hashagg — groupBy(host, salt, _key, run, url).min(struct(depth,
            seq)): HashPartitioning(host, salt) satisfies the
            aggregate's clustering (subset rule), so it runs
            EXCHANGE-FREE as a partition-local hash aggregate — only
            the rank window still sorts. One O(frontier) sort per
            wave instead of two.

Sorts are DRAM-bandwidth-bound at 32 threads (BENCH.md: dedup+merge
scales ~2.8x at 4x cores); trading one for a hash probe should help
the 4N level more than N — the direction the north-rule efficiency
ratio rewards.

Runs the north-star kernel at local[8] and local[32] in fresh JVMs for
both modes, interleaved, reports urls/sec + efficiency per mode.

Usage: python tools/slice_dedup_ab.py [n_frontier] [pairs]
(idle box only)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, tempfile
sys.path.insert(0, {repo!r})
import moca_spark.operators.wave as wave
wave.SLICE_DEDUP_MODE = sys.argv[4]
from moca_spark.session import get_spark
from moca_spark.bench_core import frontier_schedule_dedup
cores = int(sys.argv[1]); n = int(sys.argv[2]); reps = int(sys.argv[3])
spark = get_spark(app_name=f"ab-{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
tmp = tempfile.mkdtemp(prefix=f"ab-{{cores}}-")
import gc
runs = []
for i in range(reps + 1):
    runs.append(frontier_schedule_dedup(spark, n_frontier=n, n_candidates=n,
                                        n_hosts=20000, partitions=64,
                                        materialize_dir=tmp))
    gc.collect()
    spark.sparkContext._jvm.System.gc()
runs = runs[1:]
med = sorted(runs, key=lambda r: r["total_sec"])[len(runs) // 2]
med["all_total_sec"] = [r["total_sec"] for r in runs]
print("RESULT " + json.dumps(med))
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


def run(cores: int, n: int, mode: str, reps: int = 3) -> dict:
    env = dict(os.environ, MOCA_DRIVER_MEM=f"{heap_gb(cores)}g")
    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO), str(cores), str(n),
         str(reps), mode],
        capture_output=True, text=True, timeout=2400, env=env,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(f"no result local[{cores}] {mode}:\n{out.stderr[-1500:]}")


MODES = ("window", "window_keyled")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    acc: dict[str, dict[int, list]] = {
        m: {8: [], 32: []} for m in MODES}
    for _ in range(pairs):
        for mode in MODES:
            for cores in (8, 32):
                acc[mode][cores].append(run(cores, n, mode))
    med = lambda rs: sorted(  # noqa: E731
        rs, key=lambda r: r["urls_per_sec"])[len(rs) // 2]
    out = {"n": n, "pairs": pairs}
    for mode in MODES:
        r8, r32 = med(acc[mode][8]), med(acc[mode][32])
        out[mode] = {
            "thr8": r8["urls_per_sec"], "thr32": r32["urls_per_sec"],
            "eff": round(r32["urls_per_sec"] / r8["urls_per_sec"] / 4, 3),
            "sched8": r8["schedule_sec"], "sched32": r32["schedule_sec"],
            "dedup8": r8["dedup_merge_sec"], "dedup32": r32["dedup_merge_sec"],
            "all8": [r["urls_per_sec"] for r in acc[mode][8]],
            "all32": [r["urls_per_sec"] for r in acc[mode][32]],
        }
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
