"""Same-JVM A/B: host STRING as slice-exchange payload vs trimmed.

Candidate round-5 lever after the host-KEY de-stringing
(tools/host_key_ab.py): the engine's frontier still CARRIES the host
string through the (host_key, salt) exchange, the two rank-window
sorts, the checkpoint and the rest∪fresh union — ~20-25% of the
UnsafeRow bytes on the synthetic frontier — purely as payload (the
partition key is already xxhash64(host)). Since host is a
deterministic function of url (the partition selector), the row could
carry only the 64-bit ``host_key`` and re-derive the string AFTER the
slice, on budget-bounded rows only.

Modes measured on the north-star kernel flow (same-JVM, interleaved,
median-of-reps — the round-4/5 A/B discipline):

- ``carry`` — engine today: frontier rows = (_key, run_id, url, host,
  depth, seq); slice_split derives _hk per wave.
- ``trim``  — frontier rows = (_key, run_id, url, host_key, depth,
  seq); slice_split partitions/windows on the carried host_key
  (its "host_key" fast path); after the slice, the host string is
  re-derived from url via parse_url on <= hosts x budget rows (timed —
  the cost the engine would actually pay to feed the fetch stage), and
  the candidate/fresh side likewise carries host_key only.

OUTCOME (round 5): trim won decisively — 1.093x at local[8], 2.064x at
local[32] (schedule stage 11.3->4.8 s; the wider carry rows crossed the
per-task execution-memory threshold under 32-way concurrency) — and is
now the ENGINE DEFAULT (engine._trim_frontier/_rehost). ``carry``
remains here as the round-4-shape control for reproduction.

Usage: python tools/payload_ab.py [n_frontier] [reps] [cores ...]
       (defaults: 8_000_000 3 8 32; idle box only)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import gc, json, sys, tempfile, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from moca_spark.session import get_spark
from moca_spark.bench_core import _force, _with_key
from moca_spark.operators.wave import slice_split
from moca_spark.sources.synth import scale_frontier

cores = int(sys.argv[1]); n = int(sys.argv[2]); reps = int(sys.argv[3])
spark = get_spark(app_name=f"plab-{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
tmp = tempfile.mkdtemp(prefix=f"plab-{{cores}}-")

N_HOSTS, BUDGET, PARTS = 20000, 100, 64
STATE_KEYS = ["_key", "run_id", "url"]

def build(mode):
    fr = _with_key(scale_frontier(spark, n, N_HOSTS, PARTS, seed=1)
                   .withColumn("run_id", F.lit("bench")))
    fresh = _with_key(scale_frontier(spark, max(n // 8, 1), N_HOSTS, PARTS,
                                     seed=3)
                      .withColumn("run_id", F.lit("bench")))
    if mode == "trim":
        fr = fr.withColumn("host_key", F.xxhash64("host")).drop("host")
        fresh = fresh.withColumn("host_key", F.xxhash64("host")).drop("host")
    cols = fr.columns
    fr.write.mode("overwrite").parquet(f"{{tmp}}/fr-{{mode}}")
    fresh.write.mode("overwrite").parquet(f"{{tmp}}/fresh-{{mode}}")
    return cols

def one(mode):
    fr = spark.read.parquet(f"{{tmp}}/fr-{{mode}}")
    fresh = spark.read.parquet(f"{{tmp}}/fresh-{{mode}}")
    # state prep (untimed), engine shape: deduped checkpoint + fresh
    aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    extra = "host_key" if mode == "trim" else "host"
    ded = (fr.groupBy(*STATE_KEYS)
             .agg(F.min(F.struct("depth", "seq")).alias("m"),
                  F.first(extra).alias(extra))
             .select("_key", "run_id", "url", extra,
                     F.col("m.depth").alias("depth"),
                     F.col("m.seq").alias("seq"))
             .localCheckpoint(eager=True))
    state = ded.unionByName(
        fresh.select("_key", "run_id", "url", extra, "depth", "seq")
             .localCheckpoint(eager=True))
    spark.conf.set("spark.sql.adaptive.enabled", aqe)
    t0 = time.time()
    sliced, rest = slice_split(state, BUDGET, n_salts=16)
    sliced = sliced.cache()
    if mode == "trim":
        # the engine's fetch stage needs the host STRING: re-derive on
        # the budget-bounded slice only (timed — the real added cost)
        out = sliced.withColumn("host", F.parse_url("url", F.lit("HOST")))
    else:
        out = sliced
    _force(out)
    t_sched = time.time() - t0
    t1 = time.time()
    _force(rest.unionByName(fresh.select(*state.columns)))
    t_rest = time.time() - t1
    sliced.unpersist()
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    total = t_sched + t_rest
    return {{"schedule_sec": round(t_sched, 2), "rest_sec": round(t_rest, 2),
            "total_sec": round(total, 2),
            "urls_per_sec": int(n / total)}}

MODES = ("trim", "carry")
for m in MODES:
    build(m)
one(MODES[0])  # warmup (discarded)
runs = {{m: [] for m in MODES}}
for i in range(reps):
    for m in (MODES if i % 2 == 0 else MODES[::-1]):
        runs[m].append(one(m))
out = {{"cores": cores}}
for m in MODES:
    rs = sorted(runs[m], key=lambda r: r["total_sec"])
    med = rs[len(rs) // 2]
    out[m] = dict(med, all=[r["urls_per_sec"] for r in runs[m]])
out["trim_over_carry"] = round(
    out["trim"]["urls_per_sec"] / out["carry"]["urls_per_sec"], 3)
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
