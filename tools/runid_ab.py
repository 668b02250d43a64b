"""Same-JVM A/B: run_id STRING through the kernel wave vs a dictionary int.

Candidate round-5 lever after the host-string trim (tools/payload_ab.py,
now the engine default): the frontier/seen/candidate rows still carry
the ``run_id`` STRING through every hot-loop structure — the
(host_key, salt) slice exchange and both rank sorts, the candidate
consolidation groupBy, the STATE_KEYS admission join (its exchange
hashes the string, its sort-merge compares it on _key ties) and the
seen fold. run_id is tiny-cardinality (one row per Work — tens, not
millions), so it dictionary-encodes to a 4-byte ordinal ``run_ord``
assigned in SORTED run_id order:

- identity is preserved exactly: (run_ord, url) <-> (run_id, url) is a
  bijection within a run() execution (the runs list is fixed once the
  crawl loop starts);
- the ordering contract is preserved exactly: run_ord is assigned by
  sorted run_id, so ORDER BY (depth, seq, _key, run_ord, url) is the
  same total order as (depth, seq, _key, run_id, url).

Modes measured on the full kernel wave (schedule + candidate
consolidation + admission join + rest-union; same-JVM, interleaved,
median-of-reps — the round-4/5 A/B discipline):

- ``carry`` — engine today: every row carries run_id string; state
  keys (_key, run_id, url).
- ``trim``  — rows carry run_ord int; state keys (_key, run_ord, url);
  the slice re-attaches the run_id string from a tiny literal map
  (timed — the cost the engine would pay to feed fetch/journal).

Usage: python tools/runid_ab.py [n_frontier] [reps] [cores ...]
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
spark = get_spark(app_name=f"rlab-{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
tmp = tempfile.mkdtemp(prefix=f"rlab-{{cores}}-")

N_HOSTS, BUDGET, PARTS = 20000, 100, 64
# realistic multi-work crawl: a handful of run_ids, not one
RUNS = [f"work-{{i:02d}}" for i in range(8)]

def keys(mode):
    return ["_key", "run_ord", "url"] if mode == "trim" \
        else ["_key", "run_id", "url"]

def with_run(df, mode):
    # spread rows over the runs deterministically; _key hashes the
    # STRING run_id in both modes (the state key's definition is
    # unchanged — only the carried column differs)
    ord_col = F.pmod(F.xxhash64("url"), F.lit(len(RUNS))).cast("int")
    rid = F.element_at(F.array(*[F.lit(r) for r in RUNS]), ord_col + 1)
    df = df.withColumn("run_id", rid).withColumn(
        "_key", F.xxhash64(F.concat_ws("\x00", F.col("run_id"), F.col("url"))))
    if mode == "trim":
        df = df.withColumn("run_ord", ord_col).drop("run_id")
    return df

def build(mode):
    fr = with_run(scale_frontier(spark, n, N_HOSTS, PARTS, seed=1), mode) \
        .withColumn("host_key", F.xxhash64("host")).drop("host")
    fresh = with_run(
        scale_frontier(spark, max(n // 8, 1), N_HOSTS, PARTS, seed=3), mode) \
        .withColumn("host_key", F.xxhash64("host")).drop("host")
    seen = with_run(
        scale_frontier(spark, n // 2, N_HOSTS, PARTS, seed=2)
        .select("url", F.col("depth").alias("best_depth")), mode)
    cand = with_run(
        scale_frontier(spark, n, N_HOSTS, PARTS, seed=2)
        .select("url", "host", "depth",
                (F.col("seq") % 100 + 1).alias("parent_rank")), mode)
    for name, df in (("fr", fr), ("fresh", fresh), ("seen", seen),
                     ("cand", cand)):
        df.write.mode("overwrite").parquet(f"{{tmp}}/{{name}}-{{mode}}")

def one(mode):
    K = keys(mode)
    fr = spark.read.parquet(f"{{tmp}}/fr-{{mode}}")
    fresh = spark.read.parquet(f"{{tmp}}/fresh-{{mode}}")
    seen = spark.read.parquet(f"{{tmp}}/seen-{{mode}}")
    cand = spark.read.parquet(f"{{tmp}}/cand-{{mode}}")
    rcol = K[1]
    # state prep (untimed), engine shape: seen base KEYS-partitioned+
    # sorted; frontier = deduped checkpoint + unmerged fresh layer
    aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    base = (seen.groupBy(*K).agg(F.min("best_depth").alias("best_depth"))
            .sortWithinPartitions(*K).localCheckpoint(eager=True))
    ded = (fr.groupBy(*K)
             .agg(F.min(F.struct("depth", "seq")).alias("m"),
                  F.first("host_key").alias("host_key"))
             .select(*K, "host_key",
                     F.col("m.depth").alias("depth"),
                     F.col("m.seq").alias("seq"))
             .localCheckpoint(eager=True))
    state = ded.unionByName(
        fresh.select(*K, "host_key", "depth", "seq")
             .localCheckpoint(eager=True))
    spark.conf.set("spark.sql.adaptive.enabled", aqe)

    t0 = time.time()
    # slice_split orders ties on (_key, run_id, url); in trim mode the
    # frame has run_ord instead — rename for the operator (the order it
    # produces is identical: run_ord is sorted-run_id ordinal)
    st = state.withColumnRenamed("run_ord", "run_id") \
        if mode == "trim" else state
    sliced, rest = slice_split(st, BUDGET, n_salts=16)
    sliced = sliced.cache()
    out = sliced.withColumn("host", F.parse_url("url", F.lit("HOST")))
    if mode == "trim":
        # re-attach the run_id STRING on the budget-bounded slice only
        # (timed — what the engine pays to feed fetch/journal)
        out = out.withColumn(
            "run_str",
            F.element_at(F.array(*[F.lit(r) for r in RUNS]),
                         F.col("run_id").cast("int") + 1))
    _force(out)
    t_sched = time.time() - t0

    t1 = time.time()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        cand2 = (cand.groupBy(*K)
                 .agg(F.min(F.struct("depth", "parent_rank")).alias("m"),
                      F.first("host").alias("host"))
                 .select(*K, "host", F.col("m.depth").alias("depth"),
                         F.col("m.parent_rank").alias("parent_rank")))
        fresh2 = (cand2.join(base, K, "left")
                  .filter(F.col("best_depth").isNull() |
                          (F.col("depth") < F.col("best_depth")))
                  .select(*K, F.xxhash64("host").alias("host_key"), "depth",
                          (F.lit(1 << 32) + F.col("parent_rank")).alias("seq")))
        rest2 = rest.withColumnRenamed("run_id", "run_ord") \
            if mode == "trim" else rest
        _force(rest2.unionByName(fresh2))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
    t_dedup = time.time() - t1
    sliced.unpersist()
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    total = t_sched + t_dedup
    return {{"schedule_sec": round(t_sched, 2),
            "dedup_merge_sec": round(t_dedup, 2),
            "total_sec": round(total, 2),
            "urls_per_sec": int(2 * n / total)}}

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
