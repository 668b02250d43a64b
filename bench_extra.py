"""Round-6 optimization harness (guide §1): isolate where the bench
items spend their time. NOT part of the driver contract — bench.py is
frozen; this file only produces evidence for OPTIMIZATION_r06.md.

Modes:
  python bench_extra.py e2e      — crawl_end_to_end with Spark event
                                   logging; prints per-job (callsite,
                                   wall) aggregation + per-wave times.
  python bench_extra.py kernel   — frontier_schedule_dedup phases.
  python bench_extra.py queries  — headline operator queries with
                                   noop-sink timing (1 warmup + median
                                   of 3), matching bench.py methodology.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from moca_spark.session import get_spark


def _spark(event_dir: str | None = None):
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    extra = {}
    if event_dir:
        extra = {
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": event_dir,
            "spark.eventLog.compress": "false",
        }
    spark = get_spark(
        app_name="moca-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def summarize_events(event_dir: str) -> None:
    """Aggregate per-job wall clock by callsite from the event log."""
    import glob

    execs: dict[str, dict] = {}
    jobs: dict[int, dict] = {}
    paths = [p for p in glob.glob(f"{event_dir}/**", recursive=True)
             if os.path.isfile(p) and "appstatus" not in p]
    for path in paths:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except (json.JSONDecodeError, UnicodeDecodeError):
                    continue
                e = ev.get("Event", "")
                if e.endswith("SQLExecutionStart"):
                    execs[str(ev["executionId"])] = {
                        "desc": ev.get("description", "?")[:90]}
                elif e == "SparkListenerJobStart":
                    props = ev.get("Properties", {})
                    jobs[ev["Job ID"]] = {
                        "start": ev["Submission Time"],
                        "eid": props.get("spark.sql.execution.root.id")
                        or props.get("spark.sql.execution.id"),
                    }
                elif e == "SparkListenerJobEnd":
                    if ev["Job ID"] in jobs:
                        jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
    agg: dict[str, list[float]] = {}
    for j in jobs.values():
        if "end" not in j:
            continue
        d = execs.get(j["eid"], {}).get("desc", "(no sql exec)")
        agg.setdefault(d, []).append((j["end"] - j["start"]) / 1000.0)
    rows = sorted(agg.items(), key=lambda kv: -sum(kv[1]))
    print(f"{'total_s':>8} {'n':>4} {'mean_s':>7}  sql-exec callsite")
    for site, ts in rows:
        print(f"{sum(ts):8.2f} {len(ts):4d} {sum(ts)/len(ts):7.3f}  {site}")
    print(f"jobs total: {sum(sum(ts) for _, ts in rows):.2f}s "
          f"across {sum(len(ts) for _, ts in rows)} jobs")


def run_e2e() -> None:
    ev_dir = tempfile.mkdtemp(prefix="bench-e2e-events-")
    spark = _spark(ev_dir)
    from moca_spark.bench_core import crawl_end_to_end

    t0 = time.time()
    crawl = crawl_end_to_end(spark)
    wall = time.time() - t0
    print(f"crawl_e2e: {wall:.2f}s  {crawl}")
    spark.stop()
    time.sleep(2)
    summarize_events(ev_dir)


def run_kernel() -> None:
    spark = _spark()
    from moca_spark.bench_core import frontier_schedule_dedup

    mat = tempfile.mkdtemp(prefix="bench-kernel-")
    reps = [frontier_schedule_dedup(spark, materialize_dir=mat)
            for _ in range(4)]
    for r in reps:
        print(json.dumps(r))
    spark.stop()


def run_queries() -> None:
    spark = _spark()
    import __spark_entry__ as entrymod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[2:] or [
        "q01_wave_slice_topk", "q04_min_depth_merge", "q08_dedup_rownum",
        "q13_tpch_q1", "q14_revenue_join", "q16_dedup_exact",
        "q18_minhash_sig", "q20_jaccard_pairs", "q21_cosine_topk",
    ]
    qs = entrymod.queries()
    out = {}
    for name in names:
        samples = []
        for _ in range(4):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        out[name] = round(statistics.median(samples[1:]), 3)
        print(name, [round(s, 3) for s in samples])
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "e2e"
    {"e2e": run_e2e, "kernel": run_kernel, "queries": run_queries}[mode]()
