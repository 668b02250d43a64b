"""Per-round benchmark. Prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {<name>: sec, ...}, "sf": <sf>, ...extras}

Headline queries (timed at $SPARK_GRAFT_SF_DIR, default
/root/testdata/sf0.1, on local[$SPARK_GRAFT_CPUS]):
  - the north-star frontier schedule+dedup kernel (synthetic, lazy)
  - an end-to-end crawl on a Zipf graph
  - representative operator queries from __spark_entry__ at the sf dir
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from moca_spark.bench_core import crawl_end_to_end, frontier_schedule_dedup
from moca_spark.session import get_spark

HEADLINE = [
    "q01_wave_slice_topk",
    "q04_min_depth_merge",
    "q08_dedup_rownum",
    "q13_tpch_q1",
    "q14_revenue_join",
    "q16_dedup_exact",
    "q18_minhash_sig",
    "q20_jaccard_pairs",
    "q21_cosine_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(
        app_name="moca-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    times: dict[str, float] = {}

    # 1. north-star kernel: frontier URLs scheduled+deduped per second.
    #    Inputs materialized (untimed), best of 2 reps — the box has
    #    high run-to-run variance (see BENCH.md methodology).
    import tempfile

    mat = tempfile.mkdtemp(prefix="bench-kernel-")
    t0 = time.time()
    reps = [frontier_schedule_dedup(spark, materialize_dir=mat)
            for _ in range(2)]
    kernel = min(reps, key=lambda r: r["total_sec"])
    kernel["reps_total_sec"] = [r["total_sec"] for r in reps]
    times["frontier_kernel"] = kernel["total_sec"]
    times["frontier_kernel_wall"] = round(time.time() - t0, 3)

    # 2. end-to-end crawl
    t0 = time.time()
    crawl = crawl_end_to_end(spark)
    times["crawl_e2e"] = round(time.time() - t0, 3)

    # 3. operator headliners at the sf dir
    for name in HEADLINE:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)

    import shutil

    shutil.rmtree(mat, ignore_errors=True)
    total = round(sum(times.values()), 3)
    print(json.dumps({
        "metric": "frontier URLs scheduled+deduped/sec (north star) + headline query wall-clock",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "frontier_urls_per_sec": kernel["urls_per_sec"],
        "kernel": kernel,
        "crawl": crawl,
        "cpus": int(cpus),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
