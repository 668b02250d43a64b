"""Wave slicing: the per-host priority queue as DataFrame ops.

The reference's PartitionScheduler keeps ≤1 in-flight task per host
(role/master/scheduler/PartitionScheduler.scala:9-63) and Minion fetches
its FIFO head one URL per 5 s (role/worker/Minion.scala:70-90,
role/Task.scala:12). In the rebuild both collapse into one operator:
every wave takes the top-``budget`` frontier rows per host in
(depth, seq, run_id, url) order — the host's exclusive, politeness-
bounded, BFS-ordered slice.

The naive formulation — ``row_number() over (partition by host order
by ...)`` — sorts EVERY pending row of a host on one task. A hot host
with 10^8 pending URLs (Zipf head at the 10^10-frontier target) turns
that into a single-task sort. This module implements salted two-phase
top-K instead:

  phase 1: rank within (host, salt) — salt = crc-ish hash of url into
           ``n_salts`` buckets, so a hot host's sort spreads over
           ``n_salts`` tasks; keep rank <= K per salted group;
  phase 2: exact rank over the surviving <= n_salts*K rows per host —
           a tiny window — keep rank <= K.

Result is EXACTLY the unsalted top-K (phase 1 can never drop a row
phase 2 would keep), with the skew broken. Ordering-sensitive work
stays keyed by host; salting applies only inside the reduction — the
pattern the north rule prescribes for hot-host skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ORDER_COLS = ["depth", "seq", "run_id", "url"]


def top_k_per_host(
    frontier: DataFrame, k: int, n_salts: int = 16, host_col: str = "host"
) -> DataFrame:
    """Top-``k`` rows per host by (depth, seq, run_id, url), with exact
    per-host ``rank`` (1..k = politeness fetch order) — salted two-phase."""
    order = [F.col(c) for c in ORDER_COLS]
    if n_salts > 1:
        salt = F.pmod(F.xxhash64("url"), F.lit(n_salts))
        w1 = Window.partitionBy(F.col(host_col), salt).orderBy(*order)
        pre = (
            frontier.withColumn("_r1", F.row_number().over(w1))
            .filter(F.col("_r1") <= k)
            .drop("_r1")
        )
    else:
        pre = frontier
    w2 = Window.partitionBy(host_col).orderBy(*order)
    return (
        pre.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )
