"""Unit tests for the wave-slice operator (the PartitionScheduler
analog): salted two-phase top-K must EQUAL the naive single-window
formulation on arbitrary frontiers — ranks included."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from moca_spark.operators.wave import ORDER_COLS, top_k_per_host


def naive_topk(frontier, k):
    w = Window.partitionBy("host").orderBy(*[F.col(c) for c in ORDER_COLS])
    return frontier.withColumn("rank", F.row_number().over(w)) \
        .filter(F.col("rank") <= k)


def random_frontier(spark, n, n_hosts, seed):
    return (
        spark.range(n)
        .select(
            F.concat(F.lit("http://h"),
                     F.pmod(F.xxhash64(F.col("id") + seed), F.lit(n_hosts)),
                     F.lit(".test/p"), F.col("id")).alias("url"),
            F.concat(F.lit("h"),
                     F.pmod(F.xxhash64(F.col("id") + seed), F.lit(n_hosts)),
                     F.lit(".test")).alias("host"),
            F.pmod(F.xxhash64(F.col("id") + seed + 1), F.lit(5)).cast("int")
            .alias("depth"),
            F.pmod(F.xxhash64(F.col("id") + seed + 2), F.lit(1000))
            .alias("seq"),
            F.lit("r1").alias("run_id"),
        )
    )


@pytest.mark.parametrize("n,n_hosts,k,salts,seed", [
    (500, 7, 3, 8, 1),      # hot hosts, small k
    (500, 100, 5, 4, 2),    # many hosts
    (200, 1, 10, 16, 3),    # single giant host (max skew)
    (50, 60, 2, 8, 4),      # more hosts than rows
])
def test_salted_topk_equals_naive(spark, n, n_hosts, k, salts, seed):
    fr = random_frontier(spark, n, n_hosts, seed)
    got = sorted(
        tuple(r) for r in
        top_k_per_host(fr, k, n_salts=salts)
        .select("host", "rank", "url", "depth", "seq").collect()
    )
    want = sorted(
        tuple(r) for r in
        naive_topk(fr, k).select("host", "rank", "url", "depth", "seq").collect()
    )
    assert got == want


def test_topk_duplicate_order_keys(spark):
    """Ties on (depth, seq) resolve deterministically by (run_id, url)
    — idempotent-add semantics of the scheduler (J6)."""
    rows = [("r1", f"http://h.test/{c}", "h.test", 1, 5) for c in "dcba"]
    fr = spark.createDataFrame(
        rows, "run_id string, url string, host string, depth int, seq long"
    )
    got = [r.url for r in top_k_per_host(fr, 2, n_salts=4)
           .orderBy("rank").collect()]
    assert got == ["http://h.test/a", "http://h.test/b"]
