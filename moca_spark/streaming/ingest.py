"""Structured Streaming surfaces.

The crawl loop itself is an iterative batch (SURVEY §1.4: streaming
cannot express the one-in-flight-slice-per-host exclusivity barrier —
the reference is wave-structured per task too). What IS naturally
streaming:

- seed ingestion (the reference's long-running Client role accepting
  `moca -s` submissions, role/client/Client.scala:30-35): a file-source
  stream over a seeds drop-directory, canonicalized on the fly and
  appended to a seeds table the driver loop picks up between waves;
- operational metrics: a windowed aggregation over the results stream
  (fetches/sec per host with late-data watermark) — the reference only
  ever logged counts (A7); here it's a real streaming agg.

Both run with ``Trigger.AvailableNow`` in tests (hermetic, no clock).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moca_spark.functions.urls import canonicalize_udf, url_sha1


def stream_seed_files(
    spark: SparkSession, drop_dir: str, out_dir: str, checkpoint: str
):
    """Watch ``drop_dir`` for seed files; append canonical seed rows to
    ``out_dir`` (parquet). Returns the streaming query (caller awaits).
    Criteria blocks are ignored by the stream (config, not data) —
    submit them via the DSL parse as in sources/seeds.py."""
    lines = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 16)
        .load(drop_dir)
        .select(F.trim("value").alias("line"))
        .filter((F.length("line") > 0) & ~F.col("line").startswith("!"))
    )
    parts = F.split(F.col("line"), r"\|")
    seeds = (
        lines.select(
            canonicalize_udf(F.trim(F.get(parts, 0))).alias("seed_url"),
            F.trim(F.coalesce(F.get(parts, 1), F.lit(""))).alias("given_id"),
            F.trim(F.coalesce(F.get(parts, 2), F.lit(""))).alias("criteria_name"),
        )
        .filter(F.col("seed_url").isNotNull())
        .select(
            F.when(F.col("given_id") != "", F.col("given_id"))
            .otherwise(url_sha1(F.col("seed_url"))).alias("work_id"),
            "seed_url",
            "criteria_name",
        )
    )
    return (
        seeds.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_results_metrics(
    results_stream: DataFrame, window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Windowed fetch metrics over a (host, fetched, event_time) stream
    with a late-data watermark — ready for ``writeStream`` to any sink."""
    return (
        results_stream.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("w"), "host")
        .agg(
            F.count("*").alias("scheduled"),
            F.sum(F.col("fetched").cast("long")).alias("fetched"),
        )
        .select(
            F.col("w.start").alias("window_start"), "host", "scheduled",
            "fetched",
        )
    )
