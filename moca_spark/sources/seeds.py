"""Spark-native seed-file source (S1).

``spark.read.text`` over seed files, split on ``|`` into
(url, id, criteria-name) with the reference's defaulting rules
(SeedInputParser.scala:22-32). Criteria blocks are a driver-side config
parse (criteria/dsl.py) — the reference does the same (client-side
parse, Client.scala:30-35); only the seed ROWS are data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moca_spark.criteria.dsl import CriteriaSpec, parse_criteria
from moca_spark.functions.urls import canonicalize_udf, url_sha1


def read_seed_file(
    spark: SparkSession, path: str
) -> tuple[DataFrame, dict[str, CriteriaSpec]]:
    """Returns (seed rows DataFrame, named criteria specs).

    Seed DF columns: work_id, seed_url (canonical), criteria_name
    ('' = default). Invalid URLs are dropped (Url.parse -> None
    semantics); id defaults to sha1(canonical url)."""
    lines = spark.read.text(path).select(F.trim("value").alias("line")) \
        .filter(F.length("line") > 0)
    # criteria lines are few: collect for the driver-side DSL parse
    crit_lines = [r.line for r in
                  lines.filter(F.col("line").startswith("!")).collect()]
    named = parse_criteria(crit_lines)

    parts = F.split(F.col("line"), r"\|")
    seeds = (
        lines.filter(~F.col("line").startswith("!"))
        .select(
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
    return seeds, named


def seeds_to_works(seeds: DataFrame, named: dict[str, CriteriaSpec]) -> list:
    """Driver-side materialization into Work objects for engine.add_works
    (batched collect — seeds are user input, bounded; the reference
    ships them 50 per message, Client.scala:71)."""
    from moca_spark.criteria.dsl import Work

    default = named.get("default", CriteriaSpec())
    return [
        Work(r.work_id, r.seed_url,
             named.get(r.criteria_name, default) if r.criteria_name else default)
        for r in seeds.collect()
    ]
