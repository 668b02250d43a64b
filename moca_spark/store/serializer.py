"""Content serialization (S7) + content sinks (S5/S6).

The reference serializes fetched content as JSON
``{url, status, headers, content: base64}`` (errors as ``{url, error}``,
store/content/serializer/JsonContentSerializer.scala:17-27, format doc
README.md:66-79) and writes one object per fetch under
``taskId/urlId`` (FSContentRepo.scala:45-61, S3ContentRepo.scala:111-143).

Spark-native: the serialization is pure column algebra
(``to_json(struct(...))`` + ``base64``); the sink is a partitioned
write — ``run_id/wave`` directories stand in for the taskId prefix, and
the same writer targets any Hadoop-compatible FS (local, S3A, ...),
which subsumes both the FS and S3 repos of the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def serialize_content(fetched: DataFrame) -> DataFrame:
    """Add a ``content_json`` column mirroring JsonContentSerializer:
    success -> {url, status, headers, content(base64)};
    failure -> {url, error}."""
    ok = F.to_json(
        F.struct(
            F.col("url"),
            F.lit(200).alias("status"),
            F.create_map(
                F.lit("Content-Type"),
                F.array(F.concat(F.lit("image/"), F.col("fmt"))),
            ).alias("headers"),
            F.base64(F.col("bytes")).alias("content"),
        )
    )
    err = F.to_json(
        F.struct(F.col("url"), F.lit("fetch failed").alias("error"))
    )
    return fetched.withColumn(
        "content_json", F.when(F.col("bytes").isNotNull(), ok).otherwise(err)
    )


def write_content_repo(fetched: DataFrame, out_dir: str) -> None:
    """Persist serialized content partitioned by run/wave (the
    ``taskId/urlId`` keying of FSContentRepo/S3ContentRepo)."""
    serialize_content(fetched).select(
        "run_id", "wave", "url", "depth", "content_hash", "content_json"
    ).write.partitionBy("run_id", "wave").mode("append").parquet(out_dir)


def read_content_repo(spark, out_dir: str) -> DataFrame:
    """Result-manifest scan (S8): stream back (depth, url, uri, hash)."""
    df = spark.read.parquet(out_dir)
    return df.select(
        "run_id", "wave", "url", "depth", "content_hash",
        F.concat_ws("/", "run_id", "wave", F.sha1(F.encode("url", "UTF-8")))
        .alias("content_uri"),
    )
