"""The fetch stage: corpus join + per-host politeness token bucket.

The reference fetches one URL at a time per task, scheduling the next
fetch ``interval`` after the previous completes (role/Task.scala:12,
role/worker/Minion.scala:154-156; WorkerTest.scala:70-71 asserts the
gap). In the rebuild the fetch is an equi-join against the image+caption
corpus (JVM-side), followed by a per-host ``applyInPandas`` stage that
enforces the token bucket: within a host's wave batch, row ``rank`` is
granted fetch time ``(rank-1) * interval`` — serial, politeness-spaced.

In a real deployment the pandas function is where the HTTP GETs happen
(serially per host group, sleeping on the bucket); here it stamps the
deterministic schedule so tests can assert spacing/order. The Spark
plumbing — host-grouped Arrow batches, schema, budget — is the real
thing (north rule: token buckets inside mapInPandas fetch stages).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StructField, StructType


def fetch_with_token_bucket(
    joined: DataFrame, interval_s: float, wave: int, budget: int
) -> DataFrame:
    """Add ``fetch_time_s`` to a corpus-joined wave slice.

    ``joined`` must carry (host, rank, ...). Each host group is one
    Arrow batch; the bucket grants rank r the instant
    wave_start + (r-1)*interval, with wave_start = (wave-1)*budget*interval
    (waves are back-to-back politeness windows)."""
    out_schema = StructType(
        joined.schema.fields + [StructField("fetch_time_s", DoubleType())]
    )
    wave_start = (wave - 1) * budget * interval_s

    def bucket(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rank")
        # token bucket: one token per interval, serial within the host
        pdf["fetch_time_s"] = wave_start + (pdf["rank"] - 1) * interval_s
        return pdf

    return joined.groupBy("host").applyInPandas(bucket, out_schema)
