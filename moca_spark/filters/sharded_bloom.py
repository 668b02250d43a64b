"""Sharded bloom filter: the seen-set pre-filter that actually scales
to 10^10 URLs.

A monolithic bloom for 10^10 keys at fpp 1e-3 is ~18 GB — far past
broadcast limits. The scalable layout shards the key space by
``shard = pmod(key, n_shards)`` and stores one bitmap per shard as a
ROW of a DataFrame/table (shard int, bits binary):

- build: groupBy(shard) -> applyInPandas builds each shard's bitmap
  from its keys only (bitmap sized for n_expected/n_shards);
- probe: candidates carry the same shard column; a shard-key join
  brings each candidate batch together with exactly its one bitmap
  row (co-partitioned — every executor holds only the shards it
  probes), then a vectorized numpy membership test per Arrow batch;
- maintain: per-wave new keys build a delta table the same way;
  OR-merge by shard is a groupBy on (shard) of a few-KB binaries.

Same discipline as filters/bloom.py: a MISS is definitive, a HIT goes
to the exact anti-join. Parity with the monolithic filter is tested.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from moca_spark.filters.bloom import BloomFilter

SHARD_SCHEMA = "shard int, bits binary"


def shard_of(key_col: F.Column, n_shards: int) -> F.Column:
    return F.pmod(key_col, F.lit(n_shards)).cast("int")


def build_sharded_bloom(
    keys: DataFrame, key_col: str, n_shards: int, n_expected: int,
    fpp: float = 1e-3,
) -> DataFrame:
    """(shard, bits) table; each shard bitmap sized for its share."""
    per_shard = max(n_expected // n_shards, 16)

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        bf = BloomFilter(per_shard, fpp)
        bf.add_many(pdf["k"].to_numpy())
        return pd.DataFrame({"shard": [int(pdf["shard"].iloc[0])],
                             "bits": [bf.to_bytes()]})

    return (
        keys.select(F.col(key_col).alias("k"),
                    shard_of(F.col(key_col), n_shards).alias("shard"))
        .groupBy("shard")
        .applyInPandas(build, SHARD_SCHEMA)
    )


def merge_sharded_blooms(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR-merge two shard tables (per-wave delta maintenance)."""

    def or_merge(pdf: pd.DataFrame) -> pd.DataFrame:
        merged = BloomFilter.from_bytes(pdf["bits"].iloc[0])
        for blob in pdf["bits"].iloc[1:]:
            merged.merge(BloomFilter.from_bytes(blob))
        return pd.DataFrame({"shard": [int(pdf["shard"].iloc[0])],
                             "bits": [merged.to_bytes()]})

    return a.unionByName(b).groupBy("shard").applyInPandas(or_merge, SHARD_SCHEMA)


def probe_sharded_bloom(
    candidates: DataFrame, key_col: str, shards: DataFrame, n_shards: int,
) -> DataFrame:
    """Tag candidates with ``_maybe_seen``. The join is shard-key
    equi-join: each candidate partition meets exactly one bitmap row
    (bitmaps total MBs across the cluster, never one broadcast blob).
    Candidates whose shard has no bitmap yet are definitively new."""
    from pyspark.sql.types import BooleanType, StructField, StructType

    tagged = candidates.withColumn("shard", shard_of(F.col(key_col), n_shards))
    joined = tagged.join(shards, "shard", "left")
    out_schema = StructType(
        list(candidates.schema.fields) + [StructField("_maybe_seen", BooleanType())]
    )

    def probe(pdfs):
        for pdf in pdfs:
            groups = []
            # group by the int shard id (unique per bitmap row), not
            # the multi-KB serialized bitmap
            for _shard, grp in pdf.groupby("shard", sort=False):
                blob = grp["bits"].iloc[0]
                if blob is None or (isinstance(blob, float) and pd.isna(blob)):
                    grp = grp.assign(_maybe_seen=False)
                else:
                    bf = BloomFilter.from_bytes(bytes(blob))
                    grp = grp.assign(
                        _maybe_seen=bf.contains_many(grp[key_col].to_numpy())
                    )
                groups.append(grp)
            res = pd.concat(groups) if groups else pdf.assign(_maybe_seen=False)
            yield res.drop(columns=["shard", "bits"])

    return joined.mapInPandas(probe, out_schema)
