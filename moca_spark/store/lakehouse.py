"""Wave-checkpoint store: exactly-once resumable crawl state.

The reference gets durability from Akka persistence (event journal +
snapshots, role/master/Master.scala:47-87,160-181; per-task replay,
role/worker/Minion.scala:46-66) and PostgreSQL transactions
(store/control/PgRunControl.scala). The Spark-native equivalent is
table-format snapshot commits: every wave writes the full frontier +
seen state and appends results/metrics, then atomically publishes a
commit marker. Resume = read the latest committed wave; a re-run of a
half-finished wave is invisible (its directory lacks the marker and is
overwritten).

On a production cluster this is one Iceberg transaction per wave
(``df.writeTo(...).overwritePartitions()`` + snapshot expiry); this
module implements the identical protocol on plain Parquet directories
so it runs hermetically here:

    <root>/wave=<n>/frontier/...   full state (overwrite semantics)
    <root>/wave=<n>/seen/...
    <root>/wave=<n>/results/...    per-wave increment (append semantics)
    <root>/wave=<n>/metrics/...
    <root>/wave=<n>/_COMMIT        atomic rename publishes the wave

The commit marker is written last; readers ignore uncommitted waves, so
a crash at any point resumes from the previous wave with no duplicate
or lost state (the reference's exactly-once recovery guarantee, T3-T5).
"""

from __future__ import annotations

import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

# State tables are keyed/bucketed by these (see engine.STATE_KEYS):
# hash first, string key kept for exactness.
_BUCKET_COLS = ("_key", "run_id", "url")


class CheckpointStore:
    def __init__(self, spark: SparkSession, root: str, bucket_state: int = 0):
        """``bucket_state=N`` writes the frontier/seen snapshots as
        N-bucket tables (bucketBy+sortBy on the state keys, one file
        per bucket) instead of plain parquet. Re-reads then come back
        hash-partitioned AND sorted, so snapshot mode's per-wave state
        joins run exchange-free on the state side exactly like the
        in-memory modes — and a RESUMED run starts co-partitioned
        instead of paying a one-time full-state shuffle. This is the
        plain-parquet stand-in for an Iceberg table with a bucket
        partition transform (README divergence #6)."""
        self.spark = spark
        self.root = root
        self.bucket_state = bucket_state
        os.makedirs(root, exist_ok=True)

    def _table_name(self, wave: int, name: str) -> str:
        slug = re.sub(r"[^0-9a-zA-Z]+", "_", self.root).strip("_").lower()
        return f"moca_chk_{slug}_w{wave}_{name}"

    def _write_state(self, wave: int, name: str, df: DataFrame) -> None:
        d = os.path.join(self._wave_dir(wave), name)
        if not self.bucket_state:
            df.write.mode("overwrite").parquet(d)
            return
        n = self.bucket_state
        tbl = self._table_name(wave, name)
        self.spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        # repartition by the same keys Spark's bucketing hashes -> one
        # file per bucket, which keeps the sortBy order usable by SMJ
        (
            df.repartition(n, *_BUCKET_COLS)
            .write.mode("overwrite").format("parquet")
            .bucketBy(n, *_BUCKET_COLS).sortBy(*_BUCKET_COLS)
            .option("path", d)
            .saveAsTable(tbl)
        )

    def _read_state(self, wave: int, name: str) -> DataFrame:
        d = os.path.join(self._wave_dir(wave), name)
        if not self.bucket_state:
            return self.spark.read.parquet(d)
        tbl = self._table_name(wave, name)
        if not self.spark.catalog.tableExists(tbl):
            # fresh session (resume): re-register the bucketed table
            # over the existing files — the in-memory catalog does not
            # survive restarts, the bucketed layout on disk does
            schema = self.spark.read.parquet(d).schema
            ddl = ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
            )
            self.spark.sql(
                f"CREATE TABLE {tbl} ({ddl}) USING PARQUET "
                f"CLUSTERED BY ({', '.join(_BUCKET_COLS)}) "
                f"SORTED BY ({', '.join(_BUCKET_COLS)}) "
                f"INTO {self.bucket_state} BUCKETS LOCATION '{d}'"
            )
        return self.spark.table(tbl)

    def _wave_dir(self, wave: int) -> str:
        return os.path.join(self.root, f"wave={wave}")

    def committed_waves(self) -> list[int]:
        out = []
        if not os.path.isdir(self.root):
            return out
        for name in os.listdir(self.root):
            if name.startswith("wave="):
                w = int(name.split("=", 1)[1])
                if os.path.exists(os.path.join(self.root, name, "_COMMIT")):
                    out.append(w)
        return sorted(out)

    def latest_wave(self) -> int | None:
        waves = self.committed_waves()
        return waves[-1] if waves else None

    def commit_wave(
        self,
        wave: int,
        frontier: DataFrame,
        seen: DataFrame,
        results: DataFrame | None,
        metrics: DataFrame | None,
        extra: dict | None = None,
    ) -> tuple[DataFrame, DataFrame]:
        """Write one wave transactionally; returns re-read (checkpointed)
        frontier/seen so the caller's lineage is truncated to a scan.
        Increments (results/metrics) may have been pre-written via
        ``write_increment``; uncommitted leftovers from a crash are
        simply overwritten subdir-by-subdir (every wave writes the same
        four subdirs, and readers ignore marker-less waves)."""
        d = self._wave_dir(wave)
        self._write_state(wave, "frontier", frontier)
        self._write_state(wave, "seen", seen)
        if results is not None:
            results.write.mode("overwrite").parquet(os.path.join(d, "results"))
        if metrics is not None:
            metrics.write.mode("overwrite").parquet(os.path.join(d, "metrics"))
        tmp = os.path.join(d, "_COMMIT.tmp")
        with open(tmp, "w") as f:
            json.dump({"wave": wave, **(extra or {})}, f)
        os.rename(tmp, os.path.join(d, "_COMMIT"))  # atomic publish
        return (
            self._read_state(wave, "frontier"),
            self._read_state(wave, "seen"),
        )

    def write_increment(self, wave: int, name: str, df: DataFrame) -> DataFrame:
        """Write a per-wave append table (results/metrics) ahead of the
        commit marker; returns the re-read frame (lineage truncation)."""
        d = os.path.join(self._wave_dir(wave), name)
        df.write.mode("overwrite").parquet(d)
        return self.spark.read.parquet(d)

    def load_wave(self, wave: int) -> tuple[DataFrame, DataFrame]:
        return (
            self._read_state(wave, "frontier"),
            self._read_state(wave, "seen"),
        )

    def all_results(self) -> DataFrame | None:
        paths = [
            os.path.join(self._wave_dir(w), "results")
            for w in self.committed_waves()
            if os.path.isdir(os.path.join(self._wave_dir(w), "results"))
        ]
        return self.spark.read.parquet(*paths) if paths else None

    def all_metrics(self) -> DataFrame | None:
        paths = [
            os.path.join(self._wave_dir(w), "metrics")
            for w in self.committed_waves()
            if os.path.isdir(os.path.join(self._wave_dir(w), "metrics"))
        ]
        return self.spark.read.parquet(*paths) if paths else None

    def expire_snapshots(self, keep_last: int = 2) -> None:
        """Iceberg expire_snapshots analog (T4): drop old wave state dirs
        (results/metrics increments are kept — they are the output)."""
        waves = self.committed_waves()
        for w in waves[:-keep_last] if keep_last else waves:
            for sub in ("frontier", "seen"):
                p = os.path.join(self._wave_dir(w), sub)
                if os.path.isdir(p):
                    shutil.rmtree(p)
                if self.bucket_state:
                    self.spark.sql(
                        f"DROP TABLE IF EXISTS {self._table_name(w, sub)}"
                    )


def _corpus_table_name(path: str) -> str:
    slug = re.sub(r"[^0-9a-zA-Z]+", "_", path).strip("_").lower()
    return f"moca_corpus_{slug}"


def write_corpus_bucketed(
    spark: SparkSession, images: DataFrame, path: str, n_buckets: int = 64,
    row_group_bytes: int = 8 * 1024 * 1024,
) -> DataFrame:
    """Write the fetch corpus as a bucketed table on ``image_id``,
    sorted by ``image_id`` within buckets, with parquet row-group bloom
    filters on image_id — the layout that makes the engine's per-wave
    fetch join read O(slice) (engine._pruned_images pushes the slice
    ids; tools/fetch_bench.py measures the flatness):

    - bucket pruning: the slice-derived In filters select only the
      bucket files the wave's ids hash to (``SelectedBucketsCount``);
    - row-group skipping: sorted image_id gives tight min/max stats
      per row group, so each pushed-In chunk touches ~chunk-many row
      groups; the bloom filters skip on exact membership even where
      stats are loose. Row groups are capped at ``row_group_bytes``
      (point lookups want granular skipping, not 128 MB scan units).

    One file per bucket (repartition matches the bucket hash). On a
    real deployment this is an Iceberg table with a ``bucket(N,
    image_id)`` partition transform + sorted data files (README
    divergence #6). Returns the re-read table."""
    tbl = _corpus_table_name(path)
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    (
        images.repartition(n_buckets, "image_id")
        .write.mode("overwrite").format("parquet")
        .bucketBy(n_buckets, "image_id").sortBy("image_id")
        .option("parquet.bloom.filter.enabled#image_id", "true")
        .option("parquet.block.size", str(row_group_bytes))
        .option("path", path)
        .saveAsTable(tbl)
    )
    with open(os.path.join(path, "_corpus_meta.json"), "w") as f:
        json.dump({"n_buckets": n_buckets}, f)
    return spark.table(tbl)


def read_corpus_bucketed(spark: SparkSession, path: str) -> DataFrame:
    """Re-register a bucketed corpus written by ``write_corpus_bucketed``
    in a fresh session (the in-memory catalog does not survive
    restarts; the bucketed layout on disk does)."""
    tbl = _corpus_table_name(path)
    if not spark.catalog.tableExists(tbl):
        with open(os.path.join(path, "_corpus_meta.json")) as f:
            n_buckets = json.load(f)["n_buckets"]
        schema = spark.read.parquet(path).schema
        ddl = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
        )
        spark.sql(
            f"CREATE TABLE {tbl} ({ddl}) USING PARQUET "
            f"CLUSTERED BY (image_id) SORTED BY (image_id) "
            f"INTO {n_buckets} BUCKETS LOCATION '{path}'"
        )
    return spark.table(tbl)


class EventLogStore(CheckpointStore):
    """Append-only event-log layout — the write path that survives a
    10^10-row frontier.

    The base CheckpointStore rewrites the FULL frontier + seen tables
    every wave: O(|frontier|) write amplification per wave, untenable
    at the north-star scale. This layout appends only the wave's DELTA
    as events and reconstructs state by aggregation:

        event: (run_id, url, host, depth, seq, kind, wave)
          kind 'add'     — URL admitted to the frontier at (depth, seq)
          kind 'consume' — URL fetched at depth (incl. fetch failures)

    Reconstruction exploits the invariant that a URL's depth strictly
    decreases through its lifecycle (admission requires depth <
    best-seen; J1/T8):

        am = min over adds of (depth, seq);  cd = min over consume depth
        pending iff cd is null or am.depth < cd   -> frontier row
        seen    iff cd not null, best_depth = cd  -> seen row

    Per wave: write O(|slice| + |fresh|) and read NOTHING — the engine
    chains the live state in memory (localCheckpoint); reconstruction
    by aggregation runs only on resume and after ``compact()``. The log
    IS the journal (T3): the commit marker publishes the wave's events
    atomically; replay = re-aggregate committed events. This mirrors a
    merge-on-read Iceberg/Hudi table with periodic compaction."""

    def append_events(self, wave: int, events: DataFrame,
                      extra: dict | None = None) -> None:
        d = self._wave_dir(wave)
        events.write.mode("overwrite").parquet(os.path.join(d, "events"))
        tmp = os.path.join(d, "_COMMIT.tmp")
        with open(tmp, "w") as f:
            json.dump({"wave": wave, **(extra or {})}, f)
        os.rename(tmp, os.path.join(d, "_COMMIT"))

    def read_log(self) -> DataFrame | None:
        paths = [
            os.path.join(self._wave_dir(w), "events")
            for w in self.committed_waves()
            if os.path.isdir(os.path.join(self._wave_dir(w), "events"))
        ]
        return self.spark.read.parquet(*paths) if paths else None

    def compact(self, wave: int) -> None:
        """Fold the whole log into a single minimal event set (one add
        per pending url, one consume per seen url) written as wave
        ``wave``'s events; older wave dirs are dropped. The periodic
        compaction of the merge-on-read layout."""
        from pyspark.sql import functions as F

        log = self.read_log()
        if log is None:
            return
        state = _reconstruct_state(log)
        frontier, seen = state
        adds = frontier.select(
            "run_id", "url", "host", "depth", "seq",
            F.lit("add").alias("kind"), F.lit(wave).alias("wave"),
        )
        consumes = seen.select(
            "run_id", "url",
            F.lit(None).cast("string").alias("host"),
            F.col("best_depth").alias("depth"),
            F.lit(None).cast("long").alias("seq"),
            F.lit("consume").alias("kind"), F.lit(wave).alias("wave"),
        )
        compacted = adds.unionByName(consumes).localCheckpoint(eager=True)
        old = self.committed_waves()
        self.append_events(wave, compacted, extra={"compacted": True})
        # drop only the EVENT deltas of older waves — their markers and
        # results/metrics increments remain (they are the crawl output)
        for w in old:
            if w != wave:
                shutil.rmtree(os.path.join(self._wave_dir(w), "events"),
                              ignore_errors=True)


def _reconstruct_state(log: DataFrame):
    """(frontier, seen) from the event log — two mins per (run, url)."""
    from pyspark.sql import functions as F

    state = log.groupBy("run_id", "url").agg(
        F.min(
            F.when(F.col("kind") == "add", F.struct("depth", "seq"))
        ).alias("am"),
        F.min(
            F.when(F.col("kind") == "consume", F.col("depth"))
        ).alias("cd"),
        F.max(F.when(F.col("kind") == "add", F.col("host"))).alias("host"),
    )
    frontier = (
        state.filter(
            F.col("am").isNotNull()
            & (F.col("cd").isNull() | (F.col("am.depth") < F.col("cd")))
        )
        .select("run_id", "url", "host",
                F.col("am.depth").alias("depth"), F.col("am.seq").alias("seq"))
    )
    seen = state.filter(F.col("cd").isNotNull()).select(
        "run_id", "url", F.col("cd").alias("best_depth")
    )
    return frontier, seen
