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
import shutil

from pyspark.sql import DataFrame, SparkSession


class CheckpointStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

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
        frontier.write.mode("overwrite").parquet(os.path.join(d, "frontier"))
        seen.write.mode("overwrite").parquet(os.path.join(d, "seen"))
        if results is not None:
            results.write.mode("overwrite").parquet(os.path.join(d, "results"))
        if metrics is not None:
            metrics.write.mode("overwrite").parquet(os.path.join(d, "metrics"))
        tmp = os.path.join(d, "_COMMIT.tmp")
        with open(tmp, "w") as f:
            json.dump({"wave": wave, **(extra or {})}, f)
        os.rename(tmp, os.path.join(d, "_COMMIT"))  # atomic publish
        return (
            self.spark.read.parquet(os.path.join(d, "frontier")),
            self.spark.read.parquet(os.path.join(d, "seen")),
        )

    def write_increment(self, wave: int, name: str, df: DataFrame) -> DataFrame:
        """Write a per-wave append table (results/metrics) ahead of the
        commit marker; returns the re-read frame (lineage truncation)."""
        d = os.path.join(self._wave_dir(wave), name)
        df.write.mode("overwrite").parquet(d)
        return self.spark.read.parquet(d)

    def load_wave(self, wave: int) -> tuple[DataFrame, DataFrame]:
        d = self._wave_dir(wave)
        return (
            self.spark.read.parquet(os.path.join(d, "frontier")),
            self.spark.read.parquet(os.path.join(d, "seen")),
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
