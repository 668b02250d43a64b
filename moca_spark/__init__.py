"""moca_spark — a PySpark-native crawl-frontier analytics engine.

A from-scratch rebuild of the capabilities of lucastorri/moca (an
Akka-based distributed crawler) on Apache Spark:

- URL kernel (canonicalize / hash / host / domain) as vectorized
  Arrow/pandas UDFs and built-in functions (moca: url/Url.scala).
- A global URL frontier held in partitioned tables instead of actor
  mailboxes + PostgreSQL rows (moca: store/control/PgRunControl*.scala).
- Per-host exclusive, politeness-bounded, BFS-ordered scheduling
  expressed as window-rank wave slicing instead of the
  PartitionScheduler actor (moca: role/master/scheduler/*.scala).
- Bloom/cuckoo URL-seen pre-filters feeding exact anti-joins
  (moca: role/worker/Minion.scala downloaded set).
- Link-selection criteria compiled to DataFrame filter stages
  (moca: criteria/*.scala).
- Checkpointed, exactly-once resumable wave commits
  (moca: Akka persistence journal + snapshots).

Everything is DataFrame-first: joins, aggregations and windows run
JVM-side under Catalyst/Tungsten; Python appears only in Arrow-batched
pandas UDFs (canonicalization, PSL domains, image decode).
"""

__version__ = "0.1.0"

from moca_spark.session import get_spark  # noqa: F401
