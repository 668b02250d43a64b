from moca_spark.store.lakehouse import CheckpointStore  # noqa: F401
