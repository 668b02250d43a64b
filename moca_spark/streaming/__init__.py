from moca_spark.streaming.ingest import (  # noqa: F401
    stream_results_metrics,
    stream_seed_files,
)
