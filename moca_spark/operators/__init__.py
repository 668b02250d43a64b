from moca_spark.operators.wave import top_k_per_host  # noqa: F401
