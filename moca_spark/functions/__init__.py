from moca_spark.functions.urls import (  # noqa: F401
    canonicalize_udf,
    domain_udf,
    canonicalize_str,
    url_domain,
    url_host,
    with_url_columns,
)
