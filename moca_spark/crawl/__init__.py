from moca_spark.crawl.engine import CrawlEngine, CrawlResult  # noqa: F401
from moca_spark.crawl.oracle import oracle_crawl  # noqa: F401
