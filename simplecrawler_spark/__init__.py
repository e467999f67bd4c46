"""simplecrawler_spark — a PySpark-native batch-iterative URL-frontier
crawl engine with the query semantics of jackwardell/SimpleCrawler.

Not a port: the reference (read-only at /root/reference) is an
in-process FIFO queue + thread pool; this engine is a driver-side
round loop over DataFrames with snapshot-per-round state tables
(Iceberg-shaped storage layer, Parquet+manifest emulation in sandbox).

Public surface:
    FrontierCrawler  — plans.crawl (the engine; reference: Crawler,
                       /root/reference/simple_crawler/crawler.py:33)
    CrawlConfig      — config dataclass (reference config dict,
                       crawler.py:90-101)
    canonicalize_df  — URL canonicalisation over DataFrame columns
                       (reference url_normalisation.py)
"""

from simplecrawler_spark.config import CrawlConfig

__all__ = ["CrawlConfig", "FrontierCrawler"]
__version__ = "0.1.0"


def __getattr__(name):  # lazy: plans.crawl pulls in pyspark at import
    if name == "FrontierCrawler":
        from simplecrawler_spark.plans.crawl import FrontierCrawler

        return FrontierCrawler
    raise AttributeError(name)
