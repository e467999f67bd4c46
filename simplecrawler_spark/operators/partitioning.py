"""Salted repartitioning on host-hash (north rule, BASELINE.json:6).

The reference has no partitioning at all (its "engine" is one
queue.Queue, /root/reference/simple_crawler/crawler.py:81); at cluster
scale a hot domain would otherwise pin one executor. Two spreads:

* ``salt_buckets == 0`` (default): partition on url_hash — uniform
  spread, maximum balance, no host locality.
* ``salt_buckets == s > 0``: partition on
  ``xxhash64(host) + (url_hash mod s)`` — each host fans out across at
  most ``s`` partitions. Bounded fan-out keeps per-partition fetch
  batches host-coherent (connection reuse / per-host rate limiting in
  a networked fetcher) while still splitting hot hosts ``s`` ways.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_partition_key(host: Column, url_hash: Column,
                         salt_buckets: int) -> Column:
    """Partitioning expression: host-hash plus a url-derived salt in
    [0, salt_buckets)."""
    if salt_buckets <= 0:
        return url_hash
    return F.xxhash64(host) + F.pmod(url_hash, F.lit(salt_buckets))


def repartition_salted(df: DataFrame, n_parts: int,
                       salt_buckets: int = 0,
                       host_col: str = "host",
                       hash_col: str = "url_hash") -> DataFrame:
    """Rebalance a frontier batch for the fetch stage (SURVEY.md §2.8)."""
    key = salted_partition_key(F.col(host_col), F.col(hash_col),
                               salt_buckets)
    return df.repartition(n_parts, key)


__all__ = ["salted_partition_key", "repartition_salted"]
