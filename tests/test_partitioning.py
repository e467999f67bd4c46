"""Salted repartitioning on host-hash (SURVEY.md §2.8; BASELINE.json:6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from simplecrawler_spark.operators.partitioning import repartition_salted


def _skewed(spark, n=2000):
    # 90% of rows on one hot host
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot.test"))
         .otherwise(F.concat(F.lit("h"), (F.col("id") % 7).cast("string"),
                             F.lit(".test"))).alias("host"),
        F.xxhash64(F.col("id")).alias("url_hash"))


def test_unsalted_spreads_uniformly(spark):
    df = repartition_salted(_skewed(spark), 8, salt_buckets=0)
    sizes = [len(p) for p in df.rdd.glom().collect()]
    assert len(sizes) == 8
    # url_hash spread: no partition should hold more than ~2x the mean
    assert max(sizes) < 2 * (sum(sizes) / len(sizes))


def test_salted_bounds_host_fanout(spark):
    s = 4
    df = repartition_salted(_skewed(spark), 16, salt_buckets=s)
    parts = (df.withColumn("pid", F.spark_partition_id())
             .where(F.col("host") == "hot.test")
             .select("pid").distinct().count())
    # the hot host lands in at most `salt_buckets` distinct partitions
    assert 1 <= parts <= s


def test_salted_still_splits_hot_host(spark):
    # with salting, the hot host's rows are NOT all in one partition
    df = repartition_salted(_skewed(spark, 4000), 16, salt_buckets=4)
    sizes = (df.where(F.col("host") == "hot.test")
             .withColumn("pid", F.spark_partition_id())
             .groupBy("pid").count().collect())
    assert len(sizes) >= 2
    assert max(r["count"] for r in sizes) < 3600  # not all 3600 in one
