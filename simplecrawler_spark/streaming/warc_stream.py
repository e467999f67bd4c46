"""Streaming WARC ingest: watch a directory of archive shards and
continuously explode them into parsed record rows.

Common-Crawl-style corpora ARRIVE as archive drops — a fetch fleet
(or this engine's own crawl, via sources/warc.warc_record_expr) lands
whole WARC shards in object storage, and the corpus pipeline tails
the directory. Structured Streaming's file source is exactly that
tail: each micro-batch is the set of newly-landed shards, the
checkpoint guarantees each shard is processed exactly once across
restarts, and the per-shard parse is the SAME narrow
``parse_warc_text`` plan the batch path uses (one task per shard —
the archive is the parallel unit, so a 1000-executor cluster ingests
1000 shards concurrently with zero coordination).

Downstream composes as columns: WET extraction, cleaning gates, and
the streaming dedup (streaming/dedup_stream.py) all run per
micro-batch unchanged — batch/stream parity is structural, not
re-implemented, and is pinned by
tests/test_streaming.py::test_warc_stream_matches_batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simplecrawler_spark.sources.warc import parse_warc_text

__all__ = ["read_warc_stream", "start_warc_ingest"]


def read_warc_stream(spark: SparkSession, in_dir: str,
                     max_files_per_batch: int = 64) -> DataFrame:
    """Streaming DataFrame of parsed WARC records from a watched
    directory of text-mode archive shards (one record set per file;
    ``wholetext`` keeps each shard a single row so record numbering
    stays per-archive, exactly as the batch parser). The file name
    rides along as ``file_id``. ``max_files_per_batch`` bounds
    micro-batch size — the knob that keeps ingest latency flat when
    a backlog of shards lands at once."""
    # NB: DataStreamReader.text(path) drops previously-set options —
    # the explicit format/load form is required for wholetext
    raw = (spark.readStream.format("text")
           .option("wholetext", "true")
           .option("maxFilesPerTrigger", str(max_files_per_batch))
           .load(in_dir))
    arch = raw.select(
        F.input_file_name().alias("file_id"),
        F.col("value").alias("content"))
    return parse_warc_text(arch)


def start_warc_ingest(spark: SparkSession, in_dir: str, out_dir: str,
                      checkpoint_dir: str,
                      max_files_per_batch: int = 64):
    """Materialise the record stream to parquet with exactly-once
    file tracking: returns the started StreamingQuery (callers use
    ``trigger(availableNow)`` semantics via ``.awaitTermination``
    per drop, or leave it running). Restarting with the same
    checkpoint never re-ingests a shard."""
    recs = read_warc_stream(spark, in_dir, max_files_per_batch)
    return (recs.writeStream
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
