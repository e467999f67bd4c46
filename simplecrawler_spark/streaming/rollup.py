"""Windowed event rollup — the Structured Streaming aggregation
pattern (watermark + tumbling window) the ingest pipeline
(streaming/ingest.py) deliberately does not need.

The SAME declarative transformation serves both engines modes:

  * ``event_window_rollup(df)`` — works on a batch DataFrame (the
    driver's oracle gate runs it this way) AND on a streaming
    DataFrame (groupBy(window(...)) is supported in both).
  * ``stream_event_rollup(spark, dir)`` — wires it to a parquet file
    source with a watermark, so late events beyond the lateness bound
    stop updating their window's state and the state store stays
    bounded. Drain with ``availableNow`` for batch catch-up, or leave
    running for continuous rollup.

Batch/stream parity is pinned by
tests/test_streaming.py::test_stream_rollup_matches_batch — the
streamed result (complete mode into a memory sink) must equal the
batch run on the same files.

Scale shape: a streaming windowed count is a map-side-combinable
partial agg per micro-batch merged into the state store keyed by
(window, event_type); the watermark is what bounds that state at
10^10-event scale — without it every window ever seen stays resident.
Output carries epoch seconds (long), not timestamps, so cross-engine
comparison never hits timezone/format drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def event_window_rollup(events: DataFrame,
                        window: str = "1 hour") -> DataFrame:
    """Tumbling-window counts + floor-scaled value sums per
    event_type. Pure built-ins; identical semantics batch or
    streaming. Value sums are floor-scaled per ROW before the sum
    (sum of longs — exact and order-independent), so the oracle twin
    can never drift on float addition order. The window start is
    exported as its WALL-CLOCK string (parquet timestamps arrive as
    TIMESTAMP_NTZ; a string is timezone-proof in both engines, where
    an epoch cast would shift with the session timezone)."""
    return (events
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum(F.floor(F.col("value") * 100).cast("long"))
                 .alias("value_cents"))
            .select(F.col("w.start").cast("string").alias("win_start"),
                    "event_type", "n_events", "value_cents"))


def stream_event_rollup(spark: SparkSession, events_dir: str,
                        window: str = "1 hour",
                        watermark: str = "2 hours") -> DataFrame:
    """Streaming variant over a parquet drop-directory: event-time
    watermark bounds the window state; returns the streaming
    DataFrame (attach a writeStream sink; availableNow drains the
    present files and stops)."""
    src = (spark.readStream.schema(EVENTS_SCHEMA)
           .option("maxFilesPerTrigger", 8)
           .parquet(events_dir))
    return event_window_rollup(src.withWatermark("ts", watermark),
                               window=window)


__all__ = ["EVENTS_SCHEMA", "event_window_rollup", "stream_event_rollup"]
