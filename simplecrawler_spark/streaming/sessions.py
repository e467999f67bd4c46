"""Gap-based sessionization — the custom STATEFUL streaming operator
(`applyInPandasWithState`), with a declarative batch twin.

Sessionization (events of one key group into a session until a quiet
gap exceeds the threshold) is the canonical stateful transform that
windowed aggregation can NOT express: session boundaries depend on
the data, not the clock grid. The crawl analogue is per-host fetch
activity; the pipeline analogue is user activity over the `events`
table. The reference has no streaming surface at all — this is
engine-new capability, same family as streaming/rollup.py.

Two implementations of ONE contract:

  * ``sessionize_batch`` — lag/cumulative-sum window functions, pure
    built-ins; this is the driver-oracle twin (DuckDB replays it with
    the identical SQL shape) and the parity baseline for the stream.
  * ``stream_sessionize`` — Structured Streaming
    ``applyInPandasWithState``: per-key session state lives in the
    state store, closes either when a later event in the stream
    reveals a gap or when the EVENT-TIME TIMEOUT fires (the watermark
    passes last_event + gap). Emitted rows are identical to the batch
    twin's CLOSED sessions; parity is pinned by
    tests/test_streaming.py::test_stream_sessionize_matches_batch.

Scale shape: the batch twin shuffles once on the key (per-key window
sort — parallel over keys, no global window); the streaming twin's
state is one fixed-width tuple per ACTIVE key, bounded by the
watermark-driven timeout — without the timeout every key ever seen
would stay resident at 10^10-event scale.

Timestamps ride as tz-free epoch microseconds computed with
``timestampdiff(MICROSECOND, TIMESTAMP_NTZ epoch, ts)`` — naive
arithmetic identical in Spark (any session timezone) and DuckDB's
``epoch_us``; pandas' ``Timestamp.value`` (ns, naive) agrees on the
Python side. Values are floor-scaled to cents per row before any sum
(long arithmetic — order-independent), same contract as rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from simplecrawler_spark.streaming.rollup import EVENTS_SCHEMA

__all__ = ["sessionize_batch", "stream_sessionize"]

TS_US = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"

SESSION_SCHEMA = ("user_id long, start_us long, end_us long, "
                  "n_events long, value_cents long")
_STATE_SCHEMA = ("start_us long, end_us long, n_events long, "
                 "value_cents long")


def sessionize_batch(events: DataFrame, gap_sec: int = 86400,
                     id_col: str = "user_id") -> DataFrame:
    """Batch twin: a new session starts where the gap to the previous
    event of the same key exceeds ``gap_sec``; session id is the
    running count of such starts. One shuffle on the key; the lag and
    the cumulative sum share the same (key, ts) sort."""
    gap_us = int(gap_sec) * 1_000_000
    base = events.select(
        F.col(id_col), F.expr(TS_US).alias("ts_us"),
        F.floor(F.col("value") * 100).cast("long").alias("v_cents"))
    w = Window.partitionBy(id_col).orderBy("ts_us")
    run = Window.partitionBy(id_col).orderBy("ts_us") \
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = base.withColumn(
        "new_sess",
        F.when(F.col("ts_us") - F.lag("ts_us").over(w) > gap_us, 1)
        .when(F.lag("ts_us").over(w).isNull(), 1).otherwise(0))
    return (flagged
            .withColumn("sess", F.sum("new_sess").over(run))
            .groupBy(id_col, "sess")
            .agg(F.min("ts_us").alias("start_us"),
                 F.max("ts_us").alias("end_us"),
                 F.count("*").alias("n_events"),
                 F.sum("v_cents").alias("value_cents"))
            .drop("sess"))


def stream_sessionize(spark: SparkSession, events_dir: str,
                      gap_sec: int = 86400,
                      watermark: str = "2 days") -> DataFrame:
    """Streaming twin over a parquet drop-directory. Each key's open
    session is one state-store tuple; a micro-batch's events extend or
    close it, and the event-time timeout (watermark past
    last_event + gap) closes sessions no later event will ever join —
    that timeout is the state bound. Append output mode: only CLOSED
    sessions are emitted, exactly once."""
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    gap_us = int(gap_sec) * 1_000_000

    def fn(key, pdfs, state: GroupState):
        uid = key[0]

        def close(rows):
            return pd.DataFrame(
                rows, columns=["user_id", "start_us", "end_us",
                               "n_events", "value_cents"])

        if state.hasTimedOut:
            s, e, n, v = state.get
            state.remove()
            yield close([(uid, s, e, n, v)])
            return
        ev = pd.concat(list(pdfs)).sort_values("ts")
        # unit-explicit: Arrow may hand datetime64[ns] or [us]
        ts_us = ev["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        cents = (ev["value"] * 100).map(lambda x: int(x // 1))
        cur = list(state.get) if state.exists else None
        closed = []
        for t, c in zip(ts_us, cents):
            t, c = int(t), int(c)
            if cur is None:
                cur = [t, t, 1, c]
            elif t - cur[1] > gap_us:
                closed.append((uid, *cur))
                cur = [t, t, 1, c]
            else:
                cur[1] = max(cur[1], t)
                cur[2] += 1
                cur[3] += c
        wm_ms = state.getCurrentWatermarkMs()
        close_at_ms = cur[1] // 1000 + gap_sec * 1000
        if close_at_ms <= wm_ms:
            # the watermark already passed this session's close time —
            # a timeout would be in the past (disallowed); close now
            closed.append((uid, *cur))
            state.remove()
        else:
            state.update(tuple(cur))
            state.setTimeoutTimestamp(close_at_ms)
        yield close(closed)

    src = (spark.readStream.schema(EVENTS_SCHEMA)
           .option("maxFilesPerTrigger", 8)
           .parquet(events_dir)
           .withWatermark("ts", watermark)
           .select("user_id", "ts", "value"))
    return src.groupBy("user_id").applyInPandasWithState(
        fn, SESSION_SCHEMA, _STATE_SCHEMA, "append",
        GroupStateTimeout.EventTimeTimeout)
