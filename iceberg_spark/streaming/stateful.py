"""Custom stateful streaming operators — applyInPandasWithState.

The reference's Flink runtime builds custom keyed-state operators for
exactly this shape of work (flink/.../sink and source operators keep
per-key state across checkpoints); the Spark-native equivalent is
Structured Streaming's `applyInPandasWithState` (GroupState + timeouts,
Arrow-batched). This module provides gap-based SESSIONIZATION as a
genuine `readStream` pipeline: file/table source -> watermark ->
per-key session state -> closed sessions appended to an engine table
through the idempotent foreachBatch sink.

Scale shape: state is per KEY (user), partitioned by Spark's streaming
state store across executors; each micro-batch touches only keys with
new events plus keys whose event-time timeout fired. Nothing here is
driver-side — the engine sink's commit is the only driver action per
epoch.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("start_us", T.LongType()),
    T.StructField("last_us", T.LongType()),
    T.StructField("n", T.LongType()),
])


def _sessionizer(gap_s: int):
    """Per-key state function: events extend the open session while they
    arrive within `gap_s` of its end; a gap splits immediately (the
    closed session emits in THIS batch), and the event-time timeout
    closes an idle session once the watermark passes end + gap."""
    gap_us = gap_s * 1_000_000

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        out = []
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            out.append((user_id, start_us, last_us, n))
            state.remove()
        else:
            ts_us = sorted(
                int(t.value // 1000)  # pandas ns -> us
                for pdf in pdfs for t in pdf["ts"])
            if ts_us:
                if state.exists:
                    start_us, last_us, n = state.get
                else:
                    start_us, last_us, n = ts_us[0], ts_us[0] - gap_us - 1, 0
                    # sentinel "no open session": first event below opens
                for t_us in ts_us:
                    if n and t_us - last_us > gap_us:
                        out.append((user_id, start_us, last_us, n))
                        start_us, n = t_us, 0
                    elif not n:
                        start_us = t_us
                    last_us = max(last_us, t_us)
                    n += 1
                state.update((start_us, last_us, n))
                # close via event-time timeout when the WATERMARK passes
                # session end + gap (ms API)
                state.setTimeoutTimestamp(last_us // 1000 + gap_s * 1000)
        if out:
            yield pd.DataFrame(out, columns=["user_id", "start_us",
                                             "last_us", "n"]).assign(
                session_start=lambda d: pd.to_datetime(d.pop("start_us"),
                                                       unit="us"),
                session_end=lambda d: pd.to_datetime(d.pop("last_us"),
                                                     unit="us"),
                n_events=lambda d: d.pop("n"),
            )[["user_id", "session_start", "session_end", "n_events"]]

    return fn


def sessionize_stream(events: DataFrame, gap_s: int,
                      key_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """Streaming DataFrame of (key, ts, ...) -> streaming DataFrame of
    CLOSED sessions (gap-based, `gap_s` inactivity). Watermark delay =
    gap so a session's timeout can only fire once no in-order event can
    reopen it."""
    ev = events.select(F.col(key_col).cast("long").alias("user_id"),
                       F.col(ts_col).alias("ts"))
    return (ev.withWatermark("ts", f"{gap_s} seconds")
              .groupBy("user_id")
              .applyInPandasWithState(
                  _sessionizer(gap_s), SESSION_SCHEMA, _STATE_SCHEMA,
                  "append", GroupStateTimeout.EventTimeTimeout))


def run_sessionize_to_table(spark, input_dir: str, schema: T.StructType,
                            sink_table, gap_s: int,
                            checkpoint_dir: str,
                            key_col: str = "user_id",
                            ts_col: str = "ts"):
    """readStream(parquet dir) -> sessionize -> engine table via the
    idempotent epoch sink. Returns the StreamingQuery (caller drives
    processAllAvailable / stop)."""
    from .sinks import append_sink

    src = spark.readStream.schema(schema).parquet(input_dir)
    sessions = sessionize_stream(src, gap_s, key_col, ts_col)
    sink = append_sink(sink_table, query_id="sessionize")
    return (sessions.writeStream
            .foreachBatch(lambda df, eid: sink(df, eid))
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .start())
