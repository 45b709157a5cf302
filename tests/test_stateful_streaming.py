"""Genuine Structured Streaming stateful operator: readStream ->
applyInPandasWithState sessionization (event-time timeouts) ->
idempotent engine sink (SURVEY K: custom stateful operators)."""

import os
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
])


def _write_batch(spark, d, rows, n):
    # flat files: Spark's file stream source monitors the top-level dir
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us"))}),
        os.path.join(d, f"b{n}.parquet"))


def test_streaming_sessionization(catalog, spark, tmp_path):
    from datetime import datetime as dt

    from iceberg_spark.streaming.stateful import run_sessionize_to_table

    gap = 60  # 1-minute inactivity gap
    inp = str(tmp_path / "in")
    os.makedirs(inp)

    def t(m, s=0):
        return dt(2026, 1, 1, 10, m, s)

    # user 1: two sessions (10:00-10:01, then 10:10); user 2: one session
    _write_batch(spark, inp, [(1, t(0)), (1, t(0, 30)), (1, t(1)),
                              (2, t(0, 10))], 0)
    sink_t = catalog.create_table("db.sessions", T._parse_datatype_string(
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events long"))
    q = run_sessionize_to_table(
        spark, inp, SCHEMA, sink_t, gap,
        str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
        # nothing closed yet: watermark hasn't passed any session+gap
        assert sink_t.refresh().to_df().count() == 0

        # batch 2: user 1 returns at 10:10 -> gap SPLIT closes the first
        # session immediately; watermark (10:10 - 60s) also passes user
        # 2's 10:00:10+gap so its timeout fires next batch
        _write_batch(spark, inp, [(1, t(10))], 1)
        q.processAllAvailable()
        _write_batch(spark, inp, [(3, t(20))], 2)  # advances watermark
        q.processAllAvailable()
        _write_batch(spark, inp, [(3, t(40))], 3)  # fires remaining timeouts
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {(r.user_id, r.session_start, r.session_end, r.n_events)
            for r in sink_t.refresh().to_df().collect()}
    assert (1, t(0), t(1), 3) in rows          # split-closed session
    assert (2, t(0, 10), t(0, 10), 1) in rows  # timeout-closed session
    # user 1's second session (10:10) closed by a later watermark
    assert (1, t(10), t(10), 1) in rows
