"""Streaming SINKS: idempotent foreachBatch writers into engine tables.

Reference: SparkWrite.java:204 (StreamingAppend — idempotent per epoch id),
:208 (complete mode = per-epoch dynamic overwrite), Flink
IcebergFilesCommitter.java:65 (exactly one commit per checkpoint, dedup by
checkpoint id stored in snapshot summary), upsert writer
BaseDeltaTaskWriter/EqualityDeltaWriter -> realized as foreachBatch MERGE.

foreachBatch re-runs a batch after failure with the SAME epoch id, so
commits record the epoch in the snapshot summary and skip already-committed
epochs — at-least-once delivery + idempotent commit = exactly-once table
state.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame

EPOCH_KEY = "streaming-epoch-id"
QUERY_KEY = "streaming-query-id"


def _already_committed(table, query_id: str, epoch_id: int) -> bool:
    for s in table.metadata.snapshots:
        if (s.summary.get(QUERY_KEY) == query_id
                and s.summary.get(EPOCH_KEY) == str(epoch_id)):
            return True
    return False


def append_sink(table, query_id: str = "default") -> Callable[[DataFrame, int], None]:
    """foreachBatch(append) with epoch-id dedupe."""

    def fn(df: DataFrame, epoch_id: int):
        t = table.refresh()
        if _already_committed(t, query_id, epoch_id):
            return
        from ..writes import FastAppend, write_data_files

        files = write_data_files(t, df)
        FastAppend(t, files, summary_extra={
            EPOCH_KEY: str(epoch_id), QUERY_KEY: query_id,
        }).commit()

    return fn


def complete_overwrite_sink(table, query_id: str = "complete") -> Callable:
    """Complete-mode: each epoch dynamically overwrites touched partitions."""

    def fn(df: DataFrame, epoch_id: int):
        t = table.refresh()
        if _already_committed(t, query_id, epoch_id):
            return
        snap = t.dynamic_partition_overwrite(df)
        # record epoch for idempotence
        from dataclasses import replace as _r

        m = t.metadata
        snaps = tuple(
            _r(s, summary={**s.summary, EPOCH_KEY: str(epoch_id), QUERY_KEY: query_id})
            if s.snapshot_id == snap.snapshot_id else s
            for s in m.snapshots
        )
        t._commit_metadata(_r(m, snapshots=snaps))

    return fn


def upsert_sink(table, keys: list, query_id: str = "upsert") -> Callable:
    """Streaming upsert (equality-delete upsert analog): per-epoch MERGE on
    the key columns — update matched, insert new."""

    def fn(df: DataFrame, epoch_id: int):
        t = table.refresh()
        if _already_committed(t, query_id, epoch_id):
            return
        # dedupe within the batch: last row per key wins
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        w = Window.partitionBy(*keys).orderBy(F.monotonically_increasing_id().desc())
        src = (df.withColumn("__rn", F.row_number().over(w))
                 .filter(F.col("__rn") == 1).drop("__rn"))
        snap = (t.merge(src, on=keys)
                  .when_matched_update(set=None)
                  .when_not_matched_insert(values=None)
                  .execute())
        from dataclasses import replace as _r

        m = t.metadata
        snaps = tuple(
            _r(s, summary={**s.summary, EPOCH_KEY: str(epoch_id), QUERY_KEY: query_id})
            if snap is not None and s.snapshot_id == snap.snapshot_id else s
            for s in m.snapshots
        )
        t._commit_metadata(_r(m, snapshots=snaps))

    return fn


def equality_upsert_sink(table, keys: list,
                         query_id: str = "eq_upsert") -> Callable:
    """Streaming upsert via equality deletes — the Flink upsert-writer path
    (BaseDeltaTaskWriter / EqualityDeltaWriter): each epoch commits one
    equality-delete file over the batch keys plus the new rows, never
    reading the target. Idempotent per epoch-id."""

    def fn(df: DataFrame, epoch_id: int):
        t = table.refresh()
        if _already_committed(t, query_id, epoch_id):
            return
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        w = Window.partitionBy(*keys).orderBy(F.monotonically_increasing_id().desc())
        src = (df.withColumn("__rn", F.row_number().over(w))
                 .filter(F.col("__rn") == 1).drop("__rn"))
        from ..row_ops import equality_upsert

        snap = equality_upsert(t, src, keys)
        from dataclasses import replace as _r

        m = t.metadata
        snaps = tuple(
            _r(s, summary={**s.summary, EPOCH_KEY: str(epoch_id), QUERY_KEY: query_id})
            if s.snapshot_id == snap.snapshot_id else s
            for s in m.snapshots
        )
        t._commit_metadata(_r(m, snapshots=snaps))

    return fn


def write_stream_to_table(stream_df: DataFrame, table, mode: str = "append",
                          keys: Optional[list] = None, query_id: str = "stream",
                          checkpoint_dir: Optional[str] = None, trigger: Optional[dict] = None):
    """Attach a real Structured Streaming query to an engine table via
    foreachBatch (writeStream.foreachBatch(...), SURVEY §2.K sink mapping).
    Returns the StreamingQuery; caller drives it (processAllAvailable/stop).
    """
    if mode == "append":
        fn = append_sink(table, query_id)
    elif mode == "complete":
        fn = complete_overwrite_sink(table, query_id)
    elif mode == "upsert":
        if not keys:
            raise ValueError("upsert mode requires keys")
        fn = upsert_sink(table, keys, query_id)
    else:
        raise ValueError(f"unknown mode {mode}")
    w = stream_df.writeStream.foreachBatch(lambda df, eid: fn(df, eid))
    if checkpoint_dir:
        w = w.option("checkpointLocation", checkpoint_dir)
    if trigger:
        w = w.trigger(**trigger)
    return w.start()
