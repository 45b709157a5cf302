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


WATERMARK_KEY = "streaming-watermark"


def watermark_window_sink(table, time_col: str, agg_keys: list,
                          delay_s: int, window: str = "day",
                          query_id: str = "wm") -> Callable:
    """Stateful windowed count with event-time watermark (the foreachBatch
    realization of `withWatermark(col, delay)` + windowed agg; Flink kin:
    ColumnStatsWatermarkExtractor.java:39 drives split order, this drives
    state finalization). Per epoch:

      1. rows older than the current watermark (max event time over all
         PRIOR epochs minus delay) are dropped as late;
      2. survivors roll into per-(window-start, keys) counts held in the
         state table (complete-mode overwrite — state is window-keyed and
         bounded, never row-sized);
      3. the watermark advances on ALL batch rows (late rows still advance
         event time, as in Spark) and persists in the snapshot summary, so
         a restarted query resumes with the exact same cutoff.

    Idempotent per epoch id like every sink here."""

    def _parse_wm(raw):
        try:
            return int(raw)
        except ValueError:  # pre-micros checkpoints stored ISO-8601
            import datetime as _dt

            d = _dt.datetime.fromisoformat(raw)
            if d.tzinfo is not None:
                d = d.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            return int((d - _dt.datetime(1970, 1, 1))
                       // _dt.timedelta(microseconds=1))

    def fn(df: DataFrame, epoch_id: int):
        from pyspark.sql import functions as F

        t = table.refresh()
        if _already_committed(t, query_id, epoch_id):
            return
        # watermark rides in the snapshot summary as epoch MICROSECONDS —
        # tz-free, so a non-UTC driver cannot shift the cutoff (naive
        # datetime round-trips through collect() use the driver's local
        # zone, not the UTC session)
        wm_us = None
        for s in sorted(t.metadata.snapshots,
                        key=lambda s: s.sequence_number, reverse=True):
            if s.summary.get(QUERY_KEY) == query_id and WATERMARK_KEY in s.summary:
                wm_us = _parse_wm(s.summary[WATERMARK_KEY])
                break
        ts = F.col(time_col).cast("timestamp")
        us = F.unix_micros(ts)
        kept = df if wm_us is None else df.filter(us >= F.lit(wm_us))
        partial = (kept.groupBy(
                       F.date_trunc(window, ts).alias("win_start"), *agg_keys)
                   .agg(F.count(F.lit(1)).alias("n")))
        if t.current_snapshot() is not None:
            partial = (t.to_df().unionByName(partial)
                       .groupBy("win_start", *agg_keys)
                       .agg(F.sum("n").alias("n")))
        partial = partial.withColumn("n", F.col("n").cast("long"))
        mx = df.agg(F.max(us)).collect()[0][0]  # driver scalar, commit-sized
        new_wm = wm_us
        if mx is not None:
            cand = int(mx) - delay_s * 1_000_000
            new_wm = cand if (new_wm is None or cand > new_wm) else new_wm
        # ONE commit carries state + epoch marker + watermark: a crash can
        # never land the state without the marker (re-delivery would
        # double-count the read-modify-write accumulation)
        extra = {EPOCH_KEY: str(epoch_id), QUERY_KEY: query_id}
        if new_wm is not None:
            extra[WATERMARK_KEY] = str(new_wm)
        t.overwrite(partial, summary_extra=extra)

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
