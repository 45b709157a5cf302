"""Micro-batch streaming SOURCE over the snapshot log.

Reference: spark/.../source/SparkMicroBatchStream.java:59,115,131,220
(offset = (snapshotId, position, scanAllFiles); rate limiting by
max-files/max-rows per batch; initial offset persisted to the checkpoint
location, :265-311 InitialOffsetStore) and Flink's
StreamingMonitorFunction.java:60 (monitor snapshots, emit splits).

PySpark cannot register a custom Structured Streaming source (DSv2/Scala
only — SURVEY §2.K), so the source is an explicit incremental-batch loop
with exactly the same offset/checkpoint semantics: each call to
`process_available(fn)` discovers snapshots committed since the last
checkpointed offset, plans their added files, rate-limits into batches,
calls fn(df, epoch_id), and persists the new offset after each batch.
Combined with the idempotent foreachBatch sinks (sinks.py) this gives the
same exactly-once end-to-end behavior as the reference's source+committer.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame

from .. import expressions as E
from ..manifests import DATA, DELETED as ST_DELETED, read_manifest, read_manifest_list
from ..scan import ScanPlan, ScanReport, TableScan, plan_to_df


@dataclass
class StreamingOffset:
    """(snapshot_id, file_position, scan_all_files) — StreamingOffset.java:39-44."""

    snapshot_id: Optional[int]
    position: int = 0
    scan_all_files: bool = False

    def to_json(self):
        return json.dumps(self.__dict__)

    @staticmethod
    def from_json(s):
        return StreamingOffset(**json.loads(s))


class MicroBatchStream:
    def __init__(self, table, checkpoint_dir: str,
                 max_files_per_batch: Optional[int] = None,
                 max_rows_per_batch: Optional[int] = None,
                 from_snapshot_id: Optional[int] = None,
                 watermark_column: Optional[str] = None,
                 skip_delete_snapshots: bool = False,
                 skip_overwrite_snapshots: bool = False):
        self.table = table
        self.checkpoint_dir = checkpoint_dir
        self.max_files = max_files_per_batch
        self.max_rows = max_rows_per_batch
        self.watermark_column = watermark_column
        # streaming-skip-delete/overwrite-snapshots (SparkReadOptions):
        # default is the reference's shouldProcess contract — a stream
        # positioned over a row-changing snapshot ERRORS rather than
        # silently emitting replaced rows as fresh inserts
        self.skip_delete = skip_delete_snapshots
        self.skip_overwrite = skip_overwrite_snapshots
        from ..io import resolve_io

        self._io = resolve_io(checkpoint_dir, table.spark)
        self._io.mkdirs(checkpoint_dir)
        self._offset_path = os.path.join(checkpoint_dir, "offset.json")
        if not self._io.exists(self._offset_path):
            # initial offset: start *after* current snapshot unless told
            init = StreamingOffset(from_snapshot_id
                                   if from_snapshot_id is not None
                                   else table.metadata.current_snapshot_id)
            self._write_offset(init)

    # -- offset store (InitialOffsetStore analog) ---------------------------
    def offset(self) -> StreamingOffset:
        return StreamingOffset.from_json(
            self._io.read_text(self._offset_path))

    def _write_offset(self, off: StreamingOffset):
        self._io.write_text(self._offset_path, off.to_json())

    # -- planning -----------------------------------------------------------
    def _pending_entries(self):
        """Added data files per snapshot since the offset, oldest first.
        Files within a snapshot are ordered by min(watermark_column) when a
        watermark column is set (ColumnStatsWatermarkExtractor.java:39)."""
        t = self.table.refresh()
        m = t.metadata
        off = self.offset()
        cur = m.current_snapshot_id
        if cur is None:
            return []
        chain = list(reversed(m.ancestors_of(cur)))
        if off.snapshot_id is not None:
            ids = [s.snapshot_id for s in chain]
            if off.snapshot_id in ids:
                chain = chain[ids.index(off.snapshot_id) + 1 :]
        out = []
        for snap in chain:
            if snap.operation == "replace":
                continue  # compaction adds no new rows
            if snap.operation == "delete":
                if self.skip_delete:
                    continue
                raise ValueError(
                    f"cannot process delete snapshot {snap.snapshot_id} "
                    "in a streaming read: set skip_delete_snapshots=True "
                    "to skip row-deleting snapshots "
                    "(streaming-skip-delete-snapshots)")
            if snap.operation == "overwrite":
                if self.skip_overwrite:
                    continue
                raise ValueError(
                    f"cannot process overwrite snapshot "
                    f"{snap.snapshot_id} in a streaming read: set "
                    "skip_overwrite_snapshots=True to skip them "
                    "(streaming-skip-overwrite-snapshots)")
            entries = []
            for mf in read_manifest_list(snap.manifest_list):
                if mf.added_snapshot_id != snap.snapshot_id:
                    continue
                spec = m.spec_by_id(mf.spec_id)
                for e in read_manifest(mf.path, m.schema, spec):
                    if (e.status == 1 and e.snapshot_id == snap.snapshot_id
                            and e.file.content == DATA):
                        entries.append(e)
            if self.watermark_column:
                def wm(e):
                    st = e.file.stats.get(self.watermark_column)
                    return (st[0] is None, st[0]) if st else (True, None)

                entries.sort(key=wm)
            out.append((snap, entries))
        return out

    def _batches(self):
        """Split pending files into rate-limited (offset, entries) batches."""
        pending = self._pending_entries()
        for snap, entries in pending:
            off = self.offset()
            start = off.position if off.snapshot_id == snap.snapshot_id else 0
            entries = entries[start:]
            while entries:
                batch = entries
                if self.max_files:
                    batch = entries[: self.max_files]
                if self.max_rows:
                    acc, rows = [], 0
                    for e in batch:
                        acc.append(e)
                        rows += e.file.record_count
                        if rows >= self.max_rows:
                            break
                    batch = acc
                pos = start + len(batch)
                done = len(batch) == len(entries)
                yield snap, batch, StreamingOffset(
                    snap.snapshot_id, 0 if done else pos, False
                ), done
                entries = entries[len(batch):]
                start = pos

    # -- driving ------------------------------------------------------------
    def process_available(self, fn: Callable[[DataFrame, int], None],
                          max_batches: Optional[int] = None) -> int:
        """Trigger.AvailableNow analog: drain all pending batches through
        fn(df, epoch_id); offset persisted after each batch."""
        n = 0
        for snap, entries, next_off, _done in self._batches():
            scan = TableScan(self.table, snapshot=snap)
            sub = ScanPlan(entries, [], [], E.ALWAYS_TRUE, snap, ScanReport())
            df = plan_to_df(scan, sub, with_metadata_columns=False)
            epoch = (snap.snapshot_id << 12) | (next_off.position & 0xFFF)
            fn(df, epoch)
            self._write_offset(next_off)
            n += 1
            if max_batches and n >= max_batches:
                break
        return n

    def read_pending_df(self) -> Optional[DataFrame]:
        """All pending rows as one DataFrame (advances offset to the end)."""
        parts = []
        last_off = None
        for snap, entries, next_off, _done in self._batches():
            scan = TableScan(self.table, snapshot=snap)
            sub = ScanPlan(entries, [], [], E.ALWAYS_TRUE, snap, ScanReport())
            parts.append(plan_to_df(scan, sub, with_metadata_columns=False))
            last_off = next_off
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        if last_off:
            self._write_offset(last_off)
        return out
