"""K7: table maintenance as part of the streaming job.

Reference: flink/v2.1/flink/src/main/java/org/apache/iceberg/flink/
maintenance/api/RewriteDataFiles.java:43 (compaction scheduled on
commit-count / file-count triggers inside the streaming topology) and
MaintenanceTaskBuilder scheduling knobs. Here the scheduler piggybacks on
the micro-batch commit path: wrap any foreachBatch sink and after each
committed epoch the trigger conditions are evaluated against table
metadata only (snapshot count, small-file count from the live plan — no
data read); when a threshold trips, binpack compaction and optional
snapshot expiry run inline as ordinary Spark jobs.
"""

from __future__ import annotations

from typing import Callable, Optional


class MaintenanceScheduler:
    """Compaction-on-threshold for streaming ingest.

    every_n_commits: run after this many new snapshots since the last
    maintenance pass. min_small_files: OR-trigger when the live plan holds
    at least this many under-target files (the Flink trigger's
    fileCount equivalent). expire_keep_last: when set, expire_snapshots
    retaining that many ancestors runs after compaction.
    """

    def __init__(self, table, every_n_commits: int = 10,
                 min_small_files: Optional[int] = None,
                 target_file_size: int = 0,
                 expire_keep_last: Optional[int] = None):
        self.table = table
        self.every_n_commits = max(1, every_n_commits)
        self.min_small_files = min_small_files
        self.target_file_size = target_file_size
        self.expire_keep_last = expire_keep_last
        self._last_count = len(table.metadata.snapshots)
        self.runs: list = []  # maintenance results, for observability

    # -- triggers (metadata-only, no data read) -----------------------------
    def _small_file_count(self, t) -> int:
        from ..maintenance import DEFAULT_TARGET_FILE_SIZE

        target = self.target_file_size or int(t.properties.get(
            "write.target-file-size-bytes", DEFAULT_TARGET_FILE_SIZE))
        plan = t.scan().plan_files()
        return sum(1 for e in plan.files
                   if e.file.file_size_in_bytes < target)

    def should_run(self) -> bool:
        t = self.table.refresh()
        if len(t.metadata.snapshots) - self._last_count >= self.every_n_commits:
            return True
        return (self.min_small_files is not None
                and self._small_file_count(t) >= self.min_small_files)

    # -- actions ------------------------------------------------------------
    def run_once(self) -> dict:
        from ..maintenance import expire_snapshots, rewrite_data_files

        t = self.table.refresh()
        res = {"compaction": rewrite_data_files(
            t, "binpack", target_file_size=self.target_file_size)}
        if self.expire_keep_last is not None:
            res["expire"] = expire_snapshots(
                t, retain_last=self.expire_keep_last)
        self._last_count = len(self.table.refresh().metadata.snapshots)
        self.runs.append(res)
        return res

    def maybe_run(self) -> Optional[dict]:
        return self.run_once() if self.should_run() else None

    # -- composition with foreachBatch sinks --------------------------------
    def wrap(self, sink_fn: Callable) -> Callable:
        """Wrap a foreachBatch sink: commit the epoch, then evaluate the
        maintenance triggers (maintenance failures never fail the batch —
        compaction is retryable, ingest is not)."""

        def fn(df, epoch_id):
            sink_fn(df, epoch_id)
            try:
                self.maybe_run()
            except Exception:  # noqa: BLE001 — next epoch retriggers
                pass

        return fn


def run_maintenance(table, every_n_commits: int = 10, **kw) -> MaintenanceScheduler:
    """Convenience: build a scheduler for `table`; call `.wrap(sink)` in a
    streaming job or `.maybe_run()` from any commit loop."""
    return MaintenanceScheduler(table, every_n_commits=every_n_commits, **kw)
