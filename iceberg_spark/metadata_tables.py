"""Queryable metadata tables — the 16 tables of core/.../MetadataTableType.java:23.

`table.metadata_table("files")` etc. return DataFrames. Snapshot-level
tables (snapshots/history/refs/manifests) materialize from the metadata
JSON + manifest lists — driver-small by construction. The file-level
tables (entries/files/all_* and the partitions rollup built on them) are
DISTRIBUTED scans of the manifest Parquet via
metadata_df.entries_table_df (core/.../BaseFilesTable.java analog), so a
`SELECT * FROM t.files` on a 100 TB table never materializes entry rows
on the driver.

Implemented: snapshots, history, refs, manifests, all_manifests, entries,
all_entries, files, data_files, delete_files, all_files, all_data_files,
all_delete_files, partitions, metadata_log_entries, position_deletes.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .manifests import DATA, DELETED, read_manifest_list, value_to_json
from .metadata import TableMetadata
from .metadata_df import entries_table_df

METADATA_TABLES = (
    "snapshots", "history", "refs", "manifests", "all_manifests", "entries",
    "all_entries", "files", "data_files", "delete_files", "all_files",
    "all_data_files", "all_delete_files", "partitions", "metadata_log_entries",
    "position_deletes", "scan_reports",
)


def metadata_table(table, name: str) -> DataFrame:
    name = name.lower()
    if name not in METADATA_TABLES:
        raise ValueError(f"unknown metadata table {name}; one of {METADATA_TABLES}")
    return _BUILDERS[name](table)


def _snapshots(table) -> DataFrame:
    m: TableMetadata = table.metadata
    rows = [
        (s.timestamp_ms, s.snapshot_id, s.parent_snapshot_id, s.operation,
         s.manifest_list, json.dumps(s.summary), s.sequence_number)
        for s in m.snapshots
    ]
    schema = T.StructType([
        T.StructField("committed_at_ms", T.LongType()),
        T.StructField("snapshot_id", T.LongType()),
        T.StructField("parent_id", T.LongType()),
        T.StructField("operation", T.StringType()),
        T.StructField("manifest_list", T.StringType()),
        T.StructField("summary", T.StringType()),
        T.StructField("sequence_number", T.LongType()),
    ])
    return table.spark.createDataFrame(rows, schema)


def _history(table) -> DataFrame:
    m = table.metadata
    ancestors = {s.snapshot_id for s in m.ancestors_of(m.current_snapshot_id)}
    rows = [
        (ts, sid, sid in ancestors) for ts, sid in m.snapshot_log
    ]
    schema = T.StructType([
        T.StructField("made_current_at_ms", T.LongType()),
        T.StructField("snapshot_id", T.LongType()),
        T.StructField("is_current_ancestor", T.BooleanType()),
    ])
    return table.spark.createDataFrame(rows, schema)


def _refs(table) -> DataFrame:
    rows = [
        (name, r.type, r.snapshot_id, r.max_ref_age_ms, r.max_snapshot_age_ms,
         r.min_snapshots_to_keep)
        for name, r in table.metadata.refs.items()
    ]
    schema = T.StructType([
        T.StructField("name", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("snapshot_id", T.LongType()),
        T.StructField("max_reference_age_in_ms", T.LongType()),
        T.StructField("max_snapshot_age_in_ms", T.LongType()),
        T.StructField("min_snapshots_to_keep", T.IntegerType()),
    ])
    return table.spark.createDataFrame(rows, schema)


def _manifest_rows(table, snapshots) -> list:
    out = []
    seen = set()
    for s in snapshots:
        for mf in read_manifest_list(s.manifest_list):
            key = (s.snapshot_id, mf.path)
            if key in seen:
                continue
            seen.add(key)
            out.append((
                mf.path, mf.length, mf.spec_id, mf.content, s.snapshot_id,
                mf.added_snapshot_id, mf.added_files_count, mf.existing_files_count,
                mf.deleted_files_count, mf.added_rows_count, mf.existing_rows_count,
                mf.deleted_rows_count,
                json.dumps([[n, cn, value_to_json(mn), value_to_json(mx)]
                            for n, cn, mn, mx in mf.partitions]),
            ))
    return out


_MANIFESTS_SCHEMA = T.StructType([
    T.StructField("path", T.StringType()),
    T.StructField("length", T.LongType()),
    T.StructField("partition_spec_id", T.IntegerType()),
    T.StructField("content", T.IntegerType()),
    T.StructField("reference_snapshot_id", T.LongType()),
    T.StructField("added_snapshot_id", T.LongType()),
    T.StructField("added_data_files_count", T.IntegerType()),
    T.StructField("existing_data_files_count", T.IntegerType()),
    T.StructField("deleted_data_files_count", T.IntegerType()),
    T.StructField("added_rows_count", T.LongType()),
    T.StructField("existing_rows_count", T.LongType()),
    T.StructField("deleted_rows_count", T.LongType()),
    T.StructField("partition_summaries", T.StringType()),
])


def _manifests(table) -> DataFrame:
    snap = table.metadata.current_snapshot()
    rows = _manifest_rows(table, [snap] if snap else [])
    return table.spark.createDataFrame(rows, _MANIFESTS_SCHEMA)


def _all_manifests(table) -> DataFrame:
    rows = _manifest_rows(table, table.metadata.snapshots)
    return table.spark.createDataFrame(rows, _MANIFESTS_SCHEMA)


def _current_snaps(table):
    s = table.metadata.current_snapshot()
    return [s] if s else []


def _entries(table) -> DataFrame:
    return entries_table_df(table, _current_snaps(table))


def _all_entries(table) -> DataFrame:
    return entries_table_df(table, table.metadata.snapshots)


def _files(table) -> DataFrame:
    return entries_table_df(table, _current_snaps(table), statuses=(0, 1))


def _data_files(table) -> DataFrame:
    return entries_table_df(table, _current_snaps(table), statuses=(0, 1),
                            contents=(0,))


def _delete_files(table) -> DataFrame:
    return entries_table_df(table, _current_snaps(table), statuses=(0, 1),
                            contents=(1, 2))


def _all_files(table) -> DataFrame:
    return entries_table_df(table, table.metadata.snapshots, statuses=(0, 1))


def _all_data_files(table) -> DataFrame:
    return entries_table_df(table, table.metadata.snapshots, statuses=(0, 1),
                            contents=(0,))


def _all_delete_files(table) -> DataFrame:
    return entries_table_df(table, table.metadata.snapshots, statuses=(0, 1),
                            contents=(1, 2))


def _partitions(table) -> DataFrame:
    """Per-partition rollup (core/.../PartitionsTable.java:40)."""
    files = _data_files(table)
    deletes = _delete_files(table)
    agg = (
        files.groupBy("partition", "spec_id")
        .agg(F.sum("record_count").alias("record_count"),
             F.count(F.lit(1)).alias("file_count"),
             F.sum("file_size_in_bytes").alias("total_data_file_size_in_bytes"))
    )
    dagg = (
        deletes.groupBy("partition")
        .agg(F.count(F.lit(1)).alias("delete_file_count"),
             F.sum("record_count").alias("delete_record_count"))
    )
    return (agg.join(dagg, "partition", "left")
            .withColumn("delete_file_count", F.coalesce("delete_file_count", F.lit(0)))
            .withColumn("delete_record_count", F.coalesce("delete_record_count", F.lit(0))))


def _metadata_log_entries(table) -> DataFrame:
    m = table.metadata
    rows = [(ts, f) for ts, f in m.metadata_log]
    # include current metadata versions on disk
    mdir = os.path.join(table.location, "metadata")
    mio = table.ops.io
    for fn in sorted(mio.list(mdir)):  # top level only: version files
        if fn.endswith(".metadata.json"):
            p = os.path.join(mdir, fn)
            rows.append((int((mio.mtime(p) or 0) * 1000), p))
    schema = T.StructType([
        T.StructField("timestamp_ms", T.LongType()),
        T.StructField("file", T.StringType()),
    ])
    return table.spark.createDataFrame(rows, schema)


def _position_deletes(table) -> DataFrame:
    """Row-level view of all live position deletes
    (core/.../PositionDeletesTable.java)."""
    from .scan import pos_delete_rows_df

    plan = table.scan().plan_files()
    if not plan.pos_deletes:
        schema = T.StructType([
            T.StructField("file_path", T.StringType()),
            T.StructField("pos", T.LongType()),
            T.StructField("delete_file_path", T.StringType()),
        ])
        return table.spark.createDataFrame([], schema)
    # format-agnostic: parquet pos-delete files and Puffin deletion
    # vectors; delete_file_path names the containing file (the
    # PositionDeletesTable.java DELETE_FILE_PATH column)
    return pos_delete_rows_df(table.spark, plan.pos_deletes,
                              with_source=True)


def _scan_reports(table) -> DataFrame:
    """Scan reports the in-process MetricsReporter sink holds for this
    table (engine plans report automatically; REST-POSTed
    ReportMetricsRequests land in the same sink). Reference analog:
    InMemoryMetricsReporter.java surfaced as a queryable view."""
    from .metrics_reporting import scan_reports_df

    return scan_reports_df(table.spark, table.identifier)


_BUILDERS = {
    "snapshots": _snapshots,
    "history": _history,
    "refs": _refs,
    "manifests": _manifests,
    "all_manifests": _all_manifests,
    "entries": _entries,
    "all_entries": _all_entries,
    "files": _files,
    "data_files": _data_files,
    "delete_files": _delete_files,
    "all_files": _all_files,
    "all_data_files": _all_data_files,
    "all_delete_files": _all_delete_files,
    "partitions": _partitions,
    "metadata_log_entries": _metadata_log_entries,
    "position_deletes": _position_deletes,
    "scan_reports": _scan_reports,
}
