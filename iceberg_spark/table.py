"""Table facade — the engine's user API (DSv2-`SparkTable` equivalent).

Reference: spark/v4.0/spark/.../source/SparkTable.java:91 (capabilities),
api/.../Table.java (newScan/newAppend/...), api/.../catalog/Catalog.java:33-211.
PySpark cannot implement DataSource V2, so the Table is a Python facade that
returns/accepts DataFrames (SURVEY §2.A "Spark DSv2 source" mapping); all
data movement is Spark jobs, only the final metadata CAS happens on the
driver.
"""

from __future__ import annotations

import os
import shutil
import time
from dataclasses import replace
from typing import Optional, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from . import expressions as E
from .manifests import DataFile, collect_data_files, read_manifest, read_manifest_list
from .metadata import (
    MAIN_BRANCH,
    OP_REPLACE,
    PartitionSpec,
    PartitionSpecBuilder,
    Snapshot,
    SnapshotRef,
    SortField,
    SortOrder,
    TableMetadata,
    TableOperations,
    UNSORTED,
)
from .schema import Schema
from .scan import TableScan
from .writes import FastAppend, Overwrite, RowDelta, write_data_files


class Table:
    def __init__(self, spark: SparkSession, location: str, metadata: TableMetadata,
                 identifier: Optional[str] = None):
        self.spark = spark
        self.location = location
        self.metadata = metadata
        self.identifier = identifier or os.path.basename(location)
        self.ops = TableOperations(location)

    # -- basics -------------------------------------------------------------
    def refresh(self) -> "Table":
        m = self.ops.refresh()
        if m is not None:
            self.metadata = m
        return self

    @property
    def schema(self) -> Schema:
        return self.metadata.schema

    @property
    def spec(self) -> PartitionSpec:
        return self.metadata.spec

    @property
    def properties(self) -> dict:
        return self.metadata.properties

    def spark_schema(self) -> T.StructType:
        return self.schema.to_spark()

    # -- read ---------------------------------------------------------------
    def new_scan(self, **kw) -> TableScan:
        return TableScan(self, **kw)

    def scan(self, filter: Optional[E.Expr] = None, columns=None,
             snapshot_id: Optional[int] = None, as_of_timestamp_ms: Optional[int] = None,
             ref: Optional[str] = None, planning_mode: str = "auto") -> TableScan:
        s = TableScan(self, planning_mode=planning_mode)
        if snapshot_id is not None:
            s = s.use_snapshot(snapshot_id)
        if as_of_timestamp_ms is not None:
            s = s.as_of(as_of_timestamp_ms)
        if ref is not None:
            s = s.use_ref(ref)
        if filter is not None:
            s = s.filter(filter)
        if columns is not None:
            s = s.select(columns)
        return s

    def to_df(self, with_metadata_columns: bool = False,
              with_lineage: bool = False, **kw) -> DataFrame:
        return self.scan(**kw).df(with_metadata_columns=with_metadata_columns,
                                  with_lineage=with_lineage)

    def aggregate_pushdown(self, aggs: list, filter: Optional[E.Expr] = None,
                           snapshot_id: Optional[int] = None) -> Optional[dict]:
        """Metadata-only COUNT/MIN/MAX (SparkScanBuilder.pushAggregation
        analog); None when the scan state can't answer exactly."""
        from .agg_pushdown import aggregate_pushdown

        return aggregate_pushdown(self, aggs, filter=filter,
                                  snapshot_id=snapshot_id)

    def register_temp_view(self, name: Optional[str] = None) -> str:
        name = name or self.identifier.replace(".", "_")
        self.to_df().createOrReplaceTempView(name)
        return name

    # -- write --------------------------------------------------------------
    def append(self, df: DataFrame, branch: str = MAIN_BRANCH,
               wap_id: Optional[str] = None) -> Snapshot:
        """FastAppend: write parquet + one new manifest + CAS.

        With `wap_id` (write-audit-publish) the snapshot is staged: added
        to the snapshot log tagged `wap.id` but no ref moves — audit it via
        scan(snapshot_id=...), then CALL system.publish_changes(t, wap_id)
        cherry-picks it onto main."""
        files = write_data_files(self, df)
        if wap_id is not None:
            return FastAppend(self, files, branch=branch,
                              summary_extra={"wap.id": str(wap_id)},
                              stage_only=True).commit()
        return FastAppend(self, files, branch=branch).commit()

    def overwrite(self, df: DataFrame, overwrite_filter: Optional[E.Expr] = None,
                  branch: str = MAIN_BRANCH,
                  summary_extra: Optional[dict] = None) -> Snapshot:
        """INSERT OVERWRITE: replace rows matching the filter (all rows when
        None) with df's rows, copy-on-write. ``summary_extra`` rides in the
        snapshot summary atomically with the data swap (streaming sinks
        store epoch/watermark markers this way)."""
        from .row_ops import plan_cow_removal

        if overwrite_filter is None:
            # full overwrite: drop every live data file
            removed = {e.file.file_path for e in self.scan().plan_files().files}
            rewritten = []
        else:
            removed, rewritten = plan_cow_removal(self, overwrite_filter)
        added = write_data_files(self, df) + rewritten
        return Overwrite(self, added, removed, branch=branch,
                         summary_extra=summary_extra).commit()

    def dynamic_partition_overwrite(self, df: DataFrame, branch: str = MAIN_BRANCH) -> Snapshot:
        """ReplacePartitions: replace exactly the partitions present in df
        (api/.../ReplacePartitions.java)."""
        added = write_data_files(self, df)
        touched = {tuple(sorted(f.partition.items())) for f in added}
        removed = set()
        for e in self.scan().plan_files().files:
            if tuple(sorted(e.file.partition.items())) in touched:
                removed.add(e.file.file_path)
        return Overwrite(self, added, removed, branch=branch).commit()

    def delete_where(self, expr: E.Expr, mode: Optional[str] = None,
                     branch: str = MAIN_BRANCH) -> Optional[Snapshot]:
        from .row_ops import delete_where

        return delete_where(self, expr, mode=mode, branch=branch)

    def update(self, condition: E.Expr, assignments: dict, mode: Optional[str] = None,
               branch: str = MAIN_BRANCH) -> Optional[Snapshot]:
        from .row_ops import update_where

        return update_where(self, condition, assignments, mode=mode, branch=branch)

    def merge(self, source: DataFrame, on):
        from .row_ops import MergeBuilder

        return MergeBuilder(self, source, on)

    def upsert(self, df: DataFrame, keys: list, branch: str = MAIN_BRANCH) -> Snapshot:
        """Equality-delete upsert: no target read (row_ops.equality_upsert)."""
        from .row_ops import equality_upsert

        return equality_upsert(self, df, keys, branch=branch)

    def add_files(self, paths: Union[str, list], branch: str = MAIN_BRANCH) -> Snapshot:
        """Metadata-only import of existing parquet files (no rewrite) —
        the `add_files` procedure / TableMigrationUtil path."""
        # imported files carry no parquet field ids: persist a name
        # mapping so reference readers survive later renames
        # (AddFilesProcedure.java:166 ensureNameMappingPresent)
        from .name_mapping import ensure_name_mapping

        ensure_name_mapping(self)
        if isinstance(paths, str):
            from .io import resolve_io

            pio = resolve_io(paths, self.spark)
            if pio.is_dir(paths):
                paths = [p for p in pio.walk_files(paths)
                         if p.endswith(".parquet")]
            else:
                paths = [paths]
        partitions = None
        if self.spec.fields:
            # hive-layout import (TableMigrationUtil / add_files procedure):
            # each file's partition tuple parses from its `name=value` path
            # segments — named by PARTITION FIELD (e.g. ts_day=2024-01-01
            # for a day transform); every field must resolve or the import
            # fails loudly rather than mis-partitioning
            from .writes import hive_partition_values_from_path

            ptypes = dict(self.spec.partition_type(self.schema))
            partitions = {}
            for p in paths:
                pv = hive_partition_values_from_path(p, ptypes)
                missing = set(ptypes) - set(pv)
                if missing:
                    raise ValueError(
                        f"add_files: cannot derive partition value(s) "
                        f"{sorted(missing)} from path {p}; expected "
                        f"hive-style <field>=<value> directory segments")
                partitions[p] = pv
        from .manifests import metrics_config

        files = collect_data_files(list(paths), self.schema, self.spec,
                                   partitions, spark=self.spark,
                                   metrics=metrics_config(
                                       self.metadata.properties, self.schema))
        files = [replace(f, write_schema_id=self.schema.schema_id) for f in files]
        return FastAppend(self, files, branch=branch,
                          summary_extra={"added-files-via": "add_files"}).commit()

    # -- snapshots / refs ---------------------------------------------------
    def snapshots(self) -> list:
        return list(self.metadata.snapshots)

    def current_snapshot(self) -> Optional[Snapshot]:
        return self.metadata.current_snapshot()

    def history(self) -> list:
        return [
            {"made_current_at": ts, "snapshot_id": sid}
            for ts, sid in self.metadata.snapshot_log
        ]

    def refs(self) -> dict:
        return dict(self.metadata.refs)

    def manage_snapshots(self) -> "ManageSnapshots":
        return ManageSnapshots(self)

    def expire_snapshots(self, older_than_ms: Optional[int] = None, retain_last: int = 1,
                         delete_files: bool = True, mode: str = "auto",
                         clean_expired_metadata: bool = False,
                         expire_snapshot_ids=None) -> dict:
        from .maintenance import expire_snapshots

        return expire_snapshots(self, older_than_ms, retain_last, delete_files,
                                mode=mode,
                                clean_expired_metadata=clean_expired_metadata,
                                expire_snapshot_ids=expire_snapshot_ids)

    # -- maintenance --------------------------------------------------------
    def rewrite_data_files(self, strategy: str = "binpack", **kw) -> dict:
        from .maintenance import rewrite_data_files

        return rewrite_data_files(self, strategy=strategy, **kw)

    def rewrite_manifests(self) -> dict:
        from .maintenance import rewrite_manifests

        return rewrite_manifests(self)

    def remove_orphan_files(self, older_than_ms: Optional[int] = None,
                            dry_run: bool = False, mode: str = "auto",
                            equal_schemes: Optional[dict] = None,
                            equal_authorities: Optional[dict] = None,
                            prefix_mismatch_mode: str = "error") -> list:
        from .maintenance import remove_orphan_files

        return remove_orphan_files(
            self, older_than_ms, dry_run, mode=mode,
            equal_schemes=equal_schemes, equal_authorities=equal_authorities,
            prefix_mismatch_mode=prefix_mismatch_mode)

    def compute_table_stats(self, columns: Optional[list] = None) -> dict:
        from .maintenance import compute_table_stats

        return compute_table_stats(self, columns)

    # -- metadata tables ----------------------------------------------------
    def metadata_table(self, name: str) -> DataFrame:
        from .metadata_tables import metadata_table

        return metadata_table(self, name)

    def inspect(self, name: str) -> DataFrame:
        return self.metadata_table(name)

    # -- incremental / CDC --------------------------------------------------
    def incremental_scan(self, from_snapshot_id: Optional[int],
                         to_snapshot_id: Optional[int] = None) -> DataFrame:
        from .changelog import incremental_append_df

        return incremental_append_df(self, from_snapshot_id, to_snapshot_id)

    def changes(self, from_snapshot_id: Optional[int] = None,
                to_snapshot_id: Optional[int] = None, compute_updates: bool = False,
                remove_carryovers: bool = True, net_changes: bool = False,
                identifier_columns: Optional[list] = None,
                mode: str = "auto") -> DataFrame:
        from .changelog import changelog_df

        return changelog_df(self, from_snapshot_id, to_snapshot_id,
                            compute_updates=compute_updates,
                            remove_carryovers=remove_carryovers,
                            net_changes=net_changes,
                            identifier_columns=identifier_columns,
                            mode=mode)

    # -- transaction --------------------------------------------------------
    def transaction(self) -> "Transaction":
        """Buffer multiple updates into one atomic metadata swap
        (api/.../Transaction.java:25, core/.../BaseTransaction.java:56)."""
        return Transaction(self)

    # -- evolution ----------------------------------------------------------
    def update_schema(self) -> "UpdateSchema":
        return UpdateSchema(self)

    def update_spec(self) -> "UpdateSpec":
        return UpdateSpec(self)

    def replace_sort_order(self, *fields) -> "Table":
        """fields: (name, 'asc'|'desc') tuples or names."""
        schema = self.schema
        sfs = []
        for f in fields:
            name, direction = (f, "asc") if isinstance(f, str) else f
            fld = schema.find_field(name)
            from .transforms import Identity

            sfs.append(SortField(fld.field_id, name, Identity(), direction,
                                 "nulls-last" if direction == "asc" else "nulls-first"))
        order_id = max((o.order_id for o in self.metadata.sort_orders), default=0) + 1
        order = SortOrder(order_id, tuple(sfs))
        self._commit_metadata(replace(
            self.metadata,
            sort_orders=self.metadata.sort_orders + (order,),
            default_sort_order_id=order_id,
        ))
        return self

    def set_identifier_fields(self, names: list) -> "Table":
        """SET IDENTIFIER FIELDS (format/spec.md:430): mark the row-identity
        columns (used e.g. for changelog update pairing)."""
        schema = self.schema
        ids = tuple(schema.find_field(n).field_id for n in names)
        from .schema import Schema as S

        new_sid = max(s.schema_id for s in self.metadata.schemas) + 1
        new_schema = S(schema.fields, schema_id=new_sid, identifier_field_ids=ids)
        self._commit_metadata(replace(
            self.metadata,
            schemas=self.metadata.schemas + (new_schema,),
            current_schema_id=new_sid,
        ))
        return self

    def set_properties(self, **props) -> "Table":
        self._commit_metadata(replace(self.metadata,
                                      properties={**self.metadata.properties, **props}))
        return self

    def _commit_metadata(self, new_meta: TableMetadata):
        v = self.ops.current_version()
        self.ops.commit(v, new_meta)
        self.metadata = new_meta


class _TxnOps:
    """In-memory TableOperations: commits land on the pending metadata,
    nothing touches disk until Transaction.commit_transaction."""

    def __init__(self, metadata: TableMetadata):
        self._meta = metadata

    def refresh(self) -> TableMetadata:
        return self._meta

    def current_version(self):
        return -1  # sentinel; never used for the real CAS

    def commit(self, base_version, metadata: TableMetadata) -> int:
        self._meta = metadata
        return -1


class Transaction:
    """Multi-operation single commit (core/.../BaseTransaction.java:56).

    Every staged operation runs immediately against a shadow Table whose
    TableOperations are in-memory, so reads inside the transaction see
    pending state; data/manifest files are written eagerly (they are
    unreachable until published). commit_transaction CAS-swaps the real
    metadata pointer once; on conflict the buffered operations replay
    against the refreshed base — appends reuse their already-written data
    files, only the metadata application re-runs (the reference's
    applyUpdates retry, BaseTransaction.java:281)."""

    def __init__(self, table: Table):
        self._real = table
        self._base_version = table.ops.current_version()
        self._table = Table(table.spark, table.location, table.metadata,
                            table.identifier)
        self._table.ops = _TxnOps(table.metadata)
        self._actions: list = []

    @property
    def table(self) -> Table:
        """Pending-state view: scans here see uncommitted updates."""
        return self._table

    def _run(self, fn):
        fn()
        self._actions.append(fn)
        return self

    # -- staged operations (each mirrors the Table method) ------------------
    def append(self, df: DataFrame, branch: str = MAIN_BRANCH) -> "Transaction":
        files = write_data_files(self._table, df)  # data written once

        return self._run(
            lambda: FastAppend(self._table, files, branch=branch).commit())

    def delete_where(self, expr: E.Expr, mode: Optional[str] = None,
                     **kw) -> "Transaction":
        return self._run(lambda: self._table.delete_where(expr, mode=mode, **kw))

    def update(self, condition: E.Expr, assignments: dict,
               **kw) -> "Transaction":
        return self._run(
            lambda: self._table.update(condition, assignments, **kw))

    def overwrite(self, df: DataFrame,
                  overwrite_filter: Optional[E.Expr] = None,
                  branch: str = MAIN_BRANCH) -> "Transaction":
        """INSERT OVERWRITE inside the transaction (full replace when the
        filter is None). Unlike append, replay after a conflicting commit
        re-plans the removal set and rewrites — the set of replaced files
        depends on the base metadata."""
        return self._run(lambda: self._table.overwrite(
            df, overwrite_filter, branch=branch))

    def set_properties(self, **props) -> "Transaction":
        return self._run(lambda: self._table.set_properties(**props))

    def replace_properties(self, props: dict) -> "Transaction":
        """The table's properties become EXACTLY `props` — RTAS sets the
        new definition's properties rather than merging into the old
        (spark/.../ReplaceTableAsSelectExec semantics)."""
        def fn():
            m = self._table.metadata
            self._table._commit_metadata(
                replace(m, properties={str(k): str(v)
                                       for k, v in props.items()}))
        return self._run(fn)

    def update_schema_with(self, build) -> "Transaction":
        """build(UpdateSchema) -> configures the evolution; committed into
        the pending metadata now, replayed on conflict."""
        return self._run(lambda: build(self._table.update_schema()).commit())

    def update_spec_with(self, build) -> "Transaction":
        return self._run(lambda: build(self._table.update_spec()).commit())

    # -- publish ------------------------------------------------------------
    def commit_transaction(self) -> Table:
        from .metadata import CommitFailedException

        last = None
        for _ in range(5):
            v = self._real.ops.current_version()
            if v != self._base_version:
                # conflicting commit landed: replay buffered ops on the
                # refreshed base (validation happens inside each op)
                base = self._real.ops.refresh() or self._real.metadata
                self._table.metadata = base
                self._table.ops._meta = base
                for fn in self._actions:
                    fn()
                self._base_version = v
            try:
                self._real.ops.commit(self._base_version,
                                      self._table.metadata)
                self._real.metadata = self._table.metadata
                return self._real
            except CommitFailedException as e:
                last = e
                continue
        raise CommitFailedException(
            f"transaction commit failed after retries: {last}")


class ManageSnapshots:
    """Branch/tag management + rollback + cherry-pick
    (api/.../ManageSnapshots.java:44, core/.../SnapshotManager.java)."""

    def __init__(self, table: Table):
        self.t = table

    def create_branch(self, name: str, snapshot_id: Optional[int] = None) -> "ManageSnapshots":
        m = self.t.metadata
        sid = snapshot_id if snapshot_id is not None else m.current_snapshot_id
        if sid is None:
            raise ValueError("no current snapshot to branch from")
        refs = dict(m.refs)
        if name in refs:
            raise ValueError(f"ref exists: {name}")
        refs[name] = SnapshotRef(sid, "branch")
        self.t._commit_metadata(replace(m, refs=refs))
        return self

    def create_tag(self, name: str, snapshot_id: Optional[int] = None) -> "ManageSnapshots":
        m = self.t.metadata
        sid = snapshot_id if snapshot_id is not None else m.current_snapshot_id
        refs = dict(m.refs)
        if name in refs:
            raise ValueError(f"ref exists: {name}")
        refs[name] = SnapshotRef(sid, "tag")
        self.t._commit_metadata(replace(m, refs=refs))
        return self

    def remove_ref(self, name: str) -> "ManageSnapshots":
        m = self.t.metadata
        if name == MAIN_BRANCH:
            raise ValueError("cannot remove main")
        refs = dict(m.refs)
        refs.pop(name, None)
        self.t._commit_metadata(replace(m, refs=refs))
        return self

    def _update_ref(self, name: str, **changes) -> "ManageSnapshots":
        m = self.t.metadata
        r = m.refs.get(name)
        if r is None:
            raise ValueError(f"no such ref: {name}")
        refs = dict(m.refs)
        refs[name] = replace(r, **changes)
        self.t._commit_metadata(replace(m, refs=refs))
        return self

    # per-ref retention (api/.../ManageSnapshots.java:setMinSnapshotsToKeep
    # etc.; consumed by maintenance.expire_snapshots, spec:1097-1130)
    def set_min_snapshots_to_keep(self, branch: str, n: int) -> "ManageSnapshots":
        return self._update_ref(branch, min_snapshots_to_keep=n)

    def set_max_snapshot_age_ms(self, branch: str, ms: int) -> "ManageSnapshots":
        return self._update_ref(branch, max_snapshot_age_ms=ms)

    def set_max_ref_age_ms(self, ref: str, ms: int) -> "ManageSnapshots":
        return self._update_ref(ref, max_ref_age_ms=ms)

    def rollback_to(self, snapshot_id: int) -> "ManageSnapshots":
        m = self.t.metadata
        m.snapshot_by_id(snapshot_id)  # validate
        refs = dict(m.refs)
        refs[MAIN_BRANCH] = SnapshotRef(snapshot_id, "branch")
        now = int(time.time() * 1000)
        self.t._commit_metadata(replace(
            m, refs=refs, snapshot_log=m.snapshot_log + ((now, snapshot_id),)
        ))
        return self

    def rollback_to_timestamp(self, timestamp_ms: int) -> "ManageSnapshots":
        snap = self.t.metadata.snapshot_as_of(timestamp_ms)
        if snap is None:
            raise ValueError("no snapshot at or before timestamp")
        return self.rollback_to(snap.snapshot_id)

    def set_current_snapshot(self, snapshot_id: int) -> "ManageSnapshots":
        return self.rollback_to(snapshot_id)

    def fast_forward(self, branch: str, to_branch: str) -> "ManageSnapshots":
        m = self.t.metadata
        target = m.refs.get(to_branch)
        if target is None:
            raise ValueError(f"no ref {to_branch}")
        refs = dict(m.refs)
        refs[branch] = SnapshotRef(target.snapshot_id, "branch")
        self.t._commit_metadata(replace(m, refs=refs))
        return self

    def cherrypick(self, snapshot_id: int) -> "ManageSnapshots":
        """Re-apply an (append-only) snapshot onto the current branch
        (core/.../CherryPickOperation.java — we support append snapshots)."""
        m = self.t.metadata
        snap = m.snapshot_by_id(snapshot_id)
        if snap.operation != "append":
            raise ValueError("cherrypick supports append snapshots only")
        picked = read_manifest_list(snap.manifest_list)
        added_manifests = [x for x in picked if x.added_snapshot_id == snapshot_id]
        added_files = []
        for am in added_manifests:
            spec = m.spec_by_id(am.spec_id)
            for e in read_manifest(am.path, m.schema, spec):
                if e.snapshot_id == snapshot_id:
                    added_files.append(e.file)
        FastAppend(self.t, added_files, summary_extra={"cherry-picked-from": str(snapshot_id)}
                   ).commit()
        return self


def _json_safe_default(v):
    """Default values live in metadata JSON (spec: JSON single-value
    serialization) — temporal/decimal values become ISO/decimal strings,
    which the read/write fill casts back to the column type."""
    import datetime as _dt
    import decimal as _dec

    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat(sep=" ") if isinstance(v, _dt.datetime) else v.isoformat()
    if isinstance(v, _dec.Decimal):
        return str(v)
    return v


class UpdateSchema:
    """Schema evolution builder (api/.../UpdateSchema.java:34,
    core/.../SchemaUpdate.java:51): add/drop/rename/widen/union-by-name."""

    def __init__(self, table: Table):
        self.t = table
        self._fields = list(table.schema.fields)
        self._last_id = table.metadata.last_column_id

    def add_column(self, name: str, type_str: str, doc: Optional[str] = None,
                   default=None) -> "UpdateSchema":
        """`default` (v3, format/spec.md "Default values"): existing rows
        read it (initial-default) and writers that omit the column write it
        (write-default). Matches UpdateSchema.java addColumn + defaults."""
        from .schema import NestedField

        if any(f.name == name for f in self._fields):
            raise ValueError(f"column exists: {name}")
        default = _json_safe_default(default)
        self._last_id += 1
        self._fields.append(NestedField(self._last_id, name, type_str, False,
                                        doc, default, default))
        return self

    def update_column_default(self, name: str, default) -> "UpdateSchema":
        """Change the write-default only — initial-default is immutable
        after the column exists (spec: it rewrites history otherwise)."""
        default = _json_safe_default(default)
        out = []
        for f in self._fields:
            if f.name == name:
                f = replace(f, write_default=default)
            out.append(f)
        self._fields = out
        return self

    def drop_column(self, name: str) -> "UpdateSchema":
        self._fields = [f for f in self._fields if f.name != name]
        return self

    def rename_column(self, name: str, new_name: str) -> "UpdateSchema":
        self._fields = [
            replace(f, name=new_name) if f.name == name else f for f in self._fields
        ]
        self._renames = {**getattr(self, "_renames", {}), name: new_name}
        return self

    def make_column_optional(self, name: str) -> "UpdateSchema":
        """required -> optional, always safe (UpdateSchema.java
        makeColumnOptional)."""
        self._fields = [replace(f, required=False) if f.name == name else f
                        for f in self._fields]
        return self

    def require_column(self, name: str,
                       allow_incompatible_changes: bool = False
                       ) -> "UpdateSchema":
        """optional -> required is an incompatible change (existing rows
        may hold nulls) and refuses without the explicit flag —
        SchemaUpdate.java requireColumn / allowIncompatibleChanges."""
        fld = next((f for f in self._fields if f.name == name), None)
        if fld is None:
            raise KeyError(f"no such column: {name!r}")
        if not fld.required and not allow_incompatible_changes:
            raise ValueError(
                f"cannot change column {name!r} to required: existing "
                "rows may hold nulls (pass "
                "allow_incompatible_changes=True to force)")
        self._fields = [replace(f, required=True) if f.name == name else f
                        for f in self._fields]
        return self

    def update_column(self, name: str, type_str: str) -> "UpdateSchema":
        from .schema import is_promotable

        out = []
        for f in self._fields:
            if f.name == name:
                if not is_promotable(f.type, type_str):
                    raise ValueError(f"cannot promote {f.type} -> {type_str}")
                self._check_partition_source(f, type_str)
                f = replace(f, type=type_str)
            out.append(f)
        self._fields = out
        return self

    def _check_partition_source(self, field, type_str: str) -> None:
        """format/spec.md:380 — promotion is forbidden when the field feeds
        a partition transform whose output would change (date->timestamp
        under identity/bucket/truncate shifts values; years/months/days are
        stable because they truncate to the same date granularity)."""
        if not (field.type == "date" and type_str.startswith("timestamp")):
            return
        for pf in self.t.metadata.spec.fields:
            tr = pf.transform
            tname = tr.to_str() if hasattr(tr, "to_str") else str(tr)
            if pf.source_id == field.field_id and tname.split("[")[0] not in (
                    "year", "month", "day", "years", "months", "days", "void"):
                raise ValueError(
                    f"cannot promote partition source column {field.name}: "
                    f"transform {pf.transform} would produce different values")

    def move_first(self, name: str) -> "UpdateSchema":
        f = [x for x in self._fields if x.name == name]
        rest = [x for x in self._fields if x.name != name]
        self._fields = f + rest
        return self

    def move_after(self, name: str, after: str) -> "UpdateSchema":
        f = next(x for x in self._fields if x.name == name)
        rest = [x for x in self._fields if x.name != name]
        idx = next(i for i, x in enumerate(rest) if x.name == after)
        self._fields = rest[: idx + 1] + [f] + rest[idx + 1 :]
        return self

    def union_by_name(self, spark_schema: T.StructType) -> "UpdateSchema":
        """Merge new columns from a Spark schema (mergeSchema semantics)."""
        from .schema import Schema as S, is_promotable, spark_to_type

        existing = {f.name: f for f in self._fields}
        for sf in spark_schema.fields:
            counter = {"n": self._last_id}

            def next_id():
                counter["n"] += 1
                return counter["n"]

            t = spark_to_type(sf.dataType, next_id)
            if sf.name not in existing:
                self._last_id += 1
                from .schema import NestedField

                self._fields.append(NestedField(self._last_id, sf.name, t, False))
                self._last_id = max(self._last_id, counter["n"])
            else:
                cur = existing[sf.name]
                if isinstance(cur.type, str) and isinstance(t, str) and cur.type != t:
                    if is_promotable(cur.type, t):
                        self._fields = [
                            replace(f, type=t) if f.name == sf.name else f
                            for f in self._fields
                        ]
        return self

    def commit(self) -> Schema:
        m = self.t.metadata
        new_sid = max(s.schema_id for s in m.schemas) + 1
        new_schema = Schema(tuple(self._fields), schema_id=new_sid,
                            identifier_field_ids=m.schema.identifier_field_ids)
        # name-keyed table properties FOLLOW a column rename, or they'd
        # silently stop applying (variant-shredding declarations; the
        # synthetic stats ids key by FIELD ID + path, so old manifests'
        # bounds keep pruning after the rename)
        props = m.properties
        for old, new in getattr(self, "_renames", {}).items():
            for prefix in ("write.variant.shred.",
                           "write.metadata.metrics.column.",
                           "write.parquet.bloom-filter-enabled.column."):
                k = prefix + old
                if k in props:
                    props = dict(props)
                    props[prefix + new] = props.pop(k)
        # schema.name-mapping.default follows evolution
        # (SchemaUpdate.java:484-505): renamed fields gain the new name as
        # an alias, added fields join the mapping
        from .name_mapping import PROP as NM_PROP
        from .name_mapping import parse_mapping, to_json, update_mapping

        if NM_PROP in props:
            old_by_name = {f.name: f.field_id for f in m.schema.fields}
            renames_by_id = {old_by_name[o]: n
                             for o, n in getattr(self, "_renames", {}).items()
                             if o in old_by_name}
            added = [f for f in self._fields
                     if f.field_id > m.last_column_id]
            try:
                nm = update_mapping(parse_mapping(props[NM_PROP]),
                                    renames_by_id, added)
                props = dict(props)
                props[NM_PROP] = to_json(nm)
            except ValueError:
                pass  # unparseable external mapping: leave it untouched
        self.t._commit_metadata(replace(
            m,
            schemas=m.schemas + (new_schema,),
            current_schema_id=new_sid,
            last_column_id=max(m.last_column_id, self._last_id),
            properties=props,
        ))
        return new_schema


class UpdateSpec:
    """Partition evolution (api/.../UpdatePartitionSpec.java:31): old files
    keep their spec; new writes use the new one (format/spec.md:622)."""

    def __init__(self, table: Table):
        self.t = table
        m = table.metadata
        self._builder = PartitionSpecBuilder(table.schema,
                                             spec_id=max(s.spec_id for s in m.partition_specs) + 1)
        self._kept = list(table.spec.fields)

    def add_field(self, source_name: str, transform: str = "identity",
                  name: Optional[str] = None) -> "UpdateSpec":
        self._builder.add(source_name, transform, name)
        return self

    def remove_field(self, name: str) -> "UpdateSpec":
        self._kept = [f for f in self._kept if f.name != name]
        return self

    def commit(self) -> PartitionSpec:
        m = self.t.metadata
        new_fields = tuple(self._kept) + tuple(self._builder._fields)
        # renumber partition field ids after last_partition_id
        next_id = m.last_partition_id + 1
        renumbered = []
        existing_ids = {f.field_id for f in self._kept}
        for f in new_fields:
            if f.field_id in existing_ids:
                renumbered.append(f)
            else:
                renumbered.append(replace(f, field_id=next_id))
                next_id += 1
        spec = PartitionSpec(self._builder._spec_id, tuple(renumbered))
        self.t._commit_metadata(replace(
            m,
            partition_specs=m.partition_specs + (spec,),
            default_spec_id=spec.spec_id,
            last_partition_id=next_id - 1,
        ))
        return spec


class Catalog:
    """Directory catalog (HadoopCatalog-style): warehouse/<ns>/<table>.
    API mirrors api/.../catalog/Catalog.java:33-211."""

    def __init__(self, spark: SparkSession, warehouse: str,
                 name: str = "local", metadata_key=None):
        from .io import resolve_io

        self.spark = spark
        self.warehouse = warehouse.rstrip("/")
        self.name = name
        # table-metadata encryption (encryption.py): key from the
        # constructor or ICEBERG_SPARK_METADATA_KEY (hex); applies to
        # v*.metadata.json + version hints of every table this catalog
        # creates or loads
        if metadata_key is None:
            metadata_key = os.environ.get("ICEBERG_SPARK_METADATA_KEY")                 or None
        self.metadata_key = metadata_key
        self.io = resolve_io(self.warehouse, spark)
        self.io.mkdirs(self.warehouse)

    def _ops(self, location: str) -> TableOperations:
        return TableOperations(location, metadata_key=self.metadata_key)

    def _location(self, identifier: str) -> str:
        return os.path.join(self.warehouse, *identifier.split("."))

    def create_table(self, identifier: str, schema, partition_by=None,
                     sort_order: SortOrder = UNSORTED, properties: Optional[dict] = None,
                     exists_ok: bool = False) -> Table:
        loc = self._location(identifier)
        ops = self._ops(loc)
        if ops.refresh() is not None:
            if exists_ok:
                return self.load_table(identifier)
            raise ValueError(f"table exists: {identifier}")
        if isinstance(schema, T.StructType):
            schema = Schema.from_spark(schema)
        spec = _build_spec(schema, partition_by)
        meta = TableMetadata.new(loc, schema, spec, sort_order, properties)
        ops.commit(None, meta)
        t = Table(self.spark, loc, ops.refresh(), identifier)
        t.ops = ops
        return t

    def load_table(self, identifier: str) -> Table:
        loc = self._location(identifier)
        ops = self._ops(loc)
        meta = ops.refresh()
        if meta is None:
            raise ValueError(f"no such table: {identifier}")
        t = Table(self.spark, loc, meta, identifier)
        t.ops = ops
        return t

    def table_exists(self, identifier: str) -> bool:
        return self._ops(self._location(identifier)).refresh() is not None

    def drop_table(self, identifier: str, purge: bool = True) -> bool:
        loc = self._location(identifier)
        if not self.io.is_dir(loc):
            return False
        self.io.delete_dir(loc)
        return True

    def rename_table(self, from_id: str, to_id: str):
        src, dst = self._location(from_id), self._location(to_id)
        if not self.io.is_dir(src):
            raise ValueError(f"no such table: {from_id}")
        if self.io.is_dir(dst):
            raise ValueError(f"table exists: {to_id}")
        self.io.rename(src, dst)

    def register_table(self, identifier: str,
                       metadata_file_location: str) -> Table:
        """Catalog.registerTable(ident, metadataFileLocation)
        (api/.../catalog/Catalog.java:205): register an existing table's
        metadata under this catalog. Registration is BY REFERENCE, as in
        the reference: data/delete files stay at the paths the manifests
        record (the source keeps owning its files — registering does not
        relocate a table; use rewrite_table_path for a self-contained
        copy). Reference-layout metadata (Avro manifest lists) routes
        through the full-history Iceberg importer; engine-layout
        metadata copies the metadata tree under the catalog's location
        so the directory catalog can address it."""
        import json as _json

        from . import io as _fio

        if self.table_exists(identifier):
            raise ValueError(f"table exists: {identifier}")
        try:
            mj = _json.loads(_fio.read_text(metadata_file_location))
            mls = [s.get("manifest-list", "")
                   for s in mj.get("snapshots", [])]
        except (OSError, ValueError):
            mls = []
        if mls and all(m.endswith(".avro") for m in mls):
            from .sources.iceberg import register_iceberg_table

            t, _n, _f = register_iceberg_table(
                self, metadata_file_location, identifier)
            return t
        loc = self._location(identifier)
        src_dir = os.path.dirname(os.path.dirname(metadata_file_location))
        _fio.copy_tree(src_dir, loc)
        return self.load_table(identifier)

    # -- namespaces (api/.../catalog/SupportsNamespaces.java) ---------------
    def create_namespace(self, namespace: str, exists_ok: bool = False):
        p = os.path.join(self.warehouse, *namespace.split("."))
        if self.io.is_dir(p) and not exists_ok:
            raise ValueError(f"namespace exists: {namespace}")
        self.io.mkdirs(p)

    def namespace_exists(self, namespace: str) -> bool:
        return self.io.is_dir(
            os.path.join(self.warehouse, *namespace.split(".")))

    _NS_PROPS_FILE = "_namespace_properties.json"

    def _ns_props_path(self, namespace: str) -> str:
        return os.path.join(self.warehouse, *namespace.split("."),
                            self._NS_PROPS_FILE)

    def namespace_properties(self, namespace: str) -> dict:
        if not self.namespace_exists(namespace):
            raise ValueError(f"no such namespace: {namespace}")
        p = self._ns_props_path(namespace)
        if not self.io.exists(p):
            return {}
        import json as _json

        return _json.loads(self.io.read_text(p))

    def update_namespace_properties(self, namespace: str,
                                    updates: Optional[dict] = None,
                                    removals: Optional[list] = None):
        """Set/remove namespace properties; returns (updated, removed,
        missing) key lists — the REST UpdateNamespacePropertiesResponse
        shape. A key in both updates and removals is an error (the
        reference rejects the ambiguity)."""
        updates = {k: str(v) for k, v in (updates or {}).items()}
        removals = list(removals or [])
        both = set(updates) & set(removals)
        if both:
            raise ValueError(
                f"properties in both updates and removals: {sorted(both)}")
        props = self.namespace_properties(namespace)
        removed = [k for k in removals if k in props]
        missing = [k for k in removals if k not in props]
        for k in removed:
            del props[k]
        props.update(updates)
        import json as _json

        self.io.write_text(self._ns_props_path(namespace),
                           _json.dumps(props))
        return sorted(updates), sorted(removed), sorted(missing)

    def drop_namespace(self, namespace: str):
        p = os.path.join(self.warehouse, *namespace.split("."))
        if not self.io.is_dir(p):
            raise ValueError(f"no such namespace: {namespace}")
        if self.list_tables(namespace):
            raise ValueError(f"namespace not empty: {namespace}")
        self.io.delete_dir(p)

    def _walk_dirs(self, base: str, rel: str, on_table, on_namespace):
        """Directory recursion over FileIO: a dir with a metadata/ child
        is a table (leaf); every other dir is a namespace level."""
        if self.io.is_dir(os.path.join(base, "metadata")):
            if rel:
                on_table(rel)
            return
        if rel:
            on_namespace(rel)
        for name in sorted(self.io.list(base)):
            sub = os.path.join(base, name)
            if self.io.is_dir(sub):
                self._walk_dirs(sub, f"{rel}.{name}" if rel else name,
                                on_table, on_namespace)

    def list_namespaces(self) -> list:
        out = []
        self._walk_dirs(self.warehouse, "", lambda r: None,
                        lambda r: not r.startswith("_") and out.append(r))
        return sorted(out)

    def list_tables(self, namespace: str = "") -> list:
        base = (os.path.join(self.warehouse, *namespace.split("."))
                if namespace else self.warehouse)
        out = []
        self._walk_dirs(base, namespace, out.append, lambda r: None)
        return sorted(out)

    def create_table_from_df(self, identifier: str, df: DataFrame, partition_by=None,
                             **kw) -> Table:
        t = self.create_table(identifier, df.schema, partition_by=partition_by, **kw)
        t.append(df)
        return t

    def sql(self, statement: str) -> DataFrame:
        """SQL entry point (CALL procedures, DDL extensions, row-level ops,
        views/functions, delegated SELECTs) — see sql.SqlEngine."""
        if not hasattr(self, "_sql_engine"):
            from .sql import SqlEngine

            self._sql_engine = SqlEngine(self.spark, self)
        return self._sql_engine.sql(statement)


def _build_spec(schema: Schema, partition_by) -> PartitionSpec:
    """partition_by: None | list of 'col' / 'transform(col)' / (col, transform)."""
    if partition_by is None:
        return PartitionSpec(0, ())
    if isinstance(partition_by, PartitionSpec):
        return partition_by
    b = PartitionSpecBuilder(schema, 0)
    for p in partition_by:
        if isinstance(p, tuple):
            b.add(p[0], p[1])
        else:
            p = p.strip()
            import re

            m = re.match(r"^(\w+)\(\s*(?:(\d+)\s*,\s*)?(\w+)\s*\)$", p)
            if m:
                fn, arg, colname = m.groups()
                tr = f"{fn}[{arg}]" if arg else fn
                b.add(colname, tr)
            else:
                b.add(p, "identity")
    return b.build()
