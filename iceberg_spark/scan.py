"""Scan planning and the read path.

Reference lifecycle (SURVEY §3.1): SnapshotScan.planFiles
(core/.../SnapshotScan.java:139) -> ManifestGroup.planFiles
(core/.../ManifestGroup.java:177): manifest-list pruning via partition
summaries (ManifestEvaluator.java:50), per-file pruning via partition
projection + metrics (InclusiveMetricsEvaluator.java:48), delete-file
attachment (DeleteFileIndex.java), then the engine reads the surviving
files. Planning modes LOCAL/DISTRIBUTED/AUTO mirror
BaseDistributedDataScan.java:57 — local planning is threaded pyarrow on
the driver; distributed planning runs the same filters as a Spark job over
the manifest Parquet (what survives 100 TB metadata).

Read path: one `spark.read.schema(...).parquet(*files)` per write-schema
group (field-ID column mapping handles renames), the *full* filter
re-applied as residual (cheap, always correct), position deletes applied by
(file, pos) anti-join on `_metadata.file_path/row_index`, equality deletes
by keyed anti-join scoped to `data_seq < delete_seq` (format/spec.md:1415).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

_PLAN_EXECUTOR = None


def _plan_executor() -> ThreadPoolExecutor:
    """Shared planning thread pool. Spawning 16 threads per plan_files call
    costs ~100ms under GIL contention at 10k-file scale — reuse one pool
    for the life of the process (threads are idle between plans)."""
    global _PLAN_EXECUTOR
    if _PLAN_EXECUTOR is None:
        _PLAN_EXECUTOR = ThreadPoolExecutor(
            max_workers=16, thread_name_prefix="iceberg-plan")
    return _PLAN_EXECUTOR
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import expressions as E
from . import io as _io
from .manifests import (
    DATA,
    DELETED,
    EQUALITY_DELETES,
    POSITION_DELETES,
    DataFile,
    ManifestEntry,
    entries_from_arrow,
    entry_from_spark_row,
    read_manifest,
    read_manifest_arrow,
    read_manifest_list,
)
from .metadata import Snapshot, TableMetadata, resolve_path
from .schema import Schema, StructT, type_to_spark
from .transforms import Identity

# metadata column names (reference core/.../MetadataColumns.java:34-127)
FILE_PATH_COL = "_file"
POS_COL = "_pos"
SPEC_ID_COL = "_spec_id"
DELETED_COL = "_deleted"
ROW_ID_COL = "_row_id"
LAST_UPDATED_SEQ_COL = "_last_updated_sequence_number"

DISTRIBUTED_PLANNING_THRESHOLD = 64  # manifests; above this, plan as a Spark job


def _data_rel(p: str) -> str:
    """Location-independent form of a data-file path: the suffix from the
    LAST `data/` on (the table's own data root — a location that itself
    contains `/data/` must not win, and no path segment below the data
    root is ever the bare word `data`: uuid-hex dirs, `_p_<name>=v`
    partition dirs, part files). Unique within a table, stable across
    relocation."""
    i = p.rfind("/data/")
    return p[i + 1:] if i >= 0 else p


def _data_rel_col(c):
    """Column twin of _data_rel (for join keys). Greedy `.*` anchors the
    strip at the LAST /data/, matching _data_rel."""
    return F.regexp_replace(c, "^.*/data/", "data/")


@dataclass
class ScanReport:
    """Mirrors core/.../metrics/ScanReport.java."""

    total_manifests: int = 0
    skipped_manifests: int = 0
    total_data_files: int = 0
    skipped_data_files: int = 0
    result_data_files: int = 0
    result_delete_files: int = 0
    planning_mode: str = "local"
    # log-safe filter description (ExpressionUtil.toSanitizedString): literal
    # values replaced by magnitude/type/hash descriptions
    filter_sanitized: str = "true"

    def as_dict(self):
        return dict(self.__dict__)


@dataclass
class ScanPlan:
    files: list  # list[ManifestEntry] (data)
    pos_deletes: list  # list[ManifestEntry]
    eq_deletes: list
    residual: E.Expr
    snapshot: Optional[Snapshot]
    report: ScanReport
    # set on split-produced sub-plans: every file is dirty/clear by
    # construction, so plan_to_df's recursion must not re-run the
    # O(files x deletes) per-file applicability sweep on them
    no_split: bool = False


class TableScan:
    """table.new_scan().filter(e).select(cols) -> plan_files()/df().

    Reference api/.../TableScan.java:22, core/.../DataTableScan.java:27.
    """

    def __init__(self, table, snapshot: Optional[Snapshot] = None,
                 row_filter: E.Expr = E.ALWAYS_TRUE, columns: Optional[list] = None,
                 planning_mode: str = "auto", case_sensitive: bool = True,
                 time_travel: bool = False):
        self.table = table
        self.spark: SparkSession = table.spark
        self.metadata: TableMetadata = table.metadata
        self.snapshot = snapshot if snapshot is not None else self.metadata.current_snapshot()
        self.row_filter = row_filter
        self.columns = columns
        self.planning_mode = planning_mode
        self.time_travel = time_travel

    # -- builder style ------------------------------------------------------
    def filter(self, expr) -> "TableScan":
        expr = _to_expr(expr)
        return TableScan(self.table, self.snapshot, E.and_(self.row_filter, expr),
                         self.columns, self.planning_mode, time_travel=self.time_travel)

    def select(self, *cols) -> "TableScan":
        cols = list(cols[0]) if len(cols) == 1 and isinstance(cols[0], (list, tuple)) else list(cols)
        return TableScan(self.table, self.snapshot, self.row_filter, cols,
                         self.planning_mode, time_travel=self.time_travel)

    def use_snapshot(self, snapshot_id: int) -> "TableScan":
        return TableScan(self.table, self.metadata.snapshot_by_id(snapshot_id),
                         self.row_filter, self.columns, self.planning_mode,
                         time_travel=True)

    def as_of(self, timestamp_ms: int) -> "TableScan":
        snap = self.metadata.snapshot_as_of(timestamp_ms)
        if snap is None:
            raise ValueError(f"no snapshot as of {timestamp_ms}")
        return TableScan(self.table, snap, self.row_filter, self.columns,
                         self.planning_mode, time_travel=True)

    def use_ref(self, name: str) -> "TableScan":
        snap = self.metadata.snapshot_for_ref(name)
        if snap is None:
            raise ValueError(f"no ref {name}")
        return TableScan(self.table, snap, self.row_filter, self.columns,
                         self.planning_mode, time_travel=True)

    def runtime_filter(self, column: str, values) -> "TableScan":
        """Runtime filtering (SparkBatchQueryScan.filter:127 analog — the
        file-level half of dynamic partition pruning): after the build side
        of a join resolves, re-plan this scan with the collected join keys
        so partition projection + min/max stats drop files no key can hit.
        `values` is an iterable of keys or a single-column DataFrame
        (collected here — runtime filters are small by construction)."""
        if isinstance(values, DataFrame):
            values = [r[0] for r in values.collect()]
        values = [v for v in values if v is not None]
        if not values:
            return self.filter(E.ALWAYS_FALSE)
        return self.filter(E.col(column).isin(values))

    # -- schema -------------------------------------------------------------
    @property
    def schema(self) -> Schema:
        # current reads use the CURRENT schema; time travel pins the
        # snapshot's schema (reference SnapshotScan semantics)
        if self.time_travel and self.snapshot is not None:
            try:
                return self.metadata.schema_by_id(self.snapshot.schema_id)
            except KeyError:
                pass
        return self.metadata.schema

    # -- planning -----------------------------------------------------------
    def plan_files(self) -> ScanPlan:
        report = ScanReport()
        snap = self.snapshot
        if snap is None:  # empty table
            return ScanPlan([], [], [], self.row_filter, None, report)

        schema = self.schema
        bound = E.bind(E.rewrite_not(self.row_filter), schema) \
            if not isinstance(self.row_filter, (E.AlwaysTrue,)) else E.ALWAYS_TRUE
        report.filter_sanitized = E.to_sanitized_string(bound)

        manifests = read_manifest_list(snap.manifest_list)
        report.total_manifests = len(manifests)

        # manifest-list pruning: inclusive partition projection vs summaries
        keep = []
        proj_by_spec: dict = {}
        for m in manifests:
            spec = self.metadata.spec_by_id(m.spec_id)
            if m.spec_id not in proj_by_spec:
                proj_by_spec[m.spec_id] = (
                    E.project(bound, spec, inclusive=True)
                    if not isinstance(bound, E.AlwaysTrue) else E.ALWAYS_TRUE
                )
            proj = proj_by_spec[m.spec_id]
            if isinstance(proj, E.AlwaysTrue) or _manifest_might_match(m, proj):
                keep.append(m)
            else:
                report.skipped_manifests += 1

        mode = self.planning_mode
        if mode == "auto":
            mode = "distributed" if len(keep) > DISTRIBUTED_PLANNING_THRESHOLD else "local"
        report.planning_mode = mode

        prefiltered = None
        if mode == "distributed":
            entries = self._read_entries_spark(keep)
        else:
            if not isinstance(bound, E.AlwaysTrue):
                prefiltered = self._read_entries_local_prefiltered(
                    keep, bound, proj_by_spec)
            if prefiltered is not None:
                entries, pre_total, pre_survived = prefiltered
                report.total_data_files = pre_total
                report.skipped_data_files = pre_total - pre_survived
            else:
                entries = self._read_entries_local(keep)

        data_entries, pos_del, eq_del = [], [], []
        for e in entries:
            if e.status == DELETED:
                continue
            f = e.file
            if f.content == DATA:
                if prefiltered is not None:
                    # partition + metrics filters already applied vectorized
                    data_entries.append(e)
                    continue
                report.total_data_files += 1
                spec = self.metadata.spec_by_id(f.spec_id)
                proj = proj_by_spec.get(f.spec_id)
                if proj is None:
                    proj = (E.project(bound, spec, inclusive=True)
                            if not isinstance(bound, E.AlwaysTrue) else E.ALWAYS_TRUE)
                    proj_by_spec[f.spec_id] = proj
                if not isinstance(proj, E.AlwaysTrue) and not E.evaluate(proj, f.partition):
                    report.skipped_data_files += 1
                    continue
                fs = E.FileStats(f.record_count, f.stats)
                if not isinstance(bound, E.AlwaysTrue) and not E.inclusive_metrics_eval(bound, fs):
                    report.skipped_data_files += 1
                    continue
                data_entries.append(e)
            elif f.content == POSITION_DELETES:
                pos_del.append(e)
            elif f.content == EQUALITY_DELETES:
                eq_del.append(e)

        # delete files relevant to surviving data files (DeleteFileIndex):
        # pos deletes apply when delete.seq >= data.seq; eq when delete.seq > data.seq
        if data_entries:
            min_data_seq = min(e.sequence_number for e in data_entries)
            pos_del = [d for d in pos_del if d.sequence_number >= min_data_seq]
            eq_del = [d for d in eq_del if d.sequence_number > min_data_seq]
            if pos_del:
                # skip delete files that cannot reference any surviving data
                # file: exact match for DVs (referenced_data_file), file_path
                # min/max range intersection otherwise (delete files are
                # range-clustered by file_path at write). Mirrors the
                # "unrelated delete" case of IcebergSourceParquetWith-
                # UnrelatedDeleteBenchmark / DeleteFileIndex lookup.
                import bisect

                # compare location-independent `data/...` suffixes: delete
                # file contents/stats carry write-time absolute paths that
                # go stale when a relative-path table is relocated. All
                # paths in one delete file share the table-root prefix, so
                # stripping it preserves min/max ordering.
                live = sorted(_data_rel(e.file.file_path) for e in data_entries)
                live_set = set(live)
                # partition-bucketed lookup (DeleteFileIndex.java): a
                # partition-scoped delete file only applies to data files
                # in the same partition of the same spec. Pruning is legal
                # only when EVERY surviving data file shares the delete's
                # spec — the delete's tuple is derived under the writer's
                # current spec and says nothing about victims living in
                # older-spec files. All-None tuples (global/path-scoped
                # deletes, DVs) also skip the check — conservative keep.
                def _pkey(f):
                    items = tuple(sorted(
                        (k, v) for k, v in f.partition.items()
                        if v is not None))
                    return (f.spec_id, items) if items else None

                live_parts = {k for k in (_pkey(e.file) for e in data_entries)
                              if k is not None}
                live_specs = {e.file.spec_id for e in data_entries}

                def may_apply(d):
                    key = _pkey(d.file)
                    if (key is not None and live_parts
                            and live_specs == {d.file.spec_id}
                            and key not in live_parts):
                        return False
                    if d.file.referenced_data_file:
                        return _data_rel(d.file.referenced_data_file) in live_set
                    st = d.file.stats.get("file_path")
                    if st and st[0] is not None and st[1] is not None:
                        lo, hi = _data_rel(st[0]), _data_rel(st[1])
                        i = bisect.bisect_left(live, lo)
                        return i < len(live) and live[i] <= hi
                    return True

                pos_del = [d for d in pos_del if may_apply(d)]
            if eq_del:
                # key-range scoping: an equality-delete file can only affect
                # data files whose key-column ranges overlap its own
                # (DeleteFileIndex partition/metrics scoping). Conservative:
                # compare against the union range of surviving data files.
                # Partition-scoped equality deletes (Flink writer shape:
                # partition tuple recorded when spec sources ⊆ key columns)
                # additionally prune by exact partition match, same rules
                # as the pos-delete bucketed lookup above.
                def _eq_pkey(f):
                    items = tuple(sorted(
                        (k, v) for k, v in f.partition.items()
                        if v is not None))
                    return (f.spec_id, items) if items else None

                eq_live_parts = {k for k in
                                 (_eq_pkey(e.file) for e in data_entries)
                                 if k is not None}
                eq_live_specs = {e.file.spec_id for e in data_entries}

                def key_ranges(name):
                    mns = [e.file.stats[name][0] for e in data_entries
                           if e.file.stats.get(name) and e.file.stats[name][0] is not None]
                    mxs = [e.file.stats[name][1] for e in data_entries
                           if e.file.stats.get(name) and e.file.stats[name][1] is not None]
                    return (min(mns), max(mxs)) if mns and mxs else None

                def data_nullfree(name):
                    # bounds cover non-NULL values only; disjoint ranges
                    # prune soundly only when NULL keys provably cannot
                    # match (stats tuple: min,max,nulls,...)
                    return all(e.file.stats.get(name)
                               and e.file.stats[name][2] == 0
                               for e in data_entries)

                def eq_may_apply(d):
                    key = _eq_pkey(d.file)
                    if (key is not None and eq_live_parts
                            and eq_live_specs == {d.file.spec_id}
                            and key not in eq_live_parts):
                        return False
                    for fid in d.file.equality_ids:
                        try:
                            name = schema.field_by_id(fid).name
                        except Exception:
                            return True
                        st = d.file.stats.get(name)
                        rng = key_ranges(name)
                        if st and rng and st[0] is not None and st[1] is not None:
                            try:
                                if (st[1] < rng[0] or st[0] > rng[1]) \
                                        and (st[2] == 0
                                             or data_nullfree(name)):
                                    return False  # disjoint on this key
                            except TypeError:
                                return True
                    return True

                eq_del = [d for d in eq_del if eq_may_apply(d)]
        else:
            pos_del, eq_del = [], []

        report.result_data_files = len(data_entries)
        report.result_delete_files = len(pos_del) + len(eq_del)
        # MetricsReporter loop (reference ScanReport -> reporter): every
        # plan lands in the bounded in-memory sink, surfaced by the
        # `scan_reports` metadata table. Loss-tolerant by contract —
        # reporting must never fail the scan.
        try:
            from .metrics_reporting import SINK, scan_report_json

            ident = getattr(self.table, "identifier", None)
            if ident:
                rj = scan_report_json(
                    ident, report, snap.snapshot_id,
                    self.metadata.current_schema_id,
                    projected_names=self.columns or ())
                rj["metadata"]["engine-relation-cache-hits"] = \
                    str(_RELATION_CACHE_STATS["hits"])
                rj["metadata"]["engine-relation-cache-misses"] = \
                    str(_RELATION_CACHE_STATS["misses"])
                SINK.report(ident, "scan-report", rj)
        except Exception:
            pass
        return ScanPlan(data_entries, pos_del, eq_del, bound, snap, report)

    def _read_entries_local(self, manifests) -> list:
        def rd(m):
            spec = self.metadata.spec_by_id(m.spec_id)
            # manifests carry stats for the schema they were written with;
            # read with the scan schema (field-id keyed cols tolerate drift)
            return read_manifest(m.path, self.schema, spec)

        if len(manifests) <= 2:
            out = []
            for m in manifests:
                out.extend(rd(m))
            return out
        chunks = list(_plan_executor().map(rd, manifests))
        return [e for c in chunks for e in c]

    def _read_entries_local_prefiltered(self, manifests, bound, proj_by_spec):
        """Vectorized local planning: partition + metrics filters evaluated
        as one pyarrow compute expression per manifest, so Python entry
        objects are built only for surviving files. Returns
        (entries, total_data_files, surviving_data_files), or None when the
        predicate isn't arrow-convertible (caller falls back to per-entry
        eval; results identical, this is purely the fast path).
        """
        try:
            import pyarrow.dataset as ds
        except ImportError:  # pragma: no cover
            return None
        schema = self.schema
        live = (ds.field("status") != DELETED) & (ds.field("content") == DATA)

        def rd(m):
            t = read_manifest_arrow(m.path)
            spec = self.metadata.spec_by_id(m.spec_id)
            names = set(t.column_names)
            parts = []
            proj = proj_by_spec.get(m.spec_id, E.ALWAYS_TRUE)
            if not isinstance(proj, E.AlwaysTrue):
                parts.append(E.to_arrow(proj, lambda n: ds.field(f"p_{n}")))
            sf = _stats_filter_arrow(bound, schema, names)
            if sf is not None:
                parts.append(sf)
            if not parts:
                return None
            dk = parts[0]
            for p in parts[1:]:
                dk = dk & p
            surv = t.filter(~live | dk)
            n_total = t.filter(live).num_rows
            n_surv = surv.filter(live).num_rows
            return (entries_from_arrow(surv, schema, spec,
                                       self.metadata.location),
                    n_total, n_surv)

        try:
            if len(manifests) <= 2:
                chunks = [rd(m) for m in manifests]
            else:
                chunks = list(_plan_executor().map(rd, manifests))
        except Exception:
            return None  # unconvertible predicate / type mismatch
        if any(c is None for c in chunks):
            return None
        entries = [e for c in chunks for e in c[0]]
        return (entries,
                sum(c[1] for c in chunks),
                sum(c[2] for c in chunks))

    def _read_entries_spark(self, manifests) -> list:
        """Distributed planning: filter manifests with Spark, collect survivors.

        The partition/metrics filters run cluster-side; only the surviving
        file rows are collected (mirrors BaseDistributedDataScan).
        Encrypted manifests (AES GCM Streams) route through an RDD whose
        tasks decrypt + parse + arrow-prefilter executor-side — same
        cluster-side pruning, Python data plane (the JVM parquet reader
        cannot open a GCM stream)."""
        schema = self.schema
        bound = E.bind(E.rewrite_not(self.row_filter), schema) \
            if not isinstance(self.row_filter, E.AlwaysTrue) else E.ALWAYS_TRUE

        from .manifests import file_key

        enc = [m for m in manifests if file_key(m.path) is not None]
        out_enc = []
        if enc:
            out_enc = self._read_encrypted_entries_spark(enc, bound)
            manifests = [m for m in manifests if file_key(m.path) is None]
            if not manifests:
                return out_enc
        by_spec: dict = {}
        for m in manifests:
            by_spec.setdefault(m.spec_id, []).append(m.path)
        out = []
        from pyspark.sql.pandas.types import from_arrow_schema

        from .manifests import manifest_arrow_schema

        for spec_id, paths in by_spec.items():
            spec = self.metadata.spec_by_id(spec_id)
            # explicit CURRENT manifest schema: no inference job, no
            # mergeSchema footer pass, and manifests written before newer
            # optional columns (content_offset/..., nan counts) read them
            # as null instead of dropping them — a DV entry read without
            # content_offset would be misrouted as a parquet pos-delete.
            # Spark widens int32->long etc. for promoted stats columns;
            # incompatible vintages (e.g. date stats under a promoted
            # timestamp column) fail the read and fall back to the
            # per-manifest field-ID-mapped local reader below.
            read_schema = from_arrow_schema(manifest_arrow_schema(schema, spec))
            df = self.spark.read.schema(read_schema).parquet(*paths)
            cond = F.col("status") != F.lit(DELETED)
            if not isinstance(bound, E.AlwaysTrue):
                proj = E.project(bound, spec, inclusive=True)
                if not isinstance(proj, E.AlwaysTrue):
                    cond = cond & _partition_filter_column(proj, df)
                stats_cond = _stats_filter_column(bound, schema, df)
                if stats_cond is not None:
                    cond = cond & stats_cond
            surv = df.filter(cond)
            try:
                # Arrow transfer + the vectorized lazy-column entry builder
                # — ~3x cheaper than row collect + per-row dict rebuild
                out.extend(entries_from_arrow(
                    surv.toArrow(), schema, spec, self.metadata.location))
            except Exception:
                # stats-type vintage mix: per-manifest reads map by field
                # id and normalize per file (filters re-applied during
                # plan_files' evaluator pass — results identical)
                for p in paths:
                    out.extend(read_manifest(p, schema, spec))
        return out_enc + out

    def _read_encrypted_entries_spark(self, manifests, bound) -> list:
        """Encrypted twin of the distributed manifest read: one Spark job
        over (path, key, aad) triples, each task decrypting its manifests
        and applying the SAME partition/metrics filters as pyarrow compute
        expressions before returning surviving entries. Filtering is a
        conservative-superset optimization — plan_files re-evaluates every
        returned entry — so any executor-side conversion failure safely
        returns the unfiltered live set."""
        from .manifests import file_key

        schema = self.schema
        location = self.metadata.location
        specs = {m.spec_id: self.metadata.spec_by_id(m.spec_id)
                 for m in manifests}
        projs = {}
        if not isinstance(bound, E.AlwaysTrue):
            for sid, spec in specs.items():
                projs[sid] = E.project(bound, spec, inclusive=True)
        payload = [(m.path, *file_key(m.path), m.spec_id) for m in manifests]
        sc = self.spark.sparkContext
        nparts = min(len(payload), sc.defaultParallelism * 2)
        bnd = bound if not isinstance(bound, E.AlwaysTrue) else None

        def rd(args):
            path, key, aad, sid = args
            return _decrypt_manifest_entries(
                path, key, aad, specs[sid], schema, location,
                projs.get(sid), bnd)

        try:
            return sc.parallelize(payload, nparts).flatMap(rd).collect()
        except Exception:
            # unpicklable filter or executor import trouble: driver-side
            # decrypting reads (keys are registered) — results identical
            out = []
            for m in manifests:
                out.extend(read_manifest(m.path, schema, specs[m.spec_id]))
            return out

    # -- read ---------------------------------------------------------------
    def df(self, with_metadata_columns: bool = False,
           with_lineage: bool = False) -> DataFrame:
        plan = self.plan_files()
        return plan_to_df(self, plan, with_metadata_columns,
                          with_lineage=with_lineage)

    def explain_plan(self) -> dict:
        return self.plan_files().report.as_dict()


def _to_expr(expr) -> E.Expr:
    if expr is None:
        return E.ALWAYS_TRUE
    if isinstance(expr, E.Expr):
        return expr
    raise TypeError(f"filter must be an iceberg_spark expression, got {type(expr)}")


def _manifest_might_match(m, proj: E.Expr) -> bool:
    """Evaluate projected partition predicate against manifest-list
    partition-range summaries (ManifestEvaluator.java:50,80-126)."""
    summaries = {n: (cn, mn, mx) for (n, cn, mn, mx) in m.partitions}

    def ev(e: E.Expr) -> bool:
        if isinstance(e, E.AlwaysTrue):
            return True
        if isinstance(e, E.AlwaysFalse):
            return False
        if isinstance(e, E.And):
            return ev(e.left) and ev(e.right)
        if isinstance(e, E.Or):
            return ev(e.left) or ev(e.right)
        if isinstance(e, (E.Predicate, E.BoundPredicate)):
            s = summaries.get(e.term.name)
            if s is None:
                return True
            contains_null, mn, mx = s
            op, lits = e.op, e.literals
            if op == E.IS_NULL:
                return contains_null
            if op == E.NOT_NULL:
                return mn is not None or not contains_null
            if mn is None and mx is None:
                return op in (E.IS_NULL,) if not contains_null else True
            try:
                if op == E.LT:
                    return mn is None or mn < lits[0]
                if op == E.LT_EQ:
                    return mn is None or mn <= lits[0]
                if op == E.GT:
                    return mx is None or mx > lits[0]
                if op == E.GT_EQ:
                    return mx is None or mx >= lits[0]
                if op == E.EQ:
                    return (mn is None or mn <= lits[0]) and (mx is None or mx >= lits[0])
                if op == E.IN:
                    return any(
                        (mn is None or mn <= v) and (mx is None or mx >= v) for v in lits
                    )
                if op == E.STARTS_WITH:
                    v = lits[0]
                    return (mn is None or str(mn)[: len(v)] <= v) and (
                        mx is None or str(mx)[: len(v)] >= v
                    )
            except TypeError:
                return True
            return True
        return True

    return ev(proj)


def _partition_filter_column(proj: E.Expr, df: DataFrame):
    """Projected partition predicate -> Column over p_* manifest columns."""
    return E.to_spark(proj, colfn=lambda n: F.col(f"p_{n}"))


def _decrypt_manifest_entries(path, key, aad, spec, schema, location,
                              proj, bound) -> list:
    """Executor-side encrypted-manifest read: decrypt the AES GCM Stream,
    parse the parquet, arrow-prefilter (best effort — the driver's
    plan_files loop re-evaluates every entry, so filter failures degrade
    to the unfiltered live set, never to wrong results), return entries.
    Module-level so the Spark closure pickles by reference."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from . import io as _eio
    from .encryption import decrypt_stream

    raw = _eio.resolve_io(path).read_bytes(path)
    t = pq.read_table(pa.BufferReader(decrypt_stream(raw, key, aad)))
    try:
        import pyarrow.dataset as ds

        parts = []
        if proj is not None and not isinstance(proj, E.AlwaysTrue):
            parts.append(E.to_arrow(proj, lambda n: ds.field(f"p_{n}")))
        if bound is not None:
            sf = _stats_filter_arrow(bound, schema, set(t.column_names))
            if sf is not None:
                parts.append(sf)
        if parts:
            live = ((ds.field("status") != DELETED)
                    & (ds.field("content") == DATA))
            cond = parts[0]
            for p in parts[1:]:
                cond = cond & p
            t = t.filter(~live | cond)
    except Exception:
        pass
    return entries_from_arrow(t, schema, spec, location)


def _stats_filter_arrow(bound: E.Expr, schema: Schema, names: set):
    """Inclusive metrics filter as a pyarrow expression over min_f*/max_f*
    manifest columns — the vectorized twin of _stats_filter_column (and of
    inclusive_metrics_eval for the comparison ops). Missing stats keep the
    file; unprunable ops become scalar(True). Returns None when nothing can
    prune."""
    import pyarrow.dataset as ds

    TRUE = ds.scalar(True)

    def conv(e: E.Expr):
        if isinstance(e, E.AlwaysTrue):
            return TRUE
        if isinstance(e, E.AlwaysFalse):
            return ds.scalar(False)
        if isinstance(e, E.And):
            return conv(e.left) & conv(e.right)
        if isinstance(e, E.Or):
            return conv(e.left) | conv(e.right)
        if isinstance(e, E.BoundPredicate):
            if e.term.transform is not None and not isinstance(e.term.transform, Identity):
                return TRUE
            fid = e.term.field.field_id
            mn, mx = f"min_f{fid}", f"max_f{fid}"
            if mn not in names:
                return TRUE
            cmin, cmax = ds.field(mn), ds.field(mx)
            cnull, cval = ds.field(f"nulls_f{fid}"), ds.field(f"values_f{fid}")
            cnan = ds.field(f"nans_f{fid}")
            op, lits = e.op, e.literals
            all_null = (~cnull.is_null() & ~cval.is_null()
                        & (cnull == cval) & (cval > 0))
            # containsNaNsOnly: NaN matches no comparison (bounds are NaN-free)
            all_nan = (~cnan.is_null() & ~cval.is_null()
                       & (cnan == cval) & (cval > 0))
            if op == E.IS_NULL:
                return cnull.is_null() | (cnull > 0)
            if op == E.NOT_NULL:
                return ~all_null
            if op == E.IS_NAN:
                return cnan.is_null() | (cnan > 0)
            if op == E.NOT_NAN:
                return ~all_nan
            not_all_null = ~all_null & ~all_nan
            # engine NaN ordering: NaN > any literal — a float file with
            # (possible) NaNs may match gt/gtEq regardless of its max
            floaty = e.term.field.type in ("float", "double")
            may_nan = (cnan.is_null() | (cnan > 0)) if floaty else ds.scalar(False)
            if op == E.LT:
                return not_all_null & (cmin.is_null() | (cmin < lits[0]))
            if op == E.LT_EQ:
                return not_all_null & (cmin.is_null() | (cmin <= lits[0]))
            if op == E.GT:
                return ~all_null & (may_nan | cmax.is_null() | (cmax > lits[0]))
            if op == E.GT_EQ:
                return ~all_null & (may_nan | cmax.is_null() | (cmax >= lits[0]))
            if op == E.EQ:
                return not_all_null & (
                    (cmin.is_null() | (cmin <= lits[0]))
                    & (cmax.is_null() | (cmax >= lits[0]))
                )
            if op == E.IN:
                c = ds.scalar(False)
                for v in lits:
                    c = c | ((cmin.is_null() | (cmin <= v))
                             & (cmax.is_null() | (cmax >= v)))
                return not_all_null & c
            return TRUE
        return TRUE

    out = conv(bound)
    if str(out) == str(TRUE):  # nothing prunable -> let caller fall back
        return None
    return out


def _stats_filter_column(bound: E.Expr, schema: Schema, df: DataFrame):
    """Inclusive metrics filter as a Spark Column over min_f*/max_f* columns.

    Returns None when the expression can't prune. 'Might match' semantics:
    missing stats (NULL) keep the file.
    """
    cols = set(df.columns)

    def conv(e: E.Expr):
        if isinstance(e, E.AlwaysTrue):
            return F.lit(True)
        if isinstance(e, E.AlwaysFalse):
            return F.lit(False)
        if isinstance(e, E.And):
            return conv(e.left) & conv(e.right)
        if isinstance(e, E.Or):
            return conv(e.left) | conv(e.right)
        if isinstance(e, E.BoundPredicate):
            if e.term.transform is not None and not isinstance(e.term.transform, Identity):
                return F.lit(True)
            fid = e.term.field.field_id
            mn, mx = f"min_f{fid}", f"max_f{fid}"
            nulls, values = f"nulls_f{fid}", f"values_f{fid}"
            if mn not in cols:
                return F.lit(True)
            cmin, cmax = F.col(mn), F.col(mx)
            cnull, cval = F.col(nulls), F.col(values)
            cnan = F.col(f"nans_f{fid}")
            op, lits = e.op, e.literals
            all_null = cnull.isNotNull() & cval.isNotNull() & (cnull == cval) & (cval > 0)
            # containsNaNsOnly: NaN matches no comparison (bounds are NaN-free)
            all_nan = cnan.isNotNull() & cval.isNotNull() & (cnan == cval) & (cval > 0)
            if op == E.IS_NULL:
                return cnull.isNull() | (cnull > 0)
            if op == E.NOT_NULL:
                return ~all_null
            if op == E.IS_NAN:
                return cnan.isNull() | (cnan > 0)
            if op == E.NOT_NAN:
                return ~all_nan
            not_all_null = ~all_null & ~all_nan
            # engine NaN ordering: NaN > any literal — a float file with
            # (possible) NaNs may match gt/gtEq regardless of its max
            floaty = e.term.field.type in ("float", "double")
            may_nan = (cnan.isNull() | (cnan > 0)) if floaty else F.lit(False)
            if op == E.LT:
                return not_all_null & (cmin.isNull() | (cmin < F.lit(lits[0])))
            if op == E.LT_EQ:
                return not_all_null & (cmin.isNull() | (cmin <= F.lit(lits[0])))
            if op == E.GT:
                return ~all_null & (may_nan | cmax.isNull() | (cmax > F.lit(lits[0])))
            if op == E.GT_EQ:
                return ~all_null & (may_nan | cmax.isNull() | (cmax >= F.lit(lits[0])))
            if op == E.EQ:
                return not_all_null & (
                    (cmin.isNull() | (cmin <= F.lit(lits[0])))
                    & (cmax.isNull() | (cmax >= F.lit(lits[0])))
                )
            if op == E.IN:
                c = F.lit(False)
                for v in lits:
                    c = c | (
                        (cmin.isNull() | (cmin <= F.lit(v)))
                        & (cmax.isNull() | (cmax >= F.lit(v)))
                    )
                return not_all_null & c
            return F.lit(True)
        return F.lit(True)

    try:
        return conv(bound)
    except Exception:
        return None


# ---------------------------------------------------------------------------
# read path: plan -> DataFrame
# ---------------------------------------------------------------------------

# Tiered pos-delete application (the DeleteFilter.java:188 analog, sized by
# plan metadata — no data read needed to decide):
#   <= driver limit   -> driver pyarrow read, run-length ranges, codegen filter
#   <= broadcast limit-> executor read + broadcast hash anti-join
#   above             -> shuffled hash anti-join (no executor holds it all)
POS_DELETE_DRIVER_BYTES = 16 * 1024 * 1024
POS_DELETE_BROADCAST_BYTES = 64 * 1024 * 1024
POS_DELETE_MAX_LITERAL_RANGES = 256
# path -> (native variant names, companion cols | None=unprobed): footer
# probes survive across plans (paths are immutable uuid-named files)
_VAR_SIG_CACHE: dict = {}
_VAR_SIG_CACHE_CAP = 65_536

EQ_DELETE_DRIVER_BYTES = 1024 * 1024
# beyond a few thousand keys the literal path loses twice: building N
# Literal objects through py4j costs ~0.6ms each (9.7s at 15k keys,
# measured), and codegen'd InSet probes run slower than a broadcast
# hash anti-join's build side at that cardinality — so big sets keep
# the join. record_count from the manifest pre-gates WITHOUT reading.
# r13: crossover to the compiled probe lowered 4096 -> 256. At 1.5k
# keys the literal tier measured 530 ms vs the probe's 306 on the
# sf0.1 eq-MoR pair (isin plan BUILD alone 31 ms vs 5.6 — a
# 1500-literal INSET node is expensive to construct, analyze and
# serialize; the probe is one constant-size StaticInvoke). Below
# ~hundreds of keys the literal tier keeps its edge: trivial plan cost
# plus a parquet-pushable In() that can still skip row groups on
# clustered layouts — exactly the deployments where small delete sets
# have narrow key ranges.
EQ_DELETE_MAX_LITERAL_KEYS = 256
# literal NOT-IN needs exact value semantics under isin(); float/double
# NaN and timestamp zone coercion make those types join-path only
_EQ_LITERAL_TYPES = ("int", "long", "string", "date")
# Above the isin cap, keys load into a compiled sorted-array probe
# (StaticInvoke of SortedSetProbe, jvm_probe.py): ONE expression node
# (no 15k-literal Catalyst tree), one primitive binary search per row
# (no boxed-set probe), no join stage. sf1 measured: eq-MoR scan ratio
# vs the no-delete twin 2.4x (anti-join) -> ~1.25x. Caps bound the
# driver-side delete read and the serialized plan payload; bigger sets
# keep the distributed anti-join.
EQ_DELETE_MAX_PROBE_KEYS = 1_000_000
EQ_DELETE_PROBE_BYTES = 32 * 1024 * 1024
_EQ_PROBE_TYPES = ("int", "long", "string", "date")
# r14: run-compressed tier ABOVE both of the above. When the delete key
# set compresses to few contiguous runs (retention windows, sequential
# PK deletes, the lowest-N% layouts), `NOT(k BETWEEN lo AND hi OR ...)`
# is exactly equivalent to NOT-IN over the keys for integer-valued
# types — and unlike the compiled probe it is a PLAIN Catalyst
# predicate, so it pushes through the DataSource API into the parquet
# reader: row groups wholly inside a deleted run are skipped via
# min/max stats (zero rows decoded), and surviving rows pay 2
# comparisons per run instead of a binary search over the whole key
# set (the probe's ~8 ns/row floor on this box class is memory-latency,
# which no probe structure fixes — §6 data-layout lever instead).
# Exact only for types where the integer range [lo, hi] contains no
# values outside the key set: int, long, date (day-precision).
EQ_DELETE_MAX_RANGE_RUNS = 16
_EQ_RANGE_TYPES = ("int", "long", "date")


def _eq_key_runs(keys, ftype: str, cap: int):
    """Compress a SORTED, de-duplicated key list into inclusive
    [lo, hi] adjacency runs. Returns the run list, or None when the
    type is not exactly-rangeable, the keys do not compress below
    `cap` runs, or no compression happened (runs == keys — scattered
    sets keep the isin/probe tiers)."""
    if ftype not in _EQ_RANGE_TYPES or not keys or cap <= 0:
        return None
    if ftype == "date":
        import datetime as _dt

        if not all(isinstance(k, _dt.date) for k in keys):
            return None

        def _adjacent(a, b):
            return (b - a) == _dt.timedelta(days=1)
    else:
        if not all(isinstance(k, int) for k in keys):
            return None

        def _adjacent(a, b):
            return b - a == 1
    runs = []
    lo = hi = keys[0]
    for k in keys[1:]:
        if _adjacent(hi, k):
            hi = k
            continue
        runs.append((lo, hi))
        if len(runs) >= cap:
            return None
        lo = hi = k
    runs.append((lo, hi))
    if len(runs) > cap or len(runs) >= len(keys):
        return None
    return runs


def _conf_int(spark, key: str, default: int) -> int:
    v = spark.conf.get(key, None)
    return int(v) if v is not None else default


# (session id, sorted delete-file paths, column name) -> filter Column.
# Delete files are immutable (uuid-named, never rewritten in place), so
# the literal NOT-IN filter built from them can be reused across every
# re-plan of the same snapshot — building 1500 Literal objects through
# py4j costs ~1s, executing the cached codegen'd filter costs ~0.
_EQ_LITERAL_FILTER_CACHE: dict = {}
_EQ_LITERAL_FILTER_CACHE_CAP = 256

# Relation cache: `spark.read.schema(s).format(f).load(paths)` builds an
# InMemoryFileIndex by stat-ing EVERY path — ~0.9s of driver time at 320
# files, paid per query (Spark's own catalog tables cache their file
# index; a path-list read cannot). Data files are immutable and
# uuid-named, so a (schema, format, sorted paths) key can never serve
# stale bytes; expired files simply stop appearing in new plans' keys.
# LRU: hits refresh recency, the oldest entry alone evicts at cap — a
# long-lived session alternating >cap path-sets must not thrash the
# whole cache the way a wholesale clear() did. Session-cumulative
# hit/miss counters ride every scan report ("engine-relation-cache-*"
# metadata), making cold-start file-index cost observable per query.
_RELATION_CACHE: dict = {}
_RELATION_CACHE_CAP = 128
_RELATION_CACHE_STATS = {"hits": 0, "misses": 0}


def _cached_file_df(spark, ffmt: str, read_schema, paths):
    key = (spark.sparkContext.applicationId, ffmt, str(read_schema),
           tuple(paths))
    df = _RELATION_CACHE.pop(key, None)
    if df is None:
        _RELATION_CACHE_STATS["misses"] += 1
        while len(_RELATION_CACHE) >= _RELATION_CACHE_CAP:
            _RELATION_CACHE.pop(next(iter(_RELATION_CACHE)))
        df = spark.read.schema(read_schema).format(ffmt).load(list(paths))
    else:
        _RELATION_CACHE_STATS["hits"] += 1
    _RELATION_CACHE[key] = df  # (re)insert at most-recent position
    return df


# Delete-content cache (reference SparkExecutorCache: spark/v4.0/.../
# SparkExecutorCache.java — the reference caches decoded delete-file
# content across scan tasks because delete files are immutable and
# re-read on every scan of the same snapshot). Engine analog: the
# anti-join BUILD side (the delete-key DataFrame) is persisted
# MEMORY_AND_DISK and keyed by the delete files' (path, write-schema,
# seq) identity, so repeated scans of a snapshot pay the delete-file
# read job once. LRU by insertion order; evicted entries unpersist.
DELETE_CACHE_BYTES = 128 * 1024 * 1024  # reference executor-cache default
_DELETE_BUILD_CACHE: dict = {}
_DELETE_BUILD_CACHE_CAP = 64


def _delete_build_cached(spark, dels, ck_extra, builder):
    """Return builder() persisted + cached under the delete set's
    identity, or unpersisted when caching is off / the set is too big.
    Cache key carries the application id (a restarted session must not
    reuse DataFrames pointing into a dead JVM) and each file's
    write-schema id (column-name mapping) — sequence numbers go in via
    ck_extra on paths that bake them into the frame."""
    if not _conf_bool(spark, "spark.iceberg_spark.mor.deleteCacheEnabled",
                      True):
        return builder()
    cap = _conf_int(spark, "spark.iceberg_spark.mor.deleteCacheBytes",
                    DELETE_CACHE_BYTES)
    if sum(d.file.file_size_in_bytes or 0 for d in dels) > cap:
        return builder()
    ck = (spark.sparkContext.applicationId, ck_extra,
          tuple(sorted((d.file.file_path, d.file.write_schema_id)
                       for d in dels)))
    dd = _DELETE_BUILD_CACHE.get(ck)
    if dd is None:
        from pyspark import StorageLevel

        dd = builder().persist(StorageLevel.MEMORY_AND_DISK)
        while len(_DELETE_BUILD_CACHE) >= _DELETE_BUILD_CACHE_CAP:
            old = _DELETE_BUILD_CACHE.pop(next(iter(_DELETE_BUILD_CACHE)))
            try:
                old.unpersist(blocking=False)
            except Exception:
                pass
        _DELETE_BUILD_CACHE[ck] = dd
    return dd


def _conf_bool(spark, key: str, default: bool) -> bool:
    v = spark.conf.get(key, None)
    return default if v is None else str(v).lower() == "true"


def _eq_build_bounds_filter(dd, plan, key_cols):
    """DeleteFileIndex-style build-side scoping (reference core/.../
    DeleteFileIndex.java bounds intersection): delete keys outside the
    union of the scanned data files' key bounds cannot match any row,
    so drop them before the broadcast/shuffle build — a filter on the
    build side shrinks it toward broadcastability and pushes to the
    delete files' own row-group stats. NULL delete keys are kept (they
    match NULL data keys under eqNullSafe). Bounds come from the data
    manifests — no extra read. Float/double keys also keep NaN delete
    keys: data-file min/max bounds exclude NaN by spec, and `NaN
    between lo and hi` is false under Spark ordering, yet the
    anti-join's eqNullSafe treats NaN=NaN as true — filtering NaN out
    of the build side would silently resurrect NaN-keyed deletes."""
    float_keys = {f.name for f in dd.schema.fields
                  if f.dataType.typeName() in ("float", "double")}
    for i, name in enumerate(key_cols):
        los, his = [], []
        for e in plan.files:
            st = e.file.stats.get(name)
            if not st or st[0] is None or st[1] is None:
                los = None  # a file without bounds may hold any key
                break
            los.append(st[0])
            his.append(st[1])
        if not los:
            continue
        try:
            lo, hi = min(los), max(his)
        except TypeError:
            continue
        if isinstance(lo, float) and (lo != lo or hi != hi):
            continue  # NaN bounds carry no ordering
        c = F.col(f"__delk_{i}")
        try:
            keep = c.isNull() | c.between(F.lit(lo), F.lit(hi))
            if f"__delk_{i}" in float_keys:
                keep = keep | F.isnan(c)
            dd = dd.filter(keep)
        except Exception:
            continue  # unliteralizable bound type: scoping is optional
    return dd


# pairwise (data file x delete file) applicability checks are plan-time
# driver work; cap keeps pathological metadata shapes off the O(F*D) path
EQ_SPLIT_MAX_PAIRS = 2_000_000


def _eq_applies_to_file(d, e, schema, _name_cache):
    """Would equality-delete entry `d` possibly affect rows of data
    entry `e`? Per-file DeleteFileIndex lookup (reference core/.../
    DeleteFileIndex.java: seq scoping + partition grouping + key-bounds
    intersection). Conservative: unknown -> True."""
    if d.sequence_number <= e.sequence_number:
        return False

    def pkey(f):
        items = tuple(sorted((k, v) for k, v in f.partition.items()
                             if v is not None))
        return (f.spec_id, items) if items else None

    dk = pkey(d.file)
    if dk is not None and e.file.spec_id == d.file.spec_id:
        ek = pkey(e.file)
        if ek is not None and ek != dk:
            return False
    for fid in d.file.equality_ids:
        if fid not in _name_cache:
            try:
                _name_cache[fid] = schema.field_by_id(fid).name
            except Exception:
                _name_cache[fid] = None
        nm = _name_cache[fid]
        if nm is None:
            continue
        dst = d.file.stats.get(nm)
        est = e.file.stats.get(nm)
        if (not dst or not est or dst[0] is None or dst[1] is None
                or est[0] is None or est[1] is None):
            continue
        try:
            disjoint = dst[1] < est[0] or dst[0] > est[1]
        except TypeError:
            continue
        # bounds cover non-NULL values only: a NULL delete key still
        # matches NULL data values, so disjoint ranges prune only when
        # one side provably holds no NULLs (stats tuple: min,max,nulls)
        if disjoint and (dst[2] == 0 or est[2] == 0):
            return False
    return True


def _pos_deletes_for(pos_dels, entries):
    """The subset of pos-delete entries that may reference any of
    `entries` — same per-file scoping rules the planner applies
    (referenced_data_file exact, file_path bounds range, else keep)."""
    if not pos_dels:
        return []
    import bisect

    live = sorted(_data_rel(e.file.file_path) for e in entries)
    live_set = set(live)
    out = []
    for d in pos_dels:
        if d.file.referenced_data_file:
            if _data_rel(d.file.referenced_data_file) in live_set:
                out.append(d)
            continue
        st = d.file.stats.get("file_path")
        if st and st[0] is not None and st[1] is not None:
            lo, hi = _data_rel(st[0]), _data_rel(st[1])
            i = bisect.bisect_left(live, lo)
            if i < len(live) and live[i] <= hi:
                out.append(d)
            continue
        out.append(d)  # unscoped: conservatively reaches every branch
    return out


def _pos_split_plan(plan: ScanPlan, spark):
    """Pos-delete twin of _eq_split_plan, for plans the inline-ranges
    path cannot serve (scattered/oversized delete sets, or metadata
    columns already materialized): attach pos deletes per data file by
    referenced_data_file / file_path-bounds lookup and split the scan
    so untouched files skip the anti-join probe entirely. Returns
    (clear_plan, dirty_plan) or None."""
    if not _conf_bool(spark, "spark.iceberg_spark.mor.posSplitScan",
                      True):
        return None
    files, dels = plan.files, plan.pos_deletes
    if len(files) < 2 or len(files) * len(dels) > EQ_SPLIT_MAX_PAIRS:
        return None
    import bisect

    order = sorted((_data_rel(e.file.file_path), i)
                   for i, e in enumerate(files))
    keys = [k for k, _ in order]
    dirty_idx: set = set()
    for d in dels:
        if d.file.referenced_data_file:
            rel = _data_rel(d.file.referenced_data_file)
            j = bisect.bisect_left(keys, rel)
            if j < len(keys) and keys[j] == rel:
                dirty_idx.add(order[j][1])
            continue
        st = d.file.stats.get("file_path")
        if st and st[0] is not None and st[1] is not None:
            lo, hi = _data_rel(st[0]), _data_rel(st[1])
            j = bisect.bisect_left(keys, lo)
            while j < len(keys) and keys[j] <= hi:
                dirty_idx.add(order[j][1])
                j += 1
            continue
        return None  # unscoped delete may reference anything: no split
    if not dirty_idx or len(dirty_idx) == len(files):
        return None
    clear = [e for i, e in enumerate(files) if i not in dirty_idx]
    dirty = [e for i, e in enumerate(files) if i in dirty_idx]
    clear_plan = ScanPlan(clear, [], [], plan.residual, plan.snapshot,
                          plan.report)
    dirty_plan = ScanPlan(dirty, dels, [], plan.residual, plan.snapshot,
                          plan.report, no_split=True)
    return clear_plan, dirty_plan


def _eq_split_plan(plan: ScanPlan, schema, spark):
    """DeleteFileIndex analog: attach equality deletes per DATA file and
    split the scan into a CLEAR branch (files no delete can touch — read
    plain, zero anti-join probe cost) and a DIRTY branch (anti-join as
    before). Returns (clear_plan, dirty_plan_or_None) or None when no
    file is provably clear. At 100 TB this is the difference between
    probing every row of the table through the delete join and probing
    only the key-range/partition slice the deletes can reach."""
    if not _conf_bool(spark, "spark.iceberg_spark.mor.eqSplitScan", True):
        return None
    files, dels = plan.files, plan.eq_deletes
    if len(files) < 2 or len(files) * len(dels) > EQ_SPLIT_MAX_PAIRS:
        return None
    names: dict = {}
    dirty, clear = [], []
    for e in files:
        (dirty if any(_eq_applies_to_file(d, e, schema, names)
                      for d in dels)
         else clear).append(e)
    if not clear:
        return None
    clear_plan = ScanPlan(clear, _pos_deletes_for(plan.pos_deletes, clear),
                          [], plan.residual, plan.snapshot, plan.report)
    if not dirty:
        return clear_plan, None
    dirty_plan = ScanPlan(dirty, _pos_deletes_for(plan.pos_deletes, dirty),
                          dels, plan.residual, plan.snapshot, plan.report,
                          no_split=True)
    return clear_plan, dirty_plan


def _eq_group_inline_cond(spark, metadata, schema, ids, dels):
    """(cond, tier) for one single-key uniform-seq equality-delete
    group, through the tier ladder: "trivial" (empty/NULL-only set),
    "range" (adjacency-run complement — parquet-pushable), "isin"
    (small literal NOT-IN — parquet-pushable), "probe" (compiled
    sorted-set StaticInvoke). (None, None) when only the distributed
    anti-join can serve. Cached per (app id, strategy confs, delete
    files, key column) — a raised/lowered cap must re-decide, not
    replay a stale choice, and a restarted session must never reuse
    Column handles pointing into a dead JVM."""
    key_col = schema.field_by_id(ids[0]).name
    lit_bytes = _conf_int(
        spark, "spark.iceberg_spark.mor.eqDeleteDriverBytes",
        EQ_DELETE_DRIVER_BYTES)
    lit_keys = _conf_int(
        spark, "spark.iceberg_spark.mor.eqDeleteLiteralKeys",
        EQ_DELETE_MAX_LITERAL_KEYS)
    probe_bytes = _conf_int(
        spark, "spark.iceberg_spark.mor.eqDeleteProbeBytes",
        EQ_DELETE_PROBE_BYTES)
    probe_keys = _conf_int(
        spark, "spark.iceberg_spark.mor.eqDeleteProbeKeys",
        EQ_DELETE_MAX_PROBE_KEYS)
    run_cap = _conf_int(
        spark, "spark.iceberg_spark.mor.eqDeleteRangeRuns",
        EQ_DELETE_MAX_RANGE_RUNS)
    ck = (spark.sparkContext.applicationId,
          lit_bytes, lit_keys, probe_bytes, probe_keys, run_cap,
          tuple(sorted(d.file.file_path for d in dels)), key_col)
    hit = _EQ_LITERAL_FILTER_CACHE.get(ck)
    if hit is not None:
        return hit
    cond, tier = None, None
    ftype = schema.field_by_id(ids[0]).type
    probe_ok = (isinstance(ftype, str)
                and ftype in _EQ_PROBE_TYPES
                and probe_keys > lit_keys)
    # pre-check the JVM helper before paying a driver read the isin
    # path would have refused anyway
    if probe_ok and sum(d.file.record_count or 0
                        for d in dels) > lit_keys:
        from . import jvm_probe

        probe_ok = jvm_probe.available(spark)
    big_bytes = max(lit_bytes, probe_bytes) if probe_ok else lit_bytes
    big_keys = max(lit_keys, probe_keys) if probe_ok else lit_keys
    lit = _eq_delete_literal_keys(metadata, schema, ids[0], dels, spark,
                                  big_bytes, big_keys)
    if lit is not None:
        keys, saw_null = lit
        small = (len(keys) <= lit_keys
                 and sum(d.file.file_size_in_bytes or 0
                         for d in dels) <= lit_bytes)
        runs = _eq_key_runs(keys, ftype, run_cap)
        c = F.col(key_col)
        if not keys:
            cond = c.isNotNull() if saw_null else F.lit(True)
            tier = "trivial"
        elif runs is not None:
            # run-compressed tier: exactly NOT-IN over the keys
            # (integer-valued adjacency runs), but parquet-pushable —
            # row groups wholly inside a deleted run are skipped by
            # min/max stats
            rc = None
            for lo, hi in runs:
                piece = (c >= F.lit(lo)) & (c <= F.lit(hi))
                rc = piece if rc is None else (rc | piece)
            cond = (c.isNotNull() & ~rc) if saw_null else (c.isNull() | ~rc)
            tier = "range"
        elif small:
            if saw_null:
                cond = c.isNotNull() & ~c.isin(keys)
            else:
                cond = c.isNull() | ~c.isin(keys)
            tier = "isin"
        else:
            from . import jvm_probe

            cond = jvm_probe.not_in_filter(spark, key_col, keys, ftype,
                                           saw_null)
            tier = "probe" if cond is not None else None
    if len(_EQ_LITERAL_FILTER_CACHE) >= _EQ_LITERAL_FILTER_CACHE_CAP:
        _EQ_LITERAL_FILTER_CACHE.clear()
    _EQ_LITERAL_FILTER_CACHE[ck] = (cond, tier)
    return cond, tier


# Tiers whose per-row cost is near-zero (a few comparisons / one InSet
# lookup) AND that push into the parquet reader. For these, reading all
# files as ONE relation with the filter everywhere beats the
# clear/dirty split's second relation + file index + task wave — the
# eq analog of r13's single-relation position-probe read (change #8).
# The probe tier stays split: its per-row binary search is real money
# on clean files at scale (memory-latency-bound on virtualized cores).
_EQ_CHEAP_TIERS = ("trivial", "range", "isin")


def _eq_cheap_inline_all(spark, metadata, schema, plan) -> bool:
    """True when EVERY equality-delete group of `plan` will apply as a
    cheap pushable scalar filter, making the clear/dirty plan split a
    net loss. Conservative: any join-path or probe-tier group keeps
    the split."""
    if not _conf_bool(spark, "spark.iceberg_spark.mor.eqSingleRelation",
                      True):
        return False
    if plan.pos_deletes:
        return False  # split also routes pos deletes; keep it
    uniform = max((e.sequence_number for e in plan.files), default=-1) \
        < min(d.sequence_number for d in plan.eq_deletes)
    if not uniform:
        return False
    by_ids: dict = {}
    for d in plan.eq_deletes:
        by_ids.setdefault(tuple(sorted(d.file.equality_ids)), []).append(d)
    for ids, dels in by_ids.items():
        if len(ids) != 1:
            return False
        cond, tier = _eq_group_inline_cond(spark, metadata, schema, ids,
                                           dels)
        if cond is None or tier not in _EQ_CHEAP_TIERS:
            return False
    return True


def _eq_delete_literal_keys(metadata, schema, fid: int, dels, spark,
                            byte_cap=None, key_cap=None):
    """Driver-side read of a SMALL single-column equality-delete set,
    returning (sorted key list, saw_null) — or None when the set is too
    big, encrypted with a raw footer DEK, non-parquet, or the key type
    lacks exact literal semantics. Mirrors the pos-delete literal-range
    fast path: a codegen'd NOT-IN filter replaces a whole anti-join
    stage (and its delete-file read job) for the dominant Flink-upsert
    layout of many tiny PK delete files. The byte cap bounds driver
    memory the same way POS_DELETE_DRIVER_BYTES does; big delete sets
    keep the distributed anti-join. Caps default to the isin-literal
    confs; the jvm set-probe caller passes its own larger ones."""
    ftype = schema.field_by_id(fid).type
    if not (isinstance(ftype, str)
            and (ftype in _EQ_LITERAL_TYPES
                 or ftype.startswith("decimal"))):
        return None
    limit = byte_cap if byte_cap is not None else _conf_int(
        spark, "spark.iceberg_spark.mor.eqDeleteDriverBytes",
        EQ_DELETE_DRIVER_BYTES)
    if sum(d.file.file_size_in_bytes or 0 for d in dels) > limit:
        return None
    if key_cap is None:
        key_cap = _conf_int(spark,
                            "spark.iceberg_spark.mor.eqDeleteLiteralKeys",
                            EQ_DELETE_MAX_LITERAL_KEYS)
    if sum(d.file.record_count or 0 for d in dels) > key_cap:
        return None  # manifest counts pre-gate: no driver read wasted
    if any(d.file.file_format != "parquet" for d in dels):
        return None
    keys: set = set()
    saw_null = False
    for d in dels:
        try:
            wsch = metadata.schema_by_id(d.file.write_schema_id)
        except KeyError:
            wsch = schema
        name = wsch.field_by_id(fid).name
        if d.file.key_metadata:
            from .parquet_crypto import (file_crypto, read_encrypted,
                                         resolve_key)

            fc = file_crypto(d.file.key_metadata)
            if fc[0] == "raw":
                return None  # pyarrow cannot open raw-footer-key parquet
            tbl = read_encrypted(d.file.file_path, resolve_key(fc[1]),
                                 columns=[name])
        else:
            tbl = _io.read_parquet(d.file.file_path, columns=[name])
        for v in tbl.column(name).to_pylist():
            if v is None:
                saw_null = True
            else:
                keys.add(v)
        if len(keys) > key_cap:
            return None
    return sorted(keys), saw_null


def _pos_delete_bytes(plan: ScanPlan) -> int:
    # a DV entry's cost is its blob (content_size_in_bytes), not the whole
    # Puffin file it shares with other vectors
    return sum(
        (d.file.content_size_in_bytes
         if d.file.content_size_in_bytes is not None
         else d.file.file_size_in_bytes) or 0
        for d in plan.pos_deletes)


def _is_dv(f) -> bool:
    return f.file_format == "puffin" and f.content_offset is not None


def pos_delete_rows_df(spark, deletes, with_source: bool = False):
    """All deleted (file_path, pos) rows of a pos-delete entry list as one
    DataFrame, whatever the physical encoding: parquet position-delete
    files read natively; Puffin deletion-vector-v1 blobs expanded on
    executors (Arrow-batched, one blob per referenced file — the blob read
    is an offset/length seek, never a full-file parse). With
    `with_source`, a third `delete_file_path` column names the containing
    delete file (PositionDeletesTable parity)."""
    import pandas as _pd

    from .parquet_crypto import file_crypto, resolve_key, \
        unwrap_stream_key

    pq_paths = sorted({d.file.file_path for d in deletes
                       if not _is_dv(d.file) and not d.file.key_metadata})
    # encrypted pos-delete parquet: master keys resolve DRIVER-side
    # (registry/env) and ship unwrapped inside the task closure — the
    # same key-plumbing shape as the encrypted data-file reader. Raw-DEK
    # files (imported reference-native encryption) collect separately:
    # JVM factory only.
    enc_pq: dict = {}
    enc_by_kid: dict = {}
    raw_pq: list = []
    for d in deletes:
        if not _is_dv(d.file) and d.file.key_metadata:
            fc = file_crypto(d.file.key_metadata)
            if fc[0] == "raw":
                raw_pq.append(d.file)
                continue
            kid = fc[1]
            enc_pq[d.file.file_path] = resolve_key(kid)
            enc_by_kid.setdefault(kid, set()).add(d.file.file_path)
    # encrypted DV Puffin containers: ags1-kms key_metadata -> (key, aad)
    dv_keys = {d.file.file_path: unwrap_stream_key(d.file.key_metadata)
               for d in deletes if _is_dv(d.file) and d.file.key_metadata}
    dv_rows = [(d.file.file_path, int(d.file.content_offset),
                int(d.file.content_size_in_bytes),
                d.file.referenced_data_file)
               for d in deletes if _is_dv(d.file)]
    dfs = []
    if pq_paths:
        # explicit schema: skips the inference job spark.read would run
        pdf = spark.read.schema("file_path string, pos long") \
            .parquet(*pq_paths)
        cols = [F.col("file_path"), F.col("pos")]
        if with_source:
            cols.append(_io.decode_spark_path_col(
                F.col("_metadata.file_path"),
                paths=pq_paths).alias("delete_file_path"))
        dfs.append(pdf.select(*cols))
    if enc_pq:
        from . import jvm_crypto

        if jvm_crypto.available(spark):
            for kid, kpaths in enc_by_kid.items():
                kp = sorted(kpaths)
                pdf = (spark.read
                       .options(**jvm_crypto.reader_options(
                           kid, resolve_key(kid)))
                       .schema("file_path string, pos long")
                       .parquet(*kp))
                cols = [F.col("file_path"), F.col("pos")]
                if with_source:
                    cols.append(_io.decode_spark_path_col(
                        F.col("_metadata.file_path"),
                        paths=kp).alias("delete_file_path"))
                dfs.append(pdf.select(*cols))
            enc_pq = {}
    if raw_pq:
        from . import jvm_crypto

        if not jvm_crypto.available(spark):
            raise NotImplementedError(
                "natively-encrypted position-delete files (raw footer "
                "DEK) require the JVM crypto path; unavailable in this "
                "session and pyarrow cannot open raw-footer-key parquet")
        for batch in _unique_name_batches(raw_pq):
            pk = {f.file_path: file_crypto(f.key_metadata)[1:]
                  for f in batch}
            kp = sorted(pk)
            pdf = (spark.read
                   .options(**jvm_crypto.raw_reader_options(pk))
                   .schema("file_path string, pos long").parquet(*kp))
            cols = [F.col("file_path"), F.col("pos")]
            if with_source:
                cols.append(_io.decode_spark_path_col(
                    F.col("_metadata.file_path"),
                    paths=kp).alias("delete_file_path"))
            dfs.append(pdf.select(*cols))
    if enc_pq:
        enc_schema = "file_path string, pos long"
        if with_source:
            enc_schema += ", delete_file_path string"

        def dec_read(batches):
            from . import parquet_crypto as _PC
            for b in batches:
                for p in b["p"]:
                    t = _PC.read_encrypted(
                        p, enc_pq[p],
                        columns=["file_path", "pos"]).to_pandas()
                    if with_source:
                        t["delete_file_path"] = p
                    yield t

        edf = spark.createDataFrame(
            [(p,) for p in sorted(enc_pq)], "p string")
        if len(enc_pq) > 1:
            # one decode task per file, capped by cluster width (not a
            # local-mode constant: 32 slots here, executor count x cores
            # on a cluster)
            edf = edf.repartition(min(
                len(enc_pq),
                max(32, spark.sparkContext.defaultParallelism)))
        dfs.append(edf.mapInPandas(dec_read, enc_schema))
    if dv_rows:
        out_schema = "file_path string, pos long"
        if with_source:
            out_schema += ", delete_file_path string"

        def expand(batches):
            from .deletion_vectors import read_dv_positions
            for b in batches:
                for p, o, ln, ref in zip(b["p"], b["o"], b["l"], b["ref"]):
                    d = {"file_path": ref,
                         "pos": read_dv_positions(p, int(o), int(ln),
                                                  decrypt=dv_keys.get(p))}
                    if with_source:
                        d["delete_file_path"] = p
                    yield _pd.DataFrame(d)

        ddf = spark.createDataFrame(
            dv_rows, "p string, o long, l long, ref string")
        if len(dv_rows) > 1:
            # per-DV expand tasks, capped by cluster width as above
            ddf = ddf.repartition(min(
                len(dv_rows),
                max(32, spark.sparkContext.defaultParallelism)))
        dfs.append(ddf.mapInPandas(expand, out_schema))
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


# (appId-free: pure file content) (path, content_offset) -> per-entry
# runs {rel_suffix: ((lo, hi), ...)} or None (too many runs / unreadable
# driver-side). Delete files are immutable, so the decoded+compressed
# runs never go stale — without this, every plan_to_df of a table with
# pos deletes re-reads the delete parquet AND re-groups it in Python on
# the driver (~0.2s at 150k deleted rows, PER QUERY).
_POS_RUNS_CACHE: dict = {}
_POS_RUNS_CACHE_CAP = 256


def _entry_runs(d):
    """One pos-delete entry's positions, compressed to per-referenced-
    file contiguous runs, keyed by location-independent `data/...`
    suffix. Cached by the entry's immutable (path, offset) identity.
    Vectorized: file_path grouping via Arrow dictionary indices + one
    numpy pass — never a per-row Python loop."""
    import numpy as np

    ck = (d.file.file_path, d.file.content_offset or 0)
    hit = _POS_RUNS_CACHE.get(ck, False)
    if hit is not False:
        return hit
    runs_cap = 4 * POS_DELETE_MAX_LITERAL_RANGES

    def compress(rel, pos_arr, out):
        pos = np.unique(np.asarray(pos_arr, dtype=np.int64))
        if len(pos) == 0:
            return True
        breaks = np.where(np.diff(pos) != 1)[0]
        if len(breaks) + 1 > runs_cap:
            return False  # scattered: keep the distributed path
        starts = np.concatenate(([0], breaks + 1))
        ends = np.concatenate((breaks, [len(pos) - 1]))
        out.setdefault(rel, []).extend(
            (int(pos[s]), int(pos[e])) for s, e in zip(starts, ends))
        return True

    runs: dict = {}
    ok = True
    if _is_dv(d.file):
        # deletion vector: one seek to the manifest-tracked blob
        # (encrypted containers decrypt first)
        from .deletion_vectors import read_dv_positions
        from .parquet_crypto import unwrap_stream_key

        ok = compress(
            _data_rel(d.file.referenced_data_file),
            read_dv_positions(
                d.file.file_path, d.file.content_offset,
                d.file.content_size_in_bytes,
                decrypt=unwrap_stream_key(d.file.key_metadata)),
            runs)
    else:
        if d.file.key_metadata:
            from .parquet_crypto import (file_crypto, read_encrypted,
                                         resolve_key)

            fc = file_crypto(d.file.key_metadata)
            if fc[0] == "raw":
                # raw-footer-key parquet has no driver-side (pyarrow)
                # read; bail to the distributed JVM apply path
                runs = None
                ok = False
            else:
                t = read_encrypted(d.file.file_path, resolve_key(fc[1]),
                                   columns=["file_path", "pos"])
        else:
            t = _io.read_parquet(d.file.file_path,
                                 columns=["file_path", "pos"])
        if ok:
            fp_dict = t.column("file_path").combine_chunks() \
                .dictionary_encode()
            idx = fp_dict.indices.to_numpy(zero_copy_only=False)
            uniq = fp_dict.dictionary.to_pylist()
            poss = t.column("pos").to_numpy(zero_copy_only=False)
            for i, fp in enumerate(uniq):
                if not compress(_data_rel(fp), poss[idx == i], runs):
                    ok = False
                    break
    result = ({rel: tuple(rs) for rel, rs in runs.items()}
              if ok and runs is not None else None)
    if len(_POS_RUNS_CACHE) >= _POS_RUNS_CACHE_CAP:
        _POS_RUNS_CACHE.clear()
    _POS_RUNS_CACHE[ck] = result
    return result


def _pos_delete_ranges(plan: ScanPlan):
    """Pos-delete set compressed to per-file contiguous position runs
    (the RoaringPositionBitmap 'run' analog, core/.../deletes/
    RoaringPositionBitmap.java:51), assembled from per-entry cached
    runs. Returns [(file_path, lo, hi)] covering every deleted position
    of scanned files, or None if the runs don't compress under the
    literal-filter cap (or an entry is driver-unreadable)."""
    # key by location-independent suffix: pos-delete contents carry the
    # absolute path at write time, which goes stale if a relative-path
    # table is relocated (v4, spec:194); `data/...` suffixes are stable
    # and unique within a table (uuid-named file dirs)
    rel_live = {_data_rel(e.file.file_path): e.file.file_path
                for e in plan.files}
    cap = POS_DELETE_MAX_LITERAL_RANGES
    by_file: dict = {}
    for d in plan.pos_deletes:
        runs = _entry_runs(d)
        if runs is None:
            return None
        for rel, rs in runs.items():
            tgt = rel_live.get(rel)
            if tgt is not None:
                by_file.setdefault(tgt, []).extend(rs)
    ranges = []
    for fp, rs in by_file.items():
        if len(rs) > 1:
            # multiple delete entries may cover one file: merge runs
            rs = sorted(rs)
            merged = [list(rs[0])]
            for lo, hi in rs[1:]:
                if lo <= merged[-1][1] + 1:
                    merged[-1][1] = max(merged[-1][1], hi)
                else:
                    merged.append([lo, hi])
            rs = merged
        for lo, hi in rs:
            ranges.append((fp, int(lo), int(hi)))
            if len(ranges) > cap:
                return None
    return ranges


# Compiled position-run probe columns, cached per delete layout: the
# StaticInvoke build costs a few py4j round trips; the runs it encodes
# come from immutable delete files, so reuse across re-plans is safe
# (same invariants as _EQ_LITERAL_FILTER_CACHE). NOTE: a per-file READ
# fanout (one union branch per deleted-into file, position-only
# filters) was measured SLOWER at sf10 — 13 single-file branches cost
# ~0.2s of plan build and lost cross-branch codegen fusion (exec
# 0.73s vs 0.49s grouped) — so the grouped read + this probe is the
# shape that scales.
_POS_COVER_FILTER_CACHE: dict = {}
_POS_COVER_FILTER_CACHE_CAP = 256


def _pos_probe_filter(spark, pos_ranges, uri_form: bool,
                      path_expr: str = "_metadata.file_path",
                      pos_expr: str = "_metadata.row_index"):
    """Cached compiled 'position is deleted' Column over `pos_ranges`
    (see jvm_probe.pos_covered_filter), or None when the probe is
    unavailable — caller falls back to the expression chain."""
    ck = (spark.sparkContext.applicationId, uri_form, path_expr,
          pos_expr, tuple(pos_ranges))
    hit = _POS_COVER_FILTER_CACHE.get(ck, False)
    if hit is not False:
        return hit
    from . import jvm_probe

    path_lit = ((lambda fp: "file:" + fp if fp.startswith("/") else fp)
                if uri_form else (lambda fp: fp))
    cond = jvm_probe.pos_covered_filter(spark, pos_ranges, path_lit,
                                        path_expr, pos_expr)
    if len(_POS_COVER_FILTER_CACHE) >= _POS_COVER_FILTER_CACHE_CAP:
        _POS_COVER_FILTER_CACHE.clear()
    _POS_COVER_FILTER_CACHE[ck] = cond
    return cond


def _ranges_filter(path_col, pos_col, pos_ranges, path_lit=lambda fp: fp):
    """Compact 'deleted' predicate for position runs: singleton positions
    collapse into ONE isin() per file (Catalyst InSet — O(1) expression
    depth, hash-set probe at runtime); true runs stay as between(). The
    naive per-range (lt OR gt) AND-chain costs Catalyst ~1.5s of
    analysis/codegen at ~150 scattered single-row deletes — the exact
    shape random row-level deletes produce — vs ~0.1s for this one.
    `path_col=None` emits position-only conditions (single-file reads:
    the path qualifier is implied by the read itself)."""
    by_fp: dict = {}
    for fp, lo, hi in pos_ranges:
        pts, runs = by_fp.setdefault(fp, ([], []))
        (pts if lo == hi else runs).append((lo, hi))
    deleted = None
    for fp, (pts, runs) in by_fp.items():
        conds = []
        if pts:
            conds.append(pos_col.isin(*[lo for lo, _ in pts]))
        for lo, hi in runs:
            conds.append(pos_col.between(lo, hi))
        c = conds[0]
        for extra in conds[1:]:
            c = c | extra
        # position test FIRST: codegen short-circuits the AND, and the
        # integer between/InSet rejects the ~90% undeleted rows before
        # the per-row STRING path comparison ever runs (measured 2x on
        # the hit branch of a 15M-row scan with 16 ranges: 0.45s -> 0.92s
        # with the path compare leading)
        if path_col is not None:
            c = c & (path_col == F.lit(path_lit(fp)))
        deleted = c if deleted is None else (deleted | c)
    return deleted


_SPARK_AVRO: dict = {}


def _spark_avro_available(spark) -> bool:
    """spark-avro is an optional external module since Spark 2.4; probe
    once per session (schema-only read of nothing — no job runs)."""
    key = id(spark.sparkContext)
    hit = _SPARK_AVRO.get(key)
    if hit is None:
        try:
            spark.read.format("avro").schema("x int").load("/nonexistent")
            hit = True
        except Exception as e:
            hit = "Failed to find data source" not in str(e)
        _SPARK_AVRO[key] = hit
    return hit


def _avro_decode_df(spark, paths: list, read_schema):
    """Avro container files -> DataFrame without spark-avro: paths fan
    out one per task and each decodes with the engine's pure-Python
    container codec (avro_file.read_avro) into Arrow batches. Per-file
    parallelism — the same task shape a native reader gets."""
    import pandas as _pd

    cols = [f.name for f in read_schema.fields]

    def decode(batches):
        from .avro_file import read_avro

        for b in batches:
            for p in b["p"]:
                _, _, rows = read_avro(p)
                yield _pd.DataFrame(
                    {c: [r.get(c) for r in rows] for c in cols})

    pdf = spark.createDataFrame([(p,) for p in sorted(paths)], "p string")
    return (pdf.repartition(max(1, len(paths)))
            .mapInPandas(decode, read_schema))


_PUSHDOWN_SAFE_TYPES = {"boolean", "int", "long", "string", "date"}


def _arrow_pushdown_filter(residual, schema, wschema):
    """SUPERSET-safe pyarrow.dataset filter from the bound residual for
    the decrypting reader: only top-level conjuncts over identity terms
    whose write-schema column has the same name and a type with
    identical comparison semantics in Spark and Arrow (floats excluded —
    Spark orders NaN above all values, Arrow is IEEE; timestamps
    excluded — tz interpretation differs). Pushing an AND-subset can
    only keep extra rows, and plan_to_df re-applies the FULL residual
    after the union, so this is always sound. Returns None when nothing
    pushes."""
    import pyarrow.dataset as ds

    if isinstance(residual, E.AlwaysTrue):
        return None

    def conjuncts(e):
        if isinstance(e, E.And):
            yield from conjuncts(e.left)
            yield from conjuncts(e.right)
        else:
            yield e

    def term_names(e, acc):
        if isinstance(e, (E.And, E.Or)):
            term_names(e.left, acc)
            term_names(e.right, acc)
        elif isinstance(e, E.Not):
            term_names(e.child, acc)
        else:
            t = getattr(e, "term", None)
            if t is not None:
                acc.append(t.name)
        return acc

    by_id = {f.field_id: f for f in wschema.fields}
    parts = []
    for c in conjuncts(residual):
        ok = True
        for n in term_names(c, []):
            try:
                cur = schema.find_field(n)
            except KeyError:
                ok = False
                break
            wf = by_id.get(cur.field_id)
            if (wf is None or wf.name != cur.name
                    or wf.type != cur.type
                    or cur.type not in _PUSHDOWN_SAFE_TYPES):
                ok = False
                break
        if not ok:
            continue
        try:
            parts.append(E.to_arrow(c, ds.field))
        except TypeError:
            continue
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out & p
    return out


def _encrypted_parquet_df(spark, paths: list, read_schema, master_key: bytes,
                          with_meta: bool, arrow_filter=None):
    """Engine-encrypted parquet files -> DataFrame: one task per file,
    each decrypting through pyarrow modular encryption (parquet_crypto)
    and streaming Arrow batches out — the imported-Avro decode shape, so
    the read parallelizes exactly like a native format reader at any
    file count. Column pruning pushes into the decrypting reader
    (iter_batches(columns=...)); requested columns the file lacks
    (e.g. lineage) surface as nulls.

    `with_meta=True` additionally emits a `_metadata` struct
    (file_path in Spark's "file:<plain>" URI spelling, running
    row_index) so the MoR position-delete machinery downstream applies
    unchanged."""
    import pandas as _pd

    from pyspark.sql import types as _T

    cols = [f.name for f in read_schema.fields]
    out_schema = read_schema
    if with_meta:
        out_schema = _T.StructType(list(read_schema.fields) + [
            _T.StructField("_metadata", _T.StructType([
                _T.StructField("file_path", _T.StringType()),
                _T.StructField("row_index", _T.LongType())]))])

    def decode(batches):
        from urllib.parse import quote

        from . import io as _eio
        from .parquet_crypto import open_encrypted

        def read_batches(p):
            """Arrow batches of the requested columns. Local files
            without metadata needs scan through a pyarrow DATASET with
            the decryption config — pushing `arrow_filter` down skips
            whole row groups on their (decrypted) stats before any
            pandas conversion. Positional reads and remote paths use the
            plain decrypting reader (filtering would break row_index)."""
            pf = open_encrypted(p, master_key)
            have = [c for c in cols if c in pf.schema_arrow.names]
            if (not with_meta and arrow_filter is not None
                    and _eio.resolve_io(p) is _eio._LOCAL):
                import pyarrow.dataset as ds
                import pyarrow.parquet.encryption as pe

                from .parquet_crypto import _factory

                factory, kc = _factory(master_key)
                fmt = ds.ParquetFileFormat(
                    default_fragment_scan_options=ds.ParquetFragmentScanOptions(
                        decryption_config=ds.ParquetDecryptionConfig(
                            factory, kc, pe.DecryptionConfiguration())))
                sc_ = ds.dataset([_eio.strip_scheme(p)],
                                 format=fmt).scanner(
                    columns=have, filter=arrow_filter)
                return have, sc_.to_batches()
            return have, pf.iter_batches(columns=have)

        for b in batches:
            for p in b["p"]:
                have, rbs = read_batches(p)
                # percent-encoded URI, the same spelling Spark's native
                # reader reports — every consumer decodes uniformly
                enc = quote(p, safe="/:")
                uri = "file:" + enc if p.startswith("/") else enc
                idx = 0
                for rb in rbs:
                    out = rb.to_pandas()
                    for c in cols:
                        if c not in out.columns:
                            out[c] = None
                    out = out[cols]
                    if with_meta:
                        n = len(out)
                        out["_metadata"] = [
                            {"file_path": uri, "row_index": i}
                            for i in range(idx, idx + n)]
                        idx += n
                    yield out

    pdf = spark.createDataFrame([(p,) for p in sorted(paths)], "p string")
    return (pdf.repartition(max(1, len(paths)))
            .mapInPandas(decode, out_schema))


def _unique_name_batches(files, max_batch: int = 4096):
    """Split DataFiles into batches whose BASENAMES are unique — the JVM
    raw-DEK factory resolves per-file keys by file name (the only
    identity parquet-mr hands it that survives scheme/URI respelling).
    Iceberg data file names are UUID-based so collisions are rare; a
    collision costs one extra read job, never a wrong key. `max_batch`
    caps per-relation key-option count: every file adds a Hadoop conf
    entry to its relation, and an unbounded group would push a
    million-entry conf through the driver on a big imported table."""
    batches: list = []
    for f in files:
        name = f.file_path.rstrip("/").rsplit("/", 1)[-1]
        for b in batches:
            if name not in b[0] and len(b[1]) < max_batch:
                b[0].add(name)
                b[1].append(f)
                break
        else:
            batches.append(({name}, [f]))
    return [b[1] for b in batches]


def _delete_file_readers(spark, ds, read_schema, with_meta: bool = False):
    """Yield DataFrames over DELETE files, splitting engine-encrypted
    files (data_file.key_metadata) from plaintext ones: plaintext files
    read natively, encrypted files through the decrypting executor-side
    reader. `with_meta=True` guarantees a `_metadata` struct on every
    yielded frame (native reads expose it implicitly; the decrypting
    reader synthesizes it), so seq-map lookups on `_metadata.file_path`
    work uniformly."""
    plain, enc, raw = [], {}, []
    for d in ds:
        if d.file.key_metadata is None:
            plain.append(d.file.file_path)
        else:
            from .parquet_crypto import file_crypto

            fc = file_crypto(d.file.key_metadata)
            if fc[0] == "raw":
                raw.append(d.file)
            else:
                enc.setdefault(fc[1], []).append(d.file.file_path)
    if plain:
        yield spark.read.schema(read_schema).parquet(*plain)
    if raw:
        # imported reference-native encrypted delete files: raw footer
        # DEK per file — JVM factory only, loud refusal without it
        from . import jvm_crypto
        from .parquet_crypto import file_crypto

        if not jvm_crypto.available(spark):
            raise NotImplementedError(
                "natively-encrypted delete files (raw footer DEK) "
                "require the JVM crypto path; unavailable in this "
                "session and pyarrow cannot open raw-footer-key parquet")
        for batch in _unique_name_batches(raw):
            pk = {f.file_path: file_crypto(f.key_metadata)[1:]
                  for f in batch}
            df = (spark.read
                  .options(**jvm_crypto.raw_reader_options(pk))
                  .schema(read_schema).parquet(*sorted(pk)))
            if with_meta:
                df = df.withColumn("_metadata", F.col("_metadata"))
            yield df
    for kid, paths in enc.items():
        from . import jvm_crypto
        from .parquet_crypto import resolve_key

        mkey = resolve_key(kid)
        if jvm_crypto.available(spark):
            df = (spark.read.options(**jvm_crypto.reader_options(kid, mkey))
                  .schema(read_schema).parquet(*paths))
            if with_meta:
                # consumers select _metadata.file_path; materialize the
                # hidden struct under the fallback reader's shape so the
                # frame survives unions with synthesized ones
                df = df.withColumn("_metadata", F.col("_metadata"))
            yield df
        else:
            yield _encrypted_parquet_df(spark, paths, read_schema,
                                        mkey, with_meta)


def plan_to_df(scan: TableScan, plan: ScanPlan, with_metadata_columns: bool = False,
               with_lineage: bool = False) -> DataFrame:
    spark = scan.spark
    metadata = scan.metadata
    schema = scan.schema
    read_cols = scan.columns or schema.column_names

    # per-file equality-delete attachment (DeleteFileIndex analog): files
    # no delete can touch read on a plain branch with no anti-join probe.
    # Exception (r14): when every delete group applies as a cheap
    # PUSHABLE scalar filter (trivial/range/isin tier), one relation
    # with the filter on every row beats the split's second
    # relation/file-index/task wave — see _eq_cheap_inline_all.
    if plan.eq_deletes and plan.files and not plan.no_split \
            and not _eq_cheap_inline_all(spark, metadata, schema, plan):
        split = _eq_split_plan(plan, schema, spark)
        if split is not None:
            clear_plan, dirty_plan = split
            cdf = plan_to_df(scan, clear_plan, with_metadata_columns,
                             with_lineage)
            if dirty_plan is None:
                return cdf
            return cdf.unionByName(
                plan_to_df(scan, dirty_plan, with_metadata_columns,
                           with_lineage))

    # Decide the pos-delete strategy up front: a small delete set compresses
    # to literal position runs, which (when nothing else needs metadata
    # columns) are applied inside each file-group read on the raw _metadata
    # struct — materializing _metadata.row_index per row costs ~25% of a
    # narrow scan, so skip it when a codegen'd filter suffices.
    pos_ranges = None
    if plan.pos_deletes:
        driver_limit = _conf_int(
            spark, "spark.iceberg_spark.mor.posDeleteDriverBytes",
            POS_DELETE_DRIVER_BYTES)
        if _pos_delete_bytes(plan) <= driver_limit:
            pos_ranges = _pos_delete_ranges(plan)
    inline_pos_filter = (pos_ranges is not None and not with_metadata_columns
                         and not with_lineage and not plan.eq_deletes)

    # per-file pos-delete attachment for plans the inline path cannot
    # serve: untouched files skip the anti-join / metadata-filter branch
    # (the inline path below does its own read-level clean/hit split)
    if plan.pos_deletes and not inline_pos_filter and not plan.eq_deletes \
            and plan.files and not plan.no_split:
        psplit = _pos_split_plan(plan, spark)
        if psplit is not None:
            clear_p, dirty_p = psplit
            return plan_to_df(scan, clear_p, with_metadata_columns,
                              with_lineage).unionByName(
                plan_to_df(scan, dirty_p, with_metadata_columns,
                           with_lineage))

    # _pos needs parquet's _metadata.row_index; _file works for any format
    # Equality deletes apply to data files with seq < delete seq. When
    # every data file predates every delete (the common layout: deletes
    # committed after the data), the scoping predicate is uniformly true,
    # so the per-row sequence columns — a metadata-struct projection, a
    # broadcast seq map join, and a literal path->seq map on the delete
    # side — can all be skipped; the apply step collapses to one hash
    # anti-join on the key columns. Decided from plan metadata alone.
    uniform_eq = bool(plan.eq_deletes) and (
        max((e.sequence_number for e in plan.files), default=-1)
        < min(d.sequence_number for d in plan.eq_deletes))

    need_pos = (with_metadata_columns or with_lineage
                or (bool(plan.pos_deletes) and not inline_pos_filter))
    need_meta = need_pos or (bool(plan.eq_deletes) and not uniform_eq)

    if not plan.files:
        spark_schema = type_to_spark(StructT(tuple(schema.find_field(c) for c in read_cols)))
        df = spark.createDataFrame([], schema=spark_schema)
        if with_metadata_columns:
            df = (df.withColumn(FILE_PATH_COL, F.lit(None).cast("string"))
                    .withColumn(POS_COL, F.lit(None).cast("long")))
        if with_lineage:
            df = (df.withColumn(ROW_ID_COL, F.lit(None).cast("long"))
                    .withColumn(LAST_UPDATED_SEQ_COL, F.lit(None).cast("long")))
        return df

    # group files by (write-schema, format) for field-ID column mapping.
    # Third key: identity-partition CONSTANTS — a hive-layout import's
    # files don't physically store identity partition source columns, so
    # those read from partition metadata (PartitionUtil.constantsMap
    # semantics). Physical absence is detected by the column having no
    # footer stats on that file; the fill value is the partition tuple's,
    # which the spec requires to equal the column value anyway.
    _ident_cache: dict = {}

    def _ident_srcs(spec_id):
        if spec_id not in _ident_cache:
            pairs = []
            for pf in metadata.spec_by_id(spec_id).fields:
                if not isinstance(pf.transform, Identity):
                    continue
                try:
                    src = schema.field_by_id(pf.source_id).name
                except KeyError:
                    continue
                if src in read_cols:
                    pairs.append((pf.name, src))
            _ident_cache[spec_id] = pairs
        return _ident_cache[spec_id]

    def _ident_fills(e):
        pairs = _ident_srcs(e.file.spec_id)
        if not pairs:
            return ()
        return tuple(sorted(
            (src, e.file.partition.get(fname))
            for fname, src in pairs if src not in e.file.stats))

    # Fourth key: per-file variant ENCODING signature. The engine writes
    # native binary variant by default but JSON text under
    # `write.variant.encoding=json` (and always did before the default
    # flipped), so one table can hold both encodings; a group must be
    # physically homogeneous or the group-level schema misreads half the
    # files. Probing is one local footer read per file, only on tables
    # whose write schema has variant columns.
    _var_cache = _VAR_SIG_CACHE
    # companion-column presence is only consulted by the shredded-
    # predicate pushdown rewrite, which only engages when the residual
    # carries shredded-path conjuncts — gate the (JVM-fallback) footer
    # probe on that so a plain scan of a 10k-file variant table never
    # pays 10k py4j footer opens
    def _res_conjs(e):
        if isinstance(e, E.And):
            yield from _res_conjs(e.left)
            yield from _res_conjs(e.right)
        else:
            yield e

    _want_comps = any(
        isinstance(c, E.BoundPredicate)
        and getattr(c.term, "stats_name", None)
        for c in _res_conjs(plan.residual))

    def _var_sig(e):
        try:
            ws = metadata.schema_by_id(e.file.write_schema_id)
        except KeyError:
            ws = schema
        vnames = {f.name for f in ws.fields if f.type == "variant"}
        if not vnames or e.file.file_format != "parquet":
            return ()
        p = e.file.file_path
        hit = _var_cache.get(p)
        if hit is None or (_want_comps and hit[1] is None):
            if len(_var_cache) >= _VAR_SIG_CACHE_CAP:
                _var_cache.clear()
            try:
                import pyarrow as _pa
                import pyarrow.parquet as _pq

                foot = _io.read_parquet_schema(p)
                native = set()
                for vn in vnames:
                    if vn in foot.names:
                        ft = foot.field(vn).type
                        if (_pa.types.is_struct(ft)
                                and {f.name for f in ft}
                                >= {"metadata", "value"}):
                            native.add(vn)
                comps = tuple(sorted(
                    n for n in foot.names if n.startswith("_shred_f")))
                hit = (tuple(sorted(native)), comps)
            except Exception:
                # pyarrow refuses the parquet VARIANT logical type at the
                # footer — that refusal IS the native-encoding marker.
                # The JVM footer reader still answers whether the file
                # physically carries engine companion columns (it won't
                # for imported spec-shredded files, whose typed_value
                # groups live INSIDE the variant column): the companion
                # set joins the group key so the physical-pushdown
                # rewrite below never targets a file lacking the column.
                # The py4j probe runs ONLY when the residual carries
                # shredded-path terms (None = unprobed) — a plain scan
                # of a 10k-file variant table pays zero of them.
                comps = None
                if _want_comps:
                    try:
                        from .variant_shred import jvm_top_level_columns

                        cols = jvm_top_level_columns(spark, p)
                        comps = tuple(sorted(
                            c for c in cols if c.startswith("_shred_f")))
                    except Exception:
                        comps = ()
                hit = (tuple(sorted(vnames)), comps)
            _var_cache[p] = hit
        native, comps = hit
        return (native, comps if (_want_comps and comps is not None)
                else ())

    # Fifth key: encryption key id (data_file.key_metadata) — encrypted
    # files read through the decrypting executor-side reader, plaintext
    # files through the native one; one table can hold both (files
    # written before `encryption.key-id` was set stay plaintext).
    def _enc_kid(e):
        if e.file.key_metadata is None:
            return None
        from .parquet_crypto import file_crypto

        fc = file_crypto(e.file.key_metadata)
        # kms groups read under one master key; raw-DEK files (imported
        # reference-native encryption) group together — their per-FILE
        # keys ride the read options, not the group key
        return ("raw",) if fc[0] == "raw" else fc

    groups: dict = {}
    for e in plan.files:
        groups.setdefault(
            (e.file.write_schema_id, e.file.file_format, _ident_fills(e),
             _var_sig(e), _enc_kid(e)),
            []).append(e)

    parts = []
    for (wsid, ffmt, ident_fills, _vsig, enc_kid), entries in groups.items():
        fills = dict(ident_fills)
        try:
            wschema = metadata.schema_by_id(wsid)
        except KeyError:
            wschema = schema
        # _pos is parquet-only; lineage degrades to null row ids on other
        # formats (they cannot carry _row_id), but _pos-dependent reads
        # (position deletes, explicit metadata columns) must fail loudly
        group_parquet = ffmt == "parquet"
        if not group_parquet and (with_metadata_columns or plan.pos_deletes):
            raise ValueError(
                f"_pos / position deletes require parquet data files; "
                f"{entries[0].file.file_path} is {ffmt} (use copy-on-write "
                f"modes for {ffmt} tables)")
        paths = [e.file.file_path for e in entries]
        read_schema = wschema.to_spark()
        # variant columns: the engine writes canonical JSON text (see
        # write_data_files) — read as string, parse_json back to
        # VariantType in the projection. Files imported via add_files may
        # instead carry Spark's native binary variant encoding
        # (metadata/value group, format/spec.md:243); detect the physical
        # type from one footer per group and read those natively, no
        # parse_json round-trip.
        var_names = {f.name for f in wschema.fields if f.type == "variant"}
        if var_names:
            from pyspark.sql import types as _T

            # the group key's _var_sig already probed every file's
            # footer for its physical variant encoding — groups are
            # encoding-homogeneous by construction, so the signature IS
            # the read-schema decision (no second footer read per group)
            native_vars = set(_vsig[0]) if _vsig else set()
            read_schema = _T.StructType([
                fld if fld.name in native_vars
                else _T.StructField(fld.name, _T.StringType(), True)
                if fld.name in var_names else fld
                for fld in read_schema.fields])
        if with_lineage and group_parquet:
            # surface materialized lineage columns written by row-level ops
            # (missing in append-only files -> read as null, inheritance wins)
            from pyspark.sql import types as _T

            read_schema = _T.StructType(
                list(read_schema.fields)
                + [_T.StructField(ROW_ID_COL, _T.LongType(), True),
                   _T.StructField(LAST_UPDATED_SEQ_COL, _T.LongType(),
                                  True)])
        # shredded-variant pushdown: residual conjuncts on DECLARED
        # extract() paths rewrite onto the PHYSICAL companion column
        # (`_shred_f<fid>`) for groups where every file carries its
        # stats (companion guaranteed present) — the filter becomes a
        # plain typed comparison Catalyst pushes into the parquet scan
        # (row-group skipping + codegen) instead of a per-row variant
        # decode. Exactly equivalent (the companion IS variant_get of
        # the path, written in the same job), and the full residual
        # still re-applies after projection — superset-safety twice over.
        shred_pre = []
        if group_parquet and not isinstance(plan.residual, E.AlwaysTrue):
            from pyspark.sql import types as _T

            from .schema import type_to_spark as _tts

            def _conjs(e):
                if isinstance(e, E.And):
                    yield from _conjs(e.left)
                    yield from _conjs(e.right)
                else:
                    yield e

            seen_shred = set()
            # physical-presence gate: every file in this group carries
            # the companion column in its FOOTER (the _var_sig probe put
            # the companion set in the group key). Stats presence is not
            # enough — imported spec-shredded files carry companion
            # STATS from the manifest but no physical `_shred_f` column;
            # filtering a null-read column there would drop every row.
            group_comps = _vsig[1] if len(_vsig) == 2 else ()
            for c in _conjs(plan.residual):
                sn = (getattr(c.term, "stats_name", None)
                      if isinstance(c, E.BoundPredicate) else None)
                if not sn:
                    continue
                if sn not in group_comps:
                    continue  # a file may lack the companion: skip group
                shred_pre.append(c)
                if sn not in seen_shred:
                    seen_shred.add(sn)
                    read_schema = _T.StructType(
                        list(read_schema.fields)
                        + [_T.StructField(sn, _tts(c.term.stats_type),
                                          True)])
        if enc_kid is not None:
            # encrypted files. Engine parquet-kms groups: Spark's NATIVE
            # vectorized reader through parquet-mr modular encryption
            # (jvm_crypto) — the identical FileScan a plaintext table
            # gets (whole-stage codegen, real _metadata, Catalyst
            # pushdown) — with the decrypting mapInPandas pyarrow reader
            # as fallback. Raw-DEK groups (imported reference-native
            # encryption, StandardKeyMetadata): JVM RawDekCryptoFactory
            # ONLY — pyarrow has no raw-footer-key surface, so absence
            # of a JDK is a loud refusal, never a garble. Either way the
            # inline pos-delete filter and the need_meta projection
            # below apply unchanged.
            from . import jvm_crypto

            want_meta = need_meta or bool(inline_pos_filter and pos_ranges)
            if enc_kid[0] == "raw":
                if not jvm_crypto.available(spark):
                    raise NotImplementedError(
                        "natively-encrypted data files (raw footer DEK, "
                        "reference StandardKeyMetadata) require the JVM "
                        "crypto path; it is unavailable in this session "
                        "(no JDK / jar not attached) and pyarrow cannot "
                        "open raw-footer-key parquet")
                from .parquet_crypto import file_crypto

                pieces_enc = []
                for batch in _unique_name_batches(
                        [e.file for e in entries]):
                    pk = {f.file_path: file_crypto(f.key_metadata)[1:]
                          for f in batch}
                    pieces_enc.append(
                        spark.read
                        .options(**jvm_crypto.raw_reader_options(pk))
                        .schema(read_schema).parquet(*sorted(pk)))
                df = pieces_enc[0]
                for d2 in pieces_enc[1:]:
                    df = df.unionByName(d2)
            else:
                from .parquet_crypto import resolve_key

                kid = enc_kid[1]
                mkey = resolve_key(kid)
                if jvm_crypto.available(spark):
                    # native FileScan: the hidden `_metadata` struct
                    # resolves directly wherever downstream references
                    # it, exactly as on a plaintext group
                    df = (spark.read
                          .options(**jvm_crypto.reader_options(kid, mkey))
                          .schema(read_schema).parquet(*paths))
                else:
                    push = (None if want_meta else
                            _arrow_pushdown_filter(plan.residual, schema,
                                                   wschema))
                    df = _encrypted_parquet_df(spark, paths, read_schema,
                                               mkey, want_meta,
                                               arrow_filter=push)
            if inline_pos_filter and pos_ranges:
                affected_enc = {fp for fp, _, _ in pos_ranges}
                deleted = None
                if all(_io.uri_encoding_invariant(p)
                       for p in affected_enc):
                    if len(affected_enc) >= 2:
                        deleted = _pos_probe_filter(spark, pos_ranges,
                                                    uri_form=True)
                    if deleted is None:
                        deleted = _ranges_filter(
                            F.col("_metadata.file_path"),
                            F.col("_metadata.row_index"), pos_ranges,
                            path_lit=lambda fp: (
                                "file:" + fp if fp.startswith("/")
                                else fp))
                else:
                    deleted = _ranges_filter(
                        _io.decode_spark_path_col(
                            F.col("_metadata.file_path")),
                        F.col("_metadata.row_index"), pos_ranges)
                if deleted is not None:
                    df = df.filter(~deleted)
                if not need_meta:
                    df = df.drop("_metadata")
        elif inline_pos_filter and pos_ranges:
            # apply position-delete runs on the raw metadata struct (URI
            # form, e.g. file:/x) before projection — no join, no extra
            # job, no per-row normalized-path materialization.
            affected = {fp for fp, _, _ in pos_ranges}
            invariant = all(_io.uri_encoding_invariant(p)
                            for p in affected)
            probed = None
            if invariant and len(affected) >= 2:
                # compiled run-coverage probe: one StaticInvoke per row
                # (memoized file ordinal + binary search over
                # (ordinal<<40)|pos-encoded runs) — the per-task
                # BitmapPositionDeleteIndex probe shape (reference
                # core/.../deletes/BitmapPositionDeleteIndex.java:31).
                probed = _pos_probe_filter(spark, pos_ranges,
                                           uri_form=True)
            if probed is not None:
                # ONE relation over ALL files, probe filter on every
                # row: coveredFilePos answers false for paths outside
                # its table (one memoized binary-search miss per file),
                # so untouched files stream through at raw-scan speed.
                # A clean/hit two-relation union was measured SLOWER at
                # sf10 (32 files -> 27+26=53 scan partitions = two task
                # waves on 32 cores: union 552 ms vs single-relation
                # probe 363 ms ~= raw 368 ms), and the single relation
                # shares its cache entry with the table's no-delete
                # scans.
                df = (_cached_file_df(spark, ffmt, read_schema, paths)
                      .filter(~probed))
            else:
                # probe unavailable: per-row expression chains cost per
                # file, so only the files that actually carry deletes
                # pay the metadata-column filter; untouched files — the
                # vast majority on a large table with localized deletes
                # — read through the unfiltered fast path and union
                # back in.
                clean = [p for p in paths if p not in affected]
                hit = [p for p in paths if p in affected]
                pieces = []
                if clean:
                    pieces.append(
                        _cached_file_df(spark, ffmt, read_schema, clean))
                if hit:
                    # invariant paths (no char Spark would
                    # percent-escape): compare the RAW URI column
                    # against raw literals — zero per-row
                    # transformation. Otherwise decode the column so
                    # %20-spelled paths match the manifests' raw ones.
                    if invariant:
                        deleted = _ranges_filter(
                            F.col("_metadata.file_path"),
                            F.col("_metadata.row_index"), pos_ranges,
                            path_lit=lambda fp: (
                                "file:" + fp if fp.startswith("/")
                                else fp))
                    else:
                        deleted = _ranges_filter(
                            _io.decode_spark_path_col(
                                F.col("_metadata.file_path")),
                            F.col("_metadata.row_index"), pos_ranges)
                    pieces.append(
                        _cached_file_df(spark, ffmt, read_schema, hit)
                        .filter(~deleted))
                df = pieces[0]
                for p in pieces[1:]:
                    df = df.unionByName(p)
        elif ffmt == "avro" and not _spark_avro_available(spark):
            # spark-avro is an optional module (absent here): decode the
            # containers EXECUTOR-side with the engine's own Avro codec
            # (avro_file.py) — one task per file via mapInPandas, so the
            # read parallelizes exactly like a native format reader
            df = _avro_decode_df(spark, paths, read_schema)
        else:
            df = _cached_file_df(spark, ffmt, read_schema, paths)
        if shred_pre:
            from .schema import NestedField as _NF

            pred_col = None
            for c in shred_pre:
                bp = E.BoundPredicate(
                    c.op,
                    E.BoundTerm(_NF(0, c.term.stats_name,
                                    c.term.stats_type, False), None),
                    c.literals)
                cc = E.to_spark(bp)
                pred_col = cc if pred_col is None else (pred_col & cc)
            df = df.filter(pred_col).drop(
                *dict.fromkeys(c.term.stats_name for c in shred_pre))
        # map file columns -> current names by field id; fill missing with null
        by_id = {f.field_id: f for f in wschema.fields}
        # fast path: no evolution/rename/promotion/variant in play and no
        # metadata/lineage columns requested -> project by plain column
        # names (one py4j call) instead of building per-column expression
        # trees (~40 py4j round-trips per scan on a 16-column table; the
        # dominant cost of driver-side DataFrame construction per profile)
        if not need_meta and not with_lineage and not fills:
            simple = True
            for cname in read_cols:
                cur = schema.find_field(cname)
                wf = by_id.get(cur.field_id)
                if (wf is None or wf.name != cname or wf.type != cur.type
                        or cur.type == "variant"):
                    simple = False
                    break
            if simple:
                if read_cols != [f.name for f in wschema.fields]:
                    df = df.select(*read_cols)
                parts.append((entries, df))
                continue
        sel = []
        for cname in read_cols:
            cur = schema.find_field(cname)
            wf = by_id.get(cur.field_id)
            if cname in fills:
                # identity-partition constant: the physical file doesn't
                # store this column (hive-layout import) — its value is the
                # file's partition tuple entry by spec invariant
                sel.append(F.lit(fills[cname])
                           .cast(type_to_spark(cur.type)).alias(cname))
                continue
            if wf is not None:
                c = F.col(wf.name)
                if cur.type == "variant":
                    if wf.name not in native_vars:
                        c = F.parse_json(c)  # JSON text -> VariantType
                elif wf.type != cur.type:  # promoted (int->long etc.)
                    if wf.type == "date" and cur.type == "timestamp_ns":
                        # timestamp_ns is stored as long nanos (schema.py);
                        # a date is whole days -> days * 86400e9 nanos
                        c = (F.unix_date(c).cast("long")
                             * F.lit(86_400_000_000_000).cast("long"))
                    else:
                        c = c.cast(type_to_spark(cur.type))
                sel.append(c.alias(cname))
            else:
                # v3 initial-default: pre-evolution files read the default
                fill = (F.lit(cur.initial_default)
                        if cur.initial_default is not None else F.lit(None))
                sel.append(fill.cast(type_to_spark(cur.type)).alias(cname))
        if need_meta:
            # decode + normalize the URI column to plain-path form so it
            # matches manifest file_path values (percent-escapes AND the
            # file: scheme); the group's path list licenses the cheap
            # scheme-strip when nothing needs escaping
            sel = sel + [
                _io.decode_spark_path_col(F.col("_metadata.file_path"),
                                          paths=paths)
                .alias(FILE_PATH_COL),
            ]
            if need_pos:
                sel.append(F.col("_metadata.row_index").alias(POS_COL)
                           if group_parquet
                           else F.lit(None).cast("long").alias(POS_COL))
        if with_lineage:
            if group_parquet:
                sel.append(F.col(ROW_ID_COL).alias("__mat_rid"))
                sel.append(F.col(LAST_UPDATED_SEQ_COL).alias("__mat_seq"))
            else:
                sel.append(F.lit(None).cast("long").alias("__mat_rid"))
                sel.append(F.lit(None).cast("long").alias("__mat_seq"))
        df = df.select(*sel)
        parts.append((entries, df))

    dfs = []
    for entries, df in parts:
        dfs.append(df)
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)

    # residual filter (full filter re-applied; Catalyst pushes it to parquet)
    if not isinstance(plan.residual, E.AlwaysTrue):
        out = out.filter(E.to_spark(plan.residual))

    # --- apply deletes (merge-on-read) -------------------------------------
    if plan.pos_deletes and not inline_pos_filter:
        if pos_ranges is not None:
            # tiny delete set but metadata columns are materialized anyway
            # (lineage/eq-deletes/user request): codegen filter on the
            # normalized columns, still no join and no extra Spark job
            deleted = None
            if len({fp for fp, _, _ in pos_ranges}) >= 2:
                deleted = _pos_probe_filter(spark, pos_ranges,
                                            uri_form=False,
                                            path_expr=FILE_PATH_COL,
                                            pos_expr=POS_COL)
            if deleted is None:
                deleted = _ranges_filter(F.col(FILE_PATH_COL),
                                         F.col(POS_COL), pos_ranges)
            if deleted is not None:
                out = out.filter(~deleted)
        else:
            bcast_limit = _conf_int(
                spark, "spark.iceberg_spark.mor.posDeleteBroadcastBytes",
                POS_DELETE_BROADCAST_BYTES)
            total_bytes = _pos_delete_bytes(plan)
            # DV entries share one Puffin container path at different
            # offsets: the blob identity must join the cache key
            dv_ident = tuple(sorted(
                (d.file.file_path, d.file.content_offset or 0)
                for d in plan.pos_deletes))
            pos_df = _delete_build_cached(
                spark, plan.pos_deletes, ("pos", dv_ident),
                lambda: pos_delete_rows_df(
                    spark, plan.pos_deletes).select(
                        F.col("file_path").alias("__del_file"),
                        F.col("pos").alias("__del_pos")))
            # suffix-normalized path equality (see _data_rel): survives
            # table relocation while staying a plain hash-join key
            anti_cond = (
                (_data_rel_col(F.col(FILE_PATH_COL))
                 == _data_rel_col(F.col("__del_file")))
                & (F.col(POS_COL) == F.col("__del_pos"))
            )
            # An unfiltered scan attaches every live delete file; at 10%
            # deleted on a large table that is billions of (path, pos)
            # rows — too big to ship to every executor. Below the
            # threshold a broadcast hash anti-join is shuffle-free; above
            # it a shuffled-hash anti-join keyed by (file, pos) keeps
            # every executor's share bounded (both sides cluster
            # naturally by file path).
            if total_bytes <= bcast_limit:
                out = out.join(F.broadcast(pos_df), anti_cond, "left_anti")
            else:
                out = out.join(pos_df.hint("shuffle_hash"), anti_cond,
                               "left_anti")

    if plan.eq_deletes:
        by_ids: dict = {}
        for d in plan.eq_deletes:
            by_ids.setdefault(tuple(sorted(d.file.equality_ids)), []).append(d)
        bcast_limit = _conf_int(
            spark, "spark.iceberg_spark.mor.posDeleteBroadcastBytes",
            POS_DELETE_BROADCAST_BYTES)
        if not uniform_eq:
            # mixed sequence layout: attach data sequence numbers per file
            # (broadcast map), anti-join per equality-field-set with
            # per-pair seq scoping
            seq_rows = [(e.file.file_path, e.sequence_number) for e in plan.files]
            seq_df = spark.createDataFrame(seq_rows, ["__seq_file", "__data_seq"])
            out = out.join(F.broadcast(seq_df), F.col(FILE_PATH_COL) == F.col("__seq_file"), "left") \
                     .drop("__seq_file")
        for ids, dels in by_ids.items():
            key_cols = [schema.field_by_id(i).name for i in ids]
            if uniform_eq and len(ids) == 1:
                # small single-key delete sets inline as a codegen'd
                # NOT-IN filter — no join stage, no per-scan delete-file
                # read job, and the In predicate reaches parquet
                # row-group stats. NULL semantics match the anti-join's
                # eqNullSafe: a NULL row survives unless some delete row
                # carried a NULL key.
                cond, _tier = _eq_group_inline_cond(spark, metadata,
                                                    schema, ids, dels)
                if cond is not None:
                    out = out.filter(cond)
                    continue
            if uniform_eq:
                # explicit schema read (skips the inference job); deletes
                # apply to every scanned file, so no seq columns at all.
                # Column names must be the DELETE FILE's write-time names
                # (field-ID mapped via its write schema): reading a
                # pre-rename file by the current name would silently
                # return all-NULL keys instead of failing loudly.
                def _build_uniform(dels=dels, ids=ids):
                    by_ws: dict = {}
                    for d in dels:
                        by_ws.setdefault(d.file.write_schema_id,
                                         []).append(d)
                    pieces = []
                    for wsid_, ds in by_ws.items():
                        try:
                            wsch_ = metadata.schema_by_id(wsid_)
                        except KeyError:
                            wsch_ = schema
                        wfields = [wsch_.field_by_id(i) for i in ids]
                        dtypes = type_to_spark(StructT(tuple(wfields)))
                        for rdf in _delete_file_readers(spark, ds, dtypes):
                            pieces.append(rdf.select(
                                *[F.col(wf.name).alias(f"__delk_{i}")
                                  for i, wf in enumerate(wfields)]))
                    dd = pieces[0]
                    for p_ in pieces[1:]:
                        dd = dd.unionByName(p_)
                    return dd

                dd = _delete_build_cached(spark, dels, ("eq-uniform", ids),
                                          _build_uniform)
                dd = _eq_build_bounds_filter(dd, plan, key_cols)
                cond = None
                for i, k in enumerate(key_cols):
                    c = out[k].eqNullSafe(F.col(f"__delk_{i}"))
                    cond = c if cond is None else (cond & c)
                total = sum(d.file.file_size_in_bytes or 0 for d in dels)
                if total <= bcast_limit:
                    out = out.join(F.broadcast(dd), cond, "left_anti")
                else:
                    out = out.join(dd.hint("shuffle_hash"), cond, "left_anti")
                continue
            # write-time column names (field-ID mapped), as in the uniform
            # path: a pre-rename delete file read by the current name
            # would resolve to nothing (or nulls with an explicit schema)
            def _build_seq_tagged(dels=dels, ids=ids):
                by_ws2: dict = {}
                for d in dels:
                    by_ws2.setdefault(d.file.write_schema_id, []).append(d)
                pieces2 = []
                for wsid_, ds in by_ws2.items():
                    try:
                        wsch_ = metadata.schema_by_id(wsid_)
                    except KeyError:
                        wsch_ = schema
                    wfields = [wsch_.field_by_id(i) for i in ids]
                    dtypes = type_to_spark(StructT(tuple(wfields)))
                    # tag each delete row with its file's sequence number
                    seq_map = {d.file.file_path: d.sequence_number
                               for d in ds}
                    mapping = F.create_map(*[F.lit(x)
                                             for kv in seq_map.items()
                                             for x in kv])
                    # normalize file:// URIs to match the manifest's
                    # plain paths
                    for rdf in _delete_file_readers(spark, ds, dtypes,
                                                    with_meta=True):
                        pieces2.append(rdf.select(
                            *[F.col(wf.name).alias(f"__delk_{i}")
                              for i, wf in enumerate(wfields)],
                            mapping[_io.decode_spark_path_col(
                                F.col("_metadata.file_path"),
                                paths=list(seq_map))]
                            .alias("__del_seq")))
                dd = pieces2[0]
                for p_ in pieces2[1:]:
                    dd = dd.unionByName(p_)
                return dd

            # sequence numbers are baked into the frame -> they join the
            # cache key (a cherry-picked replay of the same file could in
            # principle land at a different seq)
            seq_key = tuple(sorted((d.file.file_path, d.sequence_number)
                                   for d in dels))
            dd = _delete_build_cached(spark, dels, ("eq-seq", ids, seq_key),
                                      _build_seq_tagged)
            dd = _eq_build_bounds_filter(dd, plan, key_cols)
            cond = F.col("__data_seq") < F.col("__del_seq")
            for i, k in enumerate(key_cols):
                cond = cond & out[k].eqNullSafe(F.col(f"__delk_{i}"))
            out = out.join(dd, cond, "left_anti")
        if not uniform_eq:
            out = out.drop("__data_seq")

    if with_lineage:
        # row lineage (format/spec.md:460): _row_id = file.first_row_id +
        # position; _last_updated_sequence_number = the file's data sequence
        # number (rows not yet rewritten carry their file's commit seq).
        # Broadcast per-file map — file count is plan-sized, never row-sized.
        lin_rows = [(e.file.file_path, e.file.first_row_id, e.sequence_number)
                    for e in plan.files]
        lin_df = spark.createDataFrame(
            lin_rows, "__lin_file string, __lin_first long, __lin_seq long")
        out = (out.join(F.broadcast(lin_df),
                        F.col(FILE_PATH_COL) == F.col("__lin_file"), "left")
               .withColumn(ROW_ID_COL, F.coalesce(
                   F.col("__mat_rid"), F.col("__lin_first") + F.col(POS_COL)))
               .withColumn(LAST_UPDATED_SEQ_COL, F.coalesce(
                   F.col("__mat_seq"), F.col("__lin_seq")))
               .drop("__lin_file", "__lin_first", "__lin_seq",
                     "__mat_rid", "__mat_seq"))

    if not with_metadata_columns and need_meta:
        out = out.drop(FILE_PATH_COL, POS_COL)
    return out
