"""Delta Lake -> engine table snapshot (no Delta library required).

A Delta table is parquet data + a `_delta_log/` of ordered JSON commits
(actions: `protocol`, `metaData`, `add`, `remove`, ...), optionally
compacted into checkpoint parquet. Replaying the log yields the active
file set, per-file partition values, and the current schema — which is
exactly the input our `add_files`/FastAppend ingestion needs, so an
unpartitioned Delta table snapshots **by reference** (no data copied or
rewritten), matching the reference's delta-lake module
(delta-lake/src/main/java/org/apache/iceberg/delta/
BaseSnapshotDeltaLakeTableAction.java:75 — also file-reference-based).
By-reference tables are created with `gc.enabled=false` so engine
maintenance can never delete the source Delta table's files.

Partitioned Delta sources store partition values only in the log (not in
the data files); they ALSO import by reference — each file's partition
tuple comes from the replayed `add.partitionValues` (the authoritative
source; the protocol does NOT require hive-style directory names), and
the engine scan supplies identity partition columns as per-file metadata
constants since the data files do not store them.

Unsupported source features fail loudly instead of importing wrong data:
reader protocol versions > 1 / readerFeatures, deletion vectors on add
actions, and column mapping.
"""

from __future__ import annotations

import json
import os
from urllib.parse import unquote, urlparse

from pyspark.sql import types as T


def _resolve_path(p: str, location: str) -> str:
    u = urlparse(p)
    if u.scheme == "":
        return p if os.path.isabs(p) else os.path.join(location, p)
    if u.scheme == "file":
        return unquote(u.path)
    raise ValueError(
        f"unsupported path scheme in Delta log (local/file only): {p}")


def _check_protocol(proto: dict):
    if not proto:
        return
    ver = int(proto.get("minReaderVersion") or 1)
    feats = list(proto.get("readerFeatures") or [])
    if ver > 1 or feats:
        raise NotImplementedError(
            f"Delta reader protocol not supported: minReaderVersion={ver} "
            f"readerFeatures={feats} (deletion vectors / column mapping / "
            "v2 checkpoints would import wrong data)")


def _check_metadata(md: dict):
    conf = md.get("configuration") or {}
    cmode = conf.get("delta.columnMapping.mode", "none")
    if cmode not in ("none", None):
        raise NotImplementedError(
            f"Delta column mapping mode {cmode!r} not supported: physical "
            "parquet column names differ from the logical schema")


def _check_add(add: dict, where: str):
    if add.get("deletionVector"):
        raise NotImplementedError(
            f"Delta deletion vectors not supported ({where}): importing "
            "the whole file would resurrect deleted rows")


def _pvals(add) -> dict:
    pv = add.get("partitionValues") or {}
    if isinstance(pv, list):  # pyarrow map column -> list of (k, v)
        pv = dict(pv)
    return pv


def _read_log(location: str):
    """Replay _delta_log (checkpoint parquet seed + later JSON commits);
    return (schema_struct, partition_columns, {resolved_path: pvals})."""
    log_dir = os.path.join(location, "_delta_log")
    from ..io import resolve_io

    dio = resolve_io(location)
    if not dio.is_dir(log_dir):
        raise ValueError(f"not a Delta table (no _delta_log): {location}")
    schema_json = None
    partition_cols: list = []
    active: dict = {}
    ckpt_version = -1
    last_ckpt = os.path.join(log_dir, "_last_checkpoint")
    if dio.exists(last_ckpt):
        meta = json.loads(dio.read_text(last_ckpt))
        ckpt_version = int(meta["version"])
        parts = meta.get("parts")
        if parts:
            ckpt_files = [os.path.join(
                log_dir,
                f"{ckpt_version:020d}.checkpoint.{i:010d}.{parts:010d}.parquet")
                for i in range(1, parts + 1)]
        else:
            ckpt_files = [os.path.join(
                log_dir, f"{ckpt_version:020d}.checkpoint.parquet")]
        from .. import io as _fio

        for cf in ckpt_files:
            tbl = _fio.read_parquet(cf)
            cols = set(tbl.column_names)
            if "protocol" in cols:
                for pr in tbl.column("protocol").to_pylist():
                    if pr is not None:
                        _check_protocol(pr)
            if "metaData" in cols:
                for md in tbl.column("metaData").to_pylist():
                    if md is not None:
                        _check_metadata(md)
                        schema_json = md["schemaString"]
                        partition_cols = list(md.get("partitionColumns") or [])
            if "add" in cols:
                for add in tbl.column("add").to_pylist():
                    if add is not None:
                        _check_add(add, "checkpoint")
                        active[unquote(add["path"])] = _pvals(add)
            if "remove" in cols:
                for rem in tbl.column("remove").to_pylist():
                    if rem is not None:
                        active.pop(unquote(rem["path"]), None)
    versions = sorted(
        f for f in dio.list(log_dir)
        if f.endswith(".json") and f[: -len(".json")].isdigit()
        and int(f[: -len(".json")]) > ckpt_version)
    if not versions and ckpt_version < 0:
        raise ValueError(f"empty Delta log: {log_dir}")
    # Delta log reconstruction requires a gapless commit sequence starting
    # right after the checkpoint (or at 0 with no checkpoint); a missing
    # intermediate commit means the replayed file set is WRONG, not partial
    vnums = [int(f[: -len(".json")]) for f in versions]
    expect = list(range(ckpt_version + 1, ckpt_version + 1 + len(vnums)))
    if vnums != expect:
        raise ValueError(
            f"Delta log has version gaps after checkpoint {ckpt_version}: "
            f"found {vnums}, expected consecutive {expect} ({log_dir})")
    for fn in versions:
        for line in dio.read_text(
                os.path.join(log_dir, fn)).splitlines():
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "protocol" in action:
                    _check_protocol(action["protocol"])
                elif "metaData" in action:
                    md = action["metaData"]
                    _check_metadata(md)
                    schema_json = md["schemaString"]
                    partition_cols = list(md.get("partitionColumns") or [])
                elif "add" in action:
                    add = action["add"]
                    _check_add(add, fn)
                    active[unquote(add["path"])] = _pvals(add)
                elif "remove" in action:
                    active.pop(unquote(action["remove"]["path"]), None)
    if schema_json is None:
        raise ValueError(f"Delta log has no metaData action: {log_dir}")
    schema = T.StructType.fromJson(json.loads(schema_json))
    files = {_resolve_path(p, location): pv for p, pv in active.items()}
    return schema, partition_cols, files


def snapshot_delta_table(catalog, source_location: str, dest_ident: str):
    """CALL system.snapshot_delta_lake_table analog. Returns
    (table, imported_file_count, rewritten: bool — always False: both
    unpartitioned and partitioned sources import BY REFERENCE, matching
    BaseSnapshotDeltaLakeTableAction)."""
    from dataclasses import replace as _replace

    from ..manifests import collect_data_files
    from ..writes import FastAppend, parse_partition_value

    schema, pcols, files = _read_log(source_location)
    spark = catalog.spark
    paths = sorted(files)
    if not pcols:
        # by reference: engine metadata points at the source's files, so
        # GC must never run against them (reference snapshot semantics)
        t = catalog.create_table(dest_ident, schema,
                                 properties={"gc.enabled": "false"})
        t.add_files(paths)
        return t, len(paths), False
    # partitioned: ALSO by reference. Delta partitioning is by column
    # value == an identity spec; partition tuples come from the replayed
    # add.partitionValues (authoritative — the protocol does not require
    # hive-style directory names, and the data files don't store the
    # partition columns). The engine scan reads identity partition source
    # columns as per-file metadata constants, so no rewrite is needed.
    t = catalog.create_table(dest_ident, schema, partition_by=list(pcols),
                             properties={"gc.enabled": "false"})
    ptypes = dict(t.spec.partition_type(t.schema))
    partitions = {}
    for p in paths:
        pv = {}
        for c in pcols:
            raw = files[p].get(c)
            pv[c] = None if raw is None else parse_partition_value(raw, ptypes[c])
        partitions[p] = pv
    metas = collect_data_files(paths, t.schema, t.spec, partitions,
                               spark=spark)
    metas = [_replace(f, write_schema_id=t.schema.schema_id) for f in metas]
    FastAppend(t, metas).commit()
    t = t.refresh()
    n = len(t.scan().plan_files().files)
    if n != len(paths):
        raise ValueError(
            f"Delta import file-count mismatch: log holds {len(paths)} "
            f"active files but {n} were imported for {source_location}")
    return t, n, False
