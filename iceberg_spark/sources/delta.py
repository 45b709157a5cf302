"""Delta Lake -> engine table snapshot (no Delta library required).

A Delta table is parquet data + a `_delta_log/` of ordered JSON commits
(actions: `metaData`, `add`, `remove`, `protocol`, ...). Replaying the
log yields the active file set and the current schema — which is exactly
the input our `add_files`/FastAppend ingestion needs, so an unpartitioned
Delta table snapshots **by reference** (no data copied or rewritten),
matching the reference's delta-lake module
(delta-lake/src/main/java/org/apache/iceberg/delta/
BaseSnapshotDeltaLakeTableAction.java:75 — also file-reference-based).

Partitioned Delta sources store partition values only in the log /
directory names (not in the data files), which our scan layout does not
reconstruct per file — those snapshot via a rewrite (read with basePath
so Spark restores the partition columns, then append through the normal
write path). Checkpoint-compacted logs are supported: the checkpoint
parquet (columns are one action struct each — add/remove/metaData) seeds
the state and JSON commits after the checkpoint version replay on top.
"""

from __future__ import annotations

import json
import os
from urllib.parse import unquote

from pyspark.sql import types as T


def _read_log(location: str):
    """Replay _delta_log JSON commits in version order; return
    (schema_struct, partition_columns, active_paths)."""
    log_dir = os.path.join(location, "_delta_log")
    if not os.path.isdir(log_dir):
        raise ValueError(f"not a Delta table (no _delta_log): {location}")
    schema_json = None
    partition_cols: list = []
    active: dict = {}
    ckpt_version = -1
    last_ckpt = os.path.join(log_dir, "_last_checkpoint")
    if os.path.exists(last_ckpt):
        with open(last_ckpt) as fh:
            meta = json.load(fh)
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
        import pyarrow.parquet as pq

        for cf in ckpt_files:
            tbl = pq.read_table(cf)
            cols = set(tbl.column_names)
            rows_md = tbl.column("metaData").to_pylist() \
                if "metaData" in cols else []
            for md in rows_md:
                if md is not None:
                    schema_json = md["schemaString"]
                    partition_cols = list(md.get("partitionColumns") or [])
            for add in (tbl.column("add").to_pylist()
                        if "add" in cols else []):
                if add is not None:
                    active[unquote(add["path"])] = add
            for rem in (tbl.column("remove").to_pylist()
                        if "remove" in cols else []):
                if rem is not None:
                    active.pop(unquote(rem["path"]), None)
    versions = sorted(
        f for f in os.listdir(log_dir)
        if f.endswith(".json") and f[: -len(".json")].isdigit()
        and int(f[: -len(".json")]) > ckpt_version)
    if not versions and ckpt_version < 0:
        raise ValueError(f"empty Delta log: {log_dir}")
    for fn in versions:
        with open(os.path.join(log_dir, fn)) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "metaData" in action:
                    md = action["metaData"]
                    schema_json = md["schemaString"]
                    partition_cols = list(md.get("partitionColumns") or [])
                elif "add" in action:
                    p = unquote(action["add"]["path"])
                    active[p] = action["add"]
                elif "remove" in action:
                    active.pop(unquote(action["remove"]["path"]), None)
    if schema_json is None:
        raise ValueError(f"Delta log has no metaData action: {log_dir}")
    schema = T.StructType.fromJson(json.loads(schema_json))
    paths = [p if os.path.isabs(p) else os.path.join(location, p)
             for p in active]
    return schema, partition_cols, sorted(paths)


def snapshot_delta_table(catalog, source_location: str, dest_ident: str):
    """CALL system.snapshot_delta_lake_table analog. Returns
    (table, imported_file_count, rewritten: bool)."""
    schema, pcols, paths = _read_log(source_location)
    spark = catalog.spark
    if not pcols:
        t = catalog.create_table(dest_ident, schema)
        t.add_files(paths)
        return t, len(paths), False
    # partitioned: rewrite through the engine writer (partition values are
    # not present inside Delta data files; basePath restores them from the
    # hive-style directory layout the Spark Delta writer produces)
    df = (spark.read.option("basePath", source_location)
          .schema(schema).parquet(*paths)
          .select(*[f.name for f in schema.fields]))
    t = catalog.create_table(dest_ident, schema,
                             partition_by=list(pcols))
    t.append(df)
    n = len(t.scan().plan_files().files)
    return t, n, True
