"""snapshot_delta_lake_table: replay a synthetic _delta_log (the JSON
action format any Delta writer produces) and snapshot into the engine.
Unpartitioned tables import by reference; partitioned ones rewrite."""

import json
import os

from pyspark.sql import functions as F


def _write_commit(log_dir, version, actions):
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, f"{version:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def _meta(schema_fields, partition_cols=()):
    return {"metaData": {
        "id": "meta-1",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": json.dumps({
            "type": "struct",
            "fields": [{"name": n, "type": t, "nullable": True,
                        "metadata": {}} for n, t in schema_fields]}),
        "partitionColumns": list(partition_cols),
        "configuration": {},
    }}


def _add(path, pvals=None):
    return {"add": {"path": path, "partitionValues": pvals or {},
                    "size": 1, "modificationTime": 0, "dataChange": True}}


def _mk_unpartitioned_delta(spark, root):
    df1 = spark.range(0, 50).select(F.col("id"), (F.col("id") * 2).alias("v"))
    df2 = spark.range(50, 80).select(F.col("id"), (F.col("id") * 2).alias("v"))
    df3 = spark.range(80, 90).select(F.col("id"), (F.col("id") * 2).alias("v"))
    names = []
    for i, d in enumerate((df1, df2, df3)):
        sub = os.path.join(root, f"part-{i}")
        d.coalesce(1).write.parquet(sub)
        f = [x for x in os.listdir(sub) if x.endswith(".parquet")][0]
        name = f"part-{i}/{f}"
        names.append(name)
    log = os.path.join(root, "_delta_log")
    _write_commit(log, 0, [_meta([("id", "long"), ("v", "long")]),
                           _add(names[0])])
    _write_commit(log, 1, [_add(names[1]), _add(names[2])])
    # commit 2 removes the middle file — those rows must NOT appear
    _write_commit(log, 2, [{"remove": {"path": names[1],
                                       "dataChange": True}}])
    return [names[0], names[2]]


def test_snapshot_unpartitioned_by_reference(catalog, spark, tmp_path):
    root = str(tmp_path / "delta_src")
    live = _mk_unpartitioned_delta(spark, root)
    res = catalog.sql(
        f"CALL system.snapshot_delta_lake_table("
        f"source_table => 'delta.`{root}`', table => 'db.from_delta')"
    ).collect()
    assert res[0].imported_files_count == 2
    assert res[0].rewritten is False
    t = catalog.load_table("db.from_delta")
    got = sorted(r.id for r in t.to_df().collect())
    assert got == sorted(list(range(0, 50)) + list(range(80, 90)))
    # by reference: engine points at the original Delta parquet files
    plan_paths = {e.file.file_path
                  for e in t.scan().plan_files().files}
    assert plan_paths == {os.path.join(root, p) for p in live}
    # stats came from footers -> pruning works immediately
    assert len(t.scan(filter=__import__(
        "iceberg_spark.expressions", fromlist=["col"]).col("id") >= 80)
        .plan_files().files) == 1


def test_snapshot_partitioned_by_reference(catalog, spark, tmp_path):
    root = str(tmp_path / "delta_part")
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 4).alias("p"), (F.col("id") * 3).alias("v"))
    # hive-layout parquet exactly as the Spark Delta writer lays out files
    df.write.partitionBy("p").parquet(root)
    names = []
    for d in os.listdir(root):
        if d.startswith("p="):
            for f in os.listdir(os.path.join(root, d)):
                if f.endswith(".parquet"):
                    names.append((f"{d}/{f}", d.split("=")[1]))
    log = os.path.join(root, "_delta_log")
    _write_commit(log, 0, [_meta([("id", "long"), ("v", "long"),
                                  ("p", "long")], ["p"])]
                  + [_add(n, {"p": pv}) for n, pv in names])
    res = catalog.sql(
        f"CALL system.snapshot_delta_lake_table("
        f"source_table => 'delta.`{root}`', table => 'db.from_delta_p')"
    ).collect()
    assert res[0].rewritten is False  # partitioned imports are by reference
    t = catalog.load_table("db.from_delta_p")
    got = sorted((r.id, r.p, r.v) for r in t.to_df().collect())
    assert got == [(i, i % 4, i * 3) for i in range(100)]
    # identity partitioning carried over -> partition pruning
    from iceberg_spark.expressions import col
    pruned = t.scan(filter=col("p") == 2).plan_files()
    assert 0 < len(pruned.files) < len(t.scan().plan_files().files)


def test_checkpointed_log_replays(catalog, spark, tmp_path):
    """State seeds from the checkpoint parquet; JSON commits after the
    checkpoint version replay on top (incl. a remove of a checkpointed
    file). Pre-checkpoint JSON commits must be ignored."""
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "delta_ckpt")
    names = _mk_unpartitioned_delta(spark, root)  # live after JSON: 0, 2
    log = os.path.join(root, "_delta_log")

    # checkpoint at version 2 capturing files 0 and 2 as the active set;
    # one action per row, exactly the Delta checkpoint layout
    add_t = pa.struct([("path", pa.string()),
                       ("partitionValues", pa.map_(pa.string(), pa.string())),
                       ("size", pa.int64()), ("dataChange", pa.bool_())])
    md_t = pa.struct([("id", pa.string()), ("schemaString", pa.string()),
                      ("partitionColumns", pa.list_(pa.string()))])
    rm_t = pa.struct([("path", pa.string()), ("dataChange", pa.bool_())])
    meta_action = _meta([("id", "long"), ("v", "long")])["metaData"]
    rows_md = [{"id": "m1", "schemaString": meta_action["schemaString"],
                "partitionColumns": []}, None, None]
    live0 = [p for p in names]
    rows_add = [None] + [{"path": p, "partitionValues": [],
                          "size": 1, "dataChange": True} for p in live0]
    tbl = pa.table({
        "metaData": pa.array(rows_md, md_t),
        "add": pa.array(rows_add, add_t),
        "remove": pa.array([None] * 3, rm_t),
    })
    pq.write_table(tbl, os.path.join(log, f"{2:020d}.checkpoint.parquet"))
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        fh.write(_json.dumps({"version": 2}))
    # post-checkpoint commit: drop the first file
    _write_commit(log, 3, [{"remove": {"path": live0[0],
                                       "dataChange": True}}])

    res = catalog.sql(
        f"CALL system.snapshot_delta_lake_table("
        f"source_table => 'delta.`{root}`', table => 'db.from_ckpt')"
    ).collect()
    assert res[0].imported_files_count == 1
    t = catalog.load_table("db.from_ckpt")
    got = sorted(r.id for r in t.to_df().collect())
    assert got == list(range(80, 90))  # only part-2 survives


def test_unsupported_delta_features_fail_loudly(catalog, spark, tmp_path):
    import pytest as _pytest

    from iceberg_spark.sources.delta import snapshot_delta_table

    # deletion vector on an add action
    root = str(tmp_path / "d_dv")
    log = os.path.join(root, "_delta_log")
    _write_commit(log, 0, [_meta([("id", "long")]),
                           {"add": {"path": "f.parquet", "partitionValues": {},
                                    "size": 1, "dataChange": True,
                                    "deletionVector": {"storageType": "u"}}}])
    with _pytest.raises(NotImplementedError, match="deletion vector"):
        snapshot_delta_table(catalog, root, "db.ddv")

    # reader protocol v3 with features
    root2 = str(tmp_path / "d_proto")
    log2 = os.path.join(root2, "_delta_log")
    _write_commit(log2, 0, [{"protocol": {"minReaderVersion": 3,
                                          "readerFeatures": ["deletionVectors"]}},
                            _meta([("id", "long")])])
    with _pytest.raises(NotImplementedError, match="protocol"):
        snapshot_delta_table(catalog, root2, "db.dproto")

    # column mapping
    root3 = str(tmp_path / "d_cmap")
    log3 = os.path.join(root3, "_delta_log")
    m3 = _meta([("id", "long")])
    m3["metaData"]["configuration"] = {"delta.columnMapping.mode": "name"}
    _write_commit(log3, 0, [m3])
    with _pytest.raises(NotImplementedError, match="column mapping"):
        snapshot_delta_table(catalog, root3, "db.dcmap")


def test_by_reference_snapshot_blocks_gc(catalog, spark, tmp_path):
    """Maintenance must never delete a by-reference source's files."""
    import pytest as _pytest

    from iceberg_spark.maintenance import (delete_reachable_files,
                                           expire_snapshots,
                                           remove_orphan_files)

    root = str(tmp_path / "delta_gc")
    _mk_unpartitioned_delta(spark, root)
    catalog.sql(
        f"CALL system.snapshot_delta_lake_table("
        f"source_table => 'delta.`{root}`', table => 'db.gcref')")
    t = catalog.load_table("db.gcref")
    assert t.metadata.properties.get("gc.enabled") == "false"
    with _pytest.raises(ValueError, match="GC is disabled"):
        expire_snapshots(t)
    with _pytest.raises(ValueError, match="GC is disabled"):
        delete_reachable_files(t)
    with _pytest.raises(ValueError, match="GC is disabled"):
        remove_orphan_files(t)
    # dry-run planning is still allowed
    res = delete_reachable_files(t, dry_run=True)
    assert res["deleted_data_files_count"] >= 1


def test_partition_values_from_log_not_directories(catalog, spark, tmp_path):
    """Partition values must come from add.partitionValues — a flat (non
    hive-layout) partitioned Delta table imports correctly."""
    root = str(tmp_path / "delta_flat")
    os.makedirs(root)
    names = []
    for p in range(3):
        d = spark.range(p * 10, p * 10 + 10).select(
            F.col("id"), (F.col("id") * 2).alias("v"))
        sub = os.path.join(root, f"flat-{p}")
        d.coalesce(1).write.parquet(sub)
        f = [x for x in os.listdir(sub) if x.endswith(".parquet")][0]
        names.append((f"flat-{p}/{f}", str(p)))
    log = os.path.join(root, "_delta_log")
    _write_commit(log, 0, [_meta([("id", "long"), ("v", "long"),
                                  ("p", "long")], ["p"])]
                  + [_add(n, {"p": pv}) for n, pv in names])
    res = catalog.sql(
        f"CALL system.snapshot_delta_lake_table("
        f"source_table => 'delta.`{root}`', table => 'db.flatp')").collect()
    assert res[0].rewritten is False
    t = catalog.load_table("db.flatp")
    got = sorted((r.id, r.p) for r in t.to_df().collect())
    assert got == [(i, i // 10) for i in range(30)]


def test_log_version_gap_fails_loudly(catalog, spark, tmp_path):
    """A missing intermediate commit (00..01.json absent between 0 and 2)
    must error — replaying a gapped log yields a WRONG file set."""
    import pytest

    root = str(tmp_path / "delta_gap")
    d = spark.range(0, 10).select(F.col("id"), (F.col("id") * 2).alias("v"))
    sub = os.path.join(root, "part-0")
    d.coalesce(1).write.parquet(sub)
    f = [x for x in os.listdir(sub) if x.endswith(".parquet")][0]
    log = os.path.join(root, "_delta_log")
    _write_commit(log, 0, [_meta([("id", "long"), ("v", "long")]),
                           _add(f"part-0/{f}")])
    _write_commit(log, 2, [_add(f"part-0/{f}")])  # version 1 missing
    with pytest.raises(ValueError, match="version gaps"):
        catalog.sql(
            f"CALL system.snapshot_delta_lake_table("
            f"source_table => 'delta.`{root}`', table => 'db.gapped')")


def test_partitioned_import_special_char_location(catalog, spark, tmp_path):
    """A table location with a space: `_metadata.file_path` is URI-encoded
    (%20) — the import must URL-decode before the partition-value join or
    every row silently drops; the row-count post-check backstops it."""
    root = str(tmp_path / "delta with space")
    os.makedirs(root)
    names = []
    for p in range(2):
        d = spark.range(p * 5, p * 5 + 5).select(
            F.col("id"), (F.col("id") * 2).alias("v"))
        sub = os.path.join(root, f"f-{p}")
        d.coalesce(1).write.parquet(sub)
        f = [x for x in os.listdir(sub) if x.endswith(".parquet")][0]
        names.append((f"f-{p}/{f}", str(p)))
    log = os.path.join(root, "_delta_log")
    _write_commit(log, 0, [_meta([("id", "long"), ("v", "long"),
                                  ("p", "long")], ["p"])]
                  + [_add(n, {"p": pv}) for n, pv in names])
    res = catalog.sql(
        f"CALL system.snapshot_delta_lake_table("
        f"source_table => 'delta.`{root}`', table => 'db.spacey')").collect()
    assert res[0].rewritten is False
    t = catalog.load_table("db.spacey")
    got = sorted((r.id, r.p) for r in t.to_df().collect())
    assert got == [(i, i // 5) for i in range(10)]
