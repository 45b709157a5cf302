"""Importing GENUINE apache/iceberg tables: metadata JSON + Avro manifest
list + Avro manifests (the reference's on-disk layout, ManifestReader.java
/ ManifestLists.java / TableMetadataParser.java), registered by reference.
The fixtures are written with the spec-shaped Avro schemas in
sources/iceberg_fixture.py, so the reader is exercised against the same
byte layout the reference produces (deflate-coded Avro blocks, [null,T]
option unions, array<record{key,value}> metric maps, sequence-number
inheritance for ADDED entries)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_spark.sources.iceberg import snapshot_iceberg_table
from iceberg_spark.sources.iceberg_fixture import write_reference_table

SCHEMA_JSON = {
    "type": "struct", "schema-id": 0, "fields": [
        {"id": 1, "name": "id", "required": False, "type": "long"},
        {"id": 2, "name": "grp", "required": False, "type": "long"},
    ]}


def _write_parquet(path, ids, grp):
    pq.write_table(pa.table({"id": pa.array(ids, pa.int64()),
                             "grp": pa.array([grp] * len(ids), pa.int64())}),
                   path)
    return {"path": path, "record_count": len(ids),
            "file_size": os.path.getsize(path)}


def _write_pos_delete(path, victims):
    """victims: [(data_file_path, pos)]"""
    pq.write_table(pa.table({
        "file_path": pa.array([v[0] for v in victims], pa.string()),
        "pos": pa.array([v[1] for v in victims], pa.int64())}), path)
    return {"path": path, "record_count": len(victims),
            "file_size": os.path.getsize(path), "content": 1}


def test_unpartitioned_v2_import_with_delete_scoping(catalog, tmp_path):
    root = str(tmp_path / "src_tbl")
    os.makedirs(os.path.join(root, "data"))
    fa = _write_parquet(os.path.join(root, "data", "a.parquet"),
                        list(range(0, 10)), 0)
    fb = _write_parquet(os.path.join(root, "data", "b.parquet"),
                        list(range(100, 110)), 1)
    # pos delete at seq 2 references file A; file B landed later (seq 3 —
    # per spec a delete can only name paths that existed when it was
    # written, so a valid table never has a delete naming a newer path)
    dl = _write_pos_delete(os.path.join(root, "data", "d.parquet"),
                           [(fa["path"], 0), (fa["path"], 1)])
    files = [dict(fa, seq=1), dict(fb, seq=3), dict(dl, seq=2)]
    write_reference_table(root, SCHEMA_JSON, files)

    t, n_data, n_del = snapshot_iceberg_table(catalog, root, "db.imported")
    assert (n_data, n_del) == (2, 1)
    rows = {r["id"] for r in t.to_df().collect()}
    # A lost positions 0,1 (ids 0,1); B untouched
    assert rows == set(range(2, 10)) | set(range(100, 110))
    # by reference: no data was copied
    assert t.metadata.properties["gc.enabled"] == "false"
    plan = t.scan().plan_files()
    assert {e.file.file_path for e in plan.files} == {fa["path"], fb["path"]}


def test_eq_delete_seq_scoping(catalog, tmp_path):
    root = str(tmp_path / "src_eq")
    os.makedirs(os.path.join(root, "data"))
    fa = _write_parquet(os.path.join(root, "data", "a.parquet"),
                        [1, 2, 3], 0)
    fb = _write_parquet(os.path.join(root, "data", "b.parquet"),
                        [2, 3, 4], 1)
    ed = str(tmp_path / "src_eq" / "data" / "eq.parquet")
    pq.write_table(pa.table({"id": pa.array([2, 3], pa.int64())}), ed)
    eq = {"path": ed, "record_count": 2, "file_size": os.path.getsize(ed),
          "content": 2, "equality_ids": (1,)}
    # eq delete seq 2: applies when delete.seq > data.seq -> hits A
    # (seq 1) only; B (seq 3) keeps its 2 and 3
    files = [dict(fa, seq=1), dict(fb, seq=3), dict(eq, seq=2)]
    write_reference_table(root, SCHEMA_JSON, files)
    t, _, _ = snapshot_iceberg_table(catalog, root, "db.imported_eq")
    ids = sorted(r["id"] for r in t.to_df().collect())
    assert ids == [1, 2, 3, 4]


def test_partitioned_import_prunes(catalog, tmp_path, spark):
    root = str(tmp_path / "src_part")
    os.makedirs(os.path.join(root, "data"))
    fa = _write_parquet(os.path.join(root, "data", "g0.parquet"),
                        list(range(5)), 0)
    fb = _write_parquet(os.path.join(root, "data", "g1.parquet"),
                        list(range(10, 15)), 1)
    spec_fields = [{"name": "grp", "transform": "identity",
                    "source-id": 2, "field-id": 1000}]
    part_avro = [("grp", "long", 1000)]
    files = [dict(fa, seq=1, partition={"grp": 0}),
             dict(fb, seq=1, partition={"grp": 1})]
    write_reference_table(root, SCHEMA_JSON, files,
                          partition_spec_fields=spec_fields,
                          partition_avro=part_avro)
    t, n, _ = snapshot_iceberg_table(catalog, root, "db.imported_part")
    assert n == 2
    from iceberg_spark.expressions import col

    plan = t.scan(filter=col("grp") == 1).plan_files()
    assert [e.file.file_path for e in plan.files] == [fb["path"]]
    assert sorted(r["id"] for r in
                  t.scan(filter=col("grp") == 1).df().collect()) == \
        list(range(10, 15))


def test_v3_deletion_vector_import(catalog, tmp_path):
    import numpy as np

    from iceberg_spark.deletion_vectors import write_dv_puffin

    root = str(tmp_path / "src_dv")
    os.makedirs(os.path.join(root, "data"))
    fa = _write_parquet(os.path.join(root, "data", "a.parquet"),
                        list(range(20)), 0)
    dv_path = os.path.join(root, "data", "dv.puffin")
    descs = write_dv_puffin(
        dv_path, {fa["path"]: np.array([0, 5, 19], dtype=np.int64)})
    d = descs[0]
    dv = {"path": dv_path, "format": "puffin", "content": 1,
          "record_count": d["cardinality"],
          "file_size": d["file_size_in_bytes"],
          "referenced_data_file": fa["path"],
          "content_offset": d["content_offset"],
          "content_size": d["content_size_in_bytes"]}
    files = [dict(fa, seq=1), dict(dv, seq=2)]
    write_reference_table(root, SCHEMA_JSON, files, format_version=3)
    t, n_data, n_del = snapshot_iceberg_table(catalog, root, "db.imported_dv")
    assert (n_data, n_del) == (1, 1)
    ids = sorted(r["id"] for r in t.to_df().collect())
    assert ids == sorted(set(range(20)) - {0, 5, 19})


def test_import_then_engine_writes_continue(catalog, tmp_path, spark):
    """After import the engine keeps committing: appends land at a higher
    sequence number than every imported entry, so imported deletes never
    leak onto new data."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "src_cont")
    os.makedirs(os.path.join(root, "data"))
    fa = _write_parquet(os.path.join(root, "data", "a.parquet"),
                        list(range(10)), 0)
    dl = _write_pos_delete(os.path.join(root, "data", "d.parquet"),
                           [(fa["path"], 0)])
    files = [dict(fa, seq=1), dict(dl, seq=2)]
    write_reference_table(root, SCHEMA_JSON, files)
    t, _, _ = snapshot_iceberg_table(catalog, root, "db.imported_cont")
    assert t.metadata.last_sequence_number == 2
    t.append(spark.range(1000, 1005).select(
        "id", F.lit(9).cast("long").alias("grp")))
    t = t.refresh()
    ids = sorted(r["id"] for r in t.to_df().collect())
    assert ids == list(range(1, 10)) + list(range(1000, 1005))


def test_call_procedure(catalog, tmp_path):
    root = str(tmp_path / "src_call")
    os.makedirs(os.path.join(root, "data"))
    fa = _write_parquet(os.path.join(root, "data", "a.parquet"),
                        list(range(7)), 0)
    write_reference_table(root, SCHEMA_JSON, [dict(fa, seq=1)])
    r = catalog.sql(
        f"CALL system.snapshot_iceberg_table('{root}', 'db.called')"
    ).collect()
    assert r[0]["imported_data_files_count"] == 1
    t = catalog.load_table("db.called")
    assert t.to_df().count() == 7


def test_export_roundtrip_through_reference_layout(catalog, tmp_path, spark):
    """Engine table (with MoR position deletes) -> reference-layout
    metadata (Avro manifests) -> re-import: the scan through the
    re-imported table must match the original — a differential proof
    that BOTH interop directions speak the same spec."""
    from pyspark.sql import functions as F

    from iceberg_spark.expressions import col
    from iceberg_spark.sources.iceberg import export_reference_metadata

    df = spark.range(0, 200).select(
        "id", (F.col("id") % 4).alias("grp"))
    t = catalog.create_table(
        "db.exp_src", df.schema,
        properties={"write.delete.mode": "merge-on-read"})
    t.append(df)
    t.delete_where(col("id").isin(list(range(0, 200, 9))), mode="merge-on-read")
    t = t.refresh()
    want = sorted(r["id"] for r in t.to_df().collect())

    dest = str(tmp_path / "exported")
    mpath = export_reference_metadata(t, dest)
    assert mpath.endswith(".metadata.json")
    t2, n_data, n_del = snapshot_iceberg_table(catalog, dest, "db.exp_back")
    assert n_del >= 1
    got = sorted(r["id"] for r in t2.to_df().collect())
    assert got == want


def test_export_partitioned_dv_roundtrip(catalog, tmp_path, spark):
    """Partitioned engine table with native deletion vectors exports as a
    v3 reference layout (DV blob offsets in the manifest) and re-imports
    identically."""
    from pyspark.sql import functions as F

    from iceberg_spark.expressions import col
    from iceberg_spark.sources.iceberg import export_reference_metadata

    df = spark.range(0, 100).select(
        "id", (F.col("id") % 3).alias("grp"))
    t = catalog.create_table(
        "db.exp_dv", df.schema, partition_by=["grp"],
        properties={"write.delete.mode": "merge-on-read",
                    "write.delete.format": "dv"})
    t.append(df)
    t.delete_where(col("id") < 10, mode="merge-on-read")
    t = t.refresh()
    want = sorted(r["id"] for r in t.to_df().collect())
    assert want == list(range(10, 100))

    dest = str(tmp_path / "exported_dv")
    export_reference_metadata(t, dest)
    import json
    md = json.load(open(os.path.join(dest, "metadata", "v1.metadata.json")))
    assert md["format-version"] == 3
    t2, _, n_del = snapshot_iceberg_table(catalog, dest, "db.exp_dv_back")
    assert n_del >= 1
    got = sorted(r["id"] for r in t2.to_df().collect())
    assert got == want
    # partition pruning works through the round-trip
    plan = t2.scan(filter=col("grp") == 1).plan_files()
    assert 0 < len(plan.files) < len(t2.scan().plan_files().files)


def test_export_via_call_procedure(catalog, tmp_path, spark):
    from pyspark.sql import functions as F

    df = spark.range(0, 30).select("id", (F.col("id") % 2).alias("grp"))
    t = catalog.create_table("db.exp_call", df.schema)
    t.append(df)
    dest = str(tmp_path / "exp_call_out")
    r = catalog.sql(
        f"CALL system.export_iceberg_metadata('db.exp_call', '{dest}')"
    ).collect()
    assert r[0]["metadata_json"].endswith(".metadata.json")
    t2, n, _ = snapshot_iceberg_table(catalog, dest, "db.exp_call_back")
    assert t2.to_df().count() == 30


def test_register_full_history_time_travel(catalog, tmp_path, spark):
    """register_iceberg_table replays the ancestor chain: time travel on
    the imported table (by ordinal and by timestamp) reproduces each
    source snapshot's state, and incremental reads see only genuinely
    new files per snapshot (EXISTING/ADDED statuses preserved)."""
    from iceberg_spark.sources.iceberg import register_iceberg_table
    from iceberg_spark.sources.iceberg_fixture import (
        write_reference_table_history)

    root = str(tmp_path / "src_hist")
    os.makedirs(os.path.join(root, "data"))
    fa = _write_parquet(os.path.join(root, "data", "a.parquet"),
                        list(range(0, 10)), 0)
    fb = _write_parquet(os.path.join(root, "data", "b.parquet"),
                        list(range(10, 20)), 1)
    dl = _write_pos_delete(os.path.join(root, "data", "d.parquet"),
                           [(fa["path"], 0)])
    t0, t1, t2 = 1700000000000, 1700000060000, 1700000120000
    write_reference_table_history(root, SCHEMA_JSON, [
        {"files": [dict(fa, seq=1)], "timestamp_ms": t0},
        {"files": [dict(fa, seq=1), dict(fb, seq=2)], "timestamp_ms": t1},
        {"files": [dict(fa, seq=1), dict(fb, seq=2), dict(dl, seq=3)],
         "timestamp_ms": t2, "operation": "delete"},
    ])
    t, n_snaps, n_data = register_iceberg_table(catalog, root, "db.hist")
    assert (n_snaps, n_data) == (3, 2)
    snaps = t.metadata.snapshots
    assert len(snaps) == 3
    # source commit timestamps preserved
    assert [s.timestamp_ms for s in snaps] == [t0, t1, t2]
    assert snaps[-1].operation == "delete"
    # time travel by ordinal
    ids0 = sorted(r["id"] for r in
                  t.scan(snapshot_id=snaps[0].snapshot_id).df().collect())
    assert ids0 == list(range(0, 10))
    ids1 = sorted(r["id"] for r in
                  t.scan(snapshot_id=snaps[1].snapshot_id).df().collect())
    assert ids1 == list(range(0, 20))
    ids2 = sorted(r["id"] for r in t.to_df().collect())
    assert ids2 == list(range(1, 20))
    # statuses: second snapshot re-lists file A as EXISTING, adds B
    from iceberg_spark.manifests import read_manifest_list, read_manifest
    mans = read_manifest_list(snaps[1].manifest_list)
    sts = {}
    for mf in mans:
        for e in read_manifest(mf.path, t.schema,
                               t.metadata.spec_by_id(mf.spec_id)):
            sts[e.file.file_path] = e.status
    assert sts[fa["path"]] == 0  # EXISTING
    assert sts[fb["path"]] == 1  # ADDED


def test_call_register_table_routes_reference_layout(catalog, tmp_path):
    """CALL system.register_table with a reference metadata JSON replays
    full history; engine-layout registration keeps working."""
    root = str(tmp_path / "src_reg")
    os.makedirs(os.path.join(root, "data"))
    fa = _write_parquet(os.path.join(root, "data", "a.parquet"),
                        list(range(5)), 0)
    mpath = write_reference_table(root, SCHEMA_JSON, [dict(fa, seq=1)])
    r = catalog.sql(
        f"CALL system.register_table('db.reg_ref', '{mpath}')").collect()
    assert r[0]["total_data_files_count"] == 1
    t = catalog.load_table("db.reg_ref")
    assert t.to_df().count() == 5


def test_import_renamed_column_history_reads_by_field_id(
        catalog, tmp_path, spark):
    """Files written before a column rename carry the OLD physical name;
    the import stamps each entry with its manifest's schema-id and
    registers every source schema, so the engine's write-schema grouped
    read maps old columns onto the current name by field id."""
    from iceberg_spark.sources.iceberg import register_iceberg_table
    from iceberg_spark.sources.iceberg_fixture import (
        write_reference_table_history)

    schema_v0 = {"type": "struct", "schema-id": 0, "fields": [
        {"id": 1, "name": "id", "required": False, "type": "long"},
        {"id": 2, "name": "grp", "required": False, "type": "long"}]}
    schema_v1 = {"type": "struct", "schema-id": 1, "fields": [
        {"id": 1, "name": "id", "required": False, "type": "long"},
        {"id": 2, "name": "category", "required": False, "type": "long"}]}

    root = str(tmp_path / "src_rename")
    os.makedirs(os.path.join(root, "data"))
    # old file: physical column name "grp" (pre-rename)
    fa = _write_parquet(os.path.join(root, "data", "old.parquet"),
                        [1, 2, 3], 7)
    # new file: physical column name "category"
    fb_path = os.path.join(root, "data", "new.parquet")
    pq.write_table(pa.table({
        "id": pa.array([4, 5], pa.int64()),
        "category": pa.array([9, 9], pa.int64())}), fb_path)
    fb = {"path": fb_path, "record_count": 2,
          "file_size": os.path.getsize(fb_path)}
    write_reference_table_history(
        root, schema_v1, [
            {"files": [dict(fa, seq=1)], "schema_id": 0},
            {"files": [dict(fa, seq=1), dict(fb, seq=2)], "schema_id": 1},
        ], all_schemas_json=[schema_v0, schema_v1])

    t, n_snaps, n_data = register_iceberg_table(catalog, root, "db.renamed")
    assert (n_snaps, n_data) == (2, 2)
    assert t.schema.column_names == ["id", "category"]
    rows = {(r["id"], r["category"]) for r in t.to_df().collect()}
    # old-file rows surface under the CURRENT name, values intact
    assert rows == {(1, 7), (2, 7), (3, 7), (4, 9), (5, 9)}


def test_orc_data_file_import(catalog, tmp_path):
    import pyarrow.orc as orc

    root = str(tmp_path / "src_orc")
    os.makedirs(os.path.join(root, "data"))
    op = os.path.join(root, "data", "a.orc")
    orc.write_table(pa.table({
        "id": pa.array(range(12), pa.int64()),
        "grp": pa.array([0] * 12, pa.int64())}), op)
    fo = {"path": op, "record_count": 12, "format": "ORC",
          "file_size": os.path.getsize(op)}
    write_reference_table(root, SCHEMA_JSON, [dict(fo, seq=1)])
    t, n, _ = snapshot_iceberg_table(catalog, root, "db.imported_orc")
    assert n == 1
    assert sorted(r["id"] for r in t.to_df().collect()) == list(range(12))


def test_export_multi_spec_roundtrip(catalog, tmp_path, spark):
    """Spec-evolved engine table (unpartitioned files + identity-
    partitioned files) exports with per-spec Avro manifests and
    re-imports with both specs and all rows intact."""
    from pyspark.sql import functions as F

    from iceberg_spark.expressions import col
    from iceberg_spark.sources.iceberg import export_reference_metadata

    df = spark.range(0, 40).select("id", (F.col("id") % 4).alias("grp"))
    t = catalog.create_table("db.exp_ms", df.schema)
    t.append(df)
    t.update_spec().add_field("grp").commit()
    t = t.refresh()
    df2 = spark.range(40, 80).select("id", (F.col("id") % 4).alias("grp"))
    t.append(df2)
    t = t.refresh()
    want = sorted(r["id"] for r in t.to_df().collect())
    assert want == list(range(80))

    dest = str(tmp_path / "exported_ms")
    export_reference_metadata(t, dest)
    import json
    md = json.load(open(os.path.join(dest, "metadata",
                                     "v1.metadata.json")))
    assert len(md["partition-specs"]) == 2
    assert md["default-spec-id"] == 1
    assert md["refs"]["main"]["snapshot-id"] == \
        t.current_snapshot().snapshot_id

    t2, n_data, _ = snapshot_iceberg_table(catalog, dest, "db.exp_ms_back")
    got = sorted(r["id"] for r in t2.to_df().collect())
    assert got == want
    # second-spec files prune on the identity partition
    plan = t2.scan(filter=col("grp") == 2).plan_files()
    assert 0 < len(plan.files) < len(t2.scan().plan_files().files)


def test_export_full_history_roundtrip(catalog, tmp_path, spark):
    """Engine -> reference layout -> engine with `full_history=True`:
    the registered table carries one snapshot per engine snapshot with
    preserved ids and timestamps, so time travel and incremental reads
    match the source."""
    from pyspark.sql import functions as F

    from iceberg_spark.expressions import col
    from iceberg_spark.sources.iceberg import (export_reference_metadata,
                                               register_iceberg_table)

    df1 = spark.range(0, 30).select("id", (F.col("id") % 3).alias("grp"))
    df2 = spark.range(30, 50).select("id", (F.col("id") % 3).alias("grp"))
    t = catalog.create_table("db.exp_hist", df1.schema)
    t.append(df1)
    t.append(df2)
    t.delete_where(col("id") < 5)
    t = t.refresh()
    src_snaps = t.snapshots()
    assert len(src_snaps) == 3

    dest = str(tmp_path / "exported_hist")
    export_reference_metadata(t, dest, full_history=True)
    t2, n_snaps, _ = register_iceberg_table(catalog, dest,
                                            "db.exp_hist_back")
    assert n_snaps == 3
    got_snaps = t2.snapshots()
    assert [s.snapshot_id for s in got_snaps] == \
        [s.snapshot_id for s in src_snaps]
    assert [s.timestamp_ms for s in got_snaps] == \
        [s.timestamp_ms for s in src_snaps]
    # time travel to the first snapshot sees only the first append
    first = got_snaps[0].snapshot_id
    old = t2.new_scan().use_snapshot(first).plan_files()
    assert sum(e.file.record_count for e in old.files) == 30
    assert sorted(r["id"] for r in t2.to_df().collect()) == \
        list(range(5, 50))
    # incremental read between the two appends sees exactly df2
    inc = t2.changes(from_snapshot_id=first,
                     to_snapshot_id=got_snaps[1].snapshot_id)
    assert inc.where(F.col("_change_type") == "INSERT").count() == 20


def test_sort_order_roundtrip(catalog, tmp_path, spark):
    """Sort orders and per-file sort_order_id survive an engine ->
    reference -> engine round-trip."""
    from pyspark.sql import functions as F

    from iceberg_spark.sources.iceberg import (export_reference_metadata,
                                               snapshot_iceberg_table)

    df = spark.range(0, 20).select("id", (F.col("id") % 2).alias("grp"))
    t = catalog.create_table("db.sorted_src", df.schema)
    t = t.replace_sort_order(("id", "desc"))
    t = t.refresh()
    t.append(df)
    t = t.refresh()
    src_oids = {e.file.sort_order_id
                for e in t.scan().plan_files().files}
    assert src_oids == {t.metadata.default_sort_order_id}

    dest = str(tmp_path / "exp_sorted_rt")
    export_reference_metadata(t, dest)
    t2, _, _ = snapshot_iceberg_table(catalog, dest, "db.sorted_back")
    assert t2.metadata.default_sort_order_id == \
        t.metadata.default_sort_order_id
    so = t2.metadata.sort_orders[-1]
    assert [(f.source_name, f.direction) for f in so.fields] == \
        [("id", "desc")]
    assert {e.file.sort_order_id
            for e in t2.scan().plan_files().files} == src_oids


def test_import_multi_vector_puffin_container(catalog, tmp_path):
    """One Puffin file holding TWO deletion vectors (one per data file,
    one manifest entry per blob, same path) must import as two distinct
    vectors — regression for a cache key that collapsed same-path
    entries and resurrected deleted rows."""
    import numpy as np

    from iceberg_spark.deletion_vectors import dv_blob
    from iceberg_spark.puffin import write_puffin

    root = str(tmp_path / "src_mv")
    os.makedirs(os.path.join(root, "data"))
    paths = []
    for i in range(2):
        p = os.path.join(root, "data", f"d{i}.parquet")
        pq.write_table(pa.table({
            "id": pa.array(range(i * 10, i * 10 + 10), pa.int64())}), p)
        paths.append(p)
    # delete positions 0,1 of file 0 and positions 5..9 of file 1
    pf = os.path.join(root, "data", "dv.puffin")
    blobs = [
        {"type": "deletion-vector-v1", "fields": [],
         "snapshot-id": 1, "sequence-number": 2,
         "data": dv_blob(np.array([0, 1], dtype=np.int64)),
         "properties": {"referenced-data-file": paths[0],
                        "cardinality": "2"}},
        {"type": "deletion-vector-v1", "fields": [],
         "snapshot-id": 1, "sequence-number": 2,
         "data": dv_blob(np.array([5, 6, 7, 8, 9], dtype=np.int64)),
         "properties": {"referenced-data-file": paths[1],
                        "cardinality": "5"}},
    ]
    facts = write_puffin(pf, blobs)
    schema_json = {"type": "struct", "schema-id": 0, "fields": [
        {"id": 1, "name": "id", "required": False, "type": "long"}]}
    files = [
        {"path": paths[0], "record_count": 10, "seq": 1},
        {"path": paths[1], "record_count": 10, "seq": 1},
    ]
    for bm, p, card in ((facts["blob-metadata"][0], paths[0], 2),
                        (facts["blob-metadata"][1], paths[1], 5)):
        files.append({
            "path": pf, "content": 1, "format": "PUFFIN",
            "record_count": card,
            "file_size": os.path.getsize(pf), "seq": 2,
            "referenced_data_file": p,
            "content_offset": bm["offset"],
            "content_size": bm["length"]})
    write_reference_table(root, schema_json, files, format_version=3)

    t, n_data, n_del = snapshot_iceberg_table(catalog, root, "db.mv_back")
    assert (n_data, n_del) == (2, 2)
    want = [2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14]
    got = sorted(r["id"] for r in t.to_df().collect())
    assert got == want

    # and back out: export must keep the two vectors distinct too
    from iceberg_spark.sources.iceberg import export_reference_metadata

    dest = str(tmp_path / "mv_exported")
    export_reference_metadata(t, dest)
    t2, _, n_del2 = snapshot_iceberg_table(catalog, dest, "db.mv_back2")
    assert n_del2 == 2
    assert sorted(r["id"] for r in t2.to_df().collect()) == want


def test_refs_roundtrip_through_full_history(catalog, tmp_path, spark):
    """Tags/branches on replayed snapshots survive engine -> reference
    -> engine (snapshot ids are preserved, so refs map directly)."""
    from pyspark.sql import functions as F

    from iceberg_spark.sources.iceberg import (export_reference_metadata,
                                               register_iceberg_table)

    df = spark.range(0, 12).select("id")
    t = catalog.create_table("db.refs_src", df.schema)
    t.append(df)
    t = t.refresh()
    first = t.current_snapshot().snapshot_id
    t.manage_snapshots().create_tag("v1.0", first)
    t = t.refresh()
    t.append(spark.range(12, 20).select("id"))
    t = t.refresh()

    dest = str(tmp_path / "exp_refs")
    export_reference_metadata(t, dest, full_history=True)
    t2, n_snaps, _ = register_iceberg_table(catalog, dest,
                                            "db.refs_back")
    assert n_snaps == 2
    refs = t2.refs()
    assert refs["v1.0"].snapshot_id == first
    assert refs["v1.0"].type == "tag"


def test_continuous_reference_layout_export(catalog, tmp_path, spark):
    """write.metadata.reference-layout.enabled=true keeps
    <table>/metadata-export/current a readable reference-layout table
    across commits — the file-based twin of REST loadTable."""
    from pyspark.sql import functions as F

    from iceberg_spark.sources.iceberg import read_iceberg_snapshot

    df = spark.range(0, 15).select("id")
    t = catalog.create_table(
        "db.cont_exp", df.schema,
        properties={"write.metadata.reference-layout.enabled": "true"})
    t.append(df)
    t = t.refresh()
    cur = os.path.join(t.location, "metadata-export", "current")
    entries = read_iceberg_snapshot(cur)[4]
    assert sum(e["record_count"] for e in entries) == 15

    t.append(spark.range(15, 40).select("id"))
    entries = read_iceberg_snapshot(cur)[4]
    assert sum(e["record_count"] for e in entries) == 40


def test_import_avro_data_files(catalog, tmp_path):
    """Avro DATA files import by reference (core/.../avro/Avro.java:
    FileFormat.AVRO is a first-class data format); a count-less manifest
    entry falls back to the container's block-header row count, and the
    scan decodes executor-side when spark-avro is absent."""
    from iceberg_spark.avro_file import write_avro

    root = str(tmp_path / "src_avro")
    os.makedirs(os.path.join(root, "data"))
    ap = os.path.join(root, "data", "d.avro")
    size = write_avro(
        ap, {"type": "record", "name": "r", "fields": [
            {"name": "id", "type": "long"},
            {"name": "grp", "type": "long"}]},
        [{"id": i, "grp": i % 3} for i in range(20)])
    write_reference_table(root, SCHEMA_JSON, [
        {"path": ap, "format": "avro", "record_count": 0,
         "file_size": size, "seq": 1}])
    t, n_data, n_del = snapshot_iceberg_table(catalog, root, "db.avrodata")
    assert (n_data, n_del) == (1, 0)
    live = t.scan().plan_files().files
    assert live[0].file.record_count == 20  # block-header fallback
    rows = sorted(r["id"] for r in t.to_df().collect())
    assert rows == list(range(20))


def test_import_avro_and_orc_delete_files(catalog, tmp_path):
    """ORC/Avro DELETE files convert once to parquet twins under the
    destination (the engine's MoR read path is parquet/puffin): an Avro
    position-delete and an ORC equality-delete both apply on read."""
    import pyarrow.orc as orc

    from iceberg_spark.avro_file import write_avro

    root = str(tmp_path / "src_mixdel")
    os.makedirs(os.path.join(root, "data"))
    dp = os.path.join(root, "data", "d.parquet")
    fa = _write_parquet(dp, list(range(10)), grp=1)
    # Avro position delete: rows 0 and 3 of the data file
    adel = os.path.join(root, "data", "pdel.avro")
    asize = write_avro(
        adel, {"type": "record", "name": "pd", "fields": [
            {"name": "file_path", "type": "string"},
            {"name": "pos", "type": "long"}]},
        [{"file_path": dp, "pos": 0}, {"file_path": dp, "pos": 3}])
    # ORC equality delete on id = 7
    odel = os.path.join(root, "data", "eqdel.orc")
    orc.write_table(pa.table({"id": pa.array([7], pa.int64())}), odel)
    files = [dict(fa, seq=1),
             {"path": adel, "format": "avro", "content": 1,
              "record_count": 2, "file_size": asize, "seq": 2},
             {"path": odel, "format": "orc", "content": 2,
              "record_count": 1, "file_size": os.path.getsize(odel),
              "equality_ids": [1], "seq": 2}]
    write_reference_table(root, SCHEMA_JSON, files)
    t, n_data, n_del = snapshot_iceberg_table(catalog, root, "db.mixdel")
    assert (n_data, n_del) == (1, 2)
    plan = t.scan().plan_files()
    # converted twins live under the DEST table, as parquet
    for d in list(plan.pos_deletes) + list(plan.eq_deletes):
        assert d.file.file_format == "parquet"
        assert d.file.file_path.startswith(t.location)
    rows = sorted(r["id"] for r in t.to_df().collect())
    assert rows == [1, 2, 4, 5, 6, 8, 9]  # 0,3 (pos) and 7 (eq) gone


def test_metadata_only_registration_with_manifest_stats(spark, catalog,
                                                        tmp_path,
                                                        monkeypatch):
    """Entries whose source manifest carries real metrics register
    WITHOUT opening any data file (RegisterTableProcedure parity):
    counts and spec-serialized bounds decode straight from the
    manifest, min/max pruning works, and the footer collector is never
    invoked."""
    import struct

    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_spark import manifests as M
    from iceberg_spark.expressions import col
    from iceberg_spark.sources.iceberg import snapshot_iceberg_table
    from iceberg_spark.sources.iceberg_fixture import write_reference_table

    root = str(tmp_path / "src")
    os.makedirs(os.path.join(root, "data"))
    schema_json = {"type": "struct", "schema-id": 0, "fields": [
        {"id": 1, "name": "id", "required": False, "type": "long"},
        {"id": 2, "name": "v", "required": False, "type": "double"}]}
    files = []
    for i, (lo, hi) in enumerate([(0, 49), (50, 99)]):
        p = os.path.join(root, "data", f"d{i}.parquet")
        pq.write_table(pa.table({
            "id": pa.array(range(lo, hi + 1), pa.int64()),
            "v": pa.array([float(x) for x in range(lo, hi + 1)])}), p)
        files.append({
            "path": p, "record_count": 50,
            "file_size": os.path.getsize(p), "seq": 1,
            "value_counts": [{"key": 1, "value": 50},
                             {"key": 2, "value": 50}],
            "null_value_counts": [{"key": 1, "value": 0}],
            "lower_bounds": [{"key": 1, "value": struct.pack("<q", lo)}],
            "upper_bounds": [{"key": 1, "value": struct.pack("<q", hi)}]})
    write_reference_table(root, schema_json, files)

    def boom(*a, **k):
        raise AssertionError("footer collector invoked on a "
                             "metadata-complete import")

    monkeypatch.setattr(M, "collect_data_files", boom)
    t, n, _d = snapshot_iceberg_table(catalog, root, "db.mdonly")
    assert n == 2
    assert len(t.scan(filter=col("id") >= 60).plan_files().files) == 1
    assert t.to_df().count() == 100
    from pyspark.sql import functions as F

    assert t.to_df().where(F.col("id") >= 60).count() == 40


def test_v4_parquet_manifest_metric_maps_decode(tmp_path):
    """v4 PARQUET manifests store metric maps as real parquet maps
    (key/value tuples, not avro records) — the import decodes them into
    engine stats identically to the avro path."""
    import struct

    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_spark.sources.iceberg import read_iceberg_snapshot
    from iceberg_spark.sources.iceberg_fixture import write_reference_table

    root = str(tmp_path / "v4src")
    os.makedirs(os.path.join(root, "data"))
    p = os.path.join(root, "data", "d0.parquet")
    pq.write_table(pa.table({"id": pa.array(range(50), pa.int64())}), p)
    write_reference_table(
        root,
        {"type": "struct", "schema-id": 0, "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"}]},
        [{"path": p, "record_count": 50,
          "file_size": os.path.getsize(p), "seq": 1,
          "value_counts": [{"key": 1, "value": 50}],
          "lower_bounds": [{"key": 1, "value": struct.pack("<q", 0)}],
          "upper_bounds": [{"key": 1, "value": struct.pack("<q", 49)}]}],
        format_version=4, relative_paths=True)
    _s, _c, _sp, _d, entries, _p, _md = read_iceberg_snapshot(root)
    assert entries[0]["stats"] == {"id": (0, 49, None, None, 50)}


def test_column_sizes_roundtrip_through_export(catalog, spark):
    """data_file.column_sizes: collected from footers at write, persisted
    in manifests, exported as the reference's fid-keyed metric map, and
    re-imported name-keyed."""
    import tempfile

    from pyspark.sql import types as T

    from iceberg_spark.sources.iceberg import (export_reference_metadata,
                                               snapshot_iceberg_table)

    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("v", T.StringType())])
    t = catalog.create_table("db.csz", schema)
    t.append(spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], schema).coalesce(1))
    e = t.scan().plan_files().files[0]
    assert e.file.column_sizes.get("id", 0) > 0
    assert e.file.column_sizes.get("v", 0) > 0
    dest = tempfile.mkdtemp(prefix="csz_exp_")
    mpath = export_reference_metadata(t, dest)
    back, _n, _f = snapshot_iceberg_table(catalog, mpath, "db.csz_back")
    e2 = back.scan().plan_files().files[0]
    assert e2.file.column_sizes == e.file.column_sizes
    assert back.to_df().count() == 100


def test_split_offsets_roundtrip_through_export(catalog, spark):
    """data_file.split_offsets: row-group start offsets collected at
    write, persisted in manifests, exported and re-imported."""
    import tempfile

    from pyspark.sql import types as T

    from iceberg_spark.sources.iceberg import (export_reference_metadata,
                                               snapshot_iceberg_table)

    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("v", T.StringType())])
    t = catalog.create_table("db.soff", schema)
    t.append(spark.createDataFrame(
        [(i, f"v{i}") for i in range(50)], schema).coalesce(1))
    e = t.scan().plan_files().files[0]
    offs = e.file.split_offsets
    assert offs and offs[0] >= 4  # first row group starts after magic
    dest = tempfile.mkdtemp(prefix="soff_exp_")
    mpath = export_reference_metadata(t, dest)
    back, _n, _f = snapshot_iceberg_table(catalog, mpath, "db.soff_back")
    assert back.scan().plan_files().files[0].file.split_offsets == offs
