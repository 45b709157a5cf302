"""Importing GENUINE apache/iceberg format-version 4 tables: v4 writes
PARQUET manifests (core/.../ManifestFiles.java MIN_FORMAT_VERSION_PARQUET_
MANIFESTS = 4, entry shape V4Metadata.java) behind an Avro manifest list
carrying first_row_id (api/.../ManifestFile.java:92), allows RELATIVE
path fields joined to the table location on "/" (format/spec.md:194-214),
and makes `location` optional in the metadata JSON (TableMetadataParser
MIN_FORMAT_VERSION_OPTIONAL_LOCATION)."""

import json
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
    pq.write_table(pa.table({
        "file_path": pa.array([v[0] for v in victims], pa.string()),
        "pos": pa.array([v[1] for v in victims], pa.int64())}), path)
    return {"path": path, "record_count": len(victims),
            "file_size": os.path.getsize(path), "content": 1}


def test_v4_parquet_manifest_import_with_delete_scoping(catalog, tmp_path):
    root = str(tmp_path / "v4_tbl")
    os.makedirs(os.path.join(root, "data"))
    fa = _write_parquet(os.path.join(root, "data", "a.parquet"),
                        list(range(0, 10)), 0)
    fb = _write_parquet(os.path.join(root, "data", "b.parquet"),
                        list(range(100, 110)), 1)
    dl = _write_pos_delete(os.path.join(root, "data", "d.parquet"),
                           [(fa["path"], 0), (fa["path"], 1)])
    files = [dict(fa, seq=1), dict(fb, seq=3), dict(dl, seq=2)]
    write_reference_table(root, SCHEMA_JSON, files, format_version=4)
    # the layout really is v4: every manifest is parquet
    mdir = os.path.join(root, "metadata")
    manifests = [f for f in os.listdir(mdir) if "-m0." in f]
    assert manifests and all(f.endswith(".parquet") for f in manifests)

    t, n_data, n_del = snapshot_iceberg_table(catalog, root, "db.v4_imp")
    assert (n_data, n_del) == (2, 1)
    rows = sorted(r["id"] for r in t.to_df().collect())
    # delete at seq 2 scopes to file A (seq 1) only
    assert rows == list(range(2, 10)) + list(range(100, 110))


def test_v4_relative_paths_and_optional_location(catalog, tmp_path):
    import numpy as np

    from iceberg_spark.deletion_vectors import write_dv_puffin

    root = str(tmp_path / "v4_rel")
    os.makedirs(os.path.join(root, "data"))
    fa = _write_parquet(os.path.join(root, "data", "a.parquet"),
                        list(range(20)), 0)
    dv_path = os.path.join(root, "data", "dv.puffin")
    d = write_dv_puffin(
        dv_path, {fa["path"]: np.array([0, 5, 19], dtype=np.int64)})[0]
    dv = {"path": dv_path, "format": "puffin", "content": 1,
          "record_count": d["cardinality"],
          "file_size": d["file_size_in_bytes"],
          "referenced_data_file": fa["path"],
          "content_offset": d["content_offset"],
          "content_size": d["content_size_in_bytes"]}
    mp = write_reference_table(root, SCHEMA_JSON,
                               [dict(fa, seq=1), dict(dv, seq=2)],
                               format_version=4, relative_paths=True)
    md = json.load(open(mp))
    assert "location" not in md
    assert not md["snapshots"][0]["manifest-list"].startswith("/")
    # data file path inside the manifest is relative too
    mdir = os.path.join(root, "metadata")
    pmf = [f for f in os.listdir(mdir) if f.endswith(".parquet")]
    stored = [r["data_file"]["file_path"] for f in pmf
              for r in pq.read_table(os.path.join(mdir, f)).to_pylist()]
    assert all(not p.startswith("/") for p in stored)

    t, n_data, n_del = snapshot_iceberg_table(catalog, root, "db.v4_rel")
    assert (n_data, n_del) == (1, 1)
    ids = sorted(r["id"] for r in t.to_df().collect())
    assert ids == sorted(set(range(20)) - {0, 5, 19})


def test_v4_typed_partition_values_prune(catalog, tmp_path):
    """v4 parquet manifests store partition values TYPED (date32 here);
    pruning must compare them exactly like engine-written values."""
    import datetime as dt

    schema = {"type": "struct", "schema-id": 0, "fields": [
        {"id": 1, "name": "id", "required": False, "type": "long"},
        {"id": 2, "name": "ts", "required": False, "type": "date"},
    ]}
    root = str(tmp_path / "v4_part")
    os.makedirs(os.path.join(root, "data"))
    files = []
    for i in (0, 1):
        p = os.path.join(root, "data", f"g{i}.parquet")
        pq.write_table(pa.table({
            "id": pa.array(range(i * 10, i * 10 + 5), pa.int64()),
            "ts": pa.array([dt.date(2022, 1, 1 + i)] * 5)}), p)
        files.append({"path": p, "record_count": 5,
                      "file_size": os.path.getsize(p), "seq": 1,
                      "partition": {"ts_day": 18993 + i}})
    write_reference_table(
        root, schema, files, format_version=4,
        partition_spec_fields=[{"name": "ts_day", "transform": "day",
                                "source-id": 2, "field-id": 1000}],
        partition_avro=[("ts_day", {"type": "int", "logicalType": "date"},
                         1000)])
    t, n, _ = snapshot_iceberg_table(catalog, root, "db.v4_part")
    assert n == 2
    from iceberg_spark.expressions import col

    plan = t.scan(filter=col("ts") == dt.date(2022, 1, 2)).plan_files()
    assert len(plan.files) == 1
    assert sorted(r["id"] for r in
                  t.scan(filter=col("ts") == dt.date(2022, 1, 2))
                  .df().collect()) == list(range(10, 15))


def test_v4_import_then_engine_writes_continue(catalog, tmp_path, spark):
    root = str(tmp_path / "v4_cont")
    os.makedirs(os.path.join(root, "data"))
    fa = _write_parquet(os.path.join(root, "data", "a.parquet"),
                        list(range(5)), 0)
    write_reference_table(root, SCHEMA_JSON, [dict(fa, seq=1)],
                          format_version=4, relative_paths=True)
    t, _, _ = snapshot_iceberg_table(catalog, root, "db.v4_cont")
    t.append(spark.createDataFrame([(99, 9)], "id: long, grp: long"))
    t = t.refresh()
    assert sorted(r["id"] for r in t.to_df().collect()) == \
        list(range(5)) + [99]


def test_format_version_5_rejected(catalog, tmp_path):
    root = str(tmp_path / "v5_tbl")
    os.makedirs(os.path.join(root, "data"))
    fa = _write_parquet(os.path.join(root, "data", "a.parquet"),
                        list(range(3)), 0)
    mp = write_reference_table(root, SCHEMA_JSON, [dict(fa, seq=1)],
                               format_version=4)
    md = json.load(open(mp))
    md["format-version"] = 5
    json.dump(md, open(mp, "w"))
    with pytest.raises(NotImplementedError, match="format-version 5"):
        snapshot_iceberg_table(catalog, root, "db.v5_imp")


def test_v4_export_roundtrip_lineage_stable(catalog, tmp_path, spark):
    """Engine table -> format_version=4 export (parquet manifests,
    next-row-id / first-row-id, per-entry fid-142 first_row_id) ->
    register -> per-row _row_id / _last_updated_sequence_number and the
    table's next-row-id are IDENTICAL to the source."""
    import glob
    from pyspark.sql import functions as F

    from iceberg_spark.expressions import col
    from iceberg_spark.sources.iceberg import (export_reference_metadata,
                                               register_iceberg_table)
    from iceberg_spark.table import Catalog

    cat = Catalog(spark, str(tmp_path / "srcwh"))
    df = spark.range(0, 120).selectExpr("id", "id % 3 as grp")
    t = cat.create_table("db.v4lin", df.schema, properties={
        "write.delete.mode": "merge-on-read"})
    t.append(df.filter(F.col("id") < 60))
    t.append(df.filter(F.col("id") >= 60))
    t.delete_where(col("id").isin([7, 77]), mode="merge-on-read")
    t = cat.load_table("db.v4lin")
    src = {r.id: (r._row_id, r._last_updated_sequence_number)
           for r in t.to_df(with_lineage=True).collect()}
    dest = str(tmp_path / "exp")
    mp = export_reference_metadata(t, dest, full_history=True,
                                   format_version=4)
    md = json.load(open(mp))
    assert md["format-version"] == 4
    assert md["next-row-id"] == t.metadata.next_row_id
    assert glob.glob(os.path.join(dest, "metadata", "*-m0.parquet"))
    t2, n_snaps, _ = register_iceberg_table(catalog, dest, "db.v4lin_rt")
    assert n_snaps == 3
    assert t2.metadata.next_row_id == t.metadata.next_row_id
    rt = {r.id: (r._row_id, r._last_updated_sequence_number)
          for r in t2.to_df(with_lineage=True).collect()}
    assert rt == src


def test_v3_export_carries_row_lineage(catalog, tmp_path, spark):
    """v3 exports emit next-row-id / snapshot first-row-id / per-entry
    first_row_id too (row lineage is a v3 feature, format/spec.md:460)."""
    from pyspark.sql import functions as F

    from iceberg_spark.sources.iceberg import (export_reference_metadata,
                                               register_iceberg_table)
    from iceberg_spark.table import Catalog

    cat = Catalog(spark, str(tmp_path / "srcwh3"))
    df = spark.range(0, 50).selectExpr("id", "id % 3 as grp")
    t = cat.create_table("db.v3lin", df.schema)
    t.append(df)
    t = cat.load_table("db.v3lin")
    dest = str(tmp_path / "exp3")
    mp = export_reference_metadata(t, dest, full_history=True,
                                   format_version=3)
    md = json.load(open(mp))
    assert md["format-version"] == 3
    assert md["next-row-id"] == t.metadata.next_row_id > 0
    assert all("first-row-id" in s for s in md["snapshots"])
    t2, _, _ = register_iceberg_table(catalog, dest, "db.v3lin_rt")
    src = {r.id: r._row_id for r in t.to_df(with_lineage=True).collect()}
    rt = {r.id: r._row_id for r in t2.to_df(with_lineage=True).collect()}
    assert rt == src


def test_v4_null_first_row_id_inherits_from_manifest(catalog, tmp_path):
    """Spec First Row ID Inheritance: file-level null resolves to the
    manifest's first_row_id plus preceding null files' record counts."""
    root = str(tmp_path / "v4_inh")
    os.makedirs(os.path.join(root, "data"))
    fa = _write_parquet(os.path.join(root, "data", "a.parquet"),
                        list(range(5)), 0)
    fb = _write_parquet(os.path.join(root, "data", "b.parquet"),
                        list(range(5, 12)), 1)
    # no per-file first_row_id given -> fixture assigns the manifest one;
    # entries stay null -> importer must inherit 0 and 0+5
    write_reference_table(root, SCHEMA_JSON,
                          [dict(fa, seq=1), dict(fb, seq=1)],
                          format_version=4)
    t, _, _ = snapshot_iceberg_table(catalog, root, "db.v4_inh")
    got = sorted((f.file.record_count, f.file.first_row_id)
                 for f in t.scan().plan_files().files)
    assert got == [(5, 0), (7, 5)]
    assert t.metadata.next_row_id == 12


def test_export_format_version_validation(catalog, tmp_path, spark):
    from pyspark.sql import functions as F

    from iceberg_spark.expressions import col
    from iceberg_spark.sources.iceberg import export_reference_metadata
    from iceberg_spark.table import Catalog

    cat = Catalog(spark, str(tmp_path / "vwh"))
    df = spark.range(0, 20).selectExpr("id", "id % 3 as grp")
    t = cat.create_table("db.vv", df.schema, properties={
        "write.delete.mode": "merge-on-read",
        "write.delete.format": "dv"})
    t.append(df)
    t.delete_where(col("id") == 3, mode="merge-on-read")
    t = cat.load_table("db.vv")
    with pytest.raises(ValueError, match="v3"):
        export_reference_metadata(t, str(tmp_path / "e2"),
                                  format_version=2)  # DVs + lineage
    with pytest.raises(NotImplementedError, match="v4"):
        export_reference_metadata(t, str(tmp_path / "e4e"),
                                  format_version=4,
                                  encryption_key=bytes(range(16)))
    with pytest.raises(ValueError, match="unsupported"):
        export_reference_metadata(t, str(tmp_path / "e5"),
                                  format_version=5)
