"""v4 relative paths (format/spec.md:194-227): manifest/manifest-list path
fields stored relative to the table location; the table survives relocation
by a plain directory copy — including merge-on-read position deletes whose
parquet contents carry write-time absolute paths."""

import glob
import os
import shutil

import pyarrow.parquet as pq
import pytest
from pyspark.sql import Row

from iceberg_spark import Catalog, col
from iceberg_spark.table import Table
from iceberg_spark.metadata import TableOperations

REL = {"write.metadata.use-relative-paths": "true"}


def _rows(n):
    return [Row(id=i, bucket=i % 4, data=f"row-{i}") for i in range(n)]


def _assert_no_absolute_paths(loc):
    for mf in glob.glob(os.path.join(loc, "metadata", "manifests", "*.parquet")):
        t = pq.read_table(mf, columns=["file_path", "referenced_data_file"])
        for p in t.column("file_path").to_pylist():
            assert not os.path.isabs(p) and "://" not in p, p
        for p in t.column("referenced_data_file").to_pylist():
            assert p is None or not os.path.isabs(p), p
    for ml in glob.glob(os.path.join(loc, "metadata", "manifest-lists", "*.parquet")):
        for p in pq.read_table(ml, columns=["manifest_path"]).column(
                "manifest_path").to_pylist():
            assert not os.path.isabs(p), p
    import json
    vs = sorted(glob.glob(os.path.join(loc, "metadata", "v*.metadata.json")))
    with open(vs[-1]) as f:
        j = json.load(f)
    for s in j["snapshots"]:
        assert not os.path.isabs(s["manifest-list"]), s["manifest-list"]


def test_relative_paths_on_disk(catalog, spark):
    df = spark.createDataFrame(_rows(100))
    t = catalog.create_table("db.relpaths", df.schema,
                             partition_by=["bucket"], properties=REL)
    t.append(df)
    t.append(spark.createDataFrame(_rows(40)))
    _assert_no_absolute_paths(t.location)
    # in-memory plan resolves to absolute, readable files
    out = t.to_df()
    assert out.count() == 140
    plan = t.scan().plan_files()
    assert all(os.path.isabs(e.file.file_path) for e in plan.files)


def test_relocated_table_scans_and_mor(catalog, spark, tmp_path):
    df = spark.createDataFrame(_rows(200))
    t = catalog.create_table("db.movable", df.schema,
                             partition_by=["bucket"], properties=REL)
    t.append(df)
    t.delete_where(col("id") < 50, mode="merge-on-read")
    expected = sorted(r.id for r in t.to_df().collect())
    assert expected == list(range(50, 200))

    new_loc = str(tmp_path / "relocated" / "movable")
    os.makedirs(os.path.dirname(new_loc), exist_ok=True)
    shutil.copytree(t.location, new_loc)
    shutil.rmtree(t.location)  # prove nothing resolves to the old prefix

    moved = Table(spark, new_loc, TableOperations(new_loc).refresh(), "db.movable")
    got = sorted(r.id for r in moved.to_df().collect())
    assert got == expected
    # writes continue at the new location, still relative
    moved.append(spark.createDataFrame([Row(id=999, bucket=1, data="post-move")]))
    assert moved.to_df().filter("id = 999").count() == 1
    _assert_no_absolute_paths(new_loc)


def test_absolute_tables_unaffected(catalog, spark):
    df = spark.createDataFrame(_rows(30))
    t = catalog.create_table("db.abspaths", df.schema)
    t.append(df)
    mf = glob.glob(os.path.join(t.location, "metadata", "manifests", "*.parquet"))[0]
    paths = pq.read_table(mf, columns=["file_path"]).column("file_path").to_pylist()
    assert all(os.path.isabs(p) for p in paths)
    assert t.to_df().count() == 30


def test_maintenance_on_relocated_table(catalog, spark, tmp_path):
    """Dangling-delete detection compares location-independent suffixes:
    on a relocated table, live position deletes must NOT be treated as
    dangling (their contents carry old-location absolute paths)."""
    from iceberg_spark.maintenance import remove_dangling_deletes

    df = spark.createDataFrame(_rows(120))
    t = catalog.create_table("db.mvmaint", df.schema,
                             partition_by=["bucket"], properties=REL)
    t.append(df)
    t.delete_where(col("id") < 30, mode="merge-on-read")
    expected = sorted(r.id for r in t.to_df().collect())

    new_loc = str(tmp_path / "mvmaint2")
    shutil.copytree(t.location, new_loc)
    shutil.rmtree(t.location)
    moved = Table(spark, new_loc, TableOperations(new_loc).refresh(), "db.mvmaint")

    removed = remove_dangling_deletes(moved)
    assert removed == 0, "live deletes must survive relocation"
    assert sorted(r.id for r in moved.refresh().to_df().collect()) == expected
