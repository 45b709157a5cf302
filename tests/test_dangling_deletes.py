"""remove_dangling_deletes must fire in its TARGET scenario — dangling
delete entries while OTHER data files stay live. The scan planner already
prunes deletes that cannot apply (the dangling set), so the action has to
enumerate delete manifests unpruned (RemoveDanglingDeletesSparkAction.java
analog). Also: v3 forbids parquet position-delete files coexisting with a
DV on one data file (format/spec.md:1384), so DV writes must fully convert
and remove any overlapping multi-file parquet delete file."""

import pytest
from pyspark.sql import functions as F

from iceberg_spark.expressions import col
from iceberg_spark.maintenance import remove_dangling_deletes


@pytest.fixture()
def two_file_table(catalog, spark):
    schema = spark.range(0, 1).select(
        "id", F.lit(0).cast("long").alias("grp")).schema
    t = catalog.create_table(
        "dang", schema,
        properties={"write.delete.mode": "merge-on-read"})
    # two separate appends -> two data files
    t.append(spark.range(0, 100).select("id", F.lit(0).alias("grp")))
    t.append(spark.range(100, 200).select("id", F.lit(1).alias("grp")))
    return t


def _pos_delete_paths(t):
    return {d.file.file_path for d in t.scan().plan_files().pos_deletes}


def test_dangling_pos_delete_removed_while_other_files_live(
        two_file_table, spark):
    t = two_file_table
    # MoR delete inside the grp-0 files -> position delete referencing them
    t.delete_where(col("id") == 5, mode="merge-on-read")
    t.refresh()
    # CoW delete rewrites the grp-0 side: the referenced data files die,
    # the pos-delete entry stays behind, dangling
    t.delete_where(col("grp") == 0, mode="copy-on-write")
    t.refresh()
    plan = t.scan().plan_files()
    assert plan.files  # grp-1 side still live
    # the action must find and drop the dangling entry from metadata even
    # when the read planner has already pruned it from scans
    n = remove_dangling_deletes(t)
    assert n >= 1
    t.refresh()
    assert not t.scan().plan_files().pos_deletes
    assert t.to_df().count() == 100
    assert remove_dangling_deletes(t.refresh()) == 0  # idempotent


def test_all_deletes_dangling_when_no_live_data(two_file_table):
    t = two_file_table
    t.delete_where(col("id") == 5, mode="merge-on-read")
    t.refresh()
    t.delete_where(col("grp") == 0, mode="copy-on-write")
    t.refresh()
    t.delete_where(col("grp") == 1, mode="copy-on-write")
    t.refresh()
    assert t.to_df().count() == 0
    assert remove_dangling_deletes(t) >= 1
    t.refresh()
    assert t.to_df().count() == 0


def test_dv_write_removes_overlapping_parquet_pos_deletes(catalog, spark):
    schema = spark.range(0, 1).select(
        "id", F.lit(0).cast("long").alias("grp")).schema
    t = catalog.create_table(
        "dvco", schema,
        properties={"write.delete.mode": "merge-on-read"})
    t.append(spark.range(0, 100).select("id", F.lit(0).alias("grp")))
    t.append(spark.range(100, 200).select("id", F.lit(1).alias("grp")))
    # parquet pos deletes touching BOTH files in one multi-file delete
    t.delete_where(col("id").isin([1, 150]), mode="merge-on-read")
    t.refresh()
    pq_before = {d.file.file_path
                 for d in t.scan().plan_files().pos_deletes
                 if d.file.file_format != "puffin"}
    assert pq_before
    # switch to DV encoding; delete a row in file A only
    t.set_properties(**{"write.delete.format": "dv"})
    t.refresh()
    t.delete_where(col("id") == 2, mode="merge-on-read")
    t.refresh()
    deletes = t.scan().plan_files().pos_deletes
    by_fmt = {}
    for d in deletes:
        by_fmt.setdefault(d.file.file_format, []).append(d)
    # the overlapping parquet delete file is gone — only DVs remain
    assert "parquet" not in by_fmt, sorted(
        d.file.file_path for d in by_fmt["parquet"])
    # its rows (for both files) survived the conversion
    assert t.to_df().count() == 197
    refs = {d.file.referenced_data_file for d in by_fmt.get("puffin", [])}
    assert len(refs) == 2  # one DV per touched data file
    # and no data file carries two DVs
    assert len(by_fmt.get("puffin", [])) == 2
