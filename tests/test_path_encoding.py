"""Percent-encoded metadata paths: Spark's `_metadata.file_path`
URI-encodes (space -> %20, %% -> %25, '+' raw) while manifests store
raw paths — every path comparison must decode (io.decode_spark_path_col)
or MoR deletes silently keep rows in any value-with-space partition.
Regression for the bug found by object_storage_scan (o_orderpriority
values like '4-NOT SPECIFIED')."""

from pyspark.sql import functions as F

from iceberg_spark.expressions import col
from iceberg_spark.table import Catalog


def _mk(spark, tmp_path, name="db.sp"):
    cat = Catalog(spark, str(tmp_path))
    df = spark.range(40).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, "WITH SPACE")
        .otherwise("100%+plus").alias("p"))
    t = cat.create_table(name, df.schema, partition_by=["p"])
    t.append(df)
    return cat, t, df


def test_mor_delete_in_spacey_partitions(spark, tmp_path):
    cat, t, df = _mk(spark, tmp_path)
    # contiguous range -> inline filter tier
    t.delete_where(col("id") < 10, mode="merge-on-read")
    t = cat.load_table("db.sp")
    assert t.to_df().count() == 30
    # scattered singles across both weird partitions
    t.delete_where(col("id").isin([11, 13, 17, 19, 23]),
                   mode="merge-on-read")
    t = cat.load_table("db.sp")
    assert t.to_df().count() == 25
    assert t.to_df().filter(F.col("id") == 11).count() == 0


def test_update_upsert_changelog_compaction_spacey(spark, tmp_path):
    cat, t, df = _mk(spark, tmp_path, "db.sp2")
    t.update(col("id") >= 35, {"id": "id + 100"}, mode="merge-on-read")
    t = cat.load_table("db.sp2")
    assert t.to_df().count() == 40
    assert t.to_df().filter(F.col("id") >= 135).count() == 5
    t.upsert(spark.createDataFrame([(12, "WITH SPACE")], df.schema),
             keys=["id"])
    t = cat.load_table("db.sp2")
    assert t.to_df().count() == 40
    assert t.changes(
        from_snapshot_id=t.snapshots()[0].snapshot_id).count() > 0
    from iceberg_spark.maintenance import rewrite_data_files

    rewrite_data_files(t)
    t = cat.load_table("db.sp2")
    assert t.to_df().count() == 40


def test_decode_col_roundtrip(spark):
    from iceberg_spark.io import decode_spark_path_col

    rows = [("file:/a/with%20space/x.parquet",),
            ("file:/a/100%25/x+y.parquet",),
            ("s3a://b/k%20ey",)]
    df = spark.createDataFrame(rows, "p string")
    got = [r["d"] for r in
           df.select(decode_spark_path_col(F.col("p")).alias("d")).collect()]
    assert got == ["/a/with space/x.parquet",
                   "/a/100%/x+y.parquet",
                   "s3a://b/k ey"]
