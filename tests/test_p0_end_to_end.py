"""P0: create -> append -> scan -> query matches plain Spark & pruning works."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from iceberg_spark import Catalog, col
from tests.conftest import SF_DIR


def test_murmur3_spec_values():
    # canonical test vectors from format/spec.md Appendix B (bucket hash column)
    from iceberg_spark.murmur3 import hash_long, hash_string, hash_decimal_unscaled

    assert hash_long(34) == 2017239379          # int 34
    assert hash_long(34) == hash_long(34)       # long 34 same layout
    assert hash_string("iceberg") == 1210000089
    import numpy as np
    from iceberg_spark.murmur3 import hash_long_vec

    assert list(hash_long_vec(np.array([34, 1, -1]))) == [
        hash_long(34), hash_long(1), hash_long(-1)
    ]


def test_create_append_scan_roundtrip(catalog, spark):
    df = spark.createDataFrame(
        [Row(id=i, data=f"row-{i}") for i in range(100)]
    )
    t = catalog.create_table("db.simple", df.schema)
    t.append(df)
    out = t.to_df()
    assert out.count() == 100
    assert {r.id for r in out.collect()} == set(range(100))


def test_filter_pruning_skips_files(catalog, spark):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("id", T.LongType()), T.StructField("val", T.StringType())
    ])
    t = catalog.create_table("db.pruned", schema)
    # three appends -> three files with disjoint id ranges
    for lo in (0, 100, 200):
        t.append(spark.createDataFrame(
            [(i, f"v{i}") for i in range(lo, lo + 100)], schema).coalesce(1))
    scan = t.scan(filter=col("id") >= 250)
    report = scan.explain_plan()
    assert report["result_data_files"] == 1
    assert report["skipped_data_files"] >= 2
    assert scan.df().count() == 50


def test_partitioned_append_and_prune(catalog, spark):
    from iceberg_spark.sources.testdata import load_table
    events = load_table(spark, SF_DIR, "events")
    t = catalog.create_table("db.events_day", events.schema, partition_by=["day(ts)"])
    t.append(events)
    total = events.count()
    assert t.to_df().count() == total

    lo = dt.datetime(2024, 1, 2)
    expected = events.filter(F.col("ts") < F.lit(lo)).count()
    scan = t.scan(filter=col("ts") < lo)
    got = scan.df().count()
    assert got == expected
    rep = scan.explain_plan()
    assert rep["skipped_data_files"] > 0  # day partitioning must prune


def test_bucket_partitioning_prunes_on_eq(catalog, spark):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("id", T.LongType()), T.StructField("v", T.StringType())
    ])
    t = catalog.create_table("db.bucketed", schema, partition_by=["bucket(8, id)"])
    t.append(spark.createDataFrame([(i, f"v{i}") for i in range(1000)], schema))
    scan = t.scan(filter=col("id") == 42)
    rows = scan.df().collect()
    assert len(rows) == 1 and rows[0].v == "v42"
    rep = scan.explain_plan()
    assert rep["skipped_data_files"] > 0  # only one bucket read


def test_time_travel(catalog, spark):
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("id", T.LongType())])
    t = catalog.create_table("db.tt", schema)
    t.append(spark.createDataFrame([(1,), (2,)], schema))
    s1 = t.current_snapshot().snapshot_id
    t.append(spark.createDataFrame([(3,)], schema))
    assert t.to_df().count() == 3
    assert t.scan(snapshot_id=s1).df().count() == 2
    # ref-based travel
    t.manage_snapshots().create_tag("v1", s1)
    assert t.scan(ref="v1").df().count() == 2


def test_overwrite_filter(catalog, spark):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("k", T.LongType()), T.StructField("v", T.StringType())
    ])
    t = catalog.create_table("db.ovw", schema)
    t.append(spark.createDataFrame([(i, "old") for i in range(10)], schema))
    t.overwrite(spark.createDataFrame([(i, "new") for i in range(5)], schema),
                overwrite_filter=col("k") < 5)
    rows = {(r.k, r.v) for r in t.to_df().collect()}
    assert rows == {(i, "new") for i in range(5)} | {(i, "old") for i in range(5, 10)}


def test_delete_cow_and_metadata_only(catalog, spark):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("id", T.LongType()), T.StructField("dep", T.StringType())
    ])
    t = catalog.create_table("db.emp", schema, partition_by=["dep"])
    t.append(spark.createDataFrame(
        [(i, "hr") for i in range(10)] + [(i, "eng") for i in range(10, 30)], schema))
    # whole-partition delete -> metadata only (no rewrite)
    snap = t.delete_where(col("dep") == "hr")
    assert snap.operation == "delete"
    assert int(snap.summary["added-data-files"]) == 0
    assert t.to_df().count() == 20
    # partial delete -> CoW rewrite
    t.delete_where(col("id") < 15)
    assert t.to_df().count() == 15


def test_delete_mor_position_deletes(catalog, spark):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("id", T.LongType()), T.StructField("v", T.StringType())
    ])
    t = catalog.create_table("db.mor", schema,
                             properties={"write.delete.mode": "merge-on-read"})
    t.append(spark.createDataFrame([(i, f"v{i}") for i in range(100)], schema))
    snap = t.delete_where(col("id").isin(list(range(0, 100, 10))))
    assert t.to_df().count() == 90
    plan = t.scan().plan_files()
    assert len(plan.pos_deletes) > 0  # deletes are MoR, data files untouched
    assert int(snap.summary["added-delete-files"]) > 0


def test_update_and_merge(catalog, spark):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("id", T.LongType()), T.StructField("bal", T.DoubleType())
    ])
    t = catalog.create_table("db.acct", schema)
    t.append(spark.createDataFrame([(1, 10.0), (2, 20.0), (3, 30.0)], schema))
    t.update(col("id") == 2, {"bal": F.col("bal") + 5.0})
    assert {(r.id, r.bal) for r in t.to_df().collect()} == {(1, 10.0), (2, 25.0), (3, 30.0)}

    src = spark.createDataFrame([(2, 100.0), (4, 40.0)], schema)
    (t.merge(src, on=["id"])
       .when_matched_update(set=None)          # update * from source
       .when_not_matched_insert(values=None)   # insert *
       .execute())
    assert {(r.id, r.bal) for r in t.to_df().collect()} == {
        (1, 10.0), (2, 100.0), (3, 30.0), (4, 40.0)
    }


def test_merge_cardinality_check(catalog, spark):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("id", T.LongType()), T.StructField("v", T.DoubleType())
    ])
    t = catalog.create_table("db.card", schema)
    t.append(spark.createDataFrame([(1, 1.0)], schema))
    src = spark.createDataFrame([(1, 2.0), (1, 3.0)], schema)
    with pytest.raises(ValueError, match="cardinality"):
        t.merge(src, on=["id"]).when_matched_update(set=None).execute()
