"""Metadata-only aggregate pushdown: exact answers + refusal semantics
(mirrors reference SparkScanBuilder.pushAggregation guard conditions)."""

import math

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from iceberg_spark import expressions as E
from iceberg_spark.expressions import col

SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("cat", T.StringType()),
    T.StructField("v", T.DoubleType()),
])


def _mk(catalog, spark, name, rows, partition_by=None):
    t = catalog.create_table(f"db.{name}", SCHEMA, partition_by=partition_by)
    t.append(spark.createDataFrame(rows, SCHEMA))
    return t


def test_pushdown_exact_full_table(catalog, spark):
    rows = [(i, "ab"[i % 2], float(i) / 4) for i in range(100)]
    t = _mk(catalog, spark, "t1", rows)
    res = t.aggregate_pushdown(
        [("count_star", None), ("min", "v"), ("max", "v"),
         ("count", "id"), ("min", "id"), ("max", "id")])
    assert res[("count_star", None)] == 100
    assert res[("min", "v")] == 0.0 and res[("max", "v")] == 99 / 4
    assert res[("count", "id")] == 100
    assert res[("min", "id")] == 0 and res[("max", "id")] == 99


def test_pushdown_partition_strict_filter(catalog, spark):
    rows = [(i, "ab"[i % 2], float(i)) for i in range(100)]
    t = _mk(catalog, spark, "t2", rows, partition_by=["cat"])
    res = t.aggregate_pushdown(
        [("count_star", None), ("max", "id")], filter=col("cat") == "a")
    assert res[("count_star", None)] == 50
    assert res[("max", "id")] == 98


def test_pushdown_refuses_partial_match(catalog, spark):
    rows = [(i, "ab"[i % 2], float(i)) for i in range(100)]
    t = _mk(catalog, spark, "t3", rows)
    # id < 50 only partially matches the single file -> must bail
    assert t.aggregate_pushdown([("count_star", None)],
                                filter=col("id") < 50) is None
    # but a filter the file fully matches (via metrics bounds) is fine
    res = t.aggregate_pushdown([("count_star", None)], filter=col("id") < 1000)
    assert res[("count_star", None)] == 100


def test_pushdown_refuses_with_deletes(catalog, spark):
    rows = [(i, "ab"[i % 2], float(i)) for i in range(100)]
    t = _mk(catalog, spark, "t4", rows)
    t.delete_where(col("id") < 10, mode="merge-on-read")
    assert t.aggregate_pushdown([("count_star", None)]) is None


def test_pushdown_refuses_nan_bounds(catalog, spark):
    rows = [(1, "a", 1.0), (2, "a", float("nan")), (3, "a", 5.0)]
    t = _mk(catalog, spark, "t5", rows)
    # count is fine, min/max on the NaN-carrying double column is not
    res = t.aggregate_pushdown([("count_star", None)])
    assert res[("count_star", None)] == 3
    assert t.aggregate_pushdown([("max", "v")]) is None
    # NaN-free double column pushes fine (nan counts collected at write)
    t2 = _mk(catalog, spark, "t6", [(1, "a", 1.0), (2, "b", 2.5)])
    res = t2.aggregate_pushdown([("min", "v"), ("max", "v")])
    assert res[("min", "v")] == 1.0 and res[("max", "v")] == 2.5


def test_pushdown_matches_engine_scan(catalog, spark):
    rows = [(i, "abc"[i % 3], float((i * 37) % 113)) for i in range(300)]
    t = _mk(catalog, spark, "t7", rows, partition_by=["cat"])
    res = t.aggregate_pushdown(
        [("count_star", None), ("min", "v"), ("max", "v")],
        filter=col("cat").isin("a", "b"))
    real = (t.to_df().filter(F.col("cat").isin("a", "b"))
            .agg(F.count(F.lit(1)), F.min("v"), F.max("v")).collect()[0])
    assert res[("count_star", None)] == real[0]
    assert math.isclose(res[("min", "v")], real[1])
    assert math.isclose(res[("max", "v")], real[2])


def test_agg_pushdown_shredded_extract(catalog, spark):
    """MIN/MAX/COUNT over a DECLARED shredded variant path answer from
    the companion's manifest bounds — no data read; undeclared paths
    bail to the engine plan (None)."""
    from pyspark.sql import functions as F

    from iceberg_spark import expressions as E

    df = spark.range(0, 500).selectExpr(
        "id",
        "parse_json(case when id % 50 = 0 then '{}' else "
        "concat('{\"len\": ', cast(id as string), '}') end) as meta")
    t = catalog.create_table("agg.shred", df.schema, properties={
        "write.variant.shred.meta": "$.len:long"})
    t.append(df)
    t = catalog.load_table("agg.shred")
    ex = E.extract("meta", "$.len", "long")
    res = t.aggregate_pushdown([
        ("count_star", None), ("min", ex), ("max", ex), ("count", ex)])
    assert res is not None
    k = repr(ex._term)
    assert res[("count_star", None)] == 500
    assert res[("min", k)] == 1          # id 0 has no path
    assert res[("max", k)] == 499
    assert res[("count", k)] == 490      # 10 missing-path rows
    # undeclared path -> unpushable
    assert t.aggregate_pushdown(
        [("min", E.extract("meta", "$.other", "long"))]) is None
