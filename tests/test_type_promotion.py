"""Type promotion matrix (format/spec.md:356 "Valid primitive type
promotions"; api/.../UpdateSchema.java updateColumn).

v1/v2: int->long, float->double, decimal(P,S)->decimal(P',S) P'>P.
v3 adds: unknown->any, date->timestamp (no zone) / timestamp_ns — never the
tz variants. Promotion of a partition-source column is rejected when the
transform output would change (format/spec.md:380).

Reads must see old files' values under the promoted type, and stats-based
pruning must stay correct across the promotion boundary.
"""
import datetime
import decimal

import pytest
from pyspark.sql import functions as F, types as T

from iceberg_spark.schema import is_promotable


def test_promotion_lattice():
    assert is_promotable("int", "long")
    assert is_promotable("float", "double")
    assert is_promotable("decimal(9,2)", "decimal(18,2)")
    assert not is_promotable("decimal(18,2)", "decimal(9,2)")
    assert not is_promotable("decimal(9,2)", "decimal(18,3)")  # scale fixed
    assert is_promotable("date", "timestamp_ntz")
    assert is_promotable("date", "timestamp_ns")
    assert not is_promotable("date", "timestamp")  # timestamptz: forbidden
    assert not is_promotable("date", "timestamptz_ns")
    assert is_promotable("unknown", "string")
    assert is_promotable("unknown", "long")
    assert not is_promotable("long", "int")
    assert not is_promotable("string", "long")


def test_int_to_long_and_float_to_double_read(spark, catalog):
    sch = T.StructType([
        T.StructField("id", T.IntegerType()),
        T.StructField("x", T.FloatType()),
    ])
    t = catalog.create_table("promo", sch)
    t.append(spark.createDataFrame([(1, 1.5), (2, 2.5)], schema=sch))

    t.update_schema().update_column("id", "long").update_column("x", "double").commit()
    t = catalog.load_table("promo")

    df = t.to_df()
    assert dict(df.dtypes) == {"id": "bigint", "x": "double"}
    got = {r.id: r.x for r in df.collect()}
    assert got == {1: 1.5, 2: 2.5}

    # post-promotion writers append with the wide type; both cohorts scan
    wide = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("x", T.DoubleType()),
    ])
    t.append(spark.createDataFrame([(3 << 40, 3.25)], schema=wide))
    assert t.to_df().count() == 3

    # stats pruning still works across the boundary: filter selecting only
    # the new file must skip the old one
    from iceberg_spark.expressions import col

    plan = t.new_scan().filter(col("id") > (1 << 40)).plan_files()
    assert len(plan.files) == 1


def test_decimal_widening_read(spark, catalog):
    sch = T.StructType([T.StructField("d", T.DecimalType(9, 2))])
    t = catalog.create_table("promo_dec", sch)
    t.append(spark.createDataFrame([(decimal.Decimal("12.34"),)], schema=sch))
    t.update_schema().update_column("d", "decimal(18,2)").commit()
    t = catalog.load_table("promo_dec")
    assert dict(t.to_df().dtypes) == {"d": "decimal(18,2)"}
    assert t.to_df().collect()[0].d == decimal.Decimal("12.34")


def test_date_to_timestamp_read(spark, catalog):
    sch = T.StructType([
        T.StructField("id", T.IntegerType()),
        T.StructField("day", T.DateType()),
    ])
    t = catalog.create_table("promo_date", sch)
    d = datetime.date(2024, 3, 15)
    t.append(spark.createDataFrame([(1, d)], schema=sch))
    t.update_schema().update_column("day", "timestamp_ntz").commit()
    t = catalog.load_table("promo_date")
    row = t.to_df().collect()[0]
    assert row.day == datetime.datetime(2024, 3, 15, 0, 0)


def test_date_to_timestamp_ns_read(spark, catalog):
    sch = T.StructType([T.StructField("day", T.DateType())])
    t = catalog.create_table("promo_ns", sch)
    d = datetime.date(1970, 1, 3)
    t.append(spark.createDataFrame([(d,)], schema=sch))
    t.update_schema().update_column("day", "timestamp_ns").commit()
    t = catalog.load_table("promo_ns")
    # timestamp_ns surfaces as long nanos (schema.py v3 mapping)
    assert t.to_df().collect()[0].day == 2 * 86_400_000_000_000


def test_partition_source_guard(spark, catalog):
    sch = T.StructType([
        T.StructField("id", T.IntegerType()),
        T.StructField("day", T.DateType()),
    ])
    # identity-partitioned on the date column: promotion must be rejected
    t = catalog.create_table("promo_guard", sch, partition_by=["day"])
    with pytest.raises(ValueError, match="partition source"):
        t.update_schema().update_column("day", "timestamp_ntz").commit()

    # days() transform is stable under the promotion -> allowed
    t2 = catalog.create_table("promo_guard_ok", sch, partition_by=["day(day)"])
    t2.update_schema().update_column("day", "timestamp_ntz").commit()
    assert catalog.load_table("promo_guard_ok").schema.find_field("day").type \
        == "timestamp_ntz"


def test_filtered_scan_after_date_to_timestamp_promotion(catalog, spark):
    """Pre-promotion manifests hold date stats; a datetime literal on the
    promoted column must not crash metrics pruning (stats are lifted into
    the literal domain) and must return the right rows."""
    from iceberg_spark.expressions import col

    df = spark.createDataFrame(
        [(i, datetime.date(2024, 1, 1 + i)) for i in range(10)],
        T.StructType([T.StructField("id", T.LongType()),
                      T.StructField("d", T.DateType())]))
    t = catalog.create_table("promo.d2ts", df.schema)
    t.append(df)  # manifest stats in the date domain
    t.update_schema().update_column("d", "timestamp_ntz").commit()
    t = catalog.load_table("promo.d2ts")
    t.append(spark.createDataFrame(
        [(100, datetime.datetime(2024, 2, 1, 12, 30))],
        T.StructType([T.StructField("id", T.LongType()),
                      T.StructField("d", T.TimestampNTZType())])))
    # comparison literal is a datetime; old file stats are dates
    got = sorted(r.id for r in
                 t.scan(filter=col("d") >= datetime.datetime(2024, 1, 6))
                 .df().collect())
    assert got == [5, 6, 7, 8, 9, 100]
    # strict path (metadata-only delete planning) must not crash either
    t.delete_where(col("d") < datetime.datetime(2024, 1, 3))
    assert t.to_df().count() == 9
