"""v3 default values (format/spec.md "Default values";
api/.../UpdateSchema.java addColumn-with-default).

initial-default: rows in files written before the column existed read the
default instead of null. write-default: writers that omit the column get
the default physically written. Both survive metadata JSON round-trips.
"""
import datetime

from pyspark.sql import types as T


def _schema():
    return T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )


def test_initial_and_write_default(spark, catalog):
    t = catalog.create_table("defs", _schema())
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], schema=_schema()))

    t.update_schema().add_column("score", "int", default=42).commit()
    t = catalog.load_table("defs")

    # pre-evolution rows read the initial-default, not null
    got = {r.id: r.score for r in t.to_df().collect()}
    assert got == {1: 42, 2: 42}

    # a writer omitting the column gets the write-default
    t.append(spark.createDataFrame([(3, "c")], schema=_schema()))
    got = {r.id: r.score for r in t.to_df().collect()}
    assert got == {1: 42, 2: 42, 3: 42}

    # a writer supplying the column wins over the default
    full = T.StructType(_schema().fields + [T.StructField("score", T.IntegerType())])
    t.append(spark.createDataFrame([(4, "d", 7)], schema=full))
    got = {r.id: r.score for r in t.to_df().collect()}
    assert got[4] == 7 and got[1] == 42

    # metadata JSON round-trip preserves both defaults
    t2 = catalog.load_table("defs")
    f = t2.schema.find_field("score")
    assert f.initial_default == 42 and f.write_default == 42


def test_update_write_default_only(spark, catalog):
    t = catalog.create_table("defs2", _schema())
    t.append(spark.createDataFrame([(1, "a")], schema=_schema()))
    t.update_schema().add_column("tag", "string", default="old").commit()
    t = catalog.load_table("defs2")
    t.update_schema().update_column_default("tag", "new").commit()
    t = catalog.load_table("defs2")

    t.append(spark.createDataFrame([(2, "b")], schema=_schema()))
    got = {r.id: r.tag for r in t.to_df().collect()}
    # initial-default is immutable: old rows still read "old"
    assert got == {1: "old", 2: "new"}


def test_temporal_default_round_trip(spark, catalog):
    t = catalog.create_table("defs3", _schema())
    t.append(spark.createDataFrame([(1, "a")], schema=_schema()))
    t.update_schema().add_column(
        "since", "date", default=datetime.date(2020, 1, 2)
    ).commit()
    t = catalog.load_table("defs3")
    got = t.to_df().collect()[0]
    assert got.since == datetime.date(2020, 1, 2)


def test_filter_on_defaulted_column(spark, catalog):
    """Pruning must not drop pre-evolution files whose (virtual) default
    matches the predicate — they have no stats for the new column."""
    from iceberg_spark.expressions import col

    t = catalog.create_table("defs4", _schema())
    t.append(spark.createDataFrame([(1, "a")], schema=_schema()))
    t.update_schema().add_column("score", "int", default=5).commit()
    t = catalog.load_table("defs4")
    t.append(spark.createDataFrame([(2, "b")], schema=_schema()))

    rows = t.new_scan().filter(col("score") == 5).df().collect()
    assert sorted(r.id for r in rows) == [1, 2]
    assert t.new_scan().filter(col("score") == 9).df().count() == 0
