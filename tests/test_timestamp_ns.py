"""v3 timestamp_ns fidelity: the engine stores ns as int64 (Spark caps
timestamps at micros — SURVEY §1.3), so exactness must hold through write,
stats, pruning, filters, and read. Reference api/.../types/Types.java:300,
spec format/spec.md:261.

The driver testdata's ns values are µs-aligned, so these tests synthesize
values with non-zero sub-microsecond digits — the bits a timestamp-typed
path would silently destroy.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_spark.expressions import col
from iceberg_spark.schema import NestedField, Schema

BASE = 1_706_000_000_000_000_000  # 2024-01-23T08:53:20Z in nanos


def _ns_schema():
    return Schema((
        NestedField(1, "id", "long", required=True),
        NestedField(2, "ts", "timestamp_ns"),
        NestedField(3, "tag", "string"),
    ))


def _rows(n0, count, step_ns):
    # sub-µs digits: i % 1000 ends up in the last three decimal places
    return [(i, BASE + i * step_ns + (i % 1000), f"t{i % 3}")
            for i in range(n0, n0 + count)]


SPARK_SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("ts", T.LongType(), True),
    T.StructField("tag", T.StringType(), True),
])


def test_ns_roundtrip_exact(spark, catalog):
    t = catalog.create_table("db.tsns_rt", _ns_schema())
    rows = _rows(0, 500, 1_000_000_000)
    t.append(spark.createDataFrame(rows, SPARK_SCHEMA))
    got = sorted((r.id, r.ts) for r in t.to_df().select("id", "ts").collect())
    assert got == sorted((i, ts) for i, ts, _ in rows)
    # sub-µs digits survived: at least one value is not µs-aligned
    assert any(ts % 1000 for _, ts in got)


def test_ns_boundary_filter_is_exact(spark, catalog):
    """A filter 1 ns above a stored value must exclude exactly that value —
    µs truncation anywhere in the path would off-by-one this."""
    t = catalog.create_table("db.tsns_filter", _ns_schema())
    rows = [(1, BASE + 1, "a"), (2, BASE + 2, "a"), (3, BASE + 1000, "b")]
    t.append(spark.createDataFrame(rows, SPARK_SCHEMA))
    got = {r.id for r in t.scan(filter=col("ts") >= BASE + 2).df().collect()}
    assert got == {2, 3}
    got = {r.id for r in t.scan(filter=col("ts") > BASE + 2).df().collect()}
    assert got == {3}


def test_ns_minmax_stats_prune_files(spark, catalog):
    t = catalog.create_table("db.tsns_prune", _ns_schema())
    step = 1_000_000_000
    for chunk in range(3):  # three files with disjoint ns ranges
        t.append(spark.createDataFrame(_rows(chunk * 1000, 1000, step),
                                       SPARK_SCHEMA).coalesce(1))
    t = t.refresh()
    cut = BASE + 2000 * step + 1  # ns literal inside file 3's range
    plan = t.scan(filter=col("ts") >= cut).plan_files()
    assert len(plan.files) == 1, "ns min/max stats should prune 2 of 3 files"
    n = t.scan(filter=col("ts") >= cut).df().count()
    assert n == 999  # cut +1ns excludes id=2000 (its sub-µs digit is 0)


def test_ns_promotion_from_date(spark, catalog):
    """date -> timestamp_ns promotion reads old files as midnight nanos
    (schema.py promotion lattice; spec v3 additions)."""
    t = catalog.create_table("db.tsns_promo", Schema((
        NestedField(1, "id", "long", required=True),
        NestedField(2, "d", "date"),
    )))
    t.append(spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-02")],
        "id long, d string").select("id", F.col("d").cast("date")))
    t.update_schema().update_column("d", "timestamp_ns").commit()
    t = t.refresh()
    got = {r.id: r.d for r in t.to_df().collect()}
    day_ns = 86_400_000_000_000
    epoch_20240101 = 19723 * day_ns
    assert got == {1: epoch_20240101, 2: epoch_20240101 + day_ns}


def test_workload_oracle_shape(spark):
    """The registered workload's Spark side at sf0.001 returns the same
    rows as its DuckDB oracle (the driver's gate runs sf0.01)."""
    duckdb = pytest.importorskip("duckdb")
    from tests.conftest import SF_DIR
    from iceberg_spark.workloads_lifecycle import (TIMESTAMP_NS_SQL,
                                                   timestamp_ns_scan)

    got = [tuple(r) for r in timestamp_ns_scan(spark, SF_DIR).collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/events.parquet')")
    want = con.execute(TIMESTAMP_NS_SQL).fetchall()
    assert got == want
