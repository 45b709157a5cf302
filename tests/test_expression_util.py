"""ExpressionUtil parity (reference api/.../expressions/ExpressionUtil.java):
sanitized filters, equivalence, selectsPartitions, extractByIdInclusive."""

import datetime

from iceberg_spark import expressions as E
from iceberg_spark.expressions import col
from iceberg_spark.schema import NestedField, Schema
from iceberg_spark.metadata import PartitionSpec, PartitionField
from iceberg_spark.transforms import parse_transform


SCHEMA = Schema((NestedField(1, "id", "long", True),
                 NestedField(2, "name", "string", False),
                 NestedField(3, "ts", "timestamp", False),
                 NestedField(4, "day", "date", False)))


def test_sanitize_hides_values():
    e = (col("id") > 1234) & (col("name") == "secret")
    s = E.to_sanitized_string(E.bind(e, SCHEMA))
    assert "1234" not in s and "secret" not in s
    assert "4-digit-int" in s and "hash-" in s
    e2 = col("ts") < datetime.datetime(2026, 1, 1)
    assert "(timestamp)" in E.to_sanitized_string(e2)
    # same string -> same hash (grep-able across logs)
    s1 = E.to_sanitized_string(col("name") == "x")
    s2 = E.to_sanitized_string(col("name") == "x")
    assert s1 == s2


def test_equivalent_order_insensitive():
    a = (col("id") > 5) & (col("name") == "a")
    b = (col("name") == "a") & (col("id") > 5)
    assert E.equivalent(a, b, SCHEMA)
    assert not E.equivalent(a, (col("id") > 6) & (col("name") == "a"), SCHEMA)
    # NOT is pushed down before comparing
    assert E.equivalent(E.not_(col("id") > 5), col("id") <= 5, SCHEMA)
    # IN literal order is irrelevant
    assert E.equivalent(col("id").isin(1, 2, 3), col("id").isin(3, 1, 2), SCHEMA)


def _spec(field, transform):
    fid = {"id": 1, "name": 2, "ts": 3, "day": 4}[field]
    return PartitionSpec(0, (PartitionField(
        fid, 1000, f"{field}_{transform}", parse_transform(transform), field),))


def test_selects_partitions_day_boundary():
    spec_day = _spec("ts", "day")
    on_boundary = col("ts") < datetime.datetime(2026, 3, 9)
    off_boundary = col("ts") < datetime.datetime(2026, 3, 9, 10, 0)
    assert E.selects_partitions(on_boundary, spec_day, SCHEMA)
    assert not E.selects_partitions(off_boundary, spec_day, SCHEMA)


def test_selects_partitions_identity_and_unpartitioned():
    spec_id = _spec("id", "identity")
    assert E.selects_partitions(col("id") == 7, spec_id, SCHEMA)
    empty = PartitionSpec(0, ())
    assert not E.selects_partitions(col("id") == 7, empty, SCHEMA)


def test_extract_by_id_inclusive():
    e = (col("id") > 5) & (col("name") == "a")
    kept = E.extract_by_id_inclusive(e, SCHEMA, [1])
    assert E.equivalent(kept, E.bind(col("id") > 5, SCHEMA))
    # OR with a dropped side inclusively widens to TRUE
    e2 = (col("id") > 5) | (col("name") == "a")
    assert isinstance(E.extract_by_id_inclusive(e2, SCHEMA, [1]), E.AlwaysTrue)
    assert isinstance(E.extract_by_id_inclusive(e, SCHEMA, []), E.AlwaysTrue)


def test_scan_report_sanitized_filter(catalog, spark):
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(id=i, name=f"n{i}") for i in range(5)])
    t = catalog.create_table("eu.t", df.schema)
    t.append(df)
    plan = t.scan(filter=(col("id") > 1234) & (col("name") == "secret")).plan_files()
    s = plan.report.filter_sanitized
    assert "1234" not in s and "secret" not in s and "hash-" in s
