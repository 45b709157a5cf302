"""System function registration — the FunctionCatalog surface (SURVEY §2.I).

Reference: spark/.../functions/BucketFunction.java:1 (registered via
SparkFunctions.java:32-40), TruncateFunction.java, YearsFunction.java etc.,
IcebergVersionFunction.java. The reference exposes these under
`system.bucket(n, col)` / `system.truncate(w, col)` / `system.years(ts)`...
so partition-transform values are computable from SQL.

Here: `register_system_functions(spark)` registers the same family for the
session. Time/truncate transforms are pure-SQL scalar functions (Spark 4
SQL UDFs — whole-stage codegen'd, no Python in the hot path); bucket needs
the spec's murmur3 per-type byte layouts (Appendix B, murmur3.py) so it is
a Python UDF dispatching on the input type. Results are bit-identical to
transforms.py (the partition-write path), which the tests assert.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

VERSION = "iceberg-spark 0.1 (format v3 semantics)"

_SQL_FUNCS = [
    # years/months/days/hours: int offsets from epoch (transforms.TimeTransform)
    ("iceberg_years", "(ts TIMESTAMP) RETURNS INT RETURN year(ts) - 1970"),
    ("iceberg_months",
     "(ts TIMESTAMP) RETURNS INT RETURN (year(ts) - 1970) * 12 + month(ts) - 1"),
    ("iceberg_days",
     "(ts TIMESTAMP) RETURNS DATE RETURN to_date(ts)"),
    ("iceberg_hours",
     "(ts TIMESTAMP) RETURNS INT RETURN CAST(floor(unix_timestamp(ts) / 3600) AS INT)"),
    ("iceberg_truncate",
     "(w INT, v BIGINT) RETURNS BIGINT RETURN v - ((v % w + w) % w)"),
    ("iceberg_truncate_str",
     "(w INT, v STRING) RETURNS STRING RETURN substring(v, 1, w)"),
]


def register_system_functions(spark: SparkSession) -> list:
    """Register the system function family; returns the registered names."""
    names = []
    for name, body in _SQL_FUNCS:
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{body}")
        names.append(name)

    from .murmur3 import (hash_bytes, hash_decimal_unscaled, hash_long,
                          hash_string)

    def _bucket(n, v):
        if v is None:
            return None
        import datetime as _dt
        from decimal import Decimal

        if isinstance(v, bool):
            raise ValueError("cannot bucket boolean")
        if isinstance(v, _dt.datetime):
            epoch = _dt.datetime(1970, 1, 1, tzinfo=v.tzinfo)
            v = int((v - epoch).total_seconds() * 1_000_000)
            h = hash_long(v)
        elif isinstance(v, _dt.date):
            h = hash_long((v - _dt.date(1970, 1, 1)).days)
        elif isinstance(v, int):
            h = hash_long(v)
        elif isinstance(v, str):
            h = hash_string(v)
        elif isinstance(v, (bytes, bytearray)):
            h = hash_bytes(bytes(v))
        elif isinstance(v, Decimal):
            exp = -v.as_tuple().exponent
            h = hash_decimal_unscaled(int(v.scaleb(exp).to_integral_value()))
        else:
            raise ValueError(f"cannot bucket {type(v)}")
        return (h & 0x7FFFFFFF) % n

    spark.udf.register("iceberg_bucket", _bucket, "int")
    names.append("iceberg_bucket")
    spark.udf.register("iceberg_version", lambda: VERSION, "string")
    names.append("iceberg_version")
    return names
