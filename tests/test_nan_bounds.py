"""NaN handling in file stats and metrics evaluators.

Spec (format/spec.md Appendix D metrics; Metrics.java nanValueCounts):
lower_bounds/upper_bounds must not contain NaN — NaN is tracked only in
nan_value_counts. parquet-mr footers can leak NaN into double min/max, so
the stats collector recomputes NaN-free bounds, and the evaluators mirror
InclusiveMetricsEvaluator/StrictMetricsEvaluator NaN guards.
"""
import math

import pytest
from pyspark.sql import types as T

from iceberg_spark.expressions import (
    FileStats,
    bind,
    col,
    inclusive_metrics_eval,
    strict_metrics_eval,
)
from iceberg_spark.schema import Schema

NAN = float("nan")

SCHEMA_PY = Schema.from_spark(
    T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("x", T.DoubleType()),
        ]
    )
)


def _spark_schema():
    return T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("x", T.DoubleType())]
    )


def test_bounds_exclude_nan(spark, catalog):
    t = catalog.create_table("nanmix", _spark_schema())
    df = spark.createDataFrame(
        [(1, NAN), (2, 0.5), (3, 10.0)], schema=_spark_schema()
    ).coalesce(1)
    t.append(df)
    e = list(t.new_scan().plan_files().files)[0]
    mn, mx, nulls, nans, vc = e.file.stats["x"]
    assert mn == 0.5 and mx == 10.0, "bounds must exclude NaN"
    assert nans == 1 and vc == 3


def test_all_nan_file_has_no_bounds(spark, catalog):
    t = catalog.create_table("nanall", _spark_schema())
    t.append(
        spark.createDataFrame([(1, NAN), (2, NAN)], schema=_spark_schema()).coalesce(1)
    )
    e = list(t.new_scan().plan_files().files)[0]
    mn, mx, nulls, nans, vc = e.file.stats["x"]
    assert mn is None and mx is None
    assert nans == 2
    # NaN < literal never matches (Spark/DuckDB NaN ordering) -> prunable
    assert len(list(t.new_scan().filter(col("x") < 1.0).plan_files().files)) == 0
    # NaN > literal DOES match in Spark/DuckDB -> must NOT prune
    assert len(list(t.new_scan().filter(col("x") > 1.0).plan_files().files)) == 1
    assert t.new_scan().filter(col("x") > 1.0).df().count() == 2
    # is_nan still finds it
    assert len(list(t.new_scan().filter(col("x").is_nan()).plan_files().files)) == 1


def test_mixed_nan_file_not_pruned(spark, catalog):
    """A file [NaN, 10.0] must survive x > 5 (regression: NaN-polluted max
    made `NaN > 5` false and wrongly pruned the file). Spark's NaN ordering
    means the NaN row itself also matches x > 5."""
    t = catalog.create_table("nanhi", _spark_schema())
    t.append(
        spark.createDataFrame([(1, NAN), (2, 10.0)], schema=_spark_schema()).coalesce(1)
    )
    files = list(t.new_scan().filter(col("x") > 5.0).plan_files().files)
    assert len(files) == 1
    got = t.new_scan().filter(col("x") > 5.0).df().collect()
    assert sorted(r.id for r in got) == [1, 2]
    # and a low-value file [NaN, 1.0] still survives x > 5 via its NaN row
    t2 = catalog.create_table("nanlo", _spark_schema())
    t2.append(
        spark.createDataFrame([(1, NAN), (2, 1.0)], schema=_spark_schema()).coalesce(1)
    )
    got2 = t2.new_scan().filter(col("x") > 5.0).df().collect()
    assert [r.id for r in got2] == [1]


def _fs(mn, mx, nulls, nans, vc):
    return FileStats(vc, {"x": (mn, mx, nulls, nans, vc)})


def _pred(e):
    return bind(e, SCHEMA_PY)


def test_inclusive_eval_nan_semantics():
    # all-NaN: lt/eq can't match, gt CAN (NaN > literal in the engine),
    # not_nan can't match, is_nan does
    fs = _fs(None, None, 0, 5, 5)
    assert not inclusive_metrics_eval(_pred(col("x") < 1.0), fs)
    assert not inclusive_metrics_eval(_pred(col("x") == 1.0), fs)
    assert inclusive_metrics_eval(_pred(col("x") > 1.0), fs)
    assert not inclusive_metrics_eval(_pred(col("x").not_nan()), fs)
    assert inclusive_metrics_eval(_pred(col("x").is_nan()), fs)
    # mixed file [NaN, 1.0]: max(NaN-free)=1.0 but NaN matches x > 5
    fs_mix = _fs(1.0, 1.0, 0, 1, 2)
    assert inclusive_metrics_eval(_pred(col("x") > 5.0), fs_mix)
    assert not inclusive_metrics_eval(_pred(col("x") < 0.5), fs_mix)
    # legacy manifests with NaN bounds: treat bounds as absent (no pruning)
    fs2 = _fs(NAN, NAN, 0, 1, 2)
    assert inclusive_metrics_eval(_pred(col("x") < 1.0), fs2)
    assert inclusive_metrics_eval(_pred(col("x") > 1.0), fs2)


def test_strict_eval_refuses_when_nan_possible():
    # [1.0, NaN]: mx(non-NaN)=1.0 but the NaN row fails x < 5 — strict False
    fs = _fs(1.0, 1.0, 0, 1, 2)
    assert not strict_metrics_eval(_pred(col("x") < 5.0), fs)
    # NaN-free float file: strict holds
    fs_ok = _fs(1.0, 2.0, 0, 0, 2)
    assert strict_metrics_eval(_pred(col("x") < 5.0), fs_ok)
    # unknown nan count on a float column: refuse
    fs_unk = _fs(1.0, 2.0, 0, None, 2)
    assert not strict_metrics_eval(_pred(col("x") < 5.0), fs_unk)
    # int column with nans=None must NOT be blocked by the NaN guard
    fs_int = FileStats(2, {"id": (1, 2, 0, None, 2)})
    assert strict_metrics_eval(_pred(col("id") < 5), fs_int)
    # strict NaN predicates
    assert strict_metrics_eval(_pred(col("x").is_nan()), _fs(None, None, 0, 3, 3))
    assert strict_metrics_eval(_pred(col("x").not_nan()), fs_ok)
    assert not strict_metrics_eval(_pred(col("x").not_nan()), fs)


def test_metadata_only_delete_keeps_nan_rows(spark, catalog):
    """DELETE WHERE x < 5 on a file [1.0, NaN] must not drop the whole file
    via the strict path — the NaN row doesn't match the predicate."""
    t = catalog.create_table("nandel", _spark_schema())
    t.append(
        spark.createDataFrame([(1, 1.0), (2, NAN)], schema=_spark_schema()).coalesce(1)
    )
    t.delete_where(col("x") < 5.0)
    t = catalog.load_table("nandel")
    left = t.to_df().collect()
    assert len(left) == 1 and math.isnan(left[0].x)


def test_all_nan_file_not_pruned_for_not_eq(spark, catalog):
    """NaN != literal is TRUE under engine ordering: an all-NaN file must
    survive NOT_EQ / NOT_IN pruning (reference
    InclusiveMetricsEvaluator.notEq keeps the file)."""
    from iceberg_spark.expressions import col, not_

    df = spark.createDataFrame(
        [(i, float("nan")) for i in range(5)], "id long, x double")
    t = catalog.create_table("nan.noteq", df.schema)
    t.append(df)
    assert t.scan(filter=col("x") != 1.0).df().count() == 5
    assert t.scan(filter=not_(col("x").isin(1.0, 2.0))).df().count() == 5
