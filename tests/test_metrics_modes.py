"""Metrics modes (write.metadata.metrics.default / .column.<col> —
reference MetricsModes.java / MetricsConfig.java, default truncate(16)):
long string/binary bounds truncate in manifests (valid, conservative
bounds — whole-document text no longer lands in every manifest row),
counts/none drop bounds per column, and aggregate pushdown refuses
inexact variable-length bounds."""

import pytest
from pyspark.sql import functions as F

from iceberg_spark.expressions import col
from iceberg_spark.manifests import (
    metrics_config,
    parse_metrics_mode,
    truncate_binary_max,
    truncate_string_max,
    truncate_string_min,
)
from iceberg_spark.table import Catalog


def test_mode_parsing_and_config():
    assert parse_metrics_mode("none") == ("none", 0)
    assert parse_metrics_mode("Counts") == ("counts", 0)
    assert parse_metrics_mode("truncate(8)") == ("truncate", 8)
    assert parse_metrics_mode("full") == ("full", 0)
    for bad in ("truncate(0)", "truncate(-1)", "bogus", "truncate()"):
        with pytest.raises(ValueError):
            parse_metrics_mode(bad)


def test_truncate_semantics():
    # lower bound: prefix (<= original); upper: incremented prefix (>)
    assert truncate_string_min("hello world", 5) == "hello"
    up = truncate_string_max("hello world", 5)
    assert up == "hellp"
    assert up > "hello world"  # a VALID upper bound for the original
    assert truncate_string_max("hi", 5) == "hi"  # short strings untouched
    # unicode ceiling -> no upper bound representable
    assert truncate_string_max("\U0010FFFF" * 4, 2) is None
    # surrogate gap skipped (result must stay valid UTF-8)
    s = "퟿" + "zz"
    up = truncate_string_max(s, 1)
    assert up == "" and up > s
    assert truncate_binary_max(b"\xff\xff\x01", 2) is None
    assert truncate_binary_max(b"\x01\xff\x02", 2) == b"\x02"


def _doc_df(spark):
    return spark.createDataFrame(
        [(i, "document body " * 50 + chr(97 + i % 26), i * 10)
         for i in range(20)],
        "id bigint, body string, score bigint")


def test_default_truncate16_bounds_in_manifests(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    df = _doc_df(spark)
    t = cat.create_table("db.docs", df.schema)
    t.append(df)
    t = cat.load_table("db.docs")
    true_min, true_max = df.agg(F.min("body"), F.max("body")).collect()[0]
    for e in t.scan().plan_files().files:
        mn, mx, nulls, nans, vc = e.file.stats["body"]
        assert len(mn) <= 16 and len(mx) <= 16
        # still VALID bounds for the real values
        assert mn <= true_min
        assert mx > true_max
        # fixed-size columns keep exact bounds under truncate
        assert e.file.stats["id"][0] is not None
    # pruning on the truncated column stays conservative-correct
    assert t.scan().filter(
        col("body") == "nonexistent").df().count() == 0
    got = t.to_df().filter(F.col("body").startswith("document")).count()
    assert got == 20


def test_counts_none_and_per_column_override(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    df = _doc_df(spark)
    t = cat.create_table("db.docs2", df.schema, properties={
        "write.metadata.metrics.default": "counts",
        "write.metadata.metrics.column.id": "full",
        "write.metadata.metrics.column.score": "none",
    })
    t.append(df)
    t = cat.load_table("db.docs2")
    for e in t.scan().plan_files().files:
        st = e.file.stats
        assert "score" not in st                      # none -> dropped
        assert st["body"][0] is None and st["body"][1] is None  # counts
        assert st["body"][4] == e.file.record_count
        assert st["id"][0] is not None                # full override
    # scans still correct without bounds (no pruning, full filter)
    assert t.scan().filter(col("score") >= 100).df().count() == 10


def test_agg_pushdown_refuses_truncated_strings(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    df = _doc_df(spark)
    # default truncate(16): min/max(body) must NOT answer from metadata
    t = cat.create_table("db.docs3", df.schema)
    t.append(df)
    t = cat.load_table("db.docs3")
    from iceberg_spark.agg_pushdown import aggregate_pushdown

    assert aggregate_pushdown(t, [("min", "body")]) is None
    assert aggregate_pushdown(t, [("count", "body")]) is not None
    # full mode on the column -> exact bounds -> pushdown answers
    t2 = cat.create_table("db.docs4", df.schema, properties={
        "write.metadata.metrics.column.body": "full"})
    t2.append(df)
    t2 = cat.load_table("db.docs4")
    res = aggregate_pushdown(t2, [("min", "body"), ("max", "body")])
    assert res is not None
    rows = df.agg(F.min("body"), F.max("body")).collect()[0]
    assert res[("min", "body")] == rows[0]
    assert res[("max", "body")] == rows[1]


def test_metrics_config_resolution():
    from iceberg_spark.schema import Schema, NestedField

    sch = Schema((NestedField(1, "a", "string", False),
                  NestedField(2, "b", "long", False)))
    cfg = metrics_config({"write.metadata.metrics.column.a": "none"}, sch)
    assert cfg["a"] == ("none", 0)
    assert cfg["b"] == ("truncate", 16)
