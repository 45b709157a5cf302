"""Compiled position-run coverage probe (jvm_probe.pos_covered_filter):
the StaticInvoke twin of _ranges_filter's path+pos expression chain.
Correctness pins: ordinal order for prefix-sharing paths, inclusive run
boundaries, absent files, and the loud-but-safe refusals (overlapping
runs, positions beyond the 2^40 encoding budget)."""

import pytest

from iceberg_spark import jvm_probe


@pytest.fixture(scope="module")
def probe_ok(spark):
    if not jvm_probe.available(spark):
        pytest.skip("no JDK for the probe helper jar")
    return True


def _apply(spark, df, ranges, **kw):
    cond = jvm_probe.pos_covered_filter(spark, ranges, **kw)
    assert cond is not None
    return cond


def test_pos_probe_matches_expression_chain(spark, probe_ok):
    """Probe and _ranges_filter agree row-for-row on a layout with
    prefix-sharing paths (f1 vs f10: python sort order must equal the
    JVM UTF8String binary order the ordinals assume)."""
    from pyspark.sql import functions as F

    from iceberg_spark.scan import _ranges_filter

    paths = [f"/wh/t/data/f{i}.parquet" for i in (1, 10, 2, 21, 3)]
    rows = [(p, pos) for p in paths for pos in range(20)]
    df = spark.createDataFrame(rows, "p string, pos long")
    ranges = [(paths[0], 0, 3), (paths[1], 19, 19), (paths[2], 5, 9),
              (paths[2], 12, 12), (paths[4], 0, 0)]
    cond = _apply(spark, df, ranges, path_expr="p", pos_expr="pos")
    chain = _ranges_filter(F.col("p"), F.col("pos"), ranges)
    got = sorted(map(tuple, df.filter(cond).collect()))
    want = sorted(map(tuple, df.filter(chain).collect()))
    assert got == want
    assert len(got) == 4 + 1 + 5 + 1 + 1
    # un-deleted remainder is the complement
    assert df.filter(~cond).count() == len(rows) - len(got)


def test_pos_probe_run_boundaries_inclusive(spark, probe_ok):
    df = spark.createDataFrame(
        [("a", p) for p in range(10)] + [("zzz", p) for p in range(10)],
        "p string, pos long")
    ranges = [("a", 3, 5)]
    # single-file layouts build too (callers may gate on >=2 themselves)
    cond = _apply(spark, df, ranges, path_expr="p", pos_expr="pos")
    assert sorted(r.pos for r in df.filter(cond).collect()) == [3, 4, 5]
    # a file with no deletes never matches, whatever its sort position
    assert df.filter(cond).filter("p = 'zzz'").count() == 0


def test_pos_probe_path_lit_transform(spark, probe_ok):
    """URI-form columns probe against transformed literals (the
    file:-prefixed shape _metadata.file_path carries)."""
    df = spark.createDataFrame(
        [("file:/wh/data/x.parquet", p) for p in range(6)],
        "p string, pos long")
    cond = _apply(spark, df, [("/wh/data/x.parquet", 1, 2)],
                  path_lit=lambda fp: "file:" + fp,
                  path_expr="p", pos_expr="pos")
    assert df.filter(cond).count() == 2


def test_pos_probe_refusals(spark, probe_ok):
    # overlapping runs would break the binary-search contract: refuse
    assert jvm_probe.pos_covered_filter(
        spark, [("a", 0, 5), ("a", 3, 8)],
        path_expr="p", pos_expr="pos") is None
    # positions beyond the 40-bit encoding budget: refuse
    assert jvm_probe.pos_covered_filter(
        spark, [("a", 0, 1 << 41)],
        path_expr="p", pos_expr="pos") is None
    assert jvm_probe.pos_covered_filter(
        spark, [("a", -1, 2)],
        path_expr="p", pos_expr="pos") is None


def test_pos_probe_single_relation_no_union(catalog, spark, probe_ok):
    """Deletes touching a SUBSET of files still read as ONE relation:
    coveredFilePos answers false for clean files, so the scan keeps a
    single file-source (no clean/hit Union splitting the read into two
    task waves — measured at sf10: 53 -> 32 scan partitions, MoR pair
    562 -> 363 ms ~= the raw scan)."""
    from pyspark.sql import Row

    from iceberg_spark.expressions import col

    df = spark.createDataFrame(
        [Row(id=i, v=float(i)) for i in range(40)])
    t = catalog.create_table("probe.posclean", df.schema, properties={
        "write.delete.mode": "merge-on-read"})
    for lo in range(0, 40, 10):   # exactly 4 data files, 10 rows each
        t.append(spark.createDataFrame(
            [Row(id=i, v=float(i))
             for i in range(lo, lo + 10)]).coalesce(1))
    # deletes in two files only; files 3 and 4 stay clean
    for lo in (0, 10):
        t.delete_where((col("id") >= lo) & (col("id") < lo + 2),
                       mode="merge-on-read")
        t = t.refresh()
    got = sorted(r.id for r in t.to_df().collect())
    assert got == [i for i in range(40) if not (i % 10 < 2 and i < 20)]
    plan = t.to_df()._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert "Union" not in plan


def test_pos_probe_serves_inline_scan(catalog, spark, probe_ok):
    """End to end: a multi-file table with deletes in several files
    routes the inline hit branch through the cached probe and reads
    exactly the undeleted rows."""
    from pyspark.sql import Row

    from iceberg_spark import scan as S
    from iceberg_spark.expressions import col

    df = spark.createDataFrame(
        [Row(id=i, v=float(i)) for i in range(40)])
    t = catalog.create_table("probe.posmulti", df.schema, properties={
        "write.delete.mode": "merge-on-read"})
    for lo in range(0, 40, 10):   # exactly 4 data files, 10 rows each
        t.append(spark.createDataFrame(
            [Row(id=i, v=float(i))
             for i in range(lo, lo + 10)]).coalesce(1))
    for lo in range(0, 40, 10):  # deletes touching every file
        t.delete_where((col("id") >= lo) & (col("id") < lo + 2),
                       mode="merge-on-read")
        t = t.refresh()
    before = dict(S._POS_COVER_FILTER_CACHE)
    got = sorted(r.id for r in t.to_df().collect())
    assert got == [i for i in range(40) if i % 10 >= 2]
    added = {k: v for k, v in S._POS_COVER_FILTER_CACHE.items()
             if k not in before}
    if jvm_probe.available(spark):
        assert any(v is not None for v in added.values())
        # second scan reuses the cached Column (no rebuild)
        assert sorted(r.id for r in t.to_df().collect()) == got
        assert [k for k in S._POS_COVER_FILTER_CACHE
                if k not in before] == list(added)
