"""Runtime filtering (file-level DPP analog) and rewrite_table_path (DR)."""

import os
import shutil

from pyspark.sql import Row

from iceberg_spark.expressions import col
from iceberg_spark.maintenance import rewrite_table_path


def test_runtime_filter_prunes_files(catalog, spark):
    df = spark.createDataFrame(
        [Row(k=i // 10, v=float(i)) for i in range(100)])
    t = catalog.create_table("rt.fact", df.schema, partition_by=["k"])
    t.append(df)
    full = t.scan().plan_files()
    dim = spark.createDataFrame([Row(k=3)])
    pruned = t.scan().runtime_filter("k", dim.select("k")).plan_files()
    assert len(pruned.files) < len(full.files)
    assert {e.file.partition["k"] for e in pruned.files} == {3}
    # empty build side -> zero files
    assert t.scan().runtime_filter("k", []).plan_files().files == []


def test_rewrite_table_path(catalog, spark, tmp_path):
    df = spark.createDataFrame([Row(id=i, v=float(i)) for i in range(10)])
    t = catalog.create_table("dr.t", df.schema)
    t.append(df)
    t.append(spark.createDataFrame([Row(id=99, v=99.0)]))

    target = str(tmp_path / "dr_copy")
    res = rewrite_table_path(t, t.location, target)
    assert res["rewritten_manifests"] >= 1
    plan = res["data_files_to_copy"]
    assert plan and all(n.startswith(target) for _o, n in plan)

    # simulate the copy job, then the copied table must be fully readable
    for old, new in plan:
        os.makedirs(os.path.dirname(new), exist_ok=True)
        shutil.copy(old, new)
    from iceberg_spark.table import Table
    from iceberg_spark.metadata import TableOperations

    ops = TableOperations(target)
    t2 = Table(spark, target, ops.refresh(), "dr.copy")
    rows = sorted(r.id for r in t2.to_df().collect())
    assert rows == sorted([*range(10), 99])
    assert len(t2.snapshots()) == 2
    # time travel works on the copy
    first = t2.snapshots()[0].snapshot_id
    assert len(t2.scan(snapshot_id=first).df().collect()) == 10


def test_file_uri_equivalence_rules():
    """FileURI analog: file:-vs-plain, trailing slash, scheme/authority
    equivalence maps (DeleteOrphanFilesSparkAction.java:257-358)."""
    from iceberg_spark.maintenance import DEFAULT_EQUAL_SCHEMES, _file_uri

    eqs, eqa = dict(DEFAULT_EQUAL_SCHEMES), {}
    assert _file_uri("/a/b.parquet", eqs, eqa) == ("", "", "/a/b.parquet")
    assert _file_uri("file:///a/b.parquet", eqs, eqa) == ("", "", "/a/b.parquet")
    assert _file_uri("file:/a/b.parquet", eqs, eqa) == ("", "", "/a/b.parquet")
    assert _file_uri("/a/b/", eqs, eqa) == ("", "", "/a/b")
    # s3 family collapses to one scheme by default
    assert (_file_uri("s3a://bkt/k.parquet", eqs, eqa)
            == _file_uri("s3://bkt/k.parquet", eqs, eqa)
            == _file_uri("s3n://bkt/k.parquet", eqs, eqa))
    # authority equivalence is opt-in
    a1 = _file_uri("hdfs://nn1/x.parquet", eqs, eqa)
    a2 = _file_uri("hdfs://nn1:8020/x.parquet", eqs, eqa)
    assert a1 != a2
    a2m = _file_uri("hdfs://nn1:8020/x.parquet", eqs, {"nn1:8020": "nn1"})
    assert a1 == a2m


def test_orphan_prefix_mismatch_modes(catalog, spark, tmp_path, monkeypatch):
    """A listed file whose path matches a valid file but under a different
    scheme: error raises, ignore keeps, delete removes."""
    import os
    import time as _time

    import pytest
    from pyspark.sql import types as T

    from iceberg_spark import maintenance as M

    schema = T.StructType([T.StructField("id", T.LongType())])
    t = catalog.create_table("db.uriorph", schema)
    t.append(spark.createDataFrame([(1,), (2,)], schema))

    real = [e.file.file_path for e in t.scan().plan_files().files]
    # pretend the manifest references the file under s3; the local listing
    # sees the same path under plain fs -> path matches, scheme differs
    orig = M.read_manifest

    def fake_read_manifest(path, schema_, spec, **kw):
        from dataclasses import replace as _r
        return [
            _r(e, file=_r(e.file, file_path="s3://bkt" + e.file.file_path))
            for e in orig(path, schema_, spec, **kw)]

    monkeypatch.setattr(M, "read_manifest", fake_read_manifest)
    old = int((_time.time() + 3600) * 1000)  # everything is "old enough"
    with pytest.raises(ValueError, match="authority/scheme"):
        M.remove_orphan_files(t, older_than_ms=old, dry_run=True, mode="local")
    kept = M.remove_orphan_files(t, older_than_ms=old, dry_run=True,
                                 mode="local", prefix_mismatch_mode="ignore")
    assert not any(p in kept for p in real)
    dropped = M.remove_orphan_files(t, older_than_ms=old, dry_run=True,
                                    mode="local", prefix_mismatch_mode="delete")
    assert all(p in dropped for p in real)
