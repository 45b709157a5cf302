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
