"""Deletion vectors (v3, format/spec.md:1372) + plan-time delete pruning."""

from pyspark.sql import Row

from iceberg_spark.expressions import col
from iceberg_spark.maintenance import rewrite_position_delete_files


def _seed(catalog, spark, parts=3, rows=10):
    df = spark.createDataFrame(
        [Row(id=i, p=i % parts, v=float(i)) for i in range(rows)])
    t = catalog.create_table(
        "dv.t", df.schema, partition_by=["p"],
        properties={"write.delete.mode": "merge-on-read"})
    t.append(df)
    return t


def test_dv_conversion(catalog, spark):
    t = _seed(catalog, spark)
    t.delete_where(col("id").isin(0, 1, 2), mode="merge-on-read")
    t.delete_where(col("id") == 4, mode="merge-on-read")
    before = sorted(r.id for r in t.to_df().collect())

    res = rewrite_position_delete_files(t, to_dvs=True)
    assert res["rewritten"] >= 1 and res["added"] >= 1

    t = catalog.load_table("dv.t")
    plan = t.scan().plan_files()
    # every delete blob references exactly one data file
    assert all(d.file.referenced_data_file for d in plan.pos_deletes)
    refs = [d.file.referenced_data_file for d in plan.pos_deletes]
    assert len(refs) == len(set(refs))  # one DV per data file
    assert sorted(r.id for r in t.to_df().collect()) == before


def test_dv_pruning_skips_unrelated_deletes(catalog, spark):
    t = _seed(catalog, spark)
    # delete rows only in partition 0
    t.delete_where((col("p") == 0) & (col("id") >= 6), mode="merge-on-read")
    rewrite_position_delete_files(t, to_dvs=True)
    t = catalog.load_table("dv.t")
    # scanning partition 1 must attach zero delete files
    plan = t.scan(filter=col("p") == 1).plan_files()
    assert plan.report.result_delete_files == 0
    # scanning partition 0 attaches its DV(s)
    plan0 = t.scan(filter=col("p") == 0).plan_files()
    assert len(plan0.pos_deletes) >= 1
    rows = t.scan(filter=col("p") == 0).df().collect()
    assert sorted(r.id for r in rows) == [0, 3]
