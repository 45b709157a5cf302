"""delete_reachable_files: full-reachability purge from table metadata
(DeleteReachableFilesSparkAction analog) — dry-run lists the closure from
every snapshot (not just the live one); purge leaves zero reachable files."""

import os

import pytest
from pyspark.sql import functions as F

from iceberg_spark.expressions import col
from iceberg_spark.maintenance import delete_reachable_files


@pytest.fixture()
def history_table(catalog, spark):
    df = spark.range(0, 200).select("id", (F.col("id") % 3).alias("g"))
    t = catalog.create_table(
        "purge_t", df.schema,
        properties={"write.delete.mode": "merge-on-read"})
    t.append(df.filter(F.col("id") < 100))
    t.append(df.filter(F.col("id") >= 100))
    t.delete_where(col("id").isin(list(range(0, 200, 10))),
                   mode="merge-on-read")
    return t


def test_dry_run_lists_full_closure(history_table):
    t = history_table
    res = delete_reachable_files(t, dry_run=True)
    assert res["deleted_files_total"] == 0
    # 2 appends + 1 MoR delete -> 3 snapshots, 3 manifest lists
    assert res["deleted_manifest_lists_count"] == 3
    assert res["deleted_data_files_count"] > 0
    assert res["deleted_position_delete_files_count"] > 0
    paths = res["paths"]
    # closure includes all metadata.json versions and every listed path exists
    assert any(p.endswith(".json") for p in paths)
    for p in paths:
        assert os.path.exists(p), p
    # dry run deleted nothing
    assert t.to_df().count() == 180


def test_purge_deletes_everything(history_table):
    t = history_table
    listed = delete_reachable_files(t, dry_run=True)["paths"]
    res = delete_reachable_files(t)
    assert res["deleted_files_total"] == len(listed)
    for p in listed:
        assert not os.path.exists(p), p
    # everything still on disk is either a committer marker or an
    # unreferenced orphan (never reachable — orphan cleanup's job, exactly
    # as in the reference action)
    import pyarrow.parquet as pq

    remaining = [os.path.join(r, f)
                 for r, _d, fs in os.walk(t.location) for f in fs
                 if f != "_SUCCESS" and not f.startswith(".")]
    for p in remaining:
        assert p.endswith(".parquet") and pq.read_metadata(p).num_rows == 0, p
