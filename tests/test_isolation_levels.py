"""Isolation levels for row-level operations
(write.{delete,update,merge}.isolation-level — reference SparkWriteConf +
MergingSnapshotProducer validation, default SERIALIZABLE):

A stale table handle plans an operation, another handle commits in
between, and the stale handle's commit re-validates against the
refreshed base — concurrent appends matching the filter abort under
serializable, concurrent deletes the operation would LOSE abort under
both levels, commuting/disjoint commits succeed."""

import pytest
from pyspark.sql import functions as F

from iceberg_spark.expressions import col
from iceberg_spark.table import Catalog
from iceberg_spark.writes import ValidationException


def _setup(spark, tmp_path, name, props=None):
    cat = Catalog(spark, str(tmp_path))
    df = spark.range(40).select(
        F.col("id"), (F.col("id") % 4).cast("int").alias("grp"))
    t = cat.create_table(name, df.schema, partition_by=["grp"],
                         properties=props)
    t.append(df)
    return cat, df


def test_serializable_delete_aborts_on_matching_concurrent_append(
        spark, tmp_path):
    cat, df = _setup(spark, tmp_path, "db.iso1")
    stale = cat.load_table("db.iso1")
    other = cat.load_table("db.iso1")
    # concurrent append with rows MATCHING the upcoming delete filter
    other.append(spark.createDataFrame([(3, 3)], df.schema))
    with pytest.raises(ValidationException, match="serializable"):
        stale.delete_where(col("id") < 10)
    # the table is untouched: 41 rows
    assert cat.load_table("db.iso1").to_df().count() == 41


def test_serializable_delete_ok_when_concurrent_append_disjoint(
        spark, tmp_path):
    cat, df = _setup(spark, tmp_path, "db.iso2")
    stale = cat.load_table("db.iso2")
    other = cat.load_table("db.iso2")
    # concurrent rows CANNOT match id < 10 (min/max bounds disjoint)
    other.append(spark.createDataFrame([(500, 0)], df.schema))
    stale.delete_where(col("id") < 10)
    got = cat.load_table("db.iso2").to_df()
    assert got.count() == 31  # 40 - 10 + 1
    assert got.filter(F.col("id") == 500).count() == 1


def test_snapshot_isolation_permits_concurrent_matching_append(
        spark, tmp_path):
    cat, df = _setup(spark, tmp_path, "db.iso3", props={
        "write.delete.isolation-level": "snapshot"})
    stale = cat.load_table("db.iso3")
    other = cat.load_table("db.iso3")
    other.append(spark.createDataFrame([(3, 3)], df.schema))
    stale.delete_where(col("id") < 10)
    got = cat.load_table("db.iso3").to_df()
    # snapshot isolation: the concurrently appended id=3 row SURVIVES
    # (the delete planned before it existed)
    assert got.count() == 31
    assert got.filter(F.col("id") == 3).count() == 1


def test_cow_delete_aborts_on_concurrent_mor_delete_same_files(
        spark, tmp_path):
    cat, df = _setup(spark, tmp_path, "db.iso4", props={
        "write.delete.isolation-level": "snapshot"})
    stale = cat.load_table("db.iso4")
    other = cat.load_table("db.iso4")
    # concurrent MoR delete adds pos-deletes on files the CoW rewrite
    # would replace -> the rewrite would resurrect those rows; must
    # abort even under snapshot isolation
    other.delete_where(col("id") == 20, mode="merge-on-read")
    with pytest.raises(ValidationException):
        stale.delete_where(col("id") == 24, mode="copy-on-write")
    # retried on a FRESH handle it succeeds and both deletes hold
    fresh = cat.load_table("db.iso4")
    fresh.delete_where(col("id") == 24, mode="copy-on-write")
    got = cat.load_table("db.iso4").to_df()
    assert got.count() == 38
    assert got.filter(F.col("id").isin(20, 24)).count() == 0


def test_concurrent_mor_deletes_commute(spark, tmp_path):
    cat, df = _setup(spark, tmp_path, "db.iso5", props={
        "write.delete.isolation-level": "snapshot"})
    stale = cat.load_table("db.iso5")
    other = cat.load_table("db.iso5")
    other.delete_where(col("id") == 20, mode="merge-on-read")
    # MoR + MoR commute: both delete sets apply, no abort
    stale.delete_where(col("id") == 24, mode="merge-on-read")
    got = cat.load_table("db.iso5").to_df()
    assert got.count() == 38
    assert got.filter(F.col("id").isin(20, 24)).count() == 0


def test_mor_update_aborts_on_concurrent_delete_of_updated_rows(
        spark, tmp_path):
    cat, df = _setup(spark, tmp_path, "db.iso6", props={
        "write.update.isolation-level": "snapshot",
        "write.delete.isolation-level": "snapshot"})
    stale = cat.load_table("db.iso6")
    other = cat.load_table("db.iso6")
    # concurrent delete of a row the update would re-insert -> the
    # update's new data file would resurrect it; abort
    other.delete_where(col("id") == 5, mode="merge-on-read")
    with pytest.raises(ValidationException):
        stale.update(col("id") < 10, {"id": "id + 1000"},
                     mode="merge-on-read")
    assert cat.load_table("db.iso6").to_df().count() == 39


def test_serializable_merge_aborts_on_any_concurrent_append(
        spark, tmp_path):
    cat, df = _setup(spark, tmp_path, "db.iso7")
    stale = cat.load_table("db.iso7")
    other = cat.load_table("db.iso7")
    other.append(spark.createDataFrame([(999, 1)], df.schema))
    src = spark.createDataFrame([(1, 1), (100, 1)], df.schema)
    with pytest.raises(ValidationException):
        (stale.merge(src, on=["id"]).when_matched_update()
         .when_not_matched_insert().execute())
    # fresh handle succeeds
    fresh = cat.load_table("db.iso7")
    (fresh.merge(src, on=["id"]).when_matched_update()
     .when_not_matched_insert().execute())
    assert cat.load_table("db.iso7").to_df().count() == 42


def test_compaction_aborts_on_concurrent_delete(spark, tmp_path):
    cat, df = _setup(spark, tmp_path, "db.iso9")
    stale = cat.load_table("db.iso9")
    other = cat.load_table("db.iso9")
    from iceberg_spark.maintenance import rewrite_data_files

    # concurrent MoR delete lands between the compaction plan handle's
    # load and its commit: the rewrite would re-add the deleted row
    other.delete_where(col("id") == 7, mode="merge-on-read")
    with pytest.raises(ValidationException):
        rewrite_data_files(stale, min_input_files=1)
    fresh = cat.load_table("db.iso9")
    rewrite_data_files(fresh, min_input_files=1)
    assert cat.load_table("db.iso9").to_df().count() == 39


def test_partial_progress_keeps_committed_batches_on_conflict(
        spark, tmp_path):
    """partial-progress blast radius: batch 1 commits; a concurrent MoR
    delete lands before batch 2; batch 2 aborts with ValidationException
    — batch 1's replace snapshot STANDS and the concurrent delete is
    never lost."""
    from iceberg_spark import maintenance as M

    cat = Catalog(spark, str(tmp_path))
    df = spark.range(40).select(
        F.col("id"), (F.col("id") % 2).cast("int").alias("grp"))
    t = cat.create_table("db.pp", df.schema, partition_by=["grp"])
    t.append(spark.createDataFrame([(i, i % 2) for i in range(40)],
                                   df.schema))
    t.append(spark.createDataFrame([(i + 100, i % 2) for i in range(40)],
                                   df.schema))
    t = cat.load_table("db.pp")
    n_before = len(t.snapshots())

    real = M._rewrite_commit
    state = {"n": 0}

    def hooked(*a, **kw):
        state["n"] += 1
        if state["n"] == 2:
            # concurrent MoR delete between batch commits (fresh handle:
            # it must itself see batch 1's replace)
            cat.load_table("db.pp").delete_where(
                col("id") == 101, mode="merge-on-read")
        return real(*a, **kw)

    M._rewrite_commit = hooked
    try:
        with pytest.raises(ValidationException):
            M.rewrite_data_files(t, partial_progress=True,
                                 partial_progress_max_commits=2,
                                 min_input_files=1)
    finally:
        M._rewrite_commit = real
    t = cat.load_table("db.pp")
    # batch 1's replace committed, the concurrent delete stands, batch 2
    # was rolled back by never committing
    ops = [s.operation for s in t.snapshots()[n_before:]]
    assert "replace" in ops
    got = t.to_df()
    assert got.count() == 79
    assert got.filter(F.col("id") == 101).count() == 0


def test_bad_isolation_level_rejected(spark, tmp_path):
    cat, df = _setup(spark, tmp_path, "db.iso8", props={
        "write.delete.isolation-level": "bogus"})
    t = cat.load_table("db.iso8")
    with pytest.raises(ValueError, match="isolation-level"):
        t.delete_where(col("id") < 5)
