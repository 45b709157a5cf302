"""P4-P6: metadata tables, schema/partition evolution, maintenance,
incremental/CDC, streaming."""

import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_spark import col


def _simple(catalog, spark, name, n=100, files=4, **kw):
    schema = T.StructType([
        T.StructField("id", T.LongType()), T.StructField("v", T.StringType())
    ])
    t = catalog.create_table(name, schema, **kw)
    per = n // files
    for i in range(files):
        t.append(spark.createDataFrame(
            [(j, f"v{j}") for j in range(i * per, (i + 1) * per)], schema).coalesce(1))
    return t, schema


def test_metadata_tables(catalog, spark):
    t, _ = _simple(catalog, spark, "db.meta", 100, 4)
    assert t.metadata_table("snapshots").count() == 4
    assert t.metadata_table("history").count() == 4
    assert t.metadata_table("refs").count() == 1
    files = t.metadata_table("files")
    assert files.count() == 4
    assert t.metadata_table("data_files").count() == 4
    assert t.metadata_table("delete_files").count() == 0
    assert t.metadata_table("manifests").count() == 4
    assert t.metadata_table("all_manifests").count() >= 4
    assert t.metadata_table("entries").count() == 4
    parts = t.metadata_table("partitions").collect()
    assert parts[0].record_count == 100
    assert t.metadata_table("metadata_log_entries").count() >= 4
    assert t.metadata_table("position_deletes").count() == 0


def test_schema_evolution_add_rename_drop(catalog, spark):
    t, schema = _simple(catalog, spark, "db.evo", 20, 2)
    t.update_schema().add_column("score", "double").commit()
    df2 = spark.createDataFrame([(100, "x", 1.5), (101, "y", 2.5)],
                                T.StructType(list(schema.fields) + [
                                    T.StructField("score", T.DoubleType())]))
    t.append(df2)
    out = t.to_df()
    assert out.count() == 22
    assert out.filter(F.col("score").isNotNull()).count() == 2
    # rename keeps old files readable via field-id mapping
    t.update_schema().rename_column("v", "name").commit()
    out = t.to_df()
    assert "name" in out.columns and "v" not in out.columns
    assert out.filter(F.col("name") == "v0").count() == 1
    # type promotion int->long not needed (already long); test float->double via new col
    t.update_schema().drop_column("score").commit()
    assert "score" not in t.to_df().columns


def test_partition_evolution(catalog, spark):
    t, schema = _simple(catalog, spark, "db.pevo", 40, 2)
    t.update_spec().add_field("id", "bucket(4)").commit()
    t.append(spark.createDataFrame([(1000 + j, f"n{j}") for j in range(40)], schema))
    # both old (unpartitioned) and new (bucketed) files readable
    assert t.to_df().count() == 80
    scan = t.scan(filter=col("id") == 1005)
    assert scan.df().count() == 1
    rep = scan.explain_plan()
    assert rep["skipped_data_files"] > 0


def test_binpack_compaction(catalog, spark):
    t, _ = _simple(catalog, spark, "db.pack", 120, 6)
    before = t.scan().plan_files()
    assert len(before.files) == 6
    res = t.rewrite_data_files(strategy="binpack")
    assert res["rewritten_files"] == 6
    after = t.scan().plan_files()
    assert len(after.files) < 6
    assert t.to_df().count() == 120
    # sequence numbers preserved (replace op)
    assert t.current_snapshot().operation == "replace"


def test_compaction_applies_mor_deletes(catalog, spark):
    t, _ = _simple(catalog, spark, "db.packmor", 100, 4,
                   properties={"write.delete.mode": "merge-on-read"})
    t.delete_where(col("id") < 10)
    plan = t.scan().plan_files()
    assert plan.pos_deletes
    t.rewrite_data_files(strategy="binpack")
    plan2 = t.scan().plan_files()
    assert not plan2.pos_deletes  # deletes applied + dangling removed
    assert t.to_df().count() == 90


def test_delete_file_threshold_selective_compaction(catalog, spark):
    """delete-file-threshold (SizeBasedDataRewriter option): only files
    with attached deletes rewrite, instead of every group."""
    from iceberg_spark.maintenance import rewrite_data_files

    t, _ = _simple(catalog, spark, "db.packthr", 120, 6,
                   properties={"write.delete.mode": "merge-on-read"})
    before = {e.file.file_path for e in t.scan().plan_files().files}
    assert len(before) == 6
    # delete rows from exactly ONE file's id range
    ids = sorted(r["id"] for r in t.to_df().select("id").collect())
    t.delete_where(col("id").isin(ids[:3]))
    t = t.refresh()
    res = rewrite_data_files(t, delete_file_threshold=1,
                             min_input_files=1000)  # small-pack disabled
    t = t.refresh()
    after = {e.file.file_path for e in t.scan().plan_files().files}
    # only the delete-carrying file(s) were rewritten
    assert res["rewritten_files"] < 6
    assert len(before & after) >= 6 - res["rewritten_files"]
    assert not t.scan().plan_files().pos_deletes
    assert t.to_df().count() == 117


def test_partial_progress_compaction(catalog, spark):
    """partial-progress.enabled: groups commit independently — one
    replace snapshot per batch, bounded by max commits."""
    from iceberg_spark.maintenance import rewrite_data_files

    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("grp", T.IntegerType())])
    t = catalog.create_table("db.packpp", schema, partition_by=["grp"])
    rows = [(i, i % 4) for i in range(80)]
    t.append(spark.createDataFrame(rows[:40], schema))
    t.append(spark.createDataFrame(rows[40:], schema))
    t = t.refresh()
    n_before = len(t.snapshots())
    res = rewrite_data_files(t, partial_progress=True,
                             partial_progress_max_commits=2,
                             min_input_files=1)
    t = t.refresh()
    assert res["commits"] == 2
    assert len(t.snapshots()) == n_before + 2
    assert all(s.operation == "replace"
               for s in t.snapshots()[-2:])
    assert t.to_df().count() == 80
    assert sorted(r["id"] for r in t.to_df().collect()) == list(range(80))


def test_zorder_rewrite(catalog, spark):
    schema = T.StructType([
        T.StructField("x", T.LongType()), T.StructField("y", T.LongType()),
        T.StructField("v", T.DoubleType()),
    ])
    t = catalog.create_table("db.z", schema)
    rows = [(i % 50, (i * 7) % 50, float(i)) for i in range(2000)]
    t.append(spark.createDataFrame(rows, schema))
    t.rewrite_data_files(strategy="zorder", zorder_by=["x", "y"])
    assert t.to_df().count() == 2000
    assert t.to_df().agg(F.sum("v")).collect()[0][0] == sum(r[2] for r in rows)


def test_expire_snapshots(catalog, spark):
    t, _ = _simple(catalog, spark, "db.exp", 40, 4)
    assert len(t.snapshots()) == 4
    res = t.expire_snapshots(older_than_ms=int(time.time() * 1000) + 1000,
                             retain_last=1)
    assert res["expired_snapshots"] == 3
    t.refresh()
    assert len(t.snapshots()) == 1
    assert t.to_df().count() == 40  # current state intact


def test_remove_orphan_files(catalog, spark, tmp_path):
    t, _ = _simple(catalog, spark, "db.orph", 20, 2)
    import os

    orphan = os.path.join(t.location, "data", "orphan.parquet")
    with open(orphan, "wb") as f:
        f.write(b"junk")
    os.utime(orphan, (time.time() - 10 * 86400,) * 2)
    found = t.remove_orphan_files(older_than_ms=int((time.time() - 86400) * 1000))
    assert orphan in found
    assert not os.path.exists(orphan)
    assert t.to_df().count() == 20


def test_compute_stats(catalog, spark):
    t, _ = _simple(catalog, spark, "db.stats", 50, 2)
    stats = t.compute_table_stats()
    assert 45 <= stats["ndv"]["id"] <= 55
    from iceberg_spark.maintenance import compute_partition_stats

    # unpartitioned tables are rejected (PartitionStatsHandler.java:101)
    import pytest

    with pytest.raises(ValueError, match="must be partitioned"):
        compute_partition_stats(t)

    schema = T.StructType([
        T.StructField("id", T.LongType()), T.StructField("p", T.IntegerType())
    ])
    t = catalog.create_table("db.stats_part", schema, partition_by=["p"])
    t.append(spark.createDataFrame([(i, i % 5) for i in range(50)], schema))
    p = compute_partition_stats(t)
    import os

    assert os.path.exists(p)
    # the file carries the SPEC's partition-statistics schema
    # (format/spec.md:1233) as one parquet, unified partition struct first
    pdf = spark.read.parquet(p)
    assert pdf.columns == [
        "partition", "spec_id", "data_record_count", "data_file_count",
        "total_data_file_size_in_bytes", "position_delete_record_count",
        "position_delete_file_count", "dv_count",
        "equality_delete_record_count", "equality_delete_file_count",
        "total_record_count", "last_updated_at", "last_updated_snapshot_id"]
    rows = pdf.collect()
    assert sum(r.data_record_count for r in rows) == 50
    assert all(r.last_updated_snapshot_id is not None for r in rows)
    # metadata entry uses the spec field names
    e = t.refresh().metadata.partition_statistics_files[-1]
    assert e["statistics-path"] == p and e["file-size-in-bytes"] > 0


def test_incremental_append_scan(catalog, spark):
    t, schema = _simple(catalog, spark, "db.inc", 30, 3)
    snaps = [s.snapshot_id for s in t.snapshots()]
    df = t.incremental_scan(snaps[0], snaps[2])
    assert df.count() == 20  # snapshots 2 and 3


def test_changelog_insert_delete(catalog, spark):
    t, schema = _simple(catalog, spark, "db.cdc", 20, 2)
    s0 = t.snapshots()[-1].snapshot_id
    t.append(spark.createDataFrame([(100, "new")], schema))
    t.delete_where(col("id") == 5)
    ch = t.changes(from_snapshot_id=s0)
    rows = [(r.id, r._change_type) for r in ch.collect()]
    assert (100, "INSERT") in rows
    assert (5, "DELETE") in rows
    # carryover rows from the CoW rewrite must be suppressed
    assert len([r for r in rows if r[1] == "INSERT"]) == 1
    assert len([r for r in rows if r[1] == "DELETE"]) == 1


def test_changelog_compute_updates(catalog, spark):
    t, schema = _simple(catalog, spark, "db.cdcu", 10, 1)
    s0 = t.snapshots()[-1].snapshot_id
    t.update(col("id") == 3, {"v": F.lit("updated")})
    from iceberg_spark.changelog import changelog_df

    ch = changelog_df(t, from_snapshot_id=s0, compute_updates=True,
                      remove_carryovers=True, identifier_columns=["id"])
    ch = ch.collect()
    types = {(r.id, r._change_type, r.v) for r in ch}
    assert (3, "UPDATE_BEFORE", "v3") in types
    assert (3, "UPDATE_AFTER", "updated") in types


def test_streaming_source_and_sink(catalog, spark, tmp_path):
    t, schema = _simple(catalog, spark, "db.src", 20, 2)
    sink = catalog.create_table("db.sink", schema)

    from iceberg_spark.streaming import MicroBatchStream, append_sink

    stream = MicroBatchStream(t, str(tmp_path / "ckpt"), from_snapshot_id=None)
    # nothing pending at start (offset = current)
    assert stream.process_available(append_sink(sink, "q1")) == 0
    t.append(spark.createDataFrame([(200, "a")], schema))
    t.append(spark.createDataFrame([(201, "b")], schema))
    n = stream.process_available(append_sink(sink, "q1"))
    assert n == 2
    assert sink.refresh().to_df().count() == 2
    # idempotent: re-running same epochs is a no-op
    stream2 = MicroBatchStream(t, str(tmp_path / "ckpt2"),
                               from_snapshot_id=t.snapshots()[-3].snapshot_id)
    stream2.process_available(append_sink(sink, "q1"))
    assert sink.refresh().to_df().count() == 2


def test_streaming_upsert_sink(catalog, spark, tmp_path):
    schema = T.StructType([
        T.StructField("id", T.LongType()), T.StructField("v", T.StringType())
    ])
    tgt = catalog.create_table("db.upsert_tgt", schema)
    tgt.append(spark.createDataFrame([(1, "old"), (2, "old")], schema))
    from iceberg_spark.streaming import upsert_sink

    fn = upsert_sink(tgt, keys=["id"], query_id="u1")
    fn(spark.createDataFrame([(2, "new"), (3, "new")], schema), 1)
    rows = {(r.id, r.v) for r in tgt.refresh().to_df().collect()}
    assert rows == {(1, "old"), (2, "new"), (3, "new")}
    fn(spark.createDataFrame([(2, "dup")], schema), 1)  # same epoch -> skipped
    rows = {(r.id, r.v) for r in tgt.refresh().to_df().collect()}
    assert rows == {(1, "old"), (2, "new"), (3, "new")}


def test_changelog_net_carryover(catalog, spark):
    """RemoveNetCarryoverIterator semantics: delete in one snapshot +
    identical re-insert in a later snapshot cancel across the range."""
    t, schema = _simple(catalog, spark, "db.cdcnet", 10, 1)
    s0 = t.snapshots()[-1].snapshot_id
    t.delete_where(col("id") == 4)
    t.append(spark.createDataFrame([(4, "v4")], schema))  # identical re-insert
    t.append(spark.createDataFrame([(200, "brand-new")], schema))

    # per-commit view: both the DELETE and the re-INSERT are visible
    per_commit = [(r.id, r._change_type)
                  for r in t.changes(from_snapshot_id=s0).collect()]
    assert (4, "DELETE") in per_commit and (4, "INSERT") in per_commit

    # net view: they cancel; only the genuinely new row remains
    net = [(r.id, r._change_type)
           for r in t.changes(from_snapshot_id=s0, net_changes=True).collect()]
    assert net == [(200, "INSERT")]


def test_add_files_partitioned_hive_layout(catalog, spark, tmp_path):
    """add_files into a PARTITIONED table: partition tuples parse from
    hive-style name=value path segments (TableMigrationUtil analog) and
    partition pruning works immediately; unparseable layouts error."""
    src = str(tmp_path / "hive_src")
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(30)], "id long, p int, v double")
    df.write.partitionBy("p").parquet(src)

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("v", T.DoubleType()),
        T.StructField("p", T.IntegerType()),
    ])
    t = catalog.create_table("db.hiveadd", schema, partition_by=["p"])
    t.add_files(src)
    got = sorted((r.id, r.p) for r in t.to_df().collect())
    assert got == [(i, i % 3) for i in range(30)]
    pruned = t.scan(filter=col("p") == 1).plan_files()
    assert 0 < len(pruned.files) < len(t.scan().plan_files().files)
    assert all(e.file.partition == {"p": 1} for e in pruned.files)

    # a file with no parseable partition segment fails loudly
    flat = str(tmp_path / "flat")
    df.drop("p").coalesce(1).write.parquet(flat)
    import os

    f = [os.path.join(flat, x) for x in os.listdir(flat)
         if x.endswith(".parquet")]
    with pytest.raises(ValueError, match="cannot derive partition"):
        t.add_files(f)


def test_position_deletes_table_names_delete_file(catalog, spark):
    """position_deletes exposes delete_file_path (PositionDeletesTable
    DELETE_FILE_PATH) for both parquet pos-deletes and Puffin DVs."""
    t, _ = _simple(catalog, spark, "db.pdmeta", 20, 2,
                   properties={"write.delete.mode": "merge-on-read"})
    t.delete_where(col("id").isin(1, 11))
    rows = t.metadata_table("position_deletes").collect()
    assert len(rows) == 2
    assert all(r.delete_file_path and r.delete_file_path.endswith(".parquet")
               for r in rows)
    from iceberg_spark.maintenance import rewrite_position_delete_files

    rewrite_position_delete_files(t, to_dvs=True)
    t = t.refresh()
    rows = t.metadata_table("position_deletes").collect()
    assert len(rows) == 2
    assert all(r.delete_file_path.endswith(".puffin") for r in rows)


def test_identity_constant_fill_survives_spec_evolution(catalog, spark, tmp_path):
    """Hive-imported files (identity column physically absent) still read
    the metadata constant after the partition spec evolves."""
    src = str(tmp_path / "hive_evo")
    df = spark.createDataFrame(
        [(i, i % 2, float(i)) for i in range(20)], "id long, p int, v double")
    df.write.partitionBy("p").parquet(src)
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("v", T.DoubleType()),
        T.StructField("p", T.IntegerType()),
    ])
    t = catalog.create_table("db.hive_evo", schema, partition_by=["p"])
    t.add_files(src)
    t.update_spec().add_field("id", "bucket(4)").commit()
    t = t.refresh()
    # new spec files physically store everything; old imported files fill p
    t.append(spark.createDataFrame([(100, 5.0, 9)], schema))
    got = sorted((r.id, r.p) for r in t.to_df().collect())
    assert got == [(i, i % 2) for i in range(20)] + [(100, 9)]
    pruned = t.scan(filter=col("p") == 1).df().collect()
    assert sorted(r.id for r in pruned) == [i for i in range(20) if i % 2 == 1]


def test_streaming_rejects_row_changing_snapshots(catalog, spark, tmp_path):
    """SparkMicroBatchStream shouldProcess contract: a stream over a
    delete/overwrite snapshot errors by default and skips it only under
    the streaming-skip-* options."""
    import pytest
    from pyspark.sql import functions as F

    from iceberg_spark.expressions import col
    from iceberg_spark.streaming.micro_batch import MicroBatchStream

    df = spark.range(0, 30).select("id", (F.col("id") % 3).alias("grp"))
    t = catalog.create_table("db.stream_ow", df.schema)
    first = t.append(df).snapshot_id
    t = t.refresh()
    t.delete_where(col("id") < 5)  # CoW -> overwrite snapshot
    t = t.refresh()
    t.append(spark.range(30, 40).select(
        "id", (F.col("id") % 3).alias("grp")))
    t = t.refresh()

    ms = MicroBatchStream(t, str(tmp_path / "cp1"),
                          from_snapshot_id=first)
    with pytest.raises(ValueError, match="delete snapshot"):
        ms.process_available(lambda df, e: None)

    got = []
    ms2 = MicroBatchStream(t, str(tmp_path / "cp2"),
                           from_snapshot_id=first,
                           skip_delete_snapshots=True)
    ms2.process_available(lambda df, e: got.extend(df.collect()))
    assert sorted(r["id"] for r in got) == list(range(30, 40))


def test_incremental_partition_stats(catalog, spark):
    """PartitionStatsHandler.java:65-109: the second stats compute on an
    append-only table reads ONLY the manifests added since the previous
    stats snapshot (plan-report assertion) and the merged file is
    row-identical to a full recompute; a non-append snapshot in between
    falls back to full."""
    from iceberg_spark.expressions import col
    from iceberg_spark.maintenance import compute_partition_stats

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("p", T.IntegerType())])
    t = catalog.create_table("db.pstats_inc", schema, partition_by=["p"])
    t.append(spark.createDataFrame([(i, i % 3) for i in range(30)], schema))
    compute_partition_stats(t)
    t = t.refresh()
    assert t.last_partition_stats_report["mode"] == "full"

    t.append(spark.createDataFrame(
        [(i, i % 3) for i in range(30, 60)], schema))
    t = t.refresh()
    new_snap = t.metadata.current_snapshot()
    new_mf = [mf.path for mf in
              __import__("iceberg_spark.metadata_df",
                         fromlist=["unique_manifests"])
              .unique_manifests([new_snap])
              if mf.added_snapshot_id == new_snap.snapshot_id]
    p_inc = compute_partition_stats(t)
    rep = t.last_partition_stats_report
    assert rep["mode"] == "incremental"
    assert sorted(rep["manifests_read"]) == sorted(new_mf)  # only new

    p_full = compute_partition_stats(t.refresh(), incremental=False)
    a = sorted(map(str, spark.read.parquet(p_inc).collect()))
    b = sorted(map(str, spark.read.parquet(p_full).collect()))
    assert a == b and len(a) == 3  # identical to the full recompute

    # a DELETE between stats computes -> merge is unsound -> full
    t = t.refresh()
    t.delete_where(col("id") < 5)
    t = t.refresh()
    compute_partition_stats(t)
    assert t.last_partition_stats_report["mode"] == "full"


def test_files_table_readable_metrics(catalog, spark):
    """readable_metrics (core/.../MetricsUtil.java READABLE_METRICS):
    per-column struct with reference key names, bounds in the column's
    type, NaN-free bounds, per-column compressed byte sizes."""
    import json

    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("x", T.DoubleType())])
    t = catalog.create_table("db.readable", schema)
    t.append(spark.createDataFrame(
        [(1, 1.5), (2, float("nan")), (3, None)], schema).coalesce(1))
    rm = json.loads(t.metadata_table("files")
                    .select("readable_metrics").collect()[0][0])
    assert rm["id"]["column_size"] > 0
    assert {k: rm["id"][k] for k in ("value_count", "null_value_count",
                                     "nan_value_count", "lower_bound",
                                     "upper_bound")} == {
        "value_count": 3, "null_value_count": 0, "nan_value_count": None,
        "lower_bound": 1, "upper_bound": 3}
    assert rm["x"]["nan_value_count"] == 1
    assert rm["x"]["null_value_count"] == 1
    assert rm["x"]["lower_bound"] == 1.5 and rm["x"]["upper_bound"] == 1.5
    # the column exists on every files-family table
    for name in ("data_files", "delete_files", "entries", "all_files"):
        cols = t.metadata_table(name).columns
        if name != "entries":  # entries exposes data_file struct fields
            assert "readable_metrics" in cols


def test_snapshot_partition_summaries(catalog, spark):
    """write.summary.partition-limit (SnapshotSummary.java:58-59,203):
    per-partition change metrics land in the summary while the changed
    count is within the limit; over the limit only
    changed-partition-count remains."""
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("grp", T.IntegerType())])
    t = catalog.create_table("db.psumm", schema, partition_by=["grp"],
                             properties={
                                 "write.summary.partition-limit": "3"})
    t.append(spark.createDataFrame(
        [(i, i % 2) for i in range(10)], schema))
    s = t.current_snapshot().summary
    assert s["changed-partition-count"] == "2"
    assert s["partition-summaries-included"] == "true"
    assert "added-data-files=" in s["partitions.grp=0"]
    assert "added-records=5" in s["partitions.grp=1"]
    # exceed the limit: summaries excluded, count kept
    t.append(spark.createDataFrame(
        [(i, i % 5) for i in range(10)], schema))
    s2 = t.current_snapshot().summary
    assert s2["changed-partition-count"] == "5"
    assert "partition-summaries-included" not in s2
    assert not any(k.startswith("partitions.") for k in s2)


def test_snapshot_total_summary_fields(catalog, spark):
    """total-data-files / total-delete-files / total-records
    (SnapshotSummary.java:34-55) are exact at every commit, computed
    from the final manifest list's live counts."""
    t, _ = _simple(catalog, spark, "db.totals", 40, 2,
                   properties={"write.delete.mode": "merge-on-read"})
    s = t.current_snapshot().summary
    assert s["total-data-files"] == "2"
    assert s["total-records"] == "40"
    assert s["total-delete-files"] == "0"
    t.delete_where(col("id") == 1)
    t = t.refresh()
    s = t.current_snapshot().summary
    assert s["total-data-files"] == "2"  # MoR: data rows untouched
    assert s["total-records"] == "40"
    assert s["total-delete-files"] == "1"
    t.rewrite_data_files(strategy="binpack", min_input_files=1)
    t = t.refresh()
    s = t.current_snapshot().summary
    assert s["total-records"] == "39"  # compaction applied the delete
    assert s["total-delete-files"] == "0"


def test_column_requiredness_evolution(catalog, spark):
    """makeColumnOptional always safe; requireColumn refuses without
    allow_incompatible_changes (SchemaUpdate.java)."""
    import pytest as _pt

    schema = T.StructType([
        T.StructField("id", T.LongType(), nullable=False),
        T.StructField("v", T.StringType())])
    t = catalog.create_table("db.reqevo", schema)
    assert t.schema.find_field("id").required
    t.update_schema().make_column_optional("id").commit()
    t = t.refresh()
    assert not t.schema.find_field("id").required
    with _pt.raises(ValueError, match="required"):
        t.update_schema().require_column("id").commit()
    t.update_schema().require_column(
        "id", allow_incompatible_changes=True).commit()
    t = t.refresh()
    assert t.schema.find_field("id").required
    # SQL surface
    from iceberg_spark.sql import SqlEngine

    eng = SqlEngine(spark, catalog)
    eng.sql("ALTER TABLE db.reqevo ALTER COLUMN id DROP NOT NULL")
    assert not catalog.load_table("db.reqevo").schema.find_field("id").required
    with _pt.raises(ValueError, match="SET NOT NULL"):
        eng.sql("ALTER TABLE db.reqevo ALTER COLUMN id SET NOT NULL")
