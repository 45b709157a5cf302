"""Oracle-checked workloads for table-lifecycle operators.

Round-1 VERDICT marked most write-path / maintenance / metadata operators
"untested" (pytest-only).  Each query here drives one of those operators
end-to-end through the engine (build table -> mutate via the operator ->
scan) and returns a DataFrame whose content a DuckDB oracle can reproduce
from the raw parquet views — so the driver's correctness gate covers the
operator, not just the pytest suite.

Covered (SURVEY §2 ids): A5 orc/avro, B2 merge-append, B4 replace-partitions,
B8/L6 rewrite-manifests, B9/L7 expire, B10 branch/rollback/cherrypick,
B11 schema evolution, B12 spec evolution, B14 transaction, D7 metadata
tables, G2/L10 partition+table stats, Kb2 changelog, L1 binpack, L3 zorder,
L4 pos-delete->DV rewrite, L8 orphan files, L12 rewrite-table-path,
J1/J2 views, K1/K2 streaming source+sink, M1 CALL procedures.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from . import expressions as E
from .expressions import col
from .sources.testdata import load_table
from .workloads import _STATE, _sf_key, _warehouse, _ensure_conf


def _fresh(spark, sf_dir, src_name, tag, partition_by=None, properties=None,
           filter_df=None):
    """Create a one-off engine table from a testdata table (always via
    append so write-path knobs like format/manifest-merge apply)."""
    cat = _warehouse(spark)
    ident = f"{tag}_{_sf_key(sf_dir)}"
    if cat.table_exists(ident):
        cat.drop_table(ident)
    df = load_table(spark, sf_dir, src_name)
    if filter_df is not None:
        df = filter_df(df)
    t = cat.create_table(ident, df.schema, partition_by=partition_by,
                         properties=properties)
    return t, df


# ---------------------------------------------------------------------------
# A5 — ORC / Avro file formats through the table layer
# ---------------------------------------------------------------------------


def orc_roundtrip_scan(spark, sf_dir):
    """Write supplier as ORC data files, read back through the scan path
    (reference: Spark's native ORC read; SURVEY A5)."""
    key = ("orc_rt", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        t, df = _fresh(spark, sf_dir, "supplier", "orcrt",
                       properties={"write.format.default": "orc"})
        t.append(df)
        assert all(e.file.file_format == "orc"
                   for e in t.new_scan().plan_files().files), \
            "expected ORC data files"
        _STATE[key] = t.identifier
    t = _warehouse(spark).load_table(_STATE[key])
    return (t.to_df().groupBy("s_nationkey")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("s_acctbal"), 2).alias("bal"))
            .orderBy("s_nationkey"))


ORC_RT_SQL = """
SELECT s_nationkey, COUNT(*) AS n, ROUND(SUM(s_acctbal), 2) AS bal
FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey
"""


def hive_add_files_scan(spark, sf_dir):
    """add_files into a PARTITIONED table from an external hive-layout
    directory (TableMigrationUtil analog): partition tuples parse from
    name=value segments, the physically-absent identity partition column
    reads as a per-file metadata constant, and partition pruning works."""
    key = ("hiveadd", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        cat = _warehouse(spark)
        ident = f"hiveadd_{_sf_key(sf_dir)}"
        if cat.table_exists(ident):
            cat.drop_table(ident)
        df = load_table(spark, sf_dir, "orders")
        src = tempfile.mkdtemp(prefix="hive_src_")
        df.write.partitionBy("o_orderpriority").parquet(src + "/t")
        t = cat.create_table(ident, df.schema,
                             partition_by=["o_orderpriority"],
                             properties={"gc.enabled": "false"})
        t.add_files(src + "/t")
        n_part = len(t.scan(
            filter=col("o_orderpriority") == "1-URGENT").plan_files().files)
        n_all = len(t.scan().plan_files().files)
        assert 0 < n_part < n_all, "partition pruning must engage"
        _STATE[key] = t.identifier
    t = _warehouse(spark).load_table(_STATE[key])
    return (t.to_df().groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("o_totalprice"), 2).alias("total"))
            .orderBy("o_orderpriority"))


HIVE_ADD_SQL = """
SELECT o_orderpriority, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def avro_roundtrip_scan(spark, sf_dir):
    """Write nation as Avro data files, read back (SURVEY A5). Falls back
    to ORC when spark-avro is not on the classpath (it is optional since
    Spark 2.4) — the engine's format plumbing is identical either way."""
    key = ("avro_rt", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        fmt = "avro"
        try:
            import tempfile as _tf

            d = _tf.mkdtemp(prefix="avro_probe_")
            spark.createDataFrame([(1,)], "x int").write.format("avro") \
                .mode("overwrite").save(os.path.join(d, "t"))
        except Exception:
            fmt = "orc"
        t, df = _fresh(spark, sf_dir, "nation", "avrort",
                       properties={"write.format.default": fmt})
        t.append(df)
        _STATE[key] = t.identifier
    t = _warehouse(spark).load_table(_STATE[key])
    return (t.to_df().select("n_nationkey", "n_name", "n_regionkey")
            .orderBy("n_nationkey"))


AVRO_RT_SQL = """
SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey
"""


# ---------------------------------------------------------------------------
# B2 — MergeAppend: small appends with manifest merging enabled
# ---------------------------------------------------------------------------


def merge_append_scan(spark, sf_dir):
    """Five small appends under commit.manifest-merge; manifests must
    actually merge (reference core/.../MergeAppend.java + MergingSnapshotProducer)."""
    key = ("mrgapp", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        t, df = _fresh(spark, sf_dir, "supplier", "mrgapp", properties={
            "commit.manifest-merge.enabled": "true",
            "commit.manifest.min-count-to-merge": "2",
        })
        for i in range(5):
            t.append(df.filter(F.col("s_suppkey") % 5 == i))
        from .manifests import read_manifest_list
        n_manifests = len(read_manifest_list(t.current_snapshot().manifest_list))
        assert n_manifests < 5, f"manifests not merged: {n_manifests}"
        _STATE[key] = t.identifier
    t = _warehouse(spark).load_table(_STATE[key])
    return t.to_df().agg(F.count(F.lit(1)).alias("n"),
                         F.round(F.sum("s_acctbal"), 2).alias("bal"))


MERGE_APPEND_SQL = """
SELECT COUNT(*) AS n, ROUND(SUM(s_acctbal), 2) AS bal FROM supplier
"""


# ---------------------------------------------------------------------------
# B4 — ReplacePartitions (dynamic partition overwrite)
# ---------------------------------------------------------------------------


def dynamic_overwrite_scan(spark, sf_dir):
    """INSERT OVERWRITE dynamic mode: only partitions present in the new
    data are replaced (reference core/.../BaseReplacePartitions.java)."""
    key = ("dynov", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        t, df = _fresh(spark, sf_dir, "customer", "dynov",
                       partition_by=["c_mktsegment"])
        t.append(df)
        repl = (df.filter(F.col("c_mktsegment") == "BUILDING")
                  .withColumn("c_acctbal", F.round(F.col("c_acctbal") * 2, 2)))
        t.dynamic_partition_overwrite(repl)
        _STATE[key] = t.identifier
    t = _warehouse(spark).load_table(_STATE[key])
    return (t.to_df().groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("c_acctbal"), 2).alias("bal"))
            .orderBy("c_mktsegment"))


DYN_OVERWRITE_SQL = """
SELECT c_mktsegment, COUNT(*) AS n,
       ROUND(SUM(CASE WHEN c_mktsegment = 'BUILDING'
                      THEN ROUND(c_acctbal * 2, 2) ELSE c_acctbal END), 2) AS bal
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# B11 — schema evolution: rename + add, scan across old and new files
# ---------------------------------------------------------------------------


def schema_evolution_scan(spark, sf_dir):
    """Rename a column and add one, then append post-evolution rows; the
    scan must field-ID-map old files (rename visible, new column NULL)
    (reference core/.../SchemaUpdate.java)."""
    key = ("schevo", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        t, df = _fresh(spark, sf_dir, "nation", "schevo")
        t.append(df)
        t.update_schema().rename_column("n_name", "n_label") \
            .add_column("n_code", "int").commit()
        extra = (df.withColumn("n_nationkey", F.col("n_nationkey") + 100)
                   .withColumnRenamed("n_name", "n_label")
                   .withColumn("n_code", F.col("n_nationkey").cast("int")))
        t.append(extra)
        _STATE[key] = t.identifier
    t = _warehouse(spark).load_table(_STATE[key])
    return (t.to_df()
            .select("n_nationkey", "n_label", "n_regionkey",
                    # old files must surface NULL for the added column;
                    # COALESCE to -1 keeps the compare total-orderable
                    F.coalesce("n_code", F.lit(-1)).alias("n_code"))
            .orderBy("n_nationkey"))


SCHEMA_EVO_SQL = """
SELECT n_nationkey, n_name AS n_label, n_regionkey, -1 AS n_code
FROM nation
UNION ALL
SELECT n_nationkey + 100 AS n_nationkey, n_name AS n_label, n_regionkey,
       CAST(n_nationkey + 100 AS INTEGER) AS n_code
FROM nation
ORDER BY n_nationkey
"""


# ---------------------------------------------------------------------------
# B12 — partition spec evolution: files under two specs in one scan
# ---------------------------------------------------------------------------


def spec_evolution_scan(spark, sf_dir):
    """Half the data lands unpartitioned (spec 0), the spec evolves to
    months(o_orderdate), the rest lands partitioned; a date-filtered scan
    must prune the new files and re-filter the old
    (reference core/.../TableMetadata.java spec handling). Month grain:
    7 years of orders under days() fans one small append into ~2,300
    single-day files — the small-files storm a real table would avoid by
    exactly this granularity choice."""
    key = ("specevo", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        t, df = _fresh(spark, sf_dir, "orders", "specevo")
        t.append(df.filter(F.col("o_orderkey") % 2 == 0))
        t.update_spec().add_field("o_orderdate", "month").commit()
        t.append(df.filter(F.col("o_orderkey") % 2 == 1))
        _STATE[key] = t.identifier
    t = _warehouse(spark).load_table(_STATE[key])
    return (t.scan(filter=col("o_orderdate") >= "1997-01-01").df()
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("o_totalprice"), 2).alias("total"))
            .orderBy("o_orderpriority"))


SPEC_EVO_SQL = """
SELECT o_orderpriority, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
FROM orders WHERE o_orderdate >= DATE '1997-01-01'
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# B10 — branches, rollback, cherry-pick
# ---------------------------------------------------------------------------


def branch_write_scan(spark, sf_dir):
    """Write to a branch without touching main; read both refs
    (reference core/.../SnapshotManager.java)."""
    key = ("branch", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        t, df = _fresh(spark, sf_dir, "orders", "branch")
        t.append(df.filter(F.col("o_orderkey") % 2 == 0))
        t.manage_snapshots().create_branch("audit")
        t.append(df.filter(F.col("o_orderkey") % 2 == 1), branch="audit")
        _STATE[key] = t.identifier
    t = _warehouse(spark).load_table(_STATE[key])
    main_df = t.to_df().agg(F.count(F.lit(1)).alias("main_n"))
    branch_df = t.scan(ref="audit").df().agg(F.count(F.lit(1)).alias("branch_n"))
    return main_df.crossJoin(branch_df)


BRANCH_SQL = """
SELECT (SELECT COUNT(*) FROM orders WHERE o_orderkey % 2 = 0) AS main_n,
       (SELECT COUNT(*) FROM orders) AS branch_n
"""


def rollback_cherrypick_scan(spark, sf_dir):
    """Roll main back past an append, then cherry-pick the orphaned
    snapshot forward again — content must equal both appends
    (reference core/.../CherryPickOperation.java)."""
    key = ("cherry", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        t, df = _fresh(spark, sf_dir, "customer", "cherry")
        t.append(df.filter(F.col("c_custkey") % 2 == 0))
        s1 = t.current_snapshot().snapshot_id
        t.append(df.filter(F.col("c_custkey") % 2 == 1))
        s2 = t.current_snapshot().snapshot_id
        t.manage_snapshots().rollback_to(s1)
        assert t.to_df().count() == df.filter(F.col("c_custkey") % 2 == 0).count()
        t.manage_snapshots().cherrypick(s2)
        _STATE[key] = t.identifier
    t = _warehouse(spark).load_table(_STATE[key])
    return t.to_df().agg(F.count(F.lit(1)).alias("n"),
                         F.round(F.sum("c_acctbal"), 2).alias("bal"))


CHERRYPICK_SQL = """
SELECT COUNT(*) AS n, ROUND(SUM(c_acctbal), 2) AS bal FROM customer
"""


# ---------------------------------------------------------------------------
# Kb2 — changelog scan aggregated by change type
# ---------------------------------------------------------------------------


def changelog_agg_scan(spark, sf_dir):
    """CDC rows across append/delete/append commits, counted per change
    type (reference core/.../BaseIncrementalChangelogScan.java)."""
    key = ("cdcagg", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        t, df = _fresh(spark, sf_dir, "orders", "cdcagg",
                       properties={"write.delete.mode": "merge-on-read"})
        thr = df.agg(F.max("o_orderkey")).collect()[0][0] // 10
        t.append(df.filter(F.col("o_orderkey") % 2 == 0))
        t.delete_where(col("o_orderkey") <= thr, mode="merge-on-read")
        t.append(df.filter(F.col("o_orderkey") % 2 == 1))
        _STATE[key] = t.identifier
    t = _warehouse(spark).load_table(_STATE[key])
    ch = t.changes()
    return (ch.groupBy("_change_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("o_totalprice"), 2).alias("total"))
            .orderBy("_change_type"))


CHANGELOG_SQL = """
SELECT * FROM (
  SELECT 'DELETE' AS _change_type, COUNT(*) AS n,
         ROUND(SUM(o_totalprice), 2) AS total
  FROM orders
  WHERE o_orderkey % 2 = 0
    AND o_orderkey <= (SELECT MAX(o_orderkey) // 10 FROM orders)
  UNION ALL
  SELECT 'INSERT' AS _change_type, COUNT(*) AS n,
         ROUND(SUM(o_totalprice), 2) AS total
  FROM orders
) ORDER BY _change_type
"""


# ---------------------------------------------------------------------------
# L1 / L3 / L6 / L7 / L8 — maintenance actions preserve content
# ---------------------------------------------------------------------------


def compaction_scan(spark, sf_dir):
    """Six small appends binpacked into fewer files; content unchanged
    (reference spark/.../RewriteDataFilesSparkAction.java)."""
    key = ("binpack", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        t, df = _fresh(spark, sf_dir, "orders", "binpack")
        for i in range(6):
            t.append(df.filter(F.col("o_orderkey") % 6 == i))
        before = len(t.new_scan().plan_files().files)
        res = t.rewrite_data_files(strategy="binpack")
        t = t.refresh()
        after = len(t.new_scan().plan_files().files)
        assert after < before, f"binpack did not reduce files: {before}->{after}"
        assert res.get("rewritten_files", res.get("rewritten", 0)) > 0
        _STATE[key] = t.identifier
    t = _warehouse(spark).load_table(_STATE[key])
    return (t.to_df().groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("o_totalprice"), 2).alias("total"))
            .orderBy("o_orderstatus"))


COMPACTION_SQL = """
SELECT o_orderstatus, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def zorder_scan(spark, sf_dir):
    """Z-order rewrite on (o_custkey, o_totalprice); a custkey-range scan
    after the rewrite must read fewer files than a full scan, content
    unchanged (reference spark/.../SparkZOrderDataRewriter.java)."""
    key = ("zorder", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        t, df = _fresh(spark, sf_dir, "orders", "zorder")
        t.append(df.repartition(8))
        # target sized for >=6 output files at any driver SF so the min/max
        # pruning assertion below has teeth
        tbytes = sum(e.file.file_size_in_bytes
                     for e in t.new_scan().plan_files().files)
        t.rewrite_data_files(strategy="zorder",
                             zorder_by=["o_custkey", "o_totalprice"],
                             target_file_size=max(8 * 1024, tbytes // 6))
        t = t.refresh()
        _STATE[key] = t.identifier
    t = _warehouse(spark).load_table(_STATE[key])
    full = len(t.new_scan().plan_files().files)
    maxk = t.to_df().agg(F.max("o_custkey")).collect()[0][0]
    pruned = len(t.new_scan().filter(col("o_custkey") <= maxk // 10)
                 .plan_files().files)
    assert pruned < full, f"zorder gave no min/max pruning: {pruned}/{full}"
    return (t.scan(filter=col("o_custkey") <= maxk // 10).df()
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("o_totalprice"), 2).alias("total")))


ZORDER_SQL = """
SELECT COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
FROM orders
WHERE o_custkey <= (SELECT MAX(o_custkey) // 10 FROM orders)
"""


def expire_snapshots_scan(spark, sf_dir):
    """Three snapshots, expire all but the last; current content intact and
    unreferenced files deleted (reference core/.../RemoveSnapshots.java)."""
    key = ("expire", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        t, df = _fresh(spark, sf_dir, "supplier", "expire")
        t.append(df)
        t.overwrite(df.withColumn("s_acctbal", F.round(F.col("s_acctbal") + 1, 2)))
        t.overwrite(df.withColumn("s_acctbal", F.round(F.col("s_acctbal") + 2, 2)))
        assert len(t.snapshots()) == 3
        res = t.expire_snapshots(retain_last=1)
        t = t.refresh()
        assert len(t.snapshots()) == 1, "expire kept extra snapshots"
        assert res.get("deleted_files", 0) > 0, "expire deleted no data files"
        _STATE[key] = t.identifier
    t = _warehouse(spark).load_table(_STATE[key])
    return t.to_df().agg(F.count(F.lit(1)).alias("n"),
                         F.round(F.sum("s_acctbal"), 2).alias("bal"))


EXPIRE_SQL = """
SELECT COUNT(*) AS n, ROUND(SUM(ROUND(s_acctbal + 2, 2)), 2) AS bal FROM supplier
"""


def rest_plan_scan(spark, sf_dir):
    """REST server-side scan planning end to end: a client POSTs a
    partition filter to /plan, the server's engine planner prunes
    manifests and answers FileScanTasks (reference
    core/.../rest/PlanTableScanResponseParser.java); the client reads
    exactly the returned parquet. Asserts the plan actually pruned."""
    key = ("rest_plan", _sf_key(sf_dir))
    cat = _warehouse(spark)
    if key not in _STATE:
        _ensure_conf(spark)
        ident = f"db.restplan_{_sf_key(sf_dir)}"
        if cat.table_exists(ident):
            cat.drop_table(ident)
        df = load_table(spark, sf_dir, "supplier")
        t = cat.create_table(ident, df.schema,
                             partition_by=["s_nationkey"])
        t.append(df)
        _STATE[key] = ident
    import json as _json
    import urllib.request

    from .rest_catalog import serve

    ident = _STATE[key]
    ns, name = ident.rsplit(".", 1)
    srv, port = serve(cat)
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/namespaces/{ns}/tables/{name}/plan",
            method="POST",
            data=_json.dumps({"filter": {"type": "lt-eq",
                                         "term": "s_nationkey",
                                         "value": 10}}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            res = _json.loads(r.read())
        assert res["status"] == "completed", res
        tasks = res["file-scan-tasks"]
        paths = [task["data-file"]["file-path"] for task in tasks]
        t = cat.load_table(ident)
        total = len(t.scan().plan_files().files)
        assert 0 < len(paths) < total, (len(paths), total)
        assert all("delete-file-references" not in task for task in tasks)
    finally:
        srv.shutdown()
    df = spark.read.parquet(*paths)
    return (df.filter(F.col("s_nationkey") <= 10)  # residual re-apply
            .groupBy("s_nationkey")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("s_acctbal"), 2).alias("bal"))
            .orderBy("s_nationkey"))


REST_PLAN_SQL = """
SELECT s_nationkey, COUNT(*) AS n, ROUND(SUM(s_acctbal), 2) AS bal
FROM supplier WHERE s_nationkey <= 10
GROUP BY s_nationkey ORDER BY s_nationkey
"""


def expire_clean_metadata_scan(spark, sf_dir):
    """Spec + schema evolution, full rewrite, then
    expire_snapshots(clean_expired_metadata=True): the orphaned spec and
    schema leave the metadata (RemoveSnapshots.java:171,239-275), scans
    stay correct (reference api/.../ExpireSnapshots.java:149)."""
    key = ("expire_clean", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        t, df = _fresh(spark, sf_dir, "supplier", "expire_clean",
                       partition_by=["s_nationkey"])
        t.append(df)
        t.update_spec().add_field("s_suppkey", "bucket(8)").commit()
        t = t.refresh()
        t.update_schema().add_column("note", "string").commit()
        t = t.refresh()
        # rewrite everything under the evolved spec+schema, making the
        # originals unreachable once their snapshots expire
        t.overwrite(df.withColumn("note", F.lit(None).cast("string")))
        t = t.refresh()
        assert len(t.metadata.partition_specs) == 2
        assert len(t.metadata.schemas) == 2
        res = t.expire_snapshots(retain_last=1,
                                 clean_expired_metadata=True)
        t = t.refresh()
        assert res["removed_partition_specs"] == 1, res
        assert res["removed_schemas"] == 1, res
        assert len(t.metadata.partition_specs) == 1
        assert len(t.metadata.schemas) == 1
        _STATE[key] = t.identifier
    t = _warehouse(spark).load_table(_STATE[key])
    return (t.to_df().groupBy("s_nationkey")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("s_acctbal"), 2).alias("bal"))
            .orderBy("s_nationkey"))


EXPIRE_CLEAN_SQL = """
SELECT s_nationkey, COUNT(*) AS n, ROUND(SUM(s_acctbal), 2) AS bal
FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey
"""


def rewrite_manifests_scan(spark, sf_dir):
    """Many single-file manifests rewritten into few; scan unchanged
    (reference spark/.../RewriteManifestsSparkAction.java)."""
    key = ("rwman", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        t, df = _fresh(spark, sf_dir, "customer", "rwman")
        for i in range(4):
            t.append(df.filter(F.col("c_custkey") % 4 == i))
        from .manifests import read_manifest_list
        before = len(read_manifest_list(t.current_snapshot().manifest_list))
        t.rewrite_manifests()
        t = t.refresh()
        after = len(read_manifest_list(t.current_snapshot().manifest_list))
        assert after < before, f"manifests not consolidated: {before}->{after}"
        _STATE[key] = t.identifier
    t = _warehouse(spark).load_table(_STATE[key])
    return (t.to_df().groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("c_mktsegment"))


RW_MANIFESTS_SQL = """
SELECT c_mktsegment, COUNT(*) AS n FROM customer
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def orphan_cleanup_scan(spark, sf_dir):
    """Plant orphan files in the data dir; remove_orphan_files must delete
    exactly them and leave live data intact
    (reference spark/.../DeleteOrphanFilesSparkAction.java)."""
    key = ("orphan", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        t, df = _fresh(spark, sf_dir, "nation", "orphan")
        t.append(df)
        from .io import resolve_io

        ddir = os.path.join(t.location, "data")
        dio = resolve_io(ddir, spark)
        for i in range(3):
            dio.write_bytes(os.path.join(ddir, f"orphan-{i}.parquet"),
                            b"not a real parquet file")
        import time as _time

        removed = t.remove_orphan_files(
            older_than_ms=int((_time.time() + 60) * 1000))
        planted = {f"orphan-{i}.parquet" for i in range(3)}
        got = {os.path.basename(p) for p in removed}
        assert planted <= got, f"planted orphans not all removed: {removed}"
        _STATE[key] = t.identifier
    t = _warehouse(spark).load_table(_STATE[key])
    return (t.to_df().groupBy("n_regionkey")
            .agg(F.count(F.lit(1)).alias("n")).orderBy("n_regionkey"))


ORPHAN_SQL = """
SELECT n_regionkey, COUNT(*) AS n FROM nation
GROUP BY n_regionkey ORDER BY n_regionkey
"""


# ---------------------------------------------------------------------------
# L4 — rewrite position deletes into deletion vectors
# ---------------------------------------------------------------------------


def pos_delete_rewrite_dv_scan(spark, sf_dir):
    """Two MoR delete commits compacted into deletion vectors; read
    equivalence (reference spark/.../RewritePositionDeleteFilesSparkAction.java)."""
    key = ("posdv", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        t, df = _fresh(spark, sf_dir, "orders", "posdv",
                       properties={"write.delete.mode": "merge-on-read"})
        t.append(df)
        maxk = df.agg(F.max("o_orderkey")).collect()[0][0]
        t.delete_where(col("o_orderkey") <= maxk // 20, mode="merge-on-read")
        t.delete_where(E.and_(col("o_orderkey") > maxk // 10,
                              col("o_orderkey") <= maxk // 5),
                       mode="merge-on-read")
        from .maintenance import rewrite_position_delete_files
        res = rewrite_position_delete_files(t, to_dvs=True)
        assert res.get("rewritten", 0) > 0, f"no pos-deletes rewritten: {res}"
        t = t.refresh()
        _STATE[key] = t.identifier
    t = _warehouse(spark).load_table(_STATE[key])
    return t.to_df().agg(F.count(F.lit(1)).alias("n"),
                         F.round(F.sum("o_totalprice"), 2).alias("total"))


POS_DV_SQL = """
WITH mx AS (SELECT MAX(o_orderkey) AS m FROM orders)
SELECT COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
FROM orders, mx
WHERE o_orderkey > m // 20
  AND NOT (o_orderkey > m // 10 AND o_orderkey <= m // 5)
"""


def native_dv_delete_scan(spark, sf_dir):
    """Native v3 DV writes: `write.delete.format=dv` makes MoR DELETEs
    emit Puffin deletion-vector-v1 blobs directly, and a second delete on
    the same files MERGES into one vector per file (format/spec.md:1384).
    Read equivalence over the twice-deleted table."""
    key = ("natdv", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        t, df = _fresh(spark, sf_dir, "orders", "natdv",
                       properties={"write.delete.mode": "merge-on-read",
                                   "write.delete.format": "dv"})
        t.append(df)
        maxk = df.agg(F.max("o_orderkey")).collect()[0][0]
        t.delete_where(col("o_orderkey") <= maxk // 20, mode="merge-on-read")
        t = t.refresh()
        t.delete_where(E.and_(col("o_orderkey") > maxk // 10,
                              col("o_orderkey") <= maxk // 5),
                       mode="merge-on-read")
        t = t.refresh()
        plan = t.scan().plan_files()
        assert plan.pos_deletes and all(
            d.file.file_format == "puffin" for d in plan.pos_deletes), \
            "native DV path did not produce Puffin vectors"
        refs = [d.file.referenced_data_file for d in plan.pos_deletes]
        assert len(refs) == len(set(refs)), "more than one DV per data file"
        _STATE[key] = t.identifier
    t = _warehouse(spark).load_table(_STATE[key])
    return t.to_df().agg(F.count(F.lit(1)).alias("n"),
                         F.round(F.sum("o_totalprice"), 2).alias("total"))


# ---------------------------------------------------------------------------
# B14 — buffered transaction: several updates, exactly one commit
# ---------------------------------------------------------------------------


def transaction_scan(spark, sf_dir):
    """Append + delete + property change buffered in one Transaction;
    metadata must advance atomically
    (reference core/.../BaseTransaction.java:56)."""
    key = ("txn", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        t, df = _fresh(spark, sf_dir, "customer", "txn")
        t.append(df.filter(F.col("c_custkey") % 2 == 0))
        (t.transaction()
         .append(df.filter(F.col("c_custkey") % 2 == 1))
         .delete_where(col("c_mktsegment") == "MACHINERY")
         .set_properties(**{"txn.test": "done"})
         .commit_transaction())
        t = t.refresh()
        assert t.properties.get("txn.test") == "done"
        _STATE[key] = t.identifier
    t = _warehouse(spark).load_table(_STATE[key])
    return (t.to_df().groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n")).orderBy("c_mktsegment"))


def rtas_scan(spark, sf_dir):
    """CREATE OR REPLACE TABLE AS SELECT (RTAS,
    spark/.../SparkCatalog replace flow): the replaced table keeps its
    uuid and snapshot history — one transactional commit swaps schema
    (union-by-name in, stale columns out) and data; time travel still
    reaches pre-replace rows."""
    key = ("rtas", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        cat = _warehouse(spark)
        t, df = _fresh(spark, sf_dir, "supplier", "rtas")
        t.append(df)
        uuid0 = t.metadata.table_uuid
        n0 = len(t.snapshots())
        load_table(spark, sf_dir, "nation").createOrReplaceTempView(
            "rtas_nation_src")
        cat.sql(f"CREATE OR REPLACE TABLE {t.identifier} AS "
                "SELECT n_regionkey, COUNT(*) AS n_nations, "
                "MIN(n_name) AS first_name FROM rtas_nation_src "
                "GROUP BY n_regionkey")
        t = t.refresh()
        assert t.metadata.table_uuid == uuid0, "RTAS must keep identity"
        assert len(t.snapshots()) > n0, "RTAS must extend history"
        assert t.scan(snapshot_id=t.snapshots()[n0 - 1].snapshot_id) \
            .df().count() == df.count(), "pre-replace rows must time-travel"
        _STATE[key] = t.identifier
    t = _warehouse(spark).load_table(_STATE[key])
    return t.to_df().orderBy("n_regionkey")


RTAS_SQL = """
SELECT n_regionkey, COUNT(*) AS n_nations, MIN(n_name) AS first_name
FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
"""


TXN_SQL = """
SELECT c_mktsegment, COUNT(*) AS n FROM customer
WHERE c_mktsegment <> 'MACHINERY'
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# D7 / G2 — metadata tables + partition stats
# ---------------------------------------------------------------------------


def metadata_partitions_scan(spark, sf_dir):
    """`partitions` metadata table rollup equals a GROUP BY on the data
    (reference core/.../PartitionsTable.java)."""
    key = ("metapart", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        t, df = _fresh(spark, sf_dir, "customer", "metapart",
                       partition_by=["c_mktsegment"])
        t.append(df)
        _STATE[key] = t.identifier
    t = _warehouse(spark).load_table(_STATE[key])
    return (t.metadata_table("partitions")
            .select(F.get_json_object("partition", "$.c_mktsegment")
                    .alias("c_mktsegment"),
                    F.col("record_count").alias("n"))
            .orderBy("c_mktsegment"))


META_PARTITIONS_SQL = """
SELECT c_mktsegment, COUNT(*) AS n FROM customer
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def metadata_files_scan(spark, sf_dir):
    """`files` + `delete_files` metadata tables against the data: per
    partition, data-file record counts sum to the row count and
    position-delete record counts sum to the deleted-row count
    (reference core/.../BaseFilesTable.java, PositionDeletesTable.java)."""
    key = ("metafiles", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        t, df = _fresh(spark, sf_dir, "customer", "metafiles",
                       partition_by=["c_mktsegment"])
        t.append(df)
        t.delete_where(col("c_acctbal") < 0, mode="merge-on-read")
        _STATE[key] = t.identifier
    t = _warehouse(spark).load_table(_STATE[key])
    seg = F.get_json_object("partition", "$.c_mktsegment").alias("c_mktsegment")
    data = (t.metadata_table("data_files").select(seg, "record_count")
            .groupBy("c_mktsegment")
            .agg(F.sum("record_count").alias("n_rows")))
    dels = (t.metadata_table("delete_files").select(seg, "record_count")
            .groupBy("c_mktsegment")
            .agg(F.sum("record_count").alias("n_deleted")))
    return (data.join(dels, "c_mktsegment", "left")
            .select("c_mktsegment", "n_rows",
                    F.coalesce("n_deleted", F.lit(0)).alias("n_deleted"))
            .orderBy("c_mktsegment"))


META_FILES_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_rows,
       CAST(COALESCE(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_deleted
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def partition_stats_scan(spark, sf_dir):
    """compute_partition_stats file re-read and compared to the data
    (reference spark/.../ComputePartitionStatsSparkAction.java)."""
    key = ("pstats", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        t, df = _fresh(spark, sf_dir, "orders", "pstats",
                       partition_by=["o_orderpriority"])
        t.append(df)
        from .maintenance import compute_partition_stats
        path = compute_partition_stats(t)
        _STATE[key] = path
    path = _STATE[key]
    # spec-schema file: `partition` is the unified partition-type struct,
    # counts use the spec field names (format/spec.md:1233)
    pdf = spark.read.parquet(path)
    return (pdf.select(F.col("partition.o_orderpriority")
                       .alias("o_orderpriority"),
                       F.col("data_record_count").alias("n"))
            .orderBy("o_orderpriority"))


PARTITION_STATS_SQL = """
SELECT o_orderpriority, COUNT(*) AS n FROM orders
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def table_stats_ndv_scan(spark, sf_dir):
    """Theta-sketch NDV stats: exact below sketch capacity, so the
    low-cardinality columns must match COUNT(DISTINCT)
    (reference spark/.../ComputeTableStatsSparkAction.java, NDVSketchUtil)."""
    key = ("ndv", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        t, df = _fresh(spark, sf_dir, "customer", "ndv")
        t.append(df)
        stats = t.compute_table_stats(columns=["c_mktsegment", "c_nationkey"])
        _STATE[key] = stats["ndv"]
    ndv = _STATE[key]
    return spark.createDataFrame(
        [(int(ndv["c_mktsegment"]), int(ndv["c_nationkey"]))],
        "ndv_mktsegment bigint, ndv_nationkey bigint")


NDV_SQL = """
SELECT CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS ndv_mktsegment,
       CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS ndv_nationkey
FROM customer
"""


def stats_ndv_roundtrip_scan(spark, sf_dir):
    """NDV answered from the theta-sketch BLOB of a statistics file that
    round-tripped through the reference layout: the engine computes
    table stats (Puffin apache-datasketches-theta-v1 blobs,
    compute_table_stats), exports the whole metadata tree
    (export_reference_metadata), re-imports it
    (snapshot_iceberg_table), and the query DESERIALIZES the carried
    blob itself — theta_sketch_estimate over the blob bytes — never the
    stored `ndv` property. Exact below sketch capacity, so it must
    equal COUNT(DISTINCT). End-to-end twin of the pytest wire-format
    proof (tests/test_puffin.py) the r12 verdict asked to
    driver-confirm; reference NDVSketchUtil.java + StatisticsFile
    carry in TableMetadataParser."""
    key = ("ndv_rt", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        from .sources.iceberg import (export_reference_metadata,
                                      register_iceberg_table)

        cat = _warehouse(spark)
        back = f"ndvrt_back_{_sf_key(sf_dir)}"
        if cat.table_exists(back):
            cat.drop_table(back)
        t, df = _fresh(spark, sf_dir, "customer", "ndvrt_src")
        t.append(df)
        t.compute_table_stats(columns=["c_mktsegment", "c_nationkey"])
        t = t.refresh()
        dest = tempfile.mkdtemp(prefix="iceberg_ndv_export_")
        export_reference_metadata(t, dest)
        # register (full-history) mode: snapshot ids are preserved, so
        # the statistics file registers by reference against its
        # original snapshot — the interop path the reference's
        # RegisterTableProcedure takes
        register_iceberg_table(cat, dest, back)
        _STATE[key] = back
    t = _warehouse(spark).load_table(_STATE[key])
    stats_entries = t.metadata.statistics_files
    assert stats_entries, "statistics file must survive the round trip"
    from .puffin import read_puffin

    meta, blobs = read_puffin(stats_entries[-1]["statistics-path"])
    by_fid = {}
    for bm, blob in zip(meta["blobs"], blobs):
        assert bm["type"] == "apache-datasketches-theta-v1", bm["type"]
        by_fid[tuple(bm["fields"])] = blob
    fid = {c: t.schema.find_field(c).field_id
           for c in ("c_mktsegment", "c_nationkey")}
    return spark.range(1).select(
        F.theta_sketch_estimate(
            F.lit(by_fid[(fid["c_mktsegment"],)])).alias("ndv_mktsegment"),
        F.theta_sketch_estimate(
            F.lit(by_fid[(fid["c_nationkey"],)])).alias("ndv_nationkey"))


# ---------------------------------------------------------------------------
# L12 — rewrite table path (DR copy)
# ---------------------------------------------------------------------------


def rewrite_table_path_scan(spark, sf_dir):
    """Metadata tree rewritten to a target prefix; after copying data files
    per the returned plan, the copy must read identically
    (reference spark/.../RewriteTablePathSparkAction.java)."""
    key = ("drcopy", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        import shutil

        t, df = _fresh(spark, sf_dir, "supplier", "drcopy")
        t.append(df)
        target = tempfile.mkdtemp(prefix="iceberg_spark_dr_")
        from .maintenance import rewrite_table_path
        res = rewrite_table_path(t, t.location, target)
        assert res["rewritten_manifests"] >= 1
        from .io import resolve_io

        for src, dst in res["data_files_to_copy"]:
            dio = resolve_io(dst, spark)
            if not dio.exists(dst):
                dio.write_bytes(dst, resolve_io(src, spark).read_bytes(src))
        _STATE[key] = target
    target = _STATE[key]
    from .metadata import TableOperations
    from .table import Table
    ops = TableOperations(target)
    t2 = Table(spark, target, ops.refresh(), "drcopy.copy")
    return (t2.to_df().groupBy("s_nationkey")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("s_acctbal"), 2).alias("bal"))
            .orderBy("s_nationkey"))


DR_COPY_SQL = ORC_RT_SQL


def rewrite_table_path_encrypted_scan(spark, sf_dir):
    """DR copy of an ENCRYPTED metadata tree (decrypt-rewrap-reencrypt):
    rewrite_table_path over a metadata_key table re-encrypts every
    copied manifest/list under FRESH per-file keys chained through the
    copy's own `encryption-keys`, the metadata JSON stays an AGS1
    stream, and zero plaintext lands under the target — asserted
    file-by-file. The copy loads with the same metadata_key and must
    scan identically (reference RewriteTablePathSparkAction + the
    StandardEncryptionManager re-wrap the reference would need)."""
    key = ("drcopy_enc", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        from .encryption import MAGIC
        from .maintenance import rewrite_table_path
        from .io import resolve_io
        from .table import Catalog

        wh = tempfile.mkdtemp(prefix="iceberg_spark_drencwh_")
        mkey = bytes(range(7, 23))
        cat = Catalog(spark, wh, metadata_key=mkey)
        df = load_table(spark, sf_dir, "supplier")
        t = cat.create_table("db.drenc", df.schema)
        t.append(df)
        victims = [r.s_suppkey for r in df.select("s_suppkey").collect()
                   if r.s_suppkey % 7 == 0]
        t.delete_where(col("s_suppkey").isin(victims),
                       mode="merge-on-read")
        t = cat.load_table("db.drenc")
        target = tempfile.mkdtemp(prefix="iceberg_spark_drenc_")
        res = rewrite_table_path(t, t.location, target)
        assert res["rewritten_manifests"] >= 1
        for src, dst in res["data_files_to_copy"]:
            dio = resolve_io(dst, spark)
            if not dio.exists(dst):
                dio.write_bytes(dst, resolve_io(src, spark).read_bytes(src))
        # zero plaintext in the copied metadata tree
        mdir = os.path.join(target, "metadata")
        for root, _dirs, fnames in os.walk(mdir):
            for f in fnames:
                if f.endswith((".parquet", ".avro", ".metadata.json")):
                    hdr = open(os.path.join(root, f), "rb").read(4)
                    assert hdr == MAGIC, (f, hdr)
        # keyless open of the copy fails loudly
        try:
            from .metadata import TableOperations

            TableOperations(target).refresh()
            raise AssertionError("keyless open of the DR copy succeeded")
        except ValueError:
            pass
        _STATE[key] = (target, mkey)
    target, mkey = _STATE[key]
    from .metadata import TableOperations
    from .table import Table

    ops = TableOperations(target, metadata_key=mkey)
    t2 = Table(spark, target, ops.refresh(), "drcopy.enc_copy")
    return (t2.to_df().groupBy("s_nationkey")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("s_acctbal"), 2).alias("bal"))
            .orderBy("s_nationkey"))


DR_COPY_ENC_SQL = """
SELECT s_nationkey, COUNT(*) AS n, ROUND(SUM(s_acctbal), 2) AS bal
FROM supplier WHERE s_suppkey % 7 <> 0
GROUP BY s_nationkey ORDER BY s_nationkey
"""


# ---------------------------------------------------------------------------
# J1 / J2 — views and SQL UDFs through the SQL engine
# ---------------------------------------------------------------------------


def sql_view_scan(spark, sf_dir):
    """CREATE VIEW over an engine table, then query through the SQL engine
    (reference core/.../ViewMetadata.java, spark view catalog)."""
    _ensure_conf(spark)
    from .sql import SqlEngine
    from .workloads import engine_table

    engine_table(spark, sf_dir, "orders")
    eng = SqlEngine(spark, _warehouse(spark))
    ident = f"{_sf_key(sf_dir)}.orders"
    eng.sql(f"""
        CREATE OR REPLACE VIEW {_sf_key(sf_dir)}.big_orders AS
        SELECT o_orderpriority, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
        FROM {ident} WHERE o_totalprice > 100000
        GROUP BY o_orderpriority
    """)
    return eng.sql(f"SELECT * FROM {_sf_key(sf_dir)}.big_orders "
                   f"ORDER BY o_orderpriority")


SQL_VIEW_SQL = """
SELECT o_orderpriority, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
FROM orders WHERE o_totalprice > 100000
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def spj_join_scan(spark, sf_dir):
    """Storage-partitioned join (D6/E7): orders<->lineitem bucketed both
    sides on orderkey join WITHOUT an Exchange (plan-asserted), result
    oracle-checked against the plain DuckDB join — so the shuffle-free
    plan is proven to compute the same answer, not just be fast
    (reference SparkPartitioningAwareScan.java:107)."""
    key = ("spj_oracle", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        from .spj import create_bucketed_table
        from .table import Catalog

        cat = Catalog(spark,
                      tempfile.mkdtemp(prefix="iceberg_spark_spjq_"))
        orders = load_table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("k"), "o_orderpriority")
        li = load_table(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("k"), "l_quantity")
        create_bucketed_table(cat, "spjq_orders", orders, 8, "k")
        create_bucketed_table(cat, "spjq_lineitem", li, 8, "k")
        _STATE[key] = cat.warehouse
    from .spj import bucketed_join
    from .table import Catalog

    cat = Catalog(spark, _STATE[key])
    ta = cat.load_table("spjq_orders")
    tb = cat.load_table("spjq_lineitem")

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(ta, tb, "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "SPJ plan must not shuffle"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    return (j.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("l_quantity"), 2).alias("qty"))
            .orderBy("o_orderpriority"))


SPJ_JOIN_SQL = """
SELECT o_orderpriority, COUNT(*) AS n,
       ROUND(SUM(l_quantity), 2) AS qty
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def sql_ddl_lifecycle_scan(spark, sf_dir):
    """N1–N4 DDL through the SQL veneer end-to-end, oracle-checked:
    CREATE TABLE AS SELECT, ALTER TABLE ADD COLUMNS (schema evolution
    reads old files as null), ALTER TABLE RENAME COLUMN (field-id-based
    reads keep history), INSERT INTO, then a SELECT the DuckDB oracle
    reproduces from the source parquet (reference
    spark/.../extensions DDL surface; sql.py)."""
    key = ("sql_ddl", _sf_key(sf_dir))
    ns = _sf_key(sf_dir)
    if key not in _STATE:
        _ensure_conf(spark)
        from .sql import SqlEngine
        from .sources.testdata import register_views

        register_views(spark, sf_dir)
        eng = SqlEngine(spark, _warehouse(spark))
        eng.sql(f"DROP TABLE IF EXISTS {ns}.ddl_nation")
        eng.sql(f"""
            CREATE TABLE {ns}.ddl_nation AS
            SELECT n_nationkey, n_name, n_regionkey FROM nation
        """)
        eng.sql(f"ALTER TABLE {ns}.ddl_nation ADD COLUMNS "
                f"(bonus DOUBLE)")
        eng.sql(f"ALTER TABLE {ns}.ddl_nation "
                f"RENAME COLUMN n_name TO nation_name")
        eng.sql(f"""
            INSERT INTO {ns}.ddl_nation
            SELECT n_nationkey + 100, n_name, n_regionkey, 1.5
            FROM nation WHERE n_nationkey < 5
        """)
        _STATE[key] = True
    from .sql import SqlEngine

    eng = SqlEngine(spark, _warehouse(spark))
    return eng.sql(f"""
        SELECT n_regionkey, COUNT(*) AS n,
               COUNT(bonus) AS n_bonus,
               MIN(nation_name) AS first_name
        FROM {ns}.ddl_nation
        GROUP BY n_regionkey ORDER BY n_regionkey
    """)


SQL_DDL_SQL = """
WITH u AS (
  SELECT n_nationkey, n_name AS nation_name, n_regionkey,
         CAST(NULL AS DOUBLE) AS bonus FROM nation
  UNION ALL
  SELECT n_nationkey + 100, n_name, n_regionkey, 1.5
  FROM nation WHERE n_nationkey < 5
)
SELECT n_regionkey, COUNT(*) AS n, COUNT(bonus) AS n_bonus,
       MIN(nation_name) AS first_name
FROM u GROUP BY n_regionkey ORDER BY n_regionkey
"""


# ---------------------------------------------------------------------------
# K1 / K2 — streaming micro-batch source -> exactly-once append sink
# ---------------------------------------------------------------------------


def streaming_sink_scan(spark, sf_dir):
    """Drain an engine table through the micro-batch source into an append
    sink (Trigger.AvailableNow analog); sink content equals source.
    Epoch ledger makes re-delivery a no-op
    (reference spark/.../SparkMicroBatchStream.java + SparkWrite.java)."""
    key = ("stream", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        from .streaming.micro_batch import MicroBatchStream
        from .streaming.sinks import append_sink

        src, df = _fresh(spark, sf_dir, "nation", "streamsrc")
        ckpt = tempfile.mkdtemp(prefix="iceberg_spark_ckpt_")
        # offset checkpoint created on the empty table -> stream starts at
        # the beginning and sees the three appends as pending batches
        reader = MicroBatchStream(src, ckpt)
        for i in range(3):
            src.append(df.filter(F.col("n_nationkey") % 3 == i))
        src = src.refresh()
        reader.table = src
        cat = _warehouse(spark)
        sid = f"streamsink_{_sf_key(sf_dir)}"
        if cat.table_exists(sid):
            cat.drop_table(sid)
        sink_t = cat.create_table(sid, df.schema)
        n1 = reader.process_available(append_sink(sink_t, query_id="wl"))
        assert n1 >= 1, "no batches delivered"
        # second drain: no new data, must be a no-op
        n2 = reader.process_available(append_sink(sink_t, query_id="wl"))
        assert n2 == 0, f"source re-delivered {n2} batches"
        _STATE[key] = sid
    t = _warehouse(spark).load_table(_STATE[key])
    return (t.to_df().select("n_nationkey", "n_name").orderBy("n_nationkey"))


STREAMING_SQL = """
SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey
"""


# ---------------------------------------------------------------------------
# M1 — CALL procedures driving maintenance through SQL
# ---------------------------------------------------------------------------


def call_procedures_scan(spark, sf_dir):
    """CALL system.rewrite_data_files + expire_snapshots through the SQL
    engine; procedure output counts must be non-zero and content intact
    (reference spark/.../procedures/RewriteDataFilesProcedure.java)."""
    key = ("callproc", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        from .sql import SqlEngine

        t, df = _fresh(spark, sf_dir, "supplier", "callproc")
        for i in range(4):
            t.append(df.filter(F.col("s_suppkey") % 4 == i))
        eng = SqlEngine(spark, _warehouse(spark))
        ident = t.identifier
        row = eng.sql(f"CALL system.rewrite_data_files(table => '{ident}')").collect()[0]
        assert row["rewritten_data_files_count"] > 0, f"procedure reported {row}"
        row2 = eng.sql(
            f"CALL system.expire_snapshots(table => '{ident}', retain_last => 1)"
        ).collect()[0]
        assert sum(v for v in row2.asDict().values() if isinstance(v, int)) > 0
        _STATE[key] = ident
    t = _warehouse(spark).load_table(_STATE[key])
    return t.to_df().agg(F.count(F.lit(1)).alias("n"),
                         F.round(F.sum("s_acctbal"), 2).alias("bal"))


CALL_PROC_SQL = """
SELECT COUNT(*) AS n, ROUND(SUM(s_acctbal), 2) AS bal FROM supplier
"""


# ---------------------------------------------------------------------------
# NaN metrics semantics — NaN-free bounds + engine-consistent pruning
# ---------------------------------------------------------------------------


def nan_metrics_scan(spark, sf_dir):
    """Inject NaN into a double column, write through the engine (stats
    collector strips NaN from bounds per format/spec.md metrics), then scan
    with comparison filters. Spark and DuckDB agree NaN > any literal, so
    the gt filter must keep NaN rows while file pruning stays safe
    (InclusiveMetricsEvaluator NaN guards)."""
    key = ("nanmetrics", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        src = load_table(spark, sf_dir, "supplier").withColumn(
            "s_acctbal",
            F.when(F.col("s_suppkey") % 7 == 0, F.lit(float("nan")))
             .otherwise(F.col("s_acctbal")))
        cat = _warehouse(spark)
        ident = f"nanmet_{_sf_key(sf_dir)}"
        if cat.table_exists(ident):
            cat.drop_table(ident)
        t = cat.create_table(ident, src.schema)
        # several files so metrics pruning has something to skip
        for i in range(3):
            t.append(src.filter(F.col("s_suppkey") % 3 == i))
        for e in t.new_scan().plan_files().files:
            st = e.file.stats.get("s_acctbal")
            if st is not None and st[0] is not None:
                assert st[0] == st[0] and st[1] == st[1], \
                    "NaN leaked into bounds"
        _STATE[key] = ident
    t = _warehouse(spark).load_table(_STATE[key])
    from .expressions import col

    hi = t.new_scan().filter(col("s_acctbal") > 5000.0).df()
    return (hi.agg(F.count(F.lit(1)).alias("n_hi"),
                   F.sum(F.when(F.isnan("s_acctbal"), 1).otherwise(0))
                    .alias("n_nan")))


NAN_METRICS_SQL = """
WITH injected AS (
  SELECT CASE WHEN s_suppkey % 7 = 0 THEN 'NaN'::DOUBLE ELSE s_acctbal END
         AS s_acctbal
  FROM supplier
)
SELECT COUNT(*) AS n_hi,
       CAST(SUM(CASE WHEN isnan(s_acctbal) THEN 1 ELSE 0 END) AS BIGINT) AS n_nan
FROM injected WHERE s_acctbal > 5000.0
"""


# ---------------------------------------------------------------------------
# v3 default values — initial-default fills pre-evolution rows
# ---------------------------------------------------------------------------


def default_values_scan(spark, sf_dir):
    """Add a column with a default after the first append: old rows read
    the initial-default, a post-evolution writer omitting the column gets
    the write-default (format/spec.md "Default values")."""
    key = ("defaults", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        t, df = _fresh(spark, sf_dir, "nation", "defvals")
        old = df.filter(F.col("n_nationkey") < 10)
        new = df.filter(F.col("n_nationkey") >= 10)
        t.append(old)
        t.update_schema().add_column("tier", "string", default="legacy").commit()
        t = _warehouse(spark).load_table(t.identifier)
        t.update_schema().update_column_default("tier", "fresh").commit()
        t = _warehouse(spark).load_table(t.identifier)
        t.append(new)  # omits `tier` -> write-default "fresh"
        _STATE[key] = t.identifier
    t = _warehouse(spark).load_table(_STATE[key])
    return (t.to_df().groupBy("tier")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("n_nationkey").alias("key_sum"))
            .orderBy("tier"))


DEFAULT_VALUES_SQL = """
SELECT CASE WHEN n_nationkey < 10 THEN 'legacy' ELSE 'fresh' END AS tier,
       COUNT(*) AS n, CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
FROM nation GROUP BY 1 ORDER BY tier
"""


# ---------------------------------------------------------------------------
# Type promotion — files written narrow, read wide (format/spec.md:356)
# ---------------------------------------------------------------------------


def type_promotion_scan(spark, sf_dir):
    """Write supplier with int key + float balance, promote to long/double
    (v1/v2 lattice), append wide rows, scan both cohorts under the wide
    schema with a filter that exercises stats pruning across the boundary
    (reference core/.../SchemaUpdate.java updateColumn; spec:356)."""
    key = ("typepromo", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        narrow = (load_table(spark, sf_dir, "supplier")
                  .select(F.col("s_suppkey").cast("int").alias("k"),
                          F.col("s_acctbal").cast("float").alias("bal"),
                          "s_nationkey"))
        cat = _warehouse(spark)
        ident = f"typepromo_{_sf_key(sf_dir)}"
        if cat.table_exists(ident):
            cat.drop_table(ident)
        t = cat.create_table(ident, narrow.schema)
        t.append(narrow.filter(F.col("k") % 2 == 0))
        t.update_schema().update_column("k", "long") \
            .update_column("bal", "double").commit()
        t = cat.load_table(ident)
        wide = (narrow.filter(F.col("k") % 2 == 1)
                .select((F.col("k").cast("long") + F.lit(1_000_000_000_000)).alias("k"),
                        F.col("bal").cast("double"), "s_nationkey"))
        t.append(wide)
        _STATE[key] = ident
    t = _warehouse(spark).load_table(_STATE[key])
    return (t.to_df().groupBy("s_nationkey")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("k").alias("key_sum"),
                 F.round(F.sum(F.col("bal").cast("double")), 2).alias("bal_sum"))
            .orderBy("s_nationkey"))


TYPE_PROMOTION_SQL = """
WITH narrow AS (
  SELECT CAST(s_suppkey AS INTEGER) AS k, CAST(s_acctbal AS REAL) AS bal,
         s_nationkey
  FROM supplier
), both_cohorts AS (
  SELECT CAST(k AS BIGINT) AS k, CAST(bal AS DOUBLE) AS bal, s_nationkey
  FROM narrow WHERE k % 2 = 0
  UNION ALL
  SELECT CAST(k AS BIGINT) + 1000000000000 AS k, CAST(bal AS DOUBLE) AS bal,
         s_nationkey
  FROM narrow WHERE k % 2 = 1
)
SELECT s_nationkey, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS key_sum,
       ROUND(SUM(bal), 2) AS bal_sum
FROM both_cohorts GROUP BY s_nationkey ORDER BY s_nationkey
"""


def relocated_table_scan(spark, sf_dir):
    """v4 relative paths (format/spec.md:194): build a relative-path table,
    MoR-delete a slice, physically relocate the whole directory, remove the
    original, and scan from the new location — manifests, manifest list,
    snapshot pointers, and position-delete application must all survive the
    move with no path rewriting (contrast rewrite_table_path_scan, which is
    the absolute-path DR action)."""
    import shutil

    key = ("relocated", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        t, df = _fresh(spark, sf_dir, "customer", "relocsrc",
                       partition_by=["c_mktsegment"],
                       properties={"write.metadata.use-relative-paths": "true"})
        t.append(df)
        t.delete_where(col("c_acctbal") < 0, mode="merge-on-read")
        from .io import copy_tree, resolve_io

        new_loc = os.path.join(tempfile.mkdtemp(prefix="relocated_"), "customer")
        copy_tree(t.location, new_loc)
        resolve_io(t.location, spark).delete_dir(t.location)
        _STATE[key] = new_loc
    from .metadata import TableOperations
    from .table import Table

    loc = _STATE[key]
    t = Table(spark, loc, TableOperations(loc).refresh(), "relocated")
    return (t.to_df().groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("c_acctbal"), 2).alias("bal"))
            .orderBy("c_mktsegment"))


RELOCATED_SQL = """
SELECT c_mktsegment, COUNT(*) AS n, ROUND(SUM(c_acctbal), 2) AS bal
FROM customer WHERE c_acctbal >= 0
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def runtime_filter_scan(spark, sf_dir):
    """D5 runtime filtering (SparkBatchQueryScan.filter:127 analog): orders
    bucketed by o_custkey; the build side (high-balance AUTOMOBILE customers)
    resolves first, its keys re-plan the probe scan so bucket projection +
    min/max stats drop files no key can reach — asserted via the plan
    report, the file-level half of dynamic partition pruning."""
    from .workloads import engine_table as _et

    t = _et(spark, sf_dir, "orders", partition_by=["bucket(16, o_custkey)"])
    # the build side caps at 8 keys (deterministic: lowest custkeys) so it
    # stays selective at every SF — with <=8 of 16 buckets reachable,
    # bucket-projection pruning is guaranteed, which is the scenario
    # runtime filtering exists for; an unselective build side would
    # correctly prune nothing (and did, at sf>=0.1, before the cap)
    cust = (load_table(spark, sf_dir, "customer")
            .filter((F.col("c_mktsegment") == "AUTOMOBILE")
                    & (F.col("c_acctbal") > 9000))
            .select("c_custkey")
            .orderBy("c_custkey").limit(8))
    scan = t.scan().runtime_filter("o_custkey", cust)
    plan = scan.plan_files()
    full = len(t.scan().plan_files().files)
    assert len(plan.files) < full, "runtime filter must prune bucket files"
    return (scan.df().groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("o_totalprice"), 2).alias("total"))
            .orderBy("o_orderpriority"))


RUNTIME_FILTER_SQL = """
SELECT o_orderpriority, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer
                    WHERE c_mktsegment = 'AUTOMOBILE' AND c_acctbal > 9000
                    ORDER BY c_custkey LIMIT 8)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


_WM_DELAY_S = 15 * 86400  # 15-day lateness bound over the 30-day event span


def streaming_watermark_scan(spark, sf_dir):
    """K4/K5: three out-of-order event batches drained through the
    micro-batch source into a watermarking windowed-count sink
    (withWatermark + window analog). Rows older than the running watermark
    (max event time of prior epochs minus 15 days) are dropped as late;
    per-day counts accumulate in a state table; the watermark itself rides
    in the snapshot summary so a restart resumes the same cutoff."""
    key = ("wmstream", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        from pyspark.sql import types as T

        from .streaming.micro_batch import MicroBatchStream
        from .streaming.sinks import watermark_window_sink

        src, df = _fresh(spark, sf_dir, "events", "wmsrc")
        ckpt = tempfile.mkdtemp(prefix="iceberg_spark_wm_ckpt_")
        reader = MicroBatchStream(src, ckpt)
        for i in range(3):
            src.append(df.filter(F.col("event_id") % 3 == i))
        reader.table = src.refresh()
        cat = _warehouse(spark)
        sid = f"wmsink_{_sf_key(sf_dir)}"
        if cat.table_exists(sid):
            cat.drop_table(sid)
        sink_t = cat.create_table(sid, T.StructType([
            T.StructField("win_start", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("n", T.LongType()),
        ]))
        sink = watermark_window_sink(sink_t, "ts", ["event_type"],
                                     delay_s=_WM_DELAY_S, query_id="wmwl")
        n = reader.process_available(sink)
        assert n == 3, f"expected 3 epochs, got {n}"
        # re-drain: idempotent, no state change
        assert reader.process_available(sink) == 0
        _STATE[key] = sid
    t = _warehouse(spark).load_table(_STATE[key])
    return (t.to_df()
            .select(F.col("win_start").cast("date").alias("win_start"),
                    "event_type", "n")
            .orderBy("win_start", "event_type"))


STREAMING_WATERMARK_SQL = f"""
WITH b0 AS (SELECT * FROM events WHERE event_id % 3 = 0),
b1 AS (SELECT * FROM events WHERE event_id % 3 = 1),
b2 AS (SELECT * FROM events WHERE event_id % 3 = 2),
w0 AS (SELECT max(ts) - INTERVAL {_WM_DELAY_S} SECOND AS wm FROM b0),
w1 AS (SELECT greatest((SELECT wm FROM w0),
                       (SELECT max(ts) - INTERVAL {_WM_DELAY_S} SECOND
                        FROM b1)) AS wm),
kept AS (
  SELECT * FROM b0
  UNION ALL SELECT * FROM b1 WHERE ts >= (SELECT wm FROM w0)
  UNION ALL SELECT * FROM b2 WHERE ts >= (SELECT wm FROM w1)
)
SELECT date_trunc('day', ts) AS win_start, event_type,
       COUNT(*) AS n
FROM kept GROUP BY 1, 2 ORDER BY 1, 2
"""


def auto_compaction_scan(spark, sf_dir):
    """K7 maintenance-as-streaming-job: six small epochs stream into an
    append sink wrapped by the maintenance scheduler; the small-file
    threshold triggers binpack from inside the loop (Flink
    RewriteDataFiles.java:43 analog), leaving a replace snapshot and a
    compacted file set with identical data."""
    key = ("automaint", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        from .streaming import append_sink, run_maintenance

        t, df = _fresh(spark, sf_dir, "supplier", "automaint")
        sched = run_maintenance(t, every_n_commits=100, min_small_files=4)
        sink = sched.wrap(append_sink(t, query_id="automaint"))
        for i in range(6):
            sink(df.filter(F.col("s_suppkey") % 6 == i), i)
        assert len(sched.runs) >= 1, "small-file trigger never fired"
        t = t.refresh()
        assert "replace" in [s.operation for s in t.metadata.snapshots]
        assert len(t.scan().plan_files().files) < 6
        _STATE[key] = t.identifier
    t = _warehouse(spark).load_table(_STATE[key])
    return (t.to_df().groupBy("s_nationkey")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("s_acctbal"), 2).alias("bal"))
            .orderBy("s_nationkey"))


AUTO_COMPACTION_SQL = """
SELECT s_nationkey, COUNT(*) AS n, ROUND(SUM(s_acctbal), 2) AS bal
FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey
"""


def timestamp_ns_scan(spark, sf_dir):
    """v3 timestamp_ns fidelity (reference api/.../types/Types.java:300;
    spec format/spec.md:261). Spark caps timestamps at micros, so the
    engine stores ns as int64 nanos (SURVEY §1.3 cap). Prove the long path
    is exact end-to-end: ingest events.ts as raw nanos (nanosAsLong read),
    append through the engine as three ts-ranged files, scan with a
    nanosecond-precision filter (deliberately NOT µs-aligned: ...001) that
    prunes on per-file ns min/max stats, and aggregate exact ns values."""
    key = ("tsns", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        from dataclasses import replace as _dc_replace

        from .schema import Schema

        from .transforms import _micros_col

        # testdata ts is µs parquet (NTZ); synthesize deterministic sub-µs
        # digits (event_id % 1000) so the round-trip carries bits a µs-typed
        # path would destroy — the oracle builds the same int64 nanos
        raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        ts_src = dict(raw.dtypes)["ts"]
        if ts_src == "bigint":
            # timestamp[ns] parquet under nanosAsLong: already epoch nanos
            micros = F.expr("ts div 1000")
        else:
            micros = _micros_col(
                F.col("ts"), "timestamp_ntz" if ts_src == "timestamp_ntz"
                else "timestamp")
        raw = (raw.select("event_id",
                          (micros * F.lit(1000)
                           + F.col("event_id") % F.lit(1000)).alias("ts"),
                          "event_type")
               .coalesce(1))
        base = Schema.from_spark(raw.schema)
        schema = Schema(tuple(
            _dc_replace(f, type="timestamp_ns") if f.name == "ts" else f
            for f in base.fields))
        cat = _warehouse(spark)
        ident = f"tsns_{_sf_key(sf_dir)}"
        if cat.table_exists(ident):
            cat.drop_table(ident)
        t = cat.create_table(ident, schema)
        c1, c2 = 1_705_000_000_000_000_000, 1_706_000_000_000_000_000
        t.append(raw.filter(F.col("ts") < c1))
        t.append(raw.filter((F.col("ts") >= c1) & (F.col("ts") < c2)))
        t.append(raw.filter(F.col("ts") >= c2))
        _STATE[key] = ident
    t = _warehouse(spark).load_table(_STATE[key])
    cut = 1_706_000_000_000_000_001  # ns literal, not µs-aligned
    scan = t.scan(filter=col("ts") >= cut)
    plan = scan.plan_files()
    # ns min/max stats must prune the two earlier files (when they exist)
    assert len(plan.files) <= 1, [e.file.file_path for e in plan.files]
    return (scan.df().groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("ts").alias("min_ns"),
                 F.max("ts").alias("max_ns"),
                 F.sum(F.col("ts") % F.lit(1_000_000)).alias("submilli_sum"))
            .orderBy("event_type"))


TIMESTAMP_NS_SQL = """
WITH ns AS (
  SELECT event_id, epoch_us(ts) * 1000 + event_id % 1000 AS ts_ns, event_type
  FROM events
)
SELECT event_type, COUNT(*) AS n,
       MIN(ts_ns) AS min_ns,
       MAX(ts_ns) AS max_ns,
       CAST(SUM(ts_ns % 1000000) AS BIGINT) AS submilli_sum
FROM ns
WHERE ts_ns >= 1706000000000000001
GROUP BY event_type ORDER BY event_type
"""


def delta_snapshot_scan(spark, sf_dir):
    """A13 extension (reference delta-lake module,
    BaseSnapshotDeltaLakeTableAction.java:75): build a Delta-format log
    over the supplier parquet (one add, then a metadata commit), snapshot
    it into the engine by reference, scan through the engine table."""
    key = ("deltasnap", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        import json

        cat = _warehouse(spark)
        ident = f"deltasnap_{_sf_key(sf_dir)}"
        if cat.table_exists(ident):
            cat.drop_table(ident)
        src = os.path.join(sf_dir, "supplier.parquet")
        root = tempfile.mkdtemp(prefix="delta_src_")
        log = os.path.join(root, "_delta_log")
        os.makedirs(log)
        schema_fields = [
            (f.name, f.dataType.jsonValue())
            for f in load_table(spark, sf_dir, "supplier").schema.fields]
        meta = {"metaData": {
            "id": "m1", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps({"type": "struct", "fields": [
                {"name": n, "type": t, "nullable": True, "metadata": {}}
                for n, t in schema_fields]}),
            "partitionColumns": [], "configuration": {}}}
        add = {"add": {"path": src, "partitionValues": {}, "size": 1,
                       "modificationTime": 0, "dataChange": True}}
        with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
            fh.write(json.dumps(meta) + "\n")
            fh.write(json.dumps(add) + "\n")
        from .sources.delta import snapshot_delta_table

        t, n, rewritten = snapshot_delta_table(cat, root, ident)
        assert n == 1 and not rewritten
        _STATE[key] = ident
    t = _warehouse(spark).load_table(_STATE[key])
    return (t.scan(filter=col("s_acctbal") > 0).df()
            .groupBy("s_nationkey")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("s_acctbal"), 2).alias("bal"))
            .orderBy("s_nationkey"))


DELTA_SNAPSHOT_SQL = """
SELECT s_nationkey, COUNT(*) AS n, ROUND(SUM(s_acctbal), 2) AS bal
FROM supplier WHERE s_acctbal > 0
GROUP BY s_nationkey ORDER BY s_nationkey
"""


# ---------------------------------------------------------------------------
# A13+ — import a GENUINE apache/iceberg table (Avro manifests)
# ---------------------------------------------------------------------------

_PA_TO_ICEBERG = {"int64": "long", "int32": "int", "double": "double",
                  "float": "float", "string": "string", "large_string":
                  "string", "bool": "boolean"}


def _reference_iceberg_source(spark, sf_dir, tag, dv=False,
                              format_version=None, relative_paths=False,
                              encryption_key=None):
    """Build a reference-layout Iceberg table whose single data file IS the
    testdata supplier.parquet (by reference), with a position delete (or a
    v3 deletion vector) covering the rows where s_suppkey % 7 == 0 — a
    predicate the DuckDB oracle can reproduce exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from .sources.iceberg_fixture import write_reference_table

    src = os.path.join(sf_dir, "supplier.parquet")
    md = pq.ParquetFile(src)
    schema_json = {"type": "struct", "schema-id": 0, "fields": [
        {"id": i + 1, "name": f.name, "required": False,
         "type": _PA_TO_ICEBERG[str(f.type)]}
        for i, f in enumerate(md.schema_arrow)]}
    keys = md.read(columns=["s_suppkey"])["s_suppkey"].to_pylist()
    victims = [i for i, k in enumerate(keys) if k % 7 == 0]
    root = tempfile.mkdtemp(prefix=f"iceberg_src_{tag}_")
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    data_entry = {"path": src, "record_count": md.metadata.num_rows,
                  "file_size": os.path.getsize(src), "seq": 1}
    if dv:
        import numpy as np

        from .deletion_vectors import write_dv_puffin

        dv_path = os.path.join(root, "data", "dv.puffin")
        d = write_dv_puffin(
            dv_path, {src: np.array(victims, dtype=np.int64)})[0]
        del_entry = {"path": dv_path, "format": "puffin", "content": 1,
                     "record_count": d["cardinality"],
                     "file_size": d["file_size_in_bytes"],
                     "referenced_data_file": src,
                     "content_offset": d["content_offset"],
                     "content_size": d["content_size_in_bytes"],
                     "seq": 2}
    else:
        dl = os.path.join(root, "data", "deletes.parquet")
        pq.write_table(pa.table({
            "file_path": pa.array([src] * len(victims), pa.string()),
            "pos": pa.array(victims, pa.int64())}), dl)
        del_entry = {"path": dl, "content": 1,
                     "record_count": len(victims),
                     "file_size": os.path.getsize(dl), "seq": 2}
    write_reference_table(root, schema_json, [data_entry, del_entry],
                          format_version=(format_version
                                          or (3 if dv else 2)),
                          relative_paths=relative_paths,
                          encryption_key=encryption_key)
    return root


def _iceberg_import_impl(spark, sf_dir, tag, dv, format_version=None,
                         relative_paths=False, encryption_key=None,
                         kms_unwrap=None):
    key = (f"icebergimp_{tag}", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        from .sources.iceberg import snapshot_iceberg_table

        cat = _warehouse(spark)
        ident = f"icebergimp_{tag}_{_sf_key(sf_dir)}"
        if cat.table_exists(ident):
            cat.drop_table(ident)
        root = _reference_iceberg_source(spark, sf_dir, tag, dv=dv,
                                         format_version=format_version,
                                         relative_paths=relative_paths,
                                         encryption_key=encryption_key)
        t, n_data, n_del = snapshot_iceberg_table(cat, root, ident,
                                                  kms_unwrap=kms_unwrap)
        assert n_data == 1 and n_del == 1
        _STATE[key] = ident
    t = _warehouse(spark).load_table(_STATE[key])
    return (t.to_df().groupBy("s_nationkey")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("s_acctbal"), 2).alias("bal"))
            .orderBy("s_nationkey"))


def iceberg_import_scan(spark, sf_dir):
    """Import a reference-layout Iceberg v2 table (metadata JSON + deflate
    Avro manifest list/manifests + parquet position deletes) BY REFERENCE
    and scan it (ManifestReader.java / TableMetadataParser.java interop)."""
    return _iceberg_import_impl(spark, sf_dir, "pos", dv=False)


def iceberg_import_dv_scan(spark, sf_dir):
    """Same, v3: the delete rides as a Puffin deletion-vector blob
    addressed by content_offset/content_size (format/spec.md:1372)."""
    return _iceberg_import_impl(spark, sf_dir, "dv", dv=True)


def iceberg_import_v4_scan(spark, sf_dir):
    """Same table in format-version 4 (V4Metadata.java): PARQUET
    manifests, RELATIVE metadata paths joined to the table location
    (format/spec.md:194-214), no `location` field in the metadata JSON
    (optional in v4), Avro manifest list with first_row_id, and the
    delete as a Puffin DV. The scan result must be identical to the
    v2/v3 imports — same oracle."""
    return _iceberg_import_impl(spark, sf_dir, "v4", dv=True,
                                format_version=4, relative_paths=True)


def iceberg_import_encrypted_scan(spark, sf_dir):
    """Same table with STANDARD TABLE ENCRYPTION (v3): manifests and the
    manifest list are whole-file AES GCM Streams, per-manifest
    StandardKeyMetadata rides in the list entries (fid 519), and the
    manifest-list key chains through metadata `encryption-keys` (KEK
    under KEY_TIMESTAMP AAD, KMS-wrapped — EncryptionUtil.java). The
    import unwraps via the pluggable kms_unwrap and must scan to the
    same result as the plaintext imports — same oracle. The delete is a
    parquet pos-delete (DVs ride Puffin, which the reference does not
    AGS-wrap)."""
    from .encryption import aes_gcm_decrypt

    master = bytes(range(16, 32))
    return _iceberg_import_impl(
        spark, sf_dir, "enc", dv=False, format_version=3,
        encryption_key=master,
        kms_unwrap=lambda wrapped, kid: aes_gcm_decrypt(master, wrapped,
                                                        b""))


def iceberg_import_native_encrypted_scan(spark, sf_dir):
    """Import a reference table whose DATA and POSITION-DELETE parquet
    files are NATIVELY ENCRYPTED — parquet modular encryption with raw
    per-file footer DEKs + AAD prefixes (Parquet.java WriteBuilder
    withFileEncryptionKey/withAADPrefix/withoutAADPrefixStorage), the
    per-file StandardKeyMetadata blob on data_file.key_metadata (fid
    131), under standard table encryption for the metadata tree (the
    reference never leaves plaintext DEKs in plaintext manifests:
    StandardEncryptionManager.java). The import validates and carries
    the blobs VERBATIM; scans and the MoR delete-apply decrypt through
    Spark's own vectorized reader via jvm_crypto.RawDekCryptoFactory
    (pyarrow exposes no raw-footer-key surface — without a JDK this
    refuses loudly, never garbles). Plaintext opens of every content
    file are asserted to fail. Same oracle as the plaintext imports."""
    key = ("icebergimp_natenc", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        import glob as _g
        import secrets
        import shutil

        import pyarrow.parquet as pq

        from . import jvm_crypto
        from .encryption import (aes_gcm_decrypt,
                                 encode_standard_key_metadata)
        from .sources.iceberg import snapshot_iceberg_table
        from .sources.iceberg_fixture import write_reference_table

        if not jvm_crypto.available(spark):
            raise NotImplementedError(
                "natively-encrypted import requires the JVM crypto path "
                "(JDK + RawDekCryptoFactory); unavailable in this session")
        src = os.path.join(sf_dir, "supplier.parquet")
        md = pq.ParquetFile(src)
        schema_json = {"type": "struct", "schema-id": 0, "fields": [
            {"id": i + 1, "name": f.name, "required": False,
             "type": _PA_TO_ICEBERG[str(f.type)]}
            for i, f in enumerate(md.schema_arrow)]}
        root = tempfile.mkdtemp(prefix="iceberg_src_natenc_")
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        sdf = spark.read.parquet(src)

        def write_enc(df, dest, dek, aad):
            tmp = tempfile.mkdtemp(prefix="natenc_w_")
            (df.coalesce(1).write.mode("overwrite")
             .options(**jvm_crypto.raw_writer_options(dek, aad))
             .parquet(tmp))
            shutil.move(_g.glob(os.path.join(tmp, "*.parquet"))[0], dest)
            shutil.rmtree(tmp, ignore_errors=True)

        dek_by_path = {}
        for i, pred in enumerate([F.col("s_suppkey") % 2 == 0,
                                  F.col("s_suppkey") % 2 == 1]):
            dek, aad = secrets.token_bytes(16), secrets.token_bytes(16)
            dest = os.path.join(root, "data", f"enc-{i}.parquet")
            write_enc(sdf.filter(pred), dest, dek, aad)
            dek_by_path[dest] = (dek, aad)

        # victims (s_suppkey % 7 == 0) located by reading the encrypted
        # files BACK through the raw-DEK reader — positions are whatever
        # the encrypted writer produced, no ordering assumption. The same
        # pass collects per-file s_suppkey bounds for the manifest's
        # metric maps: the footer being unreadable without the key makes
        # manifest stats the ONLY pruning source for encrypted imports.
        del_rows, n_rows, bounds = [], {}, {}
        for dest, (dek, aad) in dek_by_path.items():
            rows = (spark.read
                    .options(**jvm_crypto.raw_reader_options(
                        {dest: (dek, aad)}))
                    .parquet(dest)
                    .select(F.col("_metadata.row_index").alias("pos"),
                            "s_suppkey").collect())
            n_rows[dest] = len(rows)
            keys = [int(r.s_suppkey) for r in rows]
            bounds[dest] = (min(keys), max(keys))
            del_rows += [(dest, int(r.pos)) for r in rows
                         if r.s_suppkey % 7 == 0]
        assert del_rows, "fixture must delete at least one row"
        del_rows.sort()
        ddek, daad = secrets.token_bytes(16), secrets.token_bytes(16)
        dpath = os.path.join(root, "data", "enc-deletes.parquet")
        write_enc(spark.createDataFrame(del_rows,
                                        "file_path string, pos long"),
                  dpath, ddek, daad)

        # zero plaintext under data/: every content file refuses a
        # keyless open (encrypted-footer magic, not PAR1)
        for p in _g.glob(os.path.join(root, "data", "*.parquet")):
            try:
                pq.ParquetFile(p)
                raise AssertionError(f"{p} opened without a key")
            except Exception as exc:  # noqa: BLE001
                assert not isinstance(exc, AssertionError), exc

        import struct as _st

        files = [{"path": dest, "record_count": n_rows[dest],
                  "file_size": os.path.getsize(dest), "seq": 1,
                  "key_metadata": encode_standard_key_metadata(
                      dek, aad, os.path.getsize(dest)),
                  # fid 1 = s_suppkey; bounds spec-serialized (<q)
                  "value_counts": [{"key": 1, "value": n_rows[dest]}],
                  "null_value_counts": [{"key": 1, "value": 0}],
                  "lower_bounds": [{"key": 1, "value": _st.pack(
                      "<q", bounds[dest][0])}],
                  "upper_bounds": [{"key": 1, "value": _st.pack(
                      "<q", bounds[dest][1])}]}
                 for dest, (dek, aad) in sorted(dek_by_path.items())]
        files.append({"path": dpath, "content": 1,
                      "record_count": len(del_rows),
                      "file_size": os.path.getsize(dpath), "seq": 2,
                      "key_metadata": encode_standard_key_metadata(
                          ddek, daad, os.path.getsize(dpath))})
        master = bytes(range(32, 48))
        write_reference_table(root, schema_json, files, format_version=3,
                              encryption_key=master)

        # destination must be an ENCRYPTED catalog: the imported entries
        # carry raw plaintext DEKs in key_metadata, and the engine (like
        # the reference) refuses to persist those into plaintext
        # manifests. Assert the refusal on a keyless catalog first.
        from .table import Catalog

        ident = f"icebergimp_natenc_{_sf_key(sf_dir)}"
        unwrap = lambda wrapped, kid: aes_gcm_decrypt(  # noqa: E731
            master, wrapped, b"")
        try:
            snapshot_iceberg_table(_warehouse(spark), root,
                                   ident + "_leak", kms_unwrap=unwrap)
            raise AssertionError(
                "plaintext-catalog import of raw-DEK entries must refuse")
        except ValueError as exc:
            assert "metadata_key" in str(exc), exc
        enc_wh = tempfile.mkdtemp(prefix="iceberg_spark_natenc_wh_")
        dest_key = bytes(range(16, 32))
        cat = Catalog(spark, enc_wh, metadata_key=dest_key)
        t, n_data, n_del = snapshot_iceberg_table(cat, root, ident,
                                                  kms_unwrap=unwrap)
        assert n_data == 2 and n_del == 1
        _STATE[key] = (enc_wh, dest_key, ident)
    enc_wh, dest_key, ident = _STATE[key]
    from .table import Catalog

    t = Catalog(spark, enc_wh, metadata_key=dest_key).load_table(ident)
    return (t.to_df().groupBy("s_nationkey")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("s_acctbal"), 2).alias("bal"))
            .orderBy("s_nationkey"))


def metadata_encryption_scan(spark, sf_dir):
    """AES-GCM-Stream-encrypted table metadata (format/gcm-stream-spec.md,
    encryption.py): create an encrypted-catalog table over nation, append
    + MoR-delete through encrypted version files, verify the on-disk
    versions carry the AGS1 magic and a keyless open fails loudly, then
    scan-aggregate — results must match the plaintext oracle exactly."""
    key = ("enc_scan", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        from .encryption import MAGIC
        from .table import Catalog

        wh = tempfile.mkdtemp(prefix="iceberg_spark_encwh_")
        k = bytes(range(16))
        cat = Catalog(spark, wh, metadata_key=k)
        df = load_table(spark, sf_dir, "nation")
        t = cat.create_table("db.enc_nation", df.schema)
        t.append(df)
        t.delete_where(col("n_nationkey").isin([0, 5, 10, 15, 20]),
                       mode="merge-on-read")
        t = cat.load_table("db.enc_nation")
        mdir = os.path.join(wh, "db", "enc_nation", "metadata")
        assert all(open(os.path.join(mdir, f), "rb").read(4) == MAGIC
                   for f in os.listdir(mdir)
                   if f.endswith(".metadata.json"))
        try:
            Catalog(spark, wh).load_table("db.enc_nation")
            raise AssertionError("keyless open must fail")
        except ValueError:
            pass
        _STATE[key] = (wh, k)
    wh, k = _STATE[key]
    from .table import Catalog

    t = Catalog(spark, wh, metadata_key=k).load_table("db.enc_nation")
    return (t.to_df().groupBy("n_regionkey")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("n_regionkey"))


METADATA_ENCRYPTION_SQL = """
SELECT n_regionkey, COUNT(*) AS n
FROM nation WHERE n_nationkey % 5 <> 0
GROUP BY n_regionkey ORDER BY n_regionkey
"""


def encrypted_manifests_scan(spark, sf_dir):
    """Engine-native manifest + manifest-list encryption (reference
    StandardEncryptionManager, format/spec.md `encryption-keys`;
    encryption.py ManifestCrypto): under a metadata_key catalog the
    WHOLE metadata tree encrypts — metadata.json versions AND every
    manifest/manifest list as AES GCM Streams with per-file keys
    chained through KEK-wrapped StandardKeyMetadata entries. Lifecycle:
    multi-append, MoR delete, compaction; verify every metadata parquet
    on disk carries the AGS1 magic and the snapshot key-id chain
    resolves; the final aggregate runs through DISTRIBUTED planning
    (manifests decrypt executor-side) against the plaintext oracle."""
    key = ("enc_manifests", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        import glob as _glob

        from .encryption import MAGIC
        from .maintenance import rewrite_data_files
        from .table import Catalog

        wh = tempfile.mkdtemp(prefix="iceberg_spark_encmanwh_")
        k = bytes(range(16, 32))
        cat = Catalog(spark, wh, metadata_key=k)
        df = load_table(spark, sf_dir, "orders")
        t = cat.create_table("db.enc_orders", df.schema)
        half = df.agg(F.max("o_orderkey")).collect()[0][0] // 2
        t.append(df.filter(F.col("o_orderkey") <= half))
        t.append(df.filter(F.col("o_orderkey") > half))
        t.delete_where(col("o_orderkey") <= 256, mode="merge-on-read")
        rewrite_data_files(t.refresh())
        t = cat.load_table("db.enc_orders")
        files = _glob.glob(os.path.join(
            t.location, "metadata", "manifest*", "*.parquet"))
        assert files and all(
            open(p, "rb").read(4) == MAGIC for p in files), \
            "plaintext manifest found under an encrypted table"
        assert all(s.key_id for s in t.metadata.snapshots)
        _STATE[key] = (wh, k)
    wh, k = _STATE[key]
    from .table import Catalog

    t = Catalog(spark, wh, metadata_key=k).load_table("db.enc_orders")
    return (t.scan(planning_mode="distributed").df()
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("o_totalprice"), 2).alias("total"))
            .orderBy("o_orderpriority"))


ENCRYPTED_MANIFESTS_SQL = """
SELECT o_orderpriority, COUNT(*) AS n,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders WHERE o_orderkey > 256
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def data_encryption_scan(spark, sf_dir):
    """Native DATA-file encryption (parquet modular encryption,
    parquet_crypto.py; reference StandardEncryptionManager +
    parquet/.../Parquet.java encryption hooks): create a table with
    `encryption.key-id`, append customers + MoR-delete through
    ENCRYPTED parquet data files, verify every data file on disk has
    the encrypted-footer magic and a keyless scan fails loudly, then
    scan-aggregate — results must match the plaintext oracle exactly."""
    key = ("data_enc_scan", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        import glob as _glob

        from . import parquet_crypto as PC
        from .table import Catalog

        wh = tempfile.mkdtemp(prefix="iceberg_spark_dataenc_")
        kid = "bench-table-key"
        PC.register_key(kid, bytes(range(16, 32)))
        cat = Catalog(spark, wh)
        df = load_table(spark, sf_dir, "customer")
        t = cat.create_table("db.enc_customer", df.schema,
                             partition_by=["c_mktsegment"],
                             properties={PC.KEY_ID_PROP: kid})
        t.append(df)
        t.delete_where(col("c_custkey") <= 100, mode="merge-on-read")
        t = cat.load_table("db.enc_customer")
        files = _glob.glob(os.path.join(wh, "db", "enc_customer", "data",
                                        "**", "*.parquet"), recursive=True)
        assert files and all(
            open(p, "rb").read(4) == b"PARE" for p in files
            if "/deletes-" not in p and "/eqdel-" not in p)
        PC.unregister_key(kid)
        try:
            t.to_df().count()
            raise AssertionError("keyless encrypted scan must fail")
        except ValueError:
            pass
        PC.register_key(kid, bytes(range(16, 32)))
        _STATE[key] = (wh, kid)
    wh, kid = _STATE[key]
    from .table import Catalog

    t = Catalog(spark, wh).load_table("db.enc_customer")
    return (t.to_df().groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("c_acctbal"), 2).alias("bal"))
            .orderBy("c_mktsegment"))


DATA_ENCRYPTION_SQL = """
SELECT c_mktsegment, COUNT(*) AS n, ROUND(SUM(c_acctbal), 2) AS bal
FROM customer WHERE c_custkey > 100
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def metrics_modes_scan(spark, sf_dir):
    """Metrics modes (write.metadata.metrics.* — reference
    MetricsModes.java, default truncate(16)): ingest the documents
    corpus with `counts` on the 10KB text column (no document text in
    manifests at all), `none` on source, `full` on doc_id, then verify
    the manifest shapes and scan-aggregate — bounds-free columns filter
    full-scan, truncated/full columns still prune, results match the
    plaintext oracle exactly."""
    key = ("metrics_modes", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        from .manifests import metrics_config
        from .table import Catalog

        wh = tempfile.mkdtemp(prefix="iceberg_spark_metrics_")
        cat = Catalog(spark, wh)
        df = load_table(spark, sf_dir, "documents")
        t = cat.create_table("db.docs_metrics", df.schema, properties={
            "write.metadata.metrics.column.text": "counts",
            "write.metadata.metrics.column.source": "none",
            "write.metadata.metrics.column.doc_id": "full",
        })
        t.append(df)
        t = cat.load_table("db.docs_metrics")
        for e in t.scan().plan_files().files:
            st = e.file.stats
            assert "source" not in st
            assert st["text"][0] is None and st["text"][1] is None
            assert st["text"][4] == e.file.record_count
            assert st["doc_id"][0] is not None
            # default truncate(16) on lang (short values stay exact,
            # still <= 16 chars)
            assert st["lang"][0] is None or len(st["lang"][0]) <= 16
        _STATE[key] = wh
    from .table import Catalog

    t = Catalog(spark, _STATE[key]).load_table("db.docs_metrics")
    return (t.to_df()
            .where(F.col("source").isin("src1", "src2", "src3")
                   & (F.col("n_chars") > 500))
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("n_chars").alias("chars"))
            .orderBy("lang"))


METRICS_MODES_SQL = """
SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
FROM documents WHERE source IN ('src1','src2','src3') AND n_chars > 500
GROUP BY lang ORDER BY lang
"""


def object_storage_scan(spark, sf_dir):
    """Object-storage layout (reference LocationProviders.java
    ObjectStoreLocationProvider): `write.object-storage.enabled` puts
    every data path behind a murmur3 binary entropy prefix
    (1001/1001/1001/10011001) so object-store keys spread across prefix
    ranges instead of funneling one throttled S3 prefix. Ingest orders
    partitioned by o_orderpriority, MoR-delete, verify the hashed
    layout on disk, then scan-aggregate against the plaintext oracle."""
    key = ("objstore", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        import re as _re

        from .table import Catalog

        wh = tempfile.mkdtemp(prefix="iceberg_spark_objstore_")
        cat = Catalog(spark, wh)
        df = load_table(spark, sf_dir, "orders")
        t = cat.create_table("db.orders_obj", df.schema,
                             partition_by=["o_orderpriority"],
                             properties={
                                 "write.object-storage.enabled": "true"})
        t.append(df)
        t.delete_where(col("o_orderkey") <= 512, mode="merge-on-read")
        t = cat.load_table("db.orders_obj")
        root = os.path.join(t.location, "data")
        for e in t.scan().plan_files().files:
            rel = os.path.relpath(e.file.file_path, root)
            assert _re.match(r"[01]{4}/[01]{4}/[01]{4}/[01]{8}/", rel), rel
        _STATE[key] = wh
    from .table import Catalog

    t = Catalog(spark, _STATE[key]).load_table("db.orders_obj")
    return (t.to_df().groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("o_orderkey").alias("keysum"))
            .orderBy("o_orderpriority"))


OBJECT_STORAGE_SQL = """
SELECT o_orderpriority, COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS keysum
FROM orders WHERE o_orderkey > 512
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def iceberg_import_avro_scan(spark, sf_dir):
    """Import a reference-layout Iceberg table whose DATA file is an AVRO
    container (the reference reads parquet, ORC, and Avro data —
    core/.../avro/Avro.java, api/.../FileFormat.java:26-31): the file
    registers by reference with a row count read from the container's
    block headers (the manifest entry deliberately omits record_count to
    exercise that fallback); no min/max stats, so the file never prunes
    and the residual filter applies in full."""
    key = ("icebergimp_avro", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        import pyarrow.parquet as pq

        from .avro_file import write_avro
        from .sources.iceberg import snapshot_iceberg_table
        from .sources.iceberg_fixture import write_reference_table

        src = os.path.join(sf_dir, "supplier.parquet")
        tbl = pq.read_table(src)
        root = tempfile.mkdtemp(prefix="iceberg_src_avro_")
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        _A = {"int64": "long", "int32": "int", "double": "double",
              "float": "float", "string": "string",
              "large_string": "string", "bool": "boolean"}
        avro_schema = {"type": "record", "name": "supplier", "fields": [
            {"name": f.name, "type": _A[str(f.type)]} for f in tbl.schema]}
        apath = os.path.join(root, "data", "supplier.avro")
        size = write_avro(apath, avro_schema, tbl.to_pylist())
        schema_json = {"type": "struct", "schema-id": 0, "fields": [
            {"id": i + 1, "name": f.name, "required": False,
             "type": _PA_TO_ICEBERG[str(f.type)]}
            for i, f in enumerate(tbl.schema)]}
        data_entry = {"path": apath, "format": "avro",
                      "record_count": 0,  # forces the block-header count
                      "file_size": size, "seq": 1}
        write_reference_table(root, schema_json, [data_entry])
        cat = _warehouse(spark)
        ident = f"icebergimp_avro_{_sf_key(sf_dir)}"
        if cat.table_exists(ident):
            cat.drop_table(ident)
        t, n_data, n_del = snapshot_iceberg_table(cat, root, ident)
        assert n_data == 1 and n_del == 0
        live = t.scan().plan_files().files
        assert live[0].file.record_count == tbl.num_rows  # header count
        _STATE[key] = ident
    t = _warehouse(spark).load_table(_STATE[key])
    return (t.to_df().where(F.col("s_acctbal") > 0)
            .groupBy("s_nationkey")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("s_acctbal"), 2).alias("bal"))
            .orderBy("s_nationkey"))


ICEBERG_IMPORT_AVRO_SQL = """
SELECT s_nationkey, COUNT(*) AS n, ROUND(SUM(s_acctbal), 2) AS bal
FROM supplier WHERE s_acctbal > 0
GROUP BY s_nationkey ORDER BY s_nationkey
"""


def iceberg_export_roundtrip_scan(spark, sf_dir):
    """Outbound interop: an engine table with MoR position deletes is
    EXPORTED to the reference layout (metadata JSON + Avro manifest
    list/manifests, export_reference_metadata) and re-imported; the scan
    runs through the round-tripped table, so the oracle checks that both
    interop directions preserve delete semantics exactly."""
    key = ("icebergexp", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        from .sources.iceberg import (export_reference_metadata,
                                      snapshot_iceberg_table)

        cat = _warehouse(spark)
        for ident in (f"icebergexp_src_{_sf_key(sf_dir)}",
                      f"icebergexp_back_{_sf_key(sf_dir)}"):
            if cat.table_exists(ident):
                cat.drop_table(ident)
        t, df = _fresh(spark, sf_dir, "supplier", "icebergexp_src",
                       properties={"write.delete.mode": "merge-on-read"})
        t.append(df)
        t.delete_where(E.col("s_suppkey") <= 40, mode="merge-on-read")
        t = t.refresh()
        dest = tempfile.mkdtemp(prefix="iceberg_export_")
        export_reference_metadata(t, dest)
        back = f"icebergexp_back_{_sf_key(sf_dir)}"
        snapshot_iceberg_table(cat, dest, back)
        _STATE[key] = back
    t = _warehouse(spark).load_table(_STATE[key])
    return (t.to_df().groupBy("s_nationkey")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("s_acctbal"), 2).alias("bal"))
            .orderBy("s_nationkey"))


ICEBERG_EXPORT_SQL = """
SELECT s_nationkey, COUNT(*) AS n, ROUND(SUM(s_acctbal), 2) AS bal
FROM supplier WHERE s_suppkey > 40
GROUP BY s_nationkey ORDER BY s_nationkey
"""


def iceberg_export_v4_roundtrip_scan(spark, sf_dir):
    """FORMAT-VERSION 4 export (V4Metadata.java layout: PARQUET
    manifests, Avro manifest list with first_row_id fid 520,
    next-row-id/first-row-id row lineage) of an engine table with MoR
    deletes and a two-commit history, re-imported with full history.
    Asserts in the fixture: the exported metadata JSON is pinned v4 with
    parquet manifests on disk; per-file first_row_id and the table
    next-row-id survive the round trip EXACTLY (row-lineage stability);
    snapshot ids preserved. The scan oracle checks delete semantics."""
    key = ("icebergexp_v4", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        import glob as _glob
        import json as _json

        from .sources.iceberg import (export_reference_metadata,
                                      register_iceberg_table)

        cat = _warehouse(spark)
        for ident in (f"icebergexp_v4_src_{_sf_key(sf_dir)}",
                      f"icebergexp_v4_back_{_sf_key(sf_dir)}"):
            if cat.table_exists(ident):
                cat.drop_table(ident)
        t, df = _fresh(spark, sf_dir, "supplier", "icebergexp_v4_src",
                       properties={"write.delete.mode": "merge-on-read"})
        half = df.agg(F.max("s_suppkey")).collect()[0][0] // 2
        t.append(df.filter(F.col("s_suppkey") <= half))
        t.append(df.filter(F.col("s_suppkey") > half))
        t.delete_where(E.col("s_suppkey") <= 40, mode="merge-on-read")
        t = t.refresh()
        dest = tempfile.mkdtemp(prefix="iceberg_export_v4_")
        mp = export_reference_metadata(t, dest, full_history=True,
                                       format_version=4)
        md = _json.load(open(mp))
        assert md["format-version"] == 4
        assert md.get("next-row-id") == t.metadata.next_row_id > 0
        assert _glob.glob(os.path.join(dest, "metadata", "*-m0.parquet")), \
            "v4 export must write PARQUET manifests"
        back = f"icebergexp_v4_back_{_sf_key(sf_dir)}"
        t2, n_snaps, _n = register_iceberg_table(cat, dest, back)
        assert n_snaps == 3  # two appends + the MoR delete
        assert {s.snapshot_id for s in t2.metadata.snapshots} >= {
            s.snapshot_id for s in t.metadata.snapshots}
        assert t2.metadata.next_row_id == t.metadata.next_row_id
        src_lin = sorted(f.file.first_row_id
                         for f in t.scan().plan_files().files)
        rt_lin = sorted(f.file.first_row_id
                        for f in t2.scan().plan_files().files)
        assert src_lin == rt_lin and all(v is not None for v in rt_lin), \
            (src_lin, rt_lin)
        _STATE[key] = back
    t = _warehouse(spark).load_table(_STATE[key])
    return (t.to_df().groupBy("s_nationkey")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("s_acctbal"), 2).alias("bal"))
            .orderBy("s_nationkey"))


def iceberg_export_shredded_roundtrip_scan(spark, sf_dir):
    """SPEC-PHYSICAL variant shredding on export (reference parquet/.../
    ParquetVariantVisitor.java, VariantShreddingFunction.java; Parquet
    VariantShredding.md): a table with declared `write.variant.shred.*`
    paths exports its data files transcoded into the typed_value layout
    — the variant group gains `optional group typed_value { required
    group <field> { optional binary value; optional <T> typed_value } }`
    and the engine's `_shred_f…` companion columns are dropped — so a
    reference reader gets REAL shredding from the exported files, not a
    plain variant column. Companion bounds ride the exported manifests
    under their synthetic field ids and the importer maps them back, so
    extract() file pruning survives the round trip (asserted)."""
    key = ("icebergexp_shred", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        from .sources.iceberg import (export_reference_metadata,
                                      register_iceberg_table)
        from .variant_shred import jvm_parquet_schema

        cat = _warehouse(spark)
        for ident in (f"icebergexp_shred_src_{_sf_key(sf_dir)}",
                      f"icebergexp_shred_back_{_sf_key(sf_dir)}"):
            if cat.table_exists(ident):
                cat.drop_table(ident)
        docs = load_table(spark, sf_dir, "documents")
        df = docs.select(
            "doc_id",
            F.parse_json(F.concat(
                F.lit('{"len": '), F.length("text").cast("string"),
                F.lit(', "key": '), F.col("doc_id").cast("string"),
                F.lit('}'))).alias("meta"))
        ident = f"icebergexp_shred_src_{_sf_key(sf_dir)}"
        t = cat.create_table(ident, df.schema, properties={
            "write.variant.shred.meta": "$.len:long;$.key:long"})
        mx = docs.agg(F.max("doc_id")).collect()[0][0]
        step = mx // 4 + 1
        for lo in range(0, mx + 1, step):  # doc_id-clustered files
            t.append(df.filter((F.col("doc_id") >= lo)
                               & (F.col("doc_id") < lo + step)))
        t = cat.load_table(ident)
        dest = tempfile.mkdtemp(prefix="iceberg_export_shred_")
        mp = export_reference_metadata(t, dest)
        back = f"icebergexp_shred_back_{_sf_key(sf_dir)}"
        t2, _n_snaps, n_files = register_iceberg_table(cat, dest, back)
        assert n_files == len(t.scan().plan_files().files)
        # every exported data file carries the spec-physical layout
        for e in t2.scan().plan_files().files:
            phys = jvm_parquet_schema(spark, e.file.file_path)
            assert "typed_value" in phys, e.file.file_path
            assert "_shred_f" not in phys, e.file.file_path
        hi = mx - mx // 8
        pruned = t2.scan(
            filter=E.extract("meta", "$.key", "long") >= hi).plan_files()
        total = len(t2.scan().plan_files().files)
        assert 0 < len(pruned.files) < total, (
            "imported shredded files must still FILE-prune on extract() "
            f"bounds: {len(pruned.files)}/{total}")
        _STATE[key] = (back, hi)
    back, hi = _STATE[key]
    t = _warehouse(spark).load_table(back)
    sc = t.scan(filter=E.extract("meta", "$.key", "long") >= hi)
    return (sc.df()
            .groupBy((F.variant_get("meta", "$.key", "bigint") % 7)
                     .alias("k"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.variant_get("meta", "$.len", "bigint"))
                 .alias("total_len"))
            .orderBy("k"))


# oracle derives hi = max - max/8 the same way (integer division)
ICEBERG_EXPORT_SHRED_SQL = """
WITH b AS (SELECT MAX(doc_id) AS mx FROM documents)
SELECT CAST(doc_id % 7 AS BIGINT) AS k, COUNT(*) AS n,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS total_len
FROM documents, b
WHERE doc_id >= b.mx - b.mx // 8
GROUP BY 1 ORDER BY k
"""


def lineage_scan(spark, sf_dir):
    """Row lineage as data (format/spec.md:460-546; F5): nation appended
    as ONE file in n_nationkey order, so `_row_id` (first_row_id +
    position) is exactly n_nationkey; a MoR UPDATE of every fifth key at
    sequence 2 must PRESERVE the updated rows' _row_id while bumping
    their _last_updated_sequence_number — both returned as columns the
    plaintext oracle derives arithmetically."""
    key = ("lineage", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        cat = _warehouse(spark)
        ident = f"lineage_{_sf_key(sf_dir)}"
        if cat.table_exists(ident):
            cat.drop_table(ident)
        df = (load_table(spark, sf_dir, "nation")
              .orderBy("n_nationkey").coalesce(1))
        t = cat.create_table(ident, df.schema, properties={
            "write.update.mode": "merge-on-read"})
        t.append(df)
        t = cat.load_table(ident)
        assert len(t.scan().plan_files().files) == 1, \
            "lineage fixture needs ONE ordered data file"
        t.update(E.col("n_nationkey").isin([0, 5, 10, 15, 20]),
                 {"n_comment": F.lit("updated")}, mode="merge-on-read")
        _STATE[key] = ident
    t = _warehouse(spark).load_table(_STATE[key])
    return (t.to_df(with_lineage=True)
            .select("n_nationkey",
                    F.col("_row_id").alias("row_id"),
                    F.col("_last_updated_sequence_number").alias(
                        "last_upd"))
            .orderBy("n_nationkey"))


LINEAGE_SQL = """
SELECT n_nationkey, CAST(n_nationkey AS BIGINT) AS row_id,
       CAST(CASE WHEN n_nationkey % 5 = 0 THEN 2 ELSE 1 END AS BIGINT)
           AS last_upd
FROM nation ORDER BY n_nationkey
"""


def iceberg_export_encrypted_roundtrip_scan(spark, sf_dir):
    """Encrypted outbound interop, closing the standard-table-encryption
    loop: an engine table whose OWN metadata tree encrypts (catalog
    metadata_key -> encrypted metadata.json + manifests + lists) with MoR
    deletes EXPORTS to the reference layout — Avro manifests/lists as AES
    GCM Streams, StandardKeyMetadata in the list entries, KEK chain in
    `encryption-keys`, all KMS-wrapped by the SAME key (derived
    automatically; a plaintext export of an encrypted tree is refused) —
    then re-imports through the engine's own kms_unwrap path. The scan
    runs on the round-tripped table, so the oracle proves both encrypted
    interop directions preserve delete semantics exactly."""
    key = ("icebergexpenc", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        from .encryption import MAGIC, aes_gcm_decrypt
        from .sources.iceberg import (export_reference_metadata,
                                      snapshot_iceberg_table)
        from .table import Catalog

        master = bytes(range(8, 24))
        src_wh = tempfile.mkdtemp(prefix="iceberg_spark_expenc_src_")
        scat = Catalog(spark, src_wh, metadata_key=master)
        df = load_table(spark, sf_dir, "supplier")
        t = scat.create_table("db.sup_enc", df.schema, properties={
            "write.delete.mode": "merge-on-read"})
        t.append(df)
        t.delete_where(E.col("s_suppkey") <= 40, mode="merge-on-read")
        t = scat.load_table("db.sup_enc")
        dest = tempfile.mkdtemp(prefix="iceberg_export_enc_")
        export_reference_metadata(t, dest)  # key derived from the catalog
        import glob as _glob

        avros = _glob.glob(os.path.join(dest, "metadata", "*.avro"))
        assert avros and all(
            open(p, "rb").read(4) == MAGIC for p in avros), \
            "exported manifests/lists must be AES GCM Streams"
        cat = _warehouse(spark)
        back = f"icebergexpenc_back_{_sf_key(sf_dir)}"
        if cat.table_exists(back):
            cat.drop_table(back)
        snapshot_iceberg_table(
            cat, dest, back,
            kms_unwrap=lambda wrapped, kid: aes_gcm_decrypt(
                master, wrapped, b""))
        _STATE[key] = back
    t = _warehouse(spark).load_table(_STATE[key])
    return (t.to_df().groupBy("s_nationkey")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("s_acctbal"), 2).alias("bal"))
            .orderBy("s_nationkey"))


ICEBERG_IMPORT_SQL = """
SELECT s_nationkey, COUNT(*) AS n, ROUND(SUM(s_acctbal), 2) AS bal
FROM supplier WHERE s_suppkey % 7 <> 0
GROUP BY s_nationkey ORDER BY s_nationkey
"""


def iceberg_export_transcode_roundtrip_scan(spark, sf_dir):
    """Export of a table whose DATA files carry the engine's parquet-kms
    envelope (which the reference cannot unwrap):
    `transcode_encrypted_data=True` re-encrypts data + pos-delete copies
    as reference raw-DEK files (fresh per-file DEK/AAD, SKM blob on the
    entry, pos-delete content remapped to the copied paths), under an
    encrypted metadata tree. The export re-imports through kms_unwrap +
    the JVM raw-DEK reader and must scan to the plaintext oracle —
    closing the LAST encrypted-export refusal (COVERAGE r9)."""
    key = ("icebergexptrans", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        import glob as _glob

        import pyarrow.parquet as pq

        from . import parquet_crypto as PC
        from .encryption import aes_gcm_decrypt
        from .sources.iceberg import (export_reference_metadata,
                                      snapshot_iceberg_table)
        from .table import Catalog

        PC.register_key("trans-kms", bytes(range(40, 56)))
        master = bytes(range(24, 40))
        src_wh = tempfile.mkdtemp(prefix="iceberg_spark_trans_src_")
        scat = Catalog(spark, src_wh)
        df = load_table(spark, sf_dir, "supplier")
        t = scat.create_table("db.sup_kms", df.schema, properties={
            PC.KEY_ID_PROP: "trans-kms",
            "write.delete.mode": "merge-on-read"})
        t.append(df)
        victims = [r.s_suppkey for r in df.select("s_suppkey").collect()
                   if r.s_suppkey % 7 == 0]
        t.delete_where(col("s_suppkey").isin(victims),
                       mode="merge-on-read")
        t = scat.load_table("db.sup_kms")
        dest = tempfile.mkdtemp(prefix="iceberg_export_trans_")
        export_reference_metadata(t, dest, encryption_key=master,
                                  transcode_encrypted_data=True)
        tfiles = _glob.glob(os.path.join(dest, "data", "*.parquet"))
        assert len(tfiles) >= 2, tfiles  # data copies + pos-delete copy
        for p in tfiles:  # every transcoded copy refuses a keyless open
            try:
                pq.ParquetFile(p)
                raise AssertionError(f"{p} opened without a key")
            except Exception as exc:  # noqa: BLE001
                assert not isinstance(exc, AssertionError), exc
        # re-import destination must encrypt its metadata tree: the
        # transcoded copies carry raw DEKs (plaintext-DEK leak guard)
        back_wh = tempfile.mkdtemp(prefix="iceberg_spark_trans_back_")
        back_key = bytes(range(56, 72))
        cat = Catalog(spark, back_wh, metadata_key=back_key)
        back = f"icebergexptrans_back_{_sf_key(sf_dir)}"
        snapshot_iceberg_table(
            cat, dest, back,
            kms_unwrap=lambda wrapped, kid: aes_gcm_decrypt(
                master, wrapped, b""))
        _STATE[key] = (back_wh, back_key, back)
    back_wh, back_key, back = _STATE[key]
    from .table import Catalog as _Cat

    t = _Cat(spark, back_wh, metadata_key=back_key).load_table(back)
    return (t.to_df().groupBy("s_nationkey")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("s_acctbal"), 2).alias("bal"))
            .orderBy("s_nationkey"))


def hadoop_fileio_scan(spark, sf_dir):
    """FileIO-on-Hadoop as a permanent registry fixture (SURVEY §2.A15,
    io.HadoopFileIO; reference HadoopFileIO.java): the warehouse is
    `file://`-scheme-prefixed END-TO-END, so every metadata read/write,
    rename-no-clobber commit, manifest IO, and data-file listing in this
    entry routes through the JVM Hadoop FileSystem — the exact code path
    an s3a:// or hdfs:// deployment runs — instead of the zero-overhead
    local FileIO. Full lifecycle (create, append, MoR delete, refresh)
    then scan-aggregate against the plaintext oracle."""
    key = ("hadoop_fileio", _sf_key(sf_dir))
    if key not in _STATE:
        _ensure_conf(spark)
        from .io import HadoopFileIO, resolve_io
        from .table import Catalog

        wh = "file://" + tempfile.mkdtemp(prefix="iceberg_spark_hadoopio_")
        cat = Catalog(spark, wh)
        df = load_table(spark, sf_dir, "supplier")
        t = cat.create_table("db.sup_hadoop", df.schema,
                             properties={"write.delete.mode":
                                         "merge-on-read"})
        t.append(df)
        t.delete_where(col("s_suppkey") <= 40, mode="merge-on-read")
        t = cat.load_table("db.sup_hadoop")
        assert t.location.startswith("file://"), t.location
        assert isinstance(resolve_io(t.location, spark), HadoopFileIO)
        _STATE[key] = wh
    from .table import Catalog

    t = Catalog(spark, _STATE[key]).load_table("db.sup_hadoop")
    return (t.to_df().groupBy("s_nationkey")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("s_acctbal"), 2).alias("bal"))
            .orderBy("s_nationkey"))


REGISTRY = {
    "nan_metrics_scan": (nan_metrics_scan, NAN_METRICS_SQL),
    "iceberg_import_scan": (iceberg_import_scan, ICEBERG_IMPORT_SQL),
    "iceberg_import_dv_scan": (iceberg_import_dv_scan, ICEBERG_IMPORT_SQL),
    "iceberg_import_v4_scan": (iceberg_import_v4_scan, ICEBERG_IMPORT_SQL),
    "iceberg_import_encrypted_scan": (iceberg_import_encrypted_scan,
                                      ICEBERG_IMPORT_SQL),
    "iceberg_import_native_encrypted_scan": (
        iceberg_import_native_encrypted_scan, ICEBERG_IMPORT_SQL),
    "iceberg_export_transcode_roundtrip_scan": (
        iceberg_export_transcode_roundtrip_scan, ICEBERG_IMPORT_SQL),
    "iceberg_import_avro_scan": (iceberg_import_avro_scan,
                                 ICEBERG_IMPORT_AVRO_SQL),
    "hadoop_fileio_scan": (hadoop_fileio_scan, ICEBERG_EXPORT_SQL),
    "metadata_encryption_scan": (metadata_encryption_scan,
                                 METADATA_ENCRYPTION_SQL),
    "encrypted_manifests_scan": (encrypted_manifests_scan,
                                 ENCRYPTED_MANIFESTS_SQL),
    "data_encryption_scan": (data_encryption_scan, DATA_ENCRYPTION_SQL),
    "metrics_modes_scan": (metrics_modes_scan, METRICS_MODES_SQL),
    "object_storage_scan": (object_storage_scan, OBJECT_STORAGE_SQL),
    "iceberg_export_roundtrip_scan": (iceberg_export_roundtrip_scan,
                                      ICEBERG_EXPORT_SQL),
    "iceberg_export_encrypted_roundtrip_scan": (
        iceberg_export_encrypted_roundtrip_scan, ICEBERG_EXPORT_SQL),
    "iceberg_export_v4_roundtrip_scan": (
        iceberg_export_v4_roundtrip_scan, ICEBERG_EXPORT_SQL),
    "iceberg_export_shredded_roundtrip_scan": (
        iceberg_export_shredded_roundtrip_scan, ICEBERG_EXPORT_SHRED_SQL),
    "lineage_scan": (lineage_scan, LINEAGE_SQL),
    "timestamp_ns_scan": (timestamp_ns_scan, TIMESTAMP_NS_SQL),
    "delta_snapshot_scan": (delta_snapshot_scan, DELTA_SNAPSHOT_SQL),
    "auto_compaction_scan": (auto_compaction_scan, AUTO_COMPACTION_SQL),
    "relocated_table_scan": (relocated_table_scan, RELOCATED_SQL),
    "runtime_filter_scan": (runtime_filter_scan, RUNTIME_FILTER_SQL),
    "streaming_watermark_scan": (streaming_watermark_scan, STREAMING_WATERMARK_SQL),
    "type_promotion_scan": (type_promotion_scan, TYPE_PROMOTION_SQL),
    "default_values_scan": (default_values_scan, DEFAULT_VALUES_SQL),
    "orc_roundtrip_scan": (orc_roundtrip_scan, ORC_RT_SQL),
    "hive_add_files_scan": (hive_add_files_scan, HIVE_ADD_SQL),
    "avro_roundtrip_scan": (avro_roundtrip_scan, AVRO_RT_SQL),
    "merge_append_scan": (merge_append_scan, MERGE_APPEND_SQL),
    "dynamic_overwrite_scan": (dynamic_overwrite_scan, DYN_OVERWRITE_SQL),
    "schema_evolution_scan": (schema_evolution_scan, SCHEMA_EVO_SQL),
    "spec_evolution_scan": (spec_evolution_scan, SPEC_EVO_SQL),
    "branch_write_scan": (branch_write_scan, BRANCH_SQL),
    "rollback_cherrypick_scan": (rollback_cherrypick_scan, CHERRYPICK_SQL),
    "changelog_agg_scan": (changelog_agg_scan, CHANGELOG_SQL),
    "compaction_scan": (compaction_scan, COMPACTION_SQL),
    "zorder_scan": (zorder_scan, ZORDER_SQL),
    "expire_snapshots_scan": (expire_snapshots_scan, EXPIRE_SQL),
    "expire_clean_metadata_scan": (expire_clean_metadata_scan,
                                   EXPIRE_CLEAN_SQL),
    "rest_plan_scan": (rest_plan_scan, REST_PLAN_SQL),
    "rewrite_manifests_scan": (rewrite_manifests_scan, RW_MANIFESTS_SQL),
    "orphan_cleanup_scan": (orphan_cleanup_scan, ORPHAN_SQL),
    "pos_delete_rewrite_dv_scan": (pos_delete_rewrite_dv_scan, POS_DV_SQL),
    "native_dv_delete_scan": (native_dv_delete_scan, POS_DV_SQL),
    "transaction_scan": (transaction_scan, TXN_SQL),
    "rtas_scan": (rtas_scan, RTAS_SQL),
    "metadata_partitions_scan": (metadata_partitions_scan, META_PARTITIONS_SQL),
    "metadata_files_scan": (metadata_files_scan, META_FILES_SQL),
    "partition_stats_scan": (partition_stats_scan, PARTITION_STATS_SQL),
    "table_stats_ndv_scan": (table_stats_ndv_scan, NDV_SQL),
    "stats_ndv_roundtrip_scan": (stats_ndv_roundtrip_scan, NDV_SQL),
    "rewrite_table_path_scan": (rewrite_table_path_scan, DR_COPY_SQL),
    "rewrite_table_path_encrypted_scan": (
        rewrite_table_path_encrypted_scan, DR_COPY_ENC_SQL),
    "sql_view_scan": (sql_view_scan, SQL_VIEW_SQL),
    "sql_ddl_lifecycle_scan": (sql_ddl_lifecycle_scan, SQL_DDL_SQL),
    "spj_join_scan": (spj_join_scan, SPJ_JOIN_SQL),
    "streaming_sink_scan": (streaming_sink_scan, STREAMING_SQL),
    "call_procedures_scan": (call_procedures_scan, CALL_PROC_SQL),
}
