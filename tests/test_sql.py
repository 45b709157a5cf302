"""SQL veneer tests: CALL procedures, DDL extensions, row-level SQL,
views/functions, time travel, metadata tables (SURVEY §2.M/§2.N/§2.J)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


@pytest.fixture()
def seeded(catalog, spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catalog.sql(
        "CREATE TABLE db.t (id bigint, cat string, v double) "
        "PARTITIONED BY (cat)")
    catalog.sql(
        "INSERT INTO db.t SELECT * FROM VALUES "
        "(1, 'a', 1.0), (2, 'a', 2.0), (3, 'b', 3.0), (4, 'b', 4.0) "
        "AS v(id, cat, v)")
    return catalog.load_table("db.t")


def test_create_insert_select(seeded, catalog):
    rows = catalog.sql("SELECT cat, count(*) AS n FROM db.t GROUP BY cat "
                       "ORDER BY cat").collect()
    assert [(r.cat, r.n) for r in rows] == [("a", 2), ("b", 2)]


def test_delete_update_sql(seeded, catalog):
    catalog.sql("DELETE FROM db.t WHERE id = 4")
    catalog.sql("UPDATE db.t SET v = v * 10 WHERE cat = 'a'")
    rows = catalog.sql("SELECT id, v FROM db.t ORDER BY id").collect()
    assert [(r.id, r.v) for r in rows] == [(1, 10.0), (2, 20.0), (3, 3.0)]


def test_merge_sql(seeded, catalog, spark):
    spark.createDataFrame(
        [Row(id=2, cat="a", v=200.0), Row(id=9, cat="c", v=9.0)]
    ).createOrReplaceTempView("src")
    catalog.sql(
        "MERGE INTO db.t AS tgt USING src AS s ON tgt.id = s.id "
        "WHEN MATCHED THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED THEN INSERT *")
    rows = catalog.sql("SELECT id, v FROM db.t ORDER BY id").collect()
    assert [(r.id, r.v) for r in rows] == [
        (1, 1.0), (2, 200.0), (3, 3.0), (4, 4.0), (9, 9.0)]


def test_insert_overwrite_dynamic(seeded, catalog):
    catalog.sql("INSERT OVERWRITE db.t SELECT * FROM VALUES "
                "(30, 'b', 30.0) AS v(id, cat, v)")
    rows = catalog.sql("SELECT id FROM db.t ORDER BY id").collect()
    # partition 'b' replaced, 'a' untouched
    assert [r.id for r in rows] == [1, 2, 30]


def test_alter_partition_field_and_branch(seeded, catalog):
    t = seeded
    catalog.sql("ALTER TABLE db.t ADD PARTITION FIELD bucket(4, id)")
    assert any(f.name == "id_bucket_4" for f in t.spec.fields) or \
        any(f.name == "id_bucket_4" for f in catalog.load_table("db.t").spec.fields)
    catalog.sql("ALTER TABLE db.t DROP PARTITION FIELD bucket(4, id)")
    t = catalog.load_table("db.t")
    assert not any("bucket" in f.name for f in t.spec.fields)

    catalog.sql("ALTER TABLE db.t CREATE BRANCH dev")
    catalog.sql("ALTER TABLE db.t CREATE TAG v1")
    t = catalog.load_table("db.t")
    assert t.refs()["dev"].type == "branch"
    assert t.refs()["v1"].type == "tag"
    catalog.sql("ALTER TABLE db.t DROP BRANCH dev")
    assert "dev" not in catalog.load_table("db.t").refs()


def test_alter_schema_and_properties(seeded, catalog):
    catalog.sql("ALTER TABLE db.t ADD COLUMNS (note string)")
    assert "note" in catalog.load_table("db.t").schema.column_names
    catalog.sql("ALTER TABLE db.t RENAME COLUMN note TO comment")
    assert "comment" in catalog.load_table("db.t").schema.column_names
    catalog.sql("ALTER TABLE db.t DROP COLUMN comment")
    assert "comment" not in catalog.load_table("db.t").schema.column_names
    catalog.sql("ALTER TABLE db.t SET TBLPROPERTIES ('write.delete.mode'='merge-on-read')")
    assert catalog.load_table("db.t").properties["write.delete.mode"] == "merge-on-read"
    catalog.sql("ALTER TABLE db.t SET IDENTIFIER FIELDS id")
    assert catalog.load_table("db.t").schema.identifier_field_ids


def test_call_procedures(seeded, catalog):
    t = seeded
    first = t.snapshots()[0].snapshot_id
    catalog.sql("INSERT INTO db.t SELECT * FROM VALUES (5, 'c', 5.0) AS v(id, cat, v)")
    r = catalog.sql(f"CALL system.rollback_to_snapshot('db.t', {first})").collect()
    assert r[0].current_snapshot_id == first
    assert catalog.sql("SELECT count(*) AS n FROM db.t").collect()[0].n == 4

    anc = catalog.sql("CALL system.ancestors_of('db.t')").collect()
    assert anc[0].snapshot_id == first

    # second file per partition so binpack has real work — counts must be
    # non-zero (ADVICE r1: proc readers used keys maintenance never returned)
    catalog.sql("INSERT INTO db.t SELECT * FROM VALUES (6, 'a', 6.0), "
                "(7, 'b', 7.0) AS v(id, cat, v)")
    r = catalog.sql("CALL system.rewrite_data_files(table => 'db.t')").collect()
    assert r[0].rewritten_data_files_count == 4
    assert r[0].added_data_files_count > 0
    assert r[0].rewritten_bytes_count > 0
    r = catalog.sql("CALL system.rewrite_manifests('db.t')").collect()
    assert r[0].rewritten_manifests_count >= 0
    r = catalog.sql("CALL system.expire_snapshots(table => 'db.t', retain_last => 1)").collect()
    assert r[0].expired_snapshots_count > 0
    assert r[0].deleted_data_files_count > 0  # pre-compaction files purged
    r = catalog.sql("CALL system.remove_orphan_files(table => 'db.t', dry_run => true)").collect()
    assert isinstance(r, list)
    r = catalog.sql("CALL system.compute_partition_stats('db.t')").collect()
    assert r[0].statistics_file


def test_time_travel_and_metadata_tables(seeded, catalog):
    t = seeded
    v1 = t.current_snapshot().snapshot_id
    catalog.sql("INSERT INTO db.t SELECT * FROM VALUES (99, 'z', 9.0) AS v(id, cat, v)")
    n_old = catalog.sql(
        f"SELECT count(*) AS n FROM db.t VERSION AS OF {v1}").collect()[0].n
    n_new = catalog.sql("SELECT count(*) AS n FROM db.t").collect()[0].n
    assert (n_old, n_new) == (4, 5)
    snaps = catalog.sql("SELECT * FROM db.t.snapshots").collect()
    assert len(snaps) == 2
    files = catalog.sql("SELECT * FROM db.t.files").collect()
    assert len(files) >= 2


def test_views_and_functions(seeded, catalog):
    catalog.sql("CREATE VIEW db.big AS SELECT id, v FROM db.t WHERE v >= 2.0")
    rows = catalog.sql("SELECT * FROM db.big ORDER BY id").collect()
    assert [r.id for r in rows] == [2, 3, 4]
    # versioned replace
    catalog.sql("CREATE OR REPLACE VIEW db.big AS SELECT id FROM db.t WHERE v >= 3.0")
    rows = catalog.sql("SELECT * FROM db.big ORDER BY id").collect()
    assert [r.id for r in rows] == [3, 4]
    from iceberg_spark import views as V

    vm = V.load_view(catalog, "db.big")
    assert vm.current_version_id == 2 and len(vm.versions) == 2
    assert catalog.sql("SHOW VIEWS").collect()[0].name == "db.big"
    catalog.sql("DROP VIEW db.big")
    assert V.load_view(catalog, "db.big") is None

    catalog.sql("CREATE FUNCTION db.double_it(x DOUBLE) RETURNS DOUBLE RETURN x * 2")
    rows = catalog.sql("SELECT double_it(v) AS dv FROM db.t ORDER BY id").collect()
    assert rows[0].dv == 2.0
    assert catalog.sql("SHOW FUNCTIONS").collect()[0].name == "db.double_it"


def test_parse_predicate_ops():
    from iceberg_spark.sql import parse_predicate
    from iceberg_spark import expressions as E

    e = parse_predicate("a > 5 AND b = 'x' OR c IS NULL")
    assert isinstance(e, E.Or)
    e = parse_predicate("id BETWEEN 3 AND 7")
    assert isinstance(e, E.And)
    e = parse_predicate("name LIKE 'ab%'")
    assert e.op == E.STARTS_WITH
    e = parse_predicate("d = DATE '2024-01-02'")
    import datetime

    assert e.literals[0] == datetime.date(2024, 1, 2)
    e = parse_predicate("days(ts) = DATE '2024-01-02'")
    assert e.term.transform is not None
    e = parse_predicate("x IN (1, 2, 3)")
    assert e.op == E.IN and len(e.literals) == 3


def test_wap_stage_and_publish(seeded, catalog):
    t = seeded
    head = t.current_snapshot().snapshot_id
    staged = t.append(
        t.spark.sql("SELECT 100 AS id, 'w' AS cat, 1.5 AS v"), wap_id="audit1")
    t = catalog.load_table("db.t")
    # staged: snapshot exists but main did not move
    assert t.current_snapshot().snapshot_id == head
    assert any(s.snapshot_id == staged.snapshot_id for s in t.snapshots())
    # auditable via time travel by snapshot id
    assert len(t.scan(snapshot_id=staged.snapshot_id).df().collect()) == 5
    catalog.sql("CALL system.publish_changes('db.t', 'audit1')")
    t = catalog.load_table("db.t")
    assert {r.id for r in t.to_df().collect()} == {1, 2, 3, 4, 100}


def test_namespaces_and_show_tables(seeded, catalog):
    catalog.sql("CREATE NAMESPACE analytics")
    assert catalog.namespace_exists("analytics")
    assert "analytics" in catalog.sql("SHOW NAMESPACES").toPandas().namespace.tolist()
    rows = catalog.sql("SHOW TABLES IN db").collect()
    assert [(r.namespace, r.tableName) for r in rows] == [("db", "t")]
    catalog.sql("DROP NAMESPACE analytics")
    assert not catalog.namespace_exists("analytics")


def test_system_functions_match_transforms(spark):
    from iceberg_spark.functions import register_system_functions
    from iceberg_spark.transforms import Bucket, TimeTransform, Truncate

    register_system_functions(spark)
    r = spark.sql(
        "SELECT iceberg_bucket(16, 34L) AS b, iceberg_bucket(16, 'abc') AS bs, "
        "iceberg_truncate(10, 37L) AS tr, iceberg_truncate(10, -3L) AS trn, "
        "iceberg_truncate_str(2, 'hello') AS trs, "
        "iceberg_years(TIMESTAMP '2024-06-05 10:00:00') AS y, "
        "iceberg_months(TIMESTAMP '2024-06-05 10:00:00') AS m, "
        "iceberg_hours(TIMESTAMP '1970-01-02 03:00:00') AS h, "
        "iceberg_version() AS v").collect()[0]
    assert r.b == Bucket(16).apply(34, "long")
    assert r.bs == Bucket(16).apply("abc", "string")
    assert r.tr == Truncate(10).apply(37, "long") == 30
    assert r.trn == Truncate(10).apply(-3, "long") == -10
    assert r.trs == "he"
    assert r.y == TimeTransform("year").apply("2024-06-05T10:00:00", "timestamp")
    assert r.m == TimeTransform("month").apply("2024-06-05T10:00:00", "timestamp")
    assert r.h == 27
    assert "iceberg" in r.v


def test_sql_table_function_udtf(seeded, catalog):
    catalog.sql(
        "CREATE FUNCTION db.cat_stats(minv DOUBLE) "
        "RETURNS TABLE (cat STRING, n BIGINT) "
        "RETURN SELECT cat, COUNT(*) AS n FROM db.t WHERE v >= minv GROUP BY cat")
    rows = catalog.sql("SELECT * FROM cat_stats(3.0) ORDER BY cat").collect()
    assert [(r.cat, r.n) for r in rows] == [("b", 2)]


def test_create_table_nested_parens_and_decimal(catalog):
    catalog.sql(
        "CREATE TABLE db.nested (id BIGINT, ts TIMESTAMP, d DECIMAL(10,2)) "
        "PARTITIONED BY (days(ts), bucket(4, id)) "
        "TBLPROPERTIES ('write.delete.mode'='merge-on-read')")
    t = catalog.load_table("db.nested")
    assert [f.name for f in t.spec.fields] == ["ts_day", "id_bucket_4"]
    assert t.properties["write.delete.mode"] == "merge-on-read"
    # decimal stats must not break the append (pyarrow footer limitation)
    catalog.sql("INSERT INTO db.nested SELECT 7L, "
                "TIMESTAMP '2026-01-02 00:00:00', CAST(1.25 AS DECIMAL(10,2))")
    rows = catalog.sql("SELECT id, d FROM db.nested").collect()
    assert len(rows) == 1 and float(rows[0].d) == 1.25


def test_table_qualified_column_refs(seeded, catalog):
    # SELECT t.id FROM db.t — substituted relation must stay addressable by
    # its terminal name (ADVICE r1: every-identifier rewrite broke this)
    rows = catalog.sql(
        "SELECT t.id, t.v FROM db.t WHERE t.cat = 'a' ORDER BY t.id").collect()
    assert [(r.id, r.v) for r in rows] == [(1, 1.0), (2, 2.0)]
    # explicit user alias still wins
    rows = catalog.sql(
        "SELECT x.id FROM db.t AS x WHERE x.cat = 'b' ORDER BY x.id").collect()
    assert [r.id for r in rows] == [3, 4]


def test_identifier_collision_not_rewritten(seeded, catalog, spark):
    # a column whose name collides with a table name must not be rewritten
    catalog.sql("CREATE TABLE db.cat (cat string, label string)")
    catalog.sql("INSERT INTO db.cat SELECT * FROM VALUES ('a', 'alpha'), "
                "('b', 'beta') AS v(cat, label)")
    # `cat` appears as a bare column identifier in SELECT/GROUP BY position;
    # only the FROM reference may resolve to the db.cat table
    rows = catalog.sql(
        "SELECT cat, count(*) AS n FROM db.t GROUP BY cat ORDER BY cat"
    ).collect()
    assert [(r.cat, r.n) for r in rows] == [("a", 2), ("b", 2)]


def test_comma_join_from_list(seeded, catalog):
    catalog.sql("CREATE TABLE db.names (id bigint, name string)")
    catalog.sql("INSERT INTO db.names SELECT * FROM VALUES "
                "(1, 'one'), (3, 'three') AS v(id, name)")
    rows = catalog.sql(
        "SELECT t.id, names.name FROM db.t, db.names "
        "WHERE t.id = names.id ORDER BY t.id").collect()
    assert [(r.id, r.name) for r in rows] == [(1, "one"), (3, "three")]


def test_pushdown_non_utc_session_timezone(catalog, spark):
    # TIMESTAMP literals are session-tz wall time (Spark) but engine stats
    # are UTC instants; pruning must shift literals or it loses rows
    catalog.sql("CREATE TABLE db.tz (id bigint, ts timestamp) "
                "PARTITIONED BY (days(ts))")
    catalog.sql("INSERT INTO db.tz SELECT * FROM VALUES "
                "(1, TIMESTAMP '2026-01-01 20:00:00'), "
                "(2, TIMESTAMP '2026-01-03 12:00:00') AS v(id, ts)")
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        # Tokyo 2026-01-02 02:00 == UTC 2026-01-01 17:00 — both rows qualify;
        # unshifted pruning would drop the 2026-01-01 file (max 20:00 UTC)
        rows = catalog.sql(
            "SELECT id FROM db.tz "
            "WHERE ts >= TIMESTAMP '2026-01-02 02:00:00' ORDER BY id"
        ).collect()
        assert [r.id for r in rows] == [1, 2]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_describe_and_show_statements(seeded, catalog):
    rows = catalog.sql("DESCRIBE db.t").collect()
    names = [r.col_name for r in rows]
    assert names[:3] == ["id", "cat", "v"]
    assert "# Partitioning" in names
    ext = catalog.sql("DESCRIBE EXTENDED db.t").collect()
    assert any(r.col_name == "Location" for r in ext)

    catalog.sql("ALTER TABLE db.t SET TBLPROPERTIES ('foo' = 'bar')")
    props = {r.key: r.value for r in
             catalog.sql("SHOW TBLPROPERTIES db.t").collect()}
    assert props.get("foo") == "bar"

    parts = catalog.sql("SHOW PARTITIONS db.t").collect()
    assert len(parts) == 2  # cat in {a, b}
    import json

    assert sorted(json.loads(r.partition)["cat"] for r in parts) == ["a", "b"]

    stmt = catalog.sql("SHOW CREATE TABLE db.t").collect()[0].createtab_stmt
    assert "CREATE TABLE db.t" in stmt and "PARTITIONED BY (cat)" in stmt


def test_create_or_replace_table_as_select(catalog, spark):
    cat = catalog
    cat.sql("CREATE TABLE db.rtas_t (id BIGINT, v BIGINT, gone STRING)")
    t = cat.load_table("db.rtas_t")
    t.append(spark.createDataFrame([(1, 10, "x"), (2, 20, "y")],
                                   "id long, v long, gone string"))
    uuid_before = t.metadata.table_uuid
    snaps_before = len(t.snapshots())

    spark.range(0, 5).selectExpr(
        "id", "id * 3 AS v", "CAST(id AS STRING) AS fresh") \
        .createOrReplaceTempView("rtas_src")
    cat.sql("CREATE OR REPLACE TABLE db.rtas_t AS "
            "SELECT id, v, fresh FROM rtas_src")

    t = cat.load_table("db.rtas_t")
    # identity survives: same uuid, history grows (no drop/recreate)
    assert t.metadata.table_uuid == uuid_before
    assert len(t.snapshots()) > snaps_before
    assert [f.name for f in t.schema.fields] == ["id", "v", "fresh"]
    rows = sorted(tuple(r) for r in t.to_df().collect())
    assert rows == [(i, i * 3, str(i)) for i in range(5)]
    # time travel still reaches the pre-replace data
    old = t.scan(snapshot_id=t.snapshots()[snaps_before - 1].snapshot_id)
    assert old.df().count() == 2

    # OR REPLACE without AS SELECT on an existing table -> loud error
    with pytest.raises(ValueError, match="AS SELECT"):
        cat.sql("CREATE OR REPLACE TABLE db.rtas_t (id BIGINT)")
    # OR REPLACE on a missing table == plain CTAS
    cat.sql("CREATE OR REPLACE TABLE db.rtas_new AS "
            "SELECT id FROM rtas_src")
    assert cat.load_table("db.rtas_new").to_df().count() == 5


def test_replace_table_as_select_requires_existing(catalog, spark):
    with pytest.raises(ValueError, match="no such table"):
        catalog.sql("REPLACE TABLE db.never_was AS SELECT 1 AS one")
    catalog.sql("CREATE TABLE db.rep_t AS SELECT 1 AS one")
    catalog.sql("REPLACE TABLE db.rep_t AS SELECT 2 AS two")
    t = catalog.load_table("db.rep_t")
    assert [f.name for f in t.schema.fields] == ["two"]
    assert [tuple(r) for r in t.to_df().collect()] == [(2,)]


def test_truncate_table(catalog, spark):
    catalog.sql("CREATE TABLE db.trunc_t AS SELECT * FROM range(7)")
    t = catalog.load_table("db.trunc_t")
    pre = t.current_snapshot().snapshot_id
    catalog.sql("TRUNCATE TABLE db.trunc_t")
    t = t.refresh()
    assert t.to_df().count() == 0
    # metadata-only truncate: history survives, old rows time-travel
    assert t.scan(snapshot_id=pre).df().count() == 7
    assert t.current_snapshot().summary.get("deleted-data-files") == "7"


def test_drop_table_if_exists_and_purge(catalog, spark):
    with pytest.raises(ValueError, match="no such table"):
        catalog.sql("DROP TABLE db.never_existed")
    catalog.sql("DROP TABLE IF EXISTS db.never_existed")  # silent
    catalog.sql("CREATE TABLE db.droppable AS SELECT 1 AS one")
    catalog.sql("DROP TABLE db.droppable PURGE")
    assert not catalog.table_exists("db.droppable")


def test_rtas_replaces_spec_and_properties(catalog, spark):
    """CREATE OR REPLACE TABLE ... PARTITIONED BY ... TBLPROPERTIES sets
    the NEW definition: the clause's spec becomes the default and the
    properties replace (not merge into) the old set — the reference's
    ReplaceTableAsSelect semantics."""
    cat = catalog
    cat.sql("CREATE TABLE db.rtas_sp (id BIGINT, grp BIGINT) "
            "PARTITIONED BY (grp) TBLPROPERTIES ('old'='1')")
    t = cat.load_table("db.rtas_sp")
    t.append(spark.range(0, 4).selectExpr("id", "id % 2 AS grp"))
    uuid_before = t.metadata.table_uuid

    spark.range(0, 8).selectExpr("id", "id % 3 AS grp", "id * 2 AS v") \
        .createOrReplaceTempView("rtas_sp_src")
    cat.sql("CREATE OR REPLACE TABLE db.rtas_sp "
            "PARTITIONED BY (bucket(4, id)) TBLPROPERTIES ('new'='2') "
            "AS SELECT id, grp, v FROM rtas_sp_src")

    t = cat.load_table("db.rtas_sp")
    assert t.metadata.table_uuid == uuid_before  # identity survives
    assert [(f.source_name, f.transform.to_str())
            for f in t.spec.fields] == [("id", "bucket[4]")]
    assert t.properties.get("new") == "2"
    assert "old" not in t.properties  # replaced, not merged
    assert t.to_df().count() == 8
    # new writes land under the new spec (bucketed partition dirs)
    t.append(spark.range(100, 104).selectExpr(
        "id", "id % 3 AS grp", "id * 2 AS v"))
    assert t.refresh().to_df().count() == 12

    # same clause again -> spec unchanged (no gratuitous evolution)
    spec_id = t.metadata.default_spec_id
    cat.sql("CREATE OR REPLACE TABLE db.rtas_sp "
            "PARTITIONED BY (bucket(4, id)) "
            "AS SELECT id, grp, v FROM rtas_sp_src")
    t = cat.load_table("db.rtas_sp")
    assert t.metadata.default_spec_id == spec_id
    assert t.properties.get("new") is None  # no TBLPROPERTIES -> cleared
