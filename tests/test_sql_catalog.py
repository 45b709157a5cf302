"""SQL-database-backed catalog (JdbcCatalog analog over sqlite3):
registry rows arbitrate commits; files stay engine-standard."""

import os

import pytest
from pyspark.sql import functions as F

from iceberg_spark.catalogs import SqlCatalog
from iceberg_spark.metadata import CommitFailedException


@pytest.fixture()
def sqlcat(spark, tmp_path):
    return SqlCatalog(spark, str(tmp_path / "wh"))


def test_crud_and_registry(sqlcat, spark):
    df = spark.range(0, 25).select("id", (F.col("id") % 5).alias("grp"))
    t = sqlcat.create_table("db.t1", df.schema, partition_by=["grp"])
    t.append(df)
    assert sqlcat.table_exists("db.t1")
    assert sqlcat.list_tables("db") == ["db.t1"]
    assert sqlcat.list_namespaces() == ["db"]
    t = sqlcat.load_table("db.t1")
    assert t.to_df().count() == 25
    # registry row tracks the metadata location through commits
    row = sqlcat._row("db.t1")
    assert row[0].endswith("v2.metadata.json")  # create + append

    # rename is a registry-row move; data stays readable
    sqlcat.rename_table("db.t1", "db.t2")
    assert not sqlcat.table_exists("db.t1")
    assert sqlcat.load_table("db.t2").to_df().count() == 25

    assert sqlcat.drop_table("db.t2")
    assert sqlcat.list_tables("db") == []
    sqlcat.drop_namespace("db")
    assert sqlcat.list_namespaces() == []


def test_commit_cas_between_catalog_instances(sqlcat, spark, tmp_path):
    """Two catalog instances sharing the database: the stale handle's
    commit fails the registry CAS (JdbcCatalog concurrency model)."""
    df = spark.range(0, 10).select("id")
    sqlcat.create_table("db.race", df.schema).append(df)

    cat2 = SqlCatalog(spark, sqlcat.warehouse, db_path=sqlcat.db_path)
    ta = sqlcat.load_table("db.race")
    tb = cat2.load_table("db.race")
    ta.append(spark.range(10, 20).select("id"))
    # tb's ops hold the stale base; the fs CAS itself may pass on a
    # refreshed version but the registry CAS must arbitrate
    with pytest.raises(CommitFailedException):
        tb.ops.commit(1, tb.metadata)
    assert sqlcat.load_table("db.race").to_df().count() == 20


def test_rest_adapter_over_sql_catalog(sqlcat, spark):
    """The REST adapter is catalog-agnostic: serving a SqlCatalog gives
    an HTTP surface over the SQL registry."""
    import json
    import urllib.request

    from iceberg_spark.rest_catalog import serve

    df = spark.range(0, 8).select("id")
    sqlcat.create_table("db.rt", df.schema).append(df)
    srv, port = serve(sqlcat)
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/v1/namespaces/db/tables") as r:
            tbls = json.loads(r.read())
        assert {"namespace": ["db"], "name": "rt"} in tbls["identifiers"]
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/v1/namespaces/db/tables/rt") as r:
            res = json.loads(r.read())
        assert res["metadata"]["refs"]["main"]["snapshot-id"] == \
            sqlcat.load_table("db.rt").current_snapshot().snapshot_id
    finally:
        srv.shutdown()


def test_in_memory_catalog(spark, tmp_path):
    from iceberg_spark.catalogs import InMemoryCatalog

    cat = InMemoryCatalog(spark, str(tmp_path / "memwh"))
    df = spark.range(0, 9).select("id")
    cat.create_table("db.m1", df.schema).append(df)
    assert cat.list_tables("db") == ["db.m1"]
    assert cat.load_table("db.m1").to_df().count() == 9
    cat.rename_table("db.m1", "db.m2")
    assert cat.load_table("db.m2").to_df().count() == 9
    assert not os.path.exists(os.path.join(cat.warehouse, "catalog.db"))
    # a second instance sees nothing: the registry is process-memory
    cat2 = InMemoryCatalog(spark, cat.warehouse)
    assert cat2.list_tables() == []
    assert cat.drop_table("db.m2")
    cat.drop_namespace("db")
    assert cat.list_namespaces() == []


def test_namespace_properties_all_catalogs(sqlcat, spark, tmp_path):
    """namespace_properties / update_namespace_properties behave
    identically on the dir, SQL, and in-memory catalogs."""
    from iceberg_spark.catalogs import InMemoryCatalog
    from iceberg_spark.table import Catalog

    dircat = Catalog(spark, str(tmp_path / "dwh"))
    memcat = InMemoryCatalog(spark, str(tmp_path / "mwh"))
    for cat in (sqlcat, dircat, memcat):
        cat.create_namespace("nsp", exists_ok=True)
        assert cat.namespace_properties("nsp") == {}
        upd, rem, miss = cat.update_namespace_properties(
            "nsp", {"owner": "ops", "n": 3}, [])
        assert upd == ["n", "owner"] and rem == [] and miss == []
        assert cat.namespace_properties("nsp") == {"owner": "ops", "n": "3"}
        upd, rem, miss = cat.update_namespace_properties(
            "nsp", {"n": "4"}, ["owner", "ghost"])
        assert rem == ["owner"] and miss == ["ghost"]
        assert cat.namespace_properties("nsp") == {"n": "4"}
        with pytest.raises(ValueError):
            cat.update_namespace_properties("nsp", {"k": "v"}, ["k"])
        with pytest.raises(ValueError):
            cat.namespace_properties("no_such_ns")


def test_registry_is_authoritative_over_filesystem(sqlcat, spark):
    """An orphan vN.metadata.json (fs write landed, registry CAS lost on
    another machine) is never served: loads follow the REGISTERED
    metadata_location exactly (JdbcCatalog semantics)."""
    df = spark.range(0, 10).select("id")
    t = sqlcat.create_table("db.auth", df.schema)
    t.append(df)  # registry -> v2
    import shutil as _sh
    _sh.copy(t.ops._version_path(2), t.ops._version_path(3))  # orphan v3
    t2 = sqlcat.load_table("db.auth")
    assert t2.ops.current_version() == 2
    assert t2.metadata.to_json() != {}  # loaded the registered file
    assert sqlcat._row("db.auth")[0].endswith("v2.metadata.json")


def test_cas_failure_cleans_orphan_version(sqlcat, spark):
    """When the filesystem write lands but the registry CAS loses, the
    orphan version file is removed and the hint restored, so
    registry-following loads and future commits stay clean."""
    df = spark.range(0, 10).select("id")
    sqlcat.create_table("db.orph", df.schema).append(df)  # v2
    t = sqlcat.load_table("db.orph")
    row = sqlcat._row("db.orph")[0]
    # move the registry out from under the handle's expected-prev
    sqlcat._cas_location("db.orph", row, row.replace("v2", "v7"))
    with pytest.raises(CommitFailedException):
        t.ops.commit(2, t.metadata)
    assert not os.path.exists(t.ops._version_path(3))


def test_create_failure_leaves_no_registry_row(sqlcat, spark, monkeypatch):
    """Metadata commits BEFORE the registry insert: a write failure leaves
    an unreferenced file at worst, never a NULL-location row that
    table_exists() affirms but load_table() crashes on."""
    from iceberg_spark import metadata as M

    def boom(self, base, meta):
        raise RuntimeError("disk full")

    monkeypatch.setattr(M.TableOperations, "commit", boom)
    with pytest.raises(RuntimeError):
        sqlcat.create_table("db.broke", spark.range(1).schema)
    monkeypatch.undo()
    assert not sqlcat.table_exists("db.broke")
    with pytest.raises(ValueError, match="no such table"):
        sqlcat.load_table("db.broke")


def test_concurrent_create_maps_to_already_exists(sqlcat, spark,
                                                  monkeypatch):
    """A create that loses the race (metadata v1 already on disk) raises
    AlreadyExists-shaped ValueError, not sqlite3.IntegrityError/500."""
    schema = spark.range(1).schema
    sqlcat.create_table("db.dup", schema)
    monkeypatch.setattr(sqlcat, "_row", lambda ident: None)
    with pytest.raises(ValueError, match="exists"):
        sqlcat.create_table("db.dup", schema)


def test_sql_catalog_encrypted_metadata(spark, tmp_path):
    """SqlCatalog(metadata_key=...): the registry arbitrates commits
    while the version files themselves are AES GCM Streams; keyless
    instances sharing the database fail loudly."""
    key = bytes(range(32, 48))
    cat = SqlCatalog(spark, str(tmp_path / "swh"), metadata_key=key)
    df = spark.range(0, 20).select("id")
    t = cat.create_table("db.enc_sql", df.schema)
    t.append(df)
    assert cat.load_table("db.enc_sql").to_df().count() == 20
    mloc = cat._row("db.enc_sql")[0]
    with open(mloc, "rb") as f:
        assert f.read(4) == b"AGS1"
    keyless = SqlCatalog(spark, cat.warehouse, db_path=cat.db_path)
    with pytest.raises(ValueError, match="encrypted"):
        keyless.load_table("db.enc_sql")
