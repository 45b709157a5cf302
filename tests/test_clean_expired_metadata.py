"""expire_snapshots(clean_expired_metadata=True) — prune partition specs
and schemas no retained snapshot can reach (reference
core/.../RemoveSnapshots.java:171,239-275; api/.../ExpireSnapshots.java:149).

Engine-specific widening under test: the engine resolves a data file's
columns through its recorded write_schema_id (not parquet field IDs), so a
schema stays pinned while ANY retained manifest entry still names it —
strictly wider than the reference's snapshot-schema-id walk."""

import time

from pyspark.sql import types as T

NOW = lambda: int(time.time() * 1000)

_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()), T.StructField("v", T.StringType())
])


def _row(spark, i):
    return spark.createDataFrame([(i, f"v{i}")], _SCHEMA).coalesce(1)


def test_unused_spec_removed(catalog, spark):
    t = catalog.create_table("db.cem_spec", _SCHEMA, partition_by=["v"])
    t.append(_row(spark, 0))
    t.update_spec().add_field("id", "bucket(4)").commit()
    t = t.refresh()
    # rewrite everything under the new spec: old-spec manifests survive only
    # in pre-overwrite snapshots
    t.overwrite(_row(spark, 1))
    t = t.refresh()
    assert len(t.metadata.partition_specs) == 2
    res = t.expire_snapshots(older_than_ms=NOW() + 1000, retain_last=1,
                             clean_expired_metadata=True)
    t = t.refresh()
    assert res["removed_partition_specs"] == 1, res
    assert [s.spec_id for s in t.metadata.partition_specs] \
        == [t.metadata.default_spec_id]
    assert t.to_df().count() == 1  # table still reads


def test_spec_kept_while_manifest_references_it(catalog, spark):
    t = catalog.create_table("db.cem_spec_live", _SCHEMA, partition_by=["v"])
    t.append(_row(spark, 0))
    t.update_spec().add_field("id", "bucket(4)").commit()
    t = t.refresh()
    t.append(_row(spark, 1))  # old-spec file stays live in the head snapshot
    t = t.refresh()
    res = t.expire_snapshots(older_than_ms=NOW() + 1000, retain_last=1,
                             clean_expired_metadata=True)
    t = t.refresh()
    assert res["removed_partition_specs"] == 0, res
    assert len(t.metadata.partition_specs) == 2
    assert t.to_df().count() == 2


def test_schema_pinned_by_live_write_schema_id(catalog, spark):
    """A live file written under schema 0 pins schema 0 even when every
    retained SNAPSHOT references schema 2 — dropping it would break the
    engine's write-schema column resolution."""
    t = catalog.create_table("db.cem_schema_pin", _SCHEMA)
    t.append(_row(spark, 0))                              # schema 0 file
    t.update_schema().rename_column("v", "val").commit()  # schema 1
    t = t.refresh()
    t.append(spark.createDataFrame([(1, "v1")], ["id", "val"])
             .selectExpr("cast(id as long) id", "val").coalesce(1))
    t.update_schema().add_column("extra", "long").commit()  # schema 2
    t = t.refresh()
    t.append(spark.createDataFrame([(2, "v2", 7)], ["id", "val", "extra"])
             .selectExpr("cast(id as long) id", "val",
                         "cast(extra as long) extra").coalesce(1))
    t = t.refresh()
    assert len(t.metadata.schemas) == 3
    res = t.expire_snapshots(older_than_ms=NOW() + 1000, retain_last=1,
                             clean_expired_metadata=True)
    t = t.refresh()
    # head snapshot's manifests still carry files of all three schemas
    assert res["removed_schemas"] == 0, res
    assert len(t.metadata.schemas) == 3
    got = {r["id"]: r["val"] for r in t.to_df().collect()}
    assert got == {0: "v0", 1: "v1", 2: "v2"}


def test_schema_removed_after_rewrite(catalog, spark):
    t = catalog.create_table("db.cem_schema_rm", _SCHEMA)
    t.append(_row(spark, 0))
    t.update_schema().rename_column("v", "val").commit()  # schema 1
    t = t.refresh()
    # overwrite: every live file now carries write_schema_id 1
    t.overwrite(spark.createDataFrame([(9, "v9")], ["id", "val"])
                .selectExpr("cast(id as long) id", "val").coalesce(1))
    t = t.refresh()
    res = t.expire_snapshots(older_than_ms=NOW() + 1000, retain_last=1,
                             clean_expired_metadata=True)
    t = t.refresh()
    assert res["removed_schemas"] == 1, res
    assert [s.schema_id for s in t.metadata.schemas] \
        == [t.metadata.current_schema_id]
    assert t.to_df().collect()[0]["val"] == "v9"


def test_clean_noop_commits_nothing(catalog, spark):
    t = catalog.create_table("db.cem_noop", _SCHEMA)
    t.append(_row(spark, 0))
    t = t.refresh()
    before = t.metadata.last_sequence_number, len(t.metadata.schemas)
    res = t.expire_snapshots(older_than_ms=0, retain_last=1,
                             clean_expired_metadata=True)
    t = t.refresh()
    assert res["expired_snapshots"] == 0
    assert res["removed_schemas"] == res["removed_partition_specs"] == 0
    assert (t.metadata.last_sequence_number,
            len(t.metadata.schemas)) == before


def test_local_distributed_parity(catalog, spark):
    outs = {}
    for mode in ("local", "distributed"):
        t = catalog.create_table(f"db.cem_par_{mode}", _SCHEMA,
                                 partition_by=["v"])
        t.append(_row(spark, 0))
        t.update_spec().add_field("id", "bucket(4)").commit()
        t = t.refresh()
        t.update_schema().add_column("extra", "long").commit()
        t = t.refresh()
        t.overwrite(_row(spark, 1).selectExpr(
            "id", "v", "cast(null as long) extra"))
        t = t.refresh()
        outs[mode] = t.expire_snapshots(
            older_than_ms=NOW() + 1000, retain_last=1, mode=mode,
            clean_expired_metadata=True)
        t = t.refresh()
        assert t.to_df().count() == 1
    for k in ("removed_partition_specs", "removed_schemas",
              "expired_snapshots"):
        assert outs["local"][k] == outs["distributed"][k], (k, outs)
    assert outs["local"]["removed_partition_specs"] == 1
    assert outs["local"]["removed_schemas"] == 1


def test_call_procedure_clean_expired_metadata(catalog, spark):
    t = catalog.create_table("db.cem_proc", _SCHEMA, partition_by=["v"])
    t.append(_row(spark, 0))
    t.update_spec().add_field("id", "bucket(4)").commit()
    t = t.refresh()
    t.overwrite(_row(spark, 1))
    row = catalog.sql(
        "CALL system.expire_snapshots(table => 'db.cem_proc', "
        f"older_than => {NOW() + 1000}, retain_last => 1, "
        "clean_expired_metadata => true)").collect()[0]
    assert row["removed_partition_specs_count"] == 1
    assert row["expired_snapshots_count"] == 1
    t = catalog.load_table("db.cem_proc")
    assert len(t.metadata.partition_specs) == 1
