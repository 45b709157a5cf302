"""Per-ref snapshot retention in expire_snapshots + distributed-mode parity
(reference core/.../RemoveSnapshots.java:308-313, spec format/spec.md:1097;
ExpireSnapshotsSparkAction / DeleteOrphanFilesSparkAction for the
distributed reachability legs)."""

import os
import time

import pytest
from pyspark.sql import types as T

from iceberg_spark.maintenance import delete_reachable_files

NOW = lambda: int(time.time() * 1000)


def _tbl(catalog, spark, name, n_snaps=4):
    schema = T.StructType([
        T.StructField("id", T.LongType()), T.StructField("v", T.StringType())
    ])
    t = catalog.create_table(name, schema)
    for i in range(n_snaps):
        t.append(spark.createDataFrame([(i, f"v{i}")], schema).coalesce(1))
    return t


def test_branch_min_snapshots_to_keep(catalog, spark):
    t = _tbl(catalog, spark, "db.ret_minkeep", 4)
    snaps = t.snapshots()
    t.manage_snapshots().create_branch("dev", snaps[-1].snapshot_id)
    t.manage_snapshots().set_min_snapshots_to_keep("dev", 3)
    # expire everything by age; dev's policy must still keep 3 of its chain
    res = t.expire_snapshots(older_than_ms=NOW() + 1000, retain_last=1)
    t = t.refresh()
    kept = {s.snapshot_id for s in t.snapshots()}
    dev_chain = [s.snapshot_id for s in snaps]  # dev head == main head here
    assert set(dev_chain[-3:]) <= kept, "min-snapshots-to-keep not honored"
    assert res["expired_snapshots"] == 1  # only the oldest fell off


def test_branch_max_snapshot_age(catalog, spark):
    t = _tbl(catalog, spark, "db.ret_age", 3)
    head = t.current_snapshot().snapshot_id
    t.manage_snapshots().create_branch("dev", head)
    # branch allows everything younger than 1h; main expires all but head
    t.manage_snapshots().set_max_snapshot_age_ms("dev", 3600 * 1000)
    t.expire_snapshots(older_than_ms=NOW() + 1000, retain_last=1)
    t = t.refresh()
    # all three snapshots are <1h old -> dev's policy retains its full chain
    assert len(t.snapshots()) == 3


def test_tag_expired_by_ref_age(catalog, spark):
    t = _tbl(catalog, spark, "db.ret_refage", 3)
    old = t.snapshots()[0]
    t.manage_snapshots().create_tag("v1", old.snapshot_id)
    t.manage_snapshots().set_max_ref_age_ms("v1", 1)  # 1 ms: already stale
    time.sleep(0.01)
    res = t.expire_snapshots(older_than_ms=NOW() + 1000, retain_last=1)
    t = t.refresh()
    assert "v1" not in t.refs(), "stale tag not removed"
    assert res["removed_refs"] == 1
    assert old.snapshot_id not in {s.snapshot_id for s in t.snapshots()}


def test_tag_within_ref_age_kept(catalog, spark):
    t = _tbl(catalog, spark, "db.ret_refage_keep", 3)
    old = t.snapshots()[0]
    t.manage_snapshots().create_tag("v1", old.snapshot_id)
    t.manage_snapshots().set_max_ref_age_ms("v1", 24 * 3600 * 1000)
    t.expire_snapshots(older_than_ms=NOW() + 1000, retain_last=1)
    t = t.refresh()
    assert "v1" in t.refs()
    assert old.snapshot_id in {s.snapshot_id for s in t.snapshots()}


def test_property_defaults_apply_to_branches(catalog, spark):
    t = _tbl(catalog, spark, "db.ret_props", 4)
    t.set_properties(**{"history.expire.min-snapshots-to-keep": "2"})
    t = t.refresh()
    res = t.expire_snapshots(older_than_ms=NOW() + 1000, retain_last=1)
    t = t.refresh()
    assert len(t.snapshots()) == 2, res  # property floor beats retain_last=1


def test_expire_distributed_parity(catalog, spark):
    a = _tbl(catalog, spark, "db.ret_dist_a", 4)
    b = _tbl(catalog, spark, "db.ret_dist_b", 4)
    ra = a.expire_snapshots(older_than_ms=NOW() + 1000, retain_last=2,
                            mode="local")
    rb = b.expire_snapshots(older_than_ms=NOW() + 1000, retain_last=2,
                            mode="distributed")
    for k in ("expired_snapshots", "deleted_data_files", "deleted_manifests"):
        assert ra[k] == rb[k], (k, ra, rb)
    a, b = a.refresh(), b.refresh()
    assert a.to_df().count() == b.to_df().count() == 4
    # expired files really gone, live files intact, in both modes
    for t in (a, b):
        for e in t.new_scan().plan_files().files:
            assert os.path.exists(e.file.file_path)


def test_reachable_purge_distributed_parity(catalog, spark):
    t = _tbl(catalog, spark, "db.purge_dist", 3)
    la = delete_reachable_files(t, dry_run=True, mode="local")
    lb = delete_reachable_files(t, dry_run=True, mode="distributed")
    for k in ("deleted_data_files_count", "deleted_manifests_count",
              "deleted_manifest_lists_count"):
        assert la[k] == lb[k], (k, la, lb)
    # identical closure from both planners (dry runs are side-effect-free)
    assert la["paths"] == lb["paths"]
    res = delete_reachable_files(t, mode="distributed")
    assert res["deleted_files_total"] > 0
    for p in lb["paths"]:
        assert not os.path.exists(p), p


def test_orphan_distributed_parity(catalog, spark):
    t = _tbl(catalog, spark, "db.orphan_dist", 2)
    ddir = os.path.join(t.location, "data")
    orphan = os.path.join(ddir, "orphan-x.parquet")
    with open(orphan, "wb") as f:
        f.write(b"junk")
    os.utime(orphan, (time.time() - 10 * 86400,) * 2)
    cutoff = int((time.time() - 86400) * 1000)
    found_local = t.remove_orphan_files(older_than_ms=cutoff, dry_run=True,
                                        mode="local")
    found_dist = t.remove_orphan_files(older_than_ms=cutoff, dry_run=True,
                                       mode="distributed")
    assert sorted(found_local) == sorted(found_dist) == [orphan]
    removed = t.remove_orphan_files(older_than_ms=cutoff, mode="distributed")
    assert removed == [orphan] and not os.path.exists(orphan)
    assert t.to_df().count() == 2


def test_expire_explicit_snapshot_ids(catalog, spark):
    """ExpireSnapshots.expireSnapshotId: explicitly-named snapshots
    expire in addition to retention; unknown ids and ref heads refuse."""
    t = _tbl(catalog, spark, "db.ret_explicit", 4)
    snaps = t.snapshots()
    mid = snaps[1].snapshot_id  # ancestor in main's history, not a head
    res = t.expire_snapshots(expire_snapshot_ids=[mid])
    assert res["expired_snapshots"] == 1
    t = t.refresh()
    assert mid not in {s.snapshot_id for s in t.snapshots()}
    assert t.to_df().count() == 4  # current state untouched

    with pytest.raises(ValueError, match="unknown"):
        t.expire_snapshots(expire_snapshot_ids=[999999])
    head = t.current_snapshot().snapshot_id
    with pytest.raises(ValueError, match="referenced"):
        t.expire_snapshots(expire_snapshot_ids=[head])


def test_expire_snapshot_ids_via_procedure(catalog, spark):
    t = _tbl(catalog, spark, "db.ret_proc", 3)
    from iceberg_spark.sql import SqlEngine

    eng = SqlEngine(spark, catalog)
    mid = t.snapshots()[0].snapshot_id
    out = eng.sql(
        f"CALL system.expire_snapshots(table => 'db.ret_proc', "
        f"snapshot_ids => ARRAY({mid}))").collect()
    assert out[0]["expired_snapshots_count"] == 1
    t = t.refresh()
    assert mid not in {s.snapshot_id for s in t.snapshots()}
