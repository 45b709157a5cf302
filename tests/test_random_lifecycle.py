"""Randomized lifecycle differential: seeded random sequences of appends,
row-level deletes/updates (CoW, MoR parquet pos-deletes, MoR deletion
vectors), compaction, snapshot expiry, and schema renames run against the
engine while a plain Python dict model applies the same semantics; the
table scan must match the model after EVERY step, and an export ->
reference-layout -> register round-trip at the end must match it too.

This is the lifecycle analog of the reference's randomized mode matrices
(TestCopyOnWrite*/TestMergeOnRead* x maintenance actions): single-op
differentials live in test_rowops_differential.py; this covers the
interleavings."""

import random

import pytest
from pyspark.sql import types as T

from iceberg_spark.expressions import col

SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("grp", T.IntegerType()),
    T.StructField("val", T.LongType()),
    T.StructField("tag", T.StringType()),
])


def _rows_df(spark, rows):
    return spark.createDataFrame(
        [(i, g, v, s) for (i, (g, v, s)) in rows], SCHEMA)


def _scan_rows(t, val_col="val"):
    cols = ["id", "grp", val_col, "tag"]
    return sorted(tuple(r) for r in t.to_df().select(*cols).collect())


def _model_rows(model):
    return sorted((i, g, v, s) for i, (g, v, s) in model.items())


def _apply_random_lifecycle(catalog, spark, seed, use_dv, extra_props=None):
    rng = random.Random(seed)
    name = f"db.lifecycle_{seed}_{int(use_dv)}"
    props = {"write.delete.format": "dv"} if use_dv else {}
    props.update(extra_props or {})
    t = catalog.create_table(name, SCHEMA, properties=props or None)
    model = {}  # id -> (grp, val, tag)
    next_id = 0

    def append():
        nonlocal next_id, t
        batch = {}
        for _ in range(rng.randint(5, 40)):
            batch[next_id] = (rng.randint(0, 5), rng.randint(-100, 100),
                              rng.choice(["a", "b", "c"]))
            next_id += 1
        t.append(_rows_df(spark, sorted(batch.items())))
        model.update(batch)

    def merge():
        nonlocal next_id, t
        # source: updates for an existing-id sample + some fresh ids
        ids = sorted(model)
        upd = {i: (model[i][0], rng.randint(-100, 100), model[i][2])
               for i in rng.sample(ids, min(len(ids), rng.randint(1, 10)))}
        ins = {}
        for _ in range(rng.randint(1, 8)):
            ins[next_id] = (rng.randint(0, 5), rng.randint(-100, 100),
                            rng.choice(["a", "b", "c"]))
            next_id += 1
        src = _rows_df(spark, sorted({**upd, **ins}.items()))
        mode = rng.choice(["copy-on-write", "merge-on-read"])
        (t.merge(src, on=["id"])
           .when_matched_update(set=None)
           .when_not_matched_insert(values=None)
           .execute(mode=mode))
        model.update(upd)
        model.update(ins)

    append()  # non-empty start
    steps = []
    for step in range(10):
        op = rng.choice(["append", "delete", "update", "compact",
                         "expire", "merge", "evolve_spec"])
        steps.append(op)
        if op == "append":
            append()
        elif op == "delete":
            mode = rng.choice(["copy-on-write", "merge-on-read"])
            g = rng.randint(0, 5)
            lo = rng.randint(-100, 50)
            t.delete_where((col("grp") == g) & (col("val") >= lo), mode=mode)
            for i in [i for i, (gg, vv, _) in model.items()
                      if gg == g and vv >= lo]:
                del model[i]
        elif op == "update":
            mode = rng.choice(["copy-on-write", "merge-on-read"])
            g = rng.randint(0, 5)
            t.update(col("grp") == g, {"val": "val + 1000"}, mode=mode)
            for i, (gg, vv, ss) in list(model.items()):
                if gg == g:
                    model[i] = (gg, vv + 1000, ss)
        elif op == "compact":
            t = t.refresh()
            t.rewrite_data_files(strategy="binpack")
        elif op == "expire":
            t = t.refresh()
            # randomly also prune unreachable specs/schemas — scans must
            # keep matching the model afterwards (clean_expired_metadata
            # may never drop a schema a live file still reads through)
            t.expire_snapshots(older_than_ms=2**62, retain_last=2,
                               clean_expired_metadata=bool(
                                   rng.getrandbits(1)))
        elif op == "evolve_spec":
            # flip partitioning: specs accumulate until an expire+clean
            # proves the unreachable ones prune without breaking reads
            t = t.refresh()
            upd = t.update_spec()
            if any(f.name == "grp_bucket" for f in t.spec.fields):
                upd.remove_field("grp_bucket").commit()
            else:
                upd.add_field("grp", "bucket(4)",
                              name="grp_bucket").commit()
        elif op == "merge":
            t = t.refresh()
            merge()
        t = t.refresh()
        assert _scan_rows(t) == _model_rows(model), \
            f"seed={seed} dv={use_dv} diverged after step {step}: {steps}"

    # schema rename mid-life: data written under the old name must read
    # under the new one (field-id mapping, not name matching)
    t.update_schema().rename_column("val", "value").commit()
    t = t.refresh()
    assert _scan_rows(t, "value") == _model_rows(model)
    t.update_schema().rename_column("value", "val").commit()
    t = t.refresh()

    return t, model, steps


@pytest.mark.parametrize("seed,use_dv", [(11, False), (23, True),
                                         (37, False), (41, True)])
def test_random_lifecycle_matches_model(catalog, spark, seed, use_dv):
    t, model, steps = _apply_random_lifecycle(catalog, spark, seed, use_dv)
    assert _scan_rows(t) == _model_rows(model)

    # export the survivor to the reference layout and register it back:
    # the imported table's scan must equal the model as well
    import os
    import tempfile

    from iceberg_spark.sources.iceberg import (export_reference_metadata,
                                               register_iceberg_table)

    dest = tempfile.mkdtemp(prefix=f"lifecycle_exp_{seed}_")
    mpath = export_reference_metadata(t, dest)
    assert os.path.exists(mpath)
    back, n_snaps, _n_files = register_iceberg_table(
        catalog, mpath, f"db.lifecycle_back_{seed}_{int(use_dv)}")
    assert _scan_rows(back) == _model_rows(model), \
        f"seed={seed} dv={use_dv} import round-trip diverged after {steps}"
    assert n_snaps >= 1


@pytest.mark.parametrize("seed,use_dv", [(53, True)])
def test_random_lifecycle_on_hadoop_fileio(spark, tmp_path, seed, use_dv):
    """The same randomized differential with the warehouse behind
    HadoopFileIO (file:// URI): every metadata read/write/CAS of every
    interleaved operation runs the object-store code path."""
    from iceberg_spark.table import Catalog

    cat = Catalog(spark, f"file://{tmp_path}/hwh")
    t, model, steps = _apply_random_lifecycle(cat, spark, seed, use_dv)
    assert _scan_rows(t) == _model_rows(model)
    assert t.location.startswith("file://")


@pytest.mark.parametrize("seed,use_dv", [(67, False)])
def test_random_lifecycle_encrypted_metadata(spark, tmp_path, seed,
                                             use_dv):
    """The same randomized differential with AES-GCM-Stream-encrypted
    metadata versions: every commit/refresh in the interleaving
    encrypts + authenticates, and the final table still matches the
    model (and stays unreadable without the key)."""
    from iceberg_spark.table import Catalog

    key = bytes(range(16, 32))
    cat = Catalog(spark, str(tmp_path / "encwh"), metadata_key=key)
    t, model, steps = _apply_random_lifecycle(cat, spark, seed, use_dv)
    assert _scan_rows(t) == _model_rows(model)
    keyless = Catalog(spark, str(tmp_path / "encwh"))
    with pytest.raises(ValueError, match="encrypted"):
        keyless.load_table(t.identifier)


@pytest.mark.parametrize("seed,use_dv", [(83, True)])
def test_random_lifecycle_everything_on(spark, tmp_path, seed, use_dv):
    """All the orthogonal round-7 axes at once: encrypted metadata +
    encrypted data files + object-storage entropy layout + counts-mode
    metrics on the value column + serializable isolation (default) —
    the interleavings must still match the model."""
    from iceberg_spark import parquet_crypto as PC
    from iceberg_spark.table import Catalog

    kid = f"combo-key-{seed}"
    PC.register_key(kid, bytes(range(4, 20)))
    try:
        cat = Catalog(spark, str(tmp_path / "combowh"),
                      metadata_key=bytes(range(16)))
        t, model, steps = _apply_random_lifecycle(
            cat, spark, seed, use_dv, extra_props={
                PC.KEY_ID_PROP: kid,
                "write.object-storage.enabled": "true",
                "write.metadata.metrics.column.val": "counts",
            })
        assert _scan_rows(t) == _model_rows(model)
        live = [e.file for e in t.scan().plan_files().files]
        assert live
        for f in live:
            assert PC.decode_key_metadata(f.key_metadata) == kid
            st = f.stats.get("val")
            assert st is None or (st[0] is None and st[1] is None)
        # round-8 zero-plaintext guarantee: with BOTH planes on, every
        # file under the table location is encrypted — data/deletes
        # PARE (modular encryption), DV puffin + manifests + lists +
        # metadata.json AGS1 (GCM streams). Only Spark's _SUCCESS/crc
        # droppings and the version hint are exempt.
        import glob as _glob
        import os as _os

        for p in _glob.glob(_os.path.join(t.location, "**", "*"),
                            recursive=True):
            base = _os.path.basename(p)
            if not _os.path.isfile(p) or base.startswith(("_", ".")) \
                    or base == "version-hint.text":
                continue
            magic = open(p, "rb").read(4)
            assert magic in (b"PARE", b"AGS1"), (p, magic)
    finally:
        PC.unregister_key(kid)


@pytest.mark.parametrize("seed,use_dv", [(97, False)])
def test_random_lifecycle_encrypted_manifests_on_hadoop_fileio(
        spark, tmp_path, seed, use_dv):
    """Encrypted metadata TREE (metadata_key -> encrypted manifests +
    lists, round 8) with the warehouse behind HadoopFileIO (file://
    URI): every GCM-stream manifest read/write and every key-chain
    resolution runs the object-store IO path, interleaved with the
    full lifecycle."""
    from iceberg_spark import manifests as M
    from iceberg_spark.table import Catalog

    key = bytes(range(16))
    cat = Catalog(spark, f"file://{tmp_path}/encioh", metadata_key=key)
    t, model, steps = _apply_random_lifecycle(cat, spark, seed, use_dv)
    assert _scan_rows(t) == _model_rows(model)
    assert t.location.startswith("file://")
    assert all(s.key_id for s in t.metadata.snapshots)
    # fresh-process reload through the scheme path + key chain
    M._FILE_KEYS.clear()
    M._MANIFEST_CACHE.clear()
    M._ARROW_CACHE.clear()
    M._ML_CACHE.clear()
    t2 = Catalog(spark, f"file://{tmp_path}/encioh",
                 metadata_key=key).load_table(t.identifier)
    assert _scan_rows(t2) == _model_rows(model)


@pytest.mark.parametrize("seed,use_dv", [(71, False), (79, True)])
def test_random_lifecycle_encrypted_data(spark, tmp_path, seed, use_dv):
    """The same randomized differential with ENCRYPTED DATA FILES
    (parquet modular encryption): every append/merge/CoW rewrite/
    compaction writes encrypted parquet, every scan/changelog/delete
    read decrypts, and the interleavings still match the model. The
    engine's strongest evidence that the encrypted read/write paths are
    semantically identical to the plaintext ones."""
    import glob
    import os

    from iceberg_spark import parquet_crypto as PC
    from iceberg_spark.table import Catalog

    kid = f"lifecycle-key-{seed}"
    PC.register_key(kid, bytes(range(8, 24)))
    try:
        cat = Catalog(spark, str(tmp_path / "dencwh"))
        t, model, steps = _apply_random_lifecycle(
            cat, spark, seed, use_dv, extra_props={PC.KEY_ID_PROP: kid})
        assert _scan_rows(t) == _model_rows(model)
        # every live DATA file on disk is encrypted-footer parquet
        live = [e.file for e in t.scan().plan_files().files]
        assert live
        for f in live:
            assert PC.decode_key_metadata(f.key_metadata) == kid
            with open(f.file_path, "rb") as fh:
                assert fh.read(4) == b"PARE"
    finally:
        PC.unregister_key(kid)


@pytest.mark.parametrize("seed,use_dv", [(311, False), (313, True)])
def test_random_lifecycle_transcode_export_roundtrip(spark, tmp_path,
                                                     seed, use_dv):
    """Everything-on lifecycle (encrypted metadata + engine-kms data
    files, random append/merge/delete interleavings, MoR + DVs), then
    TRANSCODE-export the final state to the reference layout and
    re-import it: every content file re-encrypts as a raw-DEK copy
    (pos-delete content remapped, DV containers rebuilt) and the
    imported rows must still match the model exactly."""
    from iceberg_spark import parquet_crypto as PC
    from iceberg_spark.encryption import aes_gcm_decrypt
    from iceberg_spark.sources.iceberg import (export_reference_metadata,
                                               snapshot_iceberg_table)
    from iceberg_spark.table import Catalog

    kid = f"tx-key-{seed}"
    PC.register_key(kid, bytes(range(4, 20)))
    master = bytes(range(48, 64))
    try:
        cat = Catalog(spark, str(tmp_path / "srcwh"),
                      metadata_key=bytes(range(16)))
        t, model, steps = _apply_random_lifecycle(
            cat, spark, seed, use_dv,
            extra_props={PC.KEY_ID_PROP: kid})
        dest = str(tmp_path / "exp")
        export_reference_metadata(t, dest, encryption_key=master,
                                  transcode_encrypted_data=True)
        # zero plaintext among the transcoded copies
        import glob as _glob
        import os as _os

        for p in _glob.glob(_os.path.join(dest, "data", "*")):
            magic = open(p, "rb").read(4)
            assert magic in (b"PARE", b"AGS1"), (p, magic)
        # transcoded copies carry raw DEKs -> the destination catalog
        # must encrypt its own metadata tree (plaintext-DEK leak guard)
        cat2 = Catalog(spark, str(tmp_path / "dstwh"),
                       metadata_key=bytes(range(8, 24)))
        t2, _n, _d = snapshot_iceberg_table(
            cat2, dest, "db.tx_rt",
            kms_unwrap=lambda w, k: aes_gcm_decrypt(master, w, b""))
        assert _scan_rows(t2) == _model_rows(model), steps
    finally:
        PC.unregister_key(kid)


@pytest.mark.parametrize("seed", [61, 67])
def test_random_lifecycle_file_granularity(catalog, spark, seed):
    """The full randomized differential under
    write.delete.granularity=file: every MoR delete/update/merge writes
    per-file position deletes; compaction, expiry, and the export/import
    round-trip must behave identically to partition granularity."""
    t, model, steps = _apply_random_lifecycle(
        catalog, spark, seed, use_dv=False,
        extra_props={"write.delete.granularity": "file"})
    assert _scan_rows(t) == _model_rows(model), \
        f"seed={seed} file-granularity diverged after {steps}"
    for d in t.scan().plan_files().pos_deletes:
        if d.file.file_format == "parquet":
            assert d.file.referenced_data_file is not None

    import os
    import tempfile

    from iceberg_spark.sources.iceberg import (export_reference_metadata,
                                               register_iceberg_table)

    dest = tempfile.mkdtemp(prefix=f"lifecycle_fgran_{seed}_")
    mpath = export_reference_metadata(t, dest)
    assert os.path.exists(mpath)
    back, _n, _f = register_iceberg_table(
        catalog, mpath, f"db.lifecycle_fgran_back_{seed}")
    assert _scan_rows(back) == _model_rows(model), \
        f"seed={seed} file-granularity export round-trip diverged"
