"""Engine-native manifest + manifest-list encryption (reference
StandardEncryptionManager, core/.../encryption/StandardEncryptionManager.java;
format/spec.md:1294 `encryption-keys`; format/gcm-stream-spec.md):

With a catalog `metadata_key`, the WHOLE metadata tree encrypts —
metadata.json versions (EncryptedFileIO), and every manifest +
manifest list as AES GCM Streams under per-file keys chained through
KEK-wrapped StandardKeyMetadata entries in the table metadata's
`encryption-keys` list. These tests cover the full lifecycle (append,
MoR delete, compaction, expire), key-chain shape, fresh-process
reloads, keyless/tampered failure modes, and distributed planning
through the decrypting executor path.
"""

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from iceberg_spark import manifests as M
from iceberg_spark.encryption import (MAGIC, StandardTableKeys,
                                      aes_gcm_decrypt, decrypt_stream)
from iceberg_spark.expressions import col
from iceberg_spark.table import Catalog

KEY = bytes(range(16))


def _clear_key_registry():
    """Simulate a fresh process: no cached keys, caches, or entries."""
    M._FILE_KEYS.clear()
    M._MANIFEST_CACHE.clear()
    M._ARROW_CACHE.clear()
    M._ML_CACHE.clear()


def _metadata_parquet(location):
    mdir = os.path.join(location, "metadata")
    return (glob.glob(os.path.join(mdir, "manifests", "*.parquet"))
            + glob.glob(os.path.join(mdir, "manifest-lists", "*.parquet")))


@pytest.fixture()
def enc_table(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"), metadata_key=KEY)
    df = spark.range(0, 400).selectExpr(
        "id", "id % 7 as g", "cast(id * 1.5 as double) as v")
    t = cat.create_table("db.enc", df.schema)
    for lo in range(0, 400, 100):
        t.append(df.filter((F.col("id") >= lo) & (F.col("id") < lo + 100)))
    t.delete_where(col("id") <= 40, mode="merge-on-read")
    return cat, cat.load_table("db.enc")


def test_full_metadata_tree_encrypted_and_lifecycle(spark, enc_table):
    cat, t = enc_table
    assert t.to_df().count() == 359
    files = _metadata_parquet(t.location)
    assert len(files) >= 5
    assert all(open(p, "rb").read(4) == MAGIC for p in files), \
        "every manifest and manifest list must be an AES GCM Stream"

    # compaction rewrites manifests — still encrypted, still correct
    from iceberg_spark.maintenance import rewrite_data_files

    rewrite_data_files(t)
    t = t.refresh()
    assert t.to_df().count() == 359
    files = _metadata_parquet(t.location)
    assert all(open(p, "rb").read(4) == MAGIC for p in files)

    # expire old snapshots — encrypted lists of kept snapshots still
    # read, and encryption-keys entries of EXPIRED snapshots prune (the
    # KEK survives while any kept entry chains through it)
    from iceberg_spark.maintenance import expire_snapshots

    n_keys_before = len(t.metadata.encryption_keys)
    expire_snapshots(t, older_than_ms=2 ** 62, retain_last=1)
    t = t.refresh()
    assert t.to_df().count() == 359
    keys = t.metadata.encryption_keys
    assert len(keys) == 2 < n_keys_before  # 1 KEK + 1 live list key
    assert {e["key-id"] for e in keys} >= {
        s.key_id for s in t.metadata.snapshots if s.key_id}


def test_fresh_process_reload_and_time_travel(spark, enc_table):
    cat, t = enc_table
    first = t.metadata.snapshots[0].snapshot_id
    wh = os.path.dirname(os.path.dirname(t.location))
    _clear_key_registry()
    t2 = Catalog(spark, wh, metadata_key=KEY).load_table("db.enc")
    assert t2.to_df().count() == 359
    # time travel uses an OLD snapshot's list key from the chain
    assert t2.scan(snapshot_id=first).df().count() == 100


def test_keyless_open_fails_loudly(spark, enc_table):
    cat, t = enc_table
    wh = os.path.dirname(os.path.dirname(t.location))
    _clear_key_registry()
    with pytest.raises(ValueError, match="encrypted"):
        Catalog(spark, wh).load_table("db.enc")


def test_manifest_without_registered_key_fails_loudly(spark, enc_table):
    cat, t = enc_table
    mpath = glob.glob(os.path.join(t.location, "metadata", "manifests",
                                   "*.parquet"))[0]
    _clear_key_registry()
    with pytest.raises(ValueError, match="no .*key|encrypted"):
        M.read_manifest(mpath, t.metadata.schema, t.metadata.spec)


def test_tampered_manifest_fails_authentication(spark, enc_table):
    cat, t = enc_table
    t.to_df().count()  # populate registry
    mf = M.read_manifest_list(t.metadata.current_snapshot().manifest_list)[0]
    raw = bytearray(open(mf.path, "rb").read())
    raw[len(raw) // 2] ^= 0x01
    open(mf.path, "wb").write(bytes(raw))
    M._MANIFEST_CACHE.clear()
    M._ARROW_CACHE.clear()
    with pytest.raises(ValueError, match="authentication|failed"):
        M.read_manifest(mf.path, t.metadata.schema, t.metadata.spec)


def test_encryption_keys_chain_shape(spark, enc_table):
    """The durable format IS the reference chain: snapshot key-id ->
    `encryption-keys` StandardKeyMetadata under a KEK (AAD =
    KEY_TIMESTAMP) -> KEK wrapped by the KMS (engine: metadata_key,
    AAD = `encrypted-by-id`). Resolve it with the same StandardTableKeys
    decoder the genuine-Iceberg IMPORT path uses — proving the write
    side emits exactly the layout the read side expects."""
    cat, t = enc_table
    m = t.metadata
    assert m.encryption_keys
    keks = [e for e in m.encryption_keys
            if e.get("encrypted-by-id") == "metadata-key"]
    assert len(keks) == 1, "one KEK reused across the table's commits"
    assert keks[0]["properties"][StandardTableKeys.KEY_TIMESTAMP]
    ml_entries = [e for e in m.encryption_keys
                  if e.get("encrypted-by-id") == keks[0]["key-id"]]
    assert len(ml_entries) == len(m.snapshots)
    assert all(s.key_id for s in m.snapshots)

    def kms_unwrap(wrapped, key_id):
        return aes_gcm_decrypt(KEY, wrapped, key_id.encode("utf-8"))

    tk = StandardTableKeys(list(m.encryption_keys), kms_unwrap)
    for s in m.snapshots:
        key, aad = tk.manifest_list_key(s.key_id)
        pt = decrypt_stream(open(s.manifest_list, "rb").read(), key, aad)
        assert pt[:4] == b"PAR1"  # decrypts to a real parquet list


def test_distributed_planning_decrypts_on_executors(spark, enc_table):
    cat, t = enc_table
    M._MANIFEST_CACHE.clear()
    local = t.scan(planning_mode="local").plan_files()
    M._MANIFEST_CACHE.clear()
    dist = t.scan(planning_mode="distributed").plan_files()
    assert sorted(e.file.file_path for e in dist.files) == \
        sorted(e.file.file_path for e in local.files)
    # filtered: executor-side arrow prefilter + driver re-eval
    M._MANIFEST_CACHE.clear()
    dfid = t.scan(filter=col("id") >= 300,
                  planning_mode="distributed").plan_files()
    M._MANIFEST_CACHE.clear()
    lfid = t.scan(filter=col("id") >= 300,
                  planning_mode="local").plan_files()
    assert sorted(e.file.file_path for e in dfid.files) == \
        sorted(e.file.file_path for e in lfid.files)
    assert t.scan(filter=col("id") >= 300,
                  planning_mode="distributed").df().count() == 100


def test_sql_catalog_encrypted_manifests(spark, tmp_path):
    from iceberg_spark.catalogs import SqlCatalog

    cat = SqlCatalog(spark, str(tmp_path / "wh"), metadata_key=KEY)
    df = spark.range(0, 50).selectExpr("id", "id % 3 as g")
    t = cat.create_table("db.s", df.schema)
    t.append(df)
    t.delete_where(col("id") < 10, mode="merge-on-read")
    t = cat.load_table("db.s")
    assert t.to_df().count() == 40
    files = _metadata_parquet(t.location)
    assert files and all(open(p, "rb").read(4) == MAGIC for p in files)
    _clear_key_registry()
    t2 = SqlCatalog(spark, str(tmp_path / "wh"),
                    metadata_key=KEY).load_table("db.s")
    assert t2.to_df().count() == 40


def test_rewrite_table_path_refuses_without_key_context(spark, enc_table,
                                                        tmp_path):
    """r9: rewrite_table_path re-wraps encrypted trees when the table
    was loaded WITH its metadata_key (see
    test_rewrite_table_path_rewraps_encrypted_tree); a handle without
    the KMS context still refuses rather than decrypt-copying."""
    cat, t = enc_table
    from iceberg_spark.maintenance import rewrite_table_path
    from iceberg_spark.table import Table

    keyless = Table(spark, t.location, t.metadata, t.identifier)

    class _NoKeyOps:
        metadata_key = None

        def refresh(self):
            return t.metadata

    keyless.ops = _NoKeyOps()
    with pytest.raises(NotImplementedError, match="metadata_key"):
        rewrite_table_path(keyless, t.location, str(tmp_path / "dr"))


def test_concurrent_commit_retry_encrypted(spark, tmp_path):
    """CAS-losing commits on an encrypted-manifest table rebuild their
    ManifestCrypto against the refreshed base on retry — the loser's
    provisional encryption-keys entries never leak into metadata, the
    winner's chain stays intact, and every snapshot still decrypts."""
    cat = Catalog(spark, str(tmp_path / "wh"), metadata_key=KEY)
    df = spark.range(0, 60).selectExpr("id")
    t = cat.create_table("db.cc", df.schema)
    t.append(df)
    stale = cat.load_table("db.cc")  # second handle, same base
    t = cat.load_table("db.cc")
    t.append(spark.range(100, 130).selectExpr("id"))      # winner
    stale.append(spark.range(200, 260).selectExpr("id"))  # retries, lands
    t = cat.load_table("db.cc")
    assert t.to_df().count() == 60 + 30 + 60
    m = t.metadata
    assert all(s.key_id for s in m.snapshots)
    kids = {e["key-id"] for e in m.encryption_keys}
    # exactly 1 KEK + one list key per snapshot — no orphaned entries
    # from the losing attempt
    assert len(m.encryption_keys) == 1 + len(m.snapshots)
    assert all(s.key_id in kids for s in m.snapshots)
    _clear_key_registry()
    t2 = Catalog(spark, str(tmp_path / "wh"),
                 metadata_key=KEY).load_table("db.cc")
    assert t2.to_df().count() == 150


def test_streaming_source_and_sink_over_encrypted_tables(spark, tmp_path):
    """The micro-batch incremental source reads encrypted manifest
    lists/manifests through the key registry, and the epoch-idempotent
    sink COMMITS encrypted manifests — appends stream out of one
    encrypted table into another batch-for-batch."""
    from iceberg_spark.streaming import MicroBatchStream, append_sink

    cat = Catalog(spark, str(tmp_path / "wh"), metadata_key=KEY)
    df = spark.range(0, 50).selectExpr("id")
    t = cat.create_table("db.src", df.schema)
    t.append(df)
    sink = cat.create_table("db.sink", df.schema)
    stream = MicroBatchStream(t, str(tmp_path / "ckpt"),
                              from_snapshot_id=-1)
    assert stream.process_available(append_sink(sink, "q1")) >= 1
    sink = cat.load_table("db.sink")
    assert sink.to_df().count() == 50
    files = _metadata_parquet(sink.location)
    assert files and all(open(p, "rb").read(4) == MAGIC for p in files)


def test_stats_files_encrypt_under_metadata_key(spark, tmp_path):
    """Statistics files carry partition VALUES and NDV sketches — under
    a metadata_key catalog they encrypt too (AES GCM Streams with the
    key riding the stats entry inside the encrypted metadata.json), and
    the incremental partition-stats merge decrypts the previous file."""
    from iceberg_spark.maintenance import (compute_partition_stats,
                                           compute_table_stats)

    cat = Catalog(spark, str(tmp_path / "wh"), metadata_key=KEY)
    df = spark.range(0, 200).selectExpr("id", "id % 4 as g")
    t = cat.create_table("db.ps", df.schema, partition_by=["g"])
    t.append(df)
    p1 = compute_partition_stats(t.refresh())
    assert open(p1, "rb").read(4) == MAGIC
    ndv = compute_table_stats(t.refresh(), columns=["g"])
    assert ndv["ndv"]["g"] == 4
    t = cat.load_table("db.ps")
    spath = t.metadata.statistics_files[-1]["statistics-path"]
    assert open(spath, "rb").read(4) == MAGIC
    assert t.metadata.statistics_files[-1]["engine-key-metadata"]

    # append-only lineage -> incremental merge reads the ENCRYPTED
    # previous stats file
    t.append(spark.range(200, 300).selectExpr("id", "id % 4 as g"))
    t = cat.load_table("db.ps")
    p2 = compute_partition_stats(t, incremental=True)
    assert open(p2, "rb").read(4) == MAGIC
    assert t.last_partition_stats_report["mode"] == "incremental"
    from iceberg_spark.maintenance import _read_stats_parquet

    t = cat.load_table("db.ps")
    sdf = _read_stats_parquet(
        spark, t.metadata.partition_statistics_files[-1])
    rows = {r["partition"]["g"]: r["data_record_count"]
            for r in sdf.collect()}
    assert rows == {0: 75, 1: 75, 2: 75, 3: 75}
    # nothing plaintext under metadata/ except the version hint
    for p in glob.glob(os.path.join(t.location, "metadata", "**", "*"),
                       recursive=True):
        base = os.path.basename(p)
        if not os.path.isfile(p) or base == "version-hint.text" \
                or base.startswith(("_", ".")):
            continue
        assert open(p, "rb").read(4) == MAGIC, p


def test_rewrite_table_path_rewraps_encrypted_tree(spark, tmp_path):
    """DR copy of an encrypted tree re-encrypts under a FRESH key chain:
    no source `encryption-keys` entry (and no source file key) appears
    in the copy, every copied metadata file is an AGS1 stream, and the
    copy scans identically under the same metadata_key."""
    from iceberg_spark.encryption import MAGIC
    from iceberg_spark.maintenance import rewrite_table_path
    from iceberg_spark.metadata import TableOperations
    from iceberg_spark.table import Catalog, Table

    mkey = bytes(range(100, 116))
    cat = Catalog(spark, str(tmp_path / "wh"), metadata_key=mkey)
    df = spark.range(0, 60).selectExpr("id", "id % 3 as g")
    t = cat.create_table("db.drt", df.schema, partition_by=["g"])
    t.append(df)
    t.append(spark.range(60, 80).selectExpr("id", "id % 3 as g"))
    t = cat.load_table("db.drt")
    from iceberg_spark.maintenance import compute_partition_stats

    compute_partition_stats(t)
    t = cat.load_table("db.drt")
    src_ids = {k["key-id"] for k in t.metadata.encryption_keys}
    target = str(tmp_path / "copy")
    res = rewrite_table_path(t, t.location, target)
    assert res["rewritten_manifests"] >= 2
    import os as _os

    from iceberg_spark.io import resolve_io

    # the plan includes the encrypted partition-stats file
    assert len(res["data_files_to_copy"]) >= 3  # data files + stats
    for s, d in res["data_files_to_copy"]:
        io_ = resolve_io(d, spark)
        if not io_.exists(d):
            io_.write_bytes(d, resolve_io(s, spark).read_bytes(s))
    for root, _dirs, files in _os.walk(_os.path.join(target, "metadata")):
        for f in files:
            assert open(_os.path.join(root, f), "rb").read(4) == MAGIC, f
    ops = TableOperations(target, metadata_key=mkey)
    m2 = ops.refresh()
    # fresh chain: zero overlap with the source's key ids
    assert {k["key-id"] for k in m2.encryption_keys}.isdisjoint(src_ids)
    assert all(s.key_id for s in m2.snapshots)
    t2 = Table(spark, target, m2, "db.drt_copy")
    assert t2.to_df().count() == 80
    # the copied (encrypted) partition-stats file reads at the NEW path
    assert m2.partition_statistics_files
    from iceberg_spark.maintenance import _read_stats_parquet

    pstats = _read_stats_parquet(spark, dict(
        m2.partition_statistics_files[-1]))
    assert pstats.count() > 0
    # keyless open refuses
    with pytest.raises(ValueError):
        TableOperations(target).refresh()
