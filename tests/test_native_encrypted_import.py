"""Import of NATIVELY-encrypted reference content files (raw footer DEK
parquet modular encryption, reference StandardKeyMetadata on
data_file.key_metadata — Parquet.java WriteBuilder
withFileEncryptionKey/withAADPrefix, StandardKeyMetadata.java). pyarrow
has no raw-footer-key surface, so these files open ONLY through Spark's
own reader via jvm_crypto.RawDekCryptoFactory; without it every path
refuses loudly."""

import glob
import os
import secrets

import pytest
from pyspark.sql import functions as F

from iceberg_spark import jvm_crypto as JC
from iceberg_spark import parquet_crypto as PC
from iceberg_spark.encryption import (aes_gcm_decrypt,
                                      encode_standard_key_metadata)
from iceberg_spark.sources.iceberg import snapshot_iceberg_table
from iceberg_spark.sources.iceberg_fixture import write_reference_table
from iceberg_spark.table import Catalog

MASTER = bytes(range(32, 48))
# destination catalogs importing raw-DEK entries must encrypt their own
# metadata tree, or the import refuses (plaintext-DEK leak guard)
DEST_KEY = bytes(range(48, 64))


def test_file_crypto_classifier():
    # engine parquet-kms JSON blob
    assert PC.file_crypto(PC.encode_key_metadata("k1")) == ("kms", "k1")
    # reference StandardKeyMetadata (raw DEK + AAD)
    dek, aad = secrets.token_bytes(16), secrets.token_bytes(8)
    skm = encode_standard_key_metadata(dek, aad, 123)
    assert PC.file_crypto(skm) == ("raw", dek, aad)
    assert PC.file_crypto(None) is None
    with pytest.raises(NotImplementedError):
        PC.file_crypto(b"\x07garbage")
    # decode_key_metadata must NOT silently treat an SKM blob as a key id
    with pytest.raises(NotImplementedError):
        PC.decode_key_metadata(skm)


def test_unwrap_stream_key_accepts_skm():
    dek, aad = secrets.token_bytes(16), secrets.token_bytes(8)
    skm = encode_standard_key_metadata(dek, aad, None)
    assert PC.unwrap_stream_key(skm) == (dek, aad)


def _write_raw(spark, df, dest, dek, aad, tmp_path, tag):
    tmp = str(tmp_path / f"w_{tag}")
    (df.coalesce(1).write.mode("overwrite")
     .options(**JC.raw_writer_options(dek, aad)).parquet(tmp))
    os.rename(glob.glob(os.path.join(tmp, "*.parquet"))[0], dest)


@pytest.fixture(scope="module")
def natenc_table(spark, tmp_path_factory):
    """Reference-layout table: 2 raw-DEK-encrypted data files + 1
    raw-DEK-encrypted position-delete file, encrypted manifests."""
    tmp_path = tmp_path_factory.mktemp("natenc")
    assert JC.available(spark)
    root = str(tmp_path / "src")
    os.makedirs(os.path.join(root, "data"))
    base = spark.range(0, 100).selectExpr(
        "id", "id % 5 as g", "cast(id as double) as v")
    schema_json = {"type": "struct", "schema-id": 0, "fields": [
        {"id": 1, "name": "id", "required": False, "type": "long"},
        {"id": 2, "name": "g", "required": False, "type": "long"},
        {"id": 3, "name": "v", "required": False, "type": "double"}]}
    import struct

    files, keys = [], {}
    for i, pred in enumerate([F.col("id") < 50, F.col("id") >= 50]):
        dek, aad = secrets.token_bytes(16), secrets.token_bytes(8)
        dest = os.path.join(root, "data", f"enc-{i}.parquet")
        _write_raw(spark, base.filter(pred), dest, dek, aad, tmp_path,
                   f"d{i}")
        keys[dest] = (dek, aad)
        lo, hi = (0, 49) if i == 0 else (50, 99)
        files.append({
            "path": dest, "record_count": 50,
            "file_size": os.path.getsize(dest), "seq": 1,
            "key_metadata": encode_standard_key_metadata(
                dek, aad, os.path.getsize(dest)),
            # manifest metric maps (fid 1 = id): the only stats source
            # for a file whose footer is unreadable without the key
            "value_counts": [{"key": 1, "value": 50}],
            "null_value_counts": [{"key": 1, "value": 0}],
            "lower_bounds": [{"key": 1,
                              "value": struct.pack("<q", lo)}],
            "upper_bounds": [{"key": 1,
                              "value": struct.pack("<q", hi)}]})
    # delete ids ending in 0 via positions read back through the raw path
    del_rows = []
    for dest, (dek, aad) in keys.items():
        rows = (spark.read
                .options(**JC.raw_reader_options({dest: (dek, aad)}))
                .parquet(dest)
                .select(F.col("_metadata.row_index").alias("pos"), "id")
                .collect())
        del_rows += [(dest, int(r.pos)) for r in rows if r.id % 10 == 0]
    assert len(del_rows) == 10
    ddek, daad = secrets.token_bytes(16), secrets.token_bytes(8)
    dpath = os.path.join(root, "data", "enc-del.parquet")
    _write_raw(spark,
               spark.createDataFrame(sorted(del_rows),
                                     "file_path string, pos long"),
               dpath, ddek, daad, tmp_path, "del")
    files.append({"path": dpath, "content": 1, "record_count": 10,
                  "file_size": os.path.getsize(dpath), "seq": 2,
                  "key_metadata": encode_standard_key_metadata(
                      ddek, daad, os.path.getsize(dpath))})
    write_reference_table(root, schema_json, files, format_version=3,
                          encryption_key=MASTER)
    cat = Catalog(spark, str(tmp_path / "wh"), metadata_key=DEST_KEY)
    t, n_data, n_del = snapshot_iceberg_table(
        cat, root, "db.natenc",
        kms_unwrap=lambda w, kid: aes_gcm_decrypt(MASTER, w, b""))
    assert (n_data, n_del) == (2, 1)
    return cat.load_table("db.natenc"), root


def test_scan_applies_raw_dek_and_pos_deletes(natenc_table, spark):
    t, _root = natenc_table
    got = sorted(r.id for r in t.to_df().select("id").collect())
    assert got == [i for i in range(100) if i % 10 != 0]


def test_filter_and_agg_over_raw_dek(natenc_table):
    t, _root = natenc_table
    rows = (t.scan(filter=None).df().filter(F.col("id") >= 90)
            .groupBy("g").agg(F.count(F.lit(1)).alias("n"))
            .orderBy("g").collect())
    # 90..99 minus 90 -> 9 rows over g = id%5
    assert sum(r.n for r in rows) == 9


def test_no_plaintext_content_files(natenc_table):
    import pyarrow.parquet as pq

    _t, root = natenc_table
    for p in glob.glob(os.path.join(root, "data", "*.parquet")):
        with pytest.raises(Exception):
            pq.ParquetFile(p)


def test_manifest_stats_prune_encrypted_files(natenc_table):
    """Bounds from the SOURCE manifest's metric maps (the only stats
    source when footers are encrypted) min/max-prune the imported
    table: a filter that only one encrypted file can satisfy plans
    exactly that file."""
    from iceberg_spark.expressions import col

    t, _root = natenc_table
    plan = t.scan(filter=col("id") >= 60).plan_files()
    assert len(plan.files) == 1
    plan = t.scan(filter=col("id") < 40).plan_files()
    assert len(plan.files) == 1
    assert len(t.scan().plan_files().files) == 2


def test_key_metadata_carried_verbatim(natenc_table):
    t, _root = natenc_table
    entries = t.scan().plan_files()
    kms = [e.file.key_metadata for e in entries.files]
    assert len(kms) == 2 and all(k and bytes(k[:1]) == b"\x01"
                                 for k in kms)
    assert all(PC.file_crypto(k)[0] == "raw" for k in kms)


def test_export_roundtrip_preserves_raw_deks(natenc_table, spark,
                                             tmp_path):
    from iceberg_spark.sources.iceberg import export_reference_metadata

    t, _root = natenc_table
    # keyless export of a raw-DEK table AUTO-PROMOTES the catalog's
    # metadata_key (never silently plaintext, even when the
    # encryption-keys chain is empty)
    dest0 = str(tmp_path / "exp_auto")
    export_reference_metadata(t, dest0)
    ml = glob.glob(os.path.join(dest0, "metadata", "*.avro"))
    assert ml and all(open(p, "rb").read(4) == b"AGS1" for p in ml)
    dest = str(tmp_path / "exp")
    export_reference_metadata(t, dest, encryption_key=MASTER)
    cat2 = Catalog(spark, str(tmp_path / "wh2"), metadata_key=DEST_KEY)
    t2, n_data, n_del = snapshot_iceberg_table(
        cat2, dest, "db.natenc_rt",
        kms_unwrap=lambda w, kid: aes_gcm_decrypt(MASTER, w, b""))
    assert (n_data, n_del) == (2, 1)
    got = sorted(r.id for r in t2.to_df().select("id").collect())
    assert got == [i for i in range(100) if i % 10 != 0]


def test_refuses_without_jvm_crypto(natenc_table, monkeypatch):
    t, _root = natenc_table
    monkeypatch.setenv("ICEBERG_SPARK_JVM_CRYPTO", "0")
    with pytest.raises(NotImplementedError, match="raw footer DEK"):
        t.to_df().collect()


def test_export_transcodes_engine_kms_to_raw_dek(spark, tmp_path):
    """An engine-kms-encrypted table (parquet_crypto envelope the
    reference cannot unwrap) exports to the reference layout by
    TRANSCODING: data + pos-delete files re-encrypt as raw-DEK copies
    with StandardKeyMetadata, pos-delete content remaps to the new
    paths, and the export re-imports to the identical row set. Without
    the flag the refusal stands."""
    from iceberg_spark.sources.iceberg import export_reference_metadata

    PC.register_key("tkms", bytes(range(16)))
    cat = Catalog(spark, str(tmp_path / "wh"))
    df = spark.range(0, 90).selectExpr("id", "id % 9 as g")
    t = cat.create_table("db.kms_t", df.schema, properties={
        PC.KEY_ID_PROP: "tkms", "write.delete.mode": "merge-on-read"})
    t.append(df)
    t.delete_where(
        __import__("iceberg_spark.expressions",
                   fromlist=["col"]).col("id").isin(
            [i for i in range(90) if i % 10 == 0]),
        mode="merge-on-read")
    t = cat.load_table("db.kms_t")
    dest = str(tmp_path / "exp")
    with pytest.raises(NotImplementedError, match="transcode"):
        export_reference_metadata(t, dest, encryption_key=MASTER)
    export_reference_metadata(t, dest, encryption_key=MASTER,
                              transcode_encrypted_data=True)
    # every transcoded content file refuses a keyless open
    import pyarrow.parquet as pq

    tfiles = glob.glob(os.path.join(dest, "data", "*.parquet"))
    assert len(tfiles) >= 2  # >=1 data + 1 pos delete
    for p in tfiles:
        with pytest.raises(Exception):
            pq.ParquetFile(p)
    cat2 = Catalog(spark, str(tmp_path / "wh2"), metadata_key=DEST_KEY)
    t2, _n, _d = snapshot_iceberg_table(
        cat2, dest, "db.kms_rt",
        kms_unwrap=lambda w, kid: aes_gcm_decrypt(MASTER, w, b""))
    got = sorted(r.id for r in t2.to_df().select("id").collect())
    assert got == [i for i in range(90) if i % 10 != 0]


def test_import_reference_encrypted_puffin_dv(spark, tmp_path):
    """A reference table whose deletion vector rides an ENCRYPTED Puffin
    container (whole-file AES GCM Stream, StandardKeyMetadata on the
    entry — the reference's non-parquet content-file encryption) imports
    and applies the DV correctly: unwrap_stream_key decodes the SKM blob
    directly (no KMS envelope) and the reader decrypts-then-slices."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_spark.deletion_vectors import write_dv_puffin
    from iceberg_spark.encryption import encrypt_stream
    from iceberg_spark.sources.iceberg_fixture import write_reference_table

    root = str(tmp_path / "src")
    os.makedirs(os.path.join(root, "data"))
    dpath = os.path.join(root, "data", "d0.parquet")
    pq.write_table(pa.table({"id": pa.array(range(100), pa.int64())}),
                   dpath)
    dv_path = os.path.join(root, "data", "dv.puffin")
    meta = write_dv_puffin(dv_path,
                           {dpath: np.array([3, 7, 11], np.int64)})[0]
    key, aad = secrets.token_bytes(16), secrets.token_bytes(16)
    raw = open(dv_path, "rb").read()
    ct = encrypt_stream(raw, key, aad)
    open(dv_path, "wb").write(ct)
    schema_json = {"type": "struct", "schema-id": 0, "fields": [
        {"id": 1, "name": "id", "required": False, "type": "long"}]}
    files = [
        {"path": dpath, "record_count": 100,
         "file_size": os.path.getsize(dpath), "seq": 1},
        {"path": dv_path, "format": "puffin", "content": 1,
         "record_count": meta["cardinality"],
         "file_size": len(ct), "seq": 2,
         "referenced_data_file": dpath,
         "content_offset": meta["content_offset"],
         "content_size": meta["content_size_in_bytes"],
         "key_metadata": encode_standard_key_metadata(key, aad,
                                                      len(ct))}]
    write_reference_table(root, schema_json, files, format_version=3)
    cat = Catalog(spark, str(tmp_path / "wh"), metadata_key=DEST_KEY)
    t, n_data, n_del = snapshot_iceberg_table(cat, root, "db.encdv")
    assert (n_data, n_del) == (1, 1)
    got = sorted(r.id for r in t.to_df().collect())
    assert got == [i for i in range(100) if i not in (3, 7, 11)]


def test_export_transcode_rebuilds_encrypted_dvs(spark, tmp_path):
    """Transcode export over an engine-kms table whose MoR deletes are
    DELETION VECTORS: the ags1-encrypted Puffin containers (reference-
    unreadable KMS wrap, payload naming the pre-transcode data paths)
    rebuild as fresh SKM-encrypted containers referencing the raw-DEK
    data copies; the round trip applies the DV exactly."""
    from iceberg_spark.expressions import col
    from iceberg_spark.sources.iceberg import export_reference_metadata

    PC.register_key("dvkms", bytes(range(64, 80)))
    cat = Catalog(spark, str(tmp_path / "wh"))
    df = spark.range(0, 80).selectExpr("id", "id % 4 as g")
    t = cat.create_table("db.kmsdv", df.schema, properties={
        PC.KEY_ID_PROP: "dvkms",
        "write.delete.mode": "merge-on-read",
        "write.delete.format": "dv"})
    t.append(df)
    t.delete_where(col("id").isin([5, 15, 25, 35]),
                   mode="merge-on-read")
    t = cat.load_table("db.kmsdv")
    plan = t.scan().plan_files()
    assert any(d.file.file_format == "puffin" for d in plan.pos_deletes)
    dest = str(tmp_path / "exp")
    export_reference_metadata(t, dest, encryption_key=MASTER,
                              transcode_encrypted_data=True)
    # rebuilt DV containers are fresh AGS1 streams under dest/data
    puffins = glob.glob(os.path.join(dest, "data", "*.puffin"))
    assert puffins
    assert all(open(p, "rb").read(4) == b"AGS1" for p in puffins)
    cat2 = Catalog(spark, str(tmp_path / "wh2"), metadata_key=DEST_KEY)
    t2, _n, n_del = snapshot_iceberg_table(
        cat2, dest, "db.kmsdv_rt",
        kms_unwrap=lambda w, kid: aes_gcm_decrypt(MASTER, w, b""))
    assert n_del >= 1
    got = sorted(r.id for r in t2.to_df().select("id").collect())
    assert got == [i for i in range(80) if i not in (5, 15, 25, 35)]


def test_raw_dek_scan_plan_shape(natenc_table):
    """Imported raw-DEK files scan through Spark's NATIVE reader: a real
    FileScan (vectorized, whole-stage codegen) with Catalyst filter
    pushdown reaching the decrypting scan — never a mapInPandas python
    plan. Same plan shape a plaintext table gets."""
    from iceberg_spark.expressions import col

    t, _root = natenc_table
    sdf = t.scan(filter=col("id") >= 60).df()
    plan = sdf._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" in plan
    assert "MapInPandas" not in plan
    assert "PushedFilters: [" in plan and "GreaterThanOrEqual" in plan

def test_plaintext_dest_refuses_raw_dek_import(natenc_table, spark,
                                               tmp_path):
    """Importing raw-DEK entries into a catalog WITHOUT metadata_key
    would persist every file's plaintext decryption key in plaintext
    engine manifests — refused loudly; allow_plaintext_key_metadata=True
    is the explicit opt-in; an encrypted catalog imports freely and its
    manifests carry the AGS1 magic."""
    import glob as _g

    _t, root = natenc_table
    unwrap = lambda w, kid: aes_gcm_decrypt(MASTER, w, b"")  # noqa: E731
    plain = Catalog(spark, str(tmp_path / "wh_plain"))
    with pytest.raises(ValueError, match="metadata_key"):
        snapshot_iceberg_table(plain, root, "db.leak", kms_unwrap=unwrap)
    # explicit opt-in still works (the caller owns the consequence)
    t, n_data, n_del = snapshot_iceberg_table(
        plain, root, "db.leak_optin", kms_unwrap=unwrap,
        allow_plaintext_key_metadata=True)
    assert (n_data, n_del) == (2, 1)
    # encrypted dest: imported engine manifests are AGS1 streams
    enc = Catalog(spark, str(tmp_path / "wh_enc"), metadata_key=DEST_KEY)
    t2, _n, _d = snapshot_iceberg_table(enc, root, "db.safe",
                                        kms_unwrap=unwrap)
    mfs = _g.glob(os.path.join(t2.location, "metadata", "manifest*",
                               "*.parquet"))
    assert mfs and all(open(p, "rb").read(4) == b"AGS1" for p in mfs)
    got = sorted(r.id for r in t2.to_df().select("id").collect())
    assert got == [i for i in range(100) if i % 10 != 0]
