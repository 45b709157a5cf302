"""Importing standard-encrypted apache/iceberg tables: manifests and the
manifest list are whole-file AES GCM Streams (core/.../encryption/
AesGcmOutputStream.java); each manifest's key+AAD ride as
StandardKeyMetadata (single-object Avro, StandardKeyMetadata.java:36-41)
in the manifest-list entry's key_metadata (fid 519); the manifest-list
key chains through the metadata JSON's `encryption-keys`
(EncryptedKeyParser.java) — manifest-list key encrypted by a KEK under
AAD = the KEK's KEY_TIMESTAMP (EncryptionUtil.java:192-203), the KEK
wrapped by the vendor KMS (KeyManagementClient.java — pluggable here as
`kms_unwrap`)."""

import os
import secrets

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_spark.encryption import (aes_gcm_decrypt, aes_gcm_encrypt,
                                      decode_standard_key_metadata,
                                      encode_standard_key_metadata)
from iceberg_spark.sources.iceberg import snapshot_iceberg_table
from iceberg_spark.sources.iceberg_fixture import write_reference_table

SCHEMA_JSON = {
    "type": "struct", "schema-id": 0, "fields": [
        {"id": 1, "name": "id", "required": False, "type": "long"},
        {"id": 2, "name": "grp", "required": False, "type": "long"},
    ]}

MASTER = bytes(range(16))


def _unwrap(wrapped, key_id):
    return aes_gcm_decrypt(MASTER, wrapped, b"")


def _write_parquet(path, ids, grp):
    pq.write_table(pa.table({"id": pa.array(ids, pa.int64()),
                             "grp": pa.array([grp] * len(ids), pa.int64())}),
                   path)
    return {"path": path, "record_count": len(ids),
            "file_size": os.path.getsize(path)}


def _encrypted_source(root, with_delete=True):
    os.makedirs(os.path.join(root, "data"))
    fa = _write_parquet(os.path.join(root, "data", "a.parquet"),
                        list(range(10)), 0)
    files = [dict(fa, seq=1)]
    if with_delete:
        dl = os.path.join(root, "data", "d.parquet")
        pq.write_table(pa.table({
            "file_path": pa.array([fa["path"]] * 2, pa.string()),
            "pos": pa.array([0, 1], pa.int64())}), dl)
        files.append({"path": dl, "content": 1, "record_count": 2,
                      "file_size": os.path.getsize(dl), "seq": 2})
    return write_reference_table(root, SCHEMA_JSON, files,
                                 format_version=3, encryption_key=MASTER)


def test_key_metadata_codec_roundtrip():
    key, aad = secrets.token_bytes(16), secrets.token_bytes(12)
    buf = encode_standard_key_metadata(key, aad, 12345)
    assert buf[0] == 1  # schema version byte
    assert decode_standard_key_metadata(buf) == (key, aad, 12345)
    buf2 = encode_standard_key_metadata(key)
    assert decode_standard_key_metadata(buf2) == (key, None, None)


def test_single_shot_gcm_layout():
    key = secrets.token_bytes(16)
    ct = aes_gcm_encrypt(key, b"hello", b"aad")
    # reference layout: nonce(12) || ciphertext || tag(16)
    assert len(ct) == 12 + 5 + 16
    assert aes_gcm_decrypt(key, ct, b"aad") == b"hello"
    with pytest.raises(ValueError, match="wrong key or tampered"):
        aes_gcm_decrypt(key, ct, b"other-aad")


def test_encrypted_import_scans_and_keyless_fails(catalog, tmp_path):
    root = str(tmp_path / "enc_tbl")
    _encrypted_source(root)
    # every manifest and the manifest list carry the AGS1 magic on disk
    mdir = os.path.join(root, "metadata")
    payloads = [f for f in os.listdir(mdir) if f.endswith(".avro")]
    assert payloads and all(
        open(os.path.join(mdir, f), "rb").read(4) == b"AGS1"
        for f in payloads)

    with pytest.raises(NotImplementedError, match="kms_unwrap"):
        snapshot_iceberg_table(catalog, root, "db.enc_keyless")

    t, n_data, n_del = snapshot_iceberg_table(
        catalog, root, "db.enc_imp", kms_unwrap=_unwrap)
    assert (n_data, n_del) == (1, 1)
    assert sorted(r["id"] for r in t.to_df().collect()) == list(range(2, 10))


def test_encrypted_import_wrong_kms_key_fails(catalog, tmp_path):
    root = str(tmp_path / "enc_wrong")
    _encrypted_source(root, with_delete=False)
    bad = lambda wrapped, key_id: aes_gcm_decrypt(  # noqa: E731
        secrets.token_bytes(16), wrapped, b"")
    with pytest.raises(ValueError, match="wrong key or tampered"):
        snapshot_iceberg_table(catalog, root, "db.enc_bad",
                               kms_unwrap=bad)
