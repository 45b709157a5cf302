"""AES GCM Stream (format/gcm-stream-spec.md) + table metadata
encryption: spec byte layout, per-block authentication, block-swap
detection via AADs, key wrap, and an encrypted-catalog table
lifecycle with loud failures for keyless access."""

import os
import struct

import pytest
from pyspark.sql import functions as F

from iceberg_spark.encryption import (DEFAULT_BLOCK, MAGIC, EncryptedFileIO,
                                      EncryptionManager, decrypt_stream,
                                      encrypt_stream)
from iceberg_spark.expressions import col
from iceberg_spark.io import LocalFileIO
from iceberg_spark.table import Catalog

KEY = bytes(range(16))


def test_gcm_stream_spec_layout_and_roundtrip():
    pt = os.urandom(10_000)
    data = encrypt_stream(pt, KEY, aad_prefix=b"f1", block_size=4096)
    # spec file structure: AGS1 magic, LE32 plaintext block length,
    # then blocks of nonce(12) || ciphertext || tag(16)
    assert data[:4] == MAGIC == b"AGS1"
    assert struct.unpack("<i", data[4:8])[0] == 4096
    n_blocks = (len(pt) + 4095) // 4096
    overhead = n_blocks * (12 + 16)
    assert len(data) == 8 + len(pt) + overhead
    assert decrypt_stream(data, KEY, b"f1") == pt
    # empty plaintext still yields one authenticated block
    e = encrypt_stream(b"", KEY, b"f2")
    assert decrypt_stream(e, KEY, b"f2") == b""


def test_gcm_stream_tamper_swap_and_wrong_key():
    pt = os.urandom(9000)
    data = bytearray(encrypt_stream(pt, KEY, b"fx", block_size=4096))
    flipped = bytearray(data)
    flipped[100] ^= 0x01  # one ciphertext byte
    with pytest.raises(ValueError, match="authentication"):
        decrypt_stream(bytes(flipped), KEY, b"fx")
    with pytest.raises(ValueError, match="authentication"):
        decrypt_stream(bytes(data), bytes(16), b"fx")  # wrong key
    with pytest.raises(ValueError, match="authentication"):
        decrypt_stream(bytes(data), KEY, b"OTHER")  # wrong file AAD
    # swap cipher blocks 0 and 1: each tag is valid for ITS bytes, but
    # the block-ordinal AAD suffix catches the reordering
    blk = 12 + 4096 + 16
    swapped = bytes(data[:8] + data[8 + blk:8 + 2 * blk]
                    + data[8:8 + blk] + data[8 + 2 * blk:])
    with pytest.raises(ValueError, match="authentication"):
        decrypt_stream(swapped, KEY, b"fx")


def test_key_wrap_roundtrip():
    km = EncryptionManager(KEY)
    dk = km.new_data_key()
    assert len(dk) == 16
    wrapped = km.wrap_key(dk, b"file-7")
    assert wrapped[:4] == MAGIC
    assert km.unwrap_key(wrapped, b"file-7") == dk
    with pytest.raises(ValueError, match="authentication"):
        km.unwrap_key(wrapped, b"file-8")


def test_encrypted_fileio_aad_binds_basename(tmp_path):
    io = EncryptedFileIO(LocalFileIO(), KEY)
    a, b = str(tmp_path / "v1.metadata.json"), str(tmp_path / "v2.metadata.json")
    io.write_bytes(a, b'{"v":1}')
    io.write_bytes(b, b'{"v":2}')
    assert io.read_bytes(a) == b'{"v":1}'
    # replaying v1's ciphertext as v2 fails: AAD carries the basename
    os.replace(a, b)
    with pytest.raises(ValueError, match="authentication"):
        io.read_bytes(b)


def test_encrypted_table_lifecycle(spark, tmp_path):
    """Catalog(metadata_key=...): metadata versions encrypt on disk;
    append/scan/MoR delete/compaction all run; a keyless catalog fails
    LOUDLY (never garbles); wrong key fails authentication."""
    wh = str(tmp_path / "encwh")
    cat = Catalog(spark, wh, metadata_key=KEY)
    df = spark.range(0, 40).select("id", (F.col("id") % 4).alias("grp"))
    t = cat.create_table("db.enc", df.schema, partition_by=["grp"])
    t.append(df)
    t = cat.load_table("db.enc")
    assert t.to_df().count() == 40
    t.delete_where(col("id") < 5, mode="merge-on-read")
    t = cat.load_table("db.enc")
    assert t.to_df().count() == 35
    from iceberg_spark.maintenance import rewrite_data_files

    rewrite_data_files(t, min_input_files=1)
    assert cat.load_table("db.enc").to_df().count() == 35

    # on-disk metadata versions are AES GCM Stream files
    mdir = os.path.join(wh, "db", "enc", "metadata")
    vfiles = [f for f in os.listdir(mdir) if f.endswith(".metadata.json")]
    assert vfiles
    for f in vfiles:
        with open(os.path.join(mdir, f), "rb") as fh:
            assert fh.read(4) == MAGIC

    # keyless access fails loudly with a actionable message
    keyless = Catalog(spark, wh)
    with pytest.raises(ValueError, match="encrypted"):
        keyless.load_table("db.enc")
    # wrong key fails authentication, not garbage JSON
    wrong = Catalog(spark, wh, metadata_key=bytes(16))
    with pytest.raises(ValueError, match="authentication"):
        wrong.load_table("db.enc")
    # hex-string key form (the env-var shape) also works
    hexcat = Catalog(spark, wh, metadata_key=KEY.hex())
    assert hexcat.load_table("db.enc").to_df().count() == 35
