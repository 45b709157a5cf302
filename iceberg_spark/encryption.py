"""Table metadata encryption — AES GCM Stream + key management.

Implements the reference's AES GCM Stream file format extension
(format/gcm-stream-spec.md: magic "AGS1", 4-byte little-endian
plaintext block length, cipher blocks of nonce(12) || ciphertext ||
tag(16), block AAD = file AAD prefix || 4-byte LE block ordinal) and
the key-wrap shape of its encryption module
(api/.../encryption/EncryptionManager.java,
core/.../encryption/StandardEncryptionManager.java: per-file data keys
wrapped by a table master key).

Engine scope: a catalog constructed with `metadata_key` encrypts the
WHOLE METADATA TREE — table metadata versions (v*.metadata.json)
transparently through EncryptedFileIO, and every manifest + manifest
list as AES GCM Streams under per-file keys chained through
KEK-wrapped StandardKeyMetadata `encryption-keys` entries
(ManifestCrypto below — the write-side twin of the reference's
StandardEncryptionManager). DATA files delegate to the format layer
(parquet modular encryption, parquet_crypto.py, enabled separately by
the `encryption.key-id` table property — as the reference does); set
both for a zero-plaintext table. Opening an encrypted table without
the key fails loudly, never garbles.
"""

from __future__ import annotations

import os
import struct
import secrets

from .io import FileIO

MAGIC = b"AGS1"  # gcm-stream-spec.md "File structure"
NONCE_LEN = 12
TAG_LEN = 16
DEFAULT_BLOCK = 1 << 20  # 1 MiB plaintext blocks


def _aesgcm(key: bytes):
    from cryptography.hazmat.primitives.ciphers.aead import AESGCM

    if len(key) not in (16, 24, 32):
        raise ValueError(
            f"AES key must be 128/192/256 bits, got {len(key) * 8}")
    return AESGCM(key)


def encrypt_stream(plaintext: bytes, key: bytes, aad_prefix: bytes = b"",
                   block_size: int = DEFAULT_BLOCK) -> bytes:
    """Plaintext -> AES GCM Stream bytes (spec file structure). Each
    block gets a fresh random 96-bit nonce (NIST SP 800-38D 8.2.2 RBG
    construction) and an AAD of prefix || block-ordinal so blocks can't
    be swapped within or across files."""
    gcm = _aesgcm(key)
    out = [MAGIC, struct.pack("<i", block_size)]
    n_blocks = max(1, (len(plaintext) + block_size - 1) // block_size)
    for i in range(n_blocks):
        block = plaintext[i * block_size:(i + 1) * block_size]
        nonce = secrets.token_bytes(NONCE_LEN)
        aad = aad_prefix + struct.pack("<i", i)
        ct = gcm.encrypt(nonce, block, aad)  # ciphertext || tag
        out.append(nonce)
        out.append(ct)
    return b"".join(out)


def is_encrypted(data: bytes) -> bool:
    return data[:4] == MAGIC


def decrypt_stream(data: bytes, key: bytes,
                   aad_prefix: bytes = b"") -> bytes:
    """AES GCM Stream bytes -> plaintext; every block's tag and AAD
    verify (tamper/swap -> ValueError). An empty-plaintext file still
    carries one authenticated (empty) block."""
    if not is_encrypted(data):
        raise ValueError("not an AES GCM Stream file (AGS1 magic missing)")
    (block_size,) = struct.unpack("<i", data[4:8])
    if block_size <= 0:
        raise ValueError(f"corrupt AES GCM Stream: block length {block_size}")
    gcm = _aesgcm(key)
    pos, i, out = 8, 0, []
    cipher_block = NONCE_LEN + block_size + TAG_LEN
    while pos < len(data):
        chunk = data[pos:pos + cipher_block]
        if len(chunk) < NONCE_LEN + TAG_LEN:
            raise ValueError("corrupt AES GCM Stream: truncated block")
        nonce, ct = chunk[:NONCE_LEN], chunk[NONCE_LEN:]
        aad = aad_prefix + struct.pack("<i", i)
        try:
            out.append(gcm.decrypt(nonce, ct, aad))
        except Exception:
            raise ValueError(
                f"AES GCM Stream block {i} failed authentication "
                "(wrong key, tampered bytes, or swapped block)") from None
        pos += len(chunk)
        i += 1
    return b"".join(out)


# ---------------------------------------------------------------------------
# key management (StandardEncryptionManager shape)
# ---------------------------------------------------------------------------

class EncryptionManager:
    """Master-key manager: generates per-file data keys and wraps them
    with the table master key (StandardEncryptionManager wraps file keys
    into manifest key_metadata the same way — here the wrap format is
    one GCM stream whose AAD is the file's AAD prefix)."""

    def __init__(self, master_key: bytes):
        self.master_key = normalize_key(master_key)

    def new_data_key(self, bits: int = 128) -> bytes:
        return secrets.token_bytes(bits // 8)

    def wrap_key(self, data_key: bytes, aad_prefix: bytes = b"") -> bytes:
        return encrypt_stream(data_key, self.master_key, aad_prefix)

    def unwrap_key(self, wrapped: bytes, aad_prefix: bytes = b"") -> bytes:
        return decrypt_stream(wrapped, self.master_key, aad_prefix)


# ---------------------------------------------------------------------------
# reference "standard" table-encryption interop
# (core/.../encryption/Ciphers.java, StandardKeyMetadata.java,
#  EncryptionUtil.java, EncryptedKeyParser.java)
# ---------------------------------------------------------------------------

# Avro schema of StandardKeyMetadata V1 (StandardKeyMetadata.java:36-41);
# single-object encoding = one version byte (1) + the Avro binary body
# (KeyMetadataEncoder.java:77-81)
_SKM_SCHEMA = {
    "type": "record", "name": "key_metadata", "fields": [
        {"name": "encryption_key", "type": "bytes"},
        {"name": "aad_prefix", "type": ["null", "bytes"], "default": None},
        {"name": "file_length", "type": ["null", "long"], "default": None},
    ]}


def aes_gcm_encrypt(key: bytes, plaintext: bytes, aad: bytes = b"") -> bytes:
    """Single-shot AES GCM, reference layout: nonce(12) || ciphertext ||
    tag(16) (Ciphers.java AesGcmEncryptor.encrypt)."""
    nonce = secrets.token_bytes(NONCE_LEN)
    return nonce + _aesgcm(normalize_key(key)).encrypt(nonce, plaintext,
                                                       aad or None)


def aes_gcm_decrypt(key: bytes, data: bytes, aad: bytes = b"") -> bytes:
    if len(data) < NONCE_LEN + TAG_LEN:
        raise ValueError("AES GCM ciphertext shorter than nonce + tag")
    try:
        return _aesgcm(normalize_key(key)).decrypt(
            data[:NONCE_LEN], data[NONCE_LEN:], aad or None)
    except Exception:
        raise ValueError(
            "AES GCM decryption failed (wrong key or tampered "
            "bytes)") from None


def encode_standard_key_metadata(key: bytes, aad_prefix: bytes = None,
                                 file_length: int = None) -> bytes:
    import io as _pyio

    from .avro_file import _encode

    out = _pyio.BytesIO()
    out.write(b"\x01")  # schema version V1
    _encode(_SKM_SCHEMA, {"encryption_key": key, "aad_prefix": aad_prefix,
                          "file_length": file_length}, out)
    return out.getvalue()


def decode_standard_key_metadata(buf: bytes):
    """-> (encryption_key, aad_prefix | None, file_length | None)."""
    from .avro_file import _compile

    if not buf or buf[0] != 1:
        raise ValueError(
            f"unsupported key metadata schema version: "
            f"{buf[0] if buf else 'empty'}")
    row, _pos = _compile(_SKM_SCHEMA)(bytes(buf[1:]), 0)
    return (bytes(row["encryption_key"]),
            bytes(row["aad_prefix"]) if row["aad_prefix"] is not None
            else None,
            row["file_length"])


class StandardTableKeys:
    """Resolve the reference's `encryption-keys` metadata list
    (EncryptedKeyParser.java shape): key-encryption-keys (KEKs) are
    wrapped by the table's KMS key and unwrapped via `kms_unwrap(wrapped,
    key_id)`; manifest-list keys are StandardKeyMetadata encrypted with a
    KEK under AAD = the KEK's KEY_TIMESTAMP property
    (EncryptionUtil.encryptManifestListKeyMetadata)."""

    KEY_TIMESTAMP = "KEY_TIMESTAMP"  # StandardEncryptionManager.java:43

    def __init__(self, encryption_keys_json: list, kms_unwrap):
        import base64

        self._kms_unwrap = kms_unwrap
        self._keys = {}
        for kj in encryption_keys_json or []:
            self._keys[kj["key-id"]] = {
                "wrapped": base64.b64decode(kj["encrypted-key-metadata"]),
                "encrypted_by": kj.get("encrypted-by-id"),
                "properties": dict(kj.get("properties") or {}),
            }
        self._unwrapped_keks = {}

    def _kek(self, kek_id: str):
        if kek_id not in self._unwrapped_keks:
            k = self._keys[kek_id]
            self._unwrapped_keks[kek_id] = self._kms_unwrap(
                k["wrapped"], k["encrypted_by"])
        return self._unwrapped_keks[kek_id]

    def manifest_list_key(self, key_id: str):
        """snapshot `key-id` -> (encryption_key, aad_prefix) of the
        manifest list file (EncryptionUtil.decryptManifestListKeyMetadata
        chain)."""
        mlk = self._keys.get(key_id)
        if mlk is None:
            raise ValueError(f"unknown encryption key id: {key_id}")
        kek_id = mlk["encrypted_by"]
        ts = self._keys[kek_id]["properties"].get(self.KEY_TIMESTAMP)
        if ts is None:
            raise ValueError(
                f"key encryption key {kek_id} has no "
                f"{self.KEY_TIMESTAMP} property")
        skm = aes_gcm_decrypt(self._kek(kek_id), mlk["wrapped"],
                              ts.encode("utf-8"))
        key, aad, _len = decode_standard_key_metadata(skm)
        return key, aad or b""


# ---------------------------------------------------------------------------
# engine-native manifest / manifest-list encryption
# (write-side twin of StandardTableKeys: StandardEncryptionManager.java,
#  EncryptionUtil.encryptManifestListKeyMetadata, format/spec.md:1294
#  `encryption-keys`)
# ---------------------------------------------------------------------------

# `encrypted-by-id` of KEK entries wrapped by the engine's catalog-level
# metadata key (the engine's in-process "KMS"); external exports may name
# a real KMS key instead
ENGINE_KMS_KEY_ID = "metadata-key"


class ManifestCrypto:
    """Per-commit manifest/list encryption context for a table whose
    catalog carries `metadata_key` (the engine KMS master key).

    Layout written (exactly what the import side decodes,
    sources/iceberg.py `_table_keys` / `StandardTableKeys`):
      - each MANIFEST encrypts as an AES GCM Stream under a fresh random
        key+AAD; the plain StandardKeyMetadata blob rides the (encrypted)
        manifest list's `key_metadata` column;
      - each MANIFEST LIST encrypts under its own fresh key+AAD whose
        StandardKeyMetadata is AES-GCM-encrypted with a KEK (AAD = the
        KEK's KEY_TIMESTAMP property) and appended to the table
        metadata's `encryption-keys` list with `encrypted-by-id` = the
        KEK id; the snapshot records the entry's id as `key-id`;
      - the KEK itself is wrapped by the KMS (engine: AES-GCM under
        metadata_key, AAD = the KEK id) and listed with
        `encrypted-by-id` = ENGINE_KMS_KEY_ID.
    """

    def __init__(self, metadata_key, encryption_keys=(),
                 kms_wrap=None, kms_key_id: str = ENGINE_KMS_KEY_ID):
        self.metadata_key = (normalize_key(metadata_key)
                             if metadata_key is not None else None)
        self._kms_wrap = kms_wrap  # (key_bytes, key_id) -> wrapped bytes
        self.kms_key_id = kms_key_id
        self._existing = list(encryption_keys or ())
        self.added_entries: list = []  # new encryption-keys JSON entries

    def kms_wrap(self, key: bytes, key_id: str) -> bytes:
        if self._kms_wrap is not None:
            return self._kms_wrap(key, key_id)
        return aes_gcm_encrypt(self.metadata_key, key,
                               key_id.encode("utf-8"))

    @staticmethod
    def new_file_key() -> tuple:
        """(key, aad_prefix) for one manifest or manifest-list file."""
        return secrets.token_bytes(16), secrets.token_bytes(16)

    def _kek(self) -> tuple:
        """(kek_id, kek_bytes, timestamp) — reuse the newest KEK wrapped
        by this KMS key, else mint one (StandardEncryptionManager keeps a
        current KEK and rotates by age; the engine reuses per table)."""
        if getattr(self, "_kek_cache", None) is not None:
            return self._kek_cache
        for e in reversed(self._existing):
            if e.get("encrypted-by-id") == self.kms_key_id and \
                    (e.get("properties") or {}).get(
                        StandardTableKeys.KEY_TIMESTAMP):
                import base64

                if self.metadata_key is None:
                    break  # export-only context can't unwrap engine KEKs
                kek = aes_gcm_decrypt(
                    self.metadata_key,
                    base64.b64decode(e["encrypted-key-metadata"]),
                    e["encrypted-by-id"].encode("utf-8"))
                self._kek_cache = (e["key-id"], kek,
                                   e["properties"]
                                   [StandardTableKeys.KEY_TIMESTAMP])
                return self._kek_cache
        import base64
        import time as _time
        import uuid as _uuid

        kek_id = f"k-{_uuid.uuid4().hex}"
        kek = secrets.token_bytes(16)
        ts = str(int(_time.time() * 1000))
        # wrap AAD = the KMS key id: StandardTableKeys hands kms_unwrap
        # the KEK entry's `encrypted-by-id`, so both sides must key the
        # AAD off that identifier, not the KEK's own id
        self.added_entries.append({
            "key-id": kek_id,
            "encrypted-key-metadata": base64.b64encode(
                self.kms_wrap(kek, self.kms_key_id)).decode("ascii"),
            "encrypted-by-id": self.kms_key_id,
            "properties": {StandardTableKeys.KEY_TIMESTAMP: ts},
        })
        self._kek_cache = (kek_id, kek, ts)
        return self._kek_cache

    def wrap_manifest_list_key(self, key: bytes, aad: bytes,
                               file_length: int) -> str:
        """StandardKeyMetadata(list key) encrypted under the KEK; returns
        the new `encryption-keys` entry id (the snapshot's key-id)."""
        import base64
        import uuid as _uuid

        kek_id, kek, ts = self._kek()
        skm = encode_standard_key_metadata(key, aad, file_length)
        ml_id = f"m-{_uuid.uuid4().hex}"
        self.added_entries.append({
            "key-id": ml_id,
            "encrypted-key-metadata": base64.b64encode(
                aes_gcm_encrypt(kek, skm, ts.encode("utf-8")))
            .decode("ascii"),
            "encrypted-by-id": kek_id,
        })
        return ml_id


def register_table_keys(metadata, metadata_key) -> int:
    """Resolve every snapshot's manifest-list key through the table's
    `encryption-keys` chain (engine KMS = AES-GCM under metadata_key) and
    register them in the manifest key registry, so read_manifest_list /
    read_manifest decrypt transparently wherever the table is used.
    Returns the number of snapshots registered. No-op for tables without
    encrypted snapshots."""
    snaps = [s for s in getattr(metadata, "snapshots", ())
             if getattr(s, "key_id", None)]
    if not snaps:
        return 0
    if metadata_key is None:
        raise ValueError(
            f"table at {metadata.location} has encrypted manifests "
            "(snapshot key-id) but no metadata_key was provided")

    def kms_unwrap(wrapped, key_id):
        return aes_gcm_decrypt(normalize_key(metadata_key), wrapped,
                               key_id.encode("utf-8"))

    from .manifests import register_file_key

    tk = StandardTableKeys(list(metadata.encryption_keys), kms_unwrap)
    for s in snaps:
        key, aad = tk.manifest_list_key(s.key_id)
        register_file_key(s.manifest_list, key, aad)
    return len(snaps)


def normalize_key(key) -> bytes:
    """Accept raw bytes or a hex string (the `ICEBERG_SPARK_METADATA_KEY`
    env form)."""
    if isinstance(key, str):
        key = bytes.fromhex(key)
    if len(key) not in (16, 24, 32):
        raise ValueError(
            f"AES key must be 16/24/32 bytes, got {len(key)}")
    return key


class EncryptedFileIO(FileIO):
    """FileIO decorator: every write encrypts to AES GCM Stream, every
    read verifies + decrypts. The per-file AAD prefix is the file's
    basename, so a version file can't be swapped for a DIFFERENT version
    encrypted with the same key (gcm-stream-spec.md "AADs are built to
    reflect the identity of a file"). Stacks on any FileIO — local,
    Hadoop/object-store, or Arrow."""

    def __init__(self, delegate: FileIO, key):
        self.delegate = delegate
        self.key = normalize_key(key)

    @staticmethod
    def _aad(path: str) -> bytes:
        return os.path.basename(path).encode("utf-8")

    def read_bytes(self, path: str) -> bytes:
        raw = self.delegate.read_bytes(path)
        if not is_encrypted(raw):
            raise ValueError(
                f"expected AES-GCM-Stream-encrypted file, found plaintext: "
                f"{path}")
        return decrypt_stream(raw, self.key, self._aad(path))

    def write_bytes(self, path: str, data: bytes):
        self.delegate.write_bytes(
            path, encrypt_stream(data, self.key, self._aad(path)))

    def write_atomic(self, path: str, data: bytes):
        self.delegate.write_atomic(
            path, encrypt_stream(data, self.key, self._aad(path)))

    # passthroughs: existence/layout operations carry no plaintext
    def delete_file(self, path: str):
        self.delegate.delete_file(path)

    def exists(self, path: str) -> bool:
        return self.delegate.exists(path)

    def is_dir(self, path: str) -> bool:
        return self.delegate.is_dir(path)

    def size(self, path: str) -> int:
        return self.delegate.size(path)  # ciphertext size (on-disk)

    def mtime(self, path: str):
        return self.delegate.mtime(path)

    def list(self, path: str) -> list:
        return self.delegate.list(path)

    def walk_files(self, path: str):
        return self.delegate.walk_files(path)

    def walk_file_status(self, path: str):
        return self.delegate.walk_file_status(path)

    def mkdirs(self, path: str):
        self.delegate.mkdirs(path)

    def rename(self, src: str, dst: str):
        # NOTE: rename keeps the old basename-bound AAD only if the name
        # is unchanged; metadata versions are never renamed
        self.delegate.rename(src, dst)

    def delete_dir(self, path: str):
        self.delegate.delete_dir(path)
