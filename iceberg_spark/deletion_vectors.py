"""v3 deletion vectors: Puffin `deletion-vector-v1` blobs
(format/spec.md:1372, format/puffin-spec.md "deletion-vector-v1").

A deletion vector encodes the deleted row positions of ONE data file as a
64-bit roaring bitmap, stored as a framed blob inside a Puffin file:

    blob := len(vector+magic) as 4B big-endian
          | magic D1 D3 39 64
          | vector (portable 64-bit roaring serialization)
          | CRC-32 of (magic | vector) as 4B big-endian

The 64-bit portable roaring layout (RoaringFormatSpec "extension for
64-bit implementations") is a little-endian count of 32-bit bitmaps, then
for each: the 4-byte little-endian high key and a standard 32-bit roaring
bitmap. The 32-bit writer here always emits the no-run-container format
(cookie 12346) with array containers (cardinality <= 4096) or bitset
containers — a valid serialization any roaring reader accepts; the reader
additionally understands the run-container format (cookie 12347) so
reference-written vectors (core/.../deletes/RoaringPositionBitmap.java:51,
BaseDVFileWriter.java) deserialize too.

Numpy-vectorized throughout — positions never round-trip through Python
lists on the hot path.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

DV_MAGIC = bytes((0xD1, 0xD3, 0x39, 0x64))
DV_V1 = "deletion-vector-v1"

# roaring cookies (RoaringFormatSpec)
_COOKIE_NO_RUN = 12346
_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096

# the `fields` entry of a DV blob: the _pos metadata column's reserved
# field id (MetadataColumns.ROW_POSITION, format/spec.md reserved ids)
POS_FIELD_ID = 2147483545


# ---------------------------------------------------------------------------
# 32-bit roaring
# ---------------------------------------------------------------------------


def _serialize_roaring32(values: np.ndarray) -> bytes:
    """values: sorted unique uint32. Emits cookie-12346 (no run
    containers) with the offsets header, per the spec's general layout."""
    values = np.asarray(values, dtype=np.uint32)
    highs = (values >> 16).astype(np.uint16)
    lows = (values & 0xFFFF).astype(np.uint16)
    keys, starts = np.unique(highs, return_index=True)
    bounds = np.append(starts, len(values))
    n = len(keys)

    containers = []
    for i in range(n):
        low = lows[bounds[i]:bounds[i + 1]]
        if len(low) <= _ARRAY_MAX:
            containers.append(low.astype("<u2").tobytes())
        else:
            bits = np.zeros(1024, dtype=np.uint64)
            np.bitwise_or.at(bits, low >> 6,
                             np.uint64(1) << (low & np.uint64(63)).astype(np.uint64))
            containers.append(bits.astype("<u8").tobytes())

    out = bytearray()
    out += struct.pack("<ii", _COOKIE_NO_RUN, n)
    cards = (bounds[1:] - bounds[:-1]).astype(np.int64)
    for i in range(n):
        out += struct.pack("<HH", int(keys[i]), int(cards[i]) - 1)
    # offsets header: container start offsets from the stream start
    off = len(out) + 4 * n
    for c in containers:
        out += struct.pack("<I", off)
        off += len(c)
    for c in containers:
        out += c
    return bytes(out)


def _deserialize_roaring32(buf: bytes, pos: int):
    """Parse one 32-bit roaring bitmap at buf[pos:]; returns
    (uint32 values, next_pos). Handles both cookies + all 3 container
    kinds."""
    (cookie16,) = struct.unpack_from("<H", buf, pos)
    has_runs = cookie16 == _COOKIE_RUN
    if has_runs:
        (nm1,) = struct.unpack_from("<H", buf, pos + 2)
        n = nm1 + 1
        pos += 4
        bitmap_bytes = (n + 7) // 8
        run_flags = np.unpackbits(
            np.frombuffer(buf, dtype=np.uint8, count=bitmap_bytes, offset=pos),
            bitorder="little")[:n]
        pos += bitmap_bytes
    else:
        cookie, n = struct.unpack_from("<ii", buf, pos)
        if cookie != _COOKIE_NO_RUN:
            raise ValueError(f"unknown roaring cookie {cookie}")
        run_flags = np.zeros(n, dtype=np.uint8)
        pos += 8
    hdr = np.frombuffer(buf, dtype="<u2", count=2 * n, offset=pos)
    keys = hdr[0::2].astype(np.uint32)
    cards = hdr[1::2].astype(np.int64) + 1
    pos += 4 * n
    if not has_runs or n >= _NO_OFFSET_THRESHOLD:
        pos += 4 * n  # offsets header (sequential parse doesn't need it)
    parts = []
    for i in range(n):
        base = keys[i] << 16
        if run_flags[i]:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            runs = np.frombuffer(buf, dtype="<u2", count=2 * n_runs,
                                 offset=pos).astype(np.int64)
            pos += 4 * n_runs
            vals = np.concatenate([
                np.arange(runs[2 * j], runs[2 * j] + runs[2 * j + 1] + 1,
                          dtype=np.uint32)
                for j in range(n_runs)]) if n_runs else np.empty(0, np.uint32)
            parts.append(base + vals)
        elif cards[i] > _ARRAY_MAX:
            words = np.frombuffer(buf, dtype="<u8", count=1024, offset=pos)
            pos += 8192
            bits = np.unpackbits(words.view(np.uint8), bitorder="little")
            parts.append(base + np.nonzero(bits)[0].astype(np.uint32))
        else:
            vals = np.frombuffer(buf, dtype="<u2", count=int(cards[i]),
                                 offset=pos).astype(np.uint32)
            pos += 2 * int(cards[i])
            parts.append(base + vals)
    values = (np.concatenate(parts) if parts
              else np.empty(0, dtype=np.uint32))
    return values, pos


# ---------------------------------------------------------------------------
# 64-bit portable wrapper + blob framing
# ---------------------------------------------------------------------------


def serialize_positions(positions: np.ndarray) -> bytes:
    """Portable 64-bit roaring over sorted unique non-negative int64
    positions: high-32 key -> 32-bit bitmap of low-32 sub-positions."""
    positions = np.asarray(positions, dtype=np.int64)
    if positions.size and int(positions.min()) < 0:
        raise ValueError("deletion vector positions must be non-negative")
    positions = np.unique(positions).astype(np.uint64)
    hi = (positions >> np.uint64(32)).astype(np.uint32)
    lo = (positions & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    keys, starts = np.unique(hi, return_index=True)
    bounds = np.append(starts, len(positions))
    out = bytearray(struct.pack("<q", len(keys)))
    for i in range(len(keys)):
        out += struct.pack("<I", int(keys[i]))
        out += _serialize_roaring32(lo[bounds[i]:bounds[i + 1]])
    return bytes(out)


def deserialize_positions(vec: bytes) -> np.ndarray:
    (n_maps,) = struct.unpack_from("<q", vec, 0)
    pos = 8
    parts = []
    for _ in range(n_maps):
        (key,) = struct.unpack_from("<I", vec, pos)
        pos += 4
        vals, pos = _deserialize_roaring32(vec, pos)
        parts.append((np.uint64(key) << np.uint64(32))
                     | vals.astype(np.uint64))
    if pos != len(vec):
        raise ValueError(
            f"trailing bytes after roaring bitmaps: {len(vec) - pos}")
    return (np.concatenate(parts).astype(np.int64) if parts
            else np.empty(0, dtype=np.int64))


def dv_blob(positions: np.ndarray) -> bytes:
    """Frame a position set as the deletion-vector-v1 blob payload:
    big-endian length + magic + vector + big-endian CRC-32(magic|vector)."""
    vec = serialize_positions(positions)
    crc = zlib.crc32(DV_MAGIC + vec) & 0xFFFFFFFF
    return (struct.pack(">i", len(vec) + 4) + DV_MAGIC + vec
            + struct.pack(">I", crc))


def parse_dv_blob(blob: bytes) -> np.ndarray:
    """Validate framing + CRC and return the deleted positions (int64)."""
    if len(blob) < 12:
        raise ValueError("deletion vector blob too short")
    (length,) = struct.unpack_from(">i", blob, 0)
    if length + 8 != len(blob):
        raise ValueError(
            f"deletion vector length mismatch: header {length}, "
            f"blob holds {len(blob) - 8}")
    if blob[4:8] != DV_MAGIC:
        raise ValueError("bad deletion vector magic")
    vec = blob[8:-4]
    (crc,) = struct.unpack_from(">I", blob, len(blob) - 4)
    actual = zlib.crc32(blob[4:-4]) & 0xFFFFFFFF
    if crc != actual:
        raise ValueError(
            f"deletion vector CRC mismatch: stored {crc:#x}, "
            f"computed {actual:#x}")
    return deserialize_positions(vec)


# ---------------------------------------------------------------------------
# puffin-level helpers
# ---------------------------------------------------------------------------


def write_dv_puffin(path: str, dvs: dict, encrypt: tuple = None) -> list:
    """Write one Puffin file holding a deletion-vector-v1 blob per
    referenced data file. `dvs`: {referenced_data_file: positions array}.
    Returns [{referenced_data_file, content_offset, content_size_in_bytes,
    cardinality, file_size_in_bytes}] with offset/length exactly matching
    the Puffin footer (spec requirement, format/spec.md:753).

    snapshot-id / sequence-number are -1 in blob metadata per the Puffin
    spec — they are inherited from the manifest entry."""
    from .puffin import write_puffin

    refs = sorted(dvs)
    blobs = []
    cards = []
    for ref in refs:
        positions = np.unique(np.asarray(dvs[ref], dtype=np.int64))
        cards.append(len(positions))
        blobs.append({
            "type": DV_V1,
            "fields": [POS_FIELD_ID],
            "snapshot-id": -1,
            "sequence-number": -1,
            "data": dv_blob(positions),
            "properties": {"referenced-data-file": ref,
                           "cardinality": str(len(positions))},
        })
    facts = write_puffin(path, blobs,
                         properties={"created-by": "iceberg_spark"},
                         encrypt=encrypt)
    out = []
    for ref, card, bm in zip(refs, cards, facts["blob-metadata"]):
        out.append({
            "referenced_data_file": ref,
            "content_offset": bm["offset"],
            "content_size_in_bytes": bm["length"],
            "cardinality": card,
            "file_size_in_bytes": facts["file-size-in-bytes"],
        })
    return out


def read_dv_positions(path: str, offset: int, length: int,
                      decrypt: tuple = None) -> np.ndarray:
    """Direct blob access by manifest-tracked offset/length — no footer
    read needed (the spec requires offset/length to match the footer).
    `decrypt=(key, aad)` for AGS1-encrypted Puffin containers: the whole
    stream decrypts (DV containers are small by construction), then the
    PLAINTEXT offset slices — encryption costs the ranged-read shortcut,
    never correctness."""
    if decrypt is not None:
        from . import io as _fio
        from .encryption import decrypt_stream

        raw = _fio.read_bytes(path) if not path.startswith("/") \
            else open(path, "rb").read()
        blob = decrypt_stream(raw, decrypt[0], decrypt[1])[
            offset:offset + length]
    elif path.startswith("/"):  # fast path: direct ranged read
        with open(path, "rb") as f:
            f.seek(offset)
            blob = f.read(length)
    else:
        from . import io as _fio

        blob = _fio.read_bytes(path)[offset:offset + length]
    if len(blob) != length:
        raise ValueError(
            f"short read of deletion vector at {path}:{offset}+{length}")
    return parse_dv_blob(blob)
