"""Murmur3 x86 32-bit hash — bit-exact with the Iceberg bucket transform spec.

Reference semantics: /root/reference/format/spec.md Appendix B ("Appendix B:
32-bit Hash Requirements", spec.md:1613) and the reference implementation
api/src/main/java/org/apache/iceberg/transforms/Bucket.java:39. The hash is
murmur3_x86_32 with seed 0; per-type byte layouts:

  int/long/date/time/timestamp(tz)  -> little-endian 8-byte long
  decimal                           -> minimal two's-complement big-endian
                                       of the unscaled value
  string                            -> UTF-8 bytes
  uuid                              -> 16 big-endian bytes
  fixed/binary                      -> raw bytes

Implemented in pure Python for driver-side use (literal projection,
partition-value computation) plus a numpy-vectorized variant for 8-byte
(long-layout) inputs used inside pandas UDFs on the write path.
"""

from __future__ import annotations

import struct

import numpy as np

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_MASK = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK


def hash_bytes(data: bytes, seed: int = 0) -> int:
    """murmur3_x86_32 over raw bytes; returns signed 32-bit int."""
    length = len(data)
    nblocks = length // 4
    h1 = seed & _MASK

    for i in range(nblocks):
        k1 = struct.unpack_from("<I", data, i * 4)[0]
        k1 = (k1 * _C1) & _MASK
        k1 = _rotl32(k1, 15)
        k1 = (k1 * _C2) & _MASK
        h1 ^= k1
        h1 = _rotl32(h1, 13)
        h1 = (h1 * 5 + 0xE6546B64) & _MASK

    # tail
    k1 = 0
    tail = data[nblocks * 4 :]
    if len(tail) >= 3:
        k1 ^= tail[2] << 16
    if len(tail) >= 2:
        k1 ^= tail[1] << 8
    if len(tail) >= 1:
        k1 ^= tail[0]
        k1 = (k1 * _C1) & _MASK
        k1 = _rotl32(k1, 15)
        k1 = (k1 * _C2) & _MASK
        h1 ^= k1

    # finalization
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _MASK
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _MASK
    h1 ^= h1 >> 16

    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def hash_long(v: int) -> int:
    """Hash an int/long/date/time/timestamp value (8-byte little-endian)."""
    return hash_bytes(struct.pack("<q", int(v)))


def hash_string(s: str) -> int:
    return hash_bytes(s.encode("utf-8"))


def hash_decimal_unscaled(unscaled: int) -> int:
    """Minimal two's-complement big-endian bytes of the unscaled value."""
    length = max(1, (unscaled.bit_length() + 8) // 8)
    return hash_bytes(unscaled.to_bytes(length, byteorder="big", signed=True))


def hash_bytes_vec(data, offsets) -> np.ndarray:
    """Vectorized murmur3_x86_32 over N variable-length byte strings
    packed into ONE buffer (`data` uint8, `offsets` int64 of length N+1
    — the Arrow string/binary array layout, so the bucket-transform
    pandas UDF hashes straight off the Arrow buffers with zero per-row
    Python). Block i of every still-active row processes in one numpy
    pass; rows shorter than 4(i+1) bytes drop out, so total work is
    O(total bytes), not O(rows × max_len). Bit-exact with hash_bytes
    (spec Appendix B). Returns int32 signed hashes."""
    buf = np.asarray(data, dtype=np.uint8)
    off = np.asarray(offsets, dtype=np.int64)
    starts, ends = off[:-1], off[1:]
    lengths = ends - starts
    n = len(lengths)
    h1 = np.zeros(n, dtype=np.uint32)
    nblocks = lengths // 4
    maxb = int(nblocks.max()) if n else 0
    for i in range(maxb):
        sel = nblocks > i
        idx = starts[sel] + 4 * i
        k1 = (buf[idx].astype(np.uint32)
              | (buf[idx + 1].astype(np.uint32) << np.uint32(8))
              | (buf[idx + 2].astype(np.uint32) << np.uint32(16))
              | (buf[idx + 3].astype(np.uint32) << np.uint32(24)))
        k1 = (k1.astype(np.uint64) * _C1 & _MASK).astype(np.uint32)
        k1 = (k1 << np.uint32(15)) | (k1 >> np.uint32(17))
        k1 = (k1.astype(np.uint64) * _C2 & _MASK).astype(np.uint32)
        h = h1[sel]
        h ^= k1
        h = (h << np.uint32(13)) | (h >> np.uint32(19))
        h = (h.astype(np.uint64) * 5 + 0xE6546B64 & _MASK).astype(np.uint32)
        h1[sel] = h
    tstart = starts + 4 * nblocks
    tlen = lengths - 4 * nblocks
    k1 = np.zeros(n, dtype=np.uint32)
    m3 = tlen >= 3
    if m3.any():
        k1[m3] ^= buf[tstart[m3] + 2].astype(np.uint32) << np.uint32(16)
    m2 = tlen >= 2
    if m2.any():
        k1[m2] ^= buf[tstart[m2] + 1].astype(np.uint32) << np.uint32(8)
    m1 = tlen >= 1
    if m1.any():
        km = k1[m1] ^ buf[tstart[m1]].astype(np.uint32)
        km = (km.astype(np.uint64) * _C1 & _MASK).astype(np.uint32)
        km = (km << np.uint32(15)) | (km >> np.uint32(17))
        km = (km.astype(np.uint64) * _C2 & _MASK).astype(np.uint32)
        h1[m1] ^= km
    h1 ^= lengths.astype(np.uint32)
    h1 ^= h1 >> np.uint32(16)
    h1 = (h1.astype(np.uint64) * 0x85EBCA6B & _MASK).astype(np.uint32)
    h1 ^= h1 >> np.uint32(13)
    h1 = (h1.astype(np.uint64) * 0xC2B2AE35 & _MASK).astype(np.uint32)
    h1 ^= h1 >> np.uint32(16)
    return h1.view(np.int32)


def hash_long_vec(values: np.ndarray) -> np.ndarray:
    """Vectorized murmur3_x86_32 over int64 values (little-endian 8-byte
    layout). Used by the bucket-transform pandas UDF on the write path so
    bucketing stays Arrow-batched instead of per-row Python.
    Returns int32 signed hashes.
    """
    v = values.astype(np.int64)
    b = v.view(np.uint64)
    # two 4-byte little-endian blocks
    k_lo = (b & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    k_hi = (b >> np.uint64(32)).astype(np.uint32)

    def _mix_k(k1: np.ndarray) -> np.ndarray:
        k1 = (k1.astype(np.uint64) * _C1 & _MASK).astype(np.uint32)
        k1 = (k1 << np.uint32(15)) | (k1 >> np.uint32(17))
        k1 = (k1.astype(np.uint64) * _C2 & _MASK).astype(np.uint32)
        return k1

    h1 = np.zeros(len(v), dtype=np.uint32)
    for blk in (k_lo, k_hi):
        h1 ^= _mix_k(blk)
        h1 = (h1 << np.uint32(13)) | (h1 >> np.uint32(19))
        h1 = (h1.astype(np.uint64) * 5 + 0xE6546B64 & _MASK).astype(np.uint32)

    h1 ^= np.uint32(8)  # length
    h1 ^= h1 >> np.uint32(16)
    h1 = (h1.astype(np.uint64) * 0x85EBCA6B & _MASK).astype(np.uint32)
    h1 ^= h1 >> np.uint32(13)
    h1 = (h1.astype(np.uint64) * 0xC2B2AE35 & _MASK).astype(np.uint32)
    h1 ^= h1 >> np.uint32(16)
    return h1.view(np.int32)
