"""Puffin file format (reference format/puffin-spec.md): binary container
for statistics blobs. Layout:

    Magic Blob_1 ... Blob_n Footer
    Footer = Magic FooterPayload FooterPayloadSize(int32 LE) Flags(4B) Magic

FooterPayload is UTF-8 JSON `FileMetadata` {blobs: [BlobMetadata...],
properties}. Each BlobMetadata carries type, fields (field ids),
snapshot-id, sequence-number, offset, length (+ optional properties like
`ndv` for apache-datasketches-theta-v1). This writer emits uncompressed
footers (flags = 0); blobs may carry `compression-codec` zstd/lz4
(puffin-spec.md:184 — frames must embed the content size, which the
reader parses from the frame header; the reference compresses stats
blobs the same way, PuffinFormat.java:22). A footer flagged compressed
(bit 0) is LZ4 per spec and is decompressed the same way."""

from __future__ import annotations

import json
import struct

MAGIC = b"PFA1"

THETA_V1 = "apache-datasketches-theta-v1"

_ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"
_LZ4_MAGIC = b"\x04\x22\x4d\x18"


def _frame_content_size(buf: bytes, codec: str) -> int:
    """Decompressed size from a zstd/lz4 frame header. Both Puffin codecs
    require "content size present" (puffin-spec.md:189-190); raises when a
    frame omits it — guessing a size mis-decompresses silently (lz4 pads)."""
    if codec == "zstd":
        if buf[:4] != _ZSTD_MAGIC:
            raise ValueError("not a Zstandard frame")
        fhd = buf[4]
        fcs_flag, single_segment = fhd >> 6, (fhd >> 5) & 1
        pos = 5 + (0 if single_segment else 1)  # window descriptor
        pos += (0, 1, 2, 4)[fhd & 3]  # dictionary id
        if fcs_flag == 0:
            if not single_segment:
                raise ValueError(
                    "zstd frame without content size not supported")
            return buf[pos]
        if fcs_flag == 1:
            return struct.unpack_from("<H", buf, pos)[0] + 256
        if fcs_flag == 2:
            return struct.unpack_from("<I", buf, pos)[0]
        return struct.unpack_from("<Q", buf, pos)[0]
    if codec == "lz4":
        if buf[:4] != _LZ4_MAGIC:
            raise ValueError("not an LZ4 frame")
        flg = buf[4]
        if not (flg >> 3) & 1:
            raise ValueError("lz4 frame without content size not supported")
        return struct.unpack_from("<Q", buf, 6)[0]  # after FLG + BD
    raise ValueError(f"unsupported Puffin compression codec: {codec}")


def _decompress(buf: bytes, codec: str) -> bytes:
    import pyarrow as pa

    size = _frame_content_size(buf, codec)
    return bytes(pa.Codec(codec).decompress(buf, size))


def write_puffin(path: str, blobs: list, properties: dict = None,
                 encrypt: tuple = None) -> dict:
    """blobs: [{type, fields, snapshot-id, sequence-number, data: bytes,
    properties?}]. Returns the statistics-file facts the table metadata
    needs: file size, footer size, and the blob metadata list.

    `encrypt=(key, aad_prefix)` wraps the WHOLE file in an AES GCM
    Stream (gcm-stream-spec.md). Returned offsets/lengths and
    file-size-in-bytes describe the PLAINTEXT layout — readers decrypt
    the stream first, then slice by offset (deletion_vectors.
    read_dv_positions `decrypt=`), keeping the spec's footer-offset
    invariant inside the plaintext."""
    import io as _pyio

    from . import io as _fio

    blob_meta = []
    with _pyio.BytesIO() as f:
        f.write(MAGIC)
        for b in blobs:
            data = b.get("data", b"") or b""
            codec = b.get("compression-codec")
            if codec:
                import pyarrow as pa
                data = bytes(pa.Codec(codec).compress(data))
            off = f.tell()
            f.write(data)
            bm = {
                "type": b["type"],
                "fields": list(b.get("fields", [])),
                "snapshot-id": b.get("snapshot-id"),
                "sequence-number": b.get("sequence-number"),
                "offset": off,
                "length": len(data),
            }
            if codec:
                bm["compression-codec"] = codec
            if b.get("properties"):
                bm["properties"] = dict(b["properties"])
            blob_meta.append(bm)
        payload = json.dumps({
            "blobs": blob_meta,
            "properties": dict(properties or {}),
        }).encode("utf-8")
        footer_start = f.tell()
        f.write(MAGIC)
        f.write(payload)
        f.write(struct.pack("<i", len(payload)))
        f.write(b"\x00\x00\x00\x00")  # flags: uncompressed
        f.write(MAGIC)
        size = f.tell()
        out = f.getvalue()
        if encrypt is not None:
            from .encryption import encrypt_stream

            out = encrypt_stream(out, encrypt[0], encrypt[1])
        _fio.write_bytes(path, out)
    return {
        "file-size-in-bytes": size,
        "file-footer-size-in-bytes": size - footer_start,
        "blob-metadata": blob_meta,
    }


def read_puffin(path: str):
    """Returns (file_metadata dict, [blob bytes in metadata order])."""
    from . import io as _fio

    raw = _fio.read_bytes(path)
    if len(raw) < 20 or raw[:4] != MAGIC or raw[-4:] != MAGIC:
        raise ValueError(f"not a Puffin file: {path}")
    flags = raw[-8:-4]
    (payload_size,) = struct.unpack("<i", raw[-12:-8])
    # validate size and the footer's leading magic BEFORE parsing, so a
    # truncated/garbled file raises the corrupt-footer error, not an
    # opaque JSONDecodeError from a nonsense slice
    # minimum file = leading magic (4) + footer magic (4) + payload +
    # size (4) + flags (4) + trailing magic (4) = payload + 20; a check of
    # +16 would let the footer-magic slice alias the file's leading magic
    if payload_size < 0 or payload_size + 20 > len(raw):
        raise ValueError(f"corrupt Puffin footer (payload size): {path}")
    if raw[-12 - payload_size - 4:-12 - payload_size] != MAGIC:
        raise ValueError(f"corrupt Puffin footer: {path}")
    payload = raw[-12 - payload_size:-12]
    if flags[0] & 1:  # spec: a compressed footer payload is LZ4
        payload = _decompress(payload, "lz4")
    meta = json.loads(payload.decode("utf-8"))
    blobs = []
    for bm in meta.get("blobs", []):
        data = raw[bm["offset"]:bm["offset"] + bm["length"]]
        codec = bm.get("compression-codec")
        if codec:
            data = _decompress(data, codec)
        blobs.append(data)
    return meta, blobs
