"""Puffin file format (reference format/puffin-spec.md): binary container
for statistics blobs. Layout:

    Magic Blob_1 ... Blob_n Footer
    Footer = Magic FooterPayload FooterPayloadSize(int32 LE) Flags(4B) Magic

FooterPayload is UTF-8 JSON `FileMetadata` {blobs: [BlobMetadata...],
properties}. Each BlobMetadata carries type, fields (field ids),
snapshot-id, sequence-number, offset, length (+ optional properties like
`ndv` for apache-datasketches-theta-v1). This writer emits uncompressed
payloads (flags = 0); the reader rejects the compression flag it does not
implement rather than misreading."""

from __future__ import annotations

import json
import struct

MAGIC = b"PFA1"

THETA_V1 = "apache-datasketches-theta-v1"


def write_puffin(path: str, blobs: list, properties: dict = None) -> dict:
    """blobs: [{type, fields, snapshot-id, sequence-number, data: bytes,
    properties?}]. Returns the statistics-file facts the table metadata
    needs: file size, footer size, and the blob metadata list."""
    blob_meta = []
    with open(path, "wb") as f:
        f.write(MAGIC)
        for b in blobs:
            data = b.get("data", b"") or b""
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
    return {
        "file-size-in-bytes": size,
        "file-footer-size-in-bytes": size - footer_start,
        "blob-metadata": blob_meta,
    }


def read_puffin(path: str):
    """Returns (file_metadata dict, [blob bytes in metadata order])."""
    with open(path, "rb") as f:
        raw = f.read()
    if len(raw) < 20 or raw[:4] != MAGIC or raw[-4:] != MAGIC:
        raise ValueError(f"not a Puffin file: {path}")
    flags = raw[-8:-4]
    if flags[0] & 1:
        raise ValueError("compressed Puffin footer payloads not supported")
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
    meta = json.loads(payload.decode("utf-8"))
    blobs = [raw[bm["offset"]:bm["offset"] + bm["length"]]
             for bm in meta.get("blobs", [])]
    return meta, blobs
