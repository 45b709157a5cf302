"""Write a REFERENCE-layout apache/iceberg table (metadata JSON + Avro
manifest list + Avro manifests) for interop tests and workloads.

The Avro schemas carry the spec's field ids (format/spec.md:683-1046) and
the Java writer's conventions: int-keyed metric maps encode as
array<record{key,value}> with logicalType "map", optional fields are
[null, T] unions, and manifests store schema/partition-spec/content in
the container's key-value metadata (format/spec.md:668-676). Built from
the published spec tables, not from reference code.
"""

from __future__ import annotations

import json
import os
import time
import uuid as _uuid


def _opt(t):
    return ["null", t]


_FIELD_SUMMARY = {
    "type": "record", "name": "r508", "fields": [
        {"name": "contains_null", "type": "boolean", "field-id": 509},
        {"name": "contains_nan", "type": _opt("boolean"), "default": None,
         "field-id": 518},
        {"name": "lower_bound", "type": _opt("bytes"), "default": None,
         "field-id": 510},
        {"name": "upper_bound", "type": _opt("bytes"), "default": None,
         "field-id": 511},
    ]}

MANIFEST_LIST_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
        {"name": "partitions", "type": _opt(
            {"type": "array", "items": _FIELD_SUMMARY, "element-id": 508}),
         "default": None, "field-id": 507},
    ]}


# v4 manifest lists append first_row_id (field-id 520,
# api/.../ManifestFile.java:92) — assigned when the list is written
MANIFEST_LIST_SCHEMA_V4 = {
    **MANIFEST_LIST_SCHEMA,
    "fields": MANIFEST_LIST_SCHEMA["fields"] + [
        {"name": "first_row_id", "type": _opt("long"), "default": None,
         "field-id": 520}],
}


def _pa_type(avro_t):
    """Fixture Avro partition type -> pyarrow type (v4 parquet manifests
    store partition values typed, V4Metadata.java fileType)."""
    import pyarrow as pa

    if isinstance(avro_t, dict):
        lt = avro_t.get("logicalType")
        if lt == "date":
            return pa.date32()
        if lt in ("timestamp-micros", "timestamp"):
            return pa.timestamp("us")
        if lt == "decimal":
            return pa.decimal128(avro_t["precision"], avro_t["scale"])
        return _pa_type(avro_t["type"])
    return {"long": pa.int64(), "int": pa.int32(), "string": pa.string(),
            "double": pa.float64(), "float": pa.float32(),
            "boolean": pa.bool_(), "bytes": pa.binary()}[avro_t]


def _write_parquet_manifest(mp: str, rows: list, meta: dict,
                            partition_avro: list):
    """v4 manifest as PARQUET (ManifestWriter.V4Writer via InternalData;
    format from the file name). Same entry field names as Avro; the
    partition struct is OMITTED entirely for unpartitioned tables
    (V4Metadata.java fileType: 'Parquet cannot represent empty groups');
    int-keyed metric maps are real parquet maps; header metadata rides in
    the footer key-value metadata."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    kv_long = pa.map_(pa.int32(), pa.int64())
    kv_bin = pa.map_(pa.int32(), pa.binary())
    df_fields = [pa.field("content", pa.int32(), nullable=False),
                 pa.field("file_path", pa.string(), nullable=False),
                 pa.field("file_format", pa.string(), nullable=False)]
    if partition_avro:
        part = pa.struct([pa.field(n, _pa_type(t)) for n, t, _ in
                          partition_avro])
        df_fields.append(pa.field("partition", part, nullable=False))
    df_fields += [
        pa.field("record_count", pa.int64(), nullable=False),
        pa.field("file_size_in_bytes", pa.int64(), nullable=False),
        pa.field("column_sizes", kv_long),
        pa.field("value_counts", kv_long),
        pa.field("null_value_counts", kv_long),
        pa.field("nan_value_counts", kv_long),
        pa.field("lower_bounds", kv_bin),
        pa.field("upper_bounds", kv_bin),
        pa.field("key_metadata", pa.binary()),
        pa.field("split_offsets", pa.list_(pa.int64())),
        pa.field("equality_ids", pa.list_(pa.int32())),
        pa.field("sort_order_id", pa.int32()),
        pa.field("first_row_id", pa.int64()),
        pa.field("referenced_data_file", pa.string()),
        pa.field("content_offset", pa.int64()),
        pa.field("content_size_in_bytes", pa.int64()),
    ]
    schema = pa.schema([
        pa.field("status", pa.int32(), nullable=False),
        pa.field("snapshot_id", pa.int64()),
        pa.field("sequence_number", pa.int64()),
        pa.field("file_sequence_number", pa.int64()),
        pa.field("data_file", pa.struct(df_fields), nullable=False),
    ], metadata={k: str(v) for k, v in meta.items()})
    if not partition_avro:
        for r in rows:
            r["data_file"] = {k: v for k, v in r["data_file"].items()
                              if k != "partition"}
    for r in rows:  # avro map rows are [{"key","value"}]; parquet maps
        for mk in ("column_sizes", "value_counts", "null_value_counts",
                   "nan_value_counts", "lower_bounds", "upper_bounds"):
            v = r["data_file"].get(mk)
            if isinstance(v, list):
                r["data_file"][mk] = [(e["key"], e["value"]) for e in v]
    pq.write_table(pa.Table.from_pylist(rows, schema=schema), mp)


def _kv_map(name, kid, vid, vtype="long"):
    return {"type": "array", "logicalType": "map",
            "items": {"type": "record", "name": name, "fields": [
                {"name": "key", "type": "int", "field-id": kid},
                {"name": "value", "type": vtype, "field-id": vid}]}}


def manifest_entry_schema(partition_fields: list) -> dict:
    """partition_fields: [(name, avro_type, field_id)] — avro_type e.g.
    "long", {"type":"int","logicalType":"date"} for day partitions."""
    part = {"type": "record", "name": "r102", "fields": [
        {"name": n, "type": _opt(t), "default": None, "field-id": fid}
        for n, t, fid in partition_fields]}
    data_file = {"type": "record", "name": "r2", "fields": [
        {"name": "content", "type": "int", "field-id": 134},
        {"name": "file_path", "type": "string", "field-id": 100},
        {"name": "file_format", "type": "string", "field-id": 101},
        {"name": "partition", "type": part, "field-id": 102},
        {"name": "record_count", "type": "long", "field-id": 103},
        {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
        {"name": "column_sizes", "type": _opt(_kv_map("k117_v118", 117, 118)),
         "default": None, "field-id": 108},
        {"name": "value_counts", "type": _opt(_kv_map("k119_v120", 119, 120)),
         "default": None, "field-id": 109},
        {"name": "null_value_counts",
         "type": _opt(_kv_map("k121_v122", 121, 122)),
         "default": None, "field-id": 110},
        {"name": "nan_value_counts",
         "type": _opt(_kv_map("k138_v139", 138, 139)),
         "default": None, "field-id": 137},
        {"name": "lower_bounds",
         "type": _opt(_kv_map("k126_v127", 126, 127, "bytes")),
         "default": None, "field-id": 125},
        {"name": "upper_bounds",
         "type": _opt(_kv_map("k129_v130", 129, 130, "bytes")),
         "default": None, "field-id": 128},
        {"name": "key_metadata", "type": _opt("bytes"), "default": None,
         "field-id": 131},
        {"name": "split_offsets", "type": _opt(
            {"type": "array", "items": "long", "element-id": 133}),
         "default": None, "field-id": 132},
        {"name": "equality_ids", "type": _opt(
            {"type": "array", "items": "int", "element-id": 136}),
         "default": None, "field-id": 135},
        {"name": "sort_order_id", "type": _opt("int"), "default": None,
         "field-id": 140},
        {"name": "first_row_id", "type": _opt("long"), "default": None,
         "field-id": 142},
        {"name": "referenced_data_file", "type": _opt("string"),
         "default": None, "field-id": 143},
        {"name": "content_offset", "type": _opt("long"), "default": None,
         "field-id": 144},
        {"name": "content_size_in_bytes", "type": _opt("long"),
         "default": None, "field-id": 145},
    ]}
    return {"type": "record", "name": "manifest_entry", "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": _opt("long"), "default": None,
         "field-id": 1},
        {"name": "sequence_number", "type": _opt("long"), "default": None,
         "field-id": 3},
        {"name": "file_sequence_number", "type": _opt("long"),
         "default": None, "field-id": 4},
        {"name": "data_file", "type": data_file, "field-id": 2},
    ]}


def write_reference_table(root: str, schema_json: dict, files: list,
                          partition_spec_fields: list = None,
                          partition_avro: list = None,
                          format_version: int = 2,
                          properties: dict = None,
                          snapshot_id: int = None,
                          timestamp_ms: int = None,
                          table_uuid: str = None,
                          relative_paths: bool = False,
                          encryption_key: bytes = None) -> str:
    """Build `<root>/metadata/` for an already-present set of content
    files (single snapshot). `files`: dicts with keys
      path, content (0/1/2), format, partition ({name: raw avro value}),
      record_count, file_size, seq, and optionally equality_ids,
      referenced_data_file, content_offset, content_size.
    `partition_spec_fields`: spec JSON fields
      [{"name","transform","source-id","field-id"}].
    `partition_avro`: [(name, avro_type, field_id)] matching the spec.
    Returns the metadata JSON path."""
    sn = {"files": files}
    if snapshot_id is not None:
        sn["snapshot_id"] = snapshot_id
    if timestamp_ms is not None:
        sn["timestamp_ms"] = timestamp_ms
    return write_reference_table_history(
        root, schema_json, [sn],
        partition_spec_fields=partition_spec_fields,
        partition_avro=partition_avro, format_version=format_version,
        properties=properties, table_uuid=table_uuid,
        relative_paths=relative_paths, encryption_key=encryption_key)


def write_reference_table_history(root: str, schema_json: dict,
                                  snapshots: list,
                                  partition_spec_fields: list = None,
                                  partition_avro: list = None,
                                  format_version: int = 2,
                                  properties: dict = None,
                                  all_schemas_json: list = None,
                                  table_uuid: str = None,
                                  partition_specs_json: list = None,
                                  partition_avro_by_spec: dict = None,
                                  default_spec_id: int = 0,
                                  sort_orders_json: list = None,
                                  default_sort_order_id: int = 0,
                                  statistics_json: list = None,
                                  partition_statistics_json:
                                  list = None,
                                  extra_refs: dict = None,
                                  relative_paths: bool = False,
                                  encryption_key: bytes = None,
                                  reuse_manifests_from: str = None) -> str:
    """Multi-snapshot form: `snapshots` is an ordered list of
    {"files": [...], "timestamp_ms"?: int, "operation"?: str,
    "schema_id"?: int, "snapshot_id"?: int}; each snapshot's `files` is
    its FULL live set (reference manifest lists are full state). Parent
    ids chain in order; the last snapshot is current. `all_schemas_json`
    registers additional (historical) schemas; a snapshot's `schema_id`
    stamps its manifests with the schema its files were written under.
    `snapshot_id` / `table_uuid` overrides preserve source identity when
    exporting an engine table (REST clients round-trip
    assert-ref-snapshot-id / assert-table-uuid against them).

    Multi-spec tables: pass `partition_specs_json`
    ([{"spec-id", "fields"}, ...]) + `partition_avro_by_spec`
    ({spec_id: [(name, avro_type, field_id)]}) + `default_spec_id`, and
    tag each file dict with its `spec_id` — manifests are then written
    per (content, spec) with that spec's partition struct and header, the
    reference layout for spec-evolved tables.

    `format_version=4` writes the v4 layout (V4Metadata.java): PARQUET
    manifests, an Avro manifest list with `first_row_id` (fid 520), and
    `next-row-id`/`first-row-id` row-lineage metadata.
    `relative_paths=True` (v4 only, format/spec.md:194-214) stores every
    path under `root` relative and OMITS `location` from the metadata
    JSON (optional in v4 — the importing catalog provides it).

    `encryption_key` (v3, reference standard table encryption): manifests
    and manifest lists are whole-file AES GCM Streams; per-manifest
    StandardKeyMetadata rides in the manifest-list entry's key_metadata
    (fid 519); the manifest-list key chains through `encryption-keys`
    (manifest-list key -> KEK under AAD = the KEK's KEY_TIMESTAMP -> KMS
    wrap by `encryption_key`, here a single-shot AES GCM — the unit-KMS
    shape; real KMS wraps are vendor-specific and pluggable on import).
    Returns the metadata JSON path."""
    import base64 as _b64
    import secrets as _secrets

    from ..avro_file import write_avro

    if relative_paths and format_version < 4:
        raise ValueError("relative paths require format-version 4 "
                         "(format/spec.md:194)")
    enc = None
    if encryption_key is not None:
        if format_version != 3:
            raise ValueError("fixture standard encryption supports "
                             "format-version 3 only")
        from ..encryption import (aes_gcm_encrypt,
                                  encode_standard_key_metadata,
                                  encrypt_stream)

        kek = _secrets.token_bytes(16)
        kek_id = _b64.b64encode(_secrets.token_bytes(16)).decode()
        key_ts = str(int(time.time() * 1000))
        enc = {
            "kek": kek, "kek_id": kek_id, "key_ts": key_ts,
            "gcm": aes_gcm_encrypt, "skm": encode_standard_key_metadata,
            "stream": encrypt_stream,
            "keys_json": [{
                "key-id": kek_id,
                "encrypted-key-metadata": _b64.b64encode(
                    aes_gcm_encrypt(encryption_key, kek, b"")).decode(),
                "encrypted-by-id": "kms:table-master",
                "properties": {"KEY_TIMESTAMP": key_ts},
            }],
        }
    if partition_specs_json is None:
        partition_specs_json = [{"spec-id": 0,
                                 "fields": partition_spec_fields or []}]
        partition_avro_by_spec = {0: partition_avro or []}
        default_spec_id = 0
    spec_fields_by_id = {sj["spec-id"]: sj["fields"]
                         for sj in partition_specs_json}
    mdir = os.path.join(root, "metadata")
    os.makedirs(mdir, exist_ok=True)

    entry_schemas = {sid: manifest_entry_schema(pa)
                     for sid, pa in partition_avro_by_spec.items()}
    schemas_json = all_schemas_json or [schema_json]
    by_sid = {sj.get("schema-id", 0): sj for sj in schemas_json}

    def manifest_meta_for(schema_id, spec_id):
        sj = by_sid.get(schema_id, schema_json)
        return {
            "schema": json.dumps(sj),
            "schema-id": str(schema_id),
            "partition-spec": json.dumps(spec_fields_by_id[spec_id]),
            "partition-spec-id": str(spec_id),
            "format-version": str(format_version),
        }

    rootp = os.path.abspath(root).rstrip("/")

    def rel(p):
        if relative_paths and os.path.abspath(p).startswith(rootp + "/"):
            return os.path.abspath(p)[len(rootp) + 1:]
        return p

    # incremental re-export (REST loadTable serves full history on every
    # load of a changed table): a snapshot's live set is immutable, so
    # its manifest FILE is byte-reusable across exports of the same
    # table. With `reuse_manifests_from` (a previous export root) and no
    # encryption (encrypted exports rewrap with fresh keys), manifests
    # get DETERMINISTIC names and are HARDLINKED from the previous tree
    # instead of re-serialized — export cost drops from O(history) to
    # O(new snapshots) serialization + O(history) link syscalls.
    # Manifest content is dir-independent (it names data files under the
    # TABLE location); manifest lists/metadata embed export-dir paths
    # and are always rewritten (they are O(#manifests) small).
    reuse_dir = (os.path.join(reuse_manifests_from, "metadata")
                 if reuse_manifests_from and enc is None else None)

    def _deterministic_mp(snapshot_id, content_label, spec_id, ext):
        return f"snap{snapshot_id}-{content_label}-s{spec_id}-m0.{ext}"

    def write_manifest(group, content_label, snapshot_id, max_seq,
                       schema_id, spec_id):
        pa = partition_avro_by_spec[spec_id]
        if reuse_dir is not None:
            ext = "parquet" if format_version >= 4 else "avro"
            name = _deterministic_mp(snapshot_id, content_label, spec_id,
                                     ext)
            mp = os.path.join(mdir, name)
            prev = os.path.join(reuse_dir, name)
            if os.path.exists(mp):
                return mp, None
            if os.path.exists(prev):
                try:
                    os.link(prev, mp)
                    return mp, None
                except OSError:
                    pass  # cross-device / unsupported: fall through
        rows = []
        for f in group:
            rows.append({
                "status": 1,
                "snapshot_id": snapshot_id,
                # ADDED entries in the snapshot's own manifest inherit; mix
                # explicit and inherited to exercise both reader paths
                "sequence_number": (None if f["seq"] == max_seq
                                    else f["seq"]),
                "file_sequence_number": f["seq"],
                "data_file": {
                    "content": f.get("content", 0),
                    "file_path": rel(f["path"]),
                    "file_format": f.get("format", "PARQUET").upper(),
                    "partition": {n: f.get("partition", {}).get(n)
                                  for n, _, _ in pa},
                    "record_count": f["record_count"],
                    # NOTE: not .get(k, getsize(...)) — the fallback would
                    # evaluate (and stat the file) even when file_size is
                    # given, breaking metadata-only fixtures
                    "file_size_in_bytes": (
                        f["file_size"] if f.get("file_size") is not None
                        else os.path.getsize(f["path"])),
                    # metric maps pass through when the fixture supplies
                    # them ([{"key": fid, "value": ...}] — bounds values
                    # are spec single-value-serialized bytes)
                    "column_sizes": f.get("column_sizes"),
                    "value_counts": f.get("value_counts"),
                    "null_value_counts": f.get("null_value_counts"),
                    "nan_value_counts": f.get("nan_value_counts"),
                    "lower_bounds": f.get("lower_bounds"),
                    "upper_bounds": f.get("upper_bounds"),
                    "key_metadata": f.get("key_metadata"),
                    "split_offsets": (list(f["split_offsets"])
                                      if f.get("split_offsets") else None),
                    "equality_ids": (list(f["equality_ids"])
                                     if f.get("equality_ids") else None),
                    "sort_order_id": f.get("sort_order_id"),
                    # row lineage (fid 142): engine exports carry each
                    # data file's ASSIGNED first_row_id so _row_id values
                    # survive the round trip; delete files are always null
                    "first_row_id": (f.get("first_row_id")
                                     if format_version >= 3
                                     and f.get("content", 0) == 0
                                     else None),
                    "referenced_data_file": (
                        rel(f["referenced_data_file"])
                        if f.get("referenced_data_file") else None),
                    "content_offset": f.get("content_offset"),
                    "content_size_in_bytes": f.get("content_size"),
                }})
        meta = manifest_meta_for(schema_id, spec_id)
        meta["content"] = content_label
        if reuse_dir is not None:
            ext = "parquet" if format_version >= 4 else "avro"
            mp = os.path.join(mdir, _deterministic_mp(
                snapshot_id, content_label, spec_id, ext))
        elif format_version >= 4:
            mp = os.path.join(mdir, f"{_uuid.uuid4().hex}-m0.parquet")
        else:
            mp = os.path.join(mdir, f"{_uuid.uuid4().hex}-m0.avro")
        if format_version >= 4:
            _write_parquet_manifest(mp, rows, meta, pa)
        else:
            write_avro(mp, entry_schemas[spec_id], rows, meta,
                       codec="deflate")
        if enc is not None:
            mkey, maad = _secrets.token_bytes(16), _secrets.token_bytes(16)
            with open(mp, "rb") as fh:
                ct = enc["stream"](fh.read(), mkey, maad)
            with open(mp, "wb") as fh:
                fh.write(ct)
            return mp, enc["skm"](mkey, maad, len(ct))
        return mp, None

    snap_jsons = []
    next_row_id = 0  # v4 row lineage (spec First Row ID Assignment)
    now0 = int(time.time() * 1000) - len(snapshots) * 60_000
    for i, sn in enumerate(snapshots):
        files = sn["files"]
        snapshot_id = sn.get("snapshot_id", 7730351909407483913 + i)
        max_seq = max((f["seq"] for f in files), default=0)
        manifests = []
        mgroups = []  # file group per manifest, for lineage assignment
        groups = {}
        for f in files:
            key = (0 if f.get("content", 0) == 0 else 1,
                   f.get("spec_id", default_spec_id))
            groups.setdefault(key, []).append(f)
        for (content, spec_id), group in sorted(groups.items()):
            label = "data" if content == 0 else "deletes"
            mp, mkm = write_manifest(group, label, snapshot_id, max_seq,
                                     sn.get("schema_id",
                                            schema_json.get("schema-id",
                                                            0)),
                                     spec_id)
            manifests.append({
                **({"key_metadata": mkm} if enc is not None else {}),
                "manifest_path": rel(mp),
                "manifest_length": os.path.getsize(mp),
                "partition_spec_id": spec_id,
                "content": content,
                "sequence_number": max_seq,
                "min_sequence_number": min(f["seq"] for f in group),
                "added_snapshot_id": snapshot_id,
                "added_files_count": len(group),
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": sum(f["record_count"] for f in group),
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
                "partitions": None,
            })
            mgroups.append(group)
        first_row_id = next_row_id
        if format_version >= 3:
            # row lineage is a v3 feature (format/spec.md:460-546).
            # Data manifests whose files ALL carry explicit first_row_id
            # (engine exports) keep those values — min per manifest, and
            # next-row-id clears every explicit range. Otherwise assign
            # in list order (ManifestListWriter.V4Writer.prepare).
            explicit_hi = next_row_id
            for m, group in zip(manifests, mgroups):
                if m["content"] != 0:
                    m["first_row_id"] = None
                    continue
                vals = [(f.get("first_row_id"), f["record_count"])
                        for f in group]
                if vals and all(v is not None for v, _ in vals):
                    m["first_row_id"] = min(v for v, _ in vals)
                    explicit_hi = max(explicit_hi,
                                      max(v + rc for v, rc in vals))
                else:
                    m["first_row_id"] = next_row_id
                    next_row_id += (m["added_rows_count"]
                                    + m["existing_rows_count"])
            next_row_id = max(next_row_id, explicit_hi)
            first_row_id = sn.get("first_row_id", first_row_id)
        ml_schema = (MANIFEST_LIST_SCHEMA_V4 if format_version >= 3
                     else MANIFEST_LIST_SCHEMA)
        if enc is not None:
            ml_schema = {
                **ml_schema,
                "fields": ml_schema["fields"] + [
                    {"name": "key_metadata", "type": _opt("bytes"),
                     "default": None, "field-id": 519}]}
        ml_path = os.path.join(
            mdir, f"snap-{snapshot_id}-1-{_uuid.uuid4().hex}.avro")
        write_avro(ml_path, ml_schema, manifests,
                   {"format-version": str(format_version)}, codec="deflate")
        ml_key_id = None
        if enc is not None:
            # encrypt the manifest list and chain its key through
            # encryption-keys (EncryptionUtil.encryptManifestListKeyMetadata)
            mlkey, mlaad = (_secrets.token_bytes(16),
                            _secrets.token_bytes(16))
            with open(ml_path, "rb") as fh:
                ct = enc["stream"](fh.read(), mlkey, mlaad)
            with open(ml_path, "wb") as fh:
                fh.write(ct)
            ml_key_id = _b64.b64encode(_secrets.token_bytes(16)).decode()
            enc["keys_json"].append({
                "key-id": ml_key_id,
                "encrypted-key-metadata": _b64.b64encode(enc["gcm"](
                    enc["kek"], enc["skm"](mlkey, mlaad, len(ct)),
                    enc["key_ts"].encode("utf-8"))).decode(),
                "encrypted-by-id": enc["kek_id"],
            })
        sj = {
            "snapshot-id": snapshot_id,
            "timestamp-ms": sn.get("timestamp_ms", now0 + i * 60_000),
            "sequence-number": max_seq,
            "summary": {"operation": sn.get("operation", "append")},
            "manifest-list": rel(ml_path),
            "schema-id": sn.get("schema_id",
                                schema_json.get("schema-id", 0)),
        }
        if format_version >= 3:
            sj["first-row-id"] = first_row_id
        if ml_key_id is not None:
            sj["key-id"] = ml_key_id
        if i > 0:
            sj["parent-snapshot-id"] = snap_jsons[-1]["snapshot-id"]
        snap_jsons.append(sj)

    current = snap_jsons[-1]
    md = {
        "format-version": format_version,
        "table-uuid": table_uuid or str(_uuid.uuid4()),
        "last-sequence-number": max(s["sequence-number"]
                                    for s in snap_jsons),
        "last-updated-ms": current["timestamp-ms"],
        "last-column-id": max(
            [f["id"] for f in schema_json["fields"]], default=0),
        "current-schema-id": schema_json.get("schema-id", 0),
        "schemas": schemas_json,
        "default-spec-id": default_spec_id,
        "partition-specs": partition_specs_json,
        "last-partition-id": max(
            [pf["field-id"] for sj in partition_specs_json
             for pf in sj["fields"]],
            default=999),
        "default-sort-order-id": default_sort_order_id,
        "sort-orders": (sort_orders_json
                        or [{"order-id": 0, "fields": []}]),
        "properties": dict(properties or {}),
        "current-snapshot-id": current["snapshot-id"],
        "snapshots": snap_jsons,
        "statistics": statistics_json or [],
        "partition-statistics": partition_statistics_json or [],
        "refs": {**(extra_refs or {}),
                 "main": {"snapshot-id": current["snapshot-id"],
                          "type": "branch"}},
        "snapshot-log": [{"timestamp-ms": s["timestamp-ms"],
                          "snapshot-id": s["snapshot-id"]}
                         for s in snap_jsons],
        "metadata-log": [],
    }
    if not relative_paths:
        md["location"] = root  # optional in v4; always present pre-v4
    if format_version >= 3:
        md["next-row-id"] = next_row_id
    if enc is not None:
        md["encryption-keys"] = enc["keys_json"]
    mpath = os.path.join(mdir, "v1.metadata.json")
    with open(mpath, "w") as fh:
        json.dump(md, fh)
    with open(os.path.join(mdir, "version-hint.text"), "w") as fh:
        fh.write("1")
    return mpath
