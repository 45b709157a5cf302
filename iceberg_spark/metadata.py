"""Table metadata tree: specs, sort orders, snapshots, refs, metadata JSON.

Reference: core/src/main/java/org/apache/iceberg/TableMetadata.java:54 and
TableMetadataParser.java (JSON codec); Snapshot api/.../Snapshot.java:42-171;
refs format/spec.md:1097-1130; snapshot/metadata logs TableMetadata.java:246-274.
Commit = atomic swap of the metadata pointer (format/spec.md:90-98, :1309),
realized here HadoopTableOperations-style: write vN.metadata.json via
atomic-publish CAS through the table's FileIO (io.py: os.link locally,
rename-no-clobber on Hadoop filesystems) + version-hint.text.
"""

from __future__ import annotations

import json
import os
import time
import uuid as _uuid
from dataclasses import dataclass, field, replace
from typing import Any, Optional

from .schema import Schema
from .transforms import Identity, Transform, parse_transform

FORMAT_VERSION = 2

# operations (api/.../DataOperations.java:36-57)
OP_APPEND = "append"
OP_REPLACE = "replace"
OP_OVERWRITE = "overwrite"
OP_DELETE = "delete"

PARTITION_FIELD_ID_START = 1000


def to_relative(path: Optional[str], location: str) -> Optional[str]:
    """Strip the table-location prefix (v4 relative paths, spec:194).
    file:-family URI and plain-path spellings of the same location are
    treated as equal (Spark records data paths plain; a scheme-prefixed
    warehouse spells the location file://...)."""
    if not path:
        return path
    loc = location.rstrip("/") + "/"
    if path.startswith(loc):
        return path[len(loc):]
    from .io import strip_scheme

    p, lo = strip_scheme(path), strip_scheme(loc.rstrip("/")) + "/"
    if p.startswith(lo):
        return p[len(lo):]
    return path


def resolve_path(path: Optional[str], location: Optional[str]) -> Optional[str]:
    """Join a relative path field onto the table location; absolute paths
    and URIs pass through (readers must accept both forms, spec:205)."""
    if not path or location is None or "://" in path or os.path.isabs(path):
        return path
    return location.rstrip("/") + "/" + path


@dataclass(frozen=True)
class PartitionField:
    """(source field, transform, name, field_id). api/.../PartitionSpec.java:53."""

    source_id: int
    field_id: int
    name: str
    transform: Transform
    source_name: str  # denormalized for convenience

    def to_json(self):
        return {
            "source-id": self.source_id,
            "field-id": self.field_id,
            "name": self.name,
            "transform": self.transform.to_str(),
            "source-name": self.source_name,
        }

    @staticmethod
    def from_json(j):
        return PartitionField(
            j["source-id"], j["field-id"], j["name"], parse_transform(j["transform"]),
            j["source-name"],
        )


@dataclass(frozen=True)
class PartitionSpec:
    spec_id: int = 0
    fields: tuple = ()

    @property
    def is_partitioned(self) -> bool:
        return any(not isinstance(f.transform, type(None)) for f in self.fields) and bool(
            self.fields
        )

    def partition_type(self, schema: Schema):
        """[(name, partition value type)] for this spec."""
        out = []
        for f in self.fields:
            src = schema.field_by_id(f.source_id)
            out.append((f.name, f.transform.result_type(src.type)))
        return out

    def to_json(self):
        return {"spec-id": self.spec_id, "fields": [f.to_json() for f in self.fields]}

    @staticmethod
    def from_json(j):
        return PartitionSpec(j["spec-id"], tuple(PartitionField.from_json(f) for f in j["fields"]))

    @staticmethod
    def builder(schema: Schema, spec_id: int = 0) -> "PartitionSpecBuilder":
        return PartitionSpecBuilder(schema, spec_id)


UNPARTITIONED = PartitionSpec(0, ())


class PartitionSpecBuilder:
    def __init__(self, schema: Schema, spec_id: int = 0):
        self._schema = schema
        self._spec_id = spec_id
        self._fields = []
        self._next_id = PARTITION_FIELD_ID_START

    def _add(self, source_name: str, transform: Transform, name: Optional[str] = None):
        f = self._schema.find_field(source_name)
        transform.result_type(f.type)  # validate
        pname = name or (
            source_name
            if isinstance(transform, Identity)
            else f"{source_name}_{transform.to_str().replace('[', '_').rstrip(']')}"
        )
        self._fields.append(
            PartitionField(f.field_id, self._next_id, pname, transform, source_name)
        )
        self._next_id += 1
        return self

    def identity(self, name):
        return self._add(name, Identity())

    def bucket(self, name, n, pname=None):
        from .transforms import Bucket

        return self._add(name, Bucket(n), pname)

    def truncate(self, name, w, pname=None):
        from .transforms import Truncate

        return self._add(name, Truncate(w), pname)

    def year(self, name, pname=None):
        from .transforms import TimeTransform

        return self._add(name, TimeTransform("year"), pname)

    def month(self, name, pname=None):
        from .transforms import TimeTransform

        return self._add(name, TimeTransform("month"), pname)

    def day(self, name, pname=None):
        from .transforms import TimeTransform

        return self._add(name, TimeTransform("day"), pname)

    def hour(self, name, pname=None):
        from .transforms import TimeTransform

        return self._add(name, TimeTransform("hour"), pname)

    def add(self, source_name, transform: str, pname=None):
        return self._add(source_name, parse_transform(transform), pname)

    def build(self) -> PartitionSpec:
        return PartitionSpec(self._spec_id, tuple(self._fields))


@dataclass(frozen=True)
class SortField:
    source_id: int
    source_name: str
    transform: Transform
    direction: str = "asc"  # asc|desc
    null_order: str = "nulls-last"

    def to_json(self):
        return {
            "source-id": self.source_id,
            "source-name": self.source_name,
            "transform": self.transform.to_str(),
            "direction": self.direction,
            "null-order": self.null_order,
        }

    @staticmethod
    def from_json(j):
        return SortField(
            j["source-id"], j["source-name"], parse_transform(j["transform"]),
            j["direction"], j["null-order"],
        )


@dataclass(frozen=True)
class SortOrder:
    """api/.../SortOrder.java:41; spec format/spec.md:638."""

    order_id: int = 0
    fields: tuple = ()

    @property
    def is_sorted(self):
        return bool(self.fields)

    def to_json(self):
        return {"order-id": self.order_id, "fields": [f.to_json() for f in self.fields]}

    @staticmethod
    def from_json(j):
        return SortOrder(j["order-id"], tuple(SortField.from_json(f) for f in j["fields"]))


UNSORTED = SortOrder(0, ())


@dataclass(frozen=True)
class Snapshot:
    """api/.../Snapshot.java:42-171; manifest list is a Parquet file here."""

    snapshot_id: int
    parent_snapshot_id: Optional[int]
    sequence_number: int
    timestamp_ms: int
    operation: str
    manifest_list: str  # relative path under table location
    summary: dict = field(default_factory=dict)
    schema_id: int = 0
    # standard table encryption (spec v3 snapshot `key-id`): names the
    # `encryption-keys` entry holding this snapshot's manifest-list key
    key_id: Optional[str] = None

    def to_json(self):
        j = {
            "snapshot-id": self.snapshot_id,
            "parent-snapshot-id": self.parent_snapshot_id,
            "sequence-number": self.sequence_number,
            "timestamp-ms": self.timestamp_ms,
            "operation": self.operation,
            "manifest-list": self.manifest_list,
            "summary": self.summary,
            "schema-id": self.schema_id,
        }
        if self.key_id is not None:
            j["key-id"] = self.key_id
        return j

    @staticmethod
    def from_json(j):
        return Snapshot(
            j["snapshot-id"], j.get("parent-snapshot-id"), j["sequence-number"],
            j["timestamp-ms"], j["operation"], j["manifest-list"], j.get("summary", {}),
            j.get("schema-id", 0), j.get("key-id"),
        )


@dataclass(frozen=True)
class SnapshotRef:
    """Branch or tag (format/spec.md:1097)."""

    snapshot_id: int
    type: str = "branch"  # branch|tag
    max_ref_age_ms: Optional[int] = None
    max_snapshot_age_ms: Optional[int] = None
    min_snapshots_to_keep: Optional[int] = None

    def to_json(self):
        j = {"snapshot-id": self.snapshot_id, "type": self.type}
        if self.max_ref_age_ms is not None:
            j["max-ref-age-ms"] = self.max_ref_age_ms
        if self.max_snapshot_age_ms is not None:
            j["max-snapshot-age-ms"] = self.max_snapshot_age_ms
        if self.min_snapshots_to_keep is not None:
            j["min-snapshots-to-keep"] = self.min_snapshots_to_keep
        return j

    @staticmethod
    def from_json(j):
        return SnapshotRef(
            j["snapshot-id"], j.get("type", "branch"), j.get("max-ref-age-ms"),
            j.get("max-snapshot-age-ms"), j.get("min-snapshots-to-keep"),
        )


MAIN_BRANCH = "main"


@dataclass(frozen=True)
class TableMetadata:
    """The root of the metadata tree (core/.../TableMetadata.java:54)."""

    location: str
    table_uuid: str
    last_sequence_number: int = 0
    last_updated_ms: int = 0
    last_column_id: int = 0
    schemas: tuple = ()
    current_schema_id: int = 0
    partition_specs: tuple = ()
    default_spec_id: int = 0
    last_partition_id: int = PARTITION_FIELD_ID_START - 1
    sort_orders: tuple = (UNSORTED,)
    default_sort_order_id: int = 0
    properties: dict = field(default_factory=dict)
    snapshots: tuple = ()
    refs: dict = field(default_factory=dict)  # name -> SnapshotRef
    snapshot_log: tuple = ()  # (timestamp_ms, snapshot_id)
    metadata_log: tuple = ()  # (timestamp_ms, metadata_file)
    statistics_files: tuple = ()  # dicts: snapshot-id, path, blobs
    partition_statistics_files: tuple = ()
    next_row_id: int = 0  # row lineage (v3): next first_row_id to assign
    # standard table encryption (format/spec.md:1294, EncryptedKeyParser
    # shape): KEKs wrapped by the KMS + manifest-list keys wrapped by KEKs
    encryption_keys: tuple = ()  # dicts: key-id, encrypted-key-metadata, ...

    # -- accessors ---------------------------------------------------------
    @property
    def relative_paths(self) -> bool:
        """v4 relative path fields (format/spec.md:194): when set, manifest
        and manifest-list path columns are written relative to the table
        location, making the table relocatable by a plain directory copy."""
        v = self.properties.get("write.metadata.use-relative-paths", "false")
        return str(v).lower() == "true"

    @property
    def schema(self) -> Schema:
        return self.schema_by_id(self.current_schema_id)

    def schema_by_id(self, sid: int) -> Schema:
        for s in self.schemas:
            if s.schema_id == sid:
                # attach property-declared variant-shredding so every
                # consumer of this schema (writer companion columns,
                # manifest stats columns, metrics-eval binder) sees the
                # same declarations without separate plumbing
                if any(k.startswith("write.variant.shred.")
                       for k in (self.properties or ())):
                    from .schema import with_shredding

                    return with_shredding(s, self.properties)
                return s
        raise KeyError(f"no schema id {sid}")

    @property
    def spec(self) -> PartitionSpec:
        return self.spec_by_id(self.default_spec_id)

    def spec_by_id(self, sid: int) -> PartitionSpec:
        for s in self.partition_specs:
            if s.spec_id == sid:
                return s
        raise KeyError(f"no spec id {sid}")

    @property
    def sort_order(self) -> SortOrder:
        for s in self.sort_orders:
            if s.order_id == self.default_sort_order_id:
                return s
        return UNSORTED

    @property
    def current_snapshot_id(self) -> Optional[int]:
        ref = self.refs.get(MAIN_BRANCH)
        return ref.snapshot_id if ref else None

    def current_snapshot(self) -> Optional[Snapshot]:
        sid = self.current_snapshot_id
        return self.snapshot_by_id(sid) if sid is not None else None

    def snapshot_by_id(self, sid: int) -> Snapshot:
        for s in self.snapshots:
            if s.snapshot_id == sid:
                return s
        raise KeyError(f"no snapshot {sid}")

    def snapshot_for_ref(self, ref_name: str) -> Optional[Snapshot]:
        r = self.refs.get(ref_name)
        return self.snapshot_by_id(r.snapshot_id) if r else None

    def snapshot_as_of(self, timestamp_ms: int) -> Optional[Snapshot]:
        best = None
        for ts, sid in self.snapshot_log:
            if ts <= timestamp_ms and (best is None or ts >= best[0]):
                best = (ts, sid)
        return self.snapshot_by_id(best[1]) if best else None

    def ancestors_of(self, snapshot_id: Optional[int]) -> list:
        out = []
        by_id = {s.snapshot_id: s for s in self.snapshots}
        cur = snapshot_id
        while cur is not None and cur in by_id:
            s = by_id[cur]
            out.append(s)
            cur = s.parent_snapshot_id
        return out

    # -- json --------------------------------------------------------------
    def _stats_json(self, entries, key):
        out = []
        for e in entries:
            if self.relative_paths and isinstance(e, dict) and e.get(key):
                e = {**e, key: to_relative(e[key], self.location)}
            out.append(e)
        return out

    def to_json(self) -> dict:
        snaps = []
        for s in self.snapshots:
            js = s.to_json()
            if self.relative_paths:
                js["manifest-list"] = to_relative(js["manifest-list"], self.location)
            snaps.append(js)
        return {
            "format-version": FORMAT_VERSION,
            "table-uuid": self.table_uuid,
            "location": self.location,
            "last-sequence-number": self.last_sequence_number,
            "last-updated-ms": self.last_updated_ms,
            "last-column-id": self.last_column_id,
            "schemas": [s.to_json() for s in self.schemas],
            "current-schema-id": self.current_schema_id,
            "partition-specs": [s.to_json() for s in self.partition_specs],
            "default-spec-id": self.default_spec_id,
            "last-partition-id": self.last_partition_id,
            "sort-orders": [s.to_json() for s in self.sort_orders],
            "default-sort-order-id": self.default_sort_order_id,
            "properties": self.properties,
            "snapshots": snaps,
            "refs": {k: v.to_json() for k, v in self.refs.items()},
            "snapshot-log": [list(e) for e in self.snapshot_log],
            # metadata-log file paths relativize like every other tracked
            # location field (spec v4: writers should relativize paths under
            # the table location) — else a relocated table's log points at
            # dead pre-move paths
            "metadata-log": [
                [e[0], to_relative(e[1], self.location)
                 if self.relative_paths else e[1]]
                for e in self.metadata_log],
            "statistics": self._stats_json(self.statistics_files,
                                           "statistics-path"),
            "partition-statistics": self._stats_json(
                self.partition_statistics_files, "path"),
            "next-row-id": self.next_row_id,
            **({"encryption-keys": list(self.encryption_keys)}
               if self.encryption_keys else {}),
        }

    @staticmethod
    def from_json(j: dict, location: Optional[str] = None) -> "TableMetadata":
        """``location`` (from the catalog / where the file was found)
        overrides the recorded one — spec v4 makes the stored location
        optional, which is what lets a relative-path table be relocated by
        a plain directory copy. Snapshot manifest-list paths resolve to
        absolute here; in-memory metadata never holds relative paths."""
        loc = (location or j["location"]).rstrip("/")
        snaps = []
        for s in j.get("snapshots", []):
            snap = Snapshot.from_json(s)
            snaps.append(replace(
                snap, manifest_list=resolve_path(snap.manifest_list, loc)))

        def _stats_load(entries, key):
            return tuple(
                {**e, key: resolve_path(e[key], loc)}
                if isinstance(e, dict) and e.get(key) else e
                for e in entries)
        return TableMetadata(
            location=loc,
            table_uuid=j["table-uuid"],
            last_sequence_number=j["last-sequence-number"],
            last_updated_ms=j["last-updated-ms"],
            last_column_id=j["last-column-id"],
            schemas=tuple(Schema.from_json(s) for s in j["schemas"]),
            current_schema_id=j["current-schema-id"],
            partition_specs=tuple(PartitionSpec.from_json(s) for s in j["partition-specs"]),
            default_spec_id=j["default-spec-id"],
            last_partition_id=j.get("last-partition-id", PARTITION_FIELD_ID_START - 1),
            sort_orders=tuple(SortOrder.from_json(s) for s in j.get("sort-orders", []))
            or (UNSORTED,),
            default_sort_order_id=j.get("default-sort-order-id", 0),
            properties=j.get("properties", {}),
            snapshots=tuple(snaps),
            refs={k: SnapshotRef.from_json(v) for k, v in j.get("refs", {}).items()},
            snapshot_log=tuple(tuple(e) for e in j.get("snapshot-log", [])),
            metadata_log=tuple((e[0], resolve_path(e[1], loc))
                               for e in j.get("metadata-log", [])),
            statistics_files=_stats_load(j.get("statistics", []),
                                         "statistics-path"),
            partition_statistics_files=_stats_load(
                j.get("partition-statistics", []), "path"),
            next_row_id=j.get("next-row-id", 0),
            encryption_keys=tuple(j.get("encryption-keys", [])),
        )

    @staticmethod
    def new(location: str, schema: Schema, spec: PartitionSpec, order: SortOrder = UNSORTED,
            properties: Optional[dict] = None) -> "TableMetadata":
        last_col = schema.highest_field_id()
        last_part = max([f.field_id for f in spec.fields], default=PARTITION_FIELD_ID_START - 1)
        return TableMetadata(
            location=location,
            table_uuid=str(_uuid.uuid4()),
            last_updated_ms=int(time.time() * 1000),
            last_column_id=last_col,
            schemas=(replace(schema, schema_id=0),),
            current_schema_id=0,
            partition_specs=(spec,),
            default_spec_id=spec.spec_id,
            last_partition_id=last_part,
            sort_orders=(order,) if order.order_id == 0 else (UNSORTED, order),
            default_sort_order_id=order.order_id,
            properties=dict(properties or {}),
        )


class CommitFailedException(Exception):
    """Concurrent commit won the CAS; refresh and retry.
    Reference: SnapshotProducer.java:480-542 retry loop."""


class TableOperations:
    """Metadata IO + atomic version swap (HadoopTableOperations-style).

    Layout under `<table>/metadata/`:
      v<N>.metadata.json   — immutable metadata versions
      version-hint.text    — latest committed N (advisory; recovery scans)
      manifests/…, manifest-lists/… — Parquet metadata (manifests.py)
    """

    def __init__(self, location: str, metadata_key=None):
        from .io import resolve_io

        self.location = location.rstrip("/")
        self.metadata_dir = os.path.join(self.location, "metadata")
        self.metadata_key = metadata_key
        self.io = resolve_io(self.location)
        if metadata_key is not None:
            from .encryption import EncryptedFileIO

            self.io = EncryptedFileIO(self.io, metadata_key)

    # -- version management -------------------------------------------------
    def _version_path(self, v: int) -> str:
        return os.path.join(self.metadata_dir, f"v{v}.metadata.json")

    def current_version(self) -> Optional[int]:
        io = self.io
        hint = os.path.join(self.metadata_dir, "version-hint.text")
        v = None
        try:
            v = int(io.read_text(hint).strip())
        except (FileNotFoundError, OSError, ValueError):
            v = None
        if v is None:
            # lost/corrupt hint: recover by directory scan — probing from 1
            # finds nothing when delete-after-commit removed early versions
            import re as _re

            vs = [int(m.group(1)) for m in
                  (_re.match(r"v(\d+)\.metadata\.json$", f)
                   for f in io.list(self.metadata_dir)) if m]
            v = max(vs) if vs else None
        # advance past the hint if a newer committed version exists
        probe = (v or 0) + 1
        while io.exists(self._version_path(probe)):
            v = probe
            probe += 1
        return v

    def refresh(self) -> Optional[TableMetadata]:
        v = self.current_version()
        if v is None:
            return None
        raw = self.io.read_bytes(self._version_path(v))
        if raw[:4] == b"AGS1":  # encrypted, but this ops has no key
            raise ValueError(
                f"table metadata at {self.location} is AES-GCM-Stream "
                "encrypted; open it through a catalog constructed with "
                "metadata_key (or ICEBERG_SPARK_METADATA_KEY)")
        meta = TableMetadata.from_json(
            json.loads(raw.decode("utf-8")), location=self.location)
        if meta.encryption_keys:
            # encrypted manifests: resolve every snapshot's manifest-list
            # key through the KEK chain so reads decrypt transparently
            from .encryption import register_table_keys

            register_table_keys(meta, self.metadata_key)
        return meta

    def commit(self, base_version: Optional[int], metadata: TableMetadata) -> int:
        """CAS: publish v(base+1) atomically, failing if it exists
        (FileIO.write_atomic — os.link locally, rename-no-clobber on
        Hadoop filesystems)."""
        io = self.io
        new_v = (base_version or 0) + 1
        metadata = replace(metadata, last_updated_ms=int(time.time() * 1000))
        target = self._version_path(new_v)
        try:
            io.write_atomic(target,
                            json.dumps(metadata.to_json()).encode("utf-8"))
        except FileExistsError as e:
            raise CommitFailedException(f"version {new_v} already committed") from e
        io.write_text(os.path.join(self.metadata_dir, "version-hint.text"),
                      str(new_v))
        # write.metadata.delete-after-commit.enabled
        # (TableProperties.java:342): retain only the newest
        # previous-versions-max previous metadata files. Walk downward
        # until an already-missing version — prior commits deleted the
        # rest, so cleanup stays O(1) per commit.
        props = metadata.properties or {}
        if str(props.get("write.metadata.delete-after-commit.enabled",
                         "false")).lower() == "true":
            keep = int(props.get("write.metadata.previous-versions-max",
                                 "100"))
            v = new_v - keep - 1
            while v >= 1:
                try:
                    io.delete_file(self._version_path(v))
                except OSError:
                    # already removed (contiguous tail) or persistently
                    # failing (permissions): stop either way — cleanup is
                    # best-effort, the commit already stands, and breaking
                    # keeps the walk O(1) per commit
                    break
                v -= 1
        return new_v
