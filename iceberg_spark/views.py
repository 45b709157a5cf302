"""Versioned SQL views and catalog-stored SQL functions (UDF metadata).

Reference:
  - Views: `format/view-spec.md` — view metadata holds a list of versions,
    each with the SQL text + dialect + schema and a `version-log`;
    `current-version-id` points at the active one. Engine-side resolution:
    `api/.../view/View.java`, Spark rule
    `spark-extensions/.../analysis/ResolveViews.scala`.
  - Functions: `format/udf-spec.md:1-50` — portable catalog-stored SQL
    UDF/UDTF definitions with versioning.

Spark mapping (SURVEY §2.J): view/function metadata is JSON in the catalog
warehouse; views expand to their SQL text at query time (the SQL veneer in
`sql.py` substitutes them like ResolveViews does), and functions
materialize through Spark 4 SQL scalar/table functions
(`CREATE OR REPLACE TEMPORARY FUNCTION ... RETURNS ... RETURN body`).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Optional


@dataclass(frozen=True)
class ViewVersion:
    version_id: int
    timestamp_ms: int
    sql: str
    dialect: str = "spark"
    schema_json: Optional[dict] = None
    summary: dict = field(default_factory=dict)

    def to_json(self):
        return {
            "version-id": self.version_id,
            "timestamp-ms": self.timestamp_ms,
            "sql": self.sql,
            "dialect": self.dialect,
            "schema": self.schema_json,
            "summary": self.summary,
        }

    @staticmethod
    def from_json(j):
        return ViewVersion(j["version-id"], j["timestamp-ms"], j["sql"],
                           j.get("dialect", "spark"), j.get("schema"),
                           j.get("summary", {}))


@dataclass
class ViewMetadata:
    identifier: str
    current_version_id: int
    versions: tuple
    properties: dict = field(default_factory=dict)
    version_log: tuple = ()  # (timestamp_ms, version_id)

    @property
    def current_version(self) -> ViewVersion:
        for v in self.versions:
            if v.version_id == self.current_version_id:
                return v
        raise ValueError(f"no version {self.current_version_id}")

    @property
    def sql(self) -> str:
        return self.current_version.sql

    def to_json(self):
        return {
            "view-identifier": self.identifier,
            "current-version-id": self.current_version_id,
            "versions": [v.to_json() for v in self.versions],
            "properties": self.properties,
            "version-log": [list(e) for e in self.version_log],
        }

    @staticmethod
    def from_json(j):
        return ViewMetadata(
            j["view-identifier"], j["current-version-id"],
            tuple(ViewVersion.from_json(v) for v in j["versions"]),
            j.get("properties", {}),
            tuple(tuple(e) for e in j.get("version-log", ())),
        )


@dataclass(frozen=True)
class FunctionVersion:
    version_id: int
    timestamp_ms: int
    params: tuple  # ((name, sql_type), ...)
    return_type: str  # SQL type, or "TABLE (col type, ...)" for UDTFs
    body: str  # SQL expression (scalar) or query (table function)
    dialect: str = "spark"
    deterministic: bool = True

    def to_json(self):
        return {
            "version-id": self.version_id,
            "timestamp-ms": self.timestamp_ms,
            "parameters": [list(p) for p in self.params],
            "return-type": self.return_type,
            "body": self.body,
            "dialect": self.dialect,
            "deterministic": self.deterministic,
        }

    @staticmethod
    def from_json(j):
        return FunctionVersion(
            j["version-id"], j["timestamp-ms"],
            tuple(tuple(p) for p in j["parameters"]),
            j["return-type"], j["body"], j.get("dialect", "spark"),
            j.get("deterministic", True),
        )


@dataclass
class FunctionMetadata:
    identifier: str
    current_version_id: int
    versions: tuple

    @property
    def current_version(self) -> FunctionVersion:
        for v in self.versions:
            if v.version_id == self.current_version_id:
                return v
        raise ValueError(f"no version {self.current_version_id}")

    def to_json(self):
        return {
            "function-identifier": self.identifier,
            "current-version-id": self.current_version_id,
            "versions": [v.to_json() for v in self.versions],
        }

    @staticmethod
    def from_json(j):
        return FunctionMetadata(
            j["function-identifier"], j["current-version-id"],
            tuple(FunctionVersion.from_json(v) for v in j["versions"]),
        )


# ---------------------------------------------------------------------------
# catalog storage: warehouse/_views/<ident>.json, warehouse/_functions/<i>.json
# ---------------------------------------------------------------------------


def _path(catalog, kind: str, identifier: str) -> str:
    return os.path.join(catalog.warehouse, kind, f"{identifier}.json")


def _io(catalog):
    from .io import resolve_io

    return getattr(catalog, "io", None) or resolve_io(catalog.warehouse)


def _load(catalog, kind, identifier):
    p = _path(catalog, kind, identifier)
    io = _io(catalog)
    if not io.exists(p):
        return None
    return json.loads(io.read_text(p))


def _store(catalog, kind, identifier, doc):
    p = _path(catalog, kind, identifier)
    _io(catalog).write_text(p, json.dumps(doc, indent=1))


def create_view(catalog, identifier: str, sql: str, replace: bool = False,
                dialect: str = "spark", properties: Optional[dict] = None,
                schema_json: Optional[dict] = None) -> ViewMetadata:
    """CREATE [OR REPLACE] VIEW — replace appends a new version (view-spec
    versioning: old versions stay queryable via version_id)."""
    now = int(time.time() * 1000)
    j = _load(catalog, "_views", identifier)
    if j is not None and not replace:
        raise ValueError(f"view exists: {identifier}")
    if j is None:
        meta = ViewMetadata(identifier, 1,
                            (ViewVersion(1, now, sql, dialect, schema_json),),
                            properties or {}, ((now, 1),))
    else:
        meta = ViewMetadata.from_json(j)
        vid = max(v.version_id for v in meta.versions) + 1
        meta = ViewMetadata(
            identifier, vid,
            meta.versions + (ViewVersion(vid, now, sql, dialect, schema_json),),
            {**meta.properties, **(properties or {})},
            meta.version_log + ((now, vid),),
        )
    _store(catalog, "_views", identifier, meta.to_json())
    return meta


def load_view(catalog, identifier: str) -> Optional[ViewMetadata]:
    j = _load(catalog, "_views", identifier)
    return ViewMetadata.from_json(j) if j is not None else None


def drop_view(catalog, identifier: str) -> bool:
    p = _path(catalog, "_views", identifier)
    io = _io(catalog)
    if io.exists(p):
        io.delete_file(p)
        return True
    return False


def rename_view(catalog, from_id: str, to_id: str) -> None:
    """Rename a view: identity (version history, properties) moves with
    it; the stored identifier field follows the new name."""
    vm = load_view(catalog, from_id)
    if vm is None:
        raise ValueError(f"no such view: {from_id}")
    if load_view(catalog, to_id) is not None:
        raise ValueError(f"view exists: {to_id}")
    from dataclasses import replace as _replace

    _store(catalog, "_views", to_id, _replace(vm, identifier=to_id).to_json())
    drop_view(catalog, from_id)


def list_views(catalog) -> list:
    d = os.path.join(catalog.warehouse, "_views")
    return sorted(f[:-5] for f in _io(catalog).list(d)
                  if f.endswith(".json"))


def create_function(catalog, identifier: str, params, return_type: str,
                    body: str, replace: bool = False, dialect: str = "spark",
                    deterministic: bool = True) -> FunctionMetadata:
    now = int(time.time() * 1000)
    j = _load(catalog, "_functions", identifier)
    if j is not None and not replace:
        raise ValueError(f"function exists: {identifier}")
    ver = 1 if j is None else (
        max(v["version-id"] for v in j["versions"]) + 1)
    fv = FunctionVersion(ver, now, tuple(tuple(p) for p in params),
                         return_type, body, dialect, deterministic)
    if j is None:
        meta = FunctionMetadata(identifier, 1, (fv,))
    else:
        meta = FunctionMetadata.from_json(j)
        meta = FunctionMetadata(identifier, ver, meta.versions + (fv,))
    _store(catalog, "_functions", identifier, meta.to_json())
    return meta


def load_function(catalog, identifier: str) -> Optional[FunctionMetadata]:
    j = _load(catalog, "_functions", identifier)
    return FunctionMetadata.from_json(j) if j is not None else None


def drop_function(catalog, identifier: str) -> bool:
    p = _path(catalog, "_functions", identifier)
    io = _io(catalog)
    if io.exists(p):
        io.delete_file(p)
        return True
    return False


def list_functions(catalog) -> list:
    d = os.path.join(catalog.warehouse, "_functions")
    return sorted(f[:-5] for f in _io(catalog).list(d)
                  if f.endswith(".json"))


def materialize_function(spark, meta: FunctionMetadata,
                         version_id: Optional[int] = None, resolver=None):
    """Register a stored SQL function for the session (Spark 4 SQL UDF /
    UDTF: CREATE OR REPLACE TEMPORARY FUNCTION f(x T) RETURNS T|TABLE(...)
    RETURN body). `resolver` rewrites engine-table / view references in
    the body (the SQL engine passes its identifier resolution) — bodies
    are stored raw so they stay portable across sessions."""
    v = meta.current_version if version_id is None else next(
        x for x in meta.versions if x.version_id == version_id)
    if v.dialect != "spark":
        raise ValueError(f"cannot materialize dialect {v.dialect!r} in Spark")
    name = meta.identifier.split(".")[-1]
    sig = ", ".join(f"{n} {t}" for n, t in v.params)
    body = resolver(v.body) if resolver is not None else v.body
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({sig}) "
        f"RETURNS {v.return_type} RETURN {body}"
    )
    return name
