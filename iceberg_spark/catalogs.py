"""SQL-database-backed catalog — the reference JdbcCatalog analog
(core/.../jdbc/JdbcCatalog.java, JdbcUtil.java table shapes) over
sqlite3, the environment's embedded SQL engine.

The database holds the REGISTRY only: `iceberg_tables` rows map
(catalog, namespace, table) -> current metadata_location with the
previous location retained, and `iceberg_namespace_properties` holds
namespace rows — exactly the reference's two-table layout. Table
metadata and data files stay in the warehouse (HadoopTableOperations
files), so every scan/commit code path is unchanged; what the SQL
catalog adds is registry atomicity: each engine commit CASes the
`metadata_location` column (UPDATE ... WHERE metadata_location =
<expected>), so two catalog instances racing on the same table see one
winner even when they run on different machines sharing the database —
the JdbcCatalog concurrency model.

Differences from the directory catalog:
  * rename is a registry-row update (the table directory keeps its
    original name, as JdbcCatalog does);
  * dropping keeps data unless purge=True;
  * listing reads rows, not directories.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sqlite3
import threading
from typing import Optional

from .metadata import (CommitFailedException, TableMetadata,
                       TableOperations)
from .table import Catalog, Table, _build_spec

class InMemoryCatalog(Catalog):
    """Ephemeral registry (core/.../inmemory/InMemoryCatalog.java
    analog): namespaces and table -> location mappings live in process
    memory and vanish with it; table files still land in the warehouse
    (Spark must read real parquet), so this is the testing/scratch
    catalog — no registry file or database is ever created."""

    def __init__(self, spark, warehouse: str, name: str = "memory"):
        super().__init__(spark, warehouse, name)
        self._tables: dict = {}  # ident -> location
        self._namespaces: set = set()
        self._ns_props: dict = {}  # namespace -> {key: value}

    def create_table(self, identifier: str, schema, partition_by=None,
                     sort_order=None, properties=None,
                     exists_ok: bool = False) -> Table:
        if identifier in self._tables:
            if exists_ok:
                return self.load_table(identifier)
            raise ValueError(f"table exists: {identifier}")
        ns = identifier.rpartition(".")[0]
        if ns:
            self._namespaces.add(ns)
        from .metadata import UNSORTED

        t = super().create_table(
            identifier, schema, partition_by=partition_by,
            sort_order=sort_order or UNSORTED, properties=properties)
        self._tables[identifier] = t.location
        return t

    def load_table(self, identifier: str) -> Table:
        loc = self._tables.get(identifier)
        if loc is None:
            raise ValueError(f"no such table: {identifier}")
        return Table(self.spark, loc,
                     TableOperations(loc).refresh(), identifier)

    def table_exists(self, identifier: str) -> bool:
        return identifier in self._tables

    def drop_table(self, identifier: str, purge: bool = True) -> bool:
        loc = self._tables.pop(identifier, None)
        if loc is None:
            return False
        if purge:
            from .io import resolve_io

            resolve_io(loc, self.spark).delete_dir(loc)
        return True

    def rename_table(self, from_id: str, to_id: str):
        if from_id not in self._tables:
            raise ValueError(f"no such table: {from_id}")
        if to_id in self._tables:
            raise ValueError(f"table exists: {to_id}")
        self._tables[to_id] = self._tables.pop(from_id)

    def list_tables(self, namespace: str = "") -> list:
        return sorted(i for i in self._tables
                      if not namespace
                      or i.rpartition(".")[0] == namespace)

    def create_namespace(self, namespace: str, exists_ok: bool = False):
        if namespace in self._namespaces and not exists_ok:
            raise ValueError(f"namespace exists: {namespace}")
        self._namespaces.add(namespace)

    def namespace_exists(self, namespace: str) -> bool:
        return namespace in self._namespaces

    def drop_namespace(self, namespace: str):
        if namespace not in self._namespaces:
            raise ValueError(f"no such namespace: {namespace}")
        if self.list_tables(namespace):
            raise ValueError(f"namespace not empty: {namespace}")
        self._namespaces.discard(namespace)

    def list_namespaces(self) -> list:
        return sorted(self._namespaces)

    def namespace_properties(self, namespace: str) -> dict:
        if namespace not in self._namespaces:
            raise ValueError(f"no such namespace: {namespace}")
        return dict(self._ns_props.get(namespace, {}))

    def update_namespace_properties(self, namespace: str,
                                    updates: Optional[dict] = None,
                                    removals: Optional[list] = None):
        updates = {k: str(v) for k, v in (updates or {}).items()}
        removals = list(removals or [])
        both = set(updates) & set(removals)
        if both:
            raise ValueError(
                f"properties in both updates and removals: {sorted(both)}")
        if namespace not in self._namespaces:
            raise ValueError(f"no such namespace: {namespace}")
        props = self._ns_props.setdefault(namespace, {})
        removed = [k for k in removals if k in props]
        missing = [k for k in removals if k not in props]
        for k in removed:
            del props[k]
        props.update(updates)
        return sorted(updates), sorted(removed), sorted(missing)


_TABLES_DDL = """
CREATE TABLE IF NOT EXISTS iceberg_tables (
  catalog_name TEXT NOT NULL,
  table_namespace TEXT NOT NULL,
  table_name TEXT NOT NULL,
  metadata_location TEXT,
  previous_metadata_location TEXT,
  PRIMARY KEY (catalog_name, table_namespace, table_name)
)"""

_NS_DDL = """
CREATE TABLE IF NOT EXISTS iceberg_namespace_properties (
  catalog_name TEXT NOT NULL,
  namespace TEXT NOT NULL,
  property_key TEXT NOT NULL,
  property_value TEXT,
  PRIMARY KEY (catalog_name, namespace, property_key)
)"""


class _SqlTableOperations(TableOperations):
    """Filesystem metadata versions + registry CAS per commit.

    The REGISTRY row is authoritative (JdbcCatalog semantics):
    current_version/refresh follow the registered metadata_location, not
    the newest file on disk, so an orphan vN.metadata.json left by a
    half-failed commit on another machine is never served. When the
    filesystem write lands but the registry CAS loses, the orphan
    version file is removed before the failure propagates."""

    def __init__(self, location: str, catalog: "SqlCatalog", ident: str):
        super().__init__(location,
                         metadata_key=getattr(catalog, "metadata_key",
                                              None))
        self._catalog = catalog
        self._ident = ident

    def current_version(self) -> Optional[int]:
        row = self._catalog._row(self._ident)
        if row and row[0]:
            m = re.search(r"v(\d+)\.metadata\.json$", row[0])
            if m:
                return int(m.group(1))
        return super().current_version()

    def commit(self, base_version, metadata: TableMetadata) -> int:
        prev = self._version_path(base_version) if base_version else None
        v = super().commit(base_version, metadata)
        try:
            self._catalog._cas_location(self._ident, prev,
                                        self._version_path(v))
        except CommitFailedException:
            # fs write landed but another catalog committed past us:
            # remove our orphan so registry-following loads stay clean
            try:
                self.io.delete_file(self._version_path(v))
            except Exception:
                pass
            try:  # restore the advisory hint to the committed version
                self.io.write_text(
                    os.path.join(self.metadata_dir, "version-hint.text"),
                    str(base_version or 0))
            except Exception:
                pass
            raise
        return v


class SqlCatalog(Catalog):
    """Catalog API over sqlite3-registered tables."""

    def __init__(self, spark, warehouse: str, name: str = "sql",
                 db_path: Optional[str] = None, metadata_key=None):
        super().__init__(spark, warehouse, name,
                         metadata_key=metadata_key)
        self.db_path = db_path or os.path.join(self.warehouse,
                                               "catalog.db")
        self._lock = threading.Lock()
        self._db = sqlite3.connect(self.db_path,
                                   check_same_thread=False)
        with self._lock, self._db:
            self._db.execute(_TABLES_DDL)
            self._db.execute(_NS_DDL)

    # -- registry helpers ---------------------------------------------------
    def _split(self, identifier: str):
        ns, _, name = identifier.rpartition(".")
        return ns, name

    def _row(self, identifier: str):
        ns, name = self._split(identifier)
        with self._lock:
            cur = self._db.execute(
                "SELECT metadata_location FROM iceberg_tables WHERE "
                "catalog_name=? AND table_namespace=? AND table_name=?",
                (self.name, ns, name))
            return cur.fetchone()

    def _cas_location(self, identifier: str, expected: Optional[str],
                      new: str):
        ns, name = self._split(identifier)
        with self._lock, self._db:
            cur = self._db.execute(
                "UPDATE iceberg_tables SET metadata_location=?, "
                "previous_metadata_location=? WHERE catalog_name=? AND "
                "table_namespace=? AND table_name=? AND "
                "(metadata_location=? OR (metadata_location IS NULL "
                "AND ? IS NULL))",
                (new, expected, self.name, ns, name, expected, expected))
            if cur.rowcount != 1:
                raise CommitFailedException(
                    f"registry CAS failed for {identifier}: another "
                    f"catalog committed past {expected}")

    # -- tables -------------------------------------------------------------
    def create_table(self, identifier: str, schema, partition_by=None,
                     sort_order=None, properties=None,
                     exists_ok: bool = False) -> Table:
        from pyspark.sql import types as T

        from .metadata import UNSORTED
        from .schema import Schema

        if self._row(identifier) is not None:
            if exists_ok:
                return self.load_table(identifier)
            raise ValueError(f"table exists: {identifier}")
        ns, name = self._split(identifier)
        if ns and not self.namespace_exists(ns):
            self.create_namespace(ns, exists_ok=True)
        loc = self._location(identifier)
        if isinstance(schema, T.StructType):
            schema = Schema.from_spark(schema)
        spec = _build_spec(schema, partition_by)
        meta = TableMetadata.new(loc, schema, spec,
                                 sort_order or UNSORTED, properties)
        ops = _SqlTableOperations(loc, self, identifier)
        # metadata file FIRST, fully-populated registry row AFTER: a
        # failure in between leaves an unreferenced file, never a row a
        # load can crash on (JdbcCatalog commits metadata before the
        # registry insert for the same reason)
        try:
            v = TableOperations(
                loc, metadata_key=self.metadata_key).commit(None, meta)
        except CommitFailedException:
            # v1 already on disk: a concurrent creator won the file race
            if exists_ok:
                return self.load_table(identifier)
            raise ValueError(f"table exists: {identifier}") from None
        try:
            with self._lock, self._db:
                self._db.execute(
                    "INSERT INTO iceberg_tables (catalog_name, "
                    "table_namespace, table_name, metadata_location) "
                    "VALUES (?, ?, ?, ?)",
                    (self.name, ns, name, ops._version_path(v)))
        except sqlite3.IntegrityError:
            if exists_ok:
                return self.load_table(identifier)
            raise ValueError(f"table exists: {identifier}") from None
        return self.load_table(identifier)

    def load_table(self, identifier: str) -> Table:
        row = self._row(identifier)
        if row is None or row[0] is None:
            raise ValueError(f"no such table: {identifier}")
        mloc = row[0]
        loc = os.path.dirname(os.path.dirname(mloc))  # .../metadata/vN
        # load exactly the REGISTERED version (JdbcCatalog semantics):
        # a newer filesystem version whose registry CAS failed is an
        # orphan and must not be served — read through the keyed ops IO
        # so encrypted registries decrypt (or fail loudly)
        ops = _SqlTableOperations(loc, self, identifier)
        raw = ops.io.read_bytes(mloc)
        if raw[:4] == b"AGS1":
            raise ValueError(
                f"table metadata at {loc} is AES-GCM-Stream encrypted; "
                "open it through a catalog constructed with metadata_key")
        meta = TableMetadata.from_json(json.loads(raw.decode("utf-8")),
                                       location=loc)
        if meta.encryption_keys:
            from .encryption import register_table_keys

            register_table_keys(meta, self.metadata_key)
        t = Table(self.spark, loc, meta, identifier)
        t.ops = ops
        return t

    def table_exists(self, identifier: str) -> bool:
        return self._row(identifier) is not None

    def drop_table(self, identifier: str, purge: bool = True) -> bool:
        row = self._row(identifier)
        if row is None:
            return False
        ns, name = self._split(identifier)
        with self._lock, self._db:
            self._db.execute(
                "DELETE FROM iceberg_tables WHERE catalog_name=? AND "
                "table_namespace=? AND table_name=?",
                (self.name, ns, name))
        if purge and row[0]:
            from .io import resolve_io

            loc = os.path.dirname(os.path.dirname(row[0]))
            resolve_io(loc, self.spark).delete_dir(loc)
        return True

    def rename_table(self, from_id: str, to_id: str):
        if self._row(from_id) is None:
            raise ValueError(f"no such table: {from_id}")
        if self._row(to_id) is not None:
            raise ValueError(f"table exists: {to_id}")
        fns, fname = self._split(from_id)
        tns, tname = self._split(to_id)
        # registry-row rename (JdbcCatalog.renameTable): files stay put
        with self._lock, self._db:
            self._db.execute(
                "UPDATE iceberg_tables SET table_namespace=?, "
                "table_name=? WHERE catalog_name=? AND "
                "table_namespace=? AND table_name=?",
                (tns, tname, self.name, fns, fname))

    def list_tables(self, namespace: str = "") -> list:
        with self._lock:
            if namespace:
                cur = self._db.execute(
                    "SELECT table_namespace, table_name FROM "
                    "iceberg_tables WHERE catalog_name=? AND "
                    "table_namespace=?", (self.name, namespace))
            else:
                cur = self._db.execute(
                    "SELECT table_namespace, table_name FROM "
                    "iceberg_tables WHERE catalog_name=?", (self.name,))
            return sorted(f"{ns}.{n}" if ns else n
                          for ns, n in cur.fetchall())

    # -- namespaces ---------------------------------------------------------
    def create_namespace(self, namespace: str, exists_ok: bool = False):
        if self.namespace_exists(namespace):
            if exists_ok:
                return
            raise ValueError(f"namespace exists: {namespace}")
        with self._lock, self._db:
            self._db.execute(
                "INSERT INTO iceberg_namespace_properties (catalog_name,"
                " namespace, property_key, property_value) VALUES "
                "(?, ?, 'exists', 'true')", (self.name, namespace))

    def namespace_exists(self, namespace: str) -> bool:
        with self._lock:
            cur = self._db.execute(
                "SELECT 1 FROM iceberg_namespace_properties WHERE "
                "catalog_name=? AND namespace=? LIMIT 1",
                (self.name, namespace))
            return cur.fetchone() is not None

    def drop_namespace(self, namespace: str):
        if not self.namespace_exists(namespace):
            raise ValueError(f"no such namespace: {namespace}")
        if self.list_tables(namespace):
            raise ValueError(f"namespace not empty: {namespace}")
        with self._lock, self._db:
            self._db.execute(
                "DELETE FROM iceberg_namespace_properties WHERE "
                "catalog_name=? AND namespace=?", (self.name, namespace))

    def list_namespaces(self) -> list:
        with self._lock:
            cur = self._db.execute(
                "SELECT DISTINCT namespace FROM "
                "iceberg_namespace_properties WHERE catalog_name=?",
                (self.name,))
            return sorted(r[0] for r in cur.fetchall())

    def namespace_properties(self, namespace: str) -> dict:
        if not self.namespace_exists(namespace):
            raise ValueError(f"no such namespace: {namespace}")
        with self._lock:
            cur = self._db.execute(
                "SELECT property_key, property_value FROM "
                "iceberg_namespace_properties WHERE catalog_name=? AND "
                "namespace=? AND property_key != 'exists'",
                (self.name, namespace))
            return dict(cur.fetchall())

    def update_namespace_properties(self, namespace: str,
                                    updates: Optional[dict] = None,
                                    removals: Optional[list] = None):
        updates = {k: str(v) for k, v in (updates or {}).items()}
        removals = list(removals or [])
        both = set(updates) & set(removals)
        if both:
            raise ValueError(
                f"properties in both updates and removals: {sorted(both)}")
        props = self.namespace_properties(namespace)  # raises on missing ns
        removed = [k for k in removals if k in props]
        missing = [k for k in removals if k not in props]
        with self._lock, self._db:
            for k in removed:
                self._db.execute(
                    "DELETE FROM iceberg_namespace_properties WHERE "
                    "catalog_name=? AND namespace=? AND property_key=?",
                    (self.name, namespace, k))
            for k, v in updates.items():
                self._db.execute(
                    "INSERT INTO iceberg_namespace_properties (catalog_name,"
                    " namespace, property_key, property_value) VALUES "
                    "(?, ?, ?, ?) ON CONFLICT (catalog_name, namespace, "
                    "property_key) DO UPDATE SET property_value=excluded."
                    "property_value",
                    (self.name, namespace, k, v))
        return sorted(updates), sorted(removed), sorted(missing)


class CachingCatalog:
    """TTL table cache in front of ANY catalog — the reference
    CachingCatalog analog (core/.../CachingCatalog.java, wrapped by
    CatalogUtil when `cache-enabled=true`;
    `cache.expiration-interval-ms` semantics from
    CatalogProperties.java:42-66: -1 = never expire, 0 = caching off,
    >0 = entries expire that many ms after they were cached).

    Why it matters at scale: a 100 TB table's metadata JSON runs to tens
    of MB; a planner that calls load_table per query re-reads and
    re-parses it every time. The cache returns the SAME Table object
    until expiry — staleness up to the interval is the documented
    trade (readers needing the newest snapshot call .refresh(), which
    always goes to storage). Mutations routed through this wrapper
    (create/drop/rename/register) invalidate eagerly, like the
    reference's invalidateTable calls.
    """

    def __init__(self, catalog, expiration_interval_ms: int = 30_000):
        import time as _t

        self._catalog = catalog
        self._ttl = expiration_interval_ms / 1000.0
        self._clock = _t.monotonic
        self._cache: dict = {}  # ident -> (table, cached_at)

    @classmethod
    def wrap(cls, catalog, properties: dict):
        """CatalogUtil.buildIcebergCatalog behavior: honor
        `cache-enabled` + `cache.expiration-interval-ms` from catalog
        properties; 0 (or cache-enabled=false) returns the catalog
        unwrapped."""
        enabled = str(properties.get("cache-enabled", "true")).lower()
        ms = int(properties.get("cache.expiration-interval-ms", 30_000))
        if enabled != "true" or ms == 0:
            return catalog
        return cls(catalog, expiration_interval_ms=ms)

    # -- cached reads -------------------------------------------------
    def load_table(self, identifier: str) -> Table:
        hit = self._cache.get(identifier)
        if hit is not None:
            t, at = hit
            if self._ttl < 0 or (self._clock() - at) < self._ttl:
                return t
            del self._cache[identifier]
        t = self._catalog.load_table(identifier)
        self._cache[identifier] = (t, self._clock())
        return t

    # -- invalidating mutations ---------------------------------------
    def invalidate_table(self, identifier: str):
        self._cache.pop(identifier, None)

    def create_table(self, *a, **kw) -> Table:
        t = self._catalog.create_table(*a, **kw)
        self.invalidate_table(t.identifier)
        return t

    def drop_table(self, identifier: str, *a, **kw):
        self.invalidate_table(identifier)
        return self._catalog.drop_table(identifier, *a, **kw)

    def rename_table(self, from_id: str, to_id: str):
        self.invalidate_table(from_id)
        self.invalidate_table(to_id)
        return self._catalog.rename_table(from_id, to_id)

    def register_table(self, identifier: str, *a, **kw):
        # reference CachingCatalog.registerTable invalidates before
        # delegating — a cached stale Table must not survive
        # re-registration of the same identifier
        self.invalidate_table(identifier)
        return self._catalog.register_table(identifier, *a, **kw)

    def __getattr__(self, name):
        # everything else (list/exists/namespaces/properties/…) passes
        # through uncached, matching the reference (only loadTable and
        # metadata tables cache)
        return getattr(self._catalog, name)
