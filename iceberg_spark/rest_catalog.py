"""Read-only REST catalog adapter (open-api/rest-catalog-open-api.yaml
surface): external tooling speaking the Iceberg REST protocol can list
namespaces/tables and loadTable against an engine catalog.

loadTable serves REFERENCE-shaped metadata: on each request the table's
current snapshot is exported to `<table>/metadata-export/<snapshot-id>/`
(Avro manifest list + manifests, sources/iceberg.py
export_reference_metadata, cached per snapshot id), so the returned
`metadata` document is exactly what a genuine apache/iceberg client
expects — Avro manifests, absolute file paths — not the engine's
internal Parquet-manifest metadata.

Endpoints (GET unless noted):
  /v1/config
  /v1/namespaces                               (flat listing)
  /v1/namespaces/{ns}
  /v1/namespaces/{ns}/tables
  /v1/namespaces/{ns}/tables/{table}           (LoadTableResult; HEAD=200/404)

Write endpoints return 405 — this is deliberately a read surface; commits
stay with the engine's own transaction layer.
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import unquote


def _load_table_result(catalog, ident: str) -> dict:
    from .sources.iceberg import export_reference_metadata

    t = catalog.load_table(ident)
    snap = t.current_snapshot()
    tag = str(snap.snapshot_id) if snap else "empty"
    dest = os.path.join(t.location, "metadata-export", tag)
    mpath = os.path.join(dest, "metadata", "v1.metadata.json")
    if not os.path.exists(mpath):
        mpath = export_reference_metadata(t, dest)
    with open(mpath) as fh:
        md = json.load(fh)
    return {"metadata-location": mpath, "metadata": md, "config": {}}


class _Handler(BaseHTTPRequestHandler):
    catalog = None  # injected by serve()

    def log_message(self, *a):  # silence default stderr access log
        pass

    def _json(self, code: int, body: dict = None):
        data = json.dumps(body or {}).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        if self.command != "HEAD":
            self.wfile.write(data)

    def _error(self, code: int, msg: str, etype: str):
        self._json(code, {"error": {"message": msg, "type": etype,
                                    "code": code}})

    def _route(self):
        parts = [unquote(p) for p in self.path.split("?")[0].split("/")
                 if p]
        cat = self.catalog
        if parts[:1] != ["v1"]:
            return self._error(404, f"no such route: {self.path}",
                               "NoSuchRouteException")
        rest = parts[1:]
        if rest == ["config"]:
            return self._json(200, {"defaults": {}, "overrides": {}})
        if rest == ["namespaces"]:
            return self._json(200, {"namespaces": [
                ns.split(".") for ns in cat.list_namespaces()]})
        if len(rest) == 2 and rest[0] == "namespaces":
            ns = rest[1].replace("\x1f", ".")
            if not cat.namespace_exists(ns):
                return self._error(404, f"no such namespace: {ns}",
                                   "NoSuchNamespaceException")
            return self._json(200, {"namespace": ns.split("."),
                                    "properties": {}})
        if len(rest) == 3 and rest[0] == "namespaces" and rest[2] == "tables":
            ns = rest[1].replace("\x1f", ".")
            if not cat.namespace_exists(ns):
                return self._error(404, f"no such namespace: {ns}",
                                   "NoSuchNamespaceException")
            return self._json(200, {"identifiers": [
                {"namespace": ns.split("."),
                 "name": ident.split(".")[-1]}
                for ident in cat.list_tables(ns)]})
        if len(rest) == 4 and rest[0] == "namespaces" and rest[2] == "tables":
            ns = rest[1].replace("\x1f", ".")
            ident = f"{ns}.{rest[3]}"
            if not cat.table_exists(ident):
                return self._error(404, f"no such table: {ident}",
                                   "NoSuchTableException")
            if self.command == "HEAD":
                return self._json(200)
            return self._json(200, _load_table_result(cat, ident))
        return self._error(404, f"no such route: {self.path}",
                           "NoSuchRouteException")

    def do_GET(self):
        try:
            self._route()
        except Exception as e:  # noqa: BLE001 — surface as a 500 payload
            self._error(500, str(e)[:500], type(e).__name__)

    do_HEAD = do_GET

    def _reject_write(self):
        self._error(405, "this catalog adapter is read-only",
                    "UnsupportedOperationException")

    do_POST = do_PUT = do_DELETE = _reject_write


def serve(catalog, port: int = 0):
    """Start the adapter on localhost; returns (server, port). Call
    `server.shutdown()` to stop. Requests run in daemon threads."""
    handler = type("Handler", (_Handler,), {"catalog": catalog})
    srv = ThreadingHTTPServer(("127.0.0.1", port), handler)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    return srv, srv.server_address[1]
