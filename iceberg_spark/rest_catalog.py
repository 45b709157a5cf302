"""REST catalog adapter (open-api/rest-catalog-open-api.yaml surface):
external tooling speaking the Iceberg REST protocol can list, read, AND
write against an engine catalog.

loadTable serves REFERENCE-shaped metadata: on each request the table's
current snapshot is exported to `<table>/metadata-export/<snapshot-id>/`
(Avro manifest list + manifests, sources/iceberg.py
export_reference_metadata, cached per snapshot id), so the returned
`metadata` document is exactly what a genuine apache/iceberg client
expects — Avro manifests, absolute file paths — not the engine's
internal Parquet-manifest metadata. The exported refs preserve the
engine's snapshot id and table uuid, so requirements a client builds
from loadTable validate against the engine table on commit.

Endpoints (core/.../rest/CatalogHandlers.java parity):
  GET  /v1/config
  GET  /v1/namespaces                           (flat listing)
  GET|DELETE /v1/namespaces/{ns}
  POST /v1/namespaces                           (createNamespace)
  GET  /v1/namespaces/{ns}/tables
  POST /v1/namespaces/{ns}/tables               (createTable)
  GET|HEAD|DELETE /v1/namespaces/{ns}/tables/{table}
  POST /v1/namespaces/{ns}/tables/{table}       (CommitTableRequest)
  POST /v1/tables/rename
  POST /v1/namespaces/{ns}/properties           (updateNamespaceProperties)
  POST /v1/namespaces/{ns}/register             (registerTable by
                                                 metadata-location)
  POST /v1/transactions/commit                  (multi-table commit)
  GET|POST /v1/namespaces/{ns}/views            (list / createView)
  GET|HEAD|DELETE /v1/namespaces/{ns}/views/{view}
  POST /v1/namespaces/{ns}/views/{view}         (UpdateViewRequest)
  POST /v1/views/rename

Commits validate requirements (assert-ref-snapshot-id /
assert-table-uuid → 409 CommitFailedException on mismatch) and apply
updates: `add-snapshot` replays the client-written Avro manifest list
through sources/iceberg.replay_snapshot_onto (files register by
reference, the client's snapshot id is preserved; ENCRYPTED manifest
lists decrypt through the client's KEK chain when the serving catalog
holds the table's metadata_key), `add-encryption-key` /
`remove-encryption-key` edit the `encryption-keys` chain in request
order BEFORE snapshots replay, `set-snapshot-ref` moves refs,
`set-properties` / `remove-properties` edit properties, and
`add-schema` / `set-current-schema` / `add-spec` / `set-default-spec`
apply client-side ALTER TABLE (schema + spec evolution). Unsupported
update actions fail loudly with 400.
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import unquote


def _table_etag(catalog, ident: str, mode: str, table=None):
    """Weak ETag for loadTable responses (open-api parameters/etag):
    committed metadata version N + table uuid + snapshots mode. Any
    metadata change (schema, properties, snapshots, refs) bumps N, so
    the tag is unique per metadata content; the mode suffix keeps
    `snapshots=all` and `snapshots=refs` representations distinct."""
    try:
        t = table if table is not None else catalog.load_table(ident)
        v = t.ops.current_version()
        if v is None:
            return None
        return f'W/"{t.metadata.table_uuid}-v{v}-{mode}"'
    except Exception:
        return None  # never fail a load over tag computation


def _load_table_result(catalog, ident: str,
                       snapshots_mode: str = "all", table=None) -> dict:
    """snapshots=refs (RESTSessionCatalog snapshot-loading-mode): serve
    only ref-reachable snapshots so huge-history tables don't ship their
    full snapshot list per load; the client lazily re-fetches with
    snapshots=all when it needs ancestors. The metadata-location and
    on-disk export always carry FULL history — only the served JSON
    payload is trimmed (CatalogHandlers semantics)."""
    from .sources.iceberg import export_reference_metadata

    t = table if table is not None else catalog.load_table(ident)
    snap = t.current_snapshot()
    tag = str(snap.snapshot_id) if snap else "empty"
    dest = os.path.join(t.location, "metadata-export", f"h{tag}")
    mpath = os.path.join(dest, "metadata", "v1.metadata.json")
    from . import io as _fio

    if not _fio.exists(mpath):
        # incremental re-export: hardlink-reuse the previous tree's
        # immutable per-snapshot manifests (deterministic names) so a
        # commit costs O(new snapshots), not O(history)
        prev_dir = None
        if len(t.metadata.snapshots) >= 2:
            cand = os.path.join(
                t.location, "metadata-export",
                f"h{t.metadata.snapshots[-2].snapshot_id}")
            if _fio.exists(os.path.join(cand, "metadata",
                                        "v1.metadata.json")):
                prev_dir = cand
        mpath = export_reference_metadata(t, dest, full_history=True,
                                          reuse_manifests_from=prev_dir)
        # GC superseded export trees: a high-churn table would otherwise
        # accumulate one FULL metadata tree per commit under
        # metadata-export/ (each loadTable after a commit re-exports).
        # Keep the current tree plus the previous one (in-flight readers
        # of the last-served metadata-location stay valid through one
        # commit; reference clients re-load on conflict anyway).
        base = os.path.join(t.location, "metadata-export")
        sids = {str(s.snapshot_id) for s in t.metadata.snapshots}
        keep = {f"h{tag}"}
        prev = (t.metadata.snapshots[-2].snapshot_id
                if len(t.metadata.snapshots) >= 2 else None)
        if prev is not None:
            keep.add(f"h{prev}")
        try:
            bio = _fio.resolve_io(base)
            for d in bio.list(base):
                if (d.startswith("h") and d not in keep
                        and (d[1:] in sids or d[1:] == "empty")):
                    bio.delete_dir(os.path.join(base, d))
        except Exception:
            pass  # GC is best-effort; serving must never fail on it
    md = json.loads(_fio.read_text(mpath))
    if snapshots_mode == "refs":
        keep = {r.get("snapshot-id")
                for r in (md.get("refs") or {}).values()}
        md = dict(md)
        md["snapshots"] = [sj for sj in md.get("snapshots", [])
                           if sj.get("snapshot-id") in keep]
        md["snapshot-log"] = [e for e in md.get("snapshot-log", [])
                              if e.get("snapshot-id") in keep]
    out = {"metadata-location": mpath, "metadata": md, "config": {}}
    creds = _storage_credentials(catalog, ident, t)
    if creds:
        out["storage-credentials"] = creds
    return out


def _storage_credentials(catalog, ident: str, t) -> list:
    """Vended storage credentials for a loadTable response (open-api
    LoadTableResult `storage-credentials`: [{prefix, config}]). Two
    sources, both optional:

    - a `credentials_provider` callable registered with serve():
      (ident, table) -> [{prefix, config}], the remote-signing/S3-keys
      analog for real object stores;
    - the table itself: `vended.credential.<conf-key>` properties pass
      through as FileIO config under the table-location prefix, and an
      encrypted table whose master key the SERVER can resolve vends it
      as `encryption.key.<key-id>` — the engine's decryption-credential
      analog, so a keyless client can read using ONLY what loadTable
      returned."""
    out = []
    provider = getattr(catalog, "_rest_credentials_provider", None)
    if provider is not None:
        try:
            out.extend(provider(ident, t) or [])
        except Exception:  # noqa: BLE001 — vending is best-effort
            pass
    props = t.metadata.properties or {}
    conf = {k[len("vended.credential."):]: v
            for k, v in props.items()
            if k.startswith("vended.credential.")}
    kid = props.get("encryption.key-id")
    if kid:
        try:
            from .parquet_crypto import resolve_key

            conf[f"encryption.key.{kid}"] = resolve_key(kid).hex()
        except Exception:  # noqa: BLE001 — server lacks the key: skip
            pass
    if conf:
        out.append({"prefix": t.location, "config": conf})
    return out


def _apply_schema_updates(t, add_schemas, set_cur_schema, add_specs,
                          set_def_spec, add_sorts=(), set_def_sort=None):
    """ALTER-TABLE-over-REST: add-schema / set-current-schema /
    add-spec / set-default-spec / add-sort-order /
    set-default-sort-order (the TableMetadata.Builder update shapes from
    rest-catalog-open-api.yaml). Client field ids are authoritative
    — commits carry fully-resolved schemas; `-1` means "last added"."""
    from dataclasses import replace

    from .schema import Schema
    from .sources.iceberg import _map_types, _parse_specs

    meta = t.metadata
    schemas = list(meta.schemas)
    last_added_schema = None
    for sj in add_schemas:
        s = Schema.from_json(_map_types(sj))
        schemas = [x for x in schemas if x.schema_id != s.schema_id]
        schemas.append(s)
        last_added_schema = s.schema_id
    cur = meta.current_schema_id
    if set_cur_schema is not None:
        cur = (last_added_schema if set_cur_schema == -1
               else set_cur_schema)
        if not any(x.schema_id == cur for x in schemas):
            raise ValueError(f"set-current-schema: unknown schema-id {cur}")

    sdict = {x.schema_id: x for x in schemas}
    specs = list(meta.partition_specs)
    last_added_spec = None
    for pj in add_specs:
        sid = pj.get("spec-id", 0)
        built, _ = _parse_specs(
            {"partition-specs": [pj], "default-spec-id": sid}, sdict, cur)
        sp = built[sid]
        specs = [x for x in specs if x.spec_id != sp.spec_id]
        specs.append(sp)
        last_added_spec = sp.spec_id
    dspec = meta.default_spec_id
    if set_def_spec is not None:
        dspec = last_added_spec if set_def_spec == -1 else set_def_spec
        if not any(x.spec_id == dspec for x in specs):
            raise ValueError(f"set-default-spec: unknown spec-id {dspec}")

    from .sources.iceberg import sort_order_from_json

    sorts = list(meta.sort_orders)
    last_added_sort = None
    for oj in add_sorts:
        so = sort_order_from_json(oj, sdict, cur)
        sorts = [x for x in sorts if x.order_id != so.order_id]
        sorts.append(so)
        last_added_sort = so.order_id
    dsort = meta.default_sort_order_id
    if set_def_sort is not None:
        dsort = last_added_sort if set_def_sort == -1 else set_def_sort
        if not any(x.order_id == dsort for x in sorts):
            raise ValueError(
                f"set-default-sort-order: unknown order-id {dsort}")

    t._commit_metadata(replace(
        meta,
        schemas=tuple(sorted(schemas, key=lambda x: x.schema_id)),
        current_schema_id=cur,
        last_column_id=max(
            [meta.last_column_id]
            + [s.highest_field_id() for s in schemas]),
        partition_specs=tuple(sorted(specs, key=lambda x: x.spec_id)),
        default_spec_id=dspec,
        last_partition_id=max(
            [meta.last_partition_id]
            + [f.field_id for sp in specs for f in sp.fields]),
        sort_orders=tuple(sorted(sorts, key=lambda x: x.order_id)),
        default_sort_order_id=dsort))
    return t.refresh()


def _view_result(catalog, ident: str) -> dict:
    """LoadViewResult: engine ViewMetadata -> view-spec JSON
    (format/view-spec.md — versions carry `representations`; the engine
    stores sql+dialect directly and expands here)."""
    import uuid as _uuid

    from .views import _path, load_view

    vm = load_view(catalog, ident)
    if vm is None:
        return None
    versions = [{
        "version-id": v.version_id,
        "timestamp-ms": v.timestamp_ms,
        "schema-id": 0,
        "summary": dict(v.summary),
        "representations": [{"type": "sql", "sql": v.sql,
                             "dialect": v.dialect}],
        "default-namespace": ident.split(".")[:-1],
    } for v in vm.versions]
    md = {
        # deterministic uuid: the engine view store has no uuid field
        "view-uuid": str(_uuid.uuid5(_uuid.NAMESPACE_URL,
                                     f"iceberg-spark-view:{ident}")),
        "format-version": 1,
        "location": _path(catalog, "_views", ident),
        "current-version-id": vm.current_version_id,
        "versions": versions,
        "version-log": [{"timestamp-ms": ts, "version-id": vid}
                        for ts, vid in vm.version_log],
        "schemas": [v.schema_json for v in vm.versions
                    if v.schema_json],
        "properties": dict(vm.properties),
    }
    return {"metadata-location": _path(catalog, "_views", ident),
            "metadata": md, "config": {}}


class _Handler(BaseHTTPRequestHandler):
    catalog = None  # injected by serve()
    staged = None  # per-server staged-create registry, injected by serve()
    plans = None  # per-server scan-plan store, injected by serve()
    credential = None  # "client_id:client_secret" -> auth required
    tokens = None  # issued bearer tokens, injected by serve()
    signing_credentials = None  # (ak, sk[, token]) -> /v1/aws/s3/sign
    signing_locations = None    # URI prefixes the signer may sign for

    def log_message(self, *a):  # silence default stderr access log
        pass

    def _auth_error(self):
        """OAuth2 bearer enforcement (rest-catalog-open-api.yaml
        securitySchemes; RESTSessionCatalog sends the token it obtained
        from /v1/oauth/tokens on every call). None when the server is
        unauthenticated or the bearer token is valid."""
        if self.credential is None:
            return None
        auth = self.headers.get("Authorization", "")
        tok = auth[7:] if auth.startswith("Bearer ") else None
        if tok and tok in self.tokens:
            return None
        return self._error(401, "missing or invalid bearer token",
                           "NotAuthorizedException")

    def _oauth_tokens(self):
        """POST /v1/oauth/tokens — client_credentials grant (the classic
        REST-spec token endpoint): form-encoded body, returns a bearer
        token the other endpoints accept."""
        from urllib.parse import parse_qs as _pq

        n = int(self.headers.get("Content-Length") or 0)
        form = _pq(self.rfile.read(n).decode("utf-8")) if n else {}

        def f(k):
            return (form.get(k) or [None])[0]

        if f("grant_type") != "client_credentials":
            return self._json(400, {
                "error": "unsupported_grant_type",
                "error_description": "only client_credentials"})
        cred = f"{f('client_id')}:{f('client_secret')}"
        if self.credential is None or cred != self.credential:
            return self._json(401, {
                "error": "invalid_client",
                "error_description": "unknown client id or secret"})
        import secrets as _secrets

        tok = _secrets.token_hex(16)
        self.tokens.add(tok)
        return self._json(200, {"access_token": tok,
                                "token_type": "bearer",
                                "expires_in": 3600})

    def _json(self, code: int, body: dict = None, headers: dict = None):
        data = b"" if code in (204, 304) else json.dumps(body or {}).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.end_headers()
        if self.command != "HEAD" and data:
            self.wfile.write(data)

    def _error(self, code: int, msg: str, etype: str):
        self._json(code, {"error": {"message": msg, "type": etype,
                                    "code": code}})

    def _page(self, items: list, key: str) -> dict:
        """pageToken/pageSize pagination on a sorted listing: the token
        is the integer offset (opaque to clients, per the spec)."""
        from urllib.parse import parse_qs

        q = parse_qs((self.path.split("?", 1) + [""])[1])
        start = int(q.get("pageToken", ["0"])[0] or 0)
        size = int(q.get("pageSize", ["0"])[0] or 0)
        if size <= 0:
            return {key: items}
        out = {key: items[start:start + size]}
        if start + size < len(items):
            out["next-page-token"] = str(start + size)
        return out

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
            from urllib.parse import parse_qs

            q = parse_qs((self.path.split("?", 1) + [""])[1])
            parent = q.get("parent", [None])[0]
            names = cat.list_namespaces()
            if parent is not None:
                # multipart parents arrive 0x1F-separated (the spec's
                # unit separator); children are exactly one level deeper
                pfx = parent.replace("\x1f", ".")
                if not cat.namespace_exists(pfx):
                    return self._error(
                        404, f"no such namespace: {pfx}",
                        "NoSuchNamespaceException")
                depth = pfx.count(".") + 2
                names = [ns for ns in names
                         if ns.startswith(pfx + ".")
                         and ns.count(".") + 1 == depth]
            return self._json(200, self._page(
                [ns.split(".") for ns in names], "namespaces"))
        if len(rest) == 2 and rest[0] == "namespaces":
            ns = rest[1].replace("\x1f", ".")
            if not cat.namespace_exists(ns):
                return self._error(404, f"no such namespace: {ns}",
                                   "NoSuchNamespaceException")
            return self._json(200, {"namespace": ns.split("."),
                                    "properties":
                                        cat.namespace_properties(ns)})
        if len(rest) == 3 and rest[0] == "namespaces" and rest[2] == "tables":
            ns = rest[1].replace("\x1f", ".")
            if not cat.namespace_exists(ns):
                return self._error(404, f"no such namespace: {ns}",
                                   "NoSuchNamespaceException")
            return self._json(200, self._page(
                [{"namespace": ns.split("."),
                  "name": ident.split(".")[-1]}
                 for ident in cat.list_tables(ns)], "identifiers"))
        if len(rest) == 5 and rest[0] == "namespaces" \
                and rest[2] == "tables" and rest[4] == "metrics":
            # engine extension: read back the reports the server received
            # (the reference hands them to a MetricsReporter; this
            # adapter's reporter is the queryable in-memory sink)
            from .metrics_reporting import SINK

            ident = f"{rest[1].replace(chr(31), '.')}.{rest[3]}"
            if not cat.table_exists(ident):
                return self._error(404, f"no such table: {ident}",
                                   "NoSuchTableException")
            return self._json(200, {"reports": SINK.reports(ident)})
        if len(rest) == 4 and rest[0] == "namespaces" and rest[2] == "tables":
            ns = rest[1].replace("\x1f", ".")
            ident = f"{ns}.{rest[3]}"
            if not cat.table_exists(ident):
                return self._error(404, f"no such table: {ident}",
                                   "NoSuchTableException")
            if self.command == "HEAD":
                return self._json(200)
            from urllib.parse import parse_qs

            q = parse_qs((self.path.split("?", 1) + [""])[1])
            mode = (q.get("snapshots", ["all"])[0] or "all").lower()
            if mode not in ("all", "refs"):
                return self._error(400, f"invalid snapshots mode: {mode}",
                                   "BadRequestException")
            # ETag / If-None-Match (open-api loadTable: 304 when the
            # client's tag is current). Tag = committed metadata version
            # + snapshots mode — same version, different `snapshots`
            # param must yield DISTINCT tags (open-api parameters/etag),
            # and the check never triggers the per-snapshot export.
            try:
                loaded = cat.load_table(ident)
            except Exception:
                loaded = None
            etag = (_table_etag(cat, ident, mode, table=loaded)
                    if loaded is not None else None)
            inm = self.headers.get("If-None-Match")
            if etag is not None and inm and etag in {
                    v.strip() for v in inm.split(",")}:
                return self._json(304, None, headers={"ETag": etag})
            try:
                return self._json(200, _load_table_result(
                    cat, ident, snapshots_mode=mode, table=loaded),
                    headers={"ETag": etag} if etag else None)
            except (NotImplementedError, ValueError) as e:
                # e.g. engine-encrypted data files (the reference layout
                # this endpoint serves cannot express them) or raw-DEK
                # tables a keyless catalog may not serve in plaintext —
                # a clean 422 beats a stack-trace 500
                return self._error(422, str(e)[:500],
                                   "UnprocessableEntityException")
        if len(rest) == 6 and rest[0] == "namespaces" \
                and rest[2] == "tables" and rest[4] == "plan":
            # FetchPlanningResult (ResourcePaths.java:46)
            from .rest_scan_planning import handle_fetch_planning_result

            res = handle_fetch_planning_result(self.plans, rest[5])
            if res is None:
                return self._error(404, f"no such plan: {rest[5]}",
                                   "NoSuchPlanIdException")
            return self._json(200, res)
        if len(rest) == 3 and rest[0] == "namespaces" and rest[2] == "views":
            ns = rest[1].replace("\x1f", ".")
            if not cat.namespace_exists(ns):
                return self._error(404, f"no such namespace: {ns}",
                                   "NoSuchNamespaceException")
            from .views import list_views

            return self._json(200, self._page(
                [{"namespace": v.split(".")[:-1],
                  "name": v.split(".")[-1]}
                 for v in list_views(cat)
                 if v.rsplit(".", 1)[0] == ns], "identifiers"))
        if len(rest) == 4 and rest[0] == "namespaces" and rest[2] == "views":
            ns = rest[1].replace("\x1f", ".")
            ident = f"{ns}.{rest[3]}"
            res = _view_result(cat, ident)
            if res is None:
                return self._error(404, f"no such view: {ident}",
                                   "NoSuchViewException")
            if self.command == "HEAD":
                return self._json(200)
            return self._json(200, res)
        return self._error(404, f"no such route: {self.path}",
                           "NoSuchRouteException")

    def do_GET(self):
        if self._auth_error() is not None:
            return
        try:
            self._route()
        except Exception as e:  # noqa: BLE001 — surface as a 500 payload
            self._error(500, str(e)[:500], type(e).__name__)

    do_HEAD = do_GET

    # -- write surface ------------------------------------------------------

    def _body(self) -> dict:
        n = int(self.headers.get("Content-Length") or 0)
        raw = self.rfile.read(n) if n else b""
        return json.loads(raw or b"{}")

    def _route_post(self):
        parts = [unquote(p) for p in self.path.split("?")[0].split("/")
                 if p]
        cat = self.catalog
        rest = parts[1:] if parts[:1] == ["v1"] else None
        if rest is None:
            return self._error(404, f"no such route: {self.path}",
                               "NoSuchRouteException")
        body = self._body()
        if rest == ["namespaces"]:
            ns = ".".join(body["namespace"])
            if cat.namespace_exists(ns):
                return self._error(
                    409, f"namespace exists: {ns}",
                    "AlreadyExistsException")
            cat.create_namespace(ns)
            return self._json(200, {"namespace": ns.split("."),
                                    "properties": body.get(
                                        "properties") or {}})
        if len(rest) == 3 and rest[0] == "namespaces" \
                and rest[2] == "properties":
            return self._update_ns_props(rest[1].replace("\x1f", "."), body)
        if len(rest) == 3 and rest[0] == "namespaces" \
                and rest[2] == "register":
            return self._register_table(rest[1].replace("\x1f", "."), body)
        if rest == ["views", "rename"]:
            return self._rename_view(body)
        if rest == ["aws", "s3", "sign"]:
            return self._sign_s3_request(body)
        if rest == ["transactions", "commit"]:
            return self._commit_transaction(body)
        if rest == ["tables", "rename"]:
            src = body["source"]
            dst = body["destination"]
            s_id = ".".join(src["namespace"] + [src["name"]])
            d_id = ".".join(dst["namespace"] + [dst["name"]])
            if not cat.table_exists(s_id):
                return self._error(404, f"no such table: {s_id}",
                                   "NoSuchTableException")
            if cat.table_exists(d_id):
                return self._error(409, f"table exists: {d_id}",
                                   "AlreadyExistsException")
            cat.rename_table(s_id, d_id)
            return self._json(200)
        if len(rest) == 3 and rest[0] == "namespaces" and rest[2] == "tables":
            return self._create_table(rest[1].replace("\x1f", "."), body)
        if len(rest) == 5 and rest[0] == "namespaces" \
                and rest[2] == "tables" and rest[4] == "metrics":
            # ReportMetricsRequest (core/.../rest/requests/
            # ReportMetricsRequest.java): parse, validate, forward to the
            # server's metrics sink keyed by the table identifier — the
            # reference catalog hands reports to its MetricsReporter the
            # same way. Unknown report types are accepted and dropped;
            # a missing report-type is a 400.
            from .metrics_reporting import (SINK,
                                            parse_report_metrics_request)

            ident = f"{rest[1].replace(chr(31), '.')}.{rest[3]}"
            if not cat.table_exists(ident):
                # reference: reportMetrics 404s unknown tables — also
                # keeps typo'd identifiers from allocating phantom sink
                # entries without bound
                return self._error(404, f"no such table: {ident}",
                                   "NoSuchTableException")
            try:
                rt, rep = parse_report_metrics_request(body)
            except ValueError as ex:
                return self._error(400, str(ex), "BadRequestException")
            if rt != "unknown":
                SINK.report(ident, rt, rep)
            return self._json(204)
        if len(rest) == 5 and rest[0] == "namespaces" \
                and rest[2] == "tables" and rest[4] == "plan":
            # server-side scan planning (ResourcePaths.java:44)
            return self._plan_table_scan(
                rest[1].replace("\x1f", "."), rest[3], body)
        if len(rest) == 5 and rest[0] == "namespaces" \
                and rest[2] == "tables" and rest[4] == "tasks":
            from .rest_scan_planning import handle_fetch_scan_tasks

            try:
                return self._json(200, handle_fetch_scan_tasks(
                    self.plans, body.get("plan-task")))
            except ValueError as e:
                return self._error(400, str(e)[:300], "BadRequestException")
            except KeyError:
                return self._error(404, "no such plan task",
                                   "NoSuchPlanTaskException")
        if len(rest) == 4 and rest[0] == "namespaces" and rest[2] == "tables":
            return self._commit_table(
                rest[1].replace("\x1f", "."), rest[3], body)
        if len(rest) == 3 and rest[0] == "namespaces" and rest[2] == "views":
            return self._create_view(rest[1].replace("\x1f", "."), body)
        if len(rest) == 4 and rest[0] == "namespaces" and rest[2] == "views":
            return self._commit_view(
                rest[1].replace("\x1f", "."), rest[3], body)
        return self._error(404, f"no such route: {self.path}",
                           "NoSuchRouteException")

    def _sign_s3_request(self, body: dict):
        """POST /v1/aws/s3/sign — remote request signing (reference
        aws/.../s3/signer/S3V4RestSignerClient.java +
        s3-signer-open-api.yaml): the client sends its intended S3
        request {region, uri, method, headers, body?}; the catalog
        signs it with SERVER-held credentials (never shipped to the
        client) and returns {uri, headers} carrying Authorization.
        Enable with serve(signing_credentials=(access_key, secret)).

        Confused-deputy guard: with serve(signing_locations=[...]) the
        request URI's path must fall under one of the allowed prefixes
        (boundary-safe match, like the reference signer service's
        allowed-locations validation) or the request is 403'd. Without
        an allowlist, any URI signs — acceptable ONLY because the
        server binds 127.0.0.1 (same trust domain as the caller); bind
        it wider and an allowlist becomes mandatory."""
        creds = self.signing_credentials
        if creds is None:
            return self._error(
                401, "remote signing is not enabled on this catalog",
                "NotAuthorizedException")
        for k in ("region", "uri", "method", "headers"):
            if k not in body:
                return self._error(400, f"missing field: {k}",
                                   "BadRequestException")
        allowed = self.signing_locations
        if allowed is not None:
            from urllib.parse import unquote, urlsplit

            from . import io as _io

            p = urlsplit(body["uri"])
            # bucket+path in wire-decoded form; strip_scheme collapses
            # s3://bkt/k and s3a://bkt/k to one comparable shape
            req = _io.strip_scheme(
                f"{p.scheme}://{p.netloc}{unquote(p.path)}")
            ok = any(req == a.rstrip("/") or
                     req.startswith(a.rstrip("/") + "/")
                     for a in (_io.strip_scheme(x) for x in allowed))
            if not ok:
                return self._error(
                    403, "request uri is outside the signer's allowed "
                    "locations", "ForbiddenException")
        from .sigv4 import sign

        raw = body.get("body")
        signed = sign(body["method"], body["uri"], body["headers"],
                      body["region"], "s3", creds[0], creds[1],
                      body=raw.encode() if isinstance(raw, str) else raw,
                      session_token=(creds[2] if len(creds) > 2
                                     else None))
        headers = {k: (v if isinstance(v, list) else [v])
                   for k, v in body["headers"].items()}
        headers.update(signed)
        return self._json(200, {"uri": body["uri"], "headers": headers})

    def _plan_table_scan(self, ns: str, name: str, body: dict):
        """PlanTableScanRequest -> PlanTableScanResponse: the engine's
        planner (manifest pruning + metrics eval + delete matching) runs
        server-side; small plans inline their file-scan-tasks (completed),
        big plans answer submitted + plan-id and stream plan-tasks shards
        (PlanTableScanResponseParser.java / FetchScanTasksResponse)."""
        from .rest_scan_planning import handle_plan_request

        cat = self.catalog
        ident = f"{ns}.{name}"
        if not cat.table_exists(ident):
            return self._error(404, f"no such table: {ident}",
                               "NoSuchTableException")
        try:
            return self._json(200, handle_plan_request(
                cat.load_table(ident), body, self.plans))
        except (ValueError, KeyError) as e:
            return self._error(400, str(e)[:300], "BadRequestException")
        except NotImplementedError as e:
            return self._error(422, str(e)[:300],
                               "UnprocessableEntityException")

    def _update_ns_props(self, ns: str, body: dict):
        """UpdateNamespacePropertiesRequest -> {updated, removed,
        missing} (open-api updateProperties)."""
        cat = self.catalog
        if not cat.namespace_exists(ns):
            return self._error(404, f"no such namespace: {ns}",
                               "NoSuchNamespaceException")
        try:
            upd, rem, missing = cat.update_namespace_properties(
                ns, body.get("updates") or {}, body.get("removals") or [])
        except ValueError as e:
            return self._error(400, str(e)[:300], "BadRequestException")
        return self._json(200, {"updated": upd, "removed": rem,
                                "missing": missing})

    def _register_table(self, ns: str, body: dict):
        """RegisterTableRequest: adopt an existing reference-layout table
        by its metadata-location — full-history Avro-manifest replay, files
        by reference (open-api registerTable)."""
        from .sources.iceberg import register_iceberg_table

        cat = self.catalog
        if not cat.namespace_exists(ns):
            return self._error(404, f"no such namespace: {ns}",
                               "NoSuchNamespaceException")
        ident = f"{ns}.{body['name']}"
        if cat.table_exists(ident):
            return self._error(409, f"table exists: {ident}",
                               "AlreadyExistsException")
        try:
            register_iceberg_table(cat, body["metadata-location"], ident)
        except FileNotFoundError as e:
            return self._error(404, str(e)[:500], "NoSuchTableException")
        except (ValueError, NotImplementedError) as e:
            return self._error(400, str(e)[:500], type(e).__name__)
        return self._json(200, _load_table_result(cat, ident))

    def _rename_view(self, body: dict):
        from .views import load_view, rename_view

        cat = self.catalog
        src, dst = body["source"], body["destination"]
        s_id = ".".join(src["namespace"] + [src["name"]])
        d_id = ".".join(dst["namespace"] + [dst["name"]])
        if load_view(cat, s_id) is None:
            return self._error(404, f"no such view: {s_id}",
                               "NoSuchViewException")
        if load_view(cat, d_id) is not None:
            return self._error(409, f"view exists: {d_id}",
                               "AlreadyExistsException")
        rename_view(cat, s_id, d_id)
        return self._json(200)

    def _commit_transaction(self, body: dict):
        """CommitTransactionRequest: multiple tables' requirements are ALL
        validated against current metadata before any change applies;
        application is then one atomic swap PER TABLE (each commit is a
        single CAS with requirements re-validated on retry — a concurrent
        writer landing between validate and apply surfaces as a 409 from
        the losing table, matching non-atomic multi-table semantics of
        file-based reference catalogs)."""
        cat = self.catalog
        staged = []
        for ch in body.get("table-changes") or []:
            ident_j = ch.get("identifier") or {}
            ident = ".".join(
                list(ident_j.get("namespace") or [])
                + [ident_j.get("name") or ""])
            if not cat.table_exists(ident):
                return self._error(404, f"no such table: {ident}",
                                   "NoSuchTableException")
            t = cat.load_table(ident)
            err = self._requirements_error(
                t.metadata, ch.get("requirements"), ident)
            if err is not None:
                return self._error(*err)
            staged.append((ident, ch.get("requirements"),
                           ch.get("updates") or []))
        for ident, reqs, updates in staged:
            err = self._commit_atomic(ident, reqs, updates)
            if err is not None:
                code, msg, etype = err
                return self._error(code, f"{ident}: {msg[:400]}", etype)
        return self._json(204)

    def _create_table(self, ns: str, body: dict):
        from .schema import Schema
        from .sources.iceberg import _map_types, _parse_specs

        cat = self.catalog
        if not cat.namespace_exists(ns):
            return self._error(404, f"no such namespace: {ns}",
                               "NoSuchNamespaceException")
        ident = f"{ns}.{body['name']}"
        if cat.table_exists(ident):
            return self._error(409, f"table exists: {ident}",
                               "AlreadyExistsException")
        if body.get("stage-create"):
            # staged creation: nothing lands in the catalog; the table
            # materializes when a commit with assert-create arrives
            # (CatalogHandlers.stageTableCreate -> updateTable flow).
            # Re-staging overwrites the pending definition.
            import uuid as _uuid

            staged_uuid = (self.staged.get(ident) or {}).get(
                "uuid", str(_uuid.uuid4()))
            self.staged[ident] = {"body": body, "uuid": staged_uuid}
            Schema.from_json(_map_types(body["schema"]))  # validate early
            return self._json(200, {"metadata": {
                "format-version": 2,
                "table-uuid": staged_uuid,
                "schemas": [body["schema"]],
                "current-schema-id": body["schema"].get("schema-id", 0),
                "partition-specs": [body.get("partition-spec")
                                    or {"spec-id": 0, "fields": []}],
                "default-spec-id": (body.get("partition-spec")
                                    or {}).get("spec-id", 0),
                "properties": body.get("properties") or {},
                "snapshots": [],
            }})
        schema = Schema.from_json(_map_types(body["schema"]))
        spec_json = body.get("partition-spec") or {"spec-id": 0,
                                                   "fields": []}
        specs, default = _parse_specs(
            {"partition-specs": [spec_json],
             "default-spec-id": spec_json.get("spec-id", 0)},
            {schema.schema_id: schema}, schema.schema_id)
        try:
            cat.create_table(ident, schema, partition_by=specs[default],
                             properties=body.get("properties") or None)
        except ValueError as e:  # lost a concurrent-create race
            return self._error(409, str(e)[:300],
                               "AlreadyExistsException")
        return self._json(200, _load_table_result(cat, ident))

    def _commit_table(self, ns: str, tbl: str, body: dict):
        cat = self.catalog
        ident = f"{ns}.{tbl}"
        if not cat.table_exists(ident):
            if ident in (self.staged or {}):
                return self._commit_staged(ident, body)
            return self._error(404, f"no such table: {ident}",
                               "NoSuchTableException")
        err = self._commit_atomic(ident, body.get("requirements"),
                                  body.get("updates") or [])
        if err is not None:
            return self._error(*err)
        return self._json(200, _load_table_result(cat, ident))

    def _commit_atomic(self, ident: str, reqs, updates):
        """Apply a whole CommitTableRequest as ONE metadata swap
        (core/.../rest/CatalogHandlers.java commit → TableMetadata build
        + single CAS): every update lands on an in-memory shadow table,
        then the real pointer CAS-advances once. Requirements re-validate
        inside the retry loop, so a lost race re-checks before the
        updates re-apply, and a mid-apply failure publishes nothing —
        a client retry of the same request sees either the pre-commit
        state (apply failed) or a clean requirement 409 (it landed).
        Returns an (code, msg, etype) error tuple or None on success."""
        from .metadata import CommitFailedException
        from .table import Table, _TxnOps

        cat = self.catalog
        last = None
        for _ in range(5):
            t = cat.load_table(ident)
            err = self._requirements_error(t.metadata, reqs, ident)
            if err is not None:
                return err
            base_version = t.ops.current_version()
            real_ops = t.ops
            shadow = Table(t.spark, t.location, t.metadata, t.identifier)
            shadow.ops = _TxnOps(t.metadata)
            # manifests the shadow writes are the PUBLISHED ones (no
            # replay at CAS time): an encrypted table's policy must ride
            # along or a REST commit would emit plaintext manifests
            shadow.ops.metadata_key = getattr(real_ops, "metadata_key",
                                              None)
            try:
                self._apply_table_updates(shadow, updates)
            except (NotImplementedError, ValueError) as e:
                return (400, str(e)[:500], type(e).__name__)
            try:
                real_ops.commit(base_version, shadow.ops.refresh())
                return None
            except CommitFailedException as e:
                last = e  # concurrent commit won: refresh + re-validate
                continue
        return (409, str(last)[:500], "CommitFailedException")

    def _commit_staged(self, ident: str, body: dict):
        """First commit against a staged create: materialize the table
        (assert-create holds by construction — it does not exist), then
        apply the commit's updates. Other assert-* requirements cannot
        hold against a table with no metadata yet -> 409."""
        from .schema import Schema
        from .sources.iceberg import _map_types, _parse_specs

        cat = self.catalog
        for r in body.get("requirements") or []:
            if r.get("type") != "assert-create":
                return self._error(
                    409, f"requirement failed: staged table {ident} has "
                    f"no current metadata for {r.get('type')}",
                    "CommitFailedException")
        sb = self.staged[ident]["body"]
        schema = Schema.from_json(_map_types(sb["schema"]))
        spec_json = sb.get("partition-spec") or {"spec-id": 0, "fields": []}
        specs, default = _parse_specs(
            {"partition-specs": [spec_json],
             "default-spec-id": spec_json.get("spec-id", 0)},
            {schema.schema_id: schema}, schema.schema_id)
        try:
            cat.create_table(ident, schema,
                             partition_by=specs[default],
                             properties=sb.get("properties") or None)
        except ValueError as e:  # lost the create race after staging
            return self._error(409, str(e)[:300], "AlreadyExistsException")
        # the create materialized an empty table; the request's updates
        # land as one further swap (requirements already held: assert-create)
        err = self._commit_atomic(ident, None, body.get("updates") or [])
        if err is not None:
            return self._error(*err)
        del self.staged[ident]
        return self._json(200, _load_table_result(cat, ident))

    @staticmethod
    def _requirements_error(meta, reqs, ident):
        """Validate CommitTableRequest requirements against the CURRENT
        metadata; returns (code, msg, etype) on the first failure, None
        when all hold."""
        for r in reqs or []:
            ty = r.get("type")
            if ty == "assert-ref-snapshot-id":
                name = r.get("ref", "main")
                ref = meta.refs.get(name)
                have = ref.snapshot_id if ref else None
                want = r.get("snapshot-id")
                if want != have:
                    return (
                        409, f"requirement failed: ref {name} is at "
                        f"{have}, expected {want}",
                        "CommitFailedException")
            elif ty == "assert-table-uuid":
                if r.get("uuid") != meta.table_uuid:
                    return (
                        409, f"requirement failed: table uuid is "
                        f"{meta.table_uuid}, expected {r.get('uuid')}",
                        "CommitFailedException")
            elif ty == "assert-create":
                return (
                    409, f"requirement failed: table exists: {ident}",
                    "CommitFailedException")
            elif ty == "assert-current-schema-id":
                if r.get("current-schema-id") != meta.current_schema_id:
                    return (
                        409, "requirement failed: current schema id is "
                        f"{meta.current_schema_id}, expected "
                        f"{r.get('current-schema-id')}",
                        "CommitFailedException")
            elif ty == "assert-default-spec-id":
                if r.get("default-spec-id") != meta.default_spec_id:
                    return (
                        409, "requirement failed: default spec id is "
                        f"{meta.default_spec_id}, expected "
                        f"{r.get('default-spec-id')}",
                        "CommitFailedException")
            elif ty == "assert-last-assigned-field-id":
                if r.get("last-assigned-field-id") != meta.last_column_id:
                    return (
                        409, "requirement failed: last column id is "
                        f"{meta.last_column_id}, expected "
                        f"{r.get('last-assigned-field-id')}",
                        "CommitFailedException")
            elif ty == "assert-last-assigned-partition-id":
                if r.get("last-assigned-partition-id") != \
                        meta.last_partition_id:
                    return (
                        409, "requirement failed: last partition id is "
                        f"{meta.last_partition_id}, expected "
                        f"{r.get('last-assigned-partition-id')}",
                        "CommitFailedException")
            elif ty == "assert-default-sort-order-id":
                if r.get("default-sort-order-id") != \
                        meta.default_sort_order_id:
                    return (
                        409, "requirement failed: default sort order id "
                        f"is {meta.default_sort_order_id}, expected "
                        f"{r.get('default-sort-order-id')}",
                        "CommitFailedException")
            else:
                return (
                    400, f"unsupported requirement type: {ty}",
                    "BadRequestException")
        return None

    def _apply_table_updates(self, t, updates):
        """Apply CommitTableRequest updates to a loaded table; raises
        CommitFailedException (CAS loss) or ValueError/NotImplementedError
        (bad request) — callers map those to 409/400."""
        from dataclasses import replace

        from .sources.iceberg import replay_snapshot_onto

        cat = self.catalog
        set_props, rm_props, snaps, ref_sets = {}, [], [], []
        add_schemas, set_cur_schema = [], None
        add_specs, set_def_spec = [], None
        add_sorts, set_def_sort = [], None
        rm_refs, key_updates = [], []
        rm_schema_ids, rm_spec_ids = [], []
        for u in updates:
            a = u.get("action")
            if a == "set-properties":
                set_props.update(u.get("updates") or {})
            elif a == "remove-properties":
                rm_props += list(u.get("removals") or [])
            elif a == "add-snapshot":
                snaps.append(u["snapshot"])
            elif a == "set-snapshot-ref":
                ref_sets.append(u)
            elif a == "add-encryption-key":
                # MetadataUpdateParser.java ADD_ENCRYPTION_KEY /
                # EncryptedKeyParser.java shape
                k = u["encryption-key"]
                if not (k.get("key-id")
                        and k.get("encrypted-key-metadata")):
                    raise ValueError(
                        "add-encryption-key requires key-id and "
                        "encrypted-key-metadata")
                key_updates.append(("add", dict(k)))
            elif a == "remove-encryption-key":
                key_updates.append(("rm", u["key-id"]))
            elif a == "add-schema":
                add_schemas.append(u["schema"])
            elif a == "set-current-schema":
                set_cur_schema = u["schema-id"]
            elif a == "add-spec":
                add_specs.append(u["spec"])
            elif a == "set-default-spec":
                set_def_spec = u["spec-id"]
            elif a == "add-sort-order":
                add_sorts.append(u["sort-order"])
            elif a == "set-default-sort-order":
                set_def_sort = u["sort-order-id"]
            elif a == "remove-snapshot-ref":
                rm_refs.append(u["ref-name"])
            elif a == "remove-schemas":
                # MetadataUpdateParser.java REMOVE_SCHEMAS / SCHEMA_IDS
                rm_schema_ids += [int(i) for i in (u.get("schema-ids") or [])]
            elif a == "remove-partition-specs":
                rm_spec_ids += [int(i) for i in (u.get("spec-ids") or [])]
            else:
                raise ValueError(f"unsupported update action: {a}")
        if add_schemas or set_cur_schema is not None \
                or add_specs or set_def_spec is not None \
                or add_sorts or set_def_sort is not None:
            t = _apply_schema_updates(
                t, add_schemas, set_cur_schema, add_specs,
                set_def_spec, add_sorts, set_def_sort)
        if rm_schema_ids or rm_spec_ids:
            # expire-snapshots cleanExpiredMetadata commits land as these
            # two actions. The server re-derives reachability itself
            # rather than trusting the client's walk: a removed-but-still-
            # referenced id would break every later read of this table
            from .maintenance import reachable_metadata_ids
            from .metadata_df import unique_manifests

            md = t.metadata
            live_specs, live_schemas = reachable_metadata_ids(
                md, md.snapshots, unique_manifests(md.snapshots))
            bad_s = sorted(set(rm_schema_ids) & live_schemas)
            bad_p = sorted(set(rm_spec_ids) & live_specs)
            if bad_s:
                raise ValueError(
                    f"cannot remove schema ids {bad_s}: still reachable "
                    "from retained snapshots or live data files")
            if bad_p:
                raise ValueError(
                    f"cannot remove spec ids {bad_p}: still referenced "
                    "by retained manifests")
            t._commit_metadata(replace(
                md,
                schemas=tuple(s for s in md.schemas
                              if s.schema_id not in set(rm_schema_ids)),
                partition_specs=tuple(
                    s for s in md.partition_specs
                    if s.spec_id not in set(rm_spec_ids))))
            t = t.refresh()
        if key_updates:
            # key chain lands BEFORE snapshot replay so an encrypted
            # manifest list committed in the same request resolves its
            # key-id through the just-added entries. Add/remove apply in
            # REQUEST ORDER (MetadataUpdate semantics): an add followed
            # by a remove of the same id nets out.
            from dataclasses import replace as _rep

            chain = list(t.metadata.encryption_keys)
            for op, v in key_updates:
                if op == "add":
                    if v["key-id"] not in {k.get("key-id")
                                           for k in chain}:
                        chain.append(v)
                else:
                    chain = [k for k in chain if k.get("key-id") != v]
            t._commit_metadata(_rep(t.metadata,
                                    encryption_keys=tuple(chain)))
            t = t.refresh()
        added_ids = set()
        for sj in snaps:
            sid = int(sj["snapshot-id"])
            branch = next(
                (rs.get("ref-name", "main") for rs in ref_sets
                 if rs.get("snapshot-id") == sid), "main")
            replay_snapshot_onto(
                cat, t, sj, branch=branch,
                metadata_key=getattr(cat, "metadata_key", None))
            t = t.refresh()
            added_ids.add(sid)
        for rs in ref_sets:  # pure ref moves (rollback, tag, branch)
            sid = rs.get("snapshot-id")
            if sid in added_ids:
                continue  # the replay commit already advanced this ref
            ms = t.manage_snapshots()  # ops commit immediately
            if rs.get("type") == "tag":
                ms.create_tag(rs["ref-name"], sid)
            elif rs.get("ref-name", "main") == "main":
                ms.set_current_snapshot(sid)
            else:
                ms.create_branch(rs["ref-name"], sid)
            t = t.refresh()
        for name in rm_refs:
            t.manage_snapshots().remove_ref(name)
            t = t.refresh()
        if set_props or rm_props:
            props = {k: v for k, v in t.metadata.properties.items()
                     if k not in set(rm_props)}
            props.update({k: str(v) for k, v in set_props.items()})
            t._commit_metadata(replace(t.metadata, properties=props))

    @staticmethod
    def _version_sql(vv: dict):
        """Pull (sql, dialect) out of a view-version's representations."""
        reps = [r for r in vv.get("representations", [])
                if r.get("type") == "sql"]
        if not reps:
            raise ValueError("view-version has no sql representation")
        return reps[0]["sql"], reps[0].get("dialect", "spark")

    def _create_view(self, ns: str, body: dict):
        from .views import create_view, load_view

        cat = self.catalog
        if not cat.namespace_exists(ns):
            return self._error(404, f"no such namespace: {ns}",
                               "NoSuchNamespaceException")
        ident = f"{ns}.{body['name']}"
        if load_view(cat, ident) is not None:
            return self._error(409, f"view exists: {ident}",
                               "AlreadyExistsException")
        sql, dialect = self._version_sql(body["view-version"])
        create_view(cat, ident, sql, dialect=dialect,
                    properties=body.get("properties") or None,
                    schema_json=body.get("schema"))
        return self._json(200, _view_result(cat, ident))

    def _commit_view(self, ns: str, view: str, body: dict):
        """UpdateViewRequest: add-view-version + set-current-view-version
        (the replace-view flow) and set/remove-properties."""
        from .views import _store, load_view

        cat = self.catalog
        ident = f"{ns}.{view}"
        vm = load_view(cat, ident)
        if vm is None:
            return self._error(404, f"no such view: {ident}",
                               "NoSuchViewException")
        add_versions, set_current = [], None
        set_props, rm_props = {}, []
        for u in body.get("updates") or []:
            a = u.get("action")
            if a == "add-view-version":
                add_versions.append(u["view-version"])
            elif a == "set-current-view-version":
                set_current = u["view-version-id"]
            elif a == "set-properties":
                set_props.update(u.get("updates") or {})
            elif a == "remove-properties":
                rm_props += list(u.get("removals") or [])
            elif a == "assign-uuid":
                pass  # uuid is derived deterministically from the ident
            else:
                return self._error(
                    400, f"unsupported view update action: {a}",
                    "BadRequestException")
        try:
            from .views import create_view

            for vv in add_versions:
                sql, dialect = self._version_sql(vv)
                create_view(cat, ident, sql, replace=True,
                            dialect=dialect, schema_json=vv.get("schema"))
            vm = load_view(cat, ident)
            if set_current is not None and set_current != -1:
                if not any(v.version_id == set_current
                           for v in vm.versions):
                    raise ValueError(
                        f"unknown view version: {set_current}")
                from dataclasses import replace as _rep

                vm = _rep(vm, current_version_id=set_current)
            if set_props or rm_props:
                props = {k: v for k, v in vm.properties.items()
                         if k not in set(rm_props)}
                props.update({k: str(v) for k, v in set_props.items()})
                from dataclasses import replace as _rep

                vm = _rep(vm, properties=props)
            _store(cat, "_views", ident, vm.to_json())
        except ValueError as e:
            return self._error(400, str(e)[:500], "BadRequestException")
        return self._json(200, _view_result(cat, ident))

    def _route_delete(self):
        parts = [unquote(p) for p in self.path.split("?")[0].split("/")
                 if p]
        query = (self.path.split("?", 1) + [""])[1]
        cat = self.catalog
        rest = parts[1:] if parts[:1] == ["v1"] else None
        if rest and len(rest) == 2 and rest[0] == "namespaces":
            ns = rest[1].replace("\x1f", ".")
            if not cat.namespace_exists(ns):
                return self._error(404, f"no such namespace: {ns}",
                                   "NoSuchNamespaceException")
            try:
                cat.drop_namespace(ns)
            except ValueError as e:
                return self._error(409, str(e),
                                   "NamespaceNotEmptyException")
            return self._json(204)
        if rest and len(rest) == 4 and rest[0] == "namespaces" \
                and rest[2] == "tables":
            ident = f"{rest[1].replace(chr(31), '.')}.{rest[3]}"
            if not cat.table_exists(ident):
                return self._error(404, f"no such table: {ident}",
                                   "NoSuchTableException")
            cat.drop_table(ident,
                           purge="purgeRequested=true" in query)
            return self._json(204)
        if rest and len(rest) == 6 and rest[0] == "namespaces" \
                and rest[2] == "tables" and rest[4] == "plan":
            # cancel a submitted plan (ResourcePaths.java:46, DELETE)
            if not self.plans.cancel(rest[5]):
                return self._error(404, f"no such plan: {rest[5]}",
                                   "NoSuchPlanIdException")
            return self._json(204)
        if rest and len(rest) == 4 and rest[0] == "namespaces" \
                and rest[2] == "views":
            from .views import drop_view

            ident = f"{rest[1].replace(chr(31), '.')}.{rest[3]}"
            if not drop_view(self.catalog, ident):
                return self._error(404, f"no such view: {ident}",
                                   "NoSuchViewException")
            return self._json(204)
        return self._error(404, f"no such route: {self.path}",
                           "NoSuchRouteException")

    def do_POST(self):
        if self.path.split("?")[0] == "/v1/oauth/tokens":
            return self._oauth_tokens()
        if self._auth_error() is not None:
            return
        try:
            self._route_post()
        except (KeyError, TypeError) as e:
            # malformed request body (missing/mistyped field) -> 400, the
            # open-api BadRequestException, not a server error
            self._error(400, f"malformed request: {str(e)[:300]}",
                        "BadRequestException")
        except json.JSONDecodeError as e:
            self._error(400, f"invalid JSON body: {str(e)[:300]}",
                        "BadRequestException")
        except Exception as e:  # noqa: BLE001 — surface as a 500 payload
            self._error(500, str(e)[:500], type(e).__name__)

    def do_DELETE(self):
        if self._auth_error() is not None:
            return
        try:
            self._route_delete()
        except Exception as e:  # noqa: BLE001
            self._error(500, str(e)[:500], type(e).__name__)

    def do_PUT(self):
        self._error(405, "PUT is not part of the supported surface",
                    "UnsupportedOperationException")


def serve(catalog, port: int = 0, credential: str = None,
          credentials_provider=None, signing_credentials=None,
          signing_locations=None):
    """Start the adapter on localhost; returns (server, port). Call
    `server.shutdown()` to stop. Requests run in daemon threads.
    `credential` ("client_id:client_secret") turns on OAuth2: clients
    obtain a bearer token from POST /v1/oauth/tokens
    (client_credentials grant) and every other endpoint requires it.
    `credentials_provider` ((ident, table) -> [{prefix, config}])
    vends storage credentials on loadTable responses;
    `signing_credentials` ((access_key, secret[, session_token]))
    enables POST /v1/aws/s3/sign remote request signing;
    `signing_locations` (list of URI prefixes) restricts what the
    signer will sign — requests outside them are 403'd (see
    _sign_s3_request's confused-deputy note)."""
    from .rest_scan_planning import PlanStore

    if credentials_provider is not None:
        # ride the catalog object: _load_table_result sees only it
        catalog._rest_credentials_provider = credentials_provider
    handler = type("Handler", (_Handler,),
                   {"catalog": catalog, "staged": {}, "plans": PlanStore(),
                    "credential": credential, "tokens": set(),
                    "signing_credentials": signing_credentials,
                    "signing_locations": signing_locations})
    srv = ThreadingHTTPServer(("127.0.0.1", port), handler)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    return srv, srv.server_address[1]
