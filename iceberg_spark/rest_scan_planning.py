"""REST server-side scan planning — the `plan` / `plan-tasks` protocol.

Implements the reference's REST scan-planning surface
(core/.../rest/requests/PlanTableScanRequestParser.java,
core/.../rest/responses/PlanTableScanResponseParser.java,
core/.../rest/RESTFileScanTaskParser.java, core/.../ContentFileParser.java,
core/.../rest/ResourcePaths.java:44-48): a REST client submits a filter +
projection, the SERVER plans the scan with the engine's planner (manifest
pruning, metrics evaluation, delete matching) and returns FileScanTasks as
JSON. At 100 TB this moves metadata I/O next to the metadata: one planner
with hot manifest caches serves every client, and big plans ship as
`plan-tasks` shards so no single response materializes a million tasks.

Wire shapes follow the parsers above:
- expression JSON: {"type": "eq", "term": "col", "value": v},
  {"type": "and", "left": ..., "right": ...}, transforms as
  {"type": "transform", "transform": "bucket[16]", "term": "col"}
- content-file JSON: spec-id / content (kebab) / file-path / file-format
  (lower) / partition (array, spec field order) / record-count /
  file-size-in-bytes / equality-ids / sort-order-id / first-row-id /
  referenced-data-file / content-offset / content-size-in-bytes;
  key-metadata and binary bounds serialize as base16 per SingleValueParser
- file-scan-task JSON: {"data-file": ..., "delete-file-references": [i],
  "residual-filter": ...} with delete files deduped into a top-level
  "delete-files" array referenced by index
"""

from __future__ import annotations

import datetime as _dt
import threading
import uuid as _uuid

from . import expressions as E
from .manifests import DATA, EQUALITY_DELETES, POSITION_DELETES

# ops: engine constants use underscores; the spec's JSON uses kebab-case
_UNARY = {E.IS_NULL, E.NOT_NULL, E.IS_NAN, E.NOT_NAN}
_SET = {E.IN, E.NOT_IN}

# tasks per plan-tasks shard; plans at or under ONE shard inline their
# tasks in the initial response (completed), bigger plans go async
# (submitted + plan-id) so a million-file plan streams shard by shard
PLAN_SHARD_TASKS = 200


# -- expression JSON <-> engine Expr ----------------------------------------


def expr_to_rest_json(e: E.Expr):
    """Engine Expr -> ExpressionParser.java JSON."""
    if isinstance(e, E.AlwaysTrue):
        return True
    if isinstance(e, E.AlwaysFalse):
        return False
    if isinstance(e, E.And):
        return {"type": "and", "left": expr_to_rest_json(e.left),
                "right": expr_to_rest_json(e.right)}
    if isinstance(e, E.Or):
        return {"type": "or", "left": expr_to_rest_json(e.left),
                "right": expr_to_rest_json(e.right)}
    if isinstance(e, E.Not):
        return {"type": "not", "child": expr_to_rest_json(e.child)}
    if isinstance(e, E.Predicate):
        term = e.term.name
        if e.term.transform is not None:
            term = {"type": "transform",
                    "transform": e.term.transform.to_str(),
                    "term": e.term.name}
        out = {"type": e.op.replace("_", "-"), "term": term}
        if e.op in _SET:
            out["values"] = [_lit_to_json(v) for v in e.literals]
        elif e.op not in _UNARY:
            out["value"] = _lit_to_json(e.literal)
        return out
    raise ValueError(f"cannot serialize expression: {e!r}")


def _lit_to_json(v):
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex().upper()  # SingleValueParser base16
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    return v


def expr_from_rest_json(j) -> E.Expr:
    """ExpressionParser.java JSON -> engine Expr. Literal values stay as
    parsed JSON scalars; the engine's bind() coerces them against the
    schema (dates/timestamps arrive as ISO strings per SingleValueParser
    and coerce_literal handles those)."""
    if j is True:
        return E.ALWAYS_TRUE
    if j is False:
        return E.ALWAYS_FALSE
    if not isinstance(j, dict):
        raise ValueError(f"cannot parse expression from: {j!r}")
    ty = str(j["type"]).lower()
    if ty == "literal":  # {"type": "literal", "value": true|false}
        return E.ALWAYS_TRUE if j.get("value") else E.ALWAYS_FALSE
    if ty in ("true", "alwaystrue", "always-true"):
        return E.ALWAYS_TRUE
    if ty in ("false", "alwaysfalse", "always-false"):
        return E.ALWAYS_FALSE
    if ty == "and":
        return E.and_(expr_from_rest_json(j["left"]),
                      expr_from_rest_json(j["right"]))
    if ty == "or":
        return E.or_(expr_from_rest_json(j["left"]),
                     expr_from_rest_json(j["right"]))
    if ty == "not":
        return E.not_(expr_from_rest_json(j["child"]))
    op = ty.replace("-", "_")
    if op not in (E.LT, E.LT_EQ, E.GT, E.GT_EQ, E.EQ, E.NOT_EQ, E.IN,
                  E.NOT_IN, E.IS_NULL, E.NOT_NULL, E.IS_NAN, E.NOT_NAN,
                  E.STARTS_WITH, E.NOT_STARTS_WITH):
        raise ValueError(f"unsupported expression type: {ty}")
    term = j["term"]
    if isinstance(term, dict):
        if str(term.get("type", "")).lower() != "transform":
            raise ValueError(f"unsupported term: {term}")
        from .transforms import parse_transform

        # reference transform.toString() is bracket-form (bucket[16]);
        # parse_transform takes parens
        ts = str(term["transform"]).replace("[", "(").replace("]", ")")
        eterm = E.Term(term["term"], parse_transform(ts))
    else:
        eterm = E.Term(str(term))
    if op in _UNARY:
        return E.Predicate(op, eterm)
    if op in _SET:
        return E.Predicate(op, eterm, tuple(j.get("values") or ()))
    return E.Predicate(op, eterm, (j["value"],))


# -- content-file / file-scan-task JSON --------------------------------------

_CONTENT_NAME = {DATA: "data", POSITION_DELETES: "position-deletes",
                 EQUALITY_DELETES: "equality-deletes"}


def _value_to_json(v):
    if v is None:
        return None
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex().upper()
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    return v


def content_file_to_json(f, spec, schema) -> dict:
    """Engine DataFile -> ContentFileParser.java JSON. Partition values
    serialize as an ARRAY in spec-field order (ContentFileParser.java:302).
    Decoded per-column stats become the field-id-keyed count maps; typed
    bounds are omitted (optional per the parser) — the engine's stats are
    already-decoded values, and planning happened server-side."""
    out = {
        "spec-id": f.spec_id,
        "content": _CONTENT_NAME[f.content],
        "file-path": f.file_path,
        "file-format": f.file_format.lower(),
        "file-size-in-bytes": f.file_size_in_bytes,
        "record-count": f.record_count,
    }
    if spec.fields:
        out["partition"] = [_value_to_json(f.partition.get(pf.name))
                            for pf in spec.fields]
    if f.stats:
        vc, nc, nanc = {}, {}, {}
        for name, (mn, mx, nulls, nans, values) in f.stats.items():
            try:
                fid = schema.find_field(name).field_id
            except KeyError:
                continue
            if values is not None:
                vc[str(fid)] = values
            if nulls is not None:
                nc[str(fid)] = nulls
            if nans is not None:
                nanc[str(fid)] = nans
        if vc:
            out["value-counts"] = vc
        if nc:
            out["null-value-counts"] = nc
        if nanc:
            out["nan-value-counts"] = nanc
    if f.equality_ids:
        out["equality-ids"] = list(f.equality_ids)
    if f.sort_order_id is not None:
        out["sort-order-id"] = f.sort_order_id
    if f.first_row_id is not None:
        out["first-row-id"] = f.first_row_id
    if f.key_metadata is not None:
        out["key-metadata"] = bytes(f.key_metadata).hex().upper()
    if f.referenced_data_file is not None:
        out["referenced-data-file"] = f.referenced_data_file
    if f.content_offset is not None:
        out["content-offset"] = f.content_offset
    if f.content_size_in_bytes is not None:
        out["content-size-in-bytes"] = f.content_size_in_bytes
    return out


def _delete_applies(d, f) -> bool:
    """Reference DeleteFileIndex semantics (core/.../DeleteFileIndex.java):
    pos deletes / DVs apply at data-seq <= delete-seq, scoped to the
    referenced data file when recorded, else to the same partition (or
    globally when written under an unpartitioned spec); eq deletes apply
    strictly AFTER the data file's sequence, same partition scoping."""
    df, ff = d.file, f.file
    if df.content == POSITION_DELETES:
        if d.sequence_number < f.sequence_number:
            return False
        if df.referenced_data_file is not None:
            return df.referenced_data_file == ff.file_path
        # path-bounds pruning: a pos-delete parquet whose file_path column
        # bounds exclude this data file can never hit it (the engine's
        # stats collector writes an upper bound >= every value, so plain
        # range containment is safe even for truncated bounds)
        fp = df.stats.get("file_path")
        if fp and fp[0] is not None and fp[1] is not None:
            if not (fp[0] <= ff.file_path <= fp[1]):
                return False
    else:
        if d.sequence_number <= f.sequence_number:
            return False
    if not df.partition:  # unpartitioned delete: global
        return True
    return df.spec_id == ff.spec_id and df.partition == ff.partition


def plan_to_tasks(plan, metadata, request_filter: E.Expr) -> tuple:
    """ScanPlan -> (file_scan_tasks, delete_files) in wire JSON. The
    residual on every task is the full request filter — the conservative
    legal residual (the engine re-applies the filter after MoR merges, so
    clients must too)."""
    schema = metadata.schema
    specs = {s.spec_id: s for s in metadata.partition_specs}
    residual = (expr_to_rest_json(request_filter)
                if not isinstance(request_filter, E.AlwaysTrue) else None)
    deletes = list(plan.pos_deletes) + list(plan.eq_deletes)
    delete_json, del_index = [], {}
    for d in deletes:
        del_index[d.file.file_path] = len(delete_json)
        delete_json.append(content_file_to_json(
            d.file, specs[d.file.spec_id], schema))
    tasks = []
    for e in plan.files:
        task = {"data-file": content_file_to_json(
            e.file, specs[e.file.spec_id], schema)}
        refs = [del_index[d.file.file_path] for d in deletes
                if _delete_applies(d, e)]
        if refs:
            task["delete-file-references"] = refs
        if residual is not None:
            task["residual-filter"] = residual
        tasks.append(task)
    # only deletes some task references survive the response
    used = sorted({i for t in tasks for i in t.get("delete-file-references", ())})
    if len(used) != len(delete_json):
        remap = {old: new for new, old in enumerate(used)}
        delete_json = [delete_json[i] for i in used]
        for t in tasks:
            if "delete-file-references" in t:
                t["delete-file-references"] = [
                    remap[i] for i in t["delete-file-references"]]
    return tasks, delete_json


# -- plan store ---------------------------------------------------------------


class PlanStore:
    """Per-server registry of submitted plans: plan-id -> list of task
    shards (each shard a {"file-scan-tasks": [...], "delete-files": [...]}
    payload). Shards hold serialized JSON-ready dicts, not engine objects,
    so memory per plan is bounded by the metadata actually returned."""

    def __init__(self):
        self._plans = {}
        self._lock = threading.Lock()

    def put(self, shards: list) -> str:
        pid = _uuid.uuid4().hex
        with self._lock:
            self._plans[pid] = {"status": "completed", "shards": shards}
        return pid

    def get(self, plan_id: str):
        with self._lock:
            return self._plans.get(plan_id)

    def cancel(self, plan_id: str) -> bool:
        with self._lock:
            p = self._plans.get(plan_id)
            if p is None:
                return False
            p["status"] = "cancelled"
            p["shards"] = []
            return True


def handle_plan_request(table, body: dict, store: PlanStore) -> dict:
    """POST /v1/namespaces/{ns}/tables/{t}/plan — plan synchronously with
    the engine planner; inline small results (status=completed), shard big
    ones behind a plan-id (status=submitted, fetched via GET plan/{id} and
    POST tasks). Incremental ranges (start/end snapshot) plan the APPENDED
    data files of the range, per IncrementalAppendScan."""
    snap_id = body.get("snapshot-id")
    start_id = body.get("start-snapshot-id")
    end_id = body.get("end-snapshot-id")
    if snap_id is not None and (start_id is not None or end_id is not None):
        raise ValueError("either snapshot-id or a start/end range, not both")
    if (start_id is None) != (end_id is None):
        raise ValueError("start-snapshot-id and end-snapshot-id are "
                         "both required for incremental planning")
    filt = E.ALWAYS_TRUE
    if "filter" in body:
        if body["filter"] is None:
            raise ValueError("filter must be an expression, not null")
        filt = expr_from_rest_json(body["filter"])
    select = body.get("select") or None
    case_sensitive = bool(body.get("case-sensitive", True))

    scan = table.scan(
        filter=filt if not isinstance(filt, E.AlwaysTrue) else None,
        columns=select,
        snapshot_id=int(snap_id) if snap_id is not None else (
            int(end_id) if end_id is not None else None))
    scan.case_sensitive = case_sensitive
    plan = scan.plan_files()
    if start_id is not None:
        # appended-only incremental: entries of snapshots in (start, end]
        from .changelog import _snapshot_range

        chain = _snapshot_range(table, int(start_id), int(end_id))
        bad = [s for s in chain if s.operation not in ("append",)]
        if bad:
            raise ValueError(
                "incremental plan range contains non-append snapshot "
                f"{bad[0].snapshot_id} (op={bad[0].operation})")
        sids = {s.snapshot_id for s in chain}
        plan = type(plan)(
            [e for e in plan.files if e.snapshot_id in sids],
            [], [], plan.residual, plan.snapshot, plan.report)

    tasks, delete_json = plan_to_tasks(plan, table.metadata, filt)
    if len(tasks) <= PLAN_SHARD_TASKS:
        out = {"status": "completed", "file-scan-tasks": tasks}
        if delete_json:
            out["delete-files"] = delete_json
        return out
    shards = []
    for i in range(0, len(tasks), PLAN_SHARD_TASKS):
        shard_tasks = tasks[i:i + PLAN_SHARD_TASKS]
        used = sorted({x for t in shard_tasks
                       for x in t.get("delete-file-references", ())})
        remap = {old: new for new, old in enumerate(used)}
        shard_tasks = [
            {**t, "delete-file-references":
                [remap[x] for x in t["delete-file-references"]]}
            if "delete-file-references" in t else t
            for t in shard_tasks]
        shard = {"file-scan-tasks": shard_tasks}
        if used:
            shard["delete-files"] = [delete_json[x] for x in used]
        shards.append(shard)
    pid = store.put(shards)
    return {"status": "submitted", "plan-id": pid}


def handle_fetch_planning_result(store: PlanStore, plan_id: str):
    """GET .../plan/{plan-id} — FetchPlanningResultResponse."""
    p = store.get(plan_id)
    if p is None:
        return None
    if p["status"] == "cancelled":
        return {"status": "cancelled"}
    return {"status": "completed",
            "plan-tasks": [f"{plan_id}:{i}" for i in range(len(p["shards"]))]}


def handle_fetch_scan_tasks(store: PlanStore, plan_task: str):
    """POST .../tasks {"plan-task": token} — FetchScanTasksResponse."""
    try:
        pid, idx = plan_task.rsplit(":", 1)
        idx = int(idx)
    except (ValueError, AttributeError):
        raise ValueError(f"malformed plan-task: {plan_task!r}")
    p = store.get(pid)
    if p is None or p["status"] == "cancelled" \
            or not 0 <= idx < len(p["shards"]):
        raise KeyError(plan_task)
    return p["shards"][idx]
