"""`schema.name-mapping.default` — fallback field-id assignment for data
files written WITHOUT parquet field-id metadata (add_files / migrate
imports).

Spec: format/spec.md:400-428 ("Column Projection") + Appendix C
serialization. Reference: api/.../mapping/NameMapping.java,
MappingUtil.java (create/update), core/.../SchemaUpdate.java:484-505
(mapping follows schema evolution), and
spark/.../actions/BaseTableCreationSparkAction.java:172
(ensureNameMappingPresent on migrate/snapshot/add_files).

Engine reads resolve columns through each entry's write schema by NAME,
so its own scans never need the mapping; what it buys is INTEROP
fidelity: after `add_files` the data files carry no field ids, and a
reference reader of this table's exported metadata can only survive a
later column rename if the mapping records the original physical name
as an alias of the field id. The mapping is created at import time,
renames append the new name (the old physical name keeps matching id-less
files), and added columns join with their names — all serialized exactly
as Appendix C specifies, so it round-trips through export/import.
"""

from __future__ import annotations

import json

from .schema import ListT, MapT, StructT

PROP = "schema.name-mapping.default"


def _mapped_children(t) -> list:
    if isinstance(t, StructT):
        return [_mapped_field(f) for f in t.fields]
    if isinstance(t, ListT):
        m = {"field-id": t.element_id, "names": ["element"]}
        kids = _mapped_children(t.element)
        if kids:
            m["fields"] = kids
        return [m]
    if isinstance(t, MapT):
        key = {"field-id": t.key_id, "names": ["key"]}
        val = {"field-id": t.value_id, "names": ["value"]}
        vk = _mapped_children(t.value)
        if vk:
            val["fields"] = vk
        return [key, val]
    return []


def _mapped_field(f) -> dict:
    m = {"field-id": f.field_id, "names": [f.name]}
    kids = _mapped_children(f.type)
    if kids:
        m["fields"] = kids
    return m


def create_mapping(schema) -> list:
    """MappingUtil.create: one mapping entry per field, names = [current
    name], recursing into structs/lists/maps (list element and map
    key/value get the spec's literal `element` / `key` / `value` names)."""
    return [_mapped_field(f) for f in schema.fields]


def update_mapping(mapping: list, renames: dict, added) -> list:
    """MappingUtil.update semantics: a renamed field's NEW name joins its
    `names` list (the old physical name stays, so id-less files keep
    resolving); fields not yet mapped gain fresh entries. `renames` maps
    field_id -> new name; `added` is an iterable of NestedFields.

    Mirrors MappingUtil.UpdateMapping.removeReassignedNames: a name newly
    assigned to one field id is stripped from any OTHER entry that listed
    it, so a rename swap (a->tmp then b->a) never leaves two entries both
    claiming `a` — an ambiguous mapping reference readers would reject."""
    reassigned = {}  # new name -> owning field id
    for fid, new_name in renames.items():
        reassigned[new_name] = fid
    out = []
    seen = set()
    for m in mapping:
        fid = m.get("field-id")
        if fid is not None:
            seen.add(fid)
        names = list(m.get("names", []))
        names = [n for n in names
                 if n not in reassigned or reassigned[n] == fid]
        if fid in renames and renames[fid] not in names:
            names = names + [renames[fid]]
        mm = dict(m)
        mm["names"] = names
        out.append(mm)
    for f in added:
        if f.field_id not in seen:
            out.append(_mapped_field(f))
    return out


def to_json(mapping: list) -> str:
    return json.dumps(mapping, separators=(",", ":"))


def parse_mapping(s: str) -> list:
    """Parse + validate the Appendix C shape: a JSON list of objects with
    a required `names` string list, optional int `field-id`, optional
    nested `fields`."""
    m = json.loads(s)
    _validate(m)
    return m


def _validate(fields, path="$"):
    if not isinstance(fields, list):
        raise ValueError(f"name mapping at {path} must be a list")
    for i, f in enumerate(fields):
        p = f"{path}[{i}]"
        if not isinstance(f, dict) or "names" not in f:
            raise ValueError(f"field mapping at {p} needs a `names` list")
        if not isinstance(f["names"], list) or not all(
                isinstance(n, str) for n in f["names"]):
            raise ValueError(f"`names` at {p} must be a list of strings")
        if "field-id" in f and f["field-id"] is not None \
                and not isinstance(f["field-id"], int):
            raise ValueError(f"`field-id` at {p} must be an int")
        if "fields" in f:
            _validate(f["fields"], p + ".fields")


def names_for_id(mapping: list, field_id: int) -> list:
    """All physical-name aliases recorded for a field id (top level and
    nested)."""
    out = []

    def walk(fields):
        for f in fields:
            if f.get("field-id") == field_id:
                out.extend(f.get("names", []))
            walk(f.get("fields", []))

    walk(mapping)
    return out


def ensure_name_mapping(table) -> None:
    """BaseTableCreationSparkAction.ensureNameMappingPresent: before an
    id-less-file import, persist the current schema's mapping if the
    table doesn't already carry one."""
    if PROP not in table.metadata.properties:
        table.set_properties(**{PROP: to_json(create_mapping(table.schema))})
