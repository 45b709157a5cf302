"""schema.name-mapping.default (format/spec.md:400-428 + Appendix C;
reference api/.../mapping/MappingUtil.java, SchemaUpdate.java:484-505):
created on id-less-file imports, follows schema evolution, round-trips
through export."""

import json

import pytest
from pyspark.sql import types as T

from iceberg_spark import name_mapping as NM
from iceberg_spark.schema import ListT, MapT, NestedField, Schema, StructT


def test_create_mapping_appendix_c_shape():
    schema = Schema((
        NestedField(1, "id", "long", True),
        NestedField(2, "data", "string", False),
        NestedField(3, "location", StructT((
            NestedField(4, "latitude", "double", False),
            NestedField(5, "longitude", "double", False)))),
        NestedField(6, "tags", ListT(7, "string")),
        NestedField(8, "attrs", MapT(9, "string", 10, "string")),
    ))
    m = NM.create_mapping(schema)
    assert m[0] == {"field-id": 1, "names": ["id"]}
    assert m[2]["fields"][0] == {"field-id": 4, "names": ["latitude"]}
    assert m[3]["fields"] == [{"field-id": 7, "names": ["element"]}]
    assert m[4]["fields"] == [{"field-id": 9, "names": ["key"]},
                              {"field-id": 10, "names": ["value"]}]
    # serialization round-trips through the validator
    assert NM.parse_mapping(NM.to_json(m)) == m


def test_update_mapping_rename_keeps_alias_and_adds_fields():
    m = [{"field-id": 1, "names": ["id"]},
         {"field-id": 2, "names": ["data"]}]
    out = NM.update_mapping(m, {2: "payload"},
                            [NestedField(3, "score", "double", False)])
    assert out[1]["names"] == ["data", "payload"]  # old name stays
    assert out[2] == {"field-id": 3, "names": ["score"]}
    assert NM.names_for_id(out, 2) == ["data", "payload"]


def test_update_mapping_removes_reassigned_names():
    """MappingUtil.UpdateMapping.removeReassignedNames: a rename swap
    (a->tmp then b->a) must strip `a` from the entry that previously
    owned it — two entries both listing `a` would be ambiguous for
    reference readers resolving id-less files."""
    m = [{"field-id": 1, "names": ["a"]},
         {"field-id": 2, "names": ["b"]}]
    out = NM.update_mapping(m, {1: "tmp", 2: "a"}, [])
    assert out[0]["names"] == ["tmp"]  # 'a' reassigned away from id 1
    assert out[1]["names"] == ["b", "a"]
    # exactly one top-level entry claims each name
    claims = {}
    for e in out:
        for n in e["names"]:
            assert n not in claims, f"name {n} claimed twice"
            claims[n] = e["field-id"]


def test_parse_mapping_validates():
    with pytest.raises(ValueError):
        NM.parse_mapping('{"field-id": 1}')  # not a list
    with pytest.raises(ValueError):
        NM.parse_mapping('[{"field-id": 1}]')  # names missing
    with pytest.raises(ValueError):
        NM.parse_mapping('[{"field-id": "x", "names": []}]')


def test_add_files_creates_mapping_and_rename_appends(catalog, spark,
                                                      tmp_path):
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("v", T.StringType())])
    src = str(tmp_path / "plain_parquet")
    spark.createDataFrame([(1, "a"), (2, "b")], schema) \
        .coalesce(1).write.parquet(src)
    t = catalog.create_table("db.nmap", schema)
    t.add_files(src)
    t = t.refresh()
    raw = t.metadata.properties.get(NM.PROP)
    assert raw is not None
    m = NM.parse_mapping(raw)
    by_names = {tuple(f["names"]): f["field-id"] for f in m}
    assert ("id",) in by_names and ("v",) in by_names
    assert t.to_df().count() == 2

    # rename: mapping keeps the PHYSICAL name and gains the new alias,
    # so a reference reader of id-less files still resolves the column
    t.update_schema().rename_column("v", "val").commit()
    t = t.refresh()
    m2 = NM.parse_mapping(t.metadata.properties[NM.PROP])
    vid = by_names[("v",)]
    assert NM.names_for_id(m2, vid) == ["v", "val"]

    # added column joins the mapping
    t.update_schema().add_column("score", "double").commit()
    t = t.refresh()
    m3 = NM.parse_mapping(t.metadata.properties[NM.PROP])
    new_id = t.schema.find_field("score").field_id
    assert NM.names_for_id(m3, new_id) == ["score"]
    # and reads still work after both evolutions
    assert t.to_df().filter("val = 'a'").count() == 1


def test_mapping_survives_export_roundtrip(catalog, spark, tmp_path):
    import os
    import tempfile

    from iceberg_spark.sources.iceberg import (export_reference_metadata,
                                               register_iceberg_table)

    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("v", T.StringType())])
    src = str(tmp_path / "plain_parquet2")
    spark.createDataFrame([(1, "a")], schema).coalesce(1).write.parquet(src)
    t = catalog.create_table("db.nmap_exp", schema)
    t.add_files(src)
    t = t.refresh()
    t.update_schema().rename_column("v", "val").commit()
    t = t.refresh()
    dest = tempfile.mkdtemp(prefix="nmap_exp_")
    mpath = export_reference_metadata(t, dest)
    md = json.load(open(mpath))
    raw = md["properties"][NM.PROP]
    vid = t.schema.find_field("val").field_id
    assert NM.names_for_id(NM.parse_mapping(raw), vid) == ["v", "val"]
    back, _n, _f = register_iceberg_table(catalog, mpath, "db.nmap_back")
    assert NM.PROP in back.metadata.properties
    assert back.to_df().filter("val = 'a'").count() == 1


def test_update_mapping_properties_hypothesis():
    """Property check (hypothesis): for any rename sequence, the mapping
    keeps every historical alias, maps each field id exactly once at top
    level, and re-applying the same update is idempotent."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    names = st.lists(st.text(alphabet="abcdefgh", min_size=1, max_size=6),
                     min_size=1, max_size=6, unique=True)

    @settings(max_examples=60, deadline=None)
    @given(names, st.data())
    def prop(cols, data):
        schema = Schema(tuple(
            NestedField(i + 1, n, "string", False)
            for i, n in enumerate(cols)))
        m = NM.create_mapping(schema)
        renames = {}
        for f in schema.fields:
            if data.draw(st.booleans()):
                renames[f.field_id] = f.name + "_r"
        out = NM.update_mapping(m, renames, [])
        # every original name survives; renamed ids gain the alias
        for f in schema.fields:
            ns = NM.names_for_id(out, f.field_id)
            assert f.name in ns
            if f.field_id in renames:
                assert renames[f.field_id] in ns
        # idempotent
        assert NM.update_mapping(out, renames, []) == out
        # each top-level id mapped once
        ids = [e.get("field-id") for e in out]
        assert len(ids) == len(set(ids))
        # serialization round-trip
        assert NM.parse_mapping(NM.to_json(out)) == out

    prop()
