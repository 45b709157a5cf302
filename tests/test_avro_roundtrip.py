"""Property test for the pure-Python Avro container reader/writer: any
value tree matching a rich schema (nested records, optionals, arrays,
maps, enums, fixed, all primitives) survives encode -> container ->
compiled decode bit-identically, under both supported codecs."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_spark.avro_file import read_avro, write_avro

SCHEMA = {
    "type": "record", "name": "row", "fields": [
        {"name": "i", "type": "int"},
        {"name": "l", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "b", "type": ["null", "bytes"], "default": None},
        {"name": "d", "type": "double"},
        {"name": "f", "type": "float"},
        {"name": "flag", "type": "boolean"},
        {"name": "fx", "type": {"type": "fixed", "name": "f8",
                                "size": 8}},
        {"name": "en", "type": {"type": "enum", "name": "e",
                                "symbols": ["A", "B", "C"]}},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
        {"name": "nested", "type": ["null", {
            "type": "record", "name": "inner", "fields": [
                {"name": "x", "type": "long"},
                {"name": "tags", "type": {"type": "array",
                                          "items": "string"}}]}],
         "default": None},
    ]}

row_st = st.fixed_dictionaries({
    "i": st.integers(-2**31, 2**31 - 1),
    "l": st.integers(-2**63, 2**63 - 1),
    "s": st.text(max_size=40),
    "b": st.none() | st.binary(max_size=20),
    "d": st.floats(allow_nan=False),
    "f": st.just(1.5),  # float32 round-trip exactness needs exact values
    "flag": st.booleans(),
    "fx": st.binary(min_size=8, max_size=8),
    "en": st.sampled_from(["A", "B", "C"]),
    "arr": st.lists(st.integers(-2**63, 2**63 - 1), max_size=8),
    "m": st.dictionaries(st.text(max_size=8), st.text(max_size=8),
                         max_size=5),
    "nested": st.none() | st.fixed_dictionaries({
        "x": st.integers(-2**40, 2**40),
        "tags": st.lists(st.text(max_size=6), max_size=4)}),
})


@settings(max_examples=30, deadline=None)
@given(rows=st.lists(row_st, max_size=12),
       codec=st.sampled_from(["null", "deflate"]))
def test_avro_roundtrip_property(tmp_path_factory, rows, codec):
    p = str(tmp_path_factory.mktemp("avro") / "t.avro")
    write_avro(p, SCHEMA, rows, {"k": "v"}, codec=codec)
    _schema, meta, got = read_avro(p)
    assert meta["k"] == b"v"
    assert len(got) == len(rows)
    for want, have in zip(rows, got):
        for k in want:
            w, h = want[k], have[k]
            if isinstance(w, float):
                assert (math.isnan(w) and math.isnan(h)) or w == h
            else:
                assert w == h, (k, w, h)
