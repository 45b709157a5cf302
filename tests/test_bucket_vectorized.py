"""Vectorized variable-length bucket hashing (murmur3.hash_bytes_vec):
bit-exact with the scalar spec implementation (format/spec.md Appendix B,
reference api/.../transforms/Bucket.java), driven off Arrow buffers in
the write-path pandas UDF — no per-row Python in string/binary bucket
writes."""

import random
import string as _string

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_spark.murmur3 import hash_bytes, hash_bytes_vec, hash_string
from iceberg_spark.transforms import Bucket


def _pack(bss):
    data = np.frombuffer(b"".join(bss), dtype=np.uint8)
    offs = np.cumsum([0] + [len(b) for b in bss]).astype(np.int64)
    return data, offs


def test_hash_bytes_vec_known_values():
    # spec Appendix B test vector: bucket hash of 'iceberg' (string)
    data, offs = _pack([b"iceberg"])
    assert int(hash_bytes_vec(data, offs)[0]) == hash_string("iceberg")
    assert hash_string("iceberg") == 1210000089  # spec.md Appendix B


def test_hash_bytes_vec_differential_fuzz():
    rng = random.Random(7)
    vals = [b""]
    for _ in range(3000):
        k = rng.randint(0, 50)
        vals.append(bytes(rng.getrandbits(8) for _ in range(k)))
    data, offs = _pack(vals)
    got = hash_bytes_vec(data, offs)
    want = np.array([hash_bytes(v) for v in vals], dtype=np.int32)
    assert (got == want).all()


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(max_size=24), min_size=1, max_size=40))
def test_hash_bytes_vec_utf8_property(texts):
    bss = [t.encode("utf-8") for t in texts]
    data, offs = _pack(bss)
    got = hash_bytes_vec(data, offs)
    assert [int(h) for h in got] == [hash_string(t) for t in texts]


def test_string_bucket_udf_matches_scalar(spark):
    vals = ["", "iceberg", "日本語テキスト", "a" * 37, None, "éüñ", "x"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    b = Bucket(16)
    got = [r.b for r in df.select(b.spark_col(F.col("s"), "string")
                                  .alias("b")).collect()]
    want = [None if v is None else b.apply(v, "string") for v in vals]
    assert got == want


def test_binary_bucket_udf_matches_scalar(spark):
    vals = [b"", b"\x00\x01\x02", bytes(range(47)), None]
    df = spark.createDataFrame(
        [(v,) for v in vals],
        T.StructType([T.StructField("s", T.BinaryType())]))
    b = Bucket(8)
    got = [r.b for r in df.select(b.spark_col(F.col("s"), "binary")
                                  .alias("b")).collect()]
    want = [None if v is None else b.apply(v, "binary") for v in vals]
    assert got == want


def test_string_bucket_partitioned_write_roundtrip(catalog, spark):
    """End-to-end: a string-bucketed partition spec writes through the
    vectorized path, partition values agree with the scalar spec hash,
    and bucket-predicate pruning still works."""
    from iceberg_spark.expressions import col

    schema = T.StructType([T.StructField("k", T.StringType()),
                           T.StructField("v", T.LongType())])
    t = catalog.create_table("db.strbucket", schema,
                             partition_by=["bucket(4, k)"])
    rows = [(f"key_{i}", i) for i in range(200)] + [(None, 999)]
    t.append(spark.createDataFrame(rows, schema))
    t = t.refresh()
    b = Bucket(4)
    for e in t.scan().plan_files().files:
        pv = e.file.partition.get("k_bucket_4")
        lo, hi = e.file.stats["k"][0], e.file.stats["k"][1]
        if pv is None:
            continue  # the NULL-key file
        assert b.apply(lo, "string") == pv and b.apply(hi, "string") == pv
    want_bucket = b.apply("key_7", "string")
    plan = t.scan(filter=col("k") == "key_7").plan_files()
    assert all(e.file.partition.get("k_bucket_4") in (want_bucket, None)
               for e in plan.files)
    assert t.to_df().filter("k = 'key_7'").count() == 1
    assert t.to_df().count() == 201


def test_uuid_bucket_spec_vector(spark):
    """spec Appendix B [4]: uuid hashes as 16 big-endian bytes — the
    spec's own test vector, checked scalar AND through the vectorized
    write-path UDF."""
    u = "f79c3e09-677c-4bbd-a479-3f349cb785e7"
    b = Bucket(16)
    assert b.hash_value(u, "uuid") == 1488055340
    import uuid as _u

    assert b.hash_value(_u.UUID(u), "uuid") == 1488055340
    df = spark.createDataFrame([(u,), (None,)], "u string")
    got = [r.b for r in df.select(b.spark_col(F.col("u"), "uuid")
                                  .alias("b")).collect()]
    assert got == [(1488055340 & 0x7FFFFFFF) % 16, None]
