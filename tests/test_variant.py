"""Variant extract(path, type) — v3 semi-structured access.

Reference api/src/main/java/org/apache/iceberg/expressions/UnboundExtract.java
and format/spec.md:243: a typed path term usable in scan filters. Variant
paths have no column stats, so metadata evaluators must treat extract
predicates as might-match; the data-level filter lowers to variant_get.
"""

import pytest
from pyspark.sql import functions as F

from iceberg_spark import expressions as E
from iceberg_spark.expressions import bind, evaluate, inclusive_metrics_eval
from iceberg_spark.schema import NestedField, Schema
from iceberg_spark.transforms import VariantExtract


SCHEMA = Schema((
    NestedField(1, "id", "long", True),
    NestedField(2, "meta", "variant", False),
))


def test_extract_binds_and_coerces_to_target_type():
    b = bind(E.extract("meta", "$.n", "long") > "5", SCHEMA)
    assert b.literals == (5,)
    assert b.term.transform == VariantExtract("$.n", "long")
    assert b.term.produced_type == "long"


def test_extract_rejects_non_variant_column():
    with pytest.raises(ValueError):
        bind(E.extract("id", "$.n", "long") > 5, SCHEMA)


def test_metadata_eval_never_prunes_extract_predicates():
    b = bind(E.extract("meta", "$.n", "long") > 5, SCHEMA)
    # stats say the (string-typed) column maxes at "a" — irrelevant for a
    # variant path; the file must be kept
    fs = {"meta": ("a", "a", 0, None, 10)}
    assert inclusive_metrics_eval(b, fs) is True


def test_row_evaluate_walks_paths():
    b = bind(E.extract("meta", "$.a.b", "long") >= 7, SCHEMA)
    assert evaluate(b, {"meta": '{"a": {"b": 9}}'}) is True
    assert evaluate(b, {"meta": '{"a": {"b": 3}}'}) is False
    # missing path -> null -> predicate false
    assert evaluate(b, {"meta": '{"a": {}}'}) is False
    b2 = bind(E.extract("meta", "$.tags[1]", "string") == "x", SCHEMA)
    assert evaluate(b2, {"meta": '{"tags": ["w", "x"]}'}) is True


def test_variant_table_scan_filter(catalog, spark):
    df = spark.range(0, 100).select(
        "id",
        F.parse_json(F.concat(
            F.lit('{"n": '), F.col("id").cast("string"),
            F.lit(', "tag": "t'), (F.col("id") % 3).cast("string"),
            F.lit('"}'))).alias("meta"))
    t = catalog.create_table("vt", df.schema)
    t.append(df)
    out = t.scan(filter=E.extract("meta", "$.n", "long") >= 90).df()
    assert out.count() == 10
    tags = (out.select(F.variant_get("meta", "$.tag", "string").alias("tag"))
            .distinct().collect())
    assert {r.tag for r in tags} == {"t0", "t1", "t2"}
    # typed extract inside the filter composes with ordinary predicates
    both = t.scan(filter=E.and_(
        E.extract("meta", "$.tag", "string") == "t0",
        E.col("id") < 30)).df()
    assert both.count() == 10  # ids 0,3,...,27


def test_add_files_reads_native_binary_variant(catalog, spark, tmp_path):
    """Files written with Spark's native binary variant encoding (e.g. a
    Spark 4 pipeline's output imported via add_files) read back without
    the JSON round-trip: the scan detects the metadata/value group in the
    footer and skips parse_json (format/spec.md:243 interop)."""
    from pyspark.sql import types as T

    if not hasattr(T, "VariantType"):
        pytest.skip("Spark without VariantType")
    src = str(tmp_path / "native_variant")
    df = spark.range(0, 50).select(
        "id",
        F.parse_json(F.concat(
            F.lit('{"n": '), F.col("id").cast("string"),
            F.lit('}'))).alias("meta"))
    assert isinstance(df.schema["meta"].dataType, T.VariantType)
    df.coalesce(1).write.parquet(src)

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("meta", T.VariantType()),
    ])
    t = catalog.create_table("db.natvar", schema)
    t.add_files(src)
    out = t.to_df()
    assert isinstance(out.schema["meta"].dataType, T.VariantType)
    got = (out.select("id", F.variant_get(F.col("meta"), "$.n", "long")
                      .alias("n")).orderBy("id").collect())
    assert [(r.id, r.n) for r in got] == [(i, i) for i in range(50)]
    # extract-filtered scan over the native files
    from iceberg_spark import expressions as E

    rows = t.scan(filter=E.extract("meta", "$.n", "long") >= 45).df().collect()
    assert sorted(r.id for r in rows) == list(range(45, 50))


def test_engine_writes_native_binary_variant_by_default(catalog, spark):
    """Engine-written variant parquet must be the spec's binary encoding
    (format/spec.md:243) so reference readers consume it: the physical
    footer carries the VARIANT logical type (pyarrow refuses it) or a
    metadata/value group — never plain strings."""
    import pyarrow.parquet as pq

    df = spark.range(0, 10).select(
        "id", F.parse_json(F.concat(
            F.lit('{"n": '), F.col("id").cast("string"),
            F.lit('}'))).alias("meta"))
    t = catalog.create_table("db.binvar", df.schema)
    t.append(df)
    t = t.refresh()
    paths = [e.file.file_path for e in t.scan().plan_files().files]
    assert paths
    for p in paths:
        try:
            foot = pq.read_schema(p)
        except OSError:
            continue  # VARIANT logical type: pyarrow refusal IS binary
        ft = foot.field("meta").type
        import pyarrow as pa
        assert pa.types.is_struct(ft) and \
            {f.name for f in ft} >= {"metadata", "value"}, ft
    out = t.scan(filter=E.extract("meta", "$.n", "long") >= 8).df()
    assert out.count() == 2


def test_json_fallback_property_and_mixed_encodings(catalog, spark):
    """write.variant.encoding=json keeps the pyarrow/DuckDB-readable text
    path; flipping the property mid-table mixes encodings and the scan
    groups per-file so both read correctly in one query."""
    import pyarrow.parquet as pq

    df = spark.range(0, 5).select(
        "id", F.parse_json(F.concat(
            F.lit('{"n": '), F.col("id").cast("string"),
            F.lit('}'))).alias("meta"))
    t = catalog.create_table(
        "db.jsonvar", df.schema,
        properties={"write.variant.encoding": "json"})
    t.append(df)
    t = t.refresh()
    p = t.scan().plan_files().files[0].file.file_path
    assert str(pq.read_schema(p).field("meta").type) in (
        "string", "large_string")
    # flip to binary and append more
    t.set_properties(**{"write.variant.encoding": "binary"})
    t = t.refresh()
    t.append(spark.range(5, 10).select(
        "id", F.parse_json(F.concat(
            F.lit('{"n": '), F.col("id").cast("string"),
            F.lit('}'))).alias("meta")))
    t = t.refresh()
    out = t.to_df().select(
        "id", F.variant_get("meta", "$.n", "long").alias("n"))
    got = sorted((r["id"], r["n"]) for r in out.collect())
    assert got == [(i, i) for i in range(10)]
