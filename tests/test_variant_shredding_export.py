"""Spec-physical variant shredding on export (reference parquet/.../
ParquetVariantVisitor.java, VariantShreddingFunction.java; Parquet
VariantShredding.md): exported data files of a shredded engine table
carry the typed_value layout, companion stats round-trip under synthetic
field ids, and MoR position deletes survive the transcode."""

import json
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_spark.expressions import col, extract
from iceberg_spark.sources.iceberg import (export_reference_metadata,
                                           register_iceberg_table)
from iceberg_spark.variant_shred import (jvm_parquet_schema,
                                         jvm_top_level_columns,
                                         shredding_ddl)


def _shred_table(catalog, spark, ident, n=40, files=2, props=None):
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("v", T.VariantType())])
    t = catalog.create_table(ident, schema, properties=dict({
        "write.variant.shred.v": "$.len:long;$.name:string"},
        **(props or {})))
    per = n // files
    for i in range(files):
        df = (spark.range(i * per, (i + 1) * per)
              .select(F.col("id"),
                      F.parse_json(F.concat(
                          F.lit('{"len":'), F.col("id").cast("string"),
                          F.lit(',"name":"d'), F.col("id").cast("string"),
                          F.lit('"}'))).alias("v")))
        t.append(df.coalesce(1).sortWithinPartitions("id"))
    return t.refresh()


def test_export_writes_typed_value_layout(catalog, spark, tmp_path):
    t = _shred_table(catalog, spark, "db.shredexp1")
    dest = str(tmp_path / "exp")
    mp = export_reference_metadata(t, dest)
    t2, _n, nf = register_iceberg_table(catalog, mp, "db.shredexp1_back")
    assert nf == 2
    for e in t2.scan().plan_files().files:
        assert e.file.file_path.startswith(dest)  # transcoded copy
        phys = jvm_parquet_schema(spark, e.file.file_path)
        assert "typed_value" in phys
        assert "_shred_f" not in phys
        assert "VARIANT" in phys  # logical annotation kept
        # stale split_offsets must not ride the transcoded entry
        # (row-group boundaries changed)
        # companion stats mapped back from synthetic-id metrics
        assert any(k.startswith("_shred_f") for k in e.file.stats)
    got = sorted((r.id, r.l) for r in t2.to_df().select(
        "id", F.variant_get("v", "$.len", "long").alias("l")).collect())
    assert got == [(i, i) for i in range(40)]


def test_export_shred_opt_out_keeps_by_reference(catalog, spark, tmp_path):
    t = _shred_table(catalog, spark, "db.shredexp2")
    src_paths = {e.file.file_path for e in t.scan().plan_files().files}
    mp = export_reference_metadata(t, str(tmp_path / "exp"),
                                   shred_physical=False)
    md = json.load(open(mp))
    assert md["format-version"] >= 2
    t2, _n, _f = register_iceberg_table(catalog, mp, "db.shredexp2_back")
    assert {e.file.file_path
            for e in t2.scan().plan_files().files} == src_paths


def test_export_shredded_preserves_pos_deletes(catalog, spark, tmp_path):
    t = _shred_table(catalog, spark, "db.shredexp3", props={
        "write.delete.mode": "merge-on-read"})
    t.delete_where(col("id").isin([3, 7, 25]), mode="merge-on-read")
    t = t.refresh()
    mp = export_reference_metadata(t, str(tmp_path / "exp"))
    t2, _n, _f = register_iceberg_table(catalog, mp, "db.shredexp3_back")
    plan = t2.scan().plan_files()
    # pos-delete CONTENT remapped to the transcoded data paths
    data_paths = {e.file.file_path for e in plan.files}
    assert all(p.startswith(str(tmp_path)) for p in data_paths)
    got = sorted(r.id for r in t2.to_df().collect())
    assert got == [i for i in range(40) if i not in (3, 7, 25)]


def test_export_unshredded_table_stays_by_reference(catalog, spark,
                                                    tmp_path):
    schema = T.StructType([T.StructField("id", T.LongType())])
    t = catalog.create_table("db.shredexp4", schema)
    t.append(spark.range(10).select(F.col("id")))
    t = t.refresh()
    src_paths = {e.file.file_path for e in t.scan().plan_files().files}
    mp = export_reference_metadata(t, str(tmp_path / "exp"))
    t2, _n, _f = register_iceberg_table(catalog, mp, "db.shredexp4_back")
    assert {e.file.file_path
            for e in t2.scan().plan_files().files} == src_paths


def test_shredding_ddl_shapes():
    from iceberg_spark.schema import ShreddedPath

    sps = (ShreddedPath(1, "v", "$.len", "long"),
           ShreddedPath(1, "v", "$.name", "string"),
           ShreddedPath(1, "v", "$.a.b", "int"))
    assert shredding_ddl(sps) == \
        "struct<`a`:struct<`b`:int>,`len`:bigint,`name`:string>"
    # array paths are companion-only: inexpressible in the object layout
    assert shredding_ddl(
        (ShreddedPath(1, "v", "$.tags[0]", "string"),)) is None


def test_imported_spec_shredded_files_scan_and_prune(catalog, spark,
                                                     tmp_path):
    """A reimported table's files have companion STATS but no physical
    companion column: extract() predicates must still FILE-prune from
    the stats, and the data-level filter must run on the variant itself
    (never on a null-read phantom column)."""
    t = _shred_table(catalog, spark, "db.shredexp5", n=40, files=2)
    mp = export_reference_metadata(t, str(tmp_path / "exp"))
    t2, _n, _f = register_iceberg_table(catalog, mp, "db.shredexp5_back")
    # file 2 holds ids 20..39 -> $.len >= 30 prunes file 1
    pf = t2.scan(filter=extract("v", "$.len", "long") >= 30).plan_files()
    assert len(pf.files) == 1
    got = sorted(r.id for r in t2.scan(
        filter=extract("v", "$.len", "long") >= 30).df().collect())
    assert got == list(range(30, 40))
    # physical footers: variant group only, no companion columns
    for e in t2.scan().plan_files().files:
        cols = jvm_top_level_columns(spark, e.file.file_path)
        assert not any(c.startswith("_shred_f") for c in cols)


def test_typed_value_write_layout(catalog, spark):
    """write.variant.shred.layout=typed_value: engine files carry the
    SPEC-PHYSICAL shredding from birth (typed_value group, no companion
    columns), companion STATS still land in manifests (variant_get
    aggregation in the metrics pass), extract() predicates still
    file-prune, and reads are exact."""
    t = _shred_table(catalog, spark, "db.tvw1", n=40, files=2, props={
        "write.variant.shred.layout": "typed_value"})
    files = t.scan().plan_files().files
    for e in files:
        phys = jvm_parquet_schema(spark, e.file.file_path)
        assert "typed_value" in phys and "_shred_f" not in phys
        assert any(k.startswith("_shred_f") for k in e.file.stats)
    pf = t.scan(filter=extract("v", "$.len", "long") >= 30).plan_files()
    assert len(pf.files) == 1  # files are id-clustered 0-19 / 20-39
    got = sorted(r.id for r in t.scan(
        filter=extract("v", "$.len", "long") >= 30).df().collect())
    assert got == list(range(30, 40))


def test_typed_value_export_is_zero_copy(catalog, spark, tmp_path):
    """A typed_value-layout table's files are already reference-shaped:
    export must go BY REFERENCE (no transcode copies)."""
    t = _shred_table(catalog, spark, "db.tvw2", props={
        "write.variant.shred.layout": "typed_value"})
    src_paths = {e.file.file_path for e in t.scan().plan_files().files}
    mp = export_reference_metadata(t, str(tmp_path / "exp"))
    t2, _n, _f = register_iceberg_table(catalog, mp, "db.tvw2_back")
    assert {e.file.file_path
            for e in t2.scan().plan_files().files} == src_paths
    assert t2.to_df().count() == 40


def test_invalid_shred_layout_rejected(catalog, spark):
    from pyspark.sql import types as T

    t = catalog.create_table("db.tvw3", T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("v", T.VariantType())]), properties={
        "write.variant.shred.v": "$.len:long",
        "write.variant.shred.layout": "typed-value"})  # typo
    import pytest as _pt

    with _pt.raises(ValueError, match="layout"):
        t.append(spark.range(3).select(
            F.col("id"), F.parse_json(F.lit('{"len":1}')).alias("v")))


def test_export_transcode_runs_batched(catalog, spark, tmp_path,
                                       monkeypatch):
    """A many-file companion-layout export pipelines its per-file
    transcode jobs through a thread pool instead of serializing on the
    driver: the worker observes >1 concurrent invocation, footer probes
    go through the batched API, and the round trip stays exact."""
    import threading
    import time as _time

    from iceberg_spark import variant_shred as VS

    t = _shred_table(catalog, spark, "db.shredpar", n=48, files=6)

    state = {"now": 0, "peak": 0}
    lock = threading.Lock()
    real = VS._transcode_one

    def tracking(*a, **kw):
        with lock:
            state["now"] += 1
            state["peak"] = max(state["peak"], state["now"])
        try:
            _time.sleep(0.05)  # widen the overlap window
            return real(*a, **kw)
        finally:
            with lock:
                state["now"] -= 1

    monkeypatch.setattr(VS, "_transcode_one", tracking)
    dest = str(tmp_path / "exp")
    mp = export_reference_metadata(t, dest)
    assert state["peak"] > 1, "transcode did not overlap"

    t2, _n, nf = register_iceberg_table(catalog, mp, "db.shredpar_back")
    assert nf == 6
    got = sorted((r.id, json.loads(r.j)) for r in
                 t2.to_df().select(
                     "id", F.to_json("v").alias("j")).collect())
    assert len(got) == 48
    assert got[0] == (0, {"len": 0, "name": "d0"})
    assert got[-1] == (47, {"len": 47, "name": "d47"})
    for e in t2.scan().plan_files().files:
        phys = jvm_parquet_schema(spark, e.file.file_path)
        assert "typed_value" in phys and "_shred_f" not in phys
