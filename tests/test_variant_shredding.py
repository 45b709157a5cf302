"""Variant shredding on write (reference parquet/.../
VariantShreddingAnalyzer.java, VariantShreddingFunction.java): declared
extract() paths materialize as typed companion parquet columns, their
per-file bounds land in manifests under deterministic synthetic field
ids, and `extract(path) cmp literal` predicates prune files at plan
time."""

import pytest
from pyspark.sql import functions as F

from iceberg_spark import expressions as E
from iceberg_spark.schema import (NestedField, Schema, ShreddedPath,
                                  shredded_paths, with_shredding)
from iceberg_spark.table import Catalog

SCHEMA = Schema((NestedField(1, "id", "long", True),
                 NestedField(2, "meta", "variant", False)))


def test_shredded_paths_parsing():
    sps = shredded_paths(SCHEMA, {
        "write.variant.shred.meta": "$.len:long; $.cat:int",
        "write.variant.shred.nosuch": "$.x:long",       # unknown column
        "write.variant.shred.id": "$.x:long",           # not a variant
        "other.prop": "1"})
    assert [(sp.path, sp.type) for sp in sps] == [("$.cat", "int"),
                                                  ("$.len", "long")]
    assert all(sp.parent_id == 2 and sp.column == "meta" for sp in sps)


def test_shredded_paths_reject_garbage():
    sps = shredded_paths(SCHEMA, {"write.variant.shred.meta":
                                  "no-dollar:long;$.ok:bogus;$.fine:int;"
                                  "$.geo:geometry;$.v:variant"})
    assert [(sp.path, sp.type) for sp in sps] == [("$.fine", "int")]


def test_shred_fid_deterministic_and_reserved_range():
    a = ShreddedPath(2, "meta", "$.len", "long")
    b = ShreddedPath(2, "meta", "$.len", "long")
    assert a.field_id == b.field_id
    assert 2_100_000_000 <= a.field_id < 2_140_000_000
    assert a.stats_name == f"_shred_f{a.field_id}"
    # different path/type/parent -> different id
    assert len({ShreddedPath(2, "meta", p, t).field_id
                for p, t in [("$.len", "long"), ("$.len", "int"),
                             ("$.cat", "long")]}
               | {ShreddedPath(3, "meta", "$.len", "long").field_id}) == 4


def _mk_table(spark, tmp_path, name, props, n=400, files=4):
    cat = Catalog(spark, str(tmp_path / "wh"))
    df = spark.range(0, n).selectExpr(
        "id",
        "parse_json(concat('{\"len\": ', cast(id as string),"
        " ', \"cat\": ', cast(id % 5 as string), '}')) as meta")
    t = cat.create_table(f"db.{name}", df.schema, properties=props,
                         exists_ok=True)
    step = n // files
    for lo in range(0, n, step):
        t.append(df.filter((F.col("id") >= lo) & (F.col("id") < lo + step)))
    return cat, cat.load_table(f"db.{name}")


def test_shredded_predicate_prunes_files(spark, tmp_path):
    _cat, t = _mk_table(spark, tmp_path, "shred",
                        {"write.variant.shred.meta": "$.len:long;$.cat:int"})
    total = len(t.scan().plan_files().files)
    assert total >= 4
    plan = t.scan(filter=E.extract("meta", "$.len", "long") >= 380)
    assert len(plan.plan_files().files) < total
    got = sorted(r.id for r in plan.df().select("id").collect())
    assert got == list(range(380, 400))
    # the low end of the domain: only first-append files survive
    plan2 = t.scan(filter=E.extract("meta", "$.len", "long") < 100)
    assert len(plan2.plan_files().files) < total
    assert all(e.file.stats[ShreddedPath(2, "meta", "$.len",
                                         "long").stats_name][0] < 100
               for e in plan2.plan_files().files)
    # stats rode the manifest under the synthetic ids
    sp = ShreddedPath(2, "meta", "$.len", "long")
    allst = [e.file.stats[sp.stats_name]
             for e in t.scan().plan_files().files]
    assert min(s[0] for s in allst) == 0
    assert max(s[1] for s in allst) == 399
    assert all(s[2] == 0 for s in allst)              # no nulls
    assert sum(s[4] for s in allst) == 400            # value counts


def test_undeclared_path_does_not_prune(spark, tmp_path):
    _cat, t = _mk_table(spark, tmp_path, "shred2",
                        {"write.variant.shred.meta": "$.len:long"})
    total = len(t.scan().plan_files().files)
    # $.cat is not declared -> conservative keep-everything
    plan = t.scan(filter=E.extract("meta", "$.cat", "int") == 3)
    assert len(plan.plan_files().files) == total
    # declared path with a MISMATCHED type is also conservative
    plan2 = t.scan(filter=E.extract("meta", "$.len", "int") >= 380)
    assert len(plan2.plan_files().files) == total
    assert plan2.df().count() == 20


def test_mixed_pre_and_post_declaration_files(spark, tmp_path):
    """Files written BEFORE the property have no companions/stats: they
    must never be pruned by a shredded predicate (absent stats = keep)."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    df = spark.range(0, 200).selectExpr(
        "id",
        "parse_json(concat('{\"len\": ', cast(id as string), '}')) as meta")
    t = cat.create_table("db.mixed", df.schema)
    t.append(df.filter(F.col("id") < 100))           # pre-declaration
    t.set_properties(**{"write.variant.shred.meta": "$.len:long"})
    t = cat.load_table("db.mixed")
    t.append(df.filter(F.col("id") >= 100))          # post-declaration
    t = cat.load_table("db.mixed")
    plan = t.scan(filter=E.extract("meta", "$.len", "long") < 50)
    # the pre-declaration file (ids 0..99) has no shred stats -> kept;
    # rows still filter exactly
    got = sorted(r.id for r in plan.df().select("id").collect())
    assert got == list(range(50))
    plan_hi = t.scan(filter=E.extract("meta", "$.len", "long") >= 150)
    got = sorted(r.id for r in plan_hi.df().select("id").collect())
    assert got == list(range(150, 200))
    # pre-declaration file must still be in the >=150 plan (no stats)
    assert len(plan_hi.plan_files().files) >= 2


def test_companions_invisible_to_readers(spark, tmp_path):
    _cat, t = _mk_table(spark, tmp_path, "shred3",
                        {"write.variant.shred.meta": "$.len:long"})
    assert set(t.to_df().columns) == {"id", "meta"}
    assert set(t.scan().df().columns) == {"id", "meta"}


def test_compaction_preserves_shredding(spark, tmp_path):
    from iceberg_spark.maintenance import rewrite_data_files

    _cat, t = _mk_table(spark, tmp_path, "shred4",
                        {"write.variant.shred.meta": "$.len:long"},
                        n=400, files=8)
    rewrite_data_files(t, target_file_size=1 << 20)
    t = t.refresh()
    files = t.scan().plan_files().files
    sp = ShreddedPath(2, "meta", "$.len", "long")
    assert all(e.file.stats.get(sp.stats_name) is not None for e in files)
    got = sorted(r.id for r in t.scan(
        filter=E.extract("meta", "$.len", "long") >= 390)
        .df().select("id").collect())
    assert got == list(range(390, 400))


def test_with_shredding_equality_stable():
    s2 = with_shredding(SCHEMA, {"write.variant.shred.meta": "$.a:long"})
    assert s2.shredded and s2 == SCHEMA  # compare=False on the attr


def test_json_encoded_variant_still_shreds(spark, tmp_path):
    """write.variant.encoding=json stores the variant as TEXT but the
    companion is computed from the variant BEFORE the cast — stats and
    pruning identical."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    df = spark.range(0, 200).selectExpr(
        "id",
        "parse_json(concat('{\"len\": ', cast(id as string), '}')) as meta")
    t = cat.create_table("db.jsonenc", df.schema, properties={
        "write.variant.encoding": "json",
        "write.variant.shred.meta": "$.len:long"})
    t.append(df.filter(F.col("id") < 100))
    t.append(df.filter(F.col("id") >= 100))
    t = cat.load_table("db.jsonenc")
    plan = t.scan(filter=E.extract("meta", "$.len", "long") >= 150)
    total = len(t.scan().plan_files().files)
    kept = plan.plan_files().files
    assert 0 < len(kept) < total
    assert all(e.file.stats["_shred_f" + str(
        __import__("iceberg_spark.schema", fromlist=["ShreddedPath"])
        .ShreddedPath(2, "meta", "$.len", "long").field_id)][1] >= 150
        for e in kept)
    assert plan.df().count() == 50


def test_analyze_variant_shredding(spark, tmp_path):
    """Auto-analyzer (VariantShreddingAnalyzer analog): samples the
    column, derives stable scalar paths with agreed types, persists the
    property; subsequent appends shred and prune."""
    from iceberg_spark.maintenance import analyze_variant_shredding

    cat = Catalog(spark, str(tmp_path / "wh"))
    df = spark.range(0, 400).selectExpr(
        "id",
        "parse_json(concat("
        " '{\"len\": ', cast(id as string),"
        " ', \"score\": ', cast(id as string), '.5',"
        " ', \"tag\": \"t', cast(id % 3 as string), '\"',"
        " ', \"rare\": ', case when id % 10 = 0 then '1' else 'null' end,"
        " ', \"nested\": {\"x\": 1}}')) as meta")
    t = cat.create_table("db.auto", df.schema)
    t.append(df.filter(F.col("id") < 200))
    t = cat.load_table("db.auto")
    spec = analyze_variant_shredding(t, "meta")
    # len -> long, score -> double, tag -> string; rare (10% presence)
    # and nested (non-scalar) excluded
    assert spec == "$.len:long;$.score:double;$.tag:string"
    t = cat.load_table("db.auto")
    assert t.properties["write.variant.shred.meta"] == spec
    t.append(df.filter(F.col("id") >= 200))
    t = cat.load_table("db.auto")
    plan = t.scan(filter=E.extract("meta", "$.len", "long") >= 300)
    total = len(t.scan().plan_files().files)
    assert len(plan.plan_files().files) < total
    assert plan.df().count() == 100
    with pytest.raises(ValueError, match="variant"):
        analyze_variant_shredding(t, "id")


def test_analyze_variant_shredding_sql_procedure(spark, tmp_path):
    from iceberg_spark.sql import SqlEngine

    cat = Catalog(spark, str(tmp_path / "wh"))
    eng = SqlEngine(spark, cat)
    df = spark.range(0, 100).selectExpr(
        "id",
        "parse_json(concat('{\"k\": ', cast(id as string), '}')) as meta")
    t = cat.create_table("db.autosql", df.schema)
    t.append(df)
    rows = eng.sql(
        "CALL system.analyze_variant_shredding('db.autosql', 'meta')"
    ).collect()
    assert rows[0].shred_spec == "$.k:long"


def test_metadata_only_delete_on_shredded_predicate(spark, tmp_path):
    """Strict metrics eval over shredded bounds: a DELETE whose extract()
    predicate strictly covers whole files drops them METADATA-ONLY (no
    rewrite — surviving files keep their identity), and rows where the
    path would be missing (companion null) block the strict claim."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    df = spark.range(0, 400).selectExpr(
        "id",
        "parse_json(concat('{\"len\": ', cast(id as string), '}')) as meta")
    t = cat.create_table("db.mdel", df.schema, properties={
        "write.variant.shred.meta": "$.len:long"})
    for lo in range(0, 400, 100):
        t.append(df.filter((F.col("id") >= lo) & (F.col("id") < lo + 100)))
    t = cat.load_table("db.mdel")
    before = {e.file.file_path for e in t.scan().plan_files().files}
    t.delete_where(E.extract("meta", "$.len", "long") >= 300)
    t = cat.load_table("db.mdel")
    after = {e.file.file_path for e in t.scan().plan_files().files}
    assert after < before, "files must be dropped, none rewritten"
    got = sorted(r.id for r in t.to_df().select("id").collect())
    assert got == list(range(300))
    # a predicate that only PARTIALLY covers a file still deletes
    # correctly (that file rewrites or MoR-deletes; rows exact)
    t.delete_where(E.extract("meta", "$.len", "long") >= 250)
    t = cat.load_table("db.mdel")
    got = sorted(r.id for r in t.to_df().select("id").collect())
    assert got == list(range(250))


def test_strict_eval_shredded_null_blocks(spark, tmp_path):
    """A file containing rows WITHOUT the shredded path (companion null)
    can never be strictly deleted by an extract() range predicate —
    those rows don't match the predicate and must survive."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    df = spark.range(0, 100).selectExpr(
        "id",
        "parse_json(case when id % 10 = 0 then '{}' else "
        "concat('{\"len\": ', cast(id as string), '}') end) as meta")
    t = cat.create_table("db.mdel2", df.schema, properties={
        "write.variant.shred.meta": "$.len:long"})
    t.append(df)
    t = cat.load_table("db.mdel2")
    t.delete_where(E.extract("meta", "$.len", "long") >= 0)
    t = cat.load_table("db.mdel2")
    got = sorted(r.id for r in t.to_df().select("id").collect())
    assert got == [i for i in range(100) if i % 10 == 0]


def test_shredded_filter_pushes_to_filescan(spark, tmp_path):
    """Residual conjuncts on declared paths rewrite onto the physical
    companion column: the executed plan shows a typed DataFilter on
    _shred_f<fid> inside the parquet FileScan (row-group skipping +
    codegen) instead of only a per-row variant_get."""
    _cat, t = _mk_table(spark, tmp_path, "push",
                        {"write.variant.shred.meta": "$.len:long"})
    sdf = t.scan(filter=E.extract("meta", "$.len", "long") >= 380).df()
    plan = sdf._jdf.queryExecution().executedPlan().toString()
    assert "_shred_f" in plan, plan[:500]
    assert set(sdf.columns) == {"id", "meta"}
    assert sorted(r.id for r in sdf.select("id").collect()) == \
        list(range(380, 400))


def test_shredded_pushdown_skipped_on_mixed_groups(spark, tmp_path):
    """Files without companion stats in a read group disable the
    rewrite for that group (the physical column may be absent) — rows
    still filter exactly through the variant residual."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    df = spark.range(0, 200).selectExpr(
        "id",
        "parse_json(concat('{\"len\": ', cast(id as string), '}')) as meta")
    t = cat.create_table("db.mixedpush", df.schema)
    t.append(df.filter(F.col("id") < 100))          # unshredded file
    t.set_properties(**{"write.variant.shred.meta": "$.len:long"})
    t = cat.load_table("db.mixedpush")
    t.append(df.filter(F.col("id") >= 100))         # shredded file
    t = cat.load_table("db.mixedpush")
    got = sorted(r.id for r in t.scan(
        filter=E.extract("meta", "$.len", "long") >= 50)
        .df().select("id").collect())
    assert got == list(range(50, 200))


def test_nested_path_shredding(spark, tmp_path):
    """Nested paths ($.a.b) shred end-to-end: companion via variant_get,
    manifest bounds, file pruning, and FileScan pushdown."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    df = spark.range(0, 200).selectExpr(
        "id",
        "parse_json(concat('{\"a\": {\"b\": ', cast(id as string),"
        " '}}')) as meta")
    t = cat.create_table("db.nested", df.schema, properties={
        "write.variant.shred.meta": "$.a.b:long"})
    t.append(df.filter(F.col("id") < 100))
    t.append(df.filter(F.col("id") >= 100))
    t = cat.load_table("db.nested")
    plan = t.scan(filter=E.extract("meta", "$.a.b", "long") >= 150)
    total = len(t.scan().plan_files().files)
    assert len(plan.plan_files().files) < total
    got = sorted(r.id for r in plan.df().select("id").collect())
    assert got == list(range(150, 200))


def test_shred_property_follows_rename(spark, tmp_path):
    """Renaming the variant column moves its shred declaration (and
    other name-keyed column properties); old manifests' bounds keep
    pruning because the synthetic ids key by FIELD ID + path."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    df = spark.range(0, 200).selectExpr(
        "id",
        "parse_json(concat('{\"len\": ', cast(id as string), '}')) as meta")
    t = cat.create_table("db.ren", df.schema, properties={
        "write.variant.shred.meta": "$.len:long"})
    t.append(df.filter(F.col("id") < 100))
    t = cat.load_table("db.ren")
    t.update_schema().rename_column("meta", "doc").commit()
    t = cat.load_table("db.ren")
    assert t.properties.get("write.variant.shred.doc") == "$.len:long"
    assert "write.variant.shred.meta" not in t.properties
    # new writes shred under the new name; old files' bounds still prune
    df2 = df.withColumnRenamed("meta", "doc")
    t.append(df2.filter(F.col("id") >= 100))
    t = cat.load_table("db.ren")
    plan = t.scan(filter=E.extract("doc", "$.len", "long") >= 150)
    total = len(t.scan().plan_files().files)
    assert len(plan.plan_files().files) < total
    got = sorted(r.id for r in plan.df().select("id").collect())
    assert got == list(range(150, 200))
    # the pre-rename file prunes on a low-range filter too (same fid)
    plan_lo = t.scan(filter=E.extract("doc", "$.len", "long") < 50)
    assert len(plan_lo.plan_files().files) < total
    assert plan_lo.df().count() == 50


@pytest.mark.parametrize("seed", [5, 42])
def test_shredded_vs_unshredded_differential(spark, tmp_path, seed):
    """Randomized twin-table differential: a SHREDDED table (pruning,
    FileScan pushdown, strict deletes active) and an UNSHREDDED twin
    must return identical rows for every random extract() filter —
    missing paths, deletes, string/double/long types included."""
    import random

    rng = random.Random(seed)
    cat = Catalog(spark, str(tmp_path / "wh"))
    df = spark.range(0, 400).selectExpr(
        "id",
        f"parse_json(case when id % {rng.randint(5, 17)} = 0 then '{{}}' "
        "else concat('{\"len\": ', cast(id as string),"
        " ', \"tag\": \"t', cast(id % 7 as string), '\"}') end) as meta")
    ts = cat.create_table("db.s", df.schema, properties={
        "write.variant.shred.meta": "$.len:long;$.tag:string"})
    tu = cat.create_table("db.u", df.schema)
    for lo in range(0, 400, 100):
        part = df.filter((F.col("id") >= lo) & (F.col("id") < lo + 100))
        ts.append(part)
        tu.append(part)
    ts, tu = cat.load_table("db.s"), cat.load_table("db.u")
    vic = rng.sample(range(400), 30)
    ts.delete_where(E.col("id").isin(vic))
    tu.delete_where(E.col("id").isin(vic))
    ts, tu = cat.load_table("db.s"), cat.load_table("db.u")
    for _ in range(4):
        k = rng.randint(0, 400)
        for flt in (E.extract("meta", "$.len", "long") >= k,
                    E.extract("meta", "$.len", "long") < k,
                    E.extract("meta", "$.tag", "string") == f"t{k % 7}"):
            a = sorted(r.id for r in
                       ts.scan(filter=flt).df().select("id").collect())
            b = sorted(r.id for r in
                       tu.scan(filter=flt).df().select("id").collect())
            assert a == b, (seed, str(flt), len(a), len(b))
