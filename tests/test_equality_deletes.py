"""Equality deletes (format/spec.md:1415): writer, sequence scoping,
target-read-free upsert, plan-time key-range pruning."""

from pyspark.sql import Row

from iceberg_spark.expressions import col
from iceberg_spark.row_ops import equality_upsert


def _seed(catalog, spark, ident="eq.t"):
    df = spark.createDataFrame(
        [Row(id=i, v=float(i)) for i in range(10)])
    t = catalog.create_table(ident, df.schema)
    t.append(df)
    return t


def test_equality_upsert_semantics(catalog, spark):
    t = _seed(catalog, spark)
    # upsert: replace ids 3,4 and add 100 — no target read
    up = spark.createDataFrame(
        [Row(id=3, v=300.0), Row(id=4, v=400.0), Row(id=100, v=1.0)])
    t.upsert(up, keys=["id"])
    raw = t.to_df().collect()
    assert len(raw) == 11  # no duplicate key rows survive
    rows = {r.id: r.v for r in raw}
    assert rows[3] == 300.0 and rows[4] == 400.0 and rows[100] == 1.0
    # second upsert hits rows written by the first (seq scoping chain)
    t.upsert(spark.createDataFrame([Row(id=3, v=333.0)]), keys=["id"])
    raw = t.to_df().collect()
    assert len(raw) == 11
    assert {r.id: r.v for r in raw}[3] == 333.0


def test_eq_delete_files_in_plan(catalog, spark):
    t = _seed(catalog, spark, "eq.plan")
    t.upsert(spark.createDataFrame([Row(id=5, v=55.0)]), keys=["id"])
    plan = t.scan().plan_files()
    assert len(plan.eq_deletes) == 1
    d = plan.eq_deletes[0].file
    assert d.equality_ids and d.record_count == 1
    # key stats present -> range scoping possible
    assert d.stats["id"][0] == 5 and d.stats["id"][1] == 5


def test_eq_delete_key_range_pruning(catalog, spark):
    df = spark.createDataFrame([Row(id=i, p=i // 5, v=float(i)) for i in range(10)])
    t = catalog.create_table("eq.part", df.schema, partition_by=["p"])
    t.append(df)
    # upsert touches only ids 0..2 (partition 0's range)
    t.upsert(spark.createDataFrame(
        [Row(id=i, p=0, v=-1.0) for i in range(3)]), keys=["id"])
    # scan of partition 1 (ids 5..9): delete file's id range [0,2] is
    # disjoint -> planner must drop it
    plan = t.scan(filter=col("p") == 1).plan_files()
    assert plan.report.result_delete_files == 0
    rows = t.scan(filter=col("p") == 1).df().collect()
    assert sorted(r.v for r in rows) == [5.0, 6.0, 7.0, 8.0, 9.0]
    # partition 0 applies it
    rows0 = {r.id: r.v for r in t.scan(filter=col("p") == 0).df().collect()}
    assert rows0[0] == -1.0 and rows0[3] == 3.0


def test_equality_upsert_sink_idempotent(catalog, spark):
    t = _seed(catalog, spark, "eq.sink")
    from iceberg_spark.streaming import equality_upsert_sink

    fn = equality_upsert_sink(t, keys=["id"], query_id="q1")
    batch = spark.createDataFrame([Row(id=1, v=11.0), Row(id=200, v=2.0)])
    fn(batch, 0)
    fn(batch, 0)  # same epoch replayed -> no-op
    t = catalog.load_table("eq.sink")
    rows = {r.id: r.v for r in t.to_df().collect()}
    assert rows[1] == 11.0 and rows[200] == 2.0 and len(rows) == 11
    assert len(t.snapshots()) == 2  # seed + one upsert commit


def test_changelog_over_equality_upsert(catalog, spark):
    t = _seed(catalog, spark, "eq.cdc")
    first = t.current_snapshot().snapshot_id
    t.upsert(spark.createDataFrame([Row(id=2, v=22.0), Row(id=50, v=5.0)]),
             keys=["id"])
    ch = t.changes(from_snapshot_id=first).collect()
    by_type = {}
    for r in ch:
        by_type.setdefault(r._change_type, []).append((r.id, r.v))
    assert sorted(by_type["INSERT"]) == [(2, 22.0), (50, 5.0)]
    assert by_type["DELETE"] == [(2, 2.0)]  # old row killed by the eq delete
    # update pairing turns the delete+insert on id=2 into UPDATE_BEFORE/AFTER
    ch2 = t.changes(from_snapshot_id=first, compute_updates=True,
                    identifier_columns=["id"]).collect()
    types = {r._change_type for r in ch2 if r.id == 2}
    assert types == {"UPDATE_BEFORE", "UPDATE_AFTER"}


def test_upsert_in_batch_duplicate_keys(catalog, spark):
    # ADVICE r1: same-key rows within one batch must collapse (last wins,
    # matching equality_upsert_sink) — eq deletes only scope to older seqs
    t = _seed(catalog, spark, "eq.dup")
    up = spark.createDataFrame(
        [Row(id=3, v=30.0), Row(id=3, v=31.0), Row(id=200, v=2.0)])
    t.upsert(up, keys=["id"])
    raw = t.to_df().collect()
    assert len(raw) == 11  # one survivor for id=3
    assert {r.id: r.v for r in raw}[3] == 31.0


def test_eq_deletes_survive_column_rename(catalog, spark):
    """Eq-delete files written before a rename read by their WRITE-time
    column name (field-ID mapped); reading by the current name would
    silently return all-NULL keys and delete nothing."""
    from pyspark.sql import types as T

    from iceberg_spark.row_ops import write_equality_deletes
    from iceberg_spark.writes import RowDelta

    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("v", T.StringType())])
    t = catalog.create_table("db.eqren", schema)
    t.append(spark.createDataFrame([(i, f"v{i}") for i in range(10)], schema))
    keys = spark.createDataFrame([(2,), (5,)], "id long")
    eq_files = write_equality_deletes(t, keys, ["id"])
    RowDelta(t, [], eq_files).commit()
    t = t.refresh()
    t.update_schema().rename_column("id", "id2").commit()
    t = t.refresh()
    got = sorted(r.id2 for r in t.to_df().collect())
    assert got == [i for i in range(10) if i not in (2, 5)]


def test_upsert_eq_deletes_survive_column_rename(catalog, spark):
    """Same-commit upsert deletes (non-uniform seq path) also read by the
    WRITE-time key column name after a rename."""
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("v", T.StringType())])
    t = catalog.create_table("db.eqren2", schema)
    t.append(spark.createDataFrame([(i, f"v{i}") for i in range(8)], schema))
    t.upsert(spark.createDataFrame([(3, "NEW3"), (100, "NEW100")], schema),
             keys=["id"])
    t = t.refresh()
    t.update_schema().rename_column("id", "id2").commit()
    t = t.refresh()
    got = {r.id2: r.v for r in t.to_df().collect()}
    assert got[3] == "NEW3" and got[100] == "NEW100"
    assert len(got) == 9


def test_partition_scoped_equality_deletes(catalog, spark):
    """When spec source columns are a subset of the delete key columns,
    equality deletes fan out partition-scoped (Flink equality-writer
    shape): tuples recorded, partition-pruned scans attach none."""
    from pyspark.sql import types as T

    from iceberg_spark import col
    from iceberg_spark.row_ops import write_equality_deletes
    from iceberg_spark.writes import RowDelta

    schema = T.StructType([T.StructField("grp", T.IntegerType()),
                           T.StructField("id", T.LongType()),
                           T.StructField("v", T.StringType())])
    t = catalog.create_table("db.eqpart", schema, partition_by=["grp"])
    t.append(spark.createDataFrame(
        [(i % 3, i, f"v{i}") for i in range(30)], schema))
    keys = spark.createDataFrame([(0, 0), (1, 1)], "grp int, id long")
    dels = write_equality_deletes(t, keys, ["grp", "id"])
    assert all(d.partition.get("grp") is not None for d in dels)
    RowDelta(t, [], dels).commit()
    t = t.refresh()
    assert t.to_df().count() == 28
    # scan of an untouched partition attaches ZERO equality deletes
    plan = t.scan(filter=col("grp") == 2).plan_files()
    assert plan.files and not plan.eq_deletes
    # touched partition attaches only its own partition's delete file
    plan1 = t.scan(filter=col("grp") == 1).plan_files()
    assert all(d.file.partition.get("grp") == 1 for d in plan1.eq_deletes)
    assert t.scan(filter=col("grp") == 1).df().count() == 9


def test_eq_literal_filter_fast_path(catalog, spark):
    """Small single-key delete sets committed AFTER the data (uniform
    sequence layout) apply as a codegen'd NOT-IN filter — no join stage
    in the plan — with anti-join-identical semantics, including NULL
    keys: a NULL delete key removes NULL rows (eqNullSafe), and NULL
    data rows survive otherwise."""
    from pyspark.sql import types as T

    from iceberg_spark.row_ops import write_equality_deletes
    from iceberg_spark.writes import RowDelta

    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("v", T.DoubleType())])
    t = catalog.create_table("eq.lit", schema)
    t.append(spark.createDataFrame(
        [(i, float(i)) for i in range(10)] + [(None, 99.0)], schema))
    dels = write_equality_deletes(
        t, spark.createDataFrame([(3,), (7,)], ["id"]), ["id"])
    RowDelta(t, [], dels).commit()
    t = t.refresh()
    df = t.to_df()
    assert "Join" not in df._jdf.queryExecution().executedPlan().toString()
    got = sorted((r.id, r.v) for r in df.collect()
                 if r.id is not None)
    assert [g[0] for g in got] == [0, 1, 2, 4, 5, 6, 8, 9]
    assert df.filter("id is null").count() == 1  # NULL row survives

    # now delete the NULL key: eqNullSafe removes the NULL row too
    dels2 = write_equality_deletes(
        t, spark.createDataFrame([(None,)], schema["id"].dataType and
                                 T.StructType([schema["id"]])), ["id"])
    RowDelta(t, [], dels2).commit()
    t = t.refresh()
    assert t.to_df().filter("id is null").count() == 0
    assert t.to_df().count() == 8


def test_eq_literal_filter_falls_back_when_big(catalog, spark):
    """Above the driver-bytes cap the distributed anti-join applies —
    same result either way (the cap only picks the strategy)."""
    from pyspark.sql import types as T

    from iceberg_spark.row_ops import write_equality_deletes
    from iceberg_spark.writes import RowDelta

    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("v", T.DoubleType())])
    t = catalog.create_table("eq.big", schema)
    t.append(spark.createDataFrame([(i, float(i)) for i in range(50)],
                                   schema))
    dels = write_equality_deletes(
        t, spark.createDataFrame([(i,) for i in range(0, 50, 5)], ["id"]),
        ["id"])
    RowDelta(t, [], dels).commit()
    t = t.refresh()
    spark.conf.set("spark.iceberg_spark.mor.eqDeleteDriverBytes", "1")
    try:
        df = t.to_df()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Join" in plan  # anti-join path
        assert df.count() == 40
    finally:
        spark.conf.unset("spark.iceberg_spark.mor.eqDeleteDriverBytes")
    assert t.to_df().count() == 40  # literal path agrees
