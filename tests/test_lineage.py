"""Row lineage (v3, format/spec.md:460-546): first_row_id inheritance at
commit, _row_id/_last_updated_sequence_number at read."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from iceberg_spark.expressions import col


def _seed(catalog, spark, ident="lin.t", **props):
    df = spark.createDataFrame(
        [Row(id=i, v=float(i)) for i in range(5)])
    t = catalog.create_table(ident, df.schema,
                             properties=props or None)
    t.append(df)
    return t


def test_append_assigns_first_row_ids(catalog, spark):
    t = _seed(catalog, spark)
    t.append(spark.createDataFrame([Row(id=10, v=10.0), Row(id=11, v=11.0)]))
    entries = t.scan().plan_files().files
    by_first = sorted((e.file.first_row_id, e.file.record_count) for e in entries)
    # contiguous, non-overlapping ranges starting at 0
    expect = 0
    for first, cnt in by_first:
        assert first == expect
        expect += cnt
    assert t.metadata.next_row_id == 7


def test_row_id_and_last_updated_seq(catalog, spark):
    t = _seed(catalog, spark)
    t.append(spark.createDataFrame([Row(id=10, v=10.0)]))
    rows = t.to_df(with_lineage=True).orderBy("_row_id").collect()
    assert [r._row_id for r in rows] == list(range(6))
    # first append at seq 1, second at seq 2
    assert {r._last_updated_sequence_number for r in rows[:5]} == {1}
    assert rows[5]._last_updated_sequence_number == 2


def test_row_id_stable_under_mor_delete(catalog, spark):
    t = _seed(catalog, spark, **{"write.delete.mode": "merge-on-read"})
    before = {r.id: r._row_id
              for r in t.to_df(with_lineage=True).collect()}
    t.delete_where(col("id") == 2, mode="merge-on-read")
    after = {r.id: r._row_id for r in t.to_df(with_lineage=True).collect()}
    assert 2 not in after
    for k, v in after.items():
        assert before[k] == v  # surviving rows keep their _row_id


def test_lineage_survives_json_roundtrip(catalog, spark):
    t = _seed(catalog, spark)
    t2 = catalog.load_table("lin.t")
    assert t2.metadata.next_row_id == 5
    entries = t2.scan().plan_files().files
    assert all(e.file.first_row_id is not None for e in entries)


def test_cow_update_preserves_row_ids(catalog, spark):
    t = _seed(catalog, spark, "lin.cow")
    before = {r.id: r._row_id for r in t.to_df(with_lineage=True).collect()}
    t.update(col("id") == 2, {"v": "v + 100"}, mode="copy-on-write")
    rows = {r.id: (r._row_id, r._last_updated_sequence_number)
            for r in t.to_df(with_lineage=True).collect()}
    # updated row keeps its _row_id, gets the new commit's sequence number
    assert rows[2][0] == before[2] and rows[2][1] == 2
    # untouched rows keep id AND original sequence number
    for k in (0, 1, 3, 4):
        assert rows[k] == (before[k], 1)


def test_merge_preserves_and_assigns_row_ids(catalog, spark):
    t = _seed(catalog, spark, "lin.mrg")
    before = {r.id: r._row_id for r in t.to_df(with_lineage=True).collect()}
    src = spark.createDataFrame([Row(id=1, v=111.0), Row(id=42, v=42.0)])
    (t.merge(src, ["id"])
      .when_matched_update(set={"v": "s.v"})
      .when_not_matched_insert()
      .execute(mode="copy-on-write"))
    rows = {r.id: (r._row_id, r._last_updated_sequence_number)
            for r in t.to_df(with_lineage=True).collect()}
    assert rows[1][0] == before[1] and rows[1][1] == 2  # updated: id kept
    for k in (0, 2, 3, 4):  # untouched: id + seq kept
        assert rows[k] == (before[k], 1)
    assert rows[42][0] is not None  # insert: fresh id
    assert rows[42][0] not in before.values()


def test_compaction_preserves_row_ids(catalog, spark):
    t = _seed(catalog, spark, "lin.cmp")
    t.append(spark.createDataFrame([Row(id=10, v=10.0), Row(id=11, v=11.0)]))
    before = {r.id: (r._row_id, r._last_updated_sequence_number)
              for r in t.to_df(with_lineage=True).collect()}
    res = t.rewrite_data_files(strategy="binpack", min_input_files=2)
    assert res["rewritten_files"] >= 2
    after = {r.id: (r._row_id, r._last_updated_sequence_number)
             for r in t.to_df(with_lineage=True).collect()}
    assert after == before
