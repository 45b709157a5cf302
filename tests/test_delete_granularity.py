"""write.delete.granularity=file — one position-delete file per
referenced data file (reference core/.../deletes/DeleteGranularity.java,
TableProperties.java:439): exact delete attachment via
referenced_data_file, never the file_path-range heuristic."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_spark import col


def _simple(catalog, spark, name, n=100, files=4, **kw):
    schema = T.StructType([
        T.StructField("id", T.LongType()), T.StructField("v", T.StringType())
    ])
    t = catalog.create_table(name, schema, **kw)
    per = n // files
    for i in range(files):
        t.append(spark.createDataFrame(
            [(j, f"v{j}") for j in range(i * per, (i + 1) * per)],
            schema).coalesce(1))
    return t, schema


def test_file_granularity_one_delete_per_data_file(catalog, spark):
    t, _ = _simple(catalog, spark, "db.fgran", 100, 4, properties={
        "write.delete.mode": "merge-on-read",
        "write.delete.granularity": "file"})
    # rows from exactly 2 of the 4 files (ids 0-24, 25-49)
    t.delete_where(col("id").isin([3, 7, 30]))
    t = t.refresh()
    plan = t.scan().plan_files()
    dels = plan.pos_deletes
    assert len(dels) == 2  # one delete file per touched data file
    refs = {d.file.referenced_data_file for d in dels}
    data_paths = {e.file.file_path for e in plan.files}
    assert refs <= data_paths
    for d in dels:
        st = d.file.stats["file_path"]
        assert st[0] == st[1] == d.file.referenced_data_file
    assert t.to_df().count() == 97
    assert t.to_df().filter(F.col("id").isin([3, 7, 30])).count() == 0


def test_file_granularity_exact_attach_prunes_unrelated(catalog, spark):
    """A scan touching only undeleted files attaches ZERO deletes —
    referenced_data_file pruning is exact, not range-heuristic."""
    t, _ = _simple(catalog, spark, "db.fgranprune", 100, 4, properties={
        "write.delete.mode": "merge-on-read",
        "write.delete.granularity": "file"})
    t.delete_where(col("id") < 5)  # only the first file
    t = t.refresh()
    plan = t.scan(filter=col("id") >= 50).plan_files()
    assert plan.files
    assert not plan.pos_deletes
    assert t.scan(filter=col("id") >= 50).df().count() == 50


def test_file_granularity_partitioned_carries_partition_tuple(catalog, spark):
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("grp", T.IntegerType()),
        T.StructField("v", T.StringType())])
    t = catalog.create_table("db.fgranpart", schema,
                             partition_by=["grp"],
                             properties={
                                 "write.delete.mode": "merge-on-read",
                                 "write.delete.granularity": "file"})
    t.append(spark.createDataFrame(
        [(j, j % 2, f"v{j}") for j in range(40)], schema))
    t.delete_where(col("id").isin([0, 1]))  # one row in each partition
    t = t.refresh()
    plan = t.scan().plan_files()
    assert plan.pos_deletes
    for d in plan.pos_deletes:
        assert d.file.referenced_data_file is not None
        assert "grp" in d.file.partition
    # partition-scoped scan only attaches its own partition's deletes
    sub = t.scan(filter=col("grp") == 0).plan_files()
    assert all(d.file.partition.get("grp") == 0 for d in sub.pos_deletes)
    assert t.to_df().count() == 38


def test_file_granularity_update_and_merge(catalog, spark):
    t, schema = _simple(catalog, spark, "db.fgranupd", 60, 3, properties={
        "write.delete.mode": "merge-on-read",
        "write.update.mode": "merge-on-read",
        "write.merge.mode": "merge-on-read",
        "write.delete.granularity": "file"})
    t.update(col("id") == 10, {"v": F.lit("updated")})
    t = t.refresh()
    assert t.to_df().filter(F.col("id") == 10).collect()[0]["v"] == "updated"
    for d in t.scan().plan_files().pos_deletes:
        assert d.file.referenced_data_file is not None
    assert t.to_df().count() == 60


def test_file_granularity_encrypted(spark, tmp_path):
    from iceberg_spark import parquet_crypto as PC
    from iceberg_spark.table import Catalog

    key, key_id = bytes(range(16)), "fgran-master-key"
    PC.register_key(key_id, key)
    try:
        cat = Catalog(spark, str(tmp_path))
        t, _ = _simple(cat, spark, "db.fgranenc", 40, 2, properties={
            "write.delete.mode": "merge-on-read",
            "write.delete.granularity": "file",
            PC.KEY_ID_PROP: key_id})
        t.delete_where(col("id") < 3)
        t = t.refresh()
        dels = t.scan().plan_files().pos_deletes
        assert dels and all(d.file.key_metadata for d in dels)
        assert all(d.file.referenced_data_file for d in dels)
        # delete parquet footers are actually encrypted on disk
        import glob as _g
        import os as _os

        import pyarrow.parquet as pq
        fdel = [p for p in _g.glob(_os.path.join(
            t.location, "data", "**", "fdel-*.parquet"), recursive=True)]
        assert fdel
        with pytest.raises(Exception):
            pq.read_table(fdel[0])
        assert t.to_df().count() == 37
    finally:
        PC.unregister_key(key_id)


def test_file_granularity_compaction_roundtrip(catalog, spark):
    """Compaction applies file-granularity deletes and drops them."""
    t, _ = _simple(catalog, spark, "db.fgranpack", 80, 4, properties={
        "write.delete.mode": "merge-on-read",
        "write.delete.granularity": "file"})
    t.delete_where(col("id") < 10)
    t = t.refresh()
    assert t.scan().plan_files().pos_deletes
    t.rewrite_data_files(strategy="binpack")
    t = t.refresh()
    assert not t.scan().plan_files().pos_deletes
    assert t.to_df().count() == 70


def test_rewrite_regroups_to_file_granularity(catalog, spark):
    """rewrite_position_delete_files honors the CURRENT granularity
    property (reference RewritePositionDeleteFilesSparkAction writes at
    the table's configured granularity): partition-grouped deletes
    regroup into one file per referenced data file."""
    from iceberg_spark.maintenance import rewrite_position_delete_files

    t, _ = _simple(catalog, spark, "db.fgranrw", 80, 4, properties={
        "write.delete.mode": "merge-on-read"})
    t.delete_where(col("id").isin([1, 21, 41, 61]))  # one row per file
    t = t.refresh()
    before = t.scan().plan_files().pos_deletes
    assert any(d.file.referenced_data_file is None for d in before)
    t.set_properties(**{"write.delete.granularity": "file"})
    t = t.refresh()
    res = rewrite_position_delete_files(t)
    assert res["added_delete_files"] == 4
    t = t.refresh()
    after = t.scan().plan_files().pos_deletes
    assert len(after) == 4
    assert all(d.file.referenced_data_file for d in after)
    assert t.to_df().count() == 76


def test_invalid_granularity_rejected(catalog, spark):
    """DeleteGranularity.fromString rejects unknown values — a typo must
    fail loudly, not silently fall back to partition layout."""
    t, _ = _simple(catalog, spark, "db.fgran_bad", 20, 2, properties={
        "write.delete.mode": "merge-on-read",
        "write.delete.granularity": "files"})  # typo
    with pytest.raises(ValueError, match="granularity"):
        t.delete_where(col("id") == 3)
