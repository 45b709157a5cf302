"""ORC / Avro file-format support (SURVEY §2.A: same surface per format)."""

import pytest
from pyspark.sql import Row

from iceberg_spark.expressions import col


def _seed(catalog, spark, fmt, ident):
    df = spark.createDataFrame(
        [Row(id=i, cat=("a" if i < 4 else "b"), v=float(i)) for i in range(8)])
    t = catalog.create_table(ident, df.schema, partition_by=["cat"],
                             properties={"write.format.default": fmt})
    t.append(df)
    return t


def test_orc_write_read_stats(catalog, spark):
    t = _seed(catalog, spark, "orc", "fmt.orc_t")
    entries = t.scan().plan_files().files
    assert all(e.file.file_format == "orc" for e in entries)
    assert all(e.file.file_path.endswith(".orc") for e in entries)
    # metrics collected via the Spark stats job -> min/max pruning works
    rep = t.scan(filter=col("id") >= 6).explain_plan()
    assert rep["skipped_data_files"] + rep["result_data_files"] \
        == rep["total_data_files"]
    assert rep["skipped_data_files"] > 0
    rows = t.scan(filter=col("id") >= 6).df().collect()
    assert sorted(r.id for r in rows) == [6, 7]


def test_orc_cow_delete_and_update(catalog, spark):
    t = _seed(catalog, spark, "orc", "fmt.orc_cow")
    t.delete_where(col("id") == 3, mode="copy-on-write")
    t.update(col("id") == 4, {"v": "v + 100"}, mode="copy-on-write")
    rows = {r.id: r.v for r in t.to_df().collect()}
    assert 3 not in rows and rows[4] == 104.0


def test_orc_mor_read_raises_clearly(catalog, spark):
    t = _seed(catalog, spark, "orc", "fmt.orc_mor")
    with pytest.raises(ValueError, match="parquet"):
        t.delete_where(col("id") == 1, mode="merge-on-read")


def _avro_available(spark):
    try:
        import tempfile

        d = tempfile.mkdtemp()
        spark.createDataFrame([Row(x=1)]).write.format("avro").save(d + "/t")
        return True
    except Exception:
        return False


def test_avro_write_read(catalog, spark):
    if not _avro_available(spark):
        pytest.skip("spark-avro not on the classpath")
    t = _seed(catalog, spark, "avro", "fmt.avro_t")
    rows = t.to_df().collect()
    assert len(rows) == 8
