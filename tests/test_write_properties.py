"""write.parquet.* table properties reach the parquet writer
(TableProperties.java parity: compression codec, row-group size,
per-column bloom filters)."""

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import Row


def _files(t):
    return [e.file.file_path for e in t.scan().plan_files().files]


def test_compression_codec_property(catalog, spark):
    df = spark.createDataFrame([Row(id=i, v=f"x{i}") for i in range(1000)])
    t = catalog.create_table(
        "props.zstd", df.schema,
        properties={"write.parquet.compression-codec": "zstd"})
    t.append(df)
    md = pq.ParquetFile(_files(t)[0]).metadata
    assert md.row_group(0).column(0).compression == "ZSTD"


def test_row_group_size_property(catalog, spark):
    df = spark.createDataFrame(
        [Row(id=i, payload="p" * 200) for i in range(20000)])
    t = catalog.create_table(
        "props.rg", df.schema,
        properties={"write.parquet.row-group-size-bytes": "65536",
                    "write.parquet.page-size-bytes": "16384"})
    t.append(df.coalesce(1))
    md = pq.ParquetFile(_files(t)[0]).metadata
    assert md.num_row_groups > 1  # default 128MB would give exactly 1


def test_bloom_filter_property(catalog, spark):
    df = spark.createDataFrame([Row(id=i, v=i * 2) for i in range(5000)])
    t = catalog.create_table(
        "props.bloom", df.schema,
        properties={"write.parquet.bloom-filter-enabled.column.id": "true"})
    t.append(df.coalesce(1))
    t2 = catalog.create_table("props.nobloom", df.schema)
    t2.append(df.coalesce(1))
    # pyarrow (this build) doesn't surface bloom offsets; identical data
    # with the filter enabled must serialize strictly larger
    with_bloom = os.path.getsize(_files(t)[0])
    without = os.path.getsize(_files(t2)[0])
    assert with_bloom > without + 1000, (with_bloom, without)
    # ndv/fpp tuning knobs (TableProperties.java:184-199): a tiny expected
    # ndv + loose fpp must shrink the filter vs the 5000-distinct default
    t3 = catalog.create_table(
        "props.bloomsmall", df.schema,
        properties={"write.parquet.bloom-filter-enabled.column.id": "true",
                    "write.parquet.bloom-filter-ndv.column.id": "50",
                    "write.parquet.bloom-filter-fpp.column.id": "0.1"})
    t3.append(df.coalesce(1))
    small_bloom = os.path.getsize(_files(t3)[0])
    assert without < small_bloom < with_bloom, \
        (without, small_bloom, with_bloom)


def test_fanout_write_one_file_per_partition(catalog, spark):
    """A dynamic-partition append produces exactly one file per partition
    value (hash routing co-locates each value in one task) and the fanout
    stage runs wide — a column-only repartition would let AQE collapse it
    to one serial task (writes.write_data_files pinned-N regression)."""
    import datetime as dt

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
    ])
    rows = [(i, dt.datetime(2024, 1, 1) + dt.timedelta(days=i % 40))
            for i in range(400)]
    df = spark.createDataFrame(rows, schema)
    t = catalog.create_table("db.fanout", df.schema, partition_by=["day(ts)"])
    t.append(df)
    files = _files(t)
    assert len(files) == 40, f"expected one file per day, got {len(files)}"
    parts = {e.file.partition["ts_day"]
             for e in t.scan().plan_files().files}
    assert len(parts) == 40


def test_fanout_write_1000_values_no_file_multiplication(catalog, spark):
    """A 1,000-value dynamic-partition append must produce EXACTLY one
    file per partition value (the Iceberg floor — each data file carries
    one partition tuple) with hash routing keeping every value in one
    task; a width-only repartition would write up to width x values
    files."""
    import datetime as dt

    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
    ])
    rows = [(i, dt.datetime(2021, 1, 1) + dt.timedelta(days=i % 1000))
            for i in range(10000)]
    df = spark.createDataFrame(rows, schema)
    t = catalog.create_table("db.fanout1k", df.schema, partition_by=["day(ts)"])
    t.append(df)
    files = _files(t)
    assert len(files) == 1000, f"expected 1000 files, got {len(files)}"
    # and the tiny files consolidate through compaction
    from iceberg_spark.maintenance import rewrite_data_files

    res = rewrite_data_files(t)
    t = t.refresh()
    after = _files(t)
    assert len(after) == 1000  # identity-day partitions: floor unchanged
    assert t.to_df().count() == 10000
