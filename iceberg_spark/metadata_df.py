"""Distributed metadata reads: the manifest tree as Spark DataFrames.

Manifests and manifest lists are stored as Parquet (SURVEY §7 design
stance), so metadata-scale computations — reachability for
expire/reachable-purge, valid-file sets for orphan cleanup, the
files/entries metadata tables, changelog planning — run as plain
`spark.read.parquet` jobs over the manifest files with anti-joins. This is
the shape of the reference's Spark actions
(spark/v4.0/spark/src/main/java/org/apache/iceberg/spark/actions/
ExpireSnapshotsSparkAction.java, DeleteOrphanFilesSparkAction.java:257-358)
and metadata tables (core/.../BaseFilesTable.java). Only manifest LISTS
(one small Parquet per snapshot) are read driver-side, as in the reference.

Mode selection mirrors scan planning (BaseDistributedDataScan LOCAL /
DISTRIBUTED / AUTO): below `DISTRIBUTED_ENTRY_THRESHOLD` total entries the
driver-side Python set math is faster than a Spark job; above it, the
DataFrame path keeps driver memory flat no matter how many snapshots or
files the table has.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .manifests import entry_from_spark_row, read_manifest_list

# total manifest entries below which driver-side set math beats a Spark job
DISTRIBUTED_ENTRY_THRESHOLD = 200_000

# columns present in EVERY manifest parquet regardless of schema/spec
# (manifest_arrow_schema core prefix)
CORE_ENTRY_SCHEMA = T.StructType([
    T.StructField("status", T.IntegerType()),
    T.StructField("snapshot_id", T.LongType()),
    T.StructField("sequence_number", T.LongType()),
    T.StructField("content", T.IntegerType()),
    T.StructField("file_path", T.StringType()),
    T.StructField("file_format", T.StringType()),
    T.StructField("spec_id", T.IntegerType()),
    T.StructField("record_count", T.LongType()),
    T.StructField("file_size_in_bytes", T.LongType()),
    T.StructField("equality_ids", T.ArrayType(T.IntegerType())),
    T.StructField("referenced_data_file", T.StringType()),
])


def unique_manifests(snapshots) -> list:
    """Deduped manifest-list rows across snapshots (driver-side: manifest
    lists are the smallest metadata tier; the reference reads them on the
    driver too)."""
    out, seen = [], set()
    for s in snapshots:
        for mf in read_manifest_list(s.manifest_list):
            if mf.path not in seen:
                seen.add(mf.path)
                out.append(mf)
    return out


def entry_count(manifests) -> int:
    """Total entries across manifests, from manifest-list counts alone (no
    manifest reads) — drives the AUTO local/distributed decision."""
    return sum(m.added_files_count + m.existing_files_count +
               m.deleted_files_count for m in manifests)


def resolve_path_col(c, location: Optional[str]):
    """Column twin of metadata.resolve_path (v4 relative paths)."""
    if location is None:
        return c
    prefix = location.rstrip("/") + "/"
    return F.when(
        c.isNull() | c.startswith("/") | c.contains("://"), c
    ).otherwise(F.concat(F.lit(prefix), c))


def manifest_path_col(paths=None):
    """Normalized source-manifest path of each entry row (decodes the
    percent-escaped URI — a warehouse directory with a space would
    otherwise never match; pass the manifest path list to license the
    cheap scheme-strip when nothing needs escaping)."""
    from .io import decode_spark_path_col

    return decode_spark_path_col(F.col("_metadata.file_path"), paths=paths)


def core_entries_df(spark: SparkSession, manifests, location: Optional[str],
                    with_manifest_path: bool = False) -> Optional[DataFrame]:
    """One distributed read of the core entry columns across ALL manifests
    (every spec/schema shares them). `file_path`/`referenced_data_file` are
    resolved against the table location. Returns None when there are no
    manifests."""
    if not manifests:
        return None
    paths = [m.path for m in manifests]
    df = spark.read.schema(CORE_ENTRY_SCHEMA).parquet(*paths)
    cols = [
        resolve_path_col(F.col("file_path"), location).alias("file_path"),
        resolve_path_col(F.col("referenced_data_file"),
                         location).alias("referenced_data_file"),
        *[F.col(n) for n in CORE_ENTRY_SCHEMA.fieldNames()
          if n not in ("file_path", "referenced_data_file")],
    ]
    if with_manifest_path:
        cols.append(manifest_path_col(paths).alias("manifest_path"))
    return df.select(*cols)


def reachable_data_paths_df(spark: SparkSession, manifests,
                            location: Optional[str]) -> Optional[DataFrame]:
    """Distinct file paths (data + delete content) reachable through the
    given manifests — the DataFrame leg of reachability."""
    df = core_entries_df(spark, manifests, location)
    if df is None:
        return None
    return df.select("file_path").distinct()


def collect_entries_spark(table, manifests, row_filter=None,
                          statuses=None) -> list:
    """Collect full ManifestEntry objects through a Spark read of the given
    manifests (per-spec groups so partition/stats columns line up). Used by
    surfaces that need plan-sized entry lists without per-manifest driver
    reads. `row_filter` is an optional Column over the manifest columns."""
    m = table.metadata
    schema = m.schema
    by_spec: dict = {}
    for mf in manifests:
        by_spec.setdefault(mf.spec_id, []).append(mf.path)
    out = []
    for spec_id, paths in by_spec.items():
        spec = m.spec_by_id(spec_id)
        df = table.spark.read.option("mergeSchema", "true").parquet(*paths)
        if statuses is not None:
            df = df.filter(F.col("status").isin(list(statuses)))
        if row_filter is not None:
            df = df.filter(row_filter)
        for r in df.collect():
            out.append(entry_from_spark_row(r.asDict(), schema, spec,
                                            m.location))
    return out


# ---------------------------------------------------------------------------
# distributed file-system listing (DeleteOrphanFilesSparkAction.listDirRecursively)
# ---------------------------------------------------------------------------


def _walk_with_mtime(d: str) -> list:
    from .io import resolve_io

    return [(p, m) for p, m in resolve_io(d).walk_file_status(d)
            if m is not None]


_LISTING_SCHEMA = T.StructType([
    T.StructField("actual_path", T.StringType()),
    T.StructField("mtime", T.DoubleType()),
])


def listing_df(spark: SparkSession, base: str) -> DataFrame:
    """Recursive file listing under `base` as a DataFrame: first-level
    directories are parallelized across executors (the reference lists
    orphan candidates the same way), files at the root are appended
    driver-side."""
    top_files, dirs = [], []
    if os.path.isdir(base):
        for de in os.scandir(base):
            if de.is_dir(follow_symlinks=False):
                dirs.append(de.path)
            else:
                try:
                    top_files.append((os.path.normpath(de.path),
                                      de.stat().st_mtime))
                except OSError:
                    pass
    pieces = []
    if dirs:
        rdd = spark.sparkContext.parallelize(
            dirs, min(len(dirs), 64)).flatMap(_walk_with_mtime)
        pieces.append(spark.createDataFrame(rdd, _LISTING_SCHEMA))
    pieces.append(spark.createDataFrame(top_files, _LISTING_SCHEMA))
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# files/entries metadata-table builders (BaseFilesTable.java as a Spark scan)
# ---------------------------------------------------------------------------


def _json_value_col(c, typ: str):
    """Column twin of manifests.value_to_json: tagged struct for types whose
    JSON form is a wrapper, raw column otherwise."""
    if not isinstance(typ, str):
        return c
    if typ == "date":
        tagged = F.struct(F.lit("d").alias("t"), c.cast("string").alias("v"))
    elif typ in ("timestamp", "timestamp_ntz"):
        base = F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss")
        frac = F.date_format(c, "SSSSSS")
        iso = F.when(frac != F.lit("000000"),
                     F.concat(base, F.lit("."), frac)).otherwise(base)
        tagged = F.struct(F.lit("ts").alias("t"), iso.alias("v"))
    elif typ.startswith("decimal"):
        tagged = F.struct(F.lit("dec").alias("t"), c.cast("string").alias("v"))
    elif typ in ("binary",) or typ.startswith("fixed"):
        tagged = F.struct(F.lit("b").alias("t"), F.lower(F.hex(c)).alias("v"))
    else:
        return c
    return F.when(c.isNull(), F.lit(None)).otherwise(tagged)


def entries_table_df(table, snapshots, statuses=None,
                     contents=None) -> DataFrame:
    """The files/entries metadata tables as a distributed scan of the
    manifest Parquet (core/.../BaseFilesTable.java analog). Output schema
    matches metadata_tables._FILES_SCHEMA: partition and column_stats are
    JSON strings ({"col": {"min":..,"max":..,"nulls":..,"nans":..,
    "values":..}} for stats — the readable_metrics shape)."""
    m = table.metadata
    spark = table.spark
    schema = m.schema
    manifests = unique_manifests(snapshots)
    out_schema = T.StructType([
        T.StructField("status", T.IntegerType()),
        T.StructField("snapshot_id", T.LongType()),
        T.StructField("sequence_number", T.LongType()),
        T.StructField("content", T.IntegerType()),
        T.StructField("file_path", T.StringType()),
        T.StructField("file_format", T.StringType()),
        T.StructField("spec_id", T.IntegerType()),
        T.StructField("partition", T.StringType()),
        T.StructField("record_count", T.LongType()),
        T.StructField("file_size_in_bytes", T.LongType()),
        T.StructField("column_stats", T.StringType()),
        T.StructField("equality_ids", T.ArrayType(T.IntegerType())),
        T.StructField("referenced_data_file", T.StringType()),
        # spec data_file.key_metadata (opaque; non-null = encrypted file)
        T.StructField("key_metadata", T.BinaryType()),
    ])
    if not manifests:
        return spark.createDataFrame([], out_schema)

    by_spec: dict = {}
    for mf in manifests:
        by_spec.setdefault(mf.spec_id, []).append(mf.path)

    pieces = []
    json_opts = {"ignoreNullFields": "false"}
    for spec_id, paths in by_spec.items():
        spec = m.spec_by_id(spec_id)
        df = spark.read.option("mergeSchema", "true").parquet(*paths)
        names = set(df.columns)
        ptypes = spec.partition_type(schema)
        pcols = [_json_value_col(F.col(f"p_{n}"), t).alias(n)
                 for n, t in ptypes if f"p_{n}" in names]
        part = (F.to_json(F.struct(*pcols), json_opts) if pcols
                else F.lit("{}"))
        scols = []
        for fld in schema.fields:
            fid = fld.field_id
            if isinstance(fld.type, str) and f"min_f{fid}" in names:
                scols.append(F.struct(
                    _json_value_col(F.col(f"min_f{fid}"), fld.type).alias("min"),
                    _json_value_col(F.col(f"max_f{fid}"), fld.type).alias("max"),
                    F.col(f"nulls_f{fid}").alias("nulls"),
                    F.col(f"nans_f{fid}").alias("nans"),
                    F.col(f"values_f{fid}").alias("values"),
                ).alias(fld.name))
        stats = (F.to_json(F.struct(*scols), json_opts) if scols
                 else F.lit("{}"))
        pieces.append(df.select(
            F.col("status").cast("int"),
            F.col("snapshot_id").cast("long"),
            F.col("sequence_number").cast("long"),
            F.col("content").cast("int"),
            resolve_path_col(F.col("file_path"), m.location).alias("file_path"),
            "file_format",
            F.col("spec_id").cast("int"),
            part.alias("partition"),
            F.col("record_count").cast("long"),
            F.col("file_size_in_bytes").cast("long"),
            stats.alias("column_stats"),
            "equality_ids",
            resolve_path_col(F.col("referenced_data_file"),
                             m.location).alias("referenced_data_file"),
            (F.col("key_metadata") if "key_metadata" in names
             else F.lit(None).cast("binary")).alias("key_metadata"),
        ))
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    if statuses is not None:
        out = out.filter(F.col("status").isin(list(statuses)))
    if contents is not None:
        out = out.filter(F.col("content").isin(list(contents)))
    return out
