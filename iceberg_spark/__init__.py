"""iceberg_spark — a PySpark-native table format + analytics engine with the
query and data-processing capabilities of Apache Iceberg (reference:
/root/reference, apache/iceberg), rebuilt Spark-first per SURVEY.md.

Quick start:
    from iceberg_spark import Catalog, col
    cat = Catalog(spark, "/tmp/warehouse")
    t = cat.create_table("db.t", df.schema, partition_by=["day(ts)"])
    t.append(df)
    t.to_df().filter(...)                    # DataFrame out
    t.scan(filter=col("x") > 5).df()         # pruned scan
    t.delete_where(col("x") == 3)            # CoW/MoR row-level ops
"""

from .expressions import (
    ALWAYS_FALSE,
    ALWAYS_TRUE,
    and_,
    col,
    not_,
    or_,
    transform_col,
)
from .metadata import (
    PartitionSpec,
    PartitionSpecBuilder,
    Snapshot,
    SortField,
    SortOrder,
    TableMetadata,
)
from .schema import NestedField, Schema
from .table import Catalog, Table

__all__ = [
    "Catalog",
    "Table",
    "Schema",
    "NestedField",
    "PartitionSpec",
    "PartitionSpecBuilder",
    "SortOrder",
    "SortField",
    "Snapshot",
    "TableMetadata",
    "col",
    "transform_col",
    "and_",
    "or_",
    "not_",
    "ALWAYS_TRUE",
    "ALWAYS_FALSE",
]

__version__ = "0.1.0"
