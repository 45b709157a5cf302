"""uuid fidelity (SURVEY §7 'hard parts'): the engine stores iceberg
`uuid` as canonical lowercase hex string (§1.3 cap — Spark has no uuid
type). Fixed-width lowercase hex makes lexicographic string order equal
byte order of the 16-byte value, so min/max stats pruning stays correct."""

import uuid as _uuid

from pyspark.sql import types as T

from iceberg_spark.expressions import col
from iceberg_spark.schema import NestedField, Schema

SCHEMA = Schema((
    NestedField(1, "id", "long", required=True),
    NestedField(2, "u", "uuid"),
))
SPARK_SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("u", T.StringType()),
])


def _rows(seed, n, lo_nibble):
    # deterministic uuids whose first hex digit is pinned -> disjoint
    # per-file min/max ranges for the pruning assertion
    out = []
    for i in range(n):
        u = _uuid.UUID(int=(lo_nibble << 124) | (seed * 1_000_003 + i))
        out.append((lo_nibble * 1000 + i, str(u)))
    return out


def test_uuid_roundtrip_and_equality(spark, catalog):
    t = catalog.create_table("db.uuid_rt", SCHEMA)
    rows = _rows(7, 200, 3)
    t.append(spark.createDataFrame(rows, SPARK_SCHEMA))
    got = sorted((r.id, r.u) for r in t.to_df().collect())
    assert got == sorted(rows)
    probe = rows[17][1]
    hit = t.scan(filter=col("u") == probe).df().collect()
    assert [(r.id, r.u) for r in hit] == [rows[17]]
    # canonical form preserved exactly (lowercase, hyphenated)
    assert all(u == str(_uuid.UUID(u)) for _, u in got)


def test_uuid_minmax_stats_prune(spark, catalog):
    t = catalog.create_table("db.uuid_prune", SCHEMA)
    for nib in (1, 8, 12):  # three files, first hex digit 1 / 8 / c
        t.append(spark.createDataFrame(_rows(nib, 50, nib), SPARK_SCHEMA)
                 .coalesce(1))
    t = t.refresh()
    probe = _rows(8, 50, 8)[25][1]
    plan = t.scan(filter=col("u") == probe).plan_files()
    assert len(plan.files) == 1, "uuid string min/max should prune 2 of 3 files"
    assert t.scan(filter=col("u") == probe).df().count() == 1
