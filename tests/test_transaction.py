"""Transaction: multiple operations buffered into one atomic metadata swap
(api/.../Transaction.java:25, core/.../BaseTransaction.java:56). Reads
inside the transaction see pending state; nothing is visible outside until
commit_transaction; a conflicting concurrent commit triggers replay."""

import pytest
from pyspark.sql import functions as F

from iceberg_spark.expressions import col


@pytest.fixture()
def base_table(catalog, spark):
    df = spark.range(0, 100).select("id", (F.col("id") % 5).alias("grp"))
    t = catalog.create_table("txn_t", df.schema)
    t.append(df)
    return t


def test_multi_op_transaction_commits_atomically(base_table, catalog, spark):
    t = base_table
    v_before = t.ops.current_version()
    txn = t.transaction()
    txn.append(spark.range(100, 150).select("id", (F.col("id") % 5).alias("grp")))
    txn.delete_where(col("id") < 10)
    txn.update_schema_with(lambda u: u.add_column("note", "string"))
    txn.set_properties(**{"txn.test": "yes"})

    # pending state is visible inside the txn ...
    assert txn.table.to_df().count() == 140
    assert "note" in txn.table.schema.column_names
    # ... but not outside
    fresh = catalog.load_table("txn_t")
    assert fresh.to_df().count() == 100
    assert "note" not in fresh.schema.column_names
    assert t.ops.current_version() == v_before

    txn.commit_transaction()

    # exactly one metadata version published with everything in it
    assert t.ops.current_version() == v_before + 1
    out = catalog.load_table("txn_t")
    assert out.to_df().count() == 140
    assert "note" in out.schema.column_names
    assert out.properties.get("txn.test") == "yes"


def test_transaction_replays_on_conflicting_commit(base_table, catalog, spark):
    t = base_table
    txn = t.transaction()
    txn.append(spark.range(100, 120).select("id", (F.col("id") % 5).alias("grp")))

    # a competing writer lands first
    other = catalog.load_table("txn_t")
    other.append(spark.range(1000, 1010).select("id", (F.col("id") % 5).alias("grp")))

    txn.commit_transaction()
    out = catalog.load_table("txn_t")
    # both the competing append (10) and the txn append (20) survive
    assert out.to_df().count() == 130


def test_empty_transaction_publishes_base(base_table, catalog):
    t = base_table
    v = t.ops.current_version()
    t.transaction().commit_transaction()
    assert t.ops.current_version() == v + 1
