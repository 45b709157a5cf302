"""Optimistic-concurrency stress: parallel committers race the CAS, losers
refresh + re-validate + retry with jittered backoff (SnapshotProducer.java
retry semantics, commit.retry.* table properties)."""

from concurrent.futures import ThreadPoolExecutor

import pytest
from pyspark.sql import Row

from iceberg_spark.metadata import CommitFailedException, TableOperations


N_WRITERS = 6


def test_parallel_appends_all_land(catalog, spark):
    df0 = spark.createDataFrame([Row(id=0, w=0)])
    t0 = catalog.create_table("conc.appends", df0.schema,
                              properties={"commit.retry.num-retries": "10"})

    def one(w):
        t = catalog.load_table("conc.appends")
        df = spark.createDataFrame([Row(id=i, w=w) for i in range(100)])
        return t.append(df).snapshot_id

    with ThreadPoolExecutor(max_workers=N_WRITERS) as ex:
        snaps = list(ex.map(one, range(N_WRITERS)))

    assert len(set(snaps)) == N_WRITERS
    t = catalog.load_table("conc.appends")
    m = t.metadata
    # every commit landed as its own snapshot with a unique sequence number
    seqs = [s.sequence_number for s in m.snapshots]
    assert sorted(seqs) == list(range(1, N_WRITERS + 1))
    assert t.to_df().count() == N_WRITERS * 100
    # per-writer rows intact (no lost update)
    per_w = {r.w: r.n for r in
             t.to_df().groupBy("w").count().withColumnRenamed("count", "n").collect()}
    assert per_w == {w: 100 for w in range(N_WRITERS)}


def test_direct_cas_conflict_raises(catalog, spark):
    df = spark.createDataFrame([Row(id=1)])
    t = catalog.create_table("conc.cas", df.schema)
    t.append(df)
    ops = TableOperations(t.location)
    base_v = ops.current_version()
    meta = ops.refresh()
    ops.commit(base_v, meta)  # first swap wins
    with pytest.raises(CommitFailedException):
        ops.commit(base_v, meta)  # same base version must fail


def test_metadata_delete_after_commit(catalog, spark, tmp_path):
    """write.metadata.delete-after-commit.enabled keeps only the newest
    previous-versions-max previous metadata.json files
    (TableProperties.java:342); the table stays loadable, including after
    version-hint loss (directory-scan recovery)."""
    import os

    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("id", T.LongType())])
    t = catalog.create_table(
        "db.metaret", schema,
        properties={"write.metadata.delete-after-commit.enabled": "true",
                    "write.metadata.previous-versions-max": "2"})
    for i in range(6):
        t.append(spark.createDataFrame([(i,)], schema))
    mdir = os.path.join(t.location, "metadata")
    vs = sorted(int(f[1:].split(".")[0]) for f in os.listdir(mdir)
                if f.endswith(".metadata.json"))
    # current + 2 previous only
    assert len(vs) == 3 and vs[-1] == max(vs)
    t = t.refresh()
    assert t.to_df().count() == 6
    # hint loss: recovery scans the directory instead of probing from v1
    os.unlink(os.path.join(mdir, "version-hint.text"))
    t2 = catalog.load_table("db.metaret")
    assert t2.to_df().count() == 6
