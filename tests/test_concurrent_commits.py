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
