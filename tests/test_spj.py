"""Storage-partitioned join: bucket-clustered engine tables must join on
the bucket key with NO Exchange in the physical plan
(SparkPartitioningAwareScan.java:107-120 analog); incompatible or stale
layouts fall back to the ordinary shuffle join with identical results."""

import pytest
from pyspark.sql import functions as F

from iceberg_spark.spj import bucketed_join, create_bucketed_table


@pytest.fixture()
def pair(catalog, spark):
    a = spark.range(0, 5000).select(F.col("id").alias("k"),
                                    (F.col("id") * 2).alias("va"))
    b = spark.range(0, 5000).select(F.col("id").alias("k"),
                                    (F.col("id") * 3).alias("vb"))
    ta = create_bucketed_table(catalog, "spj_a", a, 8, "k")
    tb = create_bucketed_table(catalog, "spj_b", b, 8, "k")
    return ta, tb


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(pair, spark):
    ta, tb = pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(ta, tb, "k")
        plan = _plan(j)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert j.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_engine_join(pair, spark):
    ta, tb = pair
    spj = bucketed_join(ta, tb, "k").select("k", "va", "vb")
    plain = (ta.to_df().join(tb.to_df(), "k")).select("k", "va", "vb")
    assert sorted(map(tuple, spj.collect())) == sorted(map(tuple, plain.collect()))


def test_engine_scan_still_works_on_bucketed_table(pair):
    ta, _ = pair
    # the same files serve the ordinary engine read path (stats, pruning)
    assert ta.to_df().count() == 5000
    plan = ta.scan().plan_files()
    assert len(plan.files) >= 8  # one file per bucket at least


def test_fallback_when_layout_diverges(pair, spark):
    ta, tb = pair
    # a post-bucketing append breaks the layout guarantee -> shuffle join
    ta.append(spark.range(5000, 5100).select(F.col("id").alias("k"),
                                             (F.col("id") * 2).alias("va")))
    j = bucketed_join(ta, tb, "k")
    assert "Exchange" in _plan(j)  # honest fallback
    assert j.count() == 5000  # inner join: new keys have no match


def test_fallback_result_correct_under_mor_deletes(catalog, spark):
    a = spark.range(0, 100).select(F.col("id").alias("k"), F.lit(1).alias("va"))
    b = spark.range(0, 100).select(F.col("id").alias("k"), F.lit(2).alias("vb"))
    ta = create_bucketed_table(catalog, "spj_c", a, 4, "k")
    tb = create_bucketed_table(catalog, "spj_d", b, 4, "k")
    from iceberg_spark.expressions import col

    ta.delete_where(col("k") < 50, mode="merge-on-read")
    j = bucketed_join(ta, tb, "k")
    assert j.count() == 50  # deletes applied -> must NOT use the raw mirror


def test_layout_memo_invalidated_by_commit(pair, spark):
    """r13: the SPJ enablement verdict is memoized per snapshot — a join
    BEFORE the divergence caches verdict True, and the post-append join
    must still detect the stale layout (new snapshot id = new key)."""
    ta, tb = pair
    j = bucketed_join(ta, tb, "k")
    assert j.count() == 5000  # populates the memo with a True verdict
    ta.append(spark.range(5000, 5100).select(F.col("id").alias("k"),
                                             (F.col("id") * 2).alias("va")))
    j2 = bucketed_join(ta, tb, "k")
    assert "Exchange" in _plan(j2)  # memo did NOT replay the stale True
    assert j2.count() == 5000
