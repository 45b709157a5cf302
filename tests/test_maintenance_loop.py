"""K7 — maintenance as part of the streaming job: compaction triggers on
commit-count / small-file thresholds from inside the sink loop
(flink/.../maintenance/api/RewriteDataFiles.java:43 analog)."""

import pytest
from pyspark.sql import functions as F

from iceberg_spark.streaming import append_sink, run_maintenance


@pytest.fixture()
def sink_table(catalog, spark):
    df = spark.range(0, 1).select("id", (F.col("id") % 3).alias("g"))
    return catalog.create_table("stream_maint", df.schema)


def test_streaming_ingest_triggers_binpack(sink_table, spark):
    t = sink_table
    sched = run_maintenance(t, every_n_commits=100, min_small_files=4)
    sink = sched.wrap(append_sink(t, "q1"))
    for epoch in range(6):
        df = spark.range(epoch * 10, epoch * 10 + 10).select(
            "id", (F.col("id") % 3).alias("g"))
        sink(df, epoch)
    # the small-file trigger fired at least once ...
    assert len(sched.runs) >= 1
    assert any(r["compaction"]["rewritten_files"] > 1 for r in sched.runs)
    # ... a replace snapshot exists, and no rows were lost
    ops = [s.operation for s in t.refresh().metadata.snapshots]
    assert "replace" in ops
    assert t.to_df().count() == 60
    # compaction actually reduced the live file count below epoch count
    plan = t.scan().plan_files()
    assert len(plan.files) < 6


def test_commit_count_trigger(sink_table, spark):
    t = sink_table
    sched = run_maintenance(t, every_n_commits=3)
    sink = sched.wrap(append_sink(t, "q2"))
    for epoch in range(3):
        sink(spark.range(0, 5).select("id", F.lit(0).alias("g")), epoch)
    assert len(sched.runs) == 1
    # counter reset: no immediate re-trigger on the next epoch
    sink(spark.range(0, 5).select("id", F.lit(0).alias("g")), 99)
    assert len(sched.runs) == 1
