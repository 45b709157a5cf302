#!/usr/bin/env python
"""Decompose q1 engine-vs-raw overhead: planning time, DataFrame build
time, execution time, for the engine scan and the raw spark.read path."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import functions as F

from iceberg_spark import workloads
from iceberg_spark.expressions import col
from iceberg_spark.sources.testdata import session

import bench


def t(fn, n=5):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return round(ts[len(ts) // 2], 4)


def main():
    spark = session("profile_q1")
    spark.sparkContext.setLogLevel("ERROR")
    tbl = workloads.engine_table(spark, SF_DIR, "lineitem")
    bench.raw_q1_baseline(spark, SF_DIR).collect()

    scan = lambda: tbl.scan(filter=col("l_shipdate") <= "1998-09-02T00:00:00")
    print("plan_files       ", t(lambda: scan().plan_files()))
    print("df build (no run)", t(lambda: scan().df()))
    print("engine q1 e2e    ", t(lambda: workloads.q1_pricing_summary(spark, SF_DIR).collect()))
    print("raw q1 e2e       ", t(lambda: bench.raw_q1_baseline(spark, SF_DIR).collect()))

    # agg/collect on a pre-built engine df (isolates per-call build cost)
    edf = workloads.q1_pricing_summary(spark, SF_DIR)
    print("engine q1 reuse  ", t(lambda: edf.collect()))
    rdf = bench.raw_q1_baseline(spark, SF_DIR)
    print("raw q1 reuse     ", t(lambda: rdf.collect()))

    import cProfile, pstats, io
    pr = cProfile.Profile()
    pr.enable()
    for _ in range(5):
        workloads.q1_pricing_summary(spark, SF_DIR)
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
    print(s.getvalue())


if __name__ == "__main__":
    main()
