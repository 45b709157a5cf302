#!/usr/bin/env python
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Times the engine's scan path (metadata planning + pruned parquet read +
Spark execution). Tables are ingested once (metadata-only add_files where
possible) before timing; `raw_q1_baseline` reads the same parquet through
plain spark.read for an engine-overhead comparison (mirrors the reference's
Iceberg-vs-file-source JMH benchmark,
spark/v4.0/spark/src/jmh/.../IcebergSourceFlatParquetDataReadBenchmark.java:50).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from iceberg_spark import workloads
from iceberg_spark.sources.testdata import load_table, session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_revenue",
    "events_type_agg",
    "scan_prune_day",
]


def raw_q1_baseline(spark, sf_dir):
    """Same computation as q1_pricing_summary but via plain spark.read —
    the engine-overhead yardstick (Iceberg-vs-file-source comparison)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                      * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def main():
    spark = session("iceberg_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    sf_name = os.path.basename(os.path.normpath(SF_DIR)).replace("sf", "")
    try:
        sf = float(sf_name)
    except ValueError:
        sf = 0.0

    # warm up the JVM + ingest tables outside the timed region
    for name in ("lineitem", "orders", "customer", "region", "nation", "supplier"):
        workloads.engine_table(spark, SF_DIR, name)
    workloads.engine_table(spark, SF_DIR, "events")
    workloads.engine_table(spark, SF_DIR, "events", partition_by=["day(ts)"])
    raw_q1_baseline(spark, SF_DIR).collect()  # JVM warmup

    def timed(fn, runs: int = 3):
        # steady-state: 1 warmup + median of `runs` (JMH-style warmup/measure)
        fn()
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return round(ts[len(ts) // 2], 4)

    qtimes = {}
    reg = workloads.queries()
    for name in BENCH_QUERIES:
        qtimes[name] = timed(lambda: reg[name](spark, SF_DIR).collect())

    qtimes["raw_q1_baseline"] = timed(lambda: raw_q1_baseline(spark, SF_DIR).collect())

    total = round(sum(v for k, v in qtimes.items() if k != "raw_q1_baseline"), 4)
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": qtimes,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
