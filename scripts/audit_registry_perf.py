#!/usr/bin/env python
"""Time every registry query at a given SF dir; print sorted JSON.

Not part of the graded bench (that is bench.py) — a development tool to
find per-query outliers worth optimizing.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_spark import workloads
from iceberg_spark.sources.testdata import session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    spark = session("iceberg_spark_audit")
    spark.sparkContext.setLogLevel("ERROR")
    reg = workloads.queries()
    times = {}
    for name, fn in reg.items():
        try:
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            warm0 = time.perf_counter() - t0
            # warm rerun: steady-state cost once fixtures/tables exist
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            times[name] = {"cold": round(warm0, 3),
                           "warm": round(time.perf_counter() - t0, 3)}
        except Exception as e:  # noqa: BLE001
            times[name] = {"error": str(e)[:200]}
        print(f"{name}: {times[name]}", file=sys.stderr, flush=True)
    ordered = dict(sorted(times.items(),
                          key=lambda kv: -kv[1].get("warm", 1e9)))
    print(json.dumps(ordered, indent=1))


if __name__ == "__main__":
    main()
