#!/usr/bin/env python
"""Planning scale probe: synthetic metadata trees at 10k/100k/1M files.

Proves the COVERAGE.md claim that partition/min-max FILTERED planning
stays flat as total file count grows — only full-table plans grow
linearly — and records manifest-level skip evidence from the plan
report: a filtered local plan must READ O(matching manifests), not
O(total manifests).

Usage: python scripts/plan_scale_probe.py [n_files ...]  (default
10000 100000 1000000). Measures once per size (SingleShotTime — these
are cold planning costs); run on a quiet machine.
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_spark import manifests as M
from iceberg_spark.expressions import col
from iceberg_spark.manifests import DataFile
from iceberg_spark.sources.testdata import session
from iceberg_spark.table import Catalog
from iceberg_spark.writes import FastAppend
from pyspark.sql import types as T

ROWS_PER_FILE = 1000


def build(spark, n_files: int, n_partitions: int, metadata_key=None):
    files_per_partition = n_files // n_partitions
    wh = tempfile.mkdtemp(prefix=f"iceberg_spark_probe_{n_files}_")
    cat = Catalog(spark, wh, metadata_key=metadata_key)
    schema = T.StructType([
        T.StructField("p", T.IntegerType()),
        T.StructField("id", T.LongType()),
    ])
    # one manifest per partition, no merge-on-commit: the probe measures
    # PLANNING over N manifests, not the commit path's manifest merging
    t = cat.create_table("probe.t", schema, partition_by=["p"],
                         properties={"commit.manifest-merge.enabled":
                                     "false"})
    for p in range(n_partitions):
        fs = []
        for i in range(files_per_partition):
            lo = (p * files_per_partition + i) * ROWS_PER_FILE
            fs.append(DataFile(
                file_path=f"{wh}/synthetic/p={p}/f{i}.parquet",
                partition={"p": p},
                record_count=ROWS_PER_FILE,
                file_size_in_bytes=1 << 20,
                stats={"id": (lo, lo + ROWS_PER_FILE - 1, 0, None,
                              ROWS_PER_FILE)},
            ))
        FastAppend(t, fs).commit()
    return t.refresh(), wh


def probe(spark, n_files: int, encrypted: bool = False) -> dict:
    n_partitions = max(32, n_files // 10_000)
    per_part = n_files // n_partitions
    n_files = per_part * n_partitions  # exact grid
    mkey = bytes(range(16)) if encrypted else None
    t, wh = build(spark, n_files, n_partitions, metadata_key=mkey)
    out = {"n_files": n_files, "n_manifests": n_partitions,
           "encrypted": encrypted}
    if encrypted:
        # every manifest/list on disk must be an AGS1 stream — the probe
        # then measures DECRYPTING planning, not a silently-plain tree
        import glob as _g

        mfiles = (_g.glob(os.path.join(wh, "probe", "t", "metadata",
                                       "manifests", "*.parquet"))
                  + _g.glob(os.path.join(wh, "probe", "t", "metadata",
                                         "manifest-lists", "*.parquet")))
        assert mfiles, "no metadata parquet found"
        for f in mfiles:
            assert open(f, "rb").read(4) == b"AGS1", f

    def timed_plan(filt, mode):
        M._MANIFEST_CACHE.clear()
        M._ARROW_CACHE.clear()
        t0 = time.perf_counter()
        plan = t.scan(filter=filt, planning_mode=mode).plan_files()
        dt = time.perf_counter() - t0
        # manifests actually READ = arrow-cache fills during this plan
        # (the vectorized local planner parses each manifest exactly once)
        return (len(plan.files), round(dt, 4),
                len(M._ARROW_CACHE), plan.report)

    n, dt, reads, rep = timed_plan(None, "local")
    assert n == n_files, (n, n_files)
    out["full_local_s"] = dt
    n, dt, reads, rep = timed_plan(col("p") == 7, "local")
    assert n == per_part, n
    out["partition_filter_s"] = dt
    out["partition_filter_manifest_reads"] = reads
    out["partition_filter_skipped_manifests"] = rep.skipped_manifests
    # manifest-level pruning evidence: the filtered plan READS only the
    # matching partition's manifest (manifest-list summaries prune the
    # rest) — O(matching), not O(total)
    assert reads <= 2, f"filtered plan read {reads} manifests"
    assert rep.skipped_manifests == n_partitions - 1

    hi = (7 * per_part + 50) * ROWS_PER_FILE
    lo = 7 * per_part * ROWS_PER_FILE
    n, dt, reads, rep = timed_plan((col("id") >= lo) & (col("id") < hi),
                                   "local")
    assert n == 50, n
    out["minmax_filter_s"] = dt
    out["minmax_filter_manifest_reads"] = reads
    if n_files <= 200_000:  # distributed full plan; collects every entry
        n, dt, reads, rep = timed_plan(None, "distributed")
        assert n == n_files
        out["full_distributed_s"] = dt
    if encrypted:
        # the executor-side decrypting RDD leg must prune the same way:
        # a partition-filtered DISTRIBUTED plan ships only the matching
        # manifest to executors (prefiltered by list summaries)
        n, dt, reads, rep = timed_plan(col("p") == 7, "distributed")
        assert n == per_part, n
        out["partition_filter_distributed_s"] = dt
        assert rep.skipped_manifests == n_partitions - 1, \
            rep.skipped_manifests
    import shutil

    shutil.rmtree(wh, ignore_errors=True)
    return out


def main():
    args = sys.argv[1:]
    encrypted = "--encrypted" in args
    sizes = [int(a) for a in args if not a.startswith("--")] \
        or [10_000, 100_000, 1_000_000]
    spark = session("iceberg_spark_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
    rows = []
    for nf in sizes:
        r = probe(spark, nf, encrypted=encrypted)
        rows.append(r)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
