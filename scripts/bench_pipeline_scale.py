#!/usr/bin/env python
"""Pipeline scale proof (BENCH_PIPELINE artifact): the dedup/ANN 100 TB
story measured, not just design-audited.

Builds 10x and 100x variants of the sf0.1 documents/embeddings corpora
and times dedup_minhash_lsh, knn_bruteforce, and semantic_dedup_prod_k
at 1x / 10x / 100x, recording wall time and SHUFFLE bytes (from the
Spark status REST API) per run. The claim under test: banded LSH,
broadcast-probe KNN, and cluster-scoped semantic dedup scale
~linearly in corpus size — never corpus^2.

Fixture realism: each copy's tokens carry a copy-unique suffix
(cross-copy shingle sets are disjoint, so near-dup structure per doc
stays what sf0.1's generator injected instead of exploding into
100-member cross-copy clusters, while every shingle's WITHIN-copy
document frequency is exactly the unsalted corpus's — see the v3 note
in build_fixture); embeddings get a small deterministic per-copy,
per-dimension perturbation for the same reason (uniform scaling would
leave cosines exactly 1 across copies). Duplicate RATE and the
shingle-df distribution are scale-invariant, which is what a grown
real corpus looks like.

Run:  python scripts/bench_pipeline_scale.py   # prints one JSON line
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("PYSPARK_SUBMIT_ARGS",
                      "--driver-memory 16g pyspark-shell")

from pyspark.sql import functions as F

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = os.environ.get("SPARK_GRAFT_PIPELINE_DIR",
                      "/tmp/iceberg_spark_sf1/pipeline")
SCALES = (1, 10, 100)
RUNS = 3

# semantic_dedup runs with target_cluster_rows=2000: K then grows
# linearly with the corpus so per-cluster pair work (the O(sum
# cluster^2) term) stays ~n * 2000 — the SemDeDup operating shape. The
# registry's prod-K entry pins target=100k (sized for the 100M+ doc
# corpora it models); at THIS fixture's 200k vectors that one knob
# would put ~every vector in two clusters and the pair step at ~2e10
# cosine pairs — a fixture/knob mismatch, not an operator property.
SD_SCALE_TARGET = 2000
ENTRIES = ("dedup_minhash_lsh", "knn_bruteforce", "semantic_dedup")

FIXTURE_VERSION = "v3"  # v3: token-suffix salt (df-preserving; see
# build_fixture). Truncation to 1000 chars retained from v2: it bounds
# the per-candidate array payload of the verify join.

# Identity contract (r14, from the r13 verdict): dedup_minhash_lsh's
# stop-shingle df-cap is load-bearing for output identity — on the v3
# fixture it is inert (out_rows identical with and without it, verified
# r13), and any future cap/fixture tuning must keep it that way. These
# values were measured three times at r13 HEAD (bit-identical runs);
# a shift at ANY scale fails the harness — speed may not buy recall.
EXPECTED_OUT_ROWS = {
    "dedup_minhash_lsh": {1: 1600, 10: 16211, 100: 162302},
}


def identity_fails(results: dict) -> list:
    """Hard out_rows assertions over a results dict shaped like
    {entry: {str(scale): {"out_rows": n, ...}}}. Returns violation
    strings (empty = contract holds)."""
    fails = []
    for entry, pins in EXPECTED_OUT_ROWS.items():
        for scale, want in pins.items():
            got = results.get(entry, {}).get(str(scale), {}).get("out_rows")
            if got is not None and got != want:
                fails.append(
                    f"{entry} out_rows at x{scale}: {got} != pinned {want} "
                    f"(identity contract — recall may not shift with "
                    f"cap/fixture tuning)")
    return fails


def build_fixture(spark, copies: int) -> str:
    out = os.path.join(ROOT, f"x{copies}")
    marker = os.path.join(out, "_DONE")
    if (os.path.exists(marker)
            and open(marker).read().strip() == FIXTURE_VERSION):
        return out
    os.makedirs(out, exist_ok=True)
    from iceberg_spark.sources.testdata import load_table

    docs = load_table(spark, SRC, "documents")
    id_shift = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = []
    for i in range(copies):
        p = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * id_shift))
        if i:
            # token-suffix salt: every token w becomes w<c:i>, so EVERY
            # shingle differs across copies (cross-copy Jaccard 0, no
            # 100-member cross-copy dup clusters) while each shingle's
            # within-copy document frequency stays EXACTLY the unsalted
            # corpus's — the v2 word-boundary salt (" " -> " c<i> ")
            # instead made half of all shingle occurrences per copy
            # stop-patterns (c_i, w, c_i) with df up to ~76% of the copy
            # (real corpus max: 0.5%), which both dominated MinHash
            # signatures (quadratic LSH candidate growth: the measured
            # 1.58 scaling exponent and 213 s / 9.4 GB at x100 were the
            # fixture's pathology, not the operator's) and manufactured
            # J>=0.6 "duplicate" pairs between unrelated docs out of
            # salt tokens alone. A grown real corpus keeps its df
            # distribution — v3 measures that.
            p = p.withColumn(
                "text", F.regexp_replace("text", r"(\S+)", f"$1c{i}"))
        p = p.withColumn("text", F.substring("text", 1, 1000))
        parts.append(p.withColumn("n_chars", F.length("text")))
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    (df.repartition(max(4, 4 * copies // 10))
       .write.mode("overwrite").parquet(os.path.join(out, "documents.parquet")))

    emb = load_table(spark, SRC, "embeddings")
    v_shift = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    parts = []
    for i in range(copies):
        p = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * v_shift))
        if i:
            # deterministic per-(copy, dim) angular perturbation: copies
            # land NEAR the original (realistic near-dup density) but
            # not at cosine == 1
            p = p.withColumn(
                "embedding",
                F.expr(f"transform(embedding, (x, j) -> "
                       f"x + float(0.05 * sin({i} * 7 + j)))"))
        parts.append(p)
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    (df.repartition(max(4, 4 * copies // 10))
       .write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet")))
    open(marker, "w").write(FIXTURE_VERSION)
    return out


def _shuffle_bytes(spark) -> int:
    """Cumulative shuffle-write bytes across all completed stages, via
    the status REST API (needs spark.ui.enabled)."""
    try:
        app_id = spark.sparkContext.applicationId
        port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[1]
        url = (f"http://127.0.0.1:{port}/api/v1/applications/{app_id}"
               f"/stages?status=complete")
        with urllib.request.urlopen(url, timeout=10) as r:
            stages = json.loads(r.read())
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception:
        return -1


def main():
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("iceberg_spark_pipeline_scale")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from iceberg_spark import workloads
    from iceberg_spark.pipeline.dedup import semantic_dedup
    reg = workloads.queries()
    reg = dict(reg, semantic_dedup=lambda sp, d: semantic_dedup(
        sp, d, target_cluster_rows=SD_SCALE_TARGET))

    # machine-speed probes bracketing every scale block (bench.py's
    # cpu_calib): this box's multi-run spread measured ~2x on unchanged
    # code, so the artifact records the probes and a machine_factor for
    # cross-round comparison of the raw seconds
    import bench as _bench

    calibs = [_bench.cpu_calibration()]

    results = {e: {} for e in ENTRIES}
    rows = {}
    for copies in SCALES:
        d = build_fixture(spark, copies)
        rows[copies] = {
            "documents": spark.read.parquet(
                os.path.join(d, "documents.parquet")).count(),
            "embeddings": spark.read.parquet(
                os.path.join(d, "embeddings.parquet")).count(),
        }
        print(f"-- x{copies}: {rows[copies]}", file=sys.stderr)
        for e in ENTRIES:
            fn = reg[e]
            fn(spark, d).collect()          # warm (fixture state, JIT)
            ts, sh = [], []
            for _ in range(RUNS):
                s0 = _shuffle_bytes(spark)
                t0 = time.perf_counter()
                n = fn(spark, d).count()
                ts.append(time.perf_counter() - t0)
                sh.append(_shuffle_bytes(spark) - s0)
                # let the ContextCleaner reclaim the finished job's
                # shuffle files NOW — x100 runs spill tens of GB and
                # the default periodic GC would stack several runs'
                # footprints on one local disk
                try:
                    spark._jvm.System.gc()
                except Exception:
                    pass
            ts.sort()
            results[e][str(copies)] = {
                "sec": round(ts[len(ts) // 2], 3),
                "shuffle_bytes": max(sh),
                "out_rows": n,
            }
            print(f"   {e}: {results[e][str(copies)]}", file=sys.stderr)
        calibs.append(_bench.cpu_calibration())

    # observed scaling exponent sec ~ rows^alpha between 10x and 100x
    # (the 1x point sits under fixed overheads); linear => ~1, corpus^2
    # => ~2. Gate: every entry must stay sub-quadratic.
    exponents = {}
    for e in ENTRIES:
        t10 = results[e]["10"]["sec"]
        t100 = results[e]["100"]["sec"]
        exponents[e] = round(math.log(max(t100, 1e-9) / max(t10, 1e-9))
                             / math.log(10), 3)
    fails = [f"{e} scaling exponent {x} >= 2 (quadratic)"
             for e, x in exponents.items() if x >= 2]
    fails += identity_fails(results)
    print(json.dumps({
        "metric": "pipeline_scale_proof",
        "unit": "sec",
        "scales": list(SCALES),
        "rows": rows,
        "entries": results,
        "scaling_exponent_10x_to_100x": exponents,
        "cpu_calib_samples": [round(c, 4) for c in calibs],
        "machine_factor": round(min(calibs) / 0.095, 4),
        "gates_failed": len(fails),
        "fails": fails,
    }))
    return len(fails)


if __name__ == "__main__":
    sys.exit(1 if main() else 0)
