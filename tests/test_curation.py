"""Corpus-curation operators: cluster resolution vs a brute-force
union-find, packing invariants, and the deterministic mix gate."""

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_cluster_resolve_matches_union_find(spark):
    """The distributed min-label propagation must equal a driver-side
    union-find over the same candidate pairs (tiny at sf0.001)."""
    from iceberg_spark.pipeline.curation import dedup_cluster_resolve
    from iceberg_spark.pipeline.dedup import dedup_ngram_jaccard

    pairs = [(r.doc_a, r.doc_b)
             for r in dedup_ngram_jaccard(spark, SF_DIR).collect()]
    assert pairs, "fixture corpus should contain near-dup pairs"

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    clusters = {}
    for x in parent:
        clusters.setdefault(find(x), set()).add(x)
    want = sorted((rep, len(members)) for rep, members in clusters.items()
                  if len(members) >= 2)

    got = sorted((r.keep_id, r.cluster_size)
                 for r in dedup_cluster_resolve(spark, SF_DIR).collect())
    assert got == want


def test_cluster_resolve_transitivity(spark):
    """doc, doc+100000 (near-dup) and doc+200000 (exact dup) must land in
    ONE cluster for doc_id % 77 == 0 — requires transitive closure, not
    just pair grouping."""
    from iceberg_spark.pipeline.curation import dedup_cluster_resolve
    from iceberg_spark.pipeline.common import dedup_corpus

    base_ids = {r.doc_id for r in dedup_corpus(spark, SF_DIR)
                .filter((F.col("doc_id") % 77 == 0) & (F.col("doc_id") < 100000))
                .select("doc_id").collect()}
    res = {r.keep_id: r.cluster_size
           for r in dedup_cluster_resolve(spark, SF_DIR).collect()}
    hit = [d for d in base_ids if res.get(d, 0) >= 3]
    assert hit, f"no %77 doc resolved to a 3+-cluster: {sorted(base_ids)}"


def test_sequence_packing_invariants(spark):
    from iceberg_spark.pipeline.curation import (PACK_BUDGET, PACK_SHARDS,
                                                 sequence_packing)
    from iceberg_spark.pipeline.common import engine_docs, tokens

    rows = sequence_packing(spark, SF_DIR).collect()
    assert rows
    total = engine_docs(spark, SF_DIR).select(
        F.sum(F.size(tokens(F.col("text"))))).collect()[0][0]
    assert sum(r.seq_tokens for r in rows) == total  # nothing dropped
    assert {r.shard for r in rows} <= set(range(PACK_SHARDS))
    # within a shard, seq ids are the dense chunk ids of the running total
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.seq_id)
        cum = 0
        for r in rs:
            cum += r.seq_tokens
            assert r.seq_id == (cum - 1) // PACK_BUDGET


def test_domain_mix_gate_deterministic(spark):
    """The keep gate is pure arithmetic on doc_id — two runs and a local
    recomputation agree exactly."""
    from iceberg_spark.pipeline.curation import (MIX_DEFAULT_PERMILLE,
                                                 MIX_PERMILLE,
                                                 domain_mix_sample,
                                                 mix_gate_py)
    from iceberg_spark.pipeline.common import engine_docs

    a = {(r.source, r.lang): r.n_kept
         for r in domain_mix_sample(spark, SF_DIR).collect()}
    b = {(r.source, r.lang): r.n_kept
         for r in domain_mix_sample(spark, SF_DIR).collect()}
    assert a == b
    docs = engine_docs(spark, SF_DIR).select("doc_id", "lang", "source").collect()
    want = {}
    for r in docs:
        rate = MIX_PERMILLE.get(r.lang, MIX_DEFAULT_PERMILLE)
        if mix_gate_py(r.doc_id) < rate:
            want[(r.source, r.lang)] = want.get((r.source, r.lang), 0) + 1
    assert a == want


def test_mix_gate_no_overflow_at_huge_ids(spark):
    """The gate must be exact for doc_ids past 2^32 (100 TB corpora) —
    Spark ANSI arithmetic and Python agree."""
    from iceberg_spark.pipeline.curation import (MIX_A, MIX_M, mix_gate_py)

    ids = [2**31, 2**32 + 7, 2**62 + 12345, 3_470_000_000_123]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    gate = F.pmod(F.col("doc_id"), F.lit(MIX_M)) * F.lit(MIX_A) % F.lit(MIX_M) % F.lit(1000)
    got = [r.g for r in df.select(gate.alias("g")).collect()]
    assert got == [mix_gate_py(i) for i in ids]


def test_mix_gate_negative_ids_cross_engine(spark):
    """Python `%` floors, Spark/DuckDB `%` truncate toward zero — the
    pmod fold makes the gate identical in all three engines even for
    negative doc_ids."""
    import duckdb

    from iceberg_spark.pipeline.curation import MIX_A, MIX_M, mix_gate_py

    ids = [-1, -7, -(2**31), -(2**40 + 3), 0, 5]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    gate = F.pmod(F.col("doc_id"), F.lit(MIX_M)) * F.lit(MIX_A) % F.lit(MIX_M) % F.lit(1000)
    spark_got = [r.g for r in df.select(gate.alias("g")).collect()]
    duck_got = [
        duckdb.sql(
            f"SELECT (CAST({i} AS BIGINT) % {MIX_M} + {MIX_M}) % {MIX_M} * {MIX_A} "
            f"% {MIX_M} % 1000").fetchone()[0]
        for i in ids]
    py_got = [mix_gate_py(i) for i in ids]
    assert spark_got == py_got == duck_got
    assert all(0 <= g < 1000 for g in py_got)
