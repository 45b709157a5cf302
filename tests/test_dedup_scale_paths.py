"""Scale-path behavior of the dedup operators: the embedding GEMM must
produce identical pairs whether the corpus fits one block or spreads over
many block-pair tasks, and the ngram posting-list join must honor the
hot-shingle df-cap."""

import pytest

from iceberg_spark.pipeline import dedup
from tests.conftest import SF_DIR


def _pairs(df):
    return sorted((r.vec_a, r.vec_b, r.cos) for r in df.collect())


def test_embedding_blocked_matches_single_block(spark, monkeypatch):
    single = _pairs(dedup.dedup_embedding(spark, SF_DIR))
    # force many blocks so cross-pair GEMM tasks (and empty-block and
    # self-pair groups) are actually exercised
    monkeypatch.setattr(dedup, "EMB_BLOCK_ROWS", 16)
    blocked = _pairs(dedup.dedup_embedding(spark, SF_DIR))
    assert blocked == single
    assert len(single) > 0


def test_ngram_df_cap_drops_hot_shingles(spark, monkeypatch):
    baseline = dedup.dedup_ngram_jaccard(spark, SF_DIR).count()
    # cap of 0 drops every shingle -> no candidate pairs at all
    monkeypatch.setattr(dedup, "SHINGLE_DF_CAP", 0)
    assert dedup.dedup_ngram_jaccard(spark, SF_DIR).count() == 0
    # a huge cap keeps everything
    monkeypatch.setattr(dedup, "SHINGLE_DF_CAP", 10**9)
    assert dedup.dedup_ngram_jaccard(spark, SF_DIR).count() == baseline
    assert baseline > 0


def test_semantic_dedup_k_derivation_bounds_clusters(spark):
    """Production K (semantic_dedup_k): k scales ~n/target so SemDeDup's
    per-cluster pair cost stays bounded — at a larger synthetic n the
    derived k must cap the max cluster well below the corpus size."""
    import numpy as np

    from iceberg_spark.pipeline.dedup import (semantic_dedup,
                                              semantic_dedup_k)

    assert semantic_dedup_k(10, 100) == 4          # fixture floor
    assert semantic_dedup_k(1_000_000, 100_000) == 10
    assert semantic_dedup_k(1_000_001, 100_000) == 11

    n, dims, target = 2000, 64, 100
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(n, dims)).astype("float32")
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>")
    out = semantic_dedup(spark, None, target_cluster_rows=target,
                         corpus=corpus).collect()
    assert len(out) == semantic_dedup_k(n, target) == 20
    sizes = [r["n_vecs"] for r in out]
    assert sum(sizes) == n
    # nearest-centroid assignment over random seeds: no cluster may hog
    # the corpus (5x the ideal share still says "bounded", not "exact")
    assert max(sizes) < 5 * (n / len(sizes))


def test_minhash_hot_shingle_exclusion_keeps_true_pairs(spark, monkeypatch):
    """r13: shingles with df above max(256, n/1000) are excluded from the
    MinHash SIGNATURE input (LSH banding) but NOT from the exact verify.
    A 301-doc corpus sharing one hot trigram (df=301 > the 256 floor)
    plus one injected near-dup pair must yield EXACTLY the true pair:
    the hot shingle may not bucket unrelated docs into candidates, and
    the true pair must still be found through its rare shingles."""
    rows = []
    for i in range(300):
        rows.append((i, f"alpha beta gamma u{i}a u{i}b u{i}c u{i}d u{i}e"))
    rows.append((1000, rows[0][1] + " extra"))  # near-dup of doc 0
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    monkeypatch.setattr(dedup, "dedup_corpus", lambda sp, d: corpus)
    out = sorted((r.doc_a, r.doc_b, r.jaccard)
                 for r in dedup.dedup_minhash_lsh(
                     spark, "synthetic-hot-corpus-r13").collect())
    # doc 0 has 6 distinct trigrams, doc 1000 has 7 sharing 6:
    # J = 6/7 = 0.8571; every other pair shares only the hot trigram
    # (J = 1/11 < 0.6)
    assert out == [(0, 1000, 0.8571)], out
