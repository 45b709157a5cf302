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
