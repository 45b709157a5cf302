"""Shared text-pipeline helpers: tokenization, shingling, dedup corpus.

Tokenization is whitespace-split over lower(trim(text)) — the SQL oracles
use the byte-for-byte identical normalization so value hashes match.

The dedup corpus is the `documents` table plus deterministic injected
duplicates (the raw corpus has none):
  * near-duplicates: every doc_id % 7 == 0 doc re-appears as
    doc_id+100000 with its last token dropped;
  * exact duplicates: every doc_id % 11 == 0 doc re-appears verbatim
    as doc_id+200000.
Both perturbations are plain SQL so the DuckDB oracle builds the same
corpus in a CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def engine_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents via the engine's table layer (metadata-only add_files)."""
    from ..workloads import engine_table

    return engine_table(spark, sf_dir, "documents").to_df()


def engine_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..workloads import engine_table

    return engine_table(spark, sf_dir, "embeddings").to_df()


def tokens(c) -> F.Column:
    """lower/trim + whitespace split. SQL twin: TOKENS_SQL."""
    return F.split(F.lower(F.trim(c)), r"\s+")


def tokens_sql(col: str = "text") -> str:
    return f"regexp_split_to_array(lower(trim({col})), '\\s+')"


def shingles(w, n: int = 3) -> F.Column:
    """Distinct word n-grams of a token array (MinHash/Jaccard unit).

    Arrow-batched Pandas UDF: the transform+slice+array_join formulation
    runs interpreted (higher-order functions don't whole-stage-codegen)
    and costs ~len(tokens) array materializations per document — the
    string joins are cheaper in one vectorized Python pass per batch.
    First-occurrence dedupe matches array_distinct/list_distinct.
    """
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("array<string>")
    def sh(tok_arrays):
        def one(toks):
            m = max(len(toks) - (n - 1), 0)
            return list(dict.fromkeys(
                " ".join(toks[i:i + n]) for i in range(m)))

        return tok_arrays.apply(one)

    return sh(w)


def shingles_sql(w: str, n: int = 3) -> str:
    # DuckDB list slicing is inclusive: w[i:i+n-1] == n tokens from i.
    return (
        f"list_distinct(list_transform("
        f"generate_series(1, greatest(len({w}) - {n - 1}, 0)), "
        f"i -> array_to_string({w}[i:i+{n - 1}], ' ')))"
    )


def dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = engine_docs(spark, sf_dir).select("doc_id", "text")
    near = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.regexp_replace("text", r"\s+\S+$", "").alias("text"),
        )
    )
    exact = docs.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text"
    )
    return docs.unionAll(near).unionAll(exact)


CORPUS_SQL = """
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id,
         regexp_replace(text, '\\s+\\S+$', '') AS text
  FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 200000 AS doc_id, text
  FROM documents WHERE doc_id % 11 = 0
)
"""
