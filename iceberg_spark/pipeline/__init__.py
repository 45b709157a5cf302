"""Large-scale training-data pipeline operators (SURVEY.md §7 P8).

Spark-first operators over the `documents` / `embeddings` tables:
dedup (exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding cosine),
similarity search (brute-force + LSH ANN), text analysis (language-ID,
quality scoring, token counting, fingerprinting), and multimodal binary
column plumbing.

Every operator is a `queries()` entry; where the computation is
SQL-expressible the DuckDB oracle computes the identical values.
"""

from . import dedup, multimodal, similarity, text

REGISTRY = {}
for _m in (text, dedup, similarity, multimodal):
    REGISTRY.update(_m.REGISTRY)
