"""Large-scale training-data pipeline operators (SURVEY.md §7 P8).

Spark-first operators over the `documents` / `embeddings` tables:
dedup (exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding cosine),
similarity search (brute-force + LSH ANN), text analysis (language-ID,
quality scoring, token counting, fingerprinting), multimodal binary
column plumbing, and corpus curation (near-dup cluster resolution,
benchmark decontamination, sequence packing, domain mixing).

Every operator is a `queries()` entry; where the computation is
SQL-expressible the DuckDB oracle computes the identical values.
"""

from . import curation, dedup, multimodal, similarity, text

REGISTRY = {}
for _m in (text, dedup, similarity, multimodal, curation):
    REGISTRY.update(_m.REGISTRY)
