"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The media table derives deterministically from `documents`: payload =
UTF-8 bytes of the text (a stand-in for real image/audio/video bytes —
the decode libs aren't in this container), kind = doc_id % 3 cycling
image/audio/video.

The Spark-side plumbing is real: binary columns, Arrow-batched
mapInPandas decode with an explicit output schema, frame chunking with
per-frame rows. The *codec* step is stubbed: `_decode_image` routes to
PIL when importable and otherwise to a deterministic fake keyed off the
byte length (clearly marked STUB) so schema/partitioning/batching are
exercised and oracle-checkable.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .common import engine_docs

FRAME_BYTES = 256

def _kind():
    return (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )


_KIND_SQL = (
    "CASE WHEN doc_id % 3 = 0 THEN 'image' "
    "WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END"
)


def media_table(spark, sf_dir) -> DataFrame:
    docs = engine_docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        _kind().alias("kind"),
        F.col("text").cast("binary").alias("payload"),
    )


def media_stats(spark, sf_dir):
    """Typed-metadata rollup straight off the binary column (no decode)."""
    m = media_table(spark, sf_dir)
    return (
        m.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("payload")).alias("total_bytes"),
            # half-up via floor so Spark and the DuckDB oracle round the
            # same way regardless of each engine's ROUND tie convention
            (F.floor(F.avg(F.length("payload")) * 100 + F.lit(0.5)) / 100)
            .alias("avg_bytes"),
            F.max(F.length("payload")).alias("max_bytes"),
        )
        .orderBy("kind")
    )


MEDIA_STATS_SQL = f"""
SELECT {_KIND_SQL} AS kind, COUNT(*) AS n,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       FLOOR(AVG(octet_length(encode(text))) * 100 + 0.5) / 100 AS avg_bytes,
       MAX(octet_length(encode(text))) AS max_bytes
FROM documents GROUP BY 1 ORDER BY kind
"""


def _decode_image(payload: bytes):
    """STUB decode. Real path: PIL (absent in this container) — the fake
    derives (width, height, mode) deterministically from the byte length
    so the Arrow/mapInPandas plumbing stays testable end to end."""
    try:
        import io

        from PIL import Image  # noqa: F401 — not installed here

        img = Image.open(io.BytesIO(payload))
        return img.width, img.height, img.mode
    except ImportError:
        n = len(payload)
        return 16 + n % 624, 16 + (n * 7) % 464, "RGB"


_IMG_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mode", StringType()),
        StructField("n_bytes", LongType()),
    ]
)


def image_decode(spark, sf_dir):
    """Image metadata extraction over Arrow batches (mapInPandas)."""
    imgs = media_table(spark, sf_dir).filter(F.col("kind") == "image")

    def decode_batches(batches):
        import pandas as pd

        for pdf in batches:
            dims = [_decode_image(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "mode": [d[2] for d in dims],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                }
            )

    return imgs.mapInPandas(decode_batches, schema=_IMG_SCHEMA).orderBy("doc_id")


IMAGE_DECODE_SQL = f"""
SELECT doc_id,
       CAST(16 + octet_length(encode(text)) % 624 AS INT) AS width,
       CAST(16 + (octet_length(encode(text)) * 7) % 464 AS INT) AS height,
       'RGB' AS mode,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents WHERE doc_id % 3 = 0 ORDER BY doc_id
"""


_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def frame_sample(spark, sf_dir):
    """Video frame sampling: chunk payload into fixed-size frames, one
    output row per frame (mapInPandas fan-out — batch shape changes)."""
    vids = media_table(spark, sf_dir).filter(F.col("kind") == "video")

    def chunk(batches):
        import pandas as pd

        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "frame": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                for i in range(math.ceil(n / FRAME_BYTES)):
                    chunk_b = payload[i * FRAME_BYTES:(i + 1) * FRAME_BYTES]
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_bytes"].append(len(chunk_b))
                    rows["frame"].append(chunk_b)
            yield pd.DataFrame(rows)

    frames = vids.mapInPandas(chunk, schema=_FRAME_SCHEMA)
    return (
        frames.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum("frame_bytes").alias("total_bytes"),
            F.max("frame_bytes").alias("last_frame_bytes_max"),
        )
        .orderBy("doc_id")
    )


FRAME_SAMPLE_SQL = f"""
SELECT doc_id,
       CAST(ceil(octet_length(encode(text)) / {FRAME_BYTES}.0) AS BIGINT)
         AS n_frames,
       CAST(octet_length(encode(text)) AS BIGINT) AS total_bytes,
       CAST(least(octet_length(encode(text)), {FRAME_BYTES}) AS INT)
         AS last_frame_bytes_max
FROM documents WHERE doc_id % 3 = 2 ORDER BY doc_id
"""


def audio_features(spark, sf_dir):
    """Audio feature extraction stub: payload treated as unsigned 8-bit
    PCM; mean/peak amplitude via numpy over Arrow batches. The DuckDB
    oracle (AUDIO_FEATURES_SQL) recomputes the same stats from per-char
    code points — the corpus is ASCII so bytes == code points."""
    auds = media_table(spark, sf_dir).filter(F.col("kind") == "audio")

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("n_samples", LongType()),
            StructField("mean_amp", StringType()),
            StructField("peak_amp", IntegerType()),
        ]
    )

    def feats(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "n_samples": [], "mean_amp": [], "peak_amp": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                out["doc_id"].append(doc_id)
                out["n_samples"].append(len(arr))
                out["mean_amp"].append(f"{arr.mean():.4f}")
                out["peak_amp"].append(int(arr.max()))
            yield pd.DataFrame(out)

    return auds.mapInPandas(feats, schema=schema).orderBy("doc_id")


# The payload bytes are encode(text) and the corpus is ASCII-only, so the
# byte values equal per-char code points: the "PCM" math is expressible in
# SQL after all. Integer sums are exact in any order (numpy pairwise vs
# DuckDB sequential), and printf/'%.4f' format identical doubles
# identically.
AUDIO_FEATURES_SQL = f"""
WITH audio AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 1
),
codes AS (
  SELECT doc_id, octet_length(encode(text)) AS n,
         list_transform(range(1, length(text) + 1),
                        i -> unicode(substring(text, i, 1))) AS cs
  FROM audio
)
SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
       printf('%.4f', list_sum(cs) / CAST(n AS DOUBLE)) AS mean_amp,
       CAST(list_max(cs) AS INTEGER) AS peak_amp
FROM codes ORDER BY doc_id
"""


REGISTRY = {
    "media_stats": (media_stats, MEDIA_STATS_SQL),
    "image_decode": (image_decode, IMAGE_DECODE_SQL),
    "frame_sample": (frame_sample, FRAME_SAMPLE_SQL),
    "audio_features": (audio_features, AUDIO_FEATURES_SQL),
}
