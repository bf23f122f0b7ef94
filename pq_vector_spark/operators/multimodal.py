"""Multimodal column conventions + processing plumbing (north-star
extension): image/audio/video as opaque ``binary`` columns with a typed
metadata struct, processed by Arrow-batched ``mapInPandas`` stages.

The decode step itself is STUBBED (no imaging/audio libs in this
environment): ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder (seeded by the
content hash) produces feature vectors with the real schema, partitioning
and batch shape — so the Spark-side plumbing is fully exercised and tested.

Scale notes: mapInPandas streams Arrow batches through one Python worker
per core with no shuffle; binary payloads never leave their partition until
an explicit repartition. Feature vectors come back as array<float> columns
ready for the vector operators (topk / dedup / similarity).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("mime", StringType(), True),
    ]
)


def attach_media_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Derive cheap metadata (size, content hash) without decoding."""
    return df.withColumn("content_bytes", F.length(F.col(content_col)).cast("bigint")).withColumn(
        "content_sha", F.sha2(F.col(content_col), 256)
    )


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real image/audio encoder: seed an RNG
    from the content hash → stable pseudo-embedding. Replace with a real
    decoder+model under the same signature."""
    seed = int.from_bytes(hashlib.sha256(payload or b"").digest()[:8], "big") % (2**32)
    return np.random.default_rng(seed).random(dim, dtype=np.float32)


def extract_features(
    df: DataFrame,
    content_col: str = "content",
    dim: int = 64,
    fake: bool = False,
) -> DataFrame:
    """mapInPandas feature extraction: binary column → array<float> column.

    Real decode is not available in this environment; with ``fake=False``
    this raises NotImplementedError *inside the workers* on first batch,
    with ``fake=True`` the deterministic fake encoder runs. Either way the
    schema, Arrow batching and partition behavior are the real thing.
    """
    out_schema = StructType(df.schema.fields + [StructField("feature", ArrayType(FloatType()), True)])

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decoding requires imaging/audio libraries not present "
                    "in this environment; pass fake=True for the deterministic stub"
                )
            feats = [
                _fake_feature(bytes(p) if p is not None else b"", dim).tolist()
                for p in pdf[content_col]
            ]
            pdf = pdf.copy()
            pdf["feature"] = feats
            yield pdf

    return df.mapInPandas(_extract, schema=out_schema)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    content_col: str = "content",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per sampled
    timestamp (decode stubbed — emits frame offsets, not pixels). Shows the
    explode-style fan-out that real frame extraction would use."""
    n_frames = (F.coalesce(F.col(duration_col), F.lit(0)) / F.lit(every_ms)).cast("int")
    offsets = F.transform(
        F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
        lambda i: i * F.lit(every_ms),
    )
    return df.withColumn("frame_ts_ms", F.explode(offsets))
