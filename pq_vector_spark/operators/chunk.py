"""Document chunking — split long documents into fixed-size overlapping
windows (north-star extension: the step between a curated corpus and an
embedding model; every RAG / embedding pipeline chunks first).

Semantics: character windows of ``chunk_chars`` starting every
``chunk_chars - overlap`` characters (half-open, 0-based starts). The
final window may be short; a document shorter than one window yields
exactly one chunk; an empty/NULL document yields one empty/NULL chunk
(the row is never silently dropped — downstream joins keep their ids).

Scale design (100 TB): pure map-side — a native ``sequence`` of starts,
``posexplode``, and ``substr``; no shuffle, no UDF, whole-stage codegen.
Output size is input size × (1 + overlap/step); the explode streams, so
no row ever materializes all its chunks at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    chunk_chars: int = 1000,
    overlap: int = 100,
) -> DataFrame:
    """Explode each document into (id, chunk_id, chunk_start, chunk_text).

    ``chunk_id`` counts from 0 per document; ``chunk_start`` is the
    0-based character offset (= chunk_id × (chunk_chars − overlap)).
    Deterministic, order-free, partitioning-free.
    """
    if chunk_chars <= 0:
        raise ValueError(f"chunk_chars must be positive, got {chunk_chars}")
    if not (0 <= overlap < chunk_chars):
        raise ValueError(
            f"overlap must be in [0, chunk_chars), got {overlap} vs {chunk_chars}"
        )
    step = chunk_chars - overlap
    c = F.col(text_col)
    starts = F.when(c.isNull(), F.array(F.lit(0))).otherwise(
        F.sequence(
            F.lit(0), F.greatest(F.length(c) - F.lit(1), F.lit(0)), F.lit(step)
        )
    )
    out = df.select(
        F.col(id_col),
        c.alias("_t"),
        F.posexplode(starts).alias("chunk_id", "chunk_start"),
    )
    return out.select(
        id_col,
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.col("chunk_start").cast("bigint").alias("chunk_start"),
        F.col("_t")
        .substr(F.col("chunk_start") + F.lit(1), F.lit(int(chunk_chars)))
        .alias("chunk_text"),
    )
