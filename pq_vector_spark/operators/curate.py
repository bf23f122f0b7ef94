"""End-to-end corpus curation — the composed training-data pipeline
(quality gate → exact dedup → PII scrub → deterministic sample) that the
individual operators exist to serve. One call, one shuffle.

Stage shapes at 100 TB:

1. **Quality gate** — `quality_score` is a pure map-side expression
   (bind-once tokenization, whole-stage codegen); rows drop before
   anything shuffles.
2. **Exact dedup** — survivor-per-fingerprint via a window
   (`row_number() = 1` over the content hash, smallest id wins — the same
   deterministic survivor policy as ``operators.dedup.exact_dedup``).
   This is the pipeline's ONLY shuffle, and it shuffles already-filtered
   rows.
3. **PII scrub** — map-side `regexp_replace` chain.
4. **Sample** — `hash_sample`'s salt-keyed bucket filter: membership
   depends only on (salt, id), so reruns and backfills select identical
   rows.

Order matters and is deliberate: dedup before scrub (scrubbing can only
merge near-identical texts, never split them, so scrub-then-dedup would
dedup MORE aggressively than the content hash advertises); sample last so
the rate applies to the curated population.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pq_vector_spark.functions.text import (
    PII_ORDER,
    fingerprint,
    pii_scrub,
    quality_score,
)
from pq_vector_spark.operators.sampling import hash_sample

QUALITY_COL = "quality"


def curate_corpus(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    *,
    min_quality: float = 0.5,
    sample_rate: Optional[float] = None,
    sample_salt: str = "curate",
    pii_kinds: Sequence[str] = PII_ORDER,
    stopwords: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Curated view of ``docs``: (id, scrubbed text, quality), containing
    the per-fingerprint survivor (smallest id) of every distinct content
    among rows scoring ≥ ``min_quality``, PII-scrubbed, optionally
    hash-sampled at ``sample_rate``."""
    scored = docs.withColumn("_q", quality_score(text_col, stopwords))
    kept = scored.filter(F.col("_q") >= F.lit(float(min_quality)))
    w = Window.partitionBy(fingerprint(text_col)).orderBy(F.col(id_col).asc())
    surv = (
        kept.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    out = surv.withColumn(text_col, pii_scrub(text_col, kinds=pii_kinds))
    if sample_rate is not None:
        out = hash_sample(out, id_col, sample_rate, sample_salt)
    return out.select(id_col, text_col, F.col("_q").alias(QUALITY_COL))
