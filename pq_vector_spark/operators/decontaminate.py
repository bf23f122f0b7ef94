"""Benchmark decontamination — flag and drop training documents that
overlap an evaluation/benchmark set by shared n-grams (north-star
extension; the reference engine has no text surface, and every serious
LLM data pipeline runs this step before training).

Semantics (the standard n-gram decontamination contract, cf. the GPT-3 /
PaLM data cards): a corpus document is *contaminated* by an eval document
when they share at least ``min_grams`` distinct token n-grams, or when the
shared grams cover at least ``threshold`` of the eval document's distinct
grams. Both signals are reported; ``decontaminate`` drops any corpus doc
flagged against any eval doc.

Scale design (100 TB corpus, benchmark-sized eval set):
- The eval set is benchmark-sized (10^3..10^6 grams) — its distinct-gram
  table is built once and BROADCAST. The corpus side is a pure map-side
  shingle + broadcast hash join: the corpus never shuffles to discover
  matches, and non-matching grams (the overwhelming majority) die in the
  map stage.
- The only shuffle is the (corpus_id, eval_id) partial-count aggregation,
  whose input is just the *matching* gram pairs — rare by construction.
- ``decontaminate`` applies the flagged-id set with a broadcast LEFT ANTI
  join: the corpus again never shuffles.
- All gram hashing defaults to the md5-derived 60-bit ``token_hash``
  (portable: the DuckDB oracle reproduces every hash bit-for-bit);
  ``gram_hash="fast"`` swaps in JVM ``xxhash64`` for the at-scale probe
  (the md5 dominates the corpus side's per-gram cost — same trade as
  DSIR's ``bucket_hash`` and bloom's ``gram_hash``). Collision risk is
  the same 2^-60-ish regime either way; pick one family per pipeline.

Join keys are 8-byte gram hashes, not gram strings — same trade as
``dedup.ngram_jaccard_pairs`` (operators/dedup.py:142-144).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pq_vector_spark.functions.text import gram_hash_fn
from pq_vector_spark.operators.dedup import shingles


def _gram_table(
    df: DataFrame, text_col: str, id_col: str, n: int, gram_hash: str = "portable"
) -> DataFrame:
    """(_id, _ng total distinct grams, _g exploded gram hash) — one row per
    distinct gram per doc; map-side only."""
    from pq_vector_spark.parallel import ensure_compute_parallelism

    hf = gram_hash_fn(gram_hash)
    # r16 (guide §2.5): spread the slim (id, text) projection before the
    # shingle+hash explode so a single-row-group source doesn't hash all
    # grams in ONE task; no-op at real scan widths.
    return (
        ensure_compute_parallelism(
            df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_gtxt"))
        )
        .select(F.col("_id"), shingles("_gtxt", n).alias("_sh"))
        .select(
            "_id",
            F.size("_sh").alias("_ng"),
            F.explode(F.transform(F.col("_sh"), lambda s: hf(s))).alias("_g"),
        )
    )


def contamination_report(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    *,
    corpus_id: str = "doc_id",
    eval_id: str = "doc_id",
    n: int = 5,
    min_grams: int = 1,
    gram_hash: str = "portable",
) -> DataFrame:
    """Per (corpus doc, eval doc) overlap: distinct shared n-grams and the
    fraction of the eval doc's grams covered. ``gram_hash="fast"`` swaps
    md5 gram keys for xxhash64 on BOTH sides (the at-scale probe; see the
    module docstring).

    Returns columns: ``corpus_id``, ``eval_id``, ``shared_grams``,
    ``eval_grams``, ``overlap_frac`` (double, shared/eval — int/int ratio,
    bit-identical across engines). Rows with shared < ``min_grams`` are
    dropped.

    Plan shape: corpus grams (map-side) ⨝ broadcast(eval grams) →
    groupBy(corpus_id, eval_id) count. The corpus side never shuffles for
    the join; only matching gram pairs reach the aggregation exchange.
    """
    cg = _gram_table(corpus, text_col, corpus_id, n, gram_hash).select(
        "_id", "_g"
    )
    eg = _gram_table(eval_df, text_col, eval_id, n, gram_hash).select(
        F.col("_id").alias("_eid"), F.col("_ng").alias("_eng"), "_g"
    )
    joined = cg.join(F.broadcast(eg), "_g")
    return (
        joined.groupBy("_id", "_eid", "_eng")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_grams"))
        .filter(F.col("shared_grams") >= F.lit(int(min_grams)))
        .select(
            F.col("_id").alias(corpus_id),
            F.col("_eid").alias("eval_id"),
            "shared_grams",
            F.col("_eng").cast("bigint").alias("eval_grams"),
            (F.col("shared_grams").cast("double") / F.col("_eng").cast("double")).alias(
                "overlap_frac"
            ),
        )
    )


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    *,
    corpus_id: str = "doc_id",
    eval_id: str = "doc_id",
    n: int = 5,
    min_grams: int = 8,
    threshold: float = 0.5,
    gram_hash: str = "portable",
) -> DataFrame:
    """Drop corpus docs contaminated by ANY eval doc: flagged when
    ``shared_grams >= min_grams`` OR ``overlap_frac >= threshold``.
    ``gram_hash="fast"`` swaps md5 gram keys for xxhash64 (at-scale
    probe; the default stays oracle-replayable).

    The flagged-id set is eval-bounded (≤ corpus docs that share grams
    with the benchmark) — applied via broadcast LEFT ANTI so the surviving
    corpus is produced without shuffling the corpus.
    """
    rep = contamination_report(
        corpus,
        eval_df,
        text_col,
        corpus_id=corpus_id,
        eval_id=eval_id,
        n=n,
        min_grams=1,
        gram_hash=gram_hash,
    )
    flagged = (
        rep.filter(
            (F.col("shared_grams") >= F.lit(int(min_grams)))
            | (F.col("overlap_frac") >= F.lit(float(threshold)))
        )
        .select(F.col(corpus_id).alias("_flagged"))
        .distinct()
    )
    return corpus.join(
        F.broadcast(flagged),
        corpus[corpus_id] == flagged["_flagged"],
        "left_anti",
    )
