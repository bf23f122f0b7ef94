"""Sequence packing — assign documents to fixed-token-budget training
sequences (north-star extension: the step between a curated corpus and a
training dataloader).

Semantics: GPT-style *concatenate-and-cut*. Within each group (shard),
documents are laid out in a deterministic order (``order_col`` ascending),
token counts accumulate, and the stream is cut every ``max_tokens``:

    start(doc)    = exclusive running sum of tokens before it
    first_seq(doc) = floor(start / max_tokens)
    last_seq(doc)  = floor((start + tokens - 1) / max_tokens)

A document may straddle a cut (first_seq < last_seq) — exactly how GPT /
Llama pretraining packs (documents are concatenated with an EOS separator
and split at the sequence boundary), and what makes the assignment a pure
closed-form window expression instead of a sequential first-fit fold.

Scale design (100 TB):
- ONE shuffle: the window partitions by ``group_col`` (a shard key —
  source, date-bucket, or a hash bucket). Each group's window evaluates
  independently; parallelism = number of groups.
- A single global group would serialize into one task — so ``group_col``
  is REQUIRED. For an unsharded corpus, pass a derived hash-bucket column
  (e.g. ``pmod(hash_bucket(id), 4096)``): packing within buckets changes
  nothing semantically (sequence ids are per-group) and keeps every task
  bounded.
- The running sum is the window's partial state — O(1) per row, no
  buffering (ROWS UNBOUNDED PRECEDING running aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    tokens_col: str,
    *,
    group_col: str,
    order_col: str,
    max_tokens: int,
    start_name: str = "start_offset",
    first_name: str = "first_seq",
    last_name: str = "last_seq",
) -> DataFrame:
    """Append per-doc packing columns: token start offset within the
    group's concatenated stream, and the first/last sequence index the doc
    occupies under a ``max_tokens`` cut.

    Deterministic: depends only on (group, order, token counts) — never on
    partitioning or run order. ``order_col`` must be unique within a group
    for a stable layout (a row id / doc id).
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tok = F.col(tokens_col).cast("bigint")
    start = (F.sum(tok).over(w) - tok).alias(start_name)
    out = df.withColumn(start_name, start)
    s = F.col(start_name)
    return out.withColumn(
        first_name, F.floor(s / F.lit(int(max_tokens))).cast("bigint")
    ).withColumn(
        last_name,
        F.floor(
            (s + F.greatest(tok, F.lit(1)) - F.lit(1)) / F.lit(int(max_tokens))
        ).cast("bigint"),
    )


def packing_stats(
    df: DataFrame,
    tokens_col: str,
    *,
    group_col: str,
    max_tokens: int,
) -> DataFrame:
    """Per-group packing summary: docs, total tokens, number of sequences
    (= ceil(total / max_tokens)), and mean fill of the non-final sequences
    (always 1.0 under concatenate-and-cut — reported to keep the contract
    honest and comparable against non-straddling packers).

    One partial-agg shuffle on ``group_col``; no window.
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    tok = F.col(tokens_col).cast("bigint")
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(tok).cast("bigint").alias("total_tokens"),
        F.ceil(F.sum(tok) / F.lit(int(max_tokens))).cast("bigint").alias("n_sequences"),
    )
