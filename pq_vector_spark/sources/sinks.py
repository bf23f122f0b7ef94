"""Training-shard sink: write a corpus as balanced, internally-sorted
shard files plus a manifest — the output contract of a curation pipeline
(the reference's write surface is its indexed-parquet layout,
src/ivf/parquet.rs; this is the complementary EXPORT path a training run
consumes).

Why not plain ``df.write.parquet``: loader-friendly shards need (a) a
bounded, predictable shard count, (b) balanced shard sizes even when the
shard key is skewed, and (c) a deterministic within-shard order (curriculum
by quality, length grouping for packing efficiency). Range partitioning +
within-partition sort gives all three with exactly ONE shuffle.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_training_shards(
    df: DataFrame,
    path: str,
    *,
    shard_col: str,
    sort_cols: Optional[Sequence[str]] = None,
    n_shards: int = 8,
    max_records_per_file: Optional[int] = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``n_shards`` range-partitioned parquet shards,
    sorted within each shard by ``sort_cols`` (default: the shard column).

    - ``repartitionByRange`` samples the shard column's distribution and
      draws balanced boundaries — shard sizes stay even under skew (a hash
      partitioner cannot promise that, and a global ``orderBy`` would
      serialize the write through one final merge).
    - ``sortWithinPartitions`` costs no extra shuffle: the sort rides the
      same exchange.
    - ``maxRecordsPerFile`` (when set) caps file sizes for loaders that
      memory-map whole files.

    At 100 TB this is one shuffle of the corpus — the minimum possible for
    a globally-organized layout — and every shard writes in parallel.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if shard_col not in df.columns:
        raise ValueError(f"shard_col {shard_col!r} missing from input")
    order = [F.col(c).asc() for c in (sort_cols or [shard_col])]
    out = df.repartitionByRange(n_shards, F.col(shard_col)).sortWithinPartitions(
        *order
    )
    writer = out.write.mode(mode)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
    writer.parquet(path)


def shard_manifest(spark: SparkSession, path: str) -> DataFrame:
    """One row per shard file: (file, n_rows) — the loader-side index of a
    written shard set. A single aggregation over ``input_file_name`` (file
    cardinality = shard count, so the result is tiny at any scale)."""
    return (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    )
