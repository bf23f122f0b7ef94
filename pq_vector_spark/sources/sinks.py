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


def write_epoch_shards(
    df: DataFrame,
    path: str,
    *,
    key_col: str,
    epoch: int = 0,
    salt: str = "epoch",
    n_shards: int = 8,
    max_records_per_file: Optional[int] = None,
    mode: str = "overwrite",
) -> None:
    """Write one EPOCH of globally-shuffled training data: a deterministic
    pseudo-random permutation of the corpus, range-sharded so a loader that
    reads shards in file order and rows in stored order replays the exact
    sequence. The permutation key is the salted md5 hash of
    ``(salt, epoch, key)`` — the ``hash_sample`` portability contract
    applied to ORDERING — so it is reproducible across runs, partitionings,
    and engines, and every epoch is an independent shuffle of the same
    rows (no data loader RNG, no "shuffle buffer" locality bias: rows that
    were neighbors in storage are scattered globally).

    The written rows carry the 60-bit order key as ``_epoch_ord`` (the
    shard/sort column must exist in the output; loaders can also use it to
    VERIFY replay order). Range boundaries are sample-approximate, but
    that only moves the shard CUT POINTS — the concatenated sequence
    (shards in id order, rows in stored order) is the h-ascending
    permutation regardless, because range partitions are globally ordered.

    ``key_col`` must be NON-NULL and should uniquely identify rows: a NULL
    key cannot hash (the write FAILS LOUDLY on the first one — silently
    parking un-shuffled rows at the front of every epoch would violate the
    independence contract), and duplicate keys share an order key, so
    their relative order is arbitrary (they ride adjacently in every
    epoch). Scale shape: identical to ``write_training_shards`` (it
    delegates) — ONE shuffle of the corpus, the floor for any global
    reorganization; every shard sorts and writes in parallel, no
    single-task merge.
    """
    from pq_vector_spark.operators.sampling import _check_reserved, _salted_hash

    _check_reserved(df, {"_epoch_ord"})
    keyc = F.col(key_col)
    h = F.when(
        keyc.isNull(),
        F.raise_error(
            F.lit(
                f"write_epoch_shards: NULL {key_col!r} cannot be ordered — "
                "epoch shuffling requires a non-NULL key"
            )
        ).cast("bigint"),
    ).otherwise(_salted_hash(keyc, f"{salt}:{int(epoch)}:"))
    write_training_shards(
        df.withColumn("_epoch_ord", h),
        path,
        shard_col="_epoch_ord",
        sort_cols=["_epoch_ord", key_col],
        n_shards=n_shards,
        max_records_per_file=max_records_per_file,
        mode=mode,
    )


def verify_epoch_shards(
    spark: SparkSession,
    path: str,
    *,
    key_col: str,
    epoch: int = 0,
    salt: str = "epoch",
    expected_rows: Optional[int] = None,
) -> dict:
    """Loader-side audit of a written epoch: re-derive every row's order
    key from ``(salt, epoch, key)`` and check it equals the stored
    ``_epoch_ord`` (a corrupted/foreign shard set fails here), that no key
    appears twice (a doubled shard — e.g. a partially-retried write —
    fails here), and optionally that the row count matches the corpus the
    epoch was cut from. One aggregation over the shard set — no sort, no
    collect of data rows. Returns ``{"ok", "rows", "distinct_keys",
    "ord_mismatches"}``; run it before a multi-day training job consumes
    the epoch, not after.
    """
    from pq_vector_spark.operators.sampling import _salted_hash

    df = spark.read.parquet(path)
    if "_epoch_ord" not in df.columns:
        raise ValueError(f"{path} has no _epoch_ord column — not an epoch layout")
    expect = _salted_hash(F.col(key_col), f"{salt}:{int(epoch)}:")
    row = df.agg(
        F.count(F.lit(1)).alias("rows"),
        F.count_distinct(F.col(key_col)).alias("keys"),
        F.sum(
            F.when(F.col("_epoch_ord") != expect, 1).otherwise(0)
        ).alias("bad"),
    ).collect()[0]
    rows, keys, bad = int(row["rows"]), int(row["keys"]), int(row["bad"] or 0)
    ok = bad == 0 and keys == rows and (
        expected_rows is None or rows == int(expected_rows)
    )
    return {
        "ok": bool(ok),
        "rows": rows,
        "distinct_keys": keys,
        "ord_mismatches": bad,
    }
