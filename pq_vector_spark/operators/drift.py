"""Distribution drift between two corpus slices/snapshots — PSI
(population stability index) over fixed-edge histograms (north-star
extension: the monitoring step of a continuously-ingested training
corpus; a drifting length/quality distribution is the first sign a
crawler or filter broke).

Semantics: both sides bin a numeric column into ``bins`` equal-width
buckets over [lo, hi) (values clamped into the edge buckets, NULLs
dropped), shares are n_bucket/n_total, and PSI = Σ (p−q)·ln(p/q) with an
``eps`` floor so empty buckets contribute finitely (the standard
industry form; PSI > 0.2 is the usual "investigate" threshold).

Fixed edges — not per-run quantiles — so two runs are comparable and the
DuckDB oracle reproduces every bucket exactly.

Scale design (100 TB): each side is ONE map-side binning pass + a
``bins``-row aggregation (map-side partial combine; the exchanges carry
O(bins)). The bucket join is bins × bins tiny. Nothing else moves.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketize(col, lo: float, hi: float, bins: int) -> Column:
    """Equal-width bucket id in [0, bins): floor((x−lo)/w) clamped into
    the edge buckets. Portable integer/double math (no engine-specific
    width_bucket semantics)."""
    if not (hi > lo) or bins <= 0:
        raise ValueError(f"need hi > lo and bins > 0, got [{lo}, {hi}) x {bins}")
    w = (hi - lo) / bins
    c = F.col(col) if isinstance(col, str) else col
    raw = F.floor((c.cast("double") - F.lit(float(lo))) / F.lit(w))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(int(bins - 1))).cast("int")


def _shares(df: DataFrame, col: str, lo: float, hi: float, bins: int, name: str) -> DataFrame:
    """One corpus pass: bucket counts, with the total derived from the
    bins-row result (a broadcast cross join) instead of a second scan."""
    b = df.filter(F.col(col).isNotNull()).select(
        bucketize(col, lo, hi, bins).alias("bucket")
    )
    counts = b.groupBy("bucket").agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    total = counts.agg(F.sum("_n").cast("double").alias("_t"))
    return counts.crossJoin(F.broadcast(total)).select(
        "bucket",
        (F.col("_n").cast("double") / F.col("_t")).alias(name),
    )


def distribution_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    *,
    lo: float,
    hi: float,
    bins: int = 10,
    eps: float = 1e-6,
    decimals: int = 6,
) -> DataFrame:
    """Per-bucket drift table between baseline ``df_a`` and candidate
    ``df_b``: (bucket, share_a, share_b, psi_contrib), all buckets 0..bins−1
    present (missing → share 0, eps-floored in the contribution).

    Total PSI = sum(psi_contrib); kept per-bucket so the drifting REGION
    of the distribution is visible, not just the scalar.
    """
    spark = df_a.sparkSession
    sa = _shares(df_a, col, lo, hi, bins, "share_a")
    sb = _shares(df_b, col, lo, hi, bins, "share_b")
    all_b = spark.range(bins).select(F.col("id").cast("int").alias("bucket"))
    j = (
        all_b.join(F.broadcast(sa), "bucket", "left")
        .join(F.broadcast(sb), "bucket", "left")
        .fillna(0.0, subset=["share_a", "share_b"])
    )
    p = F.greatest(F.col("share_a"), F.lit(float(eps)))
    q = F.greatest(F.col("share_b"), F.lit(float(eps)))
    return j.select(
        "bucket",
        F.round("share_a", decimals).alias("share_a"),
        F.round("share_b", decimals).alias("share_b"),
        F.round((p - q) * F.log(p / q), decimals).alias("psi_contrib"),
    )


def psi(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    *,
    lo: float,
    hi: float,
    bins: int = 10,
    eps: float = 1e-6,
) -> float:
    """Scalar PSI (driver-side sum of the bins-row drift table)."""
    rows = distribution_drift(
        df_a, df_b, col, lo=lo, hi=hi, bins=bins, eps=eps, decimals=12
    ).collect()
    return float(sum(r["psi_contrib"] for r in rows))
