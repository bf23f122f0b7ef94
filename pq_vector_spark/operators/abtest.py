"""A/B experiment readout — per-variant conversion rates and the
two-proportion z statistic (delegated-relational analytics surface: the
experiment query every event-warehouse user runs; kept to sqrt/arithmetic
so the DuckDB oracle reproduces it to the digit — no erf, the p-value
lookup belongs to the caller's stats library).

Semantics: a unit (user) counts as exposed to a variant if it has any
exposure event for it, converted if it has any conversion event; rates
are converted/exposed per variant; for each variant pair (a < b) the
pooled two-proportion z = (p_a − p_b) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b)).
|z| ≥ 1.96 ≈ 95% significance — the flag column, computed, not assumed.

Scale design (100 TB of events):
- exposure/conversion reduce to distinct (unit, variant) BEFORE any
  join — bounded by units × variants, not events.
- per-variant totals are a variants-row aggregate; the pairwise z-table
  is variants² rows of driver-free column math (a broadcast self-join of
  a tiny frame). Nothing quadratic in data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ab_test(
    events: DataFrame,
    variant_col: str,
    unit_col: str,
    is_exposure: Column,
    is_conversion: Column,
    *,
    decimals: int = 6,
) -> DataFrame:
    """Pairwise experiment readout: (variant_a, variant_b, n_a, n_b,
    rate_a, rate_b, z, significant) for every ordered pair a < b.

    ``is_exposure`` / ``is_conversion`` are boolean Columns evaluated per
    event row (e.g. ``F.col("event_type") == "view"``).
    """
    exposed = (
        events.filter(is_exposure)
        .select(F.col(variant_col).alias("_v"), F.col(unit_col).alias("_u"))
        .distinct()
    )
    converted = (
        events.filter(is_conversion)
        .select(F.col(variant_col).alias("_v"), F.col(unit_col).alias("_u"))
        .distinct()
    )
    per = (
        exposed.join(converted.withColumn("_c", F.lit(1)), ["_v", "_u"], "left")
        .groupBy("_v")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.coalesce(F.col("_c"), F.lit(0))).cast("bigint").alias("conv"),
        )
    )
    a, b = per.alias("a"), per.alias("b")
    pa = F.col("a.conv").cast("double") / F.col("a.n").cast("double")
    pb = F.col("b.conv").cast("double") / F.col("b.n").cast("double")
    pooled = (F.col("a.conv") + F.col("b.conv")).cast("double") / (
        F.col("a.n") + F.col("b.n")
    ).cast("double")
    se = F.sqrt(
        pooled
        * (F.lit(1.0) - pooled)
        * (
            F.lit(1.0) / F.col("a.n").cast("double")
            + F.lit(1.0) / F.col("b.n").cast("double")
        )
    )
    # se = 0 ⟺ pooled rate is exactly 0 or 1 ⟺ both rates equal → z = 0 by
    # definition (and ANSI division would otherwise raise)
    z = F.when(se == F.lit(0.0), F.lit(0.0)).otherwise((pa - pb) / se)
    return (
        a.join(F.broadcast(b), F.col("a._v") < F.col("b._v"))
        .select(
            F.col("a._v").alias("variant_a"),
            F.col("b._v").alias("variant_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
            F.round(pa, decimals).alias("rate_a"),
            F.round(pb, decimals).alias("rate_b"),
            F.round(z, decimals).alias("z"),
            (F.abs(z) >= F.lit(1.96)).alias("significant"),
        )
    )
