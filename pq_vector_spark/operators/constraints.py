"""Data-quality constraint checking — Deequ-style expectations evaluated
in ONE corpus pass (north-star extension: a 100 TB ingest gates on
declared invariants before anything downstream trains on it).

Two kinds of checks:
- Row-wise rules (``check_constraints``): each rule is a boolean Column
  (True = row passes). ALL rules evaluate in a single aggregation over a
  single scan — one conditional sum per rule, map-side partial agg, no
  shuffle of data rows (only the 1-row partials). Adding a rule adds a
  counter, not a pass.
- Key uniqueness (``check_unique``): needs a distinct count, i.e. one
  hash-partitioned aggregation on the key — kept separate so the row-wise
  pass stays shuffle-free.

Output is long format (one row per rule: violations, total, pass
fraction) so results feed dashboards/alerts without schema churn.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_constraints(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """Evaluate row-wise boolean rules in one pass.

    Returns (rule, violations, total, pass_frac) — one row per rule,
    deterministic order-free. A NULL rule result counts as a violation
    (unknown is not a pass — the conservative reading).
    """
    if not rules:
        raise ValueError("rules must name at least one boolean Column")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("_total")]
    for name in sorted(rules):
        aggs.append(
            F.sum(
                F.when(rules[name].eqNullSafe(F.lit(True)), F.lit(0)).otherwise(
                    F.lit(1)
                )
            )
            .cast("bigint")
            .alias(f"_v_{name}")
        )
    wide = df.agg(*aggs)
    pairs = []
    for name in sorted(rules):
        pairs.append(F.lit(name))
        pairs.append(F.col(f"_v_{name}"))
    return wide.select(
        F.col("_total"),
        F.expr(
            f"stack({len(rules)}, "
            + ", ".join(
                f"'{name}', _v_{name}" for name in sorted(rules)
            )
            + ") AS (rule, violations)"
        ),
    ).select(
        "rule",
        "violations",
        F.col("_total").alias("total"),
        F.round(
            F.lit(1.0) - F.col("violations").cast("double") / F.col("_total").cast("double"),
            6,
        ).alias("pass_frac"),
    )


def check_unique(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Key-uniqueness check: (n_rows, n_distinct, duplicates). One
    hash aggregation on the key (map-side combine); never collects."""
    key_cols = list(key_cols)
    if not key_cols:
        raise ValueError("key_cols must name at least one column")
    per_key = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_c"))
    return per_key.agg(
        F.sum("_c").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        (F.sum("_c") - F.count(F.lit(1))).cast("bigint").alias("duplicates"),
    )


def profile_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Generic column profile — (column, n_rows, n_nulls, n_distinct,
    min_value, max_value) per requested column, min/max stringified for a
    type-uniform long format (the ingest-time "what does this table look
    like" report; pairs with ``check_constraints`` the way a profiler
    pairs with assertions).

    All columns profile in ONE aggregation pass over one scan (Catalyst
    plans the multi-distinct via a single expand — adding a column adds
    counters, not a scan). NULLs are excluded from distinct/min/max
    (standard SQL aggregate semantics, identical in the oracle).
    """
    cols = list(cols)
    if not cols:
        raise ValueError("cols must name at least one column")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("_total")]
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"_nn_{c}")
        )
        aggs.append(F.countDistinct(F.col(c)).cast("bigint").alias(f"_nd_{c}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"_mn_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"_mx_{c}"))
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', _nn_{c}, _nd_{c}, _mn_{c}, _mx_{c}" for c in cols
    )
    return wide.select(
        F.col("_total"),
        F.expr(
            f"stack({len(cols)}, {stack}) AS "
            "(column, n_nulls, n_distinct, min_value, max_value)"
        ),
    ).select(
        "column",
        F.col("_total").alias("n_rows"),
        "n_nulls",
        "n_distinct",
        "min_value",
        "max_value",
    )
