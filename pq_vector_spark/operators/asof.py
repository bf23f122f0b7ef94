"""As-of (temporal) join — a custom operator Spark's built-in join surface
lacks (north-star extension; the brief's canonical example of a
composition-of-DataFrame-ops operator).

``asof_join(left, right, ...)`` attaches to every left row the value
columns of the MOST RECENT right row of the same key with
``right.ts <= left.ts`` (backward direction, inclusive) — the
point-in-time-correct enrichment primitive for feature pipelines (no
future leakage: a training example only ever sees state that existed at
its own timestamp).

Implementation is the scalable union–window recipe, NOT a range join:
tag both inputs, union them, and run one ``last(value, ignorenulls)``
window per key ordered by (ts, side). Each key shuffles ONCE and is
scanned linearly — no join amplification, no per-row range probe — the
same shape Flink's temporal join and pandas ``merge_asof`` compute, but
distributed. A key's whole timeline sorts within one partition, so a
pathologically hot key serializes; pre-bucketing by (key, coarse time
bucket) is the standard mitigation when one entity dominates.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_pq_asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Backward inclusive as-of join.

    - ``on``: the ordering (timestamp) column, present in both inputs.
    - ``by``: the key column, present in both inputs.
    - ``value_cols``: right-side columns to attach; must not collide with
      left-side columns (the ``ignorenulls`` carry would silently mix
      sides otherwise — collisions raise instead).
    - Right rows must be unique per (by, on); with duplicates the carried
      row among equal timestamps is not defined (same caveat DuckDB's
      ASOF JOIN has).

    Left rows with no prior right row keep NULL value columns (left-join
    semantics). Equal timestamps match (right row at exactly left.ts is
    visible) — the right side sorts before the left at the same instant.

    Limitation: a right row whose value IS NULL is indistinguishable from
    "no row" to the ignorenulls carry — an older non-null value wins.
    Encode meaningful nulls with a sentinel before joining if that matters.
    """
    value_cols = list(value_cols)
    if not value_cols:
        raise ValueError("value_cols must name at least one right-side column")
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"value_cols {sorted(clash)} collide with left columns — alias the "
            "right side first"
        )
    for c in (on, by, *value_cols):
        src = left.columns if c in (on, by) else right.columns
        if c not in src:
            raise ValueError(f"column {c!r} missing from input")

    left_cols = list(left.columns)
    l_tagged = left.select(
        *left_cols,
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c) for c in value_cols],
        F.lit(1).alias(_SIDE),
    )
    r_tagged = right.select(
        *[
            F.col(c) if c in (on, by) else F.lit(None).cast(t).alias(c)
            for c, t in left.dtypes
        ],
        *[F.col(c) for c in value_cols],
        F.lit(0).alias(_SIDE),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *left_cols,
        F.col(_SIDE),
        *[F.last(F.col(c), ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    return carried.filter(F.col(_SIDE) == 1).drop(_SIDE)
