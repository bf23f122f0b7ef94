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
tag both inputs, union them, and run ONE ``last(struct, ignorenulls)``
window per key ordered by (ts, side). Each key shuffles ONCE and is
scanned linearly — no join amplification, no per-row range probe — the
same shape Flink's temporal join and pandas ``merge_asof`` compute, but
distributed. All value columns ride in a single struct, so every left
row receives a COHERENT snapshot of exactly one right row (never a mix
of columns from different right rows), and a right row carrying NULL in
a value column correctly shadows older non-null values.

Hot keys: by default a key's whole timeline sorts within one partition,
so one dominant entity serializes. Pass ``bucket`` (e.g. ``"1 hour"``)
to split each key across (key, time-bucket) partitions: a compact
per-(key, bucket) carry table (one row per bucket, NOT per event)
computes each bucket's carry-in boundary state, which is injected as a
synthetic row at the bucket start — so the expensive per-event window
runs per (key, bucket) and a hot key spreads over as many tasks as it
spans buckets, while results stay IDENTICAL to the unbucketed form.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_pq_asof_side"
_VALS = "_pq_asof_vals"
_BUCKET = "_pq_asof_bucket"

# side ordering at equal ts: carry-in (older bucket) < right (visible at its
# own instant) < left (sees rights at exactly its ts)
_SIDE_CARRY, _SIDE_RIGHT, _SIDE_LEFT = -1, 0, 1


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: str,
    value_cols: Sequence[str],
    bucket: str | None = None,
) -> DataFrame:
    """Backward inclusive as-of join.

    - ``on``: the ordering (timestamp) column, present in both inputs.
    - ``by``: the key column, present in both inputs.
    - ``value_cols``: right-side columns to attach; must not collide with
      left-side columns (the carry would silently mix sides otherwise —
      collisions raise instead).
    - ``bucket``: optional time-bucket duration (``"1 hour"``) — same
      results, but hot keys parallelize across (key, bucket) partitions.
    - Right rows must be unique per (by, on); with duplicates the carried
      row among equal timestamps is not defined (same caveat DuckDB's
      ASOF JOIN has).

    Left rows with no prior right row keep NULL value columns (left-join
    semantics). Equal timestamps match (right row at exactly left.ts is
    visible) — the right side sorts before the left at the same instant.

    All value columns are carried as one struct, so each left row gets
    every value from the SAME most-recent right row — including its NULL
    fields (row-coherent snapshot, matching DuckDB/pandas asof semantics).
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
        F.lit(None)
        .cast(right.select(F.struct(*value_cols).alias(_VALS)).schema[_VALS].dataType)
        .alias(_VALS),
        F.lit(_SIDE_LEFT).alias(_SIDE),
    )
    r_tagged = right.select(
        *[
            F.col(c) if c in (on, by) else F.lit(None).cast(t).alias(c)
            for c, t in left.dtypes
        ],
        F.struct(*value_cols).alias(_VALS),
        F.lit(_SIDE_RIGHT).alias(_SIDE),
    )
    unioned = l_tagged.unionByName(r_tagged)

    if bucket is None:
        part = Window.partitionBy(by)
    else:
        unioned = unioned.withColumn(_BUCKET, F.window(F.col(on), bucket)["start"])
        unioned = _inject_bucket_carry(unioned, on=on, by=by)
        part = Window.partitionBy(by, _BUCKET)

    w = part.orderBy(F.col(on).asc(), F.col(_SIDE).asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    carried = unioned.select(
        *left_cols,
        F.col(_SIDE),
        F.last(F.col(_VALS), ignorenulls=True).over(w).alias(_VALS),
    )
    out = carried.filter(F.col(_SIDE) == _SIDE_LEFT)
    return out.select(
        *left_cols, *[F.col(f"{_VALS}.{c}").alias(c) for c in value_cols]
    )


def _inject_bucket_carry(unioned: DataFrame, *, on: str, by: str) -> DataFrame:
    """Union synthetic carry-in rows so each (key, bucket) partition is
    self-contained.

    The carry table has ONE row per (key, bucket) pair present in the data
    — orders of magnitude smaller than the event stream — so the
    per-key-ordered window that propagates boundary state across buckets
    is cheap even for a key holding 90% of all rows; only the compact
    carry rows of that key serialize, never its events.
    """
    # last right-side snapshot within each (key, bucket)
    bucket_last = (
        unioned.filter(F.col(_SIDE) == _SIDE_RIGHT)
        .groupBy(by, _BUCKET)
        .agg(F.max_by(F.col(_VALS), F.col(on)).alias(_VALS))
    )
    # every (key, bucket) that exists at all (left-only buckets still need
    # carry-in), with the per-bucket last right snapshot where present
    all_buckets = unioned.select(by, _BUCKET).distinct()
    per_bucket = all_buckets.join(bucket_last, [by, _BUCKET], "left")
    # carry-in for bucket b = last snapshot from any STRICTLY earlier bucket
    w_prev = (
        Window.partitionBy(by)
        .orderBy(F.col(_BUCKET).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        per_bucket.select(
            by,
            _BUCKET,
            F.last(F.col(_VALS), ignorenulls=True).over(w_prev).alias(_VALS),
        )
        .filter(F.col(_VALS).isNotNull())
    )
    left_schema = [
        (c, t) for c, t in unioned.dtypes if c not in (by, _BUCKET, _VALS, _SIDE)
    ]
    synth = carry.select(
        *[
            F.col(_BUCKET).alias(c) if c == on else F.lit(None).cast(t).alias(c)
            for c, t in left_schema
        ],
        F.col(by),
        F.col(_VALS),
        F.lit(_SIDE_CARRY).alias(_SIDE),
        F.col(_BUCKET),
    )
    return unioned.unionByName(synth)
