"""CDC merge / upsert — apply a changeset (inserts, updates, deletes) to a
base table, latest change per key winning (north-star extension: the
incremental-corpus primitive — nightly crawl deltas, takedown requests,
label corrections — without which a 100 TB corpus would be rebuilt from
scratch on every revision).

Semantics (``MERGE INTO`` with last-writer-wins):
- ``changes`` carries the base's payload columns plus an op column
  (upsert vs delete) and a version column ordering changes to the same key.
- For each key, the highest-version change is selected; earlier changes to
  that key are superseded (never applied).
- Result = base rows whose key has no change, plus the payload of each
  key's winning change when it is an upsert; keys whose winning change is
  a delete disappear. Keys new to the base appear (insert).

Scale design (100 TB base, delta-sized changeset):
- The winner-per-key window shuffles only the CHANGES (delta-sized).
- The apply is one LEFT ANTI (drop superseded/deleted base rows) plus a
  union with the winning upserts. The changeset key set is broadcast, so
  the base NEVER shuffles — the whole merge is a map-side filter over the
  base plus a logical union. With a non-broadcastable changeset Spark
  falls back to a sort-merge join on the key: one shuffle each side,
  still no window over the base.
- Output partitioning follows the base scan — downstream layout
  (Z-order, index) is re-applied per the usual rewrite path.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_changes(
    changes: DataFrame,
    key_cols: Sequence[str],
    version_col: str,
    *,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Winner per key: highest version; version ties broken delete-first (a
    delete outranks an upsert at the same version — deterministic, and the
    conservative reading of a conflicting feed), then op descending for
    full determinism among non-delete ops. Shuffles only the changeset."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(version_col).desc(),
        (F.col(op_col) == F.lit(delete_op)).desc(),
        F.col(op_col).desc(),
    )
    return (
        changes.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    version_col: str,
    *,
    op_col: str = "op",
    delete_op: str = "D",
    broadcast: bool | None = None,
    broadcast_max_rows: int = 4_000_000,
) -> DataFrame:
    """Apply ``changes`` to ``base`` (schema: base columns + op/version).

    Returns a DataFrame with exactly the base's columns. When the changeset
    is small its key set rides a broadcast LEFT ANTI against the base (base
    never shuffles); a changeset too large to broadcast (a quarter-billion
    takedown keys would OOM executors) falls back to a sort-merge anti-join
    — one shuffle each side, still no window over the base, and AQE may
    still downgrade it to a broadcast at runtime if the shuffled key set
    turns out tiny.

    ``broadcast=None`` (auto) sizes the changeset with a bounded probe —
    ``changes.select(keys).distinct().limit(broadcast_max_rows + 1).count()``
    measures what is actually broadcast (the DISTINCT touched-key set, not
    raw change rows — a repetitive feed with many updates per key stays on
    the broadcast path) and the ``limit`` caps the probe's output without
    running the winner window twice. Pass True/False to force either join
    strategy.
    HOT-LOOP callers (a foreachBatch applying delta-sized micro-batches)
    should pin ``broadcast=True`` — the probe is an extra job per call,
    and a micro-batch is broadcastable by construction
    (tests/test_merge.py::test_forced_broadcast_skips_probe_job asserts
    the pinned path launches zero jobs at plan construction).
    """
    key_cols = list(key_cols)
    missing = [c for c in key_cols + [version_col, op_col] if c not in changes.columns]
    if missing:
        raise ValueError(f"changes is missing required columns: {missing}")
    payload_missing = [c for c in base.columns if c not in changes.columns]
    if payload_missing:
        raise ValueError(f"changes lacks base payload columns: {payload_missing}")

    if broadcast is None:
        probe = (
            changes.select(*key_cols)
            .distinct()
            .limit(broadcast_max_rows + 1)
            .count()
        )
        broadcast = probe <= broadcast_max_rows

    winners = latest_changes(
        changes, key_cols, version_col, op_col=op_col, delete_op=delete_op
    )
    touched = winners.select(*key_cols).distinct()
    if broadcast:
        touched = F.broadcast(touched)
    untouched = base.join(touched, key_cols, "left_anti")
    upserts = winners.filter(F.col(op_col) != F.lit(delete_op)).select(*base.columns)
    return untouched.unionByName(upserts)
