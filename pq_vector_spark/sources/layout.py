"""Z-order (Morton-curve) clustered parquet layout — multi-column data
clustering so parquet row-group min/max statistics prune MULTI-dimensional
range predicates (extension surface; same family as the index-preserving
rewrite in index/build.py, which clusters one dimension — the IVF cluster
id. Z-order is what Delta OPTIMIZE ZORDER BY / Iceberg sort orders do).

Why: a layout sorted on column A prunes predicates on A only; a predicate
on (A, B) scans everything matching A. Interleaving the bits of grid-coded
(A, B, …) into one sort key keeps rows that are close in EVERY dimension
close in file order, so each row group covers a small hyper-rectangle and
min/max stats prune boxes in any queried dimension.

Scale shape: one bounded stats pass (min/max per clustered column — a
2·n_cols scalar aggregate), then `repartitionByRange(z)` +
`sortWithinPartitions(z)` + parquet write: exactly one shuffle, the same
cost as any global sort, entirely native expressions (the bit interleave
unrolls into shift/or arithmetic inside whole-stage codegen).

Caveat (documented, standard): the grid is an affine min/max scaling, so
extreme outliers compress the grid for everyone else. Clustered columns
are cast to double for coding — exact layout of NaN/NULL rows is
irrelevant to correctness (they sort to one end; content is preserved
regardless).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_COL = "_z_order_key"


def zorder_key(
    df: DataFrame, cols: Sequence[str], *, bits: int = 12
) -> tuple[DataFrame, Column]:
    """Return (df, key) where ``key`` is the Morton interleave of the
    ``cols`` values grid-coded to ``bits`` bits each via min/max affine
    scaling. ``bits · len(cols)`` must fit a signed 64-bit key (≤ 62).
    NULL/NaN values code to grid cell 0."""
    cols = list(cols)
    if not cols:
        raise ValueError("zorder needs at least one column")
    if bits * len(cols) > 62:
        raise ValueError(
            f"bits({bits}) × cols({len(cols)}) exceeds the 62-bit key budget"
        )
    # one bounded stats pass: 2 scalars per clustered column
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"_mx_{c}") for c in cols],
    ).collect()[0]
    n_cells = (1 << bits) - 1
    grids = []
    for c in cols:
        mn, mx = stats[f"_mn_{c}"], stats[f"_mx_{c}"]
        if mn is None or mx is None or mx <= mn:
            grids.append(F.lit(0).cast("long"))
            continue
        v = F.col(c).cast("double")
        scaled = (v - F.lit(float(mn))) / F.lit(float(mx - mn)) * F.lit(float(n_cells))
        g = (
            F.when(v.isNull() | F.isnan(v), F.lit(0))
            .otherwise(F.least(F.greatest(F.floor(scaled), F.lit(0)), F.lit(n_cells)))
            .cast("long")
        )
        grids.append(g)
    n = len(cols)
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, g in enumerate(grids):
            bit = F.shiftright(g, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + i))
    return df, key


def zorder_write(
    df: DataFrame,
    cols: Sequence[str],
    path: str,
    *,
    bits: int = 12,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` to parquet clustered on the Z-order of ``cols``:
    range-partition on the key (balanced output files via range sampling),
    sort within each partition, drop the key, write. Row-group min/max on
    every clustered column becomes box-selective."""
    df, key = zorder_key(df, cols, bits=bits)
    keyed = df.withColumn(Z_COL, key)
    parted = (
        keyed.repartitionByRange(num_files, Z_COL)
        if num_files
        else keyed.repartitionByRange(Z_COL)
    )
    (
        parted.sortWithinPartitions(Z_COL)
        .drop(Z_COL)
        .write.mode(mode)
        .parquet(path)
    )
