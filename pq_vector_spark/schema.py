"""Vector-column inference and validation.

≙ reference behavior:
- auto-infer "first List/LargeList/FixedSizeList of Float32/Float64 column"
  (reference: benches/query.rs:364-384)
- build-time strictness: null rows, null elements, zero-length vectors and
  ragged dimensions all abort an index build
  (reference: src/ivf/parquet.rs:241-279)
- dimension inferred from data (parquet.rs:266-279), must be > 0
  (src/ivf/mod.rs:51-70); column name non-empty (mod.rs:17-49).

Spark has no FixedSizeList, so dimension consistency is enforced by a
distributed validation aggregate — one pass, no collect of data.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, FloatType


class VectorSchemaError(ValueError):
    """Raised for the same conditions the reference errors on."""


def infer_vector_column(df: DataFrame) -> str:
    """First array<float>/array<double> column, else error.

    ≙ reference vector-column inference (benches/query.rs:364-384).
    """
    for field in df.schema.fields:
        t = field.dataType
        if isinstance(t, ArrayType) and isinstance(t.elementType, (FloatType, DoubleType)):
            return field.name
    raise VectorSchemaError(
        "no array<float>/array<double> column found to use as the vector column"
    )


@dataclass
class VectorStats:
    rows: int
    dim: int


def validate_vector_column(df: DataFrame, column: str) -> VectorStats:
    """One distributed pass asserting the reference's build-time invariants.

    Errors (matching src/ivf/parquet.rs:241-279, src/ivf/mod.rs:51-70):
    - empty column name
    - column missing or not an array of floats
    - any NULL vector, NULL element, zero-length vector, or ragged dims

    Returns the row count and the (single) dimension.
    """
    if not column:
        raise VectorSchemaError("embedding column name must not be empty")
    if column not in df.columns:
        raise VectorSchemaError(f"column {column!r} not found in {df.columns}")
    t = df.schema[column].dataType
    if not (isinstance(t, ArrayType) and isinstance(t.elementType, (FloatType, DoubleType))):
        raise VectorSchemaError(
            f"column {column!r} has type {t.simpleString()}, expected array<float|double>"
        )

    c = F.col(column)
    agg = df.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(c.isNull(), 1).otherwise(0)).alias("null_rows"),
        F.sum(F.when(F.exists(c, lambda x: x.isNull()), 1).otherwise(0)).alias("null_elems"),
        F.min(F.size(c)).alias("min_dim"),
        F.max(F.size(c)).alias("max_dim"),
    ).collect()[0]

    if agg["rows"] == 0:
        raise VectorSchemaError("cannot build index over an empty table")
    if agg["null_rows"]:
        raise VectorSchemaError(f"{agg['null_rows']} NULL vectors in {column!r}")
    if agg["null_elems"]:
        raise VectorSchemaError(f"{agg['null_elems']} vectors contain NULL elements")
    if agg["min_dim"] == 0:
        raise VectorSchemaError("zero-length vector encountered")
    if agg["min_dim"] != agg["max_dim"]:
        raise VectorSchemaError(
            f"ragged vector dimensions: min {agg['min_dim']} != max {agg['max_dim']}"
        )
    return VectorStats(rows=agg["rows"], dim=agg["max_dim"])
