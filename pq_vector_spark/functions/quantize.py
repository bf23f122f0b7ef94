"""Scalar int8 quantization for embedding columns — the storage/IO scale
path beyond the reference's float32-only layout (extension; the reference
stores raw f32 vectors, src/ivf/parquet.rs): 4× smaller vectors mean 4×
fewer bytes scanned per candidate at 100 TB, at a small, *measured* recall
cost (bench section ``scale.sq8``).

Per-vector asymmetric min/max quantization (the self-contained variant of
FAISS's SQ8): each row stores (codes: array<tinyint>, mn: double,
scale: double) with ``code = floor((x - mn)/scale + 0.5) - 128``. No
training pass, no global state — every row quantizes independently
map-side, so ingest is a pure projection.

All arithmetic is double-precision with an explicit ``floor(+0.5)``
rounding (identical semantics in Spark and DuckDB — engine ``round()``
half-way modes differ), so the oracle reproduces codes and distances
bit-for-bit.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CODES_COL = "q_codes"
MIN_COL = "q_mn"
SCALE_COL = "q_scale"


def quantize_vectors(
    df: DataFrame,
    col: str,
    codes_col: str = CODES_COL,
    mn_col: str = MIN_COL,
    scale_col: str = SCALE_COL,
) -> DataFrame:
    """Add (codes, mn, scale) columns for an ``array<float/double>``
    embedding column. Pure map-side projection — no shuffle, no training,
    no driver state; rows quantize independently at any scale.

    Constant vectors (mx == mn) use scale 1.0: every code is -128 and
    dequantization returns exactly ``mn``.
    """
    e = F.transform(F.col(col), lambda x: x.cast("double"))
    mn = F.array_min(e)
    mx = F.array_max(e)
    scale = F.when(mx > mn, (mx - mn) / F.lit(255.0)).otherwise(F.lit(1.0))
    # bind (mn, scale) once via the array-let trick — a free subtree inside
    # an HOF lambda re-evaluates per element (array_min per element!)
    codes = F.transform(
        F.array(F.struct(mn.alias("mn"), scale.alias("sc"))),
        lambda m: F.transform(
            e,
            lambda x: (
                F.floor((x - m["mn"]) / m["sc"] + F.lit(0.5)) - F.lit(128)
            ).cast("tinyint"),
        ),
    )[0]
    return df.withColumns({codes_col: codes, mn_col: mn, scale_col: scale})


def dequantize(
    codes_col: str = CODES_COL,
    mn_col: str = MIN_COL,
    scale_col: str = SCALE_COL,
) -> Column:
    """Reconstruct the (lossy) double vector: mn + (code + 128) * scale."""
    return F.transform(
        F.col(codes_col),
        lambda c: F.col(mn_col)
        + (c.cast("double") + F.lit(128.0)) * F.col(scale_col),
    )


def quantized_distance(
    query: Sequence[float],
    codes_col: str = CODES_COL,
    mn_col: str = MIN_COL,
    scale_col: str = SCALE_COL,
) -> Column:
    """L2 distance between a float query and a quantized row.

    Narrow vectors dequantize inline inside one ``zip_with`` fold; wide
    vectors (> UNROLL_LIMIT dims, where Catalyst HOFs run interpreted)
    switch to an Arrow kernel with the SAME per-dimension left-to-right
    float64 accumulation as the fold — bit-identical results (the exact
    technique ``functions/distance.py`` uses for its wide kernels).

    The wide kernel reads the quantized columns as STORED data (the normal
    shape — quantization exists to be written once and scanned many
    times). Applying it in the same plan that derives the codes makes
    Spark collapse the quantize HOF expressions into the Python-UDF
    argument projection, whose interpreted evaluator cannot execute them
    (ExpressionProxy INTERNAL_ERROR) — persist the quantized table first,
    or stay at ≤ UNROLL_LIMIT dims where the pure-HOF fold handles both
    shapes."""
    from pq_vector_spark.functions.distance import UNROLL_LIMIT

    if len(query) > UNROLL_LIMIT:
        return _arrow_quantized_kernel(query)(
            F.col(codes_col), F.col(mn_col), F.col(scale_col)
        )
    qlit = F.array(*[F.lit(float(v)).cast("double") for v in query])
    # diffs first, then square inside the fold via the lambda variable —
    # the dequant subtree evaluates once per element
    diff = F.zip_with(
        F.col(codes_col),
        qlit,
        lambda c, qi: (
            F.col(mn_col) + (c.cast("double") + F.lit(128.0)) * F.col(scale_col)
        )
        - qi,
    )
    return F.sqrt(F.aggregate(diff, F.lit(0.0), lambda a, d: a + d * d))


def _arrow_quantized_kernel(query: Sequence[float]):
    """Pandas-UDF dequantized-distance kernel: per-dimension left-to-right
    float64 accumulation (vectorized across rows) ⇒ the identical addition
    sequence as the zip_with/aggregate fold and the DuckDB oracle."""
    from pyspark.sql.types import DoubleType

    qd = np.asarray([float(x) for x in query], dtype=np.float64)
    dim = qd.shape[0]

    @F.pandas_udf(DoubleType())
    def _k(codes: pd.Series, mn: pd.Series, sc: pd.Series) -> pd.Series:
        arrs = codes.to_numpy()
        lens = np.fromiter(
            (len(a) if a is not None else -1 for a in arrs), dtype=np.int64
        )
        ok = (lens == dim) & ~mn.isna().to_numpy() & ~sc.isna().to_numpy()
        out = np.full(len(arrs), np.nan)
        if ok.any():
            mat = np.stack(arrs[ok]).astype(np.float64)
            mnv = mn.to_numpy(dtype=np.float64, na_value=np.nan)[ok]
            scv = sc.to_numpy(dtype=np.float64, na_value=np.nan)[ok]
            acc = np.zeros(mat.shape[0])
            for j in range(dim):
                d = (mnv + (mat[:, j] + 128.0) * scv) - qd[j]
                acc += d * d
            out[ok] = np.sqrt(acc)
        res = pd.arrays.FloatingArray(out, mask=np.asarray(~ok))
        return pd.Series(res)

    return _k
