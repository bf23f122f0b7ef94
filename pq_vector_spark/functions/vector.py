"""Vector-column utilities beyond distance kernels: L2 normalization and
grouped centroid pooling (north-star extension — class prototypes /
nearest-class-mean analytics over an embedding corpus).

Scale design (100 TB):
- ``l2_normalize`` is a pure map-side expression (one bound-once fold for
  the norm; whole-stage codegen) — no shuffle, pushes through scans.
- ``group_centroids`` never materializes per-group vector lists (a
  ``collect_list`` of embeddings is the classic OOM at scale). It
  posexplodes to (group, dim, value) and runs TWO combiner-friendly hash
  aggregations: per-(group, dim) running sums are partially aggregated
  map-side, so the exchanges carry O(groups × dim), not O(rows × dim).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def l2_normalize(col) -> Column:
    """Unit-L2-normalized copy of an array<float/double> column (double
    elements). Zero vectors (norm 0) yield NULL elements rather than ±inf.
    The input array is bound once via a 1-element ``transform`` so the norm
    fold does not re-evaluate the source expression per element."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        F.array(c),
        lambda v: F.transform(
            v,
            lambda x: F.try_divide(
                x.cast("double"),
                F.sqrt(
                    F.aggregate(
                        v,
                        F.lit(0.0),
                        lambda acc, y: acc + y.cast("double") * y.cast("double"),
                    )
                ),
            ),
        ),
    )[0]


def group_centroids(
    df: DataFrame,
    group_col: str,
    vec_col: str,
    *,
    decimals: int = 4,
) -> DataFrame:
    """Per-group mean vector (the class prototype): (group, n_vectors,
    centroid array<double>).

    Means are rounded to ``decimals`` places — the repo's standard guard
    (cf. rel_agg) against summation-order ulp drift, since float addition
    is not associative across partitions.

    Plan: posexplode → groupBy(group, dim) avg → groupBy(group) ordered
    re-assembly. NULL vectors are dropped (consistent with the distance
    kernels' null contract); ragged arrays would surface as centroid
    positions with smaller counts — guarded by the same schema validation
    as the index build.
    """
    g = F.col(group_col)
    exploded = df.filter(F.col(vec_col).isNotNull()).select(
        g.alias("_g"), F.posexplode(F.col(vec_col)).alias("_i", "_x")
    )
    per_dim = exploded.groupBy("_g", "_i").agg(
        F.round(F.avg(F.col("_x").cast("double")), decimals).alias("_m"),
        F.count(F.lit(1)).cast("bigint").alias("_n"),
    )
    return (
        per_dim.groupBy("_g")
        .agg(
            F.max("_n").alias("n_vectors"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("_i", "_m"))),
                lambda s: s["_m"],
            ).alias("centroid"),
        )
        .select(F.col("_g").alias(group_col), "n_vectors", "centroid")
    )
