"""Deterministic sampling and dataset mixing — training-data pipeline
primitives (north-star extension; the reference's engine has no sampling
surface beyond its internal index-training sample, src/ivf/index.rs:63-88).

``df.sample()`` is unsuitable for corpus curation at 100 TB: its outcome
depends on partitioning and run order, so reruns and engine migrations
silently change the training set. These operators key every row's fate on
an md5-derived hash of a stable id instead:

- reproducible across runs, partitionings, AND engines (the DuckDB oracle
  computes the identical bucket from the same bytes);
- stable under growth — appending data never flips an existing row's fate;
- pure map-side filters (no shuffle, no state), pushed like any predicate;
- salt-parameterized, so independent draws (train/validation splits,
  epoch-level subsampling) use the same machinery with different salts.
"""

from __future__ import annotations

from functools import reduce
from typing import Mapping, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pq_vector_spark.functions.text import token_hash

# bucket space: fine enough that rate granularity is 1e-6, small enough
# that the 60-bit hash is uniform over it
BUCKETS = 1_000_000


def hash_bucket(col, salt: str = "") -> Column:
    """Stable bucket in [0, BUCKETS) from the md5 of the salted, stringified
    key (``functions.text.token_hash`` — portable: DuckDB reproduces it
    bit-for-bit, unlike engine-native hashes)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(
        token_hash(F.concat(F.lit(salt), c.cast("string"))), F.lit(BUCKETS)
    )


def hash_sample(df: DataFrame, key_col: str, rate: float, salt: str = "") -> DataFrame:
    """Deterministic ``rate``-sampling: keep rows whose hash bucket falls
    below ``rate * BUCKETS``. A row's membership depends only on
    (key, salt) — never on partitioning, ordering, or corpus size."""
    if not (0.0 <= rate <= 1.0):
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    threshold = int(round(rate * BUCKETS))
    return df.filter(hash_bucket(key_col, salt) < F.lit(threshold))


def train_split(
    df: DataFrame, key_col: str, holdout: float = 0.01, salt: str = "split"
) -> Tuple[DataFrame, DataFrame]:
    """(train, holdout) partition by hash bucket — disjoint and exhaustive,
    and a document NEVER migrates between splits as the corpus grows (the
    leakage guarantee a random split cannot give)."""
    if not (0.0 < holdout < 1.0):
        raise ValueError(f"holdout must be in (0, 1), got {holdout}")
    threshold = int(round(holdout * BUCKETS))
    b = hash_bucket(key_col, salt)
    return df.filter(b >= F.lit(threshold)), df.filter(b < F.lit(threshold))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, chosen deterministically:
    rank rows within each stratum by their hash bucket (ties broken by key)
    and keep the first k. The balanced-per-class draw ``hash_sample`` can't
    give — rate sampling yields binomial counts; this yields exact counts.

    Determinism contract: which rows win depends only on
    (stratum, key, salt) — never on partitioning or run order. Unlike
    ``hash_sample``, membership IS affected by corpus growth (a new row can
    out-rank an old one) — that is inherent to exact-k semantics; use
    ``hash_sample`` when append-stability matters more than exact counts.

    Scale shape: ONE shuffle keyed on the stratum. The rank-≤-k filter is
    Spark's WindowGroupLimit pattern — each map task pre-prunes to its
    local top-k per stratum before the exchange, so the shuffle carries
    O(n_partitions × strata × k), not the corpus. Strata counts are
    typically ≪ rows (languages, sources, quality buckets); a stratum with
    fewer than k rows yields all of them.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        hash_bucket(key_col, salt).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= F.lit(int(k)))
        .drop("_rk")
    )


def weighted_mix(
    parts: Mapping[str, Tuple[DataFrame, float]],
    key_col: str,
    salt: str = "",
    tag_col: str = "mix_source",
) -> DataFrame:
    """Weighted deterministic interleave of corpora — the training-mixture
    primitive ("100% wiki + 30% web + 5% code"): each part is
    hash-sampled at its weight and tagged with ``tag_col``.

    Scale shape: a union of map-side filters — no shuffle, no sampling
    state; each source's scan prunes independently and the union is purely
    logical (Spark unions partitions, it does not materialize them).
    Weights > 1 are rejected — upsampling (epoch repetition) belongs in
    the data loader, not the corpus definition.
    """
    if not parts:
        raise ValueError("parts must name at least one (DataFrame, weight)")
    outs = []
    for name in sorted(parts):
        df, weight = parts[name]
        outs.append(
            hash_sample(df, key_col, weight, salt=salt or name).withColumn(
                tag_col, F.lit(name)
            )
        )
    return reduce(lambda a, b: a.unionByName(b), outs)


def importance_sample(
    df: DataFrame, key_col: str, prob_col, salt: str = ""
) -> DataFrame:
    """Per-row deterministic acceptance sampling: keep a row iff its hash
    bucket falls below ``prob_col`` × BUCKETS — importance/curriculum
    sampling ("keep high-quality docs with probability ∝ quality") with
    the same reproducibility contract as ``hash_sample`` (fate =
    f(key, salt, that row's own probability); partitioning/order/engine
    never change the draw, and the DuckDB oracle replays it exactly).

    ``prob_col`` is a column (or name) of values in [0, 1]; values are
    clamped. Map-side filter, no shuffle — pushes like any predicate.
    """
    p = F.col(prob_col) if isinstance(prob_col, str) else prob_col
    clamped = F.least(F.greatest(p.cast("double"), F.lit(0.0)), F.lit(1.0))
    # explicit floor(+0.5): engine round() half-way modes differ (same
    # portability trade as SQ8's code rounding, functions/quantize.py)
    threshold = F.floor(clamped * F.lit(BUCKETS) + F.lit(0.5)).cast("bigint")
    return df.filter(hash_bucket(key_col, salt) < threshold)
