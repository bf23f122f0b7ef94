"""Score calibration across heterogeneous sources — per-group quantile
(rank) normalization (north-star extension: a corpus mixes sources whose
raw quality/length/perplexity scores live on different scales; a global
threshold then silently over-prunes one source. Rank-normalizing within
each source makes one threshold mean the same thing everywhere).

Semantics: within each group, a score maps to its ``percent_rank`` —
(rank − 1) / (n − 1) in [0, 1], ties sharing a rank (ANSI semantics,
identical in Spark and the DuckDB oracle; integer/integer division, so
bit-exact across engines). A single-row group maps to 0.0.

Scale design (100 TB): ONE shuffle keyed on the group; the window is a
running rank (no buffering). Groups are sources/shards — thousands of
independent partitions. For a single giant group, pre-shard the same way
``packing`` documents (hash-bucket sub-groups, normalize within, the
approximation error is 1/buckets of a quantile).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantile_normalize(
    df: DataFrame,
    score_col: str,
    *,
    group_col: Optional[str] = None,
    out_col: str = "score_qn",
    decimals: int = 6,
) -> DataFrame:
    """Append ``out_col`` = the score's percent rank within its group
    (globally when ``group_col`` is None — single-partition window;
    prefer a group column at scale)."""
    parts = [F.col(group_col)] if group_col else []
    w = Window.partitionBy(*parts).orderBy(F.col(score_col).asc())
    return df.withColumn(out_col, F.round(F.percent_rank().over(w), decimals))
