"""Cohort retention analysis — the classic product-analytics rollup
(cohort period × offset → distinct active users), delegated-relational
surface the reference's SQL users run daily (the reference itself
delegates all relational work to DataFusion; SURVEY.md §2.B).

Semantics: a user's cohort is the period (week) of their first event;
for every (cohort, offset) cell, count the distinct users from that
cohort active ``offset`` periods later. Periods are ``date_trunc`` weeks
(Monday-start in both Spark and the DuckDB oracle); offsets are exact
integer day-diffs / 7.

Scale design (100 TB of events):
- ONE user-keyed aggregation finds first-seen periods (map-side combine).
- Activity is reduced to distinct (user, period) BEFORE the join — the
  join input is bounded by users × active-periods, not raw events.
- The join is user-keyed on both sides (co-partitioned shuffle, no
  broadcast needed at any size), and the final (cohort, offset) rollup is
  a plain count over the already-distinct pairs — no count-distinct
  state. Three exchanges total, each combiner-friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_week DATE, week_offset BIGINT, n_users BIGINT) — distinct
    users of each weekly cohort active at each later week."""
    week = F.date_trunc("week", F.col(ts_col)).cast("date")
    activity = events.select(F.col(user_col).alias("_u"), week.alias("_w")).distinct()
    first = activity.groupBy("_u").agg(F.min("_w").alias("_cohort"))
    joined = activity.join(first, "_u")
    return (
        joined.select(
            F.col("_cohort").alias("cohort_week"),
            (F.datediff(F.col("_w"), F.col("_cohort")) / 7)
            .cast("bigint")
            .alias("week_offset"),
            "_u",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order transition matrix over per-user event sequences:
    (from_type, to_type, n, prob) where prob is row-normalized over
    ``from_type`` — the Markov view of user journeys (what follows what),
    the complement of the funnel's fixed-pattern matching.

    Deterministic ordering: (ts, id) so timestamp ties cannot flip pairs
    between engines. Scale shape: ONE user-keyed window (lag — O(1)
    state), then a (from, to) count with map-side combine; the
    row-normalizing totals are a types-row aggregate broadcast back.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    pairs = (
        events.withColumn("_prev", F.lag(type_col).over(w))
        .filter(F.col("_prev").isNotNull())
        .groupBy(F.col("_prev").alias("from_type"), F.col(type_col).alias("to_type"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").cast("bigint").alias("_t"))
    return (
        pairs.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(F.col("n").cast("double") / F.col("_t").cast("double"), 6).alias(
                "prob"
            ),
        )
    )
