"""Ordered multi-step funnel analysis over an event stream — "how many
users did A, then B, then C" (north-star extension; the product-analytics
primitive next to sessionization, which streaming/events.py already has).

Semantics: a user completes step *i* when an event of the step's type
occurs STRICTLY AFTER their step *i−1* match (greedy earliest-match, the
standard funnel definition — for unconstrained funnels greedy-first is
provably maximal). Optional ``within``: the whole funnel must complete
within a horizon measured from the step-1 match (note: with a horizon the
greedy anchor is a heuristic — the industry-standard one — not a provably
maximal matcher; the unconstrained form is exact).

Scale shape: ONE shuffle (groupBy user), then a per-user
``array_sort`` + ``aggregate`` fold over that user's events — all native
Catalyst HOF expressions, no Python workers, no per-step re-shuffle (an
n-step funnel via iterative min-ts joins costs n shuffles; this costs 1).
Per-user state is one (idx, t0, last) struct; per-user event lists must
fit an executor's row budget — the same bounded-entity-activity assumption
sessionization makes.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: Sequence[str],
    *,
    within: Optional[float] = None,
) -> DataFrame:
    """Per-user funnel progress: (user, steps_completed) where
    ``steps_completed`` ∈ [0, len(steps)]. Users with no step-1 event
    report 0."""
    if not steps:
        raise ValueError("steps must be non-empty")
    n = len(steps)
    step_arr = F.array(*[F.lit(s) for s in steps])
    within_us = None if within is None else int(round(within * 1_000_000))

    evs = events.select(
        F.col(user_col).alias("_u"),
        F.struct(
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),
            F.col(type_col).cast("string").alias("y"),
        ).alias("_e"),
    )
    per_user = evs.groupBy("_u").agg(
        F.array_sort(F.collect_list("_e")).alias("_evs")
    )

    init = F.struct(
        F.lit(0).alias("idx"),
        F.lit(0).cast("bigint").alias("t0"),
        F.lit(None).cast("bigint").alias("last"),
    )

    def _fold(acc, e):
        eligible = (
            (acc["idx"] < F.lit(n))
            & (e["y"] == F.element_at(step_arr, acc["idx"] + 1))
            & (acc["last"].isNull() | (e["t"] > acc["last"]))
        )
        if within_us is not None:
            eligible = eligible & (
                (acc["idx"] == 0) | (e["t"] - acc["t0"] <= F.lit(within_us))
            )
        return F.when(
            eligible,
            F.struct(
                (acc["idx"] + 1).alias("idx"),
                F.when(acc["idx"] == 0, e["t"]).otherwise(acc["t0"]).alias("t0"),
                e["t"].alias("last"),
            ),
        ).otherwise(acc)

    done = per_user.select(
        F.col("_u").alias(user_col),
        F.aggregate("_evs", init, _fold)["idx"].cast("int").alias("steps_completed"),
    )
    return done


def funnel_counts(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: Sequence[str],
    *,
    within: Optional[float] = None,
) -> DataFrame:
    """Funnel summary: one row per step with the number of users who
    reached at least that step — (step, step_type, n_users), step 1-based.
    The per-step rollup is a conditional aggregation over the per-user
    result (tiny: one row per user in, len(steps) rows out)."""
    per_user = funnel_steps(
        events, user_col, type_col, ts_col, steps, within=within
    )
    aggs = [
        F.sum(
            F.when(F.col("steps_completed") >= i + 1, 1).otherwise(0)
        ).cast("bigint").alias(f"_s{i}")
        for i in range(len(steps))
    ]
    wide = per_user.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step"),
                F.lit(s).alias("step_type"),
                F.col(f"_s{i}").alias("n_users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return (
        wide.select(F.explode(pairs).alias("r"))
        .select("r.step", "r.step_type", "r.n_users")
        .orderBy("step")
    )
