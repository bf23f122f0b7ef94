"""Ordered-funnel tests — greedy-match semantics, horizons, rollup."""

import datetime as dt

import pytest

from pq_vector_spark.operators.funnel import funnel_counts, funnel_steps

B = dt.datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, B + dt.timedelta(seconds=s)) for u, t, s in rows],
        "user_id: bigint, event_type: string, ts: timestamp",
    )


STEPS = ["view", "click", "purchase"]


def _steps(spark, rows, **kw):
    df = funnel_steps(_ev(spark, rows), "user_id", "event_type", "ts", STEPS, **kw)
    return {r["user_id"]: r["steps_completed"] for r in df.collect()}


def test_basic_progression(spark):
    rows = [
        (1, "view", 0), (1, "click", 10), (1, "purchase", 20),   # full funnel
        (2, "view", 0), (2, "click", 5),                          # stops at 2
        (3, "view", 0),                                           # stops at 1
        (4, "click", 0), (4, "purchase", 5),                      # never started
    ]
    got = _steps(spark, rows)
    assert got == {1: 3, 2: 2, 3: 1, 4: 0}


def test_order_is_strict(spark):
    # click BEFORE the first view does not count
    rows = [(1, "click", 0), (1, "view", 10), (1, "click", 10)]
    # same-timestamp click does NOT count (strictly after)
    assert _steps(spark, rows) == {1: 1}
    rows2 = [(1, "click", 0), (1, "view", 10), (1, "click", 11)]
    assert _steps(spark, rows2) == {1: 2}


def test_greedy_anchor_is_first_match(spark):
    # greedy anchors at the FIRST view (t=0); the click at t=5 follows it
    rows = [(1, "view", 0), (1, "click", 5), (1, "view", 100)]
    assert _steps(spark, rows) == {1: 2}


def test_within_horizon(spark):
    rows = [(1, "view", 0), (1, "click", 30), (1, "purchase", 120)]
    assert _steps(spark, rows) == {1: 3}
    # horizon 60 s from the view: purchase at t=120 is outside
    assert _steps(spark, rows, within=60.0) == {1: 2}


def test_counts_rollup(spark):
    rows = [
        (1, "view", 0), (1, "click", 1), (1, "purchase", 2),
        (2, "view", 0), (2, "click", 1),
        (3, "view", 0),
        (4, "error", 0),
    ]
    out = funnel_counts(
        _ev(spark, rows), "user_id", "event_type", "ts", STEPS
    ).collect()
    assert [(r["step"], r["step_type"], r["n_users"]) for r in out] == [
        (1, "view", 3),
        (2, "click", 2),
        (3, "purchase", 1),
    ]


def test_empty_steps_raise(spark):
    with pytest.raises(ValueError, match="non-empty"):
        funnel_steps(_ev(spark, []), "user_id", "event_type", "ts", [])
