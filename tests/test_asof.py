"""As-of join tests: golden point-in-time semantics, equal-ts inclusivity,
no-future-leakage, per-key isolation, guard rails."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pq_vector_spark.operators.asof import asof_join

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def tables(spark):
    left = spark.createDataFrame(
        [
            (1, 1, _ts(5)),    # after snap@0 → 10.0
            (2, 1, _ts(10)),   # exactly at snap@10 → 20.0 (inclusive)
            (3, 1, _ts(30)),   # after snap@10 → 20.0
            (4, 2, _ts(7)),    # user 2 has later-only snaps → NULL
            (5, 3, _ts(1)),    # user 3 has no snaps at all → NULL
        ],
        "event_id INT, user_id INT, ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(0), 10.0),
            (1, _ts(10), 20.0),
            (1, _ts(60), 99.0),  # future snap must never leak backward
            (2, _ts(50), 7.0),
        ],
        "user_id INT, ts TIMESTAMP, snap DOUBLE",
    )
    return left, right


def test_asof_backward_inclusive_golden(spark, tables):
    left, right = tables
    out = {
        r["event_id"]: r["snap"]
        for r in asof_join(
            left, right, on="ts", by="user_id", value_cols=["snap"]
        ).collect()
    }
    assert out == {1: 10.0, 2: 20.0, 3: 20.0, 4: None, 5: None}


def test_asof_keeps_all_left_rows_and_columns(spark, tables):
    left, right = tables
    out = asof_join(left, right, on="ts", by="user_id", value_cols=["snap"])
    assert out.count() == left.count()
    assert out.columns == left.columns + ["snap"]


def test_asof_guard_rails(spark, tables):
    left, right = tables
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            left.withColumn("snap", F.lit(0.0)), right,
            on="ts", by="user_id", value_cols=["snap"],
        )
    with pytest.raises(ValueError, match="missing"):
        asof_join(left, right, on="ts", by="user_id", value_cols=["nope"])
    with pytest.raises(ValueError, match="at least one"):
        asof_join(left, right, on="ts", by="user_id", value_cols=[])


def test_asof_coherent_multi_column_snapshot(spark):
    """With several value_cols, every left row must receive ALL values from
    the SAME most-recent right row — a NULL field in the newest right row
    shadows older non-null values (row-coherent snapshot, the DuckDB/pandas
    asof semantics), never a column mix of two different right rows."""
    left = spark.createDataFrame(
        [(1, 1, _ts(30))], "event_id INT, user_id INT, ts TIMESTAMP"
    )
    right = spark.createDataFrame(
        [(1, _ts(0), 10.0, "a"), (1, _ts(10), None, "b")],
        "user_id INT, ts TIMESTAMP, price DOUBLE, tag STRING",
    )
    row = asof_join(
        left, right, on="ts", by="user_id", value_cols=["price", "tag"]
    ).collect()[0]
    assert (row["price"], row["tag"]) == (None, "b")


def test_asof_bucketed_equals_unbucketed_and_splits_hot_key(spark):
    """One key holding ~90% of rows: the bucketed form must return identical
    results while windowing per (key, bucket) — the hot key spreads across
    as many partitions as it spans buckets instead of serializing."""
    import numpy as np

    rng = np.random.default_rng(7)
    lrows, rrows, seen = [], [], set()
    for i in range(400):
        user = 1 if i % 10 else 2  # user 1 ≈ 90% of left rows
        lrows.append((int(i), user, _ts(int(rng.integers(0, 600)))))
    while len(rrows) < 80:
        u, m = (1 if rng.random() < 0.9 else 2), int(rng.integers(0, 600))
        if (u, m) not in seen:
            seen.add((u, m))
            rrows.append((u, _ts(m), float(round(rng.random() * 100, 2))))
    left = spark.createDataFrame(lrows, "event_id INT, user_id INT, ts TIMESTAMP")
    right = spark.createDataFrame(rrows, "user_id INT, ts TIMESTAMP, snap DOUBLE")

    plain = asof_join(left, right, on="ts", by="user_id", value_cols=["snap"])
    bucketed = asof_join(
        left, right, on="ts", by="user_id", value_cols=["snap"], bucket="1 hour"
    )
    key = lambda rows: sorted((r["event_id"], r["snap"]) for r in rows)
    assert key(bucketed.collect()) == key(plain.collect())

    # the expensive per-event window must partition by (key, bucket): the
    # hot key's 10-hour timeline then runs as >1 task, not one
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    assert "_pq_asof_bucket" in plan
    n_parts = (
        bucketed.withColumn("_b", F.window(F.col("ts"), "1 hour")["start"])
        .filter(F.col("user_id") == 1)
        .select("_b").distinct().count()
    )
    assert n_parts > 1


def test_asof_bucketed_carry_crosses_empty_buckets(spark):
    """A left row whose bucket (and several preceding buckets) contain no
    right rows must still see the last right row from far earlier."""
    left = spark.createDataFrame(
        [(1, 1, _ts(10)), (2, 1, _ts(60 * 9 + 5))],
        "event_id INT, user_id INT, ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [(1, _ts(0), 10.0), (1, _ts(5), 42.0)],
        "user_id INT, ts TIMESTAMP, snap DOUBLE",
    )
    out = {
        r["event_id"]: r["snap"]
        for r in asof_join(
            left, right, on="ts", by="user_id", value_cols=["snap"], bucket="1 hour"
        ).collect()
    }
    assert out == {1: 42.0, 2: 42.0}


def test_asof_matches_duckdb_asof_join(spark, tables):
    """Engine-level parity on a randomized fixture: our union-window carry
    must equal DuckDB's native ASOF LEFT JOIN row-for-row."""
    import duckdb
    import numpy as np

    rng = np.random.default_rng(5)
    lrows = [
        (int(i), int(rng.integers(0, 5)), _ts(int(rng.integers(0, 120))))
        for i in range(200)
    ]
    # unique (user, ts) on the right side (the documented requirement)
    seen, rrows = set(), []
    while len(rrows) < 60:
        u, m = int(rng.integers(0, 5)), int(rng.integers(0, 120))
        if (u, m) not in seen:
            seen.add((u, m))
            rrows.append((u, _ts(m), float(round(rng.random() * 100, 2))))
    left = spark.createDataFrame(lrows, "event_id INT, user_id INT, ts TIMESTAMP")
    right = spark.createDataFrame(rrows, "user_id INT, ts TIMESTAMP, snap DOUBLE")
    got = {
        r["event_id"]: r["snap"]
        for r in asof_join(
            left, right, on="ts", by="user_id", value_cols=["snap"]
        ).collect()
    }
    con = duckdb.connect()
    con.register("l", left.toPandas())
    con.register("r", right.toPandas())
    want = {
        int(eid): snap
        for eid, snap in con.execute(
            "SELECT l.event_id, r.snap FROM l ASOF LEFT JOIN r "
            "ON l.user_id = r.user_id AND l.ts >= r.ts"
        ).fetchall()
    }
    assert got == want
