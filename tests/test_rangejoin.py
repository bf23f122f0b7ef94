"""Banded range-join tests — equivalence with the naive range predicate."""

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from pq_vector_spark.operators.rangejoin import range_join


def _mk(spark, rows, ts_name):
    return spark.createDataFrame(
        rows, f"k: bigint, {ts_name}: timestamp, id: bigint"
    )


def _rand_rows(n, seed, keys=3):
    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    return [
        (
            rng.randrange(keys),
            base + dt.timedelta(seconds=rng.uniform(0, 3600)),
            i,
        )
        for i in range(n)
    ]


def test_matches_naive_inner(spark):
    left = _mk(spark, _rand_rows(80, 1), "lts").withColumnRenamed("id", "lid")
    right = _mk(spark, _rand_rows(120, 2), "rts").withColumnRenamed("id", "rid")
    lower, upper = -300.0, 120.0
    got = {
        (r["lid"], r["rid"])
        for r in range_join(left, right, "k", "lts", "rts", lower, upper).collect()
    }
    naive = {
        (r["lid"], r["rid"])
        for r in left.join(right, "k")
        .filter(
            (F.unix_micros("rts") >= F.unix_micros("lts") - 300_000_000)
            & (F.unix_micros("rts") < F.unix_micros("lts") + 120_000_000)
        )
        .collect()
    }
    assert got == naive and len(got) > 0


def test_left_how_keeps_unmatched(spark):
    base = dt.datetime(2024, 1, 1)
    left = _mk(
        spark,
        [(1, base, 10), (2, base + dt.timedelta(hours=5), 11)],
        "lts",
    ).withColumnRenamed("id", "lid")
    right = _mk(
        spark, [(1, base + dt.timedelta(seconds=30), 20)], "rts"
    ).withColumnRenamed("id", "rid")
    out = range_join(left, right, "k", "lts", "rts", 0.0, 60.0, how="left").collect()
    by_lid = {}
    for r in out:
        by_lid.setdefault(r["lid"], []).append(r["rid"])
    assert by_lid[10] == [20]
    assert by_lid[11] == [None]


def test_half_open_bounds(spark):
    base = dt.datetime(2024, 1, 1)
    left = _mk(spark, [(1, base, 0)], "lts").withColumnRenamed("id", "lid")
    right = _mk(
        spark,
        [
            (1, base, 20),  # rt == lt+lower → included
            (1, base + dt.timedelta(seconds=60), 21),  # rt == lt+upper → excluded
        ],
        "rts",
    ).withColumnRenamed("id", "rid")
    got = {r["rid"] for r in range_join(left, right, "k", "lts", "rts", 0.0, 60.0).collect()}
    assert got == {20}


def test_validations(spark):
    df = _mk(spark, [], "ts")
    with pytest.raises(ValueError, match="inner|left"):
        range_join(df, df.withColumnRenamed("ts", "ts2").withColumnRenamed("id", "id2"),
                   "k", "ts", "ts2", 0, 1, how="outer")
    with pytest.raises(ValueError, match="upper"):
        range_join(df, df.withColumnRenamed("ts", "ts2").withColumnRenamed("id", "id2"),
                   "k", "ts", "ts2", 5, 5)
    with pytest.raises(ValueError, match="overlapping"):
        range_join(df, df, "k", "ts", "ts", 0, 1)


def test_hot_key_spreads_buckets(spark):
    # one key, rows spread over many hours: banding must produce multiple
    # distinct join buckets (the anti-serialization property)
    rows = _rand_rows(200, 9, keys=1)
    left = _mk(spark, rows, "lts").withColumnRenamed("id", "lid")
    from pq_vector_spark.operators.rangejoin import _BUCKET

    l_exploded = left.withColumn("_lt", F.unix_micros("lts")).withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor((F.col("_lt") + F.lit(0)) / F.lit(60_000_000)),
                F.floor((F.col("_lt") + F.lit(60_000_000) - 1) / F.lit(60_000_000)),
            )
        ),
    )
    n_buckets = l_exploded.select(_BUCKET).distinct().count()
    assert n_buckets > 10


def test_left_null_payload_matched_row_emitted_once(spark):
    """r7 regression: a MATCHED left row carrying a NULL non-key value must
    appear exactly once. The null-padding branch derives unmatched rows via
    an anti-join on the matched left rows; a plain column-list anti-join
    treats NULL <> NULL, fails the match, and emits the row AGAIN with NULL
    right columns — the eqNullSafe anti-join prevents the duplicate."""
    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [
            (1, base, 10, None),          # matched, NULL payload — the hazard
            (1, base, 11, 5.0),           # matched, non-NULL payload
            (2, base + dt.timedelta(hours=9), 12, None),  # unmatched, NULL
        ],
        "k: bigint, lts: timestamp, lid: bigint, payload: double",
    )
    right = spark.createDataFrame(
        [(1, base + dt.timedelta(seconds=30), 20)],
        "k: bigint, rts: timestamp, rid: bigint",
    )
    out = range_join(left, right, "k", "lts", "rts", 0.0, 60.0, how="left").collect()
    by_lid = {}
    for r in out:
        by_lid.setdefault(r["lid"], []).append(r["rid"])
    assert by_lid == {10: [20], 11: [20], 12: [None]}
    assert len(out) == 3  # no duplicate for the NULL-payload matched row


def test_left_join_map_column_null_values_stay_distinct(spark):
    """ADVICE r8: the left-branch content id serializes null fields —
    a map column with a NULL value must not collide with one lacking the
    key (to_json's default ignoreNullFields would merge them and suppress
    an unmatched row from the null-padded branch)."""
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [("k", "2024-01-01 00:00:10"), ("k", "2024-01-01 00:00:10")],
        ["key", "lts"],
    ).withColumn(
        "props",
        F.when(
            F.col("lts") == "x", F.create_map(F.lit("a"), F.lit("v"))
        ).otherwise(F.lit(None).cast("map<string,string>")),
    )
    # two content-identical rows, both unmatched: multiplicity preserved
    right = spark.createDataFrame(
        [("k", "2024-01-01 09:00:00", 1)], ["key", "rts", "rv"]
    )
    out = range_join(left, right, "key", "lts", "rts", 0.0, 5.0, how="left")
    rows = out.collect()
    assert len(rows) == 2 and all(r["rv"] is None for r in rows)
    # distinct rows differing ONLY by map-null vs absent-key must keep
    # distinct ids: one matches, the other must still surface null-padded
    left2 = spark.createDataFrame(
        [
            ("k", "2024-01-01 00:00:10", {"a": None}),
            ("k", "2024-01-01 00:00:10", {}),
        ],
        "key string, lts string, props map<string,string>",
    )
    right2 = spark.createDataFrame(
        [("k", "2024-01-01 00:00:12", 7)], ["key", "rts", "rv"]
    )
    out2 = range_join(left2, right2, "key", "lts", "rts", 0.0, 5.0, how="left")
    got = sorted(
        [(dict(r["props"] or {}), r["rv"]) for r in out2.collect()], key=str
    )
    # BOTH left rows match the window ⇒ both appear with rv=7, none padded
    assert [g[1] for g in got] == [7, 7]
