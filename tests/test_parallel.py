"""Spread-guard (parallel.py) tests: the partition probe memo and the
conditional round-robin spread."""

import os

from pyspark.sql import functions as F

from pq_vector_spark import parallel as P


def test_plan_partitions_memoizes_file_backed_plans(spark, tmp_path):
    """r16: for a file-backed plan the probe result is memoized by
    (app, input file set, split confs) — a second construction over the
    same files must hit the memo with the same answer, and the memoized
    value must equal the real plan partition count."""
    path = str(tmp_path / "probe_tbl")
    spark.range(0, 1000, 1, 1).withColumn(
        "txt", F.concat(F.lit("doc "), F.col("id"))
    ).write.mode("overwrite").parquet(path)

    df1 = spark.read.parquet(path).select("id", "txt")
    real = df1.rdd.getNumPartitions()
    P._PROBE_MEMO.clear()
    n1 = P._plan_partitions(df1)
    assert n1 == real
    assert len(P._PROBE_MEMO) == 1

    # fresh plan, same files: memo hit (no new entry), same answer
    df2 = spark.read.parquet(path).filter(F.col("id") >= 0).select("id")
    n2 = P._plan_partitions(df2)
    assert n2 == n1
    assert len(P._PROBE_MEMO) == 1


def test_plan_partitions_no_memo_for_local_plans(spark):
    """A non-file plan (local relation) probes every time and never
    lands in the memo — its partition count is not a function of any
    file set."""
    P._PROBE_MEMO.clear()
    df = spark.createDataFrame([(i,) for i in range(10)], "id int")
    n = P._plan_partitions(df)
    assert n == df.rdd.getNumPartitions()
    assert len(P._PROBE_MEMO) == 0


def test_spread_fires_and_noops(spark, tmp_path):
    """ensure_compute_parallelism spreads a 1-partition file scan to
    defaultParallelism and leaves an already-wide plan unchanged (same
    object), with the env knob disabling it entirely."""
    path = str(tmp_path / "spread_tbl")
    spark.range(0, 100, 1, 1).write.mode("overwrite").parquet(path)
    narrow = spark.read.parquet(path).select("id")
    target = spark.sparkContext.defaultParallelism

    spread = P.ensure_compute_parallelism(narrow)
    assert spread.rdd.getNumPartitions() == target
    # values unchanged (spread is a pure repartition)
    assert sorted(r["id"] for r in spread.collect()) == list(range(100))

    wide = spark.range(0, 100, 1, target + 1)
    assert P.ensure_compute_parallelism(wide) is wide

    os.environ[P._ENV_KNOB] = "0"
    try:
        assert P.ensure_compute_parallelism(narrow) is narrow
    finally:
        os.environ.pop(P._ENV_KNOB, None)
