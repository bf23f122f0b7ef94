"""Salted-join skew utility tests: exact equivalence with the plain join
under a pathologically hot key, plus guard-rail errors."""

import pytest
from pyspark.sql import functions as F

from pq_vector_spark.operators.skew import SALT_COL, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 5000 rows of key=1 (hot), a tail of 50 other keys
    rows = [(1, float(i)) for i in range(5000)] + [
        (k, float(k)) for k in range(2, 52)
    ]
    big = spark.createDataFrame(rows, "k INT, v DOUBLE")
    small = spark.createDataFrame(
        [(k, f"dim-{k}") for k in range(0, 52)], "k INT, name STRING"
    )
    return big, small


def test_salted_inner_equals_plain(spark, skewed):
    big, small = skewed
    got = salted_join(big, small, "k", salts=8)
    want = big.join(small, on="k", how="inner")
    assert got.columns == want.columns
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_left_preserves_unmatched(spark, skewed):
    big, small = skewed
    # key 999 has no dim row — left join must keep it with NULL name
    big2 = big.union(spark.createDataFrame([(999, 0.0)], "k INT, v DOUBLE"))
    got = salted_join(big2, small, "k", salts=4, how="left")
    want = big2.join(small, on="k", how="left")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.filter(F.col("k") == 999).collect()[0]["name"] is None


def test_salt_spreads_hot_key(spark, skewed):
    """The hot key's rows must actually carry more than one salt value —
    the whole point of the transform."""
    big, _ = skewed
    salted = big.withColumn(
        SALT_COL, F.pmod(F.monotonically_increasing_id(), F.lit(8)).cast("int")
    )
    n_salts = (
        salted.filter(F.col("k") == 1).select(SALT_COL).distinct().count()
    )
    assert n_salts > 1


def test_guard_rails(spark, skewed):
    big, small = skewed
    with pytest.raises(ValueError, match="inner.*left"):
        salted_join(big, small, "k", how="full")
    with pytest.raises(ValueError, match="salts"):
        salted_join(big, small, "k", salts=0)
    with pytest.raises(ValueError, match="already present"):
        salted_join(big.withColumn(SALT_COL, F.lit(0)), small, "k")
