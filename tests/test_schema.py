"""Schema inference/validation tests (reference: benches/query.rs:364-384,
src/ivf/parquet.rs:241-279, src/ivf/mod.rs:17-70)."""

import pytest

from pq_vector_spark.schema import (
    VectorSchemaError,
    infer_vector_column,
    validate_vector_column,
)


def test_infer_first_float_array(spark):
    df = spark.createDataFrame(
        [(1, "x", [1.0, 2.0], [3.0])],
        "id INT, name STRING, emb ARRAY<FLOAT>, other ARRAY<DOUBLE>",
    )
    assert infer_vector_column(df) == "emb"


def test_infer_no_vector_column(spark):
    df = spark.createDataFrame([(1, "x")], "id INT, name STRING")
    with pytest.raises(VectorSchemaError):
        infer_vector_column(df)


def test_validate_happy_path(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0]), (2, [3.0, 4.0])], "id INT, v ARRAY<FLOAT>")
    stats = validate_vector_column(df, "v")
    assert stats.rows == 2
    assert stats.dim == 2


def test_validate_empty_name(spark):
    df = spark.createDataFrame([(1, [1.0])], "id INT, v ARRAY<FLOAT>")
    with pytest.raises(VectorSchemaError):
        validate_vector_column(df, "")


def test_validate_missing_column(spark):
    df = spark.createDataFrame([(1, [1.0])], "id INT, v ARRAY<FLOAT>")
    with pytest.raises(VectorSchemaError):
        validate_vector_column(df, "w")


def test_validate_wrong_type(spark):
    df = spark.createDataFrame([(1, "s")], "id INT, v STRING")
    with pytest.raises(VectorSchemaError):
        validate_vector_column(df, "v")


def test_validate_null_element(spark):
    df = spark.createDataFrame([(1, [1.0, None])], "id INT, v ARRAY<FLOAT>")
    with pytest.raises(VectorSchemaError):
        validate_vector_column(df, "v")


def test_validate_zero_length(spark):
    df = spark.createDataFrame([(1, [])], "id INT, v ARRAY<FLOAT>")
    with pytest.raises(VectorSchemaError):
        validate_vector_column(df, "v")


def test_validate_empty_table(spark):
    df = spark.createDataFrame([], "id INT, v ARRAY<FLOAT>")
    with pytest.raises(VectorSchemaError):
        validate_vector_column(df, "v")
