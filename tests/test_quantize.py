"""Scalar int8 quantization tests (functions/quantize.py): code range,
reconstruction error bound, constant vectors, distance parity, top-k
recall sanity."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pq_vector_spark.functions.distance import array_distance
from pq_vector_spark.functions.quantize import (
    dequantize,
    quantize_vectors,
    quantized_distance,
)


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(21)
    rows = [
        (int(i), [float(x) for x in rng.normal(size=16).astype(np.float32)])
        for i in range(300)
    ]
    return spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<FLOAT>")


def test_codes_in_tinyint_range_and_bounded_error(spark, vecs):
    qz = quantize_vectors(vecs, "embedding")
    rows = qz.select("embedding", "q_codes", "q_mn", "q_scale",
                     dequantize().alias("deq")).collect()
    for r in rows:
        assert all(-128 <= c <= 127 for c in r["q_codes"])
        # max reconstruction error is half a quantization step
        for orig, deq in zip(r["embedding"], r["deq"]):
            assert abs(float(orig) - deq) <= r["q_scale"] / 2 + 1e-9


def test_constant_vector_roundtrips_exactly(spark):
    df = spark.createDataFrame([(1, [2.5, 2.5, 2.5])], "vec_id INT, embedding ARRAY<FLOAT>")
    row = quantize_vectors(df, "embedding").select(
        "q_codes", dequantize().alias("deq")
    ).collect()[0]
    assert row["q_codes"] == [-128, -128, -128]
    assert row["deq"] == [2.5, 2.5, 2.5]


def test_quantized_distance_close_to_exact_and_recall(spark, vecs):
    q = vecs.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    qz = quantize_vectors(vecs, "embedding")
    both = qz.select(
        "vec_id",
        array_distance(F.col("embedding"), [float(x) for x in q]).alias("d"),
        quantized_distance([float(x) for x in q]).alias("qd"),
    ).collect()
    for r in both:
        assert abs(r["d"] - r["qd"]) < 0.05 * 16 ** 0.5 + 0.02
    k = 20
    exact = [r["vec_id"] for r in sorted(both, key=lambda r: (r["d"], r["vec_id"]))][:k]
    approx = [r["vec_id"] for r in sorted(both, key=lambda r: (r["qd"], r["vec_id"]))][:k]
    assert len(set(exact) & set(approx)) / k >= 0.8  # SQ8 keeps neighborhoods
