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


def test_wide_kernel_bit_identical_to_hof_fold(spark, tmp_path):
    """Above UNROLL_LIMIT the Arrow kernel takes over; its per-dimension
    left-to-right accumulation must reproduce the HOF fold EXACTLY
    (repr-level equality of every double). Runs over a STORED quantized
    table — the kernel's documented contract (quantize → write → scan)."""
    from pq_vector_spark.functions.distance import UNROLL_LIMIT

    dim = UNROLL_LIMIT + 32
    rng = np.random.default_rng(31)
    rows = [
        (int(i), [float(x) for x in rng.normal(size=dim).astype(np.float32)])
        for i in range(50)
    ]
    out = str(tmp_path / "sq8")
    quantize_vectors(
        spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<FLOAT>"),
        "embedding",
    ).write.mode("overwrite").parquet(out)
    df = spark.read.parquet(out)
    q = rows[0][1]
    wide = {
        r["vec_id"]: r["d"]
        for r in df.select("vec_id", quantized_distance(q).alias("d")).collect()
    }
    # force the HOF path for the same data by calling the fold directly
    qlit = F.array(*[F.lit(float(v)).cast("double") for v in q])
    diff = F.zip_with(
        F.col("q_codes"), qlit,
        lambda c, qi: (F.col("q_mn") + (c.cast("double") + F.lit(128.0)) * F.col("q_scale")) - qi,
    )
    hof = {
        r["vec_id"]: r["d"]
        for r in df.select(
            "vec_id",
            F.sqrt(F.aggregate(diff, F.lit(0.0), lambda a, d: a + d * d)).alias("d"),
        ).collect()
    }
    assert {k: repr(v) for k, v in wide.items()} == {k: repr(v) for k, v in hof.items()}


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
