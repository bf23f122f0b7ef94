import pytest

from pq_vector_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pq_vector_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def golden_vectors(spark):
    """The reference's 6-row dim-2 golden table
    (reference: src/df_vector/tests.rs:22-44)."""
    rows = [
        (0, [0.0, 0.0]),
        (1, [1.0, 0.0]),
        (2, [0.0, 2.0]),
        (3, [5.0, 5.0]),
        (4, [2.0, 2.0]),
        (5, [0.1, 0.1]),
    ]
    return spark.createDataFrame(rows, "id INT, vec ARRAY<FLOAT>")
