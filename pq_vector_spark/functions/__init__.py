from pq_vector_spark.functions.distance import (
    array_distance,
    squared_l2,
    cosine_similarity,
    dot_product,
    register_sql_functions,
)

__all__ = [
    "array_distance",
    "squared_l2",
    "cosine_similarity",
    "dot_product",
    "register_sql_functions",
]
