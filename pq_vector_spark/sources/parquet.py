"""Table loading helpers over the driver-provided parquet test tables.

≙ reference scan surface: one Parquet file or a multi-file scan group
(reference: src/df_vector/access.rs:30-44, src/df_vector/exec.rs:157-205 —
multi-file candidate handling). Spark reads directories/globs natively, so
multi-file is the default here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table; accepts both ``<dir>/<name>.parquet`` files and
    ``<dir>/<name>`` directories (our indexed layouts)."""
    file_path = os.path.join(sf_dir, f"{name}.parquet")
    dir_path = os.path.join(sf_dir, name)
    return spark.read.parquet(file_path if os.path.exists(file_path) else dir_path)


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Temp views for every test table → full Spark SQL surface over them."""
    for t in TABLES:
        try:
            load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        except Exception:
            pass  # table absent at this scale factor
