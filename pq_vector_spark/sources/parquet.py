"""Table loading helpers over the driver-provided parquet test tables.

≙ reference scan surface: one Parquet file or a multi-file scan group
(reference: src/df_vector/access.rs:30-44, src/df_vector/exec.rs:157-205 —
multi-file candidate handling). Spark reads directories/globs natively, so
multi-file is the default here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


def _has_nanos_timestamp(path: str) -> bool:
    """Inspect the parquet footer (pyarrow, driver-side, no Spark job) for
    nanosecond-precision timestamp columns — illegal for Spark's vectorized
    reader unless ``nanosAsLong`` is set. Non-local / unreadable paths just
    report False (Spark will then surface its own error if any)."""
    try:
        import pyarrow.parquet as pq
        import pyarrow.types as pt

        if os.path.isdir(path):
            parts = sorted(
                f for f in os.listdir(path) if f.endswith(".parquet")
            )
            if not parts:
                return False
            path = os.path.join(path, parts[0])
        schema = pq.read_schema(path)
        return any(
            pt.is_timestamp(f.type) and f.type.unit == "ns" for f in schema
        )
    except Exception:
        return False


# (applicationId, resolved path, source mtime) -> lazy DataFrame. Memoizes
# the READ RELATION only — a plan object, never data: every action on it
# still scans the parquet. r16: each spark.read.parquet pays a footer read
# + schema inference (~0.1 s driver-side); the bench's queries call
# load_table 1-6× each, so the repeated inference was several seconds per
# pass. The mtime key keeps write-then-reread paths (tests, temp layouts)
# correct: any rewrite of the source invalidates the entry.
_TABLE_CACHE: dict = {}


def _path_mtime(path: str) -> float:
    try:
        if os.path.isdir(path):
            entries = [os.path.join(path, f) for f in os.listdir(path)]
            return max(
                [os.path.getmtime(path)]
                + [os.path.getmtime(p) for p in entries]
            )
        return os.path.getmtime(path)
    except OSError:
        return -1.0


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table; accepts both ``<dir>/<name>.parquet`` files and
    ``<dir>/<name>`` directories (our indexed layouts).

    Nanosecond-precision parquet timestamps (written by pandas) are illegal
    for Spark's vectorized reader; we read them as raw int64 nanos
    (``spark.sql.legacy.parquet.nanosAsLong``) and convert to TIMESTAMP at
    microsecond precision — the truncation is harmless for second-or-coarser
    windowing and matches the oracle's whole-second math.
    """
    file_path = os.path.join(sf_dir, f"{name}.parquet")
    dir_path = os.path.join(sf_dir, name)
    path = file_path if os.path.exists(file_path) else dir_path
    key = (spark.sparkContext.applicationId, name, path, _path_mtime(path))
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    if _has_nanos_timestamp(path):
        # detected from the FOOTER, up-front — the old try/fail probe left
        # an aborted-job ERROR stack in every session's log tail
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if name == "events":
        df = _normalize_event_time(df, "ts")
    _TABLE_CACHE[key] = df
    return df


def _normalize_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Normalize the two parquet-timestamp encodings the fixtures have shipped
    with to a plain TIMESTAMP (TZ-aware, session tz pinned UTC):

    - int64 nanos (pandas writer + ``nanosAsLong``) → ``timestamp_micros``;
    - ``timestamp[us]`` without UTC adjustment → Spark 4 infers
      TIMESTAMP_NTZ, which ``withWatermark`` rejects
      (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE). The session tz is pinned UTC,
      so ``cast("timestamp")`` is value-preserving.
    """
    dtype = dict(df.dtypes).get(ts_col)
    if dtype == "bigint":
        return df.withColumn(
            ts_col, F.timestamp_micros((F.col(ts_col) / 1000).cast("long"))
        )
    if dtype == "timestamp_ntz":
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def load_stream(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Structured-Streaming twin of ``load_table``: the same table as an
    unbounded source (files appearing in the path = arriving batches).
    Schema (and the nanos→timestamp conversion) is taken from the batch
    reader so stream and batch agree column-for-column."""
    batch = load_table(spark, sf_dir, name)  # sets nanos conf if needed
    file_path = os.path.join(sf_dir, f"{name}.parquet")
    dir_path = os.path.join(sf_dir, name)
    if os.path.exists(file_path):
        # FileStreamSource requires a directory: stream the parent dir with
        # a glob filter selecting just this table's file
        raw = spark.read.parquet(file_path)
        stream = (
            spark.readStream.schema(raw.schema)
            .option("pathGlobFilter", f"{name}.parquet")
            .parquet(sf_dir)
        )
    else:
        raw = spark.read.parquet(dir_path)
        stream = spark.readStream.schema(raw.schema).parquet(dir_path)
    if name == "events":
        stream = _normalize_event_time(stream, "ts")
    return stream


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Temp views for every test table → full Spark SQL surface over them."""
    for t in TABLES:
        try:
            load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        except Exception:
            pass  # table absent at this scale factor
