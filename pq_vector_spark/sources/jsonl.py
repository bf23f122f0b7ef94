"""Line-delimited JSON (JSONL) ingestion with corrupt-record quarantine.

Web-scale corpora arrive as JSONL (Common Crawl derivative dumps, API
exports, annotation deliveries) — often gzipped, often with a fraction of
malformed lines. The reference engine reads Parquet only
(src/ivf/parquet.rs); this module is the ingestion edge of the
training-pipeline extension: land JSONL as a DataFrame, SPLIT the
malformed lines into a quarantine frame instead of silently nulling or
dropping them, then write the curated corpus to Parquet.

Scale notes:

- **Pass an explicit schema.** Schema inference is a FULL extra pass over
  the input (at 100 TB, a second 100 TB scan before the first real job);
  with a schema the read is one pass. ``read_jsonl`` therefore requires a
  schema for the quarantine path and only allows inference in the
  convenience form.
- **.gz awareness**: Spark reads gzipped JSONL transparently, but each
  .gz file is ONE non-splittable partition — at scale, repartition after
  load (or ingest zstd/bzip2 or uncompressed, which split).
- **Quarantine is PERMISSIVE mode done right**: Spark's default nulls all
  fields and stashes the raw line in the corrupt-record column; we split
  on it so the main frame is clean rows only and the bad lines stay
  auditable (the curation discipline: never silently drop input).
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: Optional[T.StructType] = None,
    *,
    corrupt_col: str = CORRUPT_COL,
) -> Tuple[DataFrame, DataFrame]:
    """Read JSONL at ``path`` → ``(good, quarantine)``.

    ``good`` carries exactly the ``schema`` columns for rows that parsed
    cleanly; ``quarantine`` is one string column (``corrupt_col``) holding
    each malformed raw line. Requires an explicit ``schema`` (the one-pass
    contract above); use :func:`read_jsonl_inferred` when a second
    inference pass over small data is acceptable.

    Neither frame can come off a native JSON scan: Spark refuses any
    query whose scan-referenced columns reduce to the internal corrupt
    column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — and
    column pruning makes even ``good.count()`` such a query, since only
    the corrupt-IS-NULL filter's input survives pruning. (The documented
    alternative is caching the whole parse, which a library must not
    impose.) So both frames read the files as TEXT and run the same
    PERMISSIVE parser through ``from_json`` with the same corrupt-record
    option — one parse per row, materialized through an inline-generator
    barrier so Catalyst cannot re-inline the parse per consumer. Blank
    lines are structure (the JSONL contract), not corruption; a literal
    ``null`` line parses to an all-NULL row (kept — it is valid JSON,
    just not a record; filter on a required field downstream)."""
    if schema is None:
        raise ValueError(
            "read_jsonl requires an explicit schema (inference is a full "
            "extra pass at scale); use read_jsonl_inferred for small data"
        )
    if corrupt_col in [f.name for f in schema.fields]:
        raise ValueError(
            f"schema must not already contain the corrupt column "
            f"{corrupt_col!r}"
        )
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    parsed = F.from_json(
        F.col("value"),
        full,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col},
    )
    flat = (
        spark.read.text(path)
        .filter(F.length(F.trim(F.col("value"))) > 0)
        .select(F.inline(F.array(parsed)))
    )
    good = flat.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    quarantine = flat.filter(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    return good, quarantine


def read_jsonl_inferred(spark: SparkSession, path: str) -> DataFrame:
    """Convenience form: schema-inferred JSONL read (TWO passes — the
    inference scan plus the real one). Small/exploratory data only;
    production ingestion passes a schema through :func:`read_jsonl`."""
    return spark.read.json(path)


def write_jsonl(df: DataFrame, path: str, *, mode: str = "error") -> None:
    """Write ``df`` as JSONL (one JSON object per line) — the interchange
    format the rest of the world reads back. Plain ``df.write.json`` with
    the mode surfaced; compression/partitioning via the caller's
    ``df.coalesce``/``repartition`` and Spark write options upstream."""
    df.write.mode(mode).json(path)
