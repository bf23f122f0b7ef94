"""Scan-parallelism guard for compute-heavy map stages.

Guide §2.5's "input skew" case in miniature: a parquet file with a single
row group scans as ONE task no matter how many cores the cluster has —
Spark's split logic can chop byte ranges, but every range maps back to the
same row group, so one task does all the work. When the stage downstream
of such a scan carries heavy per-row compute (md5 shingling, winnowing,
per-token feature extraction), the whole cluster idles behind one core.

``ensure_compute_parallelism`` round-robins the rows across
``sparkContext.defaultParallelism`` partitions ONLY when the source plan
yields fewer partitions than that — i.e. only when the scan genuinely
underprovisions the cores available. At real scale (any input with more
splits than cores) it is an exact no-op: no exchange is added, plans are
unchanged. The exchange it does add in the small case moves the slim
pre-compute projection once (keyless repartition; Spark's
sort-before-repartition keeps the row→partition mapping deterministic
under task retry, SPARK-23207), and the expensive compute then runs
cluster-wide.

This is deliberately a *conditional* rule, not a config: lowering
``spark.sql.files.maxPartitionBytes`` cannot split a single row group,
and an unconditional ``repartition(n)`` would add a pointless corpus
shuffle at scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

# escape hatch: PQ_SPREAD_SMALL_SCANS=0 disables the guard everywhere
# (e.g. to A/B the exchange cost); default on.
_ENV_KNOB = "PQ_SPREAD_SMALL_SCANS"


def local_plan_df(spark, rows, schema) -> DataFrame:
    """Driver-built tiny plan/lookup tables (budget plans, component maps,
    centroid tables, quantized-llr tables) destined for a broadcast join.

    ``createDataFrame(list)`` parallelizes the rows into
    ``defaultParallelism`` slices, so every broadcast build of such a
    table runs a near-empty task per core (measured 0.45–0.77 s per build
    at local[32] vs ~0.05 s of real work; on a big cluster it is a
    cores-wide task wave for a 20-row table). Route the same rows through
    ``sc.parallelize(rows, 1)``: identical verification + toInternal
    conversion (PySpark applies both on the RDD path, just lazily), one
    task per build. Results are bit-identical — broadcast join output
    never depends on build-side partitioning.
    """
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)


# Memo for the partition probe below. The probe costs ~0.1-0.2 s of
# driver time per FRESH plan (physical planning + RDD conversion), paid
# at every plan construction of every spread call site — but for a
# file-backed plan the answer is a pure function of the input file set
# and the split confs, so one probe per (app, files, conf) serves every
# later construction at inputFiles() cost (~0.02 s). A stale or
# colliding entry can only mis-tune the SPREAD DECISION (an extra or a
# missing round-robin exchange — speed, never values), so file-set
# keying is safe by construction.
_PROBE_MEMO: dict = {}


def _plan_partitions(df: DataFrame) -> int:
    """Partition count ``df`` would execute with, memoized per input
    file set for file-backed plans (non-file plans probe every time)."""
    spark = df.sparkSession
    sc = spark.sparkContext
    key = None
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if files:
        try:
            max_bytes = spark.conf.get("spark.sql.files.maxPartitionBytes")
        except Exception:
            max_bytes = ""
        key = (
            sc.applicationId,
            tuple(sorted(files)),
            max_bytes,
            sc.defaultParallelism,
        )
        n = _PROBE_MEMO.get(key)
        if n is not None:
            return n
    try:
        # the JVM-side RDD handle skips the Python-serializer wrapping
        # DataFrame.rdd adds (~2x cheaper); same partition count.
        n = df._jdf.javaToPython().getNumPartitions()
    except Exception:
        n = df.rdd.getNumPartitions()
    if key is not None:
        _PROBE_MEMO[key] = n
    return n


def ensure_compute_parallelism(df: DataFrame, *, min_rows: int = 0) -> DataFrame:
    """Spread ``df`` across the cluster's cores iff its plan currently
    yields fewer partitions than ``defaultParallelism``.

    Call it on the slim projection feeding a compute-heavy stage (project
    FIRST — the exchange should carry only the columns the compute needs,
    guide §2.3). Returns ``df`` unchanged when the plan is already at
    least cores-wide, when the guard is disabled via
    ``PQ_SPREAD_SMALL_SCANS=0``, or when partition introspection fails.

    ``min_rows`` is reserved for callers that know the row count and want
    to skip the exchange for trivially small inputs (0 = always spread
    when under-partitioned).
    """
    if os.environ.get(_ENV_KNOB, "1") == "0":
        return df
    try:
        sc = df.sparkSession.sparkContext
        target = sc.defaultParallelism
        n = _plan_partitions(df)
    except Exception:
        return df
    if n >= target:
        return df
    return df.repartition(target)
