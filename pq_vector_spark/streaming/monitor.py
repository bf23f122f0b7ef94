"""Streaming corpus monitoring — per-micro-batch PSI drift against a
baseline snapshot, appended to a metrics table (the streaming half of
``operators/drift.py``; pairs with ``streaming/ingest.py`` the way the
batch drift op pairs with the batch curation pipeline).

Design:
- The baseline is a static DataFrame (yesterday's corpus, the training
  snapshot). Its histogram is O(bins); per batch, the incoming slice is
  binned the same way and the eps-floored PSI is computed from the two
  bins-row tables — driver math over ≤ bins values, never data rows.
- ``foreachBatch``, not stateful streaming: the metric is per-batch (no
  cross-batch state to carry), and the metrics sink is an append-only
  parquet table any dashboard reads.
- Per-batch cost: ONE map-side binning pass over the batch + the
  baseline's bins-row aggregate (cache the baseline DataFrame in
  production so its pass is metadata-cheap).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pq_vector_spark.operators.drift import distribution_drift


def drift_metrics_batch(
    batch_df: DataFrame,
    baseline: DataFrame,
    col: str,
    batch_id: int,
    *,
    lo: float,
    hi: float,
    bins: int = 10,
) -> DataFrame:
    """One metrics row for a batch: (batch_id, n_rows, psi). Returns an
    empty frame for an empty batch (no fabricated zero-PSI rows)."""
    from pq_vector_spark.parallel import local_plan_df

    n = batch_df.count()
    spark = batch_df.sparkSession
    if n == 0:
        return local_plan_df(
            spark, [], "batch_id BIGINT, n_rows BIGINT, psi DOUBLE"
        )
    rows = distribution_drift(
        baseline, batch_df, col, lo=lo, hi=hi, bins=bins, decimals=12
    ).collect()
    val = float(sum(r["psi_contrib"] for r in rows))
    return local_plan_df(
        spark,
        [(int(batch_id), int(n), val)],
        "batch_id BIGINT, n_rows BIGINT, psi DOUBLE",
    )


def streaming_drift_monitor(
    stream: DataFrame,
    baseline: DataFrame,
    col: str,
    metrics_path: str,
    *,
    lo: float,
    hi: float,
    bins: int = 10,
    checkpoint: Optional[str] = None,
):
    """Return a ``DataStreamWriter`` appending one (batch_id, n_rows, psi)
    row per micro-batch to the parquet table at ``metrics_path``::

        q = streaming_drift_monitor(src, snapshot, "n_chars", "/metrics",
                                    lo=0, hi=1000).trigger(
            availableNow=True).start()
    """

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        out = drift_metrics_batch(
            batch_df, baseline, col, batch_id, lo=lo, hi=hi, bins=bins
        )
        if out.limit(1).count():
            out.write.mode("append").parquet(metrics_path)

    writer = stream.writeStream.foreachBatch(_apply).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer
