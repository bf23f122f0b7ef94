"""Continuous corpus ingestion — a Structured Streaming composition of the
engine's incremental primitives: each micro-batch of incoming documents is
deduped against the standing corpus (``operators/dedup.incremental_dedup``)
and only the surviving rows are appended.

This is the streaming half of the incremental contract whose batch halves
are ``incremental_dedup`` (text) and ``index/build.append_to_index``
(vectors): a 100 TB corpus ingests a nightly/continuous crawl without ever
re-shuffling itself.

Scale design:
- Per micro-batch cost is delta-bounded: the batch's fingerprints
  broadcast as a map-side semi-join probe over the corpus scan; the only
  exchange is the within-batch survivor window (batch-sized).
- ``foreachBatch`` is the right tool (not a stateful operator): the
  standing corpus is the state, and it already lives in storage — holding
  a fingerprint set in stream state would duplicate the corpus into the
  state store and grow without bound.
- The corpus re-scan per batch reads only the fingerprint column
  (column-pruned); on a real deployment the corpus path is date/shard
  partitioned so the probe prunes partitions too. Exactly-once: file
  sink appends + checkpointed offsets give effectively-once appends
  (Spark's standard foreachBatch contract — make the write idempotent by
  batch id if the sink demands it).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame

from pq_vector_spark.operators.dedup import incremental_dedup


def dedup_append_batch(
    batch_df: DataFrame, corpus_path: str, text_col: str, id_col: str
) -> int:
    """Apply one micro-batch: dedup against (and within) the corpus at
    ``corpus_path``, append survivors. Returns the number appended.
    Usable directly for batch backfills; ``streaming_ingest`` wires it
    into foreachBatch."""
    spark = batch_df.sparkSession
    corpus = spark.read.parquet(corpus_path)
    fresh = incremental_dedup(corpus, batch_df, text_col, id_col)
    # Two actions on `fresh` (count + write) would re-run the probe; keep
    # it single-action by writing then counting cheaply via the write's
    # own output is not exposed — so persist the delta-bounded survivors.
    fresh = fresh.persist()
    try:
        n = fresh.count()
        if n:
            fresh.write.mode("append").parquet(corpus_path)
    finally:
        fresh.unpersist()
    return n


def streaming_ingest(
    stream: DataFrame,
    corpus_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint: Optional[str] = None,
):
    """Return a ``DataStreamWriter`` that continuously ingests ``stream``
    into the parquet corpus at ``corpus_path`` with per-batch incremental
    dedup. Caller picks the trigger/start, e.g.::

        q = streaming_ingest(src, "/corpus", checkpoint="/chk").trigger(
            availableNow=True).start()
        q.awaitTermination()
    """

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        dedup_append_batch(batch_df, corpus_path, text_col, id_col)

    writer = stream.writeStream.foreachBatch(_apply).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer
