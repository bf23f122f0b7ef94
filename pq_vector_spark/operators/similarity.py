"""Similarity-search operators over embedding columns (north-star
extension): brute-force cosine top-k, batched similarity join, and the
IVF-bucketed scale path.

Scale design: the similarity join broadcasts the (small) query side and
computes per-corpus-partition top-k via window ranking — corpus never
shuffles. The IVF variant joins on cluster id first so only co-clustered
pairs are scored (distributed analogue of the reference's probe → gather →
re-rank pipeline, reference: src/ivf/search.rs:100-141).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from pq_vector_spark.functions.distance import array_distance, cosine_similarity


def cosine_topk(
    df: DataFrame,
    vec_col: str,
    query: Sequence[float],
    k: int,
    *,
    id_col: Optional[str] = None,
) -> DataFrame:
    """Top-k rows by cosine similarity to a literal query vector —
    TakeOrderedAndProject plan, same shape as L2 brute force."""
    scored = df.withColumn("cosine", cosine_similarity(F.col(vec_col), list(query)))
    order = [F.col("cosine").desc()]
    if id_col:
        order.append(F.col(id_col).asc())
    return scored.orderBy(*order).limit(k)


def similarity_join(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    corpus_vec: str,
    k: int,
    *,
    metric: str = "l2",
    dim_hint: int | None = None,
) -> DataFrame:
    """For every query row, the k nearest corpus rows.

    Plan: broadcast(queries) ⨯ corpus → score → window top-k per query.
    The corpus side (the 100 TB side) is scanned once, never shuffled; only
    n_queries × k result rows leave the executors' partial ranks. Requires
    the query side to be broadcast-sized (same driver-fits assumption the
    reference makes for its query vectors).

    ``dim_hint``: known vector width; wide vectors route the per-pair
    distance to the Arrow kernel instead of the interpreted fold (results
    are bit-identical — see functions/distance.py).

    Output: (query_id, corpus_id, score, rank) with deterministic
    (score, corpus_id) ordering.
    """
    q = queries.select(
        F.col(query_id).alias("_qid"), F.col(query_vec).alias("_qv")
    )
    c = corpus.select(
        F.col(corpus_id).alias("_cid"), F.col(corpus_vec).alias("_cv")
    )
    pairs = c.crossJoin(broadcast(q))
    if metric == "l2":
        score = array_distance(F.col("_cv"), F.col("_qv"), dim_hint=dim_hint)
        order = [F.col("score").asc(), F.col("_cid").asc()]
    elif metric == "cosine":
        score = cosine_similarity(F.col("_cv"), F.col("_qv"), dim_hint=dim_hint)
        order = [F.col("score").desc(), F.col("_cid").asc()]
    else:
        raise ValueError(f"unknown metric {metric!r}")
    scored = pairs.withColumn("score", score)
    w = Window.partitionBy("_qid").orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias(query_id),
            F.col("_cid").alias(corpus_id),
            "score",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def ivf_similarity_join(
    queries: DataFrame,
    corpus_indexed_path: str,
    spark,
    query_id: str,
    query_vec: str,
    k: int,
    *,
    corpus_id: Optional[str] = None,
    nprobe: int = 5,
    broadcast_queries: bool = True,
    prune_scan: bool = True,
) -> DataFrame:
    """Scale path: assign each query to its nprobe nearest centroids
    (broadcast centroids + one map-side pandas-UDF matmul over the query
    DataFrame — no collect, any query-side size), explode the probe list,
    join corpus on cluster_id (co-located by the index layout), then window
    top-k. Only nprobe/n_clusters of the corpus is scored per query — the
    distributed generalization of the reference's candidate-pruned search
    (probe → gather → re-rank, src/ivf/search.rs:100-141).

    ``broadcast_queries=True`` (default) broadcasts the exploded probe table
    — right when the query side fits in memory. Set False for a huge query
    side: the join becomes a shuffle join on cluster_id, which the corpus
    layout already co-locates.

    ``prune_scan=True`` additionally pushes a ``cluster_id IN (∪ probed)``
    filter into the corpus scan so unprobed clusters are never READ (file /
    row-group skipping on the sorted layout), not just never joined. This
    collects the distinct probed cluster ids — bounded by n_clusters, i.e.
    metadata-scale like the centroids themselves, never data — and persists
    the probe table so its one pass is shared with the join.

    Output: (query_id, corpus_id?, score, rank) — same shape as
    ``similarity_join``; the query-id column keeps its original type
    (derived from ``queries.schema``, never hardcoded). Internal names avoid
    collisions with corpus columns.
    """
    from pq_vector_spark.index.build import CLUSTER_COL, PROBE_COL, probe_clusters
    from pq_vector_spark.index.search import load_index

    idx = load_index(spark, corpus_indexed_path)

    q = queries.select(F.col(query_id).alias("_pq_qid"), F.col(query_vec).alias("_pq_qv"))
    probe_df = (
        probe_clusters(q, "_pq_qv", idx.centroids, nprobe)
        .select("_pq_qid", "_pq_qv", F.explode(PROBE_COL).alias("_pq_cluster"))
    )

    corpus = spark.read.parquet(corpus_indexed_path)
    if prune_scan:
        from pyspark import StorageLevel

        probe_df = probe_df.persist(StorageLevel.MEMORY_AND_DISK)
        probed_union = [
            r[0] for r in probe_df.select("_pq_cluster").distinct().collect()
        ]
        if len(probed_union) < idx.meta["n_clusters"]:
            corpus = corpus.filter(F.col(CLUSTER_COL).isin(probed_union))
    if broadcast_queries:
        probe_df = broadcast(probe_df)

    joined = corpus.join(probe_df, corpus[CLUSTER_COL] == probe_df["_pq_cluster"])
    scored = joined.withColumn(
        "score",
        array_distance(
            F.col(idx.meta["column"]), F.col("_pq_qv"), dim_hint=idx.meta["dim"]
        ),
    )
    order = [F.col("score").asc()]
    if corpus_id is not None:
        order.append(F.col(corpus_id).asc())  # deterministic tie-break
    w = Window.partitionBy("_pq_qid").orderBy(*order)
    ranked = (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
    cols = [F.col("_pq_qid").alias(query_id)]
    if corpus_id is not None:
        cols.append(F.col(corpus_id))
    cols += [F.col("score"), F.col("rank")]
    return ranked.select(*cols)
