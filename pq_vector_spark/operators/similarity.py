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
) -> DataFrame:
    """For every query row, the k nearest corpus rows.

    Plan: broadcast(queries) ⨯ corpus → score → window top-k per query.
    The corpus side (the 100 TB side) is scanned once, never shuffled; only
    n_queries × k result rows leave the executors' partial ranks. Requires
    the query side to be broadcast-sized (same driver-fits assumption the
    reference makes for its query vectors).

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
        score = array_distance(F.col("_cv"), F.col("_qv"))
        order = [F.col("score").asc(), F.col("_cid").asc()]
    elif metric == "cosine":
        score = cosine_similarity(F.col("_cv"), F.col("_qv"))
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
) -> DataFrame:
    """Scale path: assign each query to its nprobe nearest centroids
    (broadcast centroids, map-side), join corpus on cluster_id (co-located
    by the index layout), then window top-k. Only nprobe/n_clusters of the
    corpus is read per query batch — the distributed generalization of the
    reference's candidate-pruned search.

    Output: (query_id, corpus_id?, score, rank) — same shape as
    ``similarity_join``; internal names avoid collisions with corpus columns.
    """
    import numpy as np

    from pq_vector_spark.index.build import CLUSTER_COL
    from pq_vector_spark.index.kmeans import nearest_centroids
    from pq_vector_spark.index.search import load_index

    idx = load_index(spark, corpus_indexed_path)
    cents = idx.centroids

    qrows = queries.select(query_id, query_vec).collect()
    probe_rows = []
    for r in qrows:
        probed = nearest_centroids(np.asarray(r[1], dtype=np.float32), cents, nprobe)
        for c in probed:
            probe_rows.append((r[0], int(c), list(map(float, r[1]))))
    probe_df = spark.createDataFrame(
        probe_rows, "_pq_qid BIGINT, _pq_cluster INT, _pq_qv ARRAY<DOUBLE>"
    )

    corpus = spark.read.parquet(corpus_indexed_path)
    joined = corpus.join(
        broadcast(probe_df), corpus[CLUSTER_COL] == probe_df["_pq_cluster"]
    )
    scored = joined.withColumn(
        "score", array_distance(F.col(idx.meta["column"]), F.col("_pq_qv"))
    )
    w = Window.partitionBy("_pq_qid").orderBy(F.col("score").asc())
    ranked = (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
    cols = [F.col("_pq_qid").alias(query_id)]
    if corpus_id is not None:
        cols.append(F.col(corpus_id))
    cols += [F.col("score"), F.col("rank")]
    return ranked.select(*cols)
