"""Hybrid lexical + vector retrieval with reciprocal-rank fusion (RRF) —
the fusion step every modern retrieval stack puts on top of a BM25 list
and an embedding list (north-star extension; the reference ships the two
halves — SQL relational + vector top-k — but no fusion operator).

RRF (Cormack/Clarke/Buettcher, SIGIR'09): each candidate list contributes
``1 / (k_rrf + rank)``; candidates missing from a list contribute nothing
from it. Rank-based fusion needs no score calibration between BM25 and
cosine — which is precisely why it is the default in production hybrid
search.

Scale shape: both stages are already bounded-top-``pool`` lists (BM25's
TakeOrdered heap, cosine's TakeOrdered heap), so the fusion join touches
2·pool rows total regardless of corpus size — driver-negligible, executed
as a broadcast-sized full-outer join. The corpus is scanned once per leg,
each leg in its optimal plan (exploded-term filter for BM25, map-side
distance fold for cosine).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pq_vector_spark.functions.text import bm25_topk
from pq_vector_spark.operators.similarity import cosine_topk

RRF_K = 60  # the SIGIR'09 constant; callers override via k_rrf


def rrf_fuse(
    ranked: Sequence[DataFrame],
    id_col: str,
    k: int,
    *,
    k_rrf: int = RRF_K,
) -> DataFrame:
    """Fuse N (id, rank) lists by reciprocal-rank score.

    Each input must carry ``id_col`` and an integer ``rank`` (1-based).
    Output: (id, rrf_score, n_lists) top-k by (score desc, id asc).
    """
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked list")
    legs = [
        df.select(
            F.col(id_col).alias("_id"),
            (F.lit(1.0) / (F.lit(float(k_rrf)) + F.col("rank").cast("double"))).alias(
                "_contrib"
            ),
        )
        for df in ranked
    ]
    allrows = legs[0]
    for leg in legs[1:]:
        allrows = allrows.unionByName(leg)
    fused = allrows.groupBy("_id").agg(
        F.sum("_contrib").alias("rrf_score"),
        F.count(F.lit(1)).cast("int").alias("n_lists"),
    )
    return (
        fused.orderBy(F.col("rrf_score").desc(), F.col("_id").asc())
        .limit(k)
        .select(F.col("_id").alias(id_col), "rrf_score", "n_lists")
    )


def _with_rank(df: DataFrame, order, id_col: str) -> DataFrame:
    w = Window.orderBy(*order)
    return df.withColumn("rank", F.row_number().over(w).cast("int"))


def hybrid_topk(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: Sequence[str],
    query_vec: Sequence[float],
    k: int,
    *,
    vectors: Optional[DataFrame] = None,
    vec_col: str = "embedding",
    vec_id_col: Optional[str] = None,
    pool: Optional[int] = None,
    k_rrf: int = RRF_K,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Hybrid search: BM25 top-``pool`` ∪ cosine top-``pool`` → RRF top-k.

    ``vectors`` defaults to ``docs`` itself (when the table carries both
    text and an embedding column); pass a separate embeddings table plus
    ``vec_id_col`` for the split-table layout. ``pool`` defaults to 4·k —
    the usual fusion depth (deep enough that a result in the other list's
    tail still contributes).

    The two candidate lists are each bounded heaps over a single corpus
    scan; the single-partition rank windows that number them run over
    ≤ pool pre-limited rows, so the fusion stage's cost is O(pool), not
    O(corpus).

    Output: (id, rrf_score, n_lists, rank) — rank is the final 1-based
    hybrid position.
    """
    pool = pool or 4 * k
    vecs = vectors if vectors is not None else docs
    vid = vec_id_col or id_col

    lex = bm25_topk(docs, text_col, id_col, query_terms, k=pool, k1=k1, b=b)
    # bm25_topk output is already (id, score) sorted+limited; re-derive the
    # 1-based rank deterministically from its own ordering contract
    lex = _with_rank(
        lex, [F.col("score").desc(), F.col(id_col).asc()], id_col
    ).select(F.col(id_col).alias("_hid"), "rank")

    sem = cosine_topk(vecs, vec_col, list(query_vec), pool, id_col=vid)
    sem = _with_rank(
        sem, [F.col("cosine").desc(), F.col(vid).asc()], vid
    ).select(F.col(vid).alias("_hid"), "rank")

    fused = rrf_fuse([lex, sem], "_hid", k, k_rrf=k_rrf)
    return _with_rank(
        fused, [F.col("rrf_score").desc(), F.col("_hid").asc()], "_hid"
    ).select(
        F.col("_hid").alias(id_col),
        F.round("rrf_score", 6).alias("rrf_score"),
        "n_lists",
        "rank",
    )
