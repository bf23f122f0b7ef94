"""Hybrid BM25+cosine RRF retrieval tests."""

import pytest
from pyspark.sql import functions as F

from pq_vector_spark.operators.hybrid import hybrid_topk, rrf_fuse


def _ranked(spark, rows):
    return spark.createDataFrame(rows, "id: bigint, rank: int")


def test_rrf_fuse_hand_computed(spark):
    # doc 1 in both lists (ranks 1, 2); doc 2 lexical only (rank 2);
    # doc 3 semantic only (rank 1)
    lex = _ranked(spark, [(1, 1), (2, 2)])
    sem = _ranked(spark, [(3, 1), (1, 2)])
    out = {r["id"]: r for r in rrf_fuse([lex, sem], "id", 10, k_rrf=60).collect()}
    assert out[1]["n_lists"] == 2
    assert abs(out[1]["rrf_score"] - (1 / 61 + 1 / 62)) < 1e-12
    assert abs(out[2]["rrf_score"] - 1 / 62) < 1e-12
    assert abs(out[3]["rrf_score"] - 1 / 61) < 1e-12
    # doc in both lists outranks either single-list doc
    assert out[1]["rrf_score"] > out[3]["rrf_score"] > out[2]["rrf_score"]


def test_rrf_sql_path_matches_column_path(spark):
    """r17: the one-shot SQL render of rrf_fuse must be bit-identical to
    the Column path (forced via a backtick-hostile alias? no — forced by
    monkeypatching the render off is brittle; instead compare against a
    Column-path replica built inline)."""
    from pq_vector_spark.operators import hybrid as H

    lex = _ranked(spark, [(1, 1), (2, 2), (7, 3)])
    sem = _ranked(spark, [(3, 1), (1, 2)])
    via_sql = H._rrf_sql([lex, sem], "id", 10, 60)
    assert via_sql is not None
    # Column-path replica (the fallback body of rrf_fuse, verbatim)
    legs = [
        df.select(
            F.col("id").alias("_id"),
            (F.lit(1.0) / (F.lit(60.0) + F.col("rank").cast("double"))).alias(
                "_contrib"
            ),
        )
        for df in (lex, sem)
    ]
    allrows = legs[0].unionByName(legs[1])
    fused = allrows.groupBy("_id").agg(
        F.sum("_contrib").alias("rrf_score"),
        F.count(F.lit(1)).cast("int").alias("n_lists"),
    )
    via_col = (
        fused.orderBy(F.col("rrf_score").desc(), F.col("_id").asc())
        .limit(10)
        .select(F.col("_id").alias("id"), "rrf_score", "n_lists")
    )
    assert via_sql.schema == via_col.schema
    assert [tuple(r) for r in via_sql.collect()] == [
        tuple(r) for r in via_col.collect()
    ]


def test_hybrid_sql_fusion_matches_column_path(spark, monkeypatch):
    """r17: hybrid_topk's one-shot fusion SQL must produce exactly what
    the Column chain produces (schema + values), checked by disabling the
    render and re-running the same inputs."""
    from pq_vector_spark.operators import hybrid as H

    docs = spark.createDataFrame(
        [
            (0, "spark window functions in spark"),
            (1, "window seat spark plug spark spark"),
            (2, "completely unrelated words here"),
            (3, "nothing relevant at all"),
        ],
        "doc_id: bigint, text: string",
    )
    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.1]),
            (1, [0.0, 1.0, 0.0]),
            (2, [0.9, 0.1, 0.1]),
            (3, [0.0, 0.9, 0.5]),
        ],
        "vec_id: bigint, embedding: array<float>",
    )
    kwargs = dict(
        vectors=vecs, vec_id_col="vec_id", pool=4, k_rrf=60
    )
    via_sql = hybrid_topk(
        docs, "text", "doc_id", ["spark", "window"], [1.0, 0.0, 0.0], 3,
        **kwargs,
    )
    monkeypatch.setattr(H, "_hybrid_fuse_sql", lambda *a, **k: None)
    via_col = hybrid_topk(
        docs, "text", "doc_id", ["spark", "window"], [1.0, 0.0, 0.0], 3,
        **kwargs,
    )
    assert via_sql.schema == via_col.schema
    assert [tuple(r) for r in via_sql.collect()] == [
        tuple(r) for r in via_col.collect()
    ]


def test_rrf_fuse_empty_input(spark):
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([], "id", 5)


def test_rrf_fuse_k_limit_and_tiebreak(spark):
    # identical contributions → tie broken by ascending id
    lex = _ranked(spark, [(5, 1), (3, 1)])  # same rank in separate lists
    sem = _ranked(spark, [(9, 1)])
    rows = rrf_fuse([lex, sem], "id", 2, k_rrf=60).collect()
    assert [r["id"] for r in rows] == [3, 5]  # 9 cut by k=2 tie-break


def test_hybrid_topk_end_to_end(spark):
    # 4 docs: doc 0 matches the query terms AND has the closest vector;
    # doc 1 lexical-only; doc 2 semantic-only; doc 3 neither.
    docs = spark.createDataFrame(
        [
            (0, "spark window functions in spark"),
            (1, "window seat spark plug spark spark"),
            (2, "completely unrelated words here"),
            (3, "nothing relevant at all"),
        ],
        "doc_id: bigint, text: string",
    )
    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.1]),
            (1, [0.0, 1.0, 0.0]),
            (2, [0.9, 0.1, 0.1]),
            (3, [0.0, 0.9, 0.5]),
        ],
        "vec_id: bigint, embedding: array<float>",
    )
    out = hybrid_topk(
        docs,
        "text",
        "doc_id",
        ["spark", "window"],
        [1.0, 0.0, 0.1],
        3,
        vectors=vecs,
        vec_id_col="vec_id",
        pool=4,
    ).collect()
    assert [r["doc_id"] for r in out][0] == 0  # both-legs doc wins
    assert [r["rank"] for r in out] == [1, 2, 3]
    top = out[0]
    assert top["n_lists"] == 2
    assert set(r["doc_id"] for r in out) <= {0, 1, 2, 3}


def test_hybrid_topk_same_table(spark):
    # vectors default to the docs table itself
    docs = spark.createDataFrame(
        [
            (0, "alpha beta", [1.0, 0.0]),
            (1, "beta gamma", [0.0, 1.0]),
        ],
        "doc_id: bigint, text: string, embedding: array<float>",
    )
    out = hybrid_topk(docs, "text", "doc_id", ["alpha"], [1.0, 0.0], 2).collect()
    assert out[0]["doc_id"] == 0
    assert out[0]["n_lists"] == 2
