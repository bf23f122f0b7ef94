"""Similarity-search operator tests (north-star extension)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pq_vector_spark.index.build import build_index
from pq_vector_spark.operators.similarity import (
    cosine_topk,
    ivf_similarity_join,
    similarity_join,
)
from pq_vector_spark.session import IndexBuildOptions


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(5)
    rows = [(int(i), [float(x) for x in rng.random(6, dtype=np.float32)]) for i in range(300)]
    return spark.createDataFrame(rows, "cid BIGINT, vec ARRAY<FLOAT>")


def test_cosine_topk(spark, corpus):
    out = cosine_topk(corpus, "vec", [1.0] * 6, 5, id_col="cid").collect()
    assert len(out) == 5
    sims = [r["cosine"] for r in out]
    assert sims == sorted(sims, reverse=True)


def test_similarity_join_l2(spark, corpus):
    queries = corpus.filter(F.col("cid") < 3).select(
        F.col("cid").alias("qid"), F.col("vec").alias("qv")
    )
    out = similarity_join(queries, corpus, "qid", "cid", "qv", "vec", 4, metric="l2")
    rows = out.collect()
    assert len(rows) == 3 * 4
    # self-match is rank 1 at distance 0
    best = {r["qid"]: r for r in rows if r["rank"] == 1}
    for qid, r in best.items():
        assert r["cid"] == qid
        assert r["score"] == pytest.approx(0.0)


def test_similarity_join_broadcasts(spark, corpus):
    """The query side must broadcast — corpus never shuffles."""
    queries = corpus.limit(2).select(F.col("cid").alias("qid"), F.col("vec").alias("qv"))
    out = similarity_join(queries, corpus, "qid", "cid", "qv", "vec", 2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_ivf_similarity_join(spark, corpus, tmp_path_factory):
    base = tmp_path_factory.mktemp("simidx")
    src = str(base / "corpus.parquet")
    out_path = str(base / "indexed")
    corpus.write.mode("overwrite").parquet(src)
    build_index(spark, src, out_path, column="vec", options=IndexBuildOptions(n_clusters=8))

    queries = corpus.filter(F.col("cid") < 3).select(
        F.col("cid").alias("qid"), "vec"
    )
    out = ivf_similarity_join(
        queries, out_path, spark, "qid", "vec", k=3, corpus_id="cid", nprobe=8
    ).collect()
    # nprobe = n_clusters ⇒ all clusters probed ⇒ self-match present at rank 1
    best = {r["qid"]: r for r in out if r["rank"] == 1}
    assert len(out) == 9
    for qid in (0, 1, 2):
        assert best[qid]["cid"] == qid
        assert best[qid]["score"] == pytest.approx(0.0)


def test_ivf_similarity_join_is_distributed(spark, corpus, tmp_path_factory):
    """The probe side must stay a lazy plan over the query DataFrame —
    no collect()/createDataFrame (which would show up as a LocalTableScan /
    LocalRelation leaf); the probe itself is the ArrowEvalPython pandas UDF."""
    base = tmp_path_factory.mktemp("simidx_dist")
    src = str(base / "corpus.parquet")
    out_path = str(base / "indexed")
    corpus.write.mode("overwrite").parquet(src)
    build_index(spark, src, out_path, column="vec", options=IndexBuildOptions(n_clusters=8))

    queries = corpus.filter(F.col("cid") < 3).select(F.col("cid").alias("qid"), "vec")
    out = ivf_similarity_join(queries, out_path, spark, "qid", "vec", k=2, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" not in plan
    assert "ArrowEvalPython" in plan or "PythonUDF" in plan


def test_ivf_similarity_join_nonint_query_id(spark, corpus, tmp_path_factory):
    """Query-id type is derived from the schema (the old path hardcoded
    BIGINT and broke on strings)."""
    base = tmp_path_factory.mktemp("simidx_str")
    src = str(base / "corpus.parquet")
    out_path = str(base / "indexed")
    corpus.write.mode("overwrite").parquet(src)
    build_index(spark, src, out_path, column="vec", options=IndexBuildOptions(n_clusters=8))

    queries = (
        corpus.filter(F.col("cid") < 2)
        .select(F.concat(F.lit("q-"), F.col("cid")).alias("qid"), "vec")
    )
    rows = ivf_similarity_join(
        queries, out_path, spark, "qid", "vec", k=2, corpus_id="cid", nprobe=8
    ).collect()
    assert len(rows) == 4
    assert {r["qid"] for r in rows} == {"q-0", "q-1"}
    assert dict(ivf_similarity_join(
        queries, out_path, spark, "qid", "vec", k=1, corpus_id="cid", nprobe=8
    ).select("qid", "cid").collect()) == {"q-0": 0, "q-1": 1}


def test_ivf_similarity_join_prune_scan_same_results(spark, corpus, tmp_path_factory):
    """prune_scan only skips clusters the probe never touches — results are
    identical with it on or off, at any nprobe."""
    base = tmp_path_factory.mktemp("simidx_prune")
    src = str(base / "corpus.parquet")
    out_path = str(base / "indexed")
    corpus.write.mode("overwrite").parquet(src)
    build_index(spark, src, out_path, column="vec", options=IndexBuildOptions(n_clusters=8))

    queries = corpus.filter(F.col("cid") < 4).select(F.col("cid").alias("qid"), "vec")
    for nprobe in (2, 8):
        on = ivf_similarity_join(
            queries, out_path, spark, "qid", "vec", k=3, corpus_id="cid",
            nprobe=nprobe, prune_scan=True,
        ).collect()
        off = ivf_similarity_join(
            queries, out_path, spark, "qid", "vec", k=3, corpus_id="cid",
            nprobe=nprobe, prune_scan=False,
        ).collect()
        key = lambda r: (r["qid"], r["rank"])
        assert sorted(on, key=key) == sorted(off, key=key)


def test_ivf_similarity_join_prune_scan_pushes_filter(spark, corpus, tmp_path_factory):
    """With few queries and nprobe < n_clusters the pruned plan must carry a
    cluster_id IN (...) filter pushed into the parquet scan."""
    base = tmp_path_factory.mktemp("simidx_prune_plan")
    src = str(base / "corpus.parquet")
    out_path = str(base / "indexed")
    corpus.write.mode("overwrite").parquet(src)
    build_index(spark, src, out_path, column="vec", options=IndexBuildOptions(n_clusters=8))

    queries = corpus.limit(1).select(F.col("cid").alias("qid"), "vec")
    out = ivf_similarity_join(
        queries, out_path, spark, "qid", "vec", k=2, nprobe=2, prune_scan=True
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(_pq_cluster" in plan
