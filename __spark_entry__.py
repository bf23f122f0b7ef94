"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation notes (why these hash-match bit-for-bit):
- All distance/cosine math casts elements to DOUBLE before arithmetic and
  folds left-to-right — identical to the DuckDB ``list_reduce`` oracle.
- All text hashing is md5-derived (portable), never engine-native hashes.
- Aggregate doubles are ROUND()ed at (exact-decimal-places + 2) digits so
  float summation-order differences can never flip a rounding boundary.
- Every computed column is aliased identically on both sides.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pq_vector_spark.functions.distance import array_distance, cosine_similarity
from pq_vector_spark.functions import text as T
from pq_vector_spark.operators import dedup as D
from pq_vector_spark.operators.similarity import similarity_join
from pq_vector_spark.operators.topk import brute_force_topk
from pq_vector_spark.index.search import ivf_topk_adhoc
from pq_vector_spark.sources.parquet import load_table
from pq_vector_spark.streaming.events import extract_prop, sessionize, tumbling_agg

K = 10
IVF_CLUSTERS = 16


def _utc(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


# Query-vector memo (r17, guide §4 driver boundary): ~10 queries fetch
# their query PARAMETER with this one-row collect, paying a ~0.1 s Spark
# job per plan construction. The collected vector is a pure function of
# the embeddings file, so memoize it keyed on (path, mtime, size) — the
# same invalidation contract as load_table's relation memo and the same
# cross-query amortization class as _IDX_CACHE below. In-process only:
# every bench/oracle invocation still reads it from parquet once.
_QVEC_CACHE: dict = {}


def _qvec(spark: SparkSession, sf_dir: str, vec_id: int = 0):
    path = os.path.join(sf_dir, "embeddings.parquet")
    try:
        st = os.stat(path)
        key = (path, vec_id, st.st_mtime_ns, st.st_size)
    except OSError:
        key = None
    if key is not None and key in _QVEC_CACHE:
        return _QVEC_CACHE[key]
    vec = (
        _emb(spark, sf_dir).filter(F.col("vec_id") == vec_id).select("embedding").collect()[0][0]
    )
    if key is not None:
        _QVEC_CACHE[key] = vec
    return vec


_IDX_CACHE: dict[str, str] = {}


def _indexed_path(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per sf_dir per process) the IVF-indexed layout of the
    embeddings table into a temp dir; reused by every query that exercises
    the rewritten-layout path (similarity_join_ivf, knn_capped)."""
    import tempfile

    from pq_vector_spark.index.build import build_index
    from pq_vector_spark.session import IndexBuildOptions

    cached = _IDX_CACHE.get(sf_dir)
    if cached and os.path.isdir(cached):
        return cached
    out = os.path.join(tempfile.mkdtemp(prefix="pq_entry_idx_"), "embeddings_indexed")
    build_index(
        spark,
        os.path.join(sf_dir, "embeddings.parquet"),
        out,
        column="embedding",
        options=IndexBuildOptions(n_clusters=IVF_CLUSTERS),
    )
    _IDX_CACHE[sf_dir] = out
    return out


_APPEND_CACHE: dict[str, str] = {}


def _appended_path(spark: SparkSession, sf_dir: str) -> str:
    """Indexed layout built from HALF the embeddings then grown to the full
    table via append_to_index (≙ the reference's in-place append lifecycle)
    — cached per sf_dir like _indexed_path."""
    import tempfile

    from pq_vector_spark.index.build import append_to_index, build_index
    from pq_vector_spark.session import IndexBuildOptions

    cached = _APPEND_CACHE.get(sf_dir)
    if cached and os.path.isdir(cached):
        return cached
    base = tempfile.mkdtemp(prefix="pq_entry_app_")
    half_a = os.path.join(base, "half_a.parquet")
    half_b = os.path.join(base, "half_b.parquet")
    emb = _emb(spark, sf_dir)
    emb.filter(F.col("vec_id") % 2 == 0).write.parquet(half_a)
    emb.filter(F.col("vec_id") % 2 == 1).write.parquet(half_b)
    out = os.path.join(base, "embeddings_appended")
    build_index(
        spark, half_a, out, column="embedding",
        options=IndexBuildOptions(n_clusters=IVF_CLUSTERS),
    )
    append_to_index(spark, half_b, out)
    _APPEND_CACHE[sf_dir] = out
    return out


# ---------------------------------------------------------------- entry ----

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: exact brute-force k-NN with
    distances (the reference's canonical query, src/df_vector/tests.rs:76-81)."""
    sf_dir = "/root/testdata/sf0.001"
    q = _qvec(spark, sf_dir, 0)
    out = brute_force_topk(
        _emb(spark, sf_dir), "embedding", q, K, tie_break="vec_id", keep_distance=True
    )
    return out.select("vec_id", F.round(F.col("_pq_distance"), 4).alias("distance"))


# -------------------------------------------------------------- queries ----

def _knn_exact(spark, sf_dir):
    q = _qvec(spark, sf_dir, 0)
    return brute_force_topk(_emb(spark, sf_dir), "embedding", q, K, tie_break="vec_id").select(
        "vec_id"
    )


def _knn_binary(spark, sf_dir):
    """Binary-quantized top-k (r13, functions/quantize.py:binary_topk —
    the 1-bit/32x-compression coarse filter modern vector stores pair
    with an exact re-rank): sign-bit words packed map-side, Hamming
    shortlist at k*oversample (bounded heap #1, integer xor+bit_count in
    codegen), exact-L2 re-rank of the shortlist (bounded heap #2). The
    oracle replays Hamming SEMANTICALLY (count of sign disagreements —
    identical to bit_count of the packed xor) plus the same two ordered
    cuts, so the row is hash-exact end to end."""
    from pq_vector_spark.functions.quantize import binary_topk

    q = _qvec(spark, sf_dir, 0)
    return binary_topk(
        _emb(spark, sf_dir), "embedding", q, K, oversample=4,
        tie_break="vec_id",
    ).select("vec_id")


def _knn_filtered(spark, sf_dir):
    q = _qvec(spark, sf_dir, 0)
    return brute_force_topk(
        _emb(spark, sf_dir),
        "embedding",
        q,
        K,
        tie_break="vec_id",
        pre_filter=F.col("label") >= 2,
    ).select("vec_id")


def _knn_distance(spark, sf_dir):
    q = _qvec(spark, sf_dir, 0)
    out = brute_force_topk(
        _emb(spark, sf_dir), "embedding", q, K, tie_break="vec_id", keep_distance=True
    )
    return out.select("vec_id", F.round(F.col("_pq_distance"), 4).alias("distance"))


def _knn_quantized(spark, sf_dir):
    """Top-k by DEQUANTIZED int8 distance (functions/quantize.py): per-row
    asymmetric SQ8 codes, distance folded over dequantized values — the 4×
    storage/IO scale path; recall vs exact measured in bench scale.sq8."""
    from pq_vector_spark.functions.quantize import quantize_vectors, quantized_distance

    q = _qvec(spark, sf_dir, 0)
    qz = quantize_vectors(_emb(spark, sf_dir), "embedding")
    return (
        qz.select("vec_id", F.round(quantized_distance(q), 4).alias("qdist"))
        .orderBy(F.col("qdist").asc(), F.col("vec_id").asc())
        .limit(K)
    )


def _knn_pq(spark, sf_dir):
    """Two-stage PQ/ADC search (index/pq.py) in its exactness envelope: the
    re-rank candidate count covers the whole table, so the exact second
    stage reproduces brute-force top-k regardless of code quality — the PQ
    twin of knn_ivf_exact's nprobe=n_clusters gate. Realistic-rerank recall
    and ADC speedup are measured in bench ``scale.pq``."""
    from pq_vector_spark.index.pq import pq_topk, train_pq

    emb = _emb(spark, sf_dir)
    q = _qvec(spark, sf_dir, 0)
    n = emb.count()
    cb = train_pq(emb, "embedding", m=8, nbits=8, seed=42)
    return pq_topk(
        emb, "embedding", cb, q, K, rerank=-(-n // K), tie_break="vec_id"
    ).select("vec_id")


_PQ_CODES_CACHE: dict[str, str] = {}


def _codes_path(spark, sf_dir, codebook) -> str:
    """Codes sidecar table for the cached indexed layout (built once per
    sf_dir per process, like _indexed_path)."""
    import tempfile

    from pq_vector_spark.index.pq import encode_indexed

    cached = _PQ_CODES_CACHE.get(sf_dir)
    if cached and os.path.isdir(cached):
        return cached
    out = os.path.join(tempfile.mkdtemp(prefix="pq_entry_codes_"), "codes")
    encode_indexed(
        spark, _indexed_path(spark, sf_dir), out, "embedding", "vec_id", codebook
    )
    _PQ_CODES_CACHE[sf_dir] = out
    return out


def _knn_ivfpq(spark, sf_dir):
    """IVF-PQ composition (index/pq.py:ivfpq_topk) in its exactness
    envelope: nprobe = n_clusters and a re-rank covering the table, so the
    coarse prune + ADC stage + exact re-rank reproduce brute force. The
    production point (nprobe < n_clusters, small rerank: a doubly-pruned
    scan — cluster subset × m-byte codes) is measured in bench
    ``scale.ivfpq``."""
    from pq_vector_spark.index.pq import ivfpq_topk, train_pq

    emb = _emb(spark, sf_dir)
    q = _qvec(spark, sf_dir, 0)
    n = emb.count()
    cb = train_pq(emb, "embedding", m=8, nbits=8, seed=42)
    codes = _codes_path(spark, sf_dir, cb)
    return ivfpq_topk(
        spark,
        _indexed_path(spark, sf_dir),
        codes,
        "embedding",
        "vec_id",
        cb,
        q,
        K,
        nprobe=IVF_CLUSTERS,
        rerank=-(-n // K),
    ).select("vec_id")


def _knn_opq(spark, sf_dir):
    """OPQ — rotated PQ (r13, index/pq.py:train_opq/opq_rotation, Ge et
    al. 2013's parametric eigenvalue-allocation variant) — in the same
    exactness envelope as knn_pq: the re-rank covers the table, so the
    rotated-ADC shortlist + exact re-rank reproduce brute force exactly.
    What this row attests end-to-end: the rotation is actually applied on
    BOTH sides (encode rotates vectors, the LUT rotates the query — a
    one-sided rotation would wreck the shortlist and the envelope would
    still pass only by luck of rerank=n, so the test suite additionally
    pins shortlist quality on correlated data). Production-point recall
    is measured in bench ``scale.opq`` vs ``scale.pq``."""
    from pq_vector_spark.index.pq import pq_topk, train_opq

    emb = _emb(spark, sf_dir)
    q = _qvec(spark, sf_dir, 0)
    n = emb.count()
    cb = train_opq(emb, "embedding", m=8, nbits=8, seed=42)
    return pq_topk(
        emb, "embedding", cb, q, K, rerank=-(-n // K), tie_break="vec_id"
    ).select("vec_id")


def _knn_ivf_exact(spark, sf_dir):
    # nprobe = n_clusters ⇒ candidate set is ALL rows ⇒ exactly brute force
    # (reference guarantee via nprobe.min(n_clusters), src/ivf/index.rs:131)
    q = _qvec(spark, sf_dir, 0)
    return ivf_topk_adhoc(
        _emb(spark, sf_dir),
        "embedding",
        q,
        K,
        n_clusters=IVF_CLUSTERS,
        nprobe=IVF_CLUSTERS,
        tie_break="vec_id",
    ).select("vec_id")


def _knn_ivf_approx(spark, sf_dir):
    # approximate (nprobe < n_clusters) — recall-gated, not hash-gated;
    # nprobe=5 is the reference's session default (src/df_vector/options.rs:
    # 12-19). bench.py reports the achieved recall@10 next to this row's
    # no_oracle entry (approx_recall_at_10).
    q = _qvec(spark, sf_dir, 0)
    return ivf_topk_adhoc(
        _emb(spark, sf_dir),
        "embedding",
        q,
        K,
        n_clusters=IVF_CLUSTERS,
        nprobe=5,
        tie_break="vec_id",
    ).select("vec_id")


def _ann_cosine(spark, sf_dir):
    q = _qvec(spark, sf_dir, 1)
    emb = _emb(spark, sf_dir)
    scored = emb.withColumn("cosine", cosine_similarity("embedding", list(q)))
    return (
        scored.orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(K)
        .select("vec_id", F.round("cosine", 4).alias("cosine"))
    )


def _ann_dot(spark, sf_dir):
    """MIPS — maximum-inner-product top-k (r13 tail row): the retrieval
    metric for unnormalized / learned-magnitude embeddings
    (recommendation towers, DPR-style retrievers). Pure codegen dot fold
    (functions/distance.dot_product) + bounded-heap TakeOrderedAndProject;
    the batch form is multi_query_topk(metric='dot')."""
    from pq_vector_spark.functions.distance import dot_product

    q = _qvec(spark, sf_dir, 1)
    emb = _emb(spark, sf_dir)
    scored = emb.withColumn("dot", dot_product("embedding", list(q)))
    return (
        scored.orderBy(F.col("dot").desc(), F.col("vec_id").asc())
        .limit(K)
        .select("vec_id", F.round("dot", 4).alias("dot"))
    )


def _ann_cosine_ivf(spark, sf_dir):
    """Indexed cosine ANN via the batch kernel (metric='cosine') — probes
    all clusters ⇒ exactly the brute-force ann_cosine answer (same oracle
    row set)."""
    from pq_vector_spark.operators.similarity import ivf_multi_query_topk

    q = _qvec(spark, sf_dir, 1)
    out = ivf_multi_query_topk(
        spark,
        _indexed_path(spark, sf_dir),
        [(1, list(q))],
        K,
        id_col="vec_id",
        nprobe=IVF_CLUSTERS,
        metric="cosine",
    )
    return out.select("vec_id", F.round("score", 4).alias("cosine"))


def _similarity_join(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    out = similarity_join(queries, emb, "qid", "vec_id", "qv", "embedding", 3, metric="l2")
    return out.select("qid", "vec_id", F.round("score", 4).alias("score"), "rank")


def _knn_capped(spark, sf_dir):
    """The reference's COMBINED query shape — filter + candidate cap on the
    indexed path (≙ src/df_vector/tests.rs combined snapshot: 1407
    candidates / 1024 fetched). nprobe = n_clusters and cap ≥ table rows ⇒
    no candidate is dropped ⇒ exactly the filtered brute-force answer."""
    from pq_vector_spark.index.search import indexed_topk
    from pq_vector_spark.session import VectorTopKOptions

    q = _qvec(spark, sf_dir, 0)
    out = indexed_topk(
        spark,
        _indexed_path(spark, sf_dir),
        q,
        K,
        options=VectorTopKOptions(nprobe=IVF_CLUSTERS, max_candidates=100_000),
        pre_filter=F.col("label") >= 2,
        tie_break="vec_id",
    )
    return out.select("vec_id")


def _similarity_join_ivf(spark, sf_dir):
    """Distributed IVF-bucketed similarity join over the rewritten layout —
    probe assignment is a map-side pandas UDF over the query DataFrame (no
    driver collect). nprobe = n_clusters ⇒ every cluster probed ⇒ result is
    exactly the brute-force ``similarity_join`` (same oracle)."""
    from pq_vector_spark.operators.similarity import ivf_similarity_join

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    out = ivf_similarity_join(
        queries,
        _indexed_path(spark, sf_dir),
        spark,
        "qid",
        "qv",
        3,
        corpus_id="vec_id",
        nprobe=IVF_CLUSTERS,
    )
    return out.select("qid", "vec_id", F.round("score", 4).alias("score"), "rank")


def _knn_batch(spark, sf_dir):
    """Batch KNN — every literal query scored in ONE corpus pass
    (scores-array + posexplode + WindowGroupLimit top-k), the scale shape
    for multi-query search; brute-force-exact, so it shares the
    similarity_join oracle."""
    from pq_vector_spark.operators.similarity import multi_query_topk

    emb = _emb(spark, sf_dir)
    qrows = (
        emb.filter(F.col("vec_id") < 5).select("vec_id", "embedding").collect()
    )
    queries = [(int(r["vec_id"]), r["embedding"]) for r in qrows]
    out = multi_query_topk(emb, "embedding", queries, 3, id_col="vec_id")
    return out.select(
        F.col("qid").cast("bigint").alias("qid"),
        "vec_id",
        F.round("score", 4).alias("score"),
        "rank",
    )


def _knn_batch_ivf(spark, sf_dir):
    """IVF-accelerated batch KNN — probed-cluster scan pruning + one
    mapInPandas scoring pass (corpus crosses Arrow once, queries ride as a
    closure). nprobe = n_clusters ⇒ bit-identical to brute-force knn_batch
    (same oracle)."""
    from pq_vector_spark.operators.similarity import ivf_multi_query_topk

    emb = _emb(spark, sf_dir)
    qrows = (
        emb.filter(F.col("vec_id") < 5).select("vec_id", "embedding").collect()
    )
    queries = [(int(r["vec_id"]), r["embedding"]) for r in qrows]
    out = ivf_multi_query_topk(
        spark,
        _indexed_path(spark, sf_dir),
        queries,
        3,
        id_col="vec_id",
        nprobe=IVF_CLUSTERS,
    )
    return out.select(
        F.col("qid").cast("bigint").alias("qid"),
        "vec_id",
        F.round("score", 4).alias("score"),
        "rank",
    )


def _dedup_embedding_bucketed(spark, sf_dir):
    """IVF same-cluster blocked near-dup — the scale path for embedding
    dedup. nprobe = n_clusters ⇒ every pair co-clustered ⇒ exactly the
    all-pairs answer (correctness envelope; production uses nprobe ≪)."""
    emb = _emb(spark, sf_dir)
    out = D.embedding_near_dup_bucketed(
        emb,
        "embedding",
        "vec_id",
        threshold=0.42,
        n_clusters=IVF_CLUSTERS,
        nprobe=IVF_CLUSTERS,
    )
    return out.select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))


def _dedup_semantic(spark, sf_dir):
    """SemDeDup (r12, operators/dedup.py:semantic_dedup — Abbas et al.
    2023): k-means-blocked cosine groups keep one member each. Oracle
    variant runs the exactness envelope (nprobe = n_clusters ⇒ blocking
    is all-pairs) with the SQL-replayable min-id survivor; the
    centroid-cosine 'outlier'/'prototype' policies are pytest-attested
    (their scores depend on the engine-native seeded k-means sample)."""
    emb = _emb(spark, sf_dir)
    out = D.semantic_dedup(
        emb, "embedding", "vec_id", eps=0.58, n_clusters=IVF_CLUSTERS,
        nprobe=IVF_CLUSTERS, keep="min_id",
    )
    return out.select("vec_id", "canonical_id", "is_canonical").orderBy("vec_id")


def _rel_topk(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity") >= 30)
        .select("l_orderkey", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), F.col("l_orderkey").asc())
        .limit(100)
    )


def _rel_agg(spark, sf_dir):
    _utc(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 4).alias(
                "sum_disc_price"
            ),
            F.count(F.lit(1)).cast("bigint").alias("count_order"),
        )
    )


def _rel_join_agg(spark, sf_dir):
    cu = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        cu.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


def _rel_join_region(spark, sf_dir):
    cu = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region")
    return (
        re.filter(F.col("r_name") == "ASIA")
        .join(na, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(su, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(cu, F.col("c_nationkey") == F.col("s_nationkey"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_suppkey") == F.col("s_suppkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


def _rel_window(spark, sf_dir):
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 2)
        .select("o_custkey", "o_orderkey", "rnk")
    )


def _rel_join_part(spark, sf_dir):
    """Broadcast-dimension join: part is tiny → Spark broadcasts it, lineitem
    (the 100 TB side) never shuffles (TPC-H Q14/Q19 shape)."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(pt), F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("p_size") >= 30)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
    )


def _rel_semijoin(spark, sf_dir):
    """EXISTS semantics via left_semi — suppliers that shipped anything."""
    su = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        su.join(li, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


def _rel_conditional_agg(spark, sf_dir):
    """CASE-WHEN conditional aggregation (high/low-value order mix)."""
    orders = load_table(spark, sf_dir, "orders")
    hi = F.when(F.col("o_totalprice") > 200000, 1).otherwise(0)
    return orders.groupBy("o_orderstatus").agg(
        F.sum(hi).cast("bigint").alias("n_high"),
        F.sum(F.lit(1) - hi).cast("bigint").alias("n_low"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
    )


def _rel_antijoin(spark, sf_dir):
    cu = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cu.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey")


def _rel_distinct_count(spark, sf_dir):
    cu = load_table(spark, sf_dir, "customer")
    return cu.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").cast("bigint").alias("n_nations"),
        F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
    )


def _rel_moving_avg(spark, sf_dir):
    """Sliding-frame window aggregate (ROWS BETWEEN 2 PRECEDING AND
    CURRENT ROW): per-customer 3-order moving average of order totals."""
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    return od.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.avg("o_totalprice").over(w), 4).alias("avg_3"),
    )


def _rel_correlated(spark, sf_dir):
    """TPC-H Q17 shape (correlated scalar subquery): lineitems below 20% of
    their part's average quantity. Expressed decorrelated — per-part avg via
    groupBy then join — which is exactly Catalyst's rewrite of the
    correlated form; the brand filter prunes the probe side first."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    avg_qty = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_limit")
    )
    joined = (
        li.join(F.broadcast(pt), li["l_partkey"] == pt["p_partkey"])
        .join(avg_qty, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_limit"))
    )
    return joined.agg(
        F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"),
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
    )


def _rel_rollup(spark, sf_dir):
    """ROLLUP aggregation (grouping-sets surface): per (flag, status),
    per flag subtotals, and the grand total in one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
    )


def _rel_setops(spark, sf_dir):
    """Set operations: INTERSECT / EXCEPT / UNION ALL in one result —
    BUILDING-segment customers split by whether they placed an URGENT
    order."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    building = cu.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    urgent = od.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    both = building.intersect(urgent).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    ).select(F.lit("both").alias("tag"), "n")
    only_b = building.subtract(urgent).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    ).select(F.lit("only_building").alias("tag"), "n")
    return both.unionAll(only_b)


def _rel_skew_join(spark, sf_dir):
    """orders ⋈ customer via the EXPLICIT salted join (operators/skew.py):
    semantics identical to the plain equi-join — the oracle is the
    unsalted SQL — while the physical plan spreads any hot customer key
    across `salts` reducers."""
    from pq_vector_spark.operators.skew import salted_join

    ords = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    j = salted_join(ords, cust, "custkey", salts=8)
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 4).alias("total"),
    )


def _knn_appended(spark, sf_dir):
    """Index grown by append (half built, half appended, NO retrain) still
    answers exactly at nprobe = n_clusters — every appended row is
    reachable through the reused centroids (index/build.append_to_index)."""
    from pq_vector_spark.index.search import indexed_topk
    from pq_vector_spark.session import VectorTopKOptions

    q = _qvec(spark, sf_dir, 0)
    return indexed_topk(
        spark,
        _appended_path(spark, sf_dir),
        q,
        K,
        options=VectorTopKOptions(nprobe=IVF_CLUSTERS),
        tie_break="vec_id",
    ).select("vec_id")


def _knn_sql(spark, sf_dir):
    """The reference's canonical query as SQL TEXT through the vector-aware
    front-end (M4 surface, ≙ ctx.sql path src/df_vector/session.rs) — bracket
    vector literal and all (src/df_vector/tests.rs:76-81)."""
    from pq_vector_spark.plans.sql import pq_sql

    q = _qvec(spark, sf_dir, 0)
    _emb(spark, sf_dir).createOrReplaceTempView("embeddings")
    vec = ", ".join(repr(float(x)) for x in q)
    return pq_sql(
        spark,
        f"SELECT vec_id FROM embeddings "
        f"ORDER BY array_distance(embedding, [{vec}]) ASC, vec_id ASC LIMIT {K}",
    )


def _knn_auto(spark, sf_dir):
    """Automatic top-k PLAN interception: the query text is a CTE the
    textual matcher (plans/sql.py regex) cannot see, so the only way this
    can take the indexed path is the optimized-plan interceptor
    (plans/intercept.py ≙ reference physical rule src/df_vector/physical.rs:
    20-229). nprobe = n_clusters ⇒ candidate set is all rows ⇒ exact.
    The CollectMetrics assertion makes the row FAIL (not silently pass on
    the brute-force fallback) if interception stops firing."""
    from pyspark.sql import Observation

    from pq_vector_spark.plans.sql import pq_sql, register_indexed_table
    from pq_vector_spark.session import VectorTopKOptions

    path = _indexed_path(spark, sf_dir)
    register_indexed_table(spark, "emb_auto", path)
    q = _qvec(spark, sf_dir, 0)
    vec = ", ".join(repr(float(x)) for x in q)
    sql = (
        "WITH c AS (SELECT vec_id, embedding FROM emb_auto WHERE vec_id >= 0) "
        f"SELECT vec_id FROM c "
        f"ORDER BY array_distance(embedding, array({vec})), vec_id LIMIT {K}"
    )
    obs = Observation()
    out = pq_sql(
        spark, sql, options=VectorTopKOptions(nprobe=IVF_CLUSTERS), observation=obs
    )
    # only the indexed path attaches observed metrics — proof the probe fired
    assert "CollectMetrics" in out._jdf.queryExecution().optimizedPlan().toString(), (
        "knn_auto: plan interception did not fire"
    )
    return out


def _knn_auto_cosine(spark, sf_dir):
    """Plan interception for the EXTENSION metric: ORDER BY
    cosine_similarity(...) DESC over a registered indexed table routes to
    the IVF cosine path (index/search.py metric='cosine'). CTE text again
    so only the optimized-plan matcher can fire; nprobe = n_clusters ⇒
    exact (all clusters probed)."""
    from pyspark.sql import Observation

    from pq_vector_spark.plans.sql import pq_sql, register_indexed_table
    from pq_vector_spark.session import VectorTopKOptions

    path = _indexed_path(spark, sf_dir)
    register_indexed_table(spark, "emb_auto", path)
    q = _qvec(spark, sf_dir, 1)
    vec = ", ".join(repr(float(x)) for x in q)
    sql = (
        "WITH c AS (SELECT vec_id, embedding FROM emb_auto) "
        f"SELECT vec_id FROM c "
        f"ORDER BY cosine_similarity(embedding, array({vec})) DESC, vec_id LIMIT {K}"
    )
    obs = Observation()
    out = pq_sql(
        spark, sql, options=VectorTopKOptions(nprobe=IVF_CLUSTERS), observation=obs
    )
    assert "CollectMetrics" in out._jdf.queryExecution().optimizedPlan().toString(), (
        "knn_auto_cosine: plan interception did not fire"
    )
    return out


def _knn_auto_pq(spark, sf_dir):
    """Automatic IVF-PQ interception: with a PQ codes sidecar registered
    for the indexed layout, the SAME CTE query knn_auto runs is routed
    through the doubly-pruned IVF-PQ plan (cluster prune × m-byte ADC scan
    × exact re-rank) with no query change — the engine picks the cheapest
    plan, ≙ the reference's physical rule being its SQL users' only entry
    point (src/df_vector/physical.rs:20-229). nprobe = n_clusters engages
    the STRUCTURAL exactness envelope (plans/intercept.py bumps rerank to
    cover the candidate set), so the answer equals brute force. The plan
    asserts prove both that interception fired (CollectMetrics) and that
    the codes table — not the raw IVF probe — was scanned (pq_codes)."""
    from pyspark.sql import Observation

    from pq_vector_spark.index.pq import train_pq
    from pq_vector_spark.plans.intercept import (
        register_codes_sidecar,
        unregister_codes_sidecar,
    )
    from pq_vector_spark.plans.sql import pq_sql, register_indexed_table
    from pq_vector_spark.session import VectorTopKOptions

    path = _indexed_path(spark, sf_dir)
    cb = train_pq(_emb(spark, sf_dir), "embedding", m=8, nbits=8, seed=42)
    codes = _codes_path(spark, sf_dir, cb)
    register_indexed_table(spark, "emb_auto_pq", path)
    register_codes_sidecar(path, codes, cb, id_col="vec_id")
    try:
        q = _qvec(spark, sf_dir, 0)
        vec = ", ".join(repr(float(x)) for x in q)
        sql = (
            "WITH c AS (SELECT vec_id, embedding FROM emb_auto_pq) "
            f"SELECT vec_id FROM c "
            f"ORDER BY array_distance(embedding, array({vec})), vec_id LIMIT {K}"
        )
        obs = Observation()
        out = pq_sql(
            spark, sql, options=VectorTopKOptions(nprobe=IVF_CLUSTERS), observation=obs
        )
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "CollectMetrics" in plan, "knn_auto_pq: plan interception did not fire"
        assert "pq_codes" in plan, "knn_auto_pq: codes sidecar route did not fire"
        return out
    finally:
        # never leave the sidecar registered for other queries in this
        # process (knn_auto must keep exercising the raw IVF route); the
        # returned DataFrame's plan is already built and unaffected
        unregister_codes_sidecar(path)


def _knn_auto_pq_fresh(spark, sf_dir):
    """Discovery-from-storage, driver-attested end-to-end (r9 order #6):
    the reference finds its index in the FILE itself (footer KV,
    /root/reference/src/ivf/parquet.rs:108-148) — any later process,
    handed only the on-disk layout, gets the indexed plan. Our parity:
    ``register_codes_sidecar`` persists the registration into
    ``_pq_index/`` (codes.json + codebook npz); here the in-memory caches
    are then CLEARED (≙ process restart — the querying "session" never
    registers anything) and the SAME CTE query must still route through
    the doubly-pruned IVF-PQ plan, auto-loaded from disk, with exactly the
    brute-force answer (nprobe = n_clusters exactness envelope)."""
    from pyspark.sql import Observation

    from pq_vector_spark.index.pq import train_pq
    from pq_vector_spark.plans import intercept as _icpt
    from pq_vector_spark.plans.sql import pq_sql, register_indexed_table
    from pq_vector_spark.session import VectorTopKOptions

    path = _indexed_path(spark, sf_dir)
    cb = train_pq(_emb(spark, sf_dir), "embedding", m=8, nbits=8, seed=42)
    codes = _codes_path(spark, sf_dir, cb)
    register_indexed_table(spark, "emb_auto_pq_fresh", path)
    _icpt.register_codes_sidecar(path, codes, cb, id_col="vec_id")
    try:
        # ≙ restart: only the on-disk _pq_index/ registration remains
        # (the centroid/sidecar cache goes too — r11 added it)
        from pq_vector_spark.index import search as _srch

        _icpt._CODES_SIDECARS.clear()
        _icpt._CODES_SIDECAR_MISSES.clear()
        _srch._SIDECAR_CACHE.clear()
        q = _qvec(spark, sf_dir, 0)
        vec = ", ".join(repr(float(x)) for x in q)
        sql = (
            "WITH c AS (SELECT vec_id, embedding FROM emb_auto_pq_fresh) "
            f"SELECT vec_id FROM c "
            f"ORDER BY array_distance(embedding, array({vec})), vec_id LIMIT {K}"
        )
        obs = Observation()
        out = pq_sql(
            spark, sql, options=VectorTopKOptions(nprobe=IVF_CLUSTERS), observation=obs
        )
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "CollectMetrics" in plan, (
            "knn_auto_pq_fresh: plan interception did not fire"
        )
        assert "pq_codes" in plan, (
            "knn_auto_pq_fresh: codes route was not discovered from storage"
        )
        return out
    finally:
        _icpt.unregister_codes_sidecar(path)


def _knn_auto_distance(spark, sf_dir):
    """Plan interception for the PROJECTED-DISTANCE shape (r8 extension):
    ``SELECT vec_id, array_distance(...) AS d … ORDER BY d`` sorts by a
    bare attribute whose defining Alias lives under the Sort — the
    interceptor resolves it through the Project and the replacement emits
    the bit-equal distance column. Rounding happens OUTSIDE the
    intercepted query (a round() inside the projection is, correctly, a
    decline shape), mirroring how knn_distance's API twin rounds."""
    from pyspark.sql import Observation

    from pq_vector_spark.plans.sql import pq_sql, register_indexed_table
    from pq_vector_spark.session import VectorTopKOptions

    path = _indexed_path(spark, sf_dir)
    register_indexed_table(spark, "emb_auto_d", path)
    q = _qvec(spark, sf_dir, 0)
    vec = ", ".join(repr(float(x)) for x in q)
    sql = (
        "WITH c AS (SELECT vec_id, embedding FROM emb_auto_d) "
        f"SELECT vec_id, array_distance(embedding, array({vec})) AS d "
        f"FROM c ORDER BY d, vec_id LIMIT {K}"
    )
    obs = Observation()
    out = pq_sql(
        spark, sql, options=VectorTopKOptions(nprobe=IVF_CLUSTERS), observation=obs
    )
    assert "CollectMetrics" in out._jdf.queryExecution().optimizedPlan().toString(), (
        "knn_auto_distance: plan interception did not fire"
    )
    return out.select("vec_id", F.round(F.col("d"), 4).alias("distance"))


def _events_stream_windowed(spark, sf_dir):
    """True Structured Streaming run (readStream → watermark → window →
    memory sink, availableNow trigger) over the same events table; must
    produce exactly the batch answer."""
    from pq_vector_spark.sources.parquet import load_stream
    from pq_vector_spark.streaming.events import streaming_tumbling_agg

    _utc(spark)
    stream = load_stream(spark, sf_dir, "events")
    out = streaming_tumbling_agg(stream, "ts", "event_type", "value", "1 hour")
    qname = "pq_stream_windowed"
    q = (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(qname)


def _events_windowed(spark, sf_dir):
    _utc(spark)
    ev = load_table(spark, sf_dir, "events")
    return tumbling_agg(ev, "ts", "event_type", "value", "1 hour")


def _events_stream_sessions(spark, sf_dir):
    """Streaming sessionization via the built-in session_window (gap-merge
    state); memory sink, availableNow. Sessions break when the inter-event
    gap is ≥ the 30-minute window (end-exclusive merge)."""
    from pq_vector_spark.sources.parquet import load_stream
    from pq_vector_spark.streaming.events import streaming_sessionize

    _utc(spark)
    stream = load_stream(spark, sf_dir, "events")
    out = streaming_sessionize(stream, "ts", "user_id", gap_minutes=30)
    qname = "pq_stream_sessions"
    q = (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(qname)


def _events_sessions(spark, sf_dir):
    _utc(spark)
    ev = load_table(spark, sf_dir, "events")
    return sessionize(ev, "ts", "user_id", gap_minutes=30)


def _events_stream_dedup(spark, sf_dir):
    """True streaming dedup (readStream → dropDuplicates key state → memory
    sink, availableNow): the distinct (user_id, event_type) key set must
    equal batch DISTINCT. Production path bounds state with
    dropDuplicatesWithinWatermark (streaming_dedup(within_watermark=...))."""
    from pq_vector_spark.sources.parquet import load_stream
    from pq_vector_spark.streaming.events import streaming_dedup

    _utc(spark)
    stream = load_stream(spark, sf_dir, "events")
    out = streaming_dedup(stream, ["user_id", "event_type"]).select(
        "user_id", "event_type"
    )
    qname = "pq_stream_dedup"
    q = (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(qname)


def _events_stream_stats(spark, sf_dir):
    """Custom stateful streaming operator (applyInPandasWithState):
    incrementally-maintained per-user stats; the latest emit per key must
    equal the batch aggregation. fsum-based accumulation makes the total
    arrival-order-independent."""
    from pq_vector_spark.sources.parquet import load_stream
    from pq_vector_spark.streaming.stateful import streaming_user_stats

    _utc(spark)
    stream = load_stream(spark, sf_dir, "events")
    out = streaming_user_stats(stream)
    qname = "pq_stream_stats"
    q = (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    latest = (
        spark.table(qname)
        .withColumn(
            "_rn",
            F.row_number().over(
                W.partitionBy("user_id").orderBy(F.col("n_events").desc())
            ),
        )
        .filter(F.col("_rn") == 1)
    )
    return latest.select(
        "user_id",
        "n_events",
        F.round("sum_value", 2).alias("sum_value"),
        "first_ts",
        "last_ts",
    )


def _events_props(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = extract_prop(ev, "k", "k")
    return out.filter(F.col("k") >= 50).select("event_id", "k")


def _events_asof(spark, sf_dir):
    """Point-in-time enrichment: every non-purchase event carries the value
    of the user's MOST RECENT purchase at-or-before its timestamp
    (operators/asof.py union-window as-of join; DuckDB's native ASOF LEFT
    JOIN is the oracle)."""
    from pq_vector_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.round("value", 2).alias("last_purchase_value")
    )
    out = asof_join(
        left, right, on="ts", by="user_id", value_cols=["last_purchase_value"]
    )
    return out.select("event_id", "last_purchase_value")


def _events_range_join(spark, sf_dir):
    """Sliding-window attribution: per purchase, how many view/click events
    the same user produced in the strictly-preceding 24 h — the banded
    range join (operators/rangejoin.py) whose (key, time-bucket) shuffle
    spreads hot users instead of cross-producting them."""
    from pq_vector_spark.operators.rangejoin import range_join

    _utc(spark)
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    prior = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id", F.col("ts").alias("ts2"), F.col("event_id").alias("prior_id")
    )
    j = range_join(
        purchases, prior, "user_id", "ts", "ts2", -86400.0, 0.0, how="left"
    )
    return (
        j.groupBy("event_id")
        .agg(F.count("prior_id").cast("bigint").alias("n_prior"))
        .orderBy("event_id")
    )


def _events_range_join_left(spark, sf_dir):
    """LEFT-mode banded range join (r7 eqNullSafe regression row): the left
    side carries a NULLABLE payload column, so a column-list anti-join in
    the null-padding branch would fail NULL <> NULL and emit matched rows
    TWICE (operators/rangejoin.py:95-118). Output is the un-aggregated pair
    list — any duplicated left row changes the row count vs the oracle's
    plain LEFT JOIN."""
    from pq_vector_spark.operators.rangejoin import range_join

    _utc(spark)
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("value") > 50, F.round("value", 2)).alias("big_val"),
    )
    prior = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("ts2"), F.col("event_id").alias("prior_id")
    )
    j = range_join(
        purchases, prior, "user_id", "ts", "ts2", -3600.0, 0.0, how="left"
    )
    return j.select("event_id", "big_val", "prior_id").orderBy(
        "event_id", "prior_id"
    )


_ZORD_CACHE: dict[str, str] = {}


def _layout_zorder(spark, sf_dir):
    """Z-order clustered rewrite (sources/layout.py): lineitem re-laid-out
    on the Morton interleave of (l_quantity, l_extendedprice), then a
    2-D box query over the rewritten copy — proves the rewrite is
    content-preserving (oracle runs on the ORIGINAL files) while the
    pruning advantage is asserted in tests/test_layout.py row-group
    stats."""
    import tempfile

    from pq_vector_spark.sources.layout import zorder_write

    out = _ZORD_CACHE.get(sf_dir)
    if not (out and os.path.isdir(out)):
        li = load_table(spark, sf_dir, "lineitem")
        out = os.path.join(tempfile.mkdtemp(prefix="pq_zorder_"), "lineitem_z")
        zorder_write(
            li, ["l_quantity", "l_extendedprice"], out, bits=10, num_files=4
        )
        _ZORD_CACHE[sf_dir] = out
    back = spark.read.parquet(out)
    return (
        back.filter(
            F.col("l_quantity").between(10, 20)
            & F.col("l_extendedprice").between(10000, 30000)
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
        .orderBy("l_returnflag")
    )


def _events_funnel(spark, sf_dir):
    """Ordered view→click→purchase funnel (operators/funnel.py): one
    user-keyed shuffle + a native array_sort/aggregate fold per user; the
    oracle is the equivalent iterated greedy min-ts construction."""
    from pq_vector_spark.operators.funnel import funnel_counts

    _utc(spark)
    ev = load_table(spark, sf_dir, "events")
    return funnel_counts(
        ev, "user_id", "event_type", "ts", ["view", "click", "purchase"]
    )


def _enriched_rollup(events, spark, sf_dir):
    """events ⟕ customer ⟕ nation (both dims broadcast) → per-nation event
    counts + 2-decimal value totals. Shared by the batch and streaming
    twins so both compute the identical plan above the source."""
    from pq_vector_spark.streaming.events import enrich_join

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = enrich_join(
        enrich_join(events, cust, "user_id", "c_custkey"),
        nat,
        "c_nationkey",
        "n_nationkey",
    )
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


def _events_enriched(spark, sf_dir):
    """Batch form of the stream-static enrichment rollup."""
    return _enriched_rollup(load_table(spark, sf_dir, "events"), spark, sf_dir)


def _events_stream_enriched(spark, sf_dir):
    """True stream-static join run: readStream events ⟕ broadcast static
    dims → complete-mode aggregation into a memory sink. Must equal the
    batch twin exactly."""
    from pq_vector_spark.sources.parquet import load_stream

    _utc(spark)
    stream = load_stream(spark, sf_dir, "events")
    out = _enriched_rollup(stream, spark, sf_dir)
    qname = "pq_stream_enriched"
    q = (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(qname)


def _events_stream_join(spark, sf_dir):
    """True stream-stream inner join run: purchases × same-user clicks in
    the strictly-preceding 24 h, both sides watermarked branches of ONE
    readStream source, time-range condition bounding join state
    (streaming/events.py stream_stream_window_join) → append-mode memory
    sink. Hash-checked against the plain SQL join."""
    from pq_vector_spark.sources.parquet import load_stream
    from pq_vector_spark.streaming.events import stream_stream_window_join

    _utc(spark)
    stream = load_stream(spark, sf_dir, "events")
    out = stream_stream_window_join(stream)
    qname = "pq_stream_join"
    q = (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(qname)


def _scd_tier_dim(spark, sf_dir, ts_type):
    """Deterministic slowly-changing dimension derived from ``nation``:
    three tier versions per nation, effective 2024-01-01 / -11 / -21
    (events span 2024-01; every event therefore has exactly one effective
    version). Recomputable in pure SQL → oracle-checkable."""
    nat = load_table(spark, sf_dir, "nation")
    versions = F.array(
        *[
            F.struct(
                F.lit(v).alias("v"),
                F.lit(f"2024-01-{d:02d} 00:00:00").cast(ts_type).alias("eff"),
            )
            for v, d in ((1, 1), (2, 11), (3, 21))
        ]
    )
    return nat.select(
        F.col("n_nationkey").alias("c_nationkey"),
        "n_name",
        F.explode(versions).alias("_v"),
    ).select(
        "c_nationkey",
        F.concat(F.col("n_name"), F.lit("#"), F.col("_v.v").cast("string")).alias(
            "tier"
        ),
        F.col("_v.eff").alias("eff_ts"),
    )


def _events_scd_enriched(spark, sf_dir):
    """Slowly-changing-dimension enrichment (batch asof twin): each event
    joins the nation-tier version effective AT ITS TIMESTAMP via the
    union-window as-of join, then rolls up per tier. The streaming form
    (`streaming/events.py:scd_enrich`, broadcast interval join — stream
    never shuffles) computes identical results; tests assert the twins
    agree, the oracle checks this batch twin against DuckDB ASOF JOIN."""
    from pq_vector_spark.operators.asof import asof_join
    from pq_vector_spark.streaming.events import enrich_join

    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    keyed = enrich_join(ev, cust, "user_id", "c_custkey").select(
        "event_id", "ts", "value", "c_nationkey"
    )
    dim = _scd_tier_dim(spark, sf_dir, dict(ev.dtypes)["ts"]).withColumnRenamed(
        "eff_ts", "ts"
    )
    # nation-keyed as-of is the canonical HOT-KEY shape (25 keys carry the
    # whole event stream), so the attested row rides the bucketed variant:
    # per-(nation, day) partitions with compact carry-in — identical
    # results, parallel within each nation
    joined = asof_join(
        keyed, dim, on="ts", by="c_nationkey", value_cols=["tier"], bucket="1 day"
    )
    return joined.groupBy("tier").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


def _text_gopher(spark, sf_dir):
    """Gopher rule filters (r12, functions/text.py:gopher_quality_flags —
    Rae et al. 2021 §A1.1): word-count / mean-word-length / symbol /
    bullet / ellipsis / alphabetic / stop-word rules as one struct of
    booleans, all native expressions in whole-stage codegen. The oracle
    replays every rule in ANSI SQL — each ratio is the same int-derived
    double division on both engines, so the flags match bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    # r16: sort BEFORE the flag projection — orderBy's range partitioner
    # samples its child, so sorting after the flags evaluated the whole
    # rule struct twice (once for the sample, once for real) and the
    # pre-sort projection ran at the scan's task width; sorted-first, the
    # sampler reads only (doc_id, text) and the flags run once, spread
    # over the sort's partitions. Same rows, same final order.
    return (
        docs.select("doc_id", "text")
        .orderBy("doc_id")
        .select("doc_id", T.gopher_quality_flags("text").alias("g"))
        .select("doc_id", "g.*")
    )


def _text_c4(spark, sf_dir):
    """C4 cleaning rules (r13, functions/text.py:c4_line_filters —
    Raffel et al. 2020 §2.2): line-level filtering (terminal punctuation,
    ≥5 words, no 'javascript') + page-level flags (≥3 sentence enders on
    the cleaned text, no 'lorem ipsum', no '{'), one codegen pass. The
    cleaned text rides as md5 (the pipeline_curate convention — compact,
    hashable, still pins every surviving byte); the oracle replays every
    rule in ANSI SQL. The corpus text is single-line and unpunctuated, so
    the frame is deterministically AUGMENTED (the text_pii convention)
    into multi-line pages where every rule fires on a doc_id-keyed
    subset: a kept long sentence, a too-short line, a javascript line,
    extra sentences on doc_id%3, lorem ipsum on %5, a brace on %7."""
    docs = load_table(spark, sf_dir, "documents")
    nl = F.lit("\n")
    aug = F.concat(
        F.col("text"), F.lit("."),
        nl, F.lit("short line."),
        nl, F.lit("this line mentions javascript and still has many words."),
        nl,
        F.when(
            F.col("doc_id") % 3 == 0,
            F.lit(
                "Another full sentence with plenty of words to keep! "
                "And a third complete sentence right here to pass?"
            ),
        ).otherwise(F.lit("no terminal punct line with many words here")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(nl, F.lit("lorem ipsum dolor sit amet today.")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(nl, F.lit("some code { with braces } and words.")),
        ).otherwise(F.lit("")),
    )
    # r16: sort before the rule projection (same rationale as
    # _text_gopher — the range sampler otherwise evaluates the whole
    # augmented-line filter struct a second time)
    return (
        docs.select("doc_id", "text")
        .orderBy("doc_id")
        .select("doc_id", T.c4_line_filters(aug).alias("c"))
        .select(
            "doc_id",
            F.md5(F.col("c.text_clean")).alias("clean_md5"),
            "c.n_lines",
            "c.n_kept",
            "c.sentences",
            "c.sentences_ok",
            "c.no_lorem_ipsum",
            "c.no_curly_brace",
            "c.passes",
        )
    )


def _quality_classifier(spark, sf_dir):
    """Trained model-based quality filter (r13,
    operators/classifier.py — the CCNet/fastText role, Wenzek et al.
    2020): a diagonal-covariance Fisher LDA over 6 native text features,
    fit CLOSED-FORM by one aggregation (per-class counts + per-feature
    rounded sums/sums-of-squares) with ``lang = 'en'`` as the weak
    positive label, then scored as a pure-codegen literal-weight linear
    expression. The oracle replays the ENTIRE fit in SQL — features,
    class aggregates, pooled-variance weights, bias, and the final
    rounded score — bit-for-bit (every derived quantity is IEEE-754
    double arithmetic from identical rounded inputs, the
    operators/dsir.py stance)."""
    from pq_vector_spark.operators.classifier import (
        classify_quality,
        fit_lda_quality,
    )

    docs = load_table(spark, sf_dir, "documents")
    model = fit_lda_quality(docs, "text", F.col("lang") == "en")
    # r16: sort before scoring (the _text_gopher rationale — the range
    # sampler otherwise evaluates the scoring projection a second time,
    # and the score then runs across the sort's partitions)
    return (
        classify_quality(
            docs.select("doc_id", "text").orderBy("doc_id"), "text", model
        )
        .select("doc_id", "quality_lr_score", "quality_lr_pred")
    )


def _text_dup_spans(spark, sf_dir):
    """Duplicate-line repetition fractions (r12, functions/text.py:
    duplicate_span_stats — the Gopher repetition suite's line/paragraph
    half): per-doc fraction of spans (and of their characters) belonging
    to a value occurring more than once. Spans md5-compress before the
    (doc, span) exchange; the oracle groups the raw spans — same counts,
    same int-derived double ratios."""
    docs = load_table(spark, sf_dir, "documents")
    return T.duplicate_span_stats(docs, "text", "doc_id").orderBy("doc_id")


def _text_stats(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.char_count("text").alias("chars"),
        T.token_count("text").alias("n_tokens"),
    )


def _text_quality(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.round(T.stopword_ratio("text"), 4).alias("stopword_ratio"),
        F.round(T.punct_ratio("text"), 4).alias("punct_ratio"),
        F.round(T.quality_score("text"), 4).alias("quality"),
    )


def _text_lang(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.lang_guess("text").alias("lang_guess"))


def _text_fingerprint(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.fingerprint("text").alias("fingerprint"))


def _text_quantiles(spark, sf_dir):
    """Exact length-distribution quantiles (percentile_cont semantics)."""
    from pq_vector_spark.functions.text import length_quantiles

    docs = load_table(spark, sf_dir, "documents")
    return length_quantiles(docs, "text")


def _text_doc_freq(spark, sf_dir):
    """Top-20 3-gram document frequencies (IDF-table / boilerplate stat)."""
    from pq_vector_spark.functions.text import ngram_doc_frequency

    docs = load_table(spark, sf_dir, "documents")
    return ngram_doc_frequency(docs, "text", n=3, top=20)


def _dedup_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return D.exact_dedup(docs, "text", "doc_id")


def _dedup_jaccard(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = D.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.6)
    return out.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


def _dedup_resolve(spark, sf_dir):
    """End-to-end dedup resolution: 3-gram-jaccard near-dup pairs →
    connected components (min-label propagation + pointer jumping, a
    driver-loop of joins like Lloyd iterations) → canonical id per doc.
    The oracle computes the same components with a recursive CTE."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.6)
    out = D.resolve_duplicates(docs, pairs, "doc_id")
    return out.select("doc_id", "canonical_id", "is_canonical")


def _split_leakage(spark, sf_dir):
    """Leakage-safe train/holdout split (r13,
    operators/sampling.leakage_safe_split): near-dup components (3-gram
    jaccard pairs → connected components) are hashed by their CANONICAL
    id, so a duplicate cluster lands whole on one side and no sibling of
    a holdout doc contaminates train. The oracle replays the recursive-
    CTE components AND the salted-md5 bucket split end-to-end."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.6)
    from pq_vector_spark.operators.sampling import leakage_safe_split

    out = leakage_safe_split(docs, "doc_id", pairs, holdout=0.1, salt="split")
    return out.select("doc_id", "canonical_id", "split").orderBy("doc_id")


def _dedup_resolve_best(spark, sf_dir):
    """Quality-keyed dedup resolution (r10 extension of
    operators/dedup.resolve_duplicates): same near-dup components, but the
    survivor is the LONGEST member (max n_chars, ties to smallest id) —
    "keep the best copy" instead of keep-smallest-id. The oracle replays
    the election with a window over the recursive-CTE components."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.6)
    out = D.resolve_duplicates(
        docs, pairs, "doc_id", prefer_col="n_chars", prefer="max"
    )
    return out.select("doc_id", "canonical_id", "is_canonical")


def _dedup_minhash(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = D.minhash_lsh_pairs(
        docs, "text", "doc_id", n=3, num_hashes=32, bands=8, threshold=0.6
    )
    return out.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


def _text_tfidf(spark, sf_dir):
    """Per-doc top-3 TF-IDF terms (sklearn-style smooth idf) — keyword
    extraction over the documents table; see functions/text.py."""
    docs = load_table(spark, sf_dir, "documents")
    return T.tfidf_top_terms(docs, "text", "doc_id", top=3)


def _text_repetition(spark, sf_dir):
    """Gopher-style repetition filters (duplicate-2-gram fraction + top
    2-gram fraction) over the documents table; see functions/text.py."""
    docs = load_table(spark, sf_dir, "documents")
    return T.repetition_ratios(docs, "text", "doc_id", n=2)


def _text_tokens_bpe(spark, sf_dir):
    """BPE-ish token counts (functions/text.py:bpe_token_count) next to the
    whitespace count — the LLM-token sizing signal a pipeline reports per
    document before budgeting a training run."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count("text").alias("n_ws_tokens"),
        T.bpe_token_count("text").alias("n_bpe_tokens"),
    )


def _text_logprob(spark, sf_dir):
    """Per-doc mean unigram log-probability under the corpus's smoothed
    MLE (functions/text.py:unigram_logprob) — the cheap LM quality /
    gibberish-filter signal."""
    docs = load_table(spark, sf_dir, "documents")
    return T.unigram_logprob(docs, "text", "doc_id")


def _text_winnow(spark, sf_dir):
    """MOSS winnowing fingerprints (k=3-gram rolling hashes, window w=4):
    the localizing overlap-detection sketch; see
    functions/text.py:winnow_fingerprints."""
    docs = load_table(spark, sf_dir, "documents")
    return T.winnow_fingerprints(docs, "text", "doc_id", k=3, w=4)


def _dedup_winnow_overlap(spark, sf_dir):
    """Exact-substring overlap pairs (r11, operators/dedup.py:
    winnow_overlap_pairs): document pairs sharing >= 2 MOSS winnow
    fingerprints — each shared fingerprint witnesses a common run of
    >= k + w - 1 tokens, localizing copied passages whole-document
    Jaccard/MinHash dilute away. One 8-byte fingerprint equi-join with
    map-side-combined pair counts; the oracle replays the winnowing and
    the join bit-for-bit."""
    from pq_vector_spark.operators.dedup import winnow_overlap_pairs

    docs = load_table(spark, sf_dir, "documents")
    out = winnow_overlap_pairs(docs, "text", "doc_id", k=3, w=4, min_shared=2)
    return out.orderBy("id_a", "id_b")


def _pii_aug(docs):
    """Documents carry no real PII, so the scrub must be proven against
    DETERMINISTIC synthetic PII: append an email + URL derived from doc_id
    (identically reconstructable in the oracle's SQL)."""
    return F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com via https://ex.example/p/"),
        F.col("doc_id").cast("string"),
    )


def _text_pii(spark, sf_dir):
    """PII redaction + audit counts (functions/text.py:pii_scrub) — pure
    regexp_replace chain, whole-stage codegen, zero shuffle at any scale.
    Output hashes the scrubbed text (md5) so the oracle compare stays
    row-sized. Phone scrubbing exists too but is pytest-golden-verified
    only (Java/RE2 greedy-digit-run semantics are not bit-contractual)."""
    docs = load_table(spark, sf_dir, "documents")
    aug = _pii_aug(docs)
    return docs.select(
        "doc_id",
        F.md5(T.pii_scrub(aug, kinds=("email", "url"))).alias("scrub_md5"),
        T.pii_count(aug, "email").alias("n_emails"),
        T.pii_count(aug, "url").alias("n_urls"),
    )


def _sample_temperature(spark, sf_dir):
    """Temperature-rebalanced language mixture (operators/sampling.py:
    temperature_mix, the mBERT/T5/LLaMA data-mixing recipe): target
    composition q_i ∝ n_i^0.5 flattens the 'en' head; the rarest language
    keeps rate 1.0 (downsample-only). One bounded count aggregation, then
    the same portable md5-bucket filter as hash_sample — the oracle
    re-derives the per-language thresholds from its own counts."""
    from pq_vector_spark.operators.sampling import temperature_mix

    docs = load_table(spark, sf_dir, "documents")
    return (
        temperature_mix(docs, "lang", "doc_id", alpha=0.5, salt="temp")
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


# budget for select_token_budget at the oracle sf (sf0.01 total n_chars =
# 149,174 — the cut lands mid-corpus so both the keep-whole-bucket path and
# the exact crossing-bucket window are exercised)
CHAR_BUDGET = 60_000


def _sample_budget(spark, sf_dir):
    """Token-budget curation (operators/sampling.py:select_token_budget):
    fill a 60k-char budget with the highest-quality documents — greedy
    prefix in (quality desc, doc_id) order, computed as a bucketed
    histogram + driver prefix sum + exact window over ONLY the crossing
    bucket (never a global single-partition cumulative sum)."""
    from pq_vector_spark.functions import text as T
    from pq_vector_spark.operators.sampling import select_token_budget

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.withColumn("quality", F.round(T.quality_score("text"), 4))
    out = select_token_budget(
        scored, "doc_id", "quality", "n_chars", CHAR_BUDGET, buckets=64
    )
    return out.select(
        "doc_id", "quality", F.col("n_chars").cast("bigint").alias("chars")
    ).orderBy("doc_id")


GROUP_CHAR_BUDGETS = {"en": 30_000}  # other langs fall to the default
GROUP_DEFAULT_BUDGET = 12_000


def _sample_budget_grouped(spark, sf_dir):
    """Per-group token-budget curation (r10 extension,
    operators/sampling.py:select_token_budget_grouped): each language
    fills its OWN char budget with its highest-quality documents — the
    "2B tokens of code, 500M of math" mixture spec. One bounded
    per-(group, bucket) histogram, a per-group driver prefix walk, one
    group-partitioned window over only the crossing buckets, and a
    broadcast plan-table filter on the single wide-corpus pass."""
    from pq_vector_spark.functions import text as T
    from pq_vector_spark.operators.sampling import select_token_budget_grouped

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.withColumn("quality", F.round(T.quality_score("text"), 4))
    # window_cap=12 drives the heavy-group AUTO-REFINEMENT path (r10): at
    # the driver's sf0.01 gate the largest crossing buckets hold ~15 rows,
    # so this cap makes real groups leave the shared-window plan for the
    # recursive walk — the oracle's per-group window proves the refined
    # plan stays bit-equal to the naive greedy (at 100 TB the cap would be
    # ~64k; it is a latency/plan-size knob, never a correctness one)
    out = select_token_budget_grouped(
        scored, "lang", "doc_id", "quality", "n_chars",
        GROUP_CHAR_BUDGETS, buckets=32, default_budget=GROUP_DEFAULT_BUDGET,
        window_cap=12,
    )
    return out.select(
        "doc_id", "lang", "quality",
        F.col("n_chars").cast("bigint").alias("chars"),
    ).orderBy("doc_id")


# total char budget the temperature water-filling splits per language at
# the oracle sf (no language's share caps at its own supply there, so the
# single-round floors + largest-remainder arithmetic is SQL-replayable)
TEMP_CHAR_BUDGET = 60_000


def _sample_budget_temperature(spark, sf_dir):
    """Temperature-DERIVED grouped token budgets (r11 extension,
    operators/sampling.py:temperature_token_budgets, r12
    largest-remainder shares) composed with the grouped selector: one
    bounded per-language char-supply aggregation feeds the driver-pure
    water-filling (share_i ∝ supply_i^0.5, integer floors + bonuses by
    largest fractional share), and the resulting exact integer budgets
    drive select_token_budget_grouped — the full "split a 60k-char budget
    by temperature, fill each language with its best docs" pipeline. The
    oracle replays the water-filling bit-for-bit (pow/floor/row_number
    over fractional shares) and the per-group greedy prefix."""
    from pq_vector_spark.operators.sampling import (
        select_token_budget_grouped,
        temperature_token_budgets,
    )

    docs = load_table(spark, sf_dir, "documents")
    counts = {
        r["lang"]: int(r["s"])
        for r in docs.groupBy("lang").agg(F.sum("n_chars").alias("s")).collect()
    }
    budgets = temperature_token_budgets(counts, TEMP_CHAR_BUDGET, alpha=0.5)
    scored = docs.withColumn("quality", F.round(T.quality_score("text"), 4))
    out = select_token_budget_grouped(
        scored, "lang", "doc_id", "quality", "n_chars", budgets,
        buckets=32, window_cap=12,
    )
    return out.select(
        "doc_id", "lang", "quality",
        F.col("n_chars").cast("bigint").alias("chars"),
    ).orderBy("doc_id")


_EPOCH_CACHE: dict[str, str] = {}


def _epoch_shuffle(spark, sf_dir):
    """Deterministic epoch shuffling (r11 extension,
    sources/sinks.py:write_epoch_shards): one epoch of the documents table
    written as range-sharded parquet whose (file order, row order) IS the
    salted-md5 permutation — ONE corpus shuffle, the floor for any global
    reorganization. The read-back attests the whole write→read round
    trip: every doc present exactly once, each carrying the portable
    60-bit order key a loader replays/verifies; the oracle recomputes the
    same md5 order key per doc_id. r13 (r12 verdict #8): the row ALSO
    runs the loader-side audit (sources/sinks.py:verify_epoch_shards —
    re-derives every order key, catches doubled shards and count drift in
    ONE aggregation over the shard set) and carries its verdict columns;
    the oracle pins them to what a correct layout must report (ok, rows =
    distinct keys = count(*), zero mismatches), so a corrupted write
    hash-mismatches instead of passing silently."""
    import tempfile

    from pq_vector_spark.sources.sinks import verify_epoch_shards, write_epoch_shards

    path = _EPOCH_CACHE.get(sf_dir)
    if not (path and os.path.isdir(path)):
        path = os.path.join(tempfile.mkdtemp(prefix="pq_entry_epoch_"), "epoch1")
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
        write_epoch_shards(
            docs, path, key_col="doc_id", epoch=1, salt="bench", n_shards=4
        )
        _EPOCH_CACHE[sf_dir] = path
    n_docs = load_table(spark, sf_dir, "documents").count()
    audit = verify_epoch_shards(
        spark, path, key_col="doc_id", epoch=1, salt="bench",
        expected_rows=n_docs,
    )
    back = spark.read.parquet(path)
    return (
        back.select("doc_id", F.col("_epoch_ord").alias("epoch_ord"))
        .withColumn("audit_ok", F.lit(bool(audit["ok"])))
        .withColumn("audit_rows", F.lit(int(audit["rows"])).cast("bigint"))
        .withColumn(
            "audit_distinct_keys",
            F.lit(int(audit["distinct_keys"])).cast("bigint"),
        )
        .withColumn(
            "audit_mismatches",
            F.lit(int(audit["ord_mismatches"])).cast("bigint"),
        )
        .orderBy("doc_id")
    )


def _sample_hash(spark, sf_dir):
    """Deterministic 10% corpus sample (operators/sampling.py:hash_sample):
    row fate = f(doc_id, salt) only — reproducible across runs, engines,
    partitionings; map-side filter, no shuffle."""
    from pq_vector_spark.operators.sampling import hash_sample

    docs = load_table(spark, sf_dir, "documents")
    return hash_sample(docs, "doc_id", 0.1, salt="bench").select("doc_id", "lang")


def _sample_weighted(spark, sf_dir):
    """EXACT-k weighted sampling without replacement per language
    (operators/sampling.py:priority_sample_k — Duffield/Lund/Thorup
    priority sampling, top-k by weight/hash-uniform): "take exactly 10
    docs per language, weighted by length". Every arithmetic step is an
    IEEE correctly-rounded cast/divide, so the DuckDB oracle replays the
    draw bit-for-bit; Spark plans the rank filter as WindowGroupLimit
    (map-side per-partition top-k before the one shuffle)."""
    from pq_vector_spark.operators.sampling import priority_sample_k

    docs = load_table(spark, sf_dir, "documents")
    out = priority_sample_k(
        docs, "doc_id", "n_chars", 10, group_col="lang", salt="ps"
    )
    return out.select("doc_id", "lang").orderBy("doc_id")


def _sample_repeat(spark, sf_dir):
    """Epoch repetition mixture (r13, operators/sampling.repeat_mix —
    the GPT-3 §2.2 repeat-factor table): src0 upsampled 2.5×, src2
    downsampled to 0.25×, everything else 1× — floor(f) full copies plus
    a salted-hash-gated fractional copy, per-row deterministic. The
    oracle unrolls the copy index over VALUES(1,2,3) and replays the
    bound, the gate hash, and the fractional threshold exactly."""
    from pq_vector_spark.operators.sampling import repeat_mix

    docs = load_table(spark, sf_dir, "documents")
    f = (
        F.when(F.col("source") == "src0", 2.5)
        .when(F.col("source") == "src2", 0.25)
        .otherwise(1.0)
    )
    out = repeat_mix(docs, "doc_id", f, salt="rep")
    return out.select("doc_id", "source", "epoch").orderBy("doc_id", "epoch")


def _sample_dsir(spark, sf_dir):
    """DSIR importance resampling (r13, operators/dsir.py — Xie et al.
    2023, arXiv:2302.03169): rank raw docs by resemblance to a target
    slice via importance weights between two hashed-bigram models, then
    Gumbel-top-k sample (softmax-proportional without replacement). The
    target is the eval slice (doc_id % 50 == 7, the decontaminate
    fixture); the raw side is everything else. Scoring sums the llr per
    gram occurrence (no (doc, bucket) table exists — r14), so every
    aggregation map-side combines before its exchange; the 4096-bucket
    llr table broadcasts as integer NANO-UNITS (r15 — the per-doc score
    is an exact bigint sum, no summation-order ulp risk on either
    engine) and the Gumbel term is nano-quantized the same way (r16 —
    gumbel_score is the exact bigint sum lw_nano + g_nano over 1e9, not
    a rounded float difference); selection is a bounded heap. The oracle
    replays the hashed buckets (md5), both smoothed models, the
    quantized log weight, AND the quantized salted-hash Gumbel draw —
    the full sampled variant is hash-attested, not just the scores."""
    from pq_vector_spark.operators.dsir import dsir_select

    docs = load_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("doc_id") % 50 == 7)
    raw = docs.filter(F.col("doc_id") % 50 != 7)
    out = dsir_select(
        raw, "text", "doc_id", target, 200,
        n_max=2, buckets=4096, smoothing=0.5, gumbel=True, salt="dsir",
    )
    return out.select("doc_id", "log_weight", "gumbel_score").orderBy("doc_id")


def _sample_ccnet(spark, sf_dir):
    """CCNet head/middle/tail bucketing (r13, operators/sampling.py:
    score_buckets — Wenzek et al. 2020 §4.4), composed end-to-end with
    the LM quality signal: per-doc mean unigram log-probability
    (functions/text.py:unigram_logprob) cut into PER-LANGUAGE terciles
    by exact-percentile thresholds. No window anywhere — the thresholds
    table is languages-sized and broadcasts; the naive per-language
    ntile would hold a whole language in one task at web scale. The
    oracle replays the smoothed MLE, the quantile_cont cut points, and
    the boundary comparisons."""
    from pq_vector_spark.operators.sampling import score_buckets

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select("doc_id", "lang").join(
        T.unigram_logprob(docs, "text", "doc_id"), "doc_id"
    )
    out = score_buckets(
        scored, "logprob", group_col="lang",
        labels=("head", "middle", "tail"),
    )
    return out.select("doc_id", "lang", "logprob", "bucket").orderBy("doc_id")


def _sample_mix(spark, sf_dir):
    """Weighted deterministic dataset mix (100% src0 + 50% src1 + 25% src2)
    — the training-mixture primitive (operators/sampling.py:weighted_mix);
    a union of map-side hash filters, each source tagged."""
    from pq_vector_spark.operators.sampling import weighted_mix

    docs = load_table(spark, sf_dir, "documents")
    parts = {
        "src0": (docs.filter(F.col("source") == "src0"), 1.0),
        "src1": (docs.filter(F.col("source") == "src1"), 0.5),
        "src2": (docs.filter(F.col("source") == "src2"), 0.25),
    }
    return weighted_mix(parts, "doc_id").select("doc_id", "mix_source")


BM25_QUERY = ["spark", "window", "hash"]


def _text_bm25(spark, sf_dir):
    """BM25 top-10 documents for a fixed query-term bag (always-positive
    RSJ idf, k1=1.2, b=0.75); see functions/text.py."""
    docs = load_table(spark, sf_dir, "documents")
    return T.bm25_topk(docs, "text", "doc_id", BM25_QUERY, k=10)


_JSONL_FIXTURE_CACHE: dict[str, str] = {}


def _jsonl_fixture(spark, sf_dir) -> str:
    """JSONL ingestion fixture (built once per sf_dir per process): the
    documents table written as JSONL plus ONE deterministically-corrupt
    extra line — the quarantine path must fire."""
    import os
    import tempfile

    key = sf_dir
    if key in _JSONL_FIXTURE_CACHE:
        return _JSONL_FIXTURE_CACHE[key]
    from pq_vector_spark.sources.jsonl import write_jsonl

    root = tempfile.mkdtemp(prefix="pq_entry_jsonl_")
    path = os.path.join(root, "docs_jsonl")
    write_jsonl(load_table(spark, sf_dir, "documents"), path)
    with open(os.path.join(path, "zz-corrupt.json"), "w") as f:
        f.write('{"doc_id": 999999999, "text": "missing closing brace"\n')
    _JSONL_FIXTURE_CACHE[key] = path
    return path


def _pipeline_jsonl(spark, sf_dir):
    """JSONL ingestion edge (r13, sources/jsonl.py): the documents table
    round-trips through line-delimited JSON — explicit schema (one-pass
    contract), PERMISSIVE parse, corrupt lines split into a quarantine
    frame (one planted malformed line; its count rides every row as a
    literal so the quarantine path is hash-attested). The oracle reads
    the same rows straight from parquet — the round trip must be
    content-lossless (text pinned by md5)."""
    from pyspark.sql import types as T2

    from pq_vector_spark.sources.jsonl import read_jsonl

    path = _jsonl_fixture(spark, sf_dir)
    schema = T2.StructType(
        [
            T2.StructField("doc_id", T2.LongType()),
            T2.StructField("text", T2.StringType()),
            T2.StructField("lang", T2.StringType()),
            T2.StructField("source", T2.StringType()),
            T2.StructField("n_chars", T2.LongType()),
        ]
    )
    good, bad = read_jsonl(spark, path, schema)
    n_bad = bad.count()
    return (
        good.select(
            "doc_id",
            "lang",
            "n_chars",
            F.md5("text").alias("text_md5"),
            F.lit(int(n_bad)).cast("bigint").alias("quarantined"),
        )
        .orderBy("doc_id")
    )


def _pipeline_curate(spark, sf_dir):
    """Composed curation pipeline (operators/curate.py): quality gate →
    exact-dedup survivor → PII scrub → deterministic 50% hash sample, in
    one shuffle. The oracle re-derives every stage in SQL."""
    from pq_vector_spark.operators.curate import curate_corpus

    docs = load_table(spark, sf_dir, "documents")
    out = curate_corpus(
        docs,
        "text",
        "doc_id",
        min_quality=0.5,
        sample_rate=0.5,
        sample_salt="curate",
        pii_kinds=["email", "url"],
    )
    return out.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.round("quality", 4).alias("quality"),
    ).orderBy("doc_id")


def _hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval (operators/hybrid.py): BM25 top-40 ∪ cosine top-40
    fused by reciprocal-rank (k_rrf=60) into a top-10 — the rank-based
    fusion glue between the engine's lexical and vector halves."""
    from pq_vector_spark.operators.hybrid import hybrid_topk

    docs = load_table(spark, sf_dir, "documents")
    emb = _emb(spark, sf_dir)
    q = _qvec(spark, sf_dir, 0)
    return hybrid_topk(
        docs,
        "text",
        "doc_id",
        BM25_QUERY,
        q,
        K,
        vectors=emb,
        vec_id_col="vec_id",
        pool=40,
    )


def _dedup_simhash(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", D.simhash("text", bits=16).alias("simhash"))


def _dedup_embedding(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    out = D.embedding_top_pairs(emb, "embedding", "vec_id", top=20)
    return out.select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))


def _multimodal_features(spark, sf_dir):
    """REAL audio decode pipeline over binary media columns: synthesize a
    PCM16 WAV payload per document (samples = the md5 digest of the text as
    8 big-endian int16s — deterministic and oracle-reproducible), then
    decode it with the stdlib ``wave`` decoder inside mapInPandas and emit
    header fields + the exact per-payload sample mean. The decode step is
    no longer a stub: it parses real RIFF/WAVE bytes."""
    from pyspark.sql.types import BinaryType

    from pq_vector_spark.operators.multimodal import extract_features, wav_bytes

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("_h")
    )

    @F.pandas_udf(BinaryType())
    def _mk_wav(h: pd.Series) -> pd.Series:
        import numpy as np

        return h.map(
            lambda hx: wav_bytes(np.frombuffer(bytes.fromhex(hx), dtype=">i2"), 8000)
        )

    media = docs.withColumn("content", _mk_wav("_h")).drop("_h")
    feats = extract_features(media, "content", decoder="wav")
    return feats.select(
        "doc_id",
        F.col("feature")[0].cast("int").alias("n_channels"),
        F.col("feature")[1].cast("int").alias("sample_rate"),
        F.col("feature")[2].cast("bigint").alias("n_frames"),
        F.col("feature")[3].cast("double").alias("mean_pcm"),
    )


def _multimodal_frames(spark, sf_dir):
    """REAL video frame-sampling pipeline: synthesize a concatenated-P6
    video per document (4 one-pixel frames whose RGB bytes are md5(text)
    digest bytes 0..11 — deterministic and oracle-reproducible), cut frames
    at a 1 s cadence with ``sample_frames`` (real P6 split + decode,
    operators/multimodal.py), and emit the per-frame pixel stats. Every
    number here comes from actual payload bytes — the oracle recomputes
    them from the md5 hex in SQL."""
    from pyspark.sql.types import BinaryType

    from pq_vector_spark.operators.multimodal import ppm_bytes, sample_frames

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("_h")
    )

    @F.pandas_udf(BinaryType())
    def _mk_video(h: pd.Series) -> pd.Series:
        def mk(hx: str) -> bytes:
            dig = bytes.fromhex(hx)
            return b"".join(
                ppm_bytes(1, 1, dig[3 * i : 3 * i + 3]) for i in range(4)
            )

        return h.map(mk)

    media = (
        docs.withColumn("content", _mk_video("_h"))
        .withColumn("duration_ms", F.lit(4000))
        .drop("_h")
    )
    out = sample_frames(media, every_ms=1000, decoder="ppm")
    return out.select(
        "doc_id",
        F.col("frame_ts_ms").cast("int").alias("frame_ts_ms"),
        F.col("frame_index").cast("int").alias("frame_index"),
        F.col("frame_width").cast("int").alias("frame_width"),
        F.col("frame_height").cast("int").alias("frame_height"),
        F.col("frame_mean_r").cast("int").alias("mean_r"),
        F.col("frame_mean_g").cast("int").alias("mean_g"),
        F.col("frame_mean_b").cast("int").alias("mean_b"),
    )


def _text_decontaminate_bloom(spark, sf_dir):
    """Bloom-filter decontamination (r13 op, operators/bloom.py — first
    driver attestation r14): survivors of the BROADCAST-FILTER path, with
    their per-doc Bloom hit counts. The filter is deterministic
    (md5-derived double hashing, no RNG), so the oracle replays the BIT
    ARITHMETIC itself — geometry, double hashing, word build, k-bit probe
    — and even genuine false positives hash-match (at sf0.01 there are 3,
    one extra hit each on docs 95/375/405, none survivor-flipping);
    includes the smallest-eval-doc threshold cut
    (min(min_grams, ceil(0.5·min_E))). The scale twin (bench scale_dedup)
    already pinned survivor bit-identity vs the exact operator at 1M."""
    from pq_vector_spark.operators.bloom import build_gram_bloom, decontaminate_bloom

    docs = load_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 50 == 7)
    co = docs.filter(F.col("doc_id") % 50 != 7)
    bloom = build_gram_bloom(ev, "text", n=3, fpp=1e-6)
    out = decontaminate_bloom(
        co, bloom, "text", min_grams=3, threshold=0.5, hits_col="bloom_hits"
    )
    return out.select("doc_id", "bloom_hits").orderBy("doc_id")


def _text_decontaminate(spark, sf_dir):
    """Benchmark decontamination (operators/decontaminate.py): corpus docs
    sharing ≥2 distinct 3-gram shingles with the eval slice (doc_id % 50 ==
    7). Corpus side is map-side shingling + broadcast join against the
    benchmark-sized eval gram table — the corpus never shuffles to
    discover contamination; only matching gram pairs reach the count."""
    from pq_vector_spark.operators.decontaminate import contamination_report

    docs = load_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 50 == 7)
    co = docs.filter(F.col("doc_id") % 50 != 7)
    rep = contamination_report(co, ev, "text", n=3, min_grams=2)
    return rep.select(
        "doc_id",
        "eval_id",
        "shared_grams",
        "eval_grams",
        F.round("overlap_frac", 4).alias("overlap_frac"),
    )


def _text_decontaminate_fast(spark, sf_dir):
    """The xxhash64 gram family on the EXACT decontamination path (r14,
    operators/decontaminate.py:decontaminate(gram_hash="fast") — first
    driver attestation r15, r14 verdict #2): survivors of the full
    two-rule drop (min_grams=3 OR overlap ≥ 0.5 of any eval doc). The
    oracle replays the PORTABLE (md5) family: survivor sets are
    family-independent — both families count the same shared-gram
    multiplicities unless two distinct grams collide in a 60-bit space
    (~2^-60 per pair; in-run survivor parity is additionally asserted at
    1M docs in bench scale_dedup) — so a hash match here attests the
    fast path end-to-end without DuckDB needing xxhash64."""
    from pq_vector_spark.operators.decontaminate import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 50 == 7)
    co = docs.filter(F.col("doc_id") % 50 != 7)
    out = decontaminate(
        co, ev, "text", n=3, min_grams=3, threshold=0.5, gram_hash="fast"
    )
    return out.select("doc_id", "lang", "source").orderBy("doc_id")


def _pack_sequences(spark, sf_dir):
    """GPT-style sequence packing (operators/packing.py): concatenate each
    source's docs in doc_id order and cut every 256 tokens; per-doc start
    offset + first/last sequence index. ONE window shuffle keyed on the
    shard column; running sum is O(1) window state."""
    from pq_vector_spark.operators.packing import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "source", F.size(T.tokens("text")).cast("bigint").alias("n_tokens")
    )
    out = pack_sequences(
        d, "n_tokens", group_col="source", order_col="doc_id", max_tokens=256
    )
    return out.select(
        "doc_id", "source", "n_tokens", "start_offset", "first_seq", "last_seq"
    )


def _sample_stratified(spark, sf_dir):
    """Exact-k-per-stratum deterministic draw (operators/sampling.py:
    stratified_sample): 7 docs per language, ranked by md5 hash bucket —
    the balanced-per-class sample rate sampling cannot give. One
    WindowGroupLimit-prunable shuffle on the stratum."""
    from pq_vector_spark.operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(docs, "lang", "doc_id", 7, salt="strat").select(
        "lang", "doc_id", "source"
    )


def _merge_upsert(spark, sf_dir):
    """CDC merge (operators/merge.py): apply a deterministic changeset to
    customer — deletes (key%10==0), a superseded + a winning update
    (key%10==1, last-writer-wins on version), inserts (key%10==3 at
    key+1e6). Base never shuffles: winner keys broadcast into a LEFT ANTI,
    upserts union in."""
    from pq_vector_spark.operators.merge import merge_upsert

    cust = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    deletes = cust.filter(k % 10 == 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
        F.lit("D").alias("op"),
        F.lit(1).cast("bigint").alias("version"),
    )
    upd_win = cust.filter(k % 10 == 1).select(
        "c_custkey",
        F.concat(F.lit("UPD-"), k.cast("string")).alias("c_name"),
        "c_nationkey",
        F.round(F.col("c_acctbal") + F.lit(100.0), 2).alias("c_acctbal"),
        F.lit("RETAIL").alias("c_mktsegment"),
        F.lit("U").alias("op"),
        F.lit(2).cast("bigint").alias("version"),
    )
    upd_stale = cust.filter(k % 10 == 1).select(
        "c_custkey",
        F.lit("STALE").alias("c_name"),
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        "c_mktsegment",
        F.lit("U").alias("op"),
        F.lit(1).cast("bigint").alias("version"),
    )
    inserts = cust.filter(k % 10 == 3).select(
        (k + F.lit(1000000)).alias("c_custkey"),
        F.concat(F.lit("NEW-"), k.cast("string")).alias("c_name"),
        "c_nationkey",
        F.lit(10.0).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
        F.lit("U").alias("op"),
        F.lit(1).cast("bigint").alias("version"),
    )
    changes = (
        deletes.unionByName(upd_win).unionByName(upd_stale).unionByName(inserts)
    )
    out = merge_upsert(cust, changes, ["c_custkey"], "version")
    return out.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        "c_mktsegment",
    )


def _text_chunks(spark, sf_dir):
    """Document chunking for embedding (operators/chunk.py): 120-char
    windows, 20-char overlap — pure map-side sequence + posexplode +
    substr, zero shuffle at any scale. Chunk text rides as md5 to keep the
    compare row-sized."""
    from pq_vector_spark.operators.chunk import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    out = chunk_documents(docs, "text", "doc_id", chunk_chars=120, overlap=20)
    return out.select(
        "doc_id", "chunk_id", "chunk_start", F.md5("chunk_text").alias("chunk_md5")
    )


def _quality_checks(spark, sf_dir):
    """Deequ-style constraint suite (operators/constraints.py): four
    row-wise rules over documents evaluated in ONE scan/aggregation —
    adding a rule adds a counter, never a pass."""
    from pq_vector_spark.operators.constraints import check_constraints

    docs = load_table(spark, sf_dir, "documents")
    rules = {
        "text_not_null": F.col("text").isNotNull(),
        "n_chars_consistent": F.length("text") == F.col("n_chars"),
        "lang_known": F.col("lang").isin("en", "de", "es", "fr", "zh"),
        "doc_id_nonneg": F.col("doc_id") >= 0,
    }
    return check_constraints(docs, rules)


def _quality_profile(spark, sf_dir):
    """One-pass column profiler (operators/constraints.py:
    profile_columns): nulls / distinct / min / max for four document
    columns in a single aggregation over a single scan."""
    from pq_vector_spark.operators.constraints import profile_columns

    docs = load_table(spark, sf_dir, "documents")
    return profile_columns(docs, ["doc_id", "lang", "source", "n_chars"])


def _dedup_rates(spark, sf_dir):
    """Per-source duplication dashboard: docs vs distinct content
    fingerprints and the implied duplicate rate — one fingerprint+source
    aggregation (map-side md5), the curation run's first health chart."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("source", T.fingerprint("text").alias("_fp"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("_fp").cast("bigint").alias("n_distinct"),
        )
        .select(
            "source",
            "n_docs",
            "n_distinct",
            F.round(
                F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_docs").cast("double"),
                6,
            ).alias("dup_rate"),
        )
    )


def _text_lang_confusion(spark, sf_dir):
    """Declared-vs-guessed language confusion matrix (lang column vs
    functions/text.py lang_guess): the label-quality audit for a
    multilingual corpus. One (declared, guessed) count aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.col("lang").alias("declared"), T.lang_guess("text").alias("guessed"))
        .groupBy("declared", "guessed")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


def _events_trending(spark, sf_dir):
    """Hourly top-3 event types (streaming/events.py:trending): one
    (window, key) partial agg + a WindowGroupLimit-pruned per-window
    rank."""
    from pq_vector_spark.streaming.events import trending

    _utc(spark)
    return trending(load_table(spark, sf_dir, "events"), k=3)


PROJECT_DIM = 8
PROJECT_SEED = 7
PROJECT_SRC_DIM = 64  # embeddings dim; oracle bakes matrix literals at this width


def _embedding_project(spark, sf_dir):
    """Seeded Johnson-Lindenstrauss random projection (functions/vector.py:
    project_vectors) — the dimensionality-reduction step ahead of
    indexing/storage at scale (a 768-dim corpus indexed at 64 dims costs
    12× less I/O per candidate). Native zip_with/aggregate fold per output
    dim, zero shuffle; the oracle is handed the IDENTICAL matrix literals
    (same seed through random_projection_matrix) and replays every output
    bit. Long (vec_id, dim, val) form per the driver canonicalizer's
    hashable-cell contract."""
    from pq_vector_spark.functions.vector import (
        project_vectors,
        random_projection_matrix,
    )

    emb = _emb(spark, sf_dir)
    src_dim = len(emb.select("embedding").first()["embedding"])
    assert src_dim == PROJECT_SRC_DIM, (
        f"embeddings dim {src_dim} != PROJECT_SRC_DIM {PROJECT_SRC_DIM}; "
        "update the shared constant (the oracle bakes matrix literals at it)"
    )
    m = random_projection_matrix(src_dim, PROJECT_DIM, seed=PROJECT_SEED)
    out = project_vectors(emb, "embedding", m)
    return (
        out.select("vec_id", F.posexplode("projected").alias("dim", "val"))
        .select("vec_id", "dim", F.round("val", 4).alias("val"))
        .orderBy("vec_id", "dim")
    )


def _embedding_norms(spark, sf_dir):
    """Per-label L2-norm vital signs (functions/vector.py:norm_stats):
    map-side bound-once norm fold, one group agg; exact percentiles over
    rounded norms (bounded value→count map)."""
    from pq_vector_spark.functions.vector import norm_stats

    return norm_stats(_emb(spark, sf_dir), "embedding", "label")


def _events_transitions(spark, sf_dir):
    """Markov transition matrix over user event journeys (operators/
    retention.py:event_transitions): one user-keyed lag window + a
    (from, to) count; totals broadcast for row normalization."""
    from pq_vector_spark.operators.retention import event_transitions

    _utc(spark)
    ev = load_table(spark, sf_dir, "events")
    return event_transitions(ev)


def _events_abtest(spark, sf_dir):
    """Two-proportion experiment readout (operators/abtest.py): variants
    assigned by user parity, exposure = view, conversion = purchase;
    distinct (unit, variant) reduction before any join, z from pooled SE
    (sqrt/arithmetic only — engine-replayable to the digit)."""
    from pq_vector_spark.operators.abtest import ab_test

    ev = load_table(spark, sf_dir, "events").withColumn(
        "variant",
        F.when(F.col("user_id") % 2 == 0, F.lit("A")).otherwise(F.lit("B")),
    )
    return ab_test(
        ev,
        "variant",
        "user_id",
        F.col("event_type") == "view",
        F.col("event_type") == "purchase",
    )


def _text_score_normalize(spark, sf_dir):
    """Per-source quantile normalization (operators/normalize.py): doc
    length rank-calibrated within each source so one global threshold
    means the same thing across heterogeneous sources. One group-keyed
    window shuffle."""
    from pq_vector_spark.operators.normalize import quantile_normalize

    docs = load_table(spark, sf_dir, "documents")
    out = quantile_normalize(
        docs.select("doc_id", "source", "n_chars"),
        "n_chars",
        group_col="source",
    )
    return out.select("doc_id", "source", "score_qn")


def _sample_importance(spark, sf_dir):
    """Quality-weighted importance sampling (operators/sampling.py:
    importance_sample): each doc kept with probability = its own quality
    score — deterministic curriculum sampling; map-side filter, no
    shuffle, engine-replayable draw."""
    from pq_vector_spark.operators.sampling import importance_sample

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.withColumn("_p", T.quality_score("text"))
    out = importance_sample(scored, "doc_id", "_p", salt="imp")
    return out.select("doc_id", F.round("_p", 4).alias("prob"))


def _events_retention(spark, sf_dir):
    """Weekly cohort retention (operators/retention.py): distinct-user
    activity reduced before a user-keyed join; three combiner-friendly
    exchanges, no count-distinct state."""
    from pq_vector_spark.operators.retention import cohort_retention

    _utc(spark)
    ev = load_table(spark, sf_dir, "events")
    return cohort_retention(ev, "user_id", "ts")


def _maxsim(spark, sf_dir):
    """Late-interaction MaxSim retrieval (operators/similarity.py:
    maxsim_topk): the 64-dim embeddings reinterpreted as bags of 8×8-dim
    token vectors; score = Σᵢ maxⱼ qᵢ·dⱼ, all native nested HOFs (no UDF,
    no shuffle), bounded-heap top-k."""
    from pq_vector_spark.operators.similarity import maxsim_topk

    emb = _emb(spark, sf_dir)
    sub = F.transform(
        F.sequence(F.lit(0), F.lit(7)),
        lambda i: F.slice(F.col("embedding"), i * 8 + 1, 8),
    )
    docs = emb.select("vec_id", sub.alias("vecs"))
    q = _qvec(spark, sf_dir, 0)
    qbag = [list(q[i * 8 : (i + 1) * 8]) for i in range(8)]
    out = maxsim_topk(docs, "vecs", qbag, K, id_col="vec_id")
    return out.select("vec_id", F.round("maxsim", 4).alias("maxsim"))


def _corpus_drift(spark, sf_dir):
    """Distribution drift (operators/drift.py): PSI per length bucket
    between the even- and odd-doc_id halves of the corpus — two map-side
    binning passes + O(bins) aggregations; nothing else moves at 100 TB."""
    from pq_vector_spark.operators.drift import distribution_drift

    docs = load_table(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    return distribution_drift(a, b, "n_chars", lo=0.0, hi=1000.0, bins=10)


def _embedding_outliers(spark, sf_dir):
    """Distance-to-class-centroid outliers (functions/vector.py:
    embedding_outliers): top-5 farthest vectors per label — the
    mislabeled-embedding detector; centroids broadcast, corpus map-side,
    WindowGroupLimit-prunable per-label rank."""
    from pq_vector_spark.functions.vector import embedding_outliers

    emb = _emb(spark, sf_dir)
    return embedding_outliers(emb, "label", "embedding", "vec_id", k=5)


def _dedup_incremental(spark, sf_dir):
    """Incremental ingest dedup (operators/dedup.py:incremental_dedup):
    delta (doc_id % 5 == 0) deduped within itself and against the corpus
    (% 5 != 0) by content fingerprint. The corpus never shuffles — the
    delta's fingerprint set broadcasts as a map-side semi-join probe."""
    from pq_vector_spark.operators.dedup import incremental_dedup

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    delta = docs.filter(F.col("doc_id") % 5 == 0)
    out = incremental_dedup(corpus, delta, "text", "doc_id")
    return out.select("doc_id", "source")


_EXACT_IDX_CACHE: dict[str, str] = {}


def _dedup_incremental_indexed(spark, sf_dir):
    """Incremental exact dedup against the PERSISTED fingerprint index
    (r13, operators/dedup.py:incremental_dedup_exact_indexed — the exact
    twin of the LSH near-dup index): the standing corpus's 16-byte fp
    table is built once; each delta probes it column-pruned with zero
    corpus text I/O and zero corpus hashing. Same delta/corpus split and
    SAME SURVIVORS as dedup_incremental — the oracle pins the index path
    to the raw-corpus semantics."""
    import tempfile

    from pq_vector_spark.operators.dedup import (
        build_exact_dedup_index,
        incremental_dedup_exact_indexed,
    )

    docs = load_table(spark, sf_dir, "documents")
    idx = _EXACT_IDX_CACHE.get(sf_dir)
    if not (idx and os.path.isdir(idx)):
        idx = os.path.join(tempfile.mkdtemp(prefix="pq_entry_exidx_"), "fp_idx")
        build_exact_dedup_index(
            docs.filter(F.col("doc_id") % 5 != 0), "text", idx
        )
        _EXACT_IDX_CACHE[sf_dir] = idx
    delta = docs.filter(F.col("doc_id") % 5 == 0)
    out = incremental_dedup_exact_indexed(spark, idx, delta, "text", "doc_id")
    return out.select("doc_id", "source")


_DEDUP_IDX_CACHE: dict[str, str] = {}


def _dedup_index_path(spark, sf_dir):
    """Persisted near-dup LSH index over the corpus split (doc_id % 5 != 0)
    of the documents table — built once per sf_dir per process (the
    standing-index premise the probe operator exists for)."""
    import tempfile

    from pq_vector_spark.operators.dedup import build_dedup_index

    cached = _DEDUP_IDX_CACHE.get(sf_dir)
    if cached and os.path.isdir(cached):
        return cached
    out = os.path.join(
        tempfile.mkdtemp(prefix="pq_entry_dedup_idx_"), "near_idx"
    )
    docs = load_table(spark, sf_dir, "documents")
    build_dedup_index(
        docs.filter(F.col("doc_id") % 5 != 0), "text", "doc_id", out,
        n=3, num_hashes=32, bands=8, seed=42,
    )
    _DEDUP_IDX_CACHE[sf_dir] = out
    return out


def _dedup_incremental_near(spark, sf_dir):
    """Incremental NEAR-dedup against a persisted LSH index (r11,
    operators/dedup.py:incremental_dedup_near — the near-dup analogue of
    incremental_dedup's exact contract): the delta (doc_id % 5 == 0)
    probes the corpus's standing (id, band, key) index — corpus text is
    never re-hashed — with band collisions verified at exact 3-gram
    jaccard >= 0.6; a delta doc also drops against any SMALLER-id delta
    near-match. The oracle replays the banded minhash and the survivor
    rule bit-for-bit (all hashing is md5-derived)."""
    from pq_vector_spark.operators.dedup import incremental_dedup_near

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    delta = docs.filter(F.col("doc_id") % 5 == 0)
    idx = _dedup_index_path(spark, sf_dir)
    out = incremental_dedup_near(
        spark, idx, delta, "text", "doc_id", corpus=corpus, threshold=0.6
    )
    return out.select("doc_id", "source").orderBy("doc_id")


def _dedup_paragraphs(spark, sf_dir):
    """Boilerplate-paragraph removal (r11, operators/dedup.py:
    remove_repeated_paragraphs — CCNet/Gopher-style paragraph-granular
    dedup: a paragraph in >= min_docs distinct documents vanishes from all
    of them). The documents table is single-paragraph, so the query
    derives a two-paragraph frame both engines build identically: each
    doc's own text plus a shared footer drawn from doc (doc_id % 29) via a
    self-join — every footer repeats across ~17 docs and must vanish
    everywhere, docs 0..28 (their own text IS a footer) clean to empty
    text but are KEPT, and every other doc keeps exactly its first
    paragraph byte-for-byte."""
    from pq_vector_spark.operators.dedup import remove_repeated_paragraphs

    docs = load_table(spark, sf_dir, "documents")
    foot = docs.select(
        F.col("doc_id").alias("_fid"), F.col("text").alias("_ftext")
    )
    framed = docs.select("doc_id", "text").join(
        F.broadcast(foot),
        F.pmod(F.col("doc_id"), F.lit(29)) == F.col("_fid"),
        "inner",
    ).select(
        "doc_id", F.concat_ws("\n", F.col("text"), F.col("_ftext")).alias("text")
    )
    out = remove_repeated_paragraphs(framed, "text", "doc_id", min_docs=3)
    return out.select("doc_id", "text").orderBy("doc_id")


def _embedding_centroids(spark, sf_dir):
    """Per-label mean embedding (functions/vector.py:group_centroids) —
    class prototypes without collect_list: posexplode + ONE
    combiner-friendly hash agg; exchanges carry O(labels × dim).
    Declared in long format (label, dim_idx, mean, n_vectors): scalar-only
    output columns, per the driver canonicalizer's hashable-cell contract
    (r6 lesson: the array<double> wide form was hash-unattestable)."""
    from pq_vector_spark.functions.vector import group_centroids

    emb = _emb(spark, sf_dir)
    return group_centroids(emb, "label", "embedding", decimals=4, long_format=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Ordering contract: the driver's correctness checker attests at most the
    # FIRST 50 entries.  Every operator family must have its representatives
    # inside that budget; redundant same-family variants (all driver-green on
    # unchanged code in earlier rounds) ride in the tail past the cutoff and
    # can be rotated back in if their code ever changes.
    return {
        # -- vector top-k (core reference surface) --
        "knn_exact": _knn_exact,
        # r17 rotation (r16 verdict #8): the auto-route cosine variant
        # re-attests — distance.py's render call sites changed in r16 and
        # the query-vector memo landed this round (knn_filtered demoted:
        # interceptor green since r9 and pinned in-budget by
        # knn_auto/knn_auto_pq/knn_sql).
        "knn_auto_cosine": _knn_auto_cosine,
        "knn_ivf_exact": _knn_ivf_exact,
        "knn_auto": _knn_auto,
        "knn_auto_pq": _knn_auto_pq,
        # r10: driver attestation of discovery-from-storage — the querying
        # "session" (in-memory caches cleared) never registers the codes
        "knn_auto_pq_fresh": _knn_auto_pq_fresh,
        "knn_auto_distance": _knn_auto_distance,
        # r10 rotation (r9 verdict #8): the two interceptor-backed rows not
        # re-attested since r5 while intercept.py grew around them; three
        # stable non-interceptor rows demoted to the tail in exchange
        "knn_sql": _knn_sql,
        # r13 extension: OPQ rotated product quantization — new code,
        # spends a budget row (knn_auto_cosine demoted: the interception
        # machinery stays pinned by knn_auto/knn_auto_pq/knn_sql and the
        # cosine metric by ann_cosine, all in budget)
        "knn_opq": _knn_opq,
        # -- similarity family --
        # r11 rotation (r10 verdict #5): the append path inside
        # index/build.py changed this round (rebuild-verify now counts live
        # data rows; streaming dedupe_on reuses the append), so the two
        # append-adjacent rows come back into the budget; embedding_norms
        # and text_score_normalize (stable compositions, families still
        # represented by embedding_centroids/embedding_project and
        # text_quality/quality_checks) ride the tail in exchange.
        # r14 rotation (r13 verdict #1): MIPS top-k entered as a TAIL row
        # in r13 and was never driver-run — attested now (ann_cosine
        # demoted: green r8-r13 on an untouched cosine kernel, and the
        # family keeps this in-budget row)
        "ann_dot": _ann_dot,
        "similarity_join": _similarity_join,
        "maxsim": _maxsim,
        "hybrid_rrf": _hybrid_rrf,
        "embedding_project": _embedding_project,
        "corpus_drift": _corpus_drift,
        # -- dedup family --
        # (dedup_exact demoted r14: green since r5 on untouched code, and
        # the in-budget dedup_incremental_indexed oracle replays the same
        # fingerprint semantics end-to-end)
        "dedup_resolve": _dedup_resolve,
        "dedup_minhash": _dedup_minhash,
        "dedup_embedding_bucketed": _dedup_embedding_bucketed,
        # r13 rotation (r12 verdict #2): the three r12 operators enter the
        # budget — SemDeDup semantic dedup (its expansion path ALSO changed
        # this round: streaming two-step generator), Gopher rule filters
        # (symbol ratio now counts '…' — changed this round too), and
        # duplicate-span fractions; dedup_resolve_best / knn_capped /
        # events_stream_stats (driver-green ≥2 rounds on code untouched
        # since; layout_zorder stays — the budget must represent every
        # family, test_entry_contract) ride the tail in exchange.
        "dedup_semantic": _dedup_semantic,
        # r13 extension: persisted exact-fp index — new code, spends a
        # budget row (dedup_incremental demoted: identical survivor
        # semantics, raw-corpus probe code untouched since r5, and THIS
        # row's oracle pins the equivalence of the two paths)
        "dedup_incremental_indexed": _dedup_incremental_indexed,
        # r11 extension: NEAR-dedup of a delta against the corpus's
        # PERSISTED LSH index — new code, so it spends a budget row
        # (embedding_centroids demoted, stable since r6)
        "dedup_incremental_near": _dedup_incremental_near,
        # r11 extension: paragraph-granular boilerplate removal — new
        # code, so it spends a budget row (events_range_join_left demoted;
        # the inner-join variant stays in budget for the family)
        "dedup_paragraphs": _dedup_paragraphs,
        # r11 extension: exact-substring overlap pairs — new code, spends
        # a budget row (sample_hash demoted; the hash-sampling primitive
        # keeps five in-budget family rows: stratified/temperature/
        # budget/budget_grouped/weighted)
        "dedup_winnow_overlap": _dedup_winnow_overlap,
        # -- multimodal family --
        "multimodal_features": _multimodal_features,
        # -- sampling / PII / packing / merge (training-pipeline curation) --
        "sample_budget": _sample_budget,
        # r17 rotation (r16 verdict #8): temperature_rates re-attests —
        # sampling.py changed again this round (shared bounded_take) and
        # the rate math last held a driver row in r12 (sample_repeat
        # demoted: green r14-r16 on an untouched repeat-factor gate; the
        # family keeps 5 in-budget rows)
        "sample_temperature": _sample_temperature,
        # r12 attestation (r11 verdict #5): temperature→token-budget
        # composition — the water-filling math gains a driver-attested
        # hash-green row (sample_stratified demoted; hash-bucket family
        # keeps 4 in-budget rows)
        "sample_budget_temperature": _sample_budget_temperature,
        # r13 extension: leakage-safe component-keyed split — new code,
        # spends a budget row (sample_temperature demoted: green since r9
        # on untouched rate math, and the in-budget
        # sample_budget_temperature row pins the same water-filling
        # composition end-to-end)
        "split_leakage": _split_leakage,
        # r12 attestation (r11 verdict #5): epoch-shuffle write→read round
        # trip — the sink family's first oracle row, and the only member
        # of its family (the family-representation contract keeps it
        # in-budget)
        "epoch_shuffle": _epoch_shuffle,
        # r17 rotation (r16 verdict #8): pairwise n-gram jaccard
        # re-attests — dedup.py's shingle/spread path changed in r16 and
        # again this round (size-gated spread) while the row sat in the
        # tail (text_decontaminate_fast demoted: approx-sizing code
        # untouched this round, and the decontaminate family keeps two
        # in-budget rows — the exact and bloom variants — that attest the
        # shared, spread-gated gram featurizer)
        "dedup_jaccard": _dedup_jaccard,
        # r13 extension: DSIR importance resampling — new code, spends a
        # budget row (sample_weighted demoted, green r10-r12 on untouched
        # priority-sampling code; the sample family keeps 5 in-budget rows)
        "sample_dsir": _sample_dsir,
        # r13 extension: CCNet head/middle/tail bucketing — new code,
        # spends a budget row (events_funnel demoted: green since r7 on
        # untouched funnel code; 5 events rows stay in budget)
        "sample_ccnet": _sample_ccnet,
        "text_pii": _text_pii,
        "text_decontaminate": _text_decontaminate,
        # r15 rotation (r14 verdict #2): the fast (xxhash64) gram family
        # on the EXACT decontamination path gains its driver row — the
        # only r14-added code path without one; survivors replay against
        # the portable-family oracle (family-independent, see docstring).
        # knn_binary demoted in exchange: green r13-r14 on
        # functions/quantize.py code untouched both rounds, and the knn
        # family keeps 10 in-budget rows.
        "pipeline_curate": _pipeline_curate,
        "pack_sequences": _pack_sequences,
        "merge_upsert": _merge_upsert,
        # -- relational representatives --
        "rel_topk": _rel_topk,
        "layout_zorder": _layout_zorder,
        # -- events: batch + streaming twins (streaming twins stay in
        #    budget — they are the regression-prone side; a demoted batch
        #    twin is still pinned by its stream sibling's shared oracle) --
        "events_stream_sessions": _events_stream_sessions,
        "events_asof": _events_asof,
        # r17 rotation (r16 verdict #8): dedup keep/drop rate report
        # re-attests with the same dedup.py-changed rationale as
        # dedup_jaccard (events_range_join demoted: green since r11 on
        # untouched interval-join SQL; events keeps 3 in-budget rows)
        "dedup_rates": _dedup_rates,
        "events_stream_join": _events_stream_join,
        # -- text family --
        "text_gopher": _text_gopher,
        "text_dup_spans": _text_dup_spans,
        # r13 extension: C4 line filters — new code, spends a budget row
        # (knn_ivfpq demoted: its pq.py backing code is pinned in-budget
        # by knn_auto_pq + knn_auto_pq_fresh, which route through the
        # same codes sidecar plus the interceptor)
        "text_c4": _text_c4,
        # r13 extension: trained LDA quality classifier — new code, spends
        # a budget row (text_quality demoted: green since r5 on untouched
        # heuristic-score code; the classifier is its trained upgrade and
        # exercises the same feature family end-to-end)
        "quality_classifier": _quality_classifier,
        # r17 rotation (r16 verdict #8 + this round's change): TF-IDF's
        # document-frequency branch now derives from the tf aggregate
        # (ReusedExchange) — changed code re-attests (text_repetition
        # demoted: green r14-r16 on gram-hash code untouched since r13)
        "text_tfidf": _text_tfidf,
        # r14 extension (r13 verdict #2): the Bloom decontamination path
        # gains its first driver-attested row — survivors + hit counts
        # replayed as exact set membership at fpp=1e-6 (zero-FP regime)
        # (events_scd_enriched demoted: green r12-r13 on untouched SCD
        # code; 4 events rows stay in budget)
        "text_decontaminate_bloom": _text_decontaminate_bloom,
        # r17 rotation (this round's change): BM25 now renders the whole
        # pipeline as one-shot SQL plus the shared-exchange df count —
        # changed code re-attests (pipeline_jsonl demoted: green r14-r16
        # on an untouched ingestion round trip; pipeline_curate keeps the
        # family in budget)
        "text_bm25": _text_bm25,
        # ---- 50-row budget cutoff: tail variants below were driver-green in
        # r5 (CORRECTNESS_r05.json) and their code is unchanged; rotate any
        # of them back above this line whenever their implementation changes.
        "knn_filtered": _knn_filtered,  # demoted r17 (green r9-r16; interceptor pinned by 3 in-budget auto rows)
        "text_decontaminate_fast": _text_decontaminate_fast,  # demoted r17 (approx-HLL sizing untouched this round; exact+bloom variants attest the shared gram featurizer in-budget)
        "sample_repeat": _sample_repeat,  # demoted r17 (green r14-r16; repeat-factor gate untouched since r14)
        "events_range_join": _events_range_join,  # demoted r17 (green since r11; interval-join SQL untouched)
        "text_repetition": _text_repetition,  # demoted r17 (green r14-r16; gram hashing untouched since r13)
        "pipeline_jsonl": _pipeline_jsonl,  # demoted r17 (green r14-r16; ingestion round trip untouched)
        "knn_binary": _knn_binary,  # demoted r15 (green r13-r14; quantize.py untouched since r13, family keeps 10 in-budget rows)
        "text_quality": _text_quality,  # demoted r13 (green since r5; trained classifier row covers the feature family)
        "dedup_resolve_best": _dedup_resolve_best,  # demoted r13 (green r10-r12, code untouched)
        "knn_ivfpq": _knn_ivfpq,  # demoted r13 (green since r6; pq.py pinned by the two in-budget auto-pq rows)
        "knn_appended": _knn_appended,  # demoted r13 (green r11-r12; append code untouched this round)
        "sample_weighted": _sample_weighted,  # demoted r13 (green r10-r12, code untouched; 5 sample rows in budget)
        "dedup_incremental": _dedup_incremental,  # demoted r13 (green since r5; indexed twin pins the same survivor oracle)
        "events_funnel": _events_funnel,  # demoted r13 (green since r7, funnel code untouched)
        "knn_capped": _knn_capped,  # demoted r13 (green r11-r12; cap code untouched, 11 knn rows stay in budget)
        "events_stream_stats": _events_stream_stats,  # demoted r13 (green since r7; batch twin shares oracle)
        "sample_stratified": _sample_stratified,  # demoted r12 (stable since r5)
        "dedup_embedding": _dedup_embedding,  # demoted r12 (stable since r6; bucketed twin in budget)
        "sample_hash": _sample_hash,  # demoted r11 (family has 5 in-budget rows)
        "events_range_join_left": _events_range_join_left,  # demoted r11 (inner twin in budget)
        "embedding_centroids": _embedding_centroids,  # demoted r11 (stable since r6)
        "embedding_norms": _embedding_norms,  # demoted r11 (stable since r7)
        "text_score_normalize": _text_score_normalize,  # demoted r11 (stable since r7)
        "quality_profile": _quality_profile,  # demoted r10 (stable since r7)
        "events_retention": _events_retention,  # demoted r10 (stable since r7)
        "events_abtest": _events_abtest,  # demoted r10 (stable since r7)
        "events_transitions": _events_transitions,  # demoted r10 (stable since r7)
        "events_trending": _events_trending,  # demoted r10 (stable since r7)
        "text_lang_confusion": _text_lang_confusion,  # demoted r9 (stable since r8)
        "embedding_outliers": _embedding_outliers,
        "text_tokens_bpe": _text_tokens_bpe,
        "text_chunks": _text_chunks,
        "knn_quantized": _knn_quantized,
        "knn_pq": _knn_pq,
        "dedup_simhash": _dedup_simhash,
        "multimodal_frames": _multimodal_frames,
        "sample_importance": _sample_importance,
        "sample_mix": _sample_mix,
        "text_logprob": _text_logprob,
        "text_winnow": _text_winnow,
        "knn_batch": _knn_batch,
        "knn_distance": _knn_distance,
        "rel_agg": _rel_agg,
        "rel_window": _rel_window,
        "rel_skew_join": _rel_skew_join,
        "events_enriched": _events_enriched,
        "events_stream_enriched": _events_stream_enriched,
        "events_stream_dedup": _events_stream_dedup,
        "ann_cosine_ivf": _ann_cosine_ivf,
        "ann_cosine": _ann_cosine,  # demoted r14 (green r8-r13; cosine kernel untouched, ann_dot keeps the family in budget)
        "dedup_exact": _dedup_exact,  # demoted r14 (green since r5; fingerprint semantics pinned by in-budget dedup_incremental_indexed)
        "sample_budget_grouped": _sample_budget_grouped,  # demoted r14 (green r10-r13; budget family keeps 5 in-budget rows)
        "events_scd_enriched": _events_scd_enriched,  # demoted r14 (green r12-r13; SCD code untouched, 4 events rows in budget)
        "quality_checks": _quality_checks,  # demoted r14 (green since r5; quality_classifier keeps the family in budget)
        "knn_batch_ivf": _knn_batch_ivf,
        "similarity_join_ivf": _similarity_join_ivf,
        "knn_ivf_approx": _knn_ivf_approx,  # no_oracle (recall-gated) — never spends a budget row
        "events_windowed": _events_windowed,
        "events_stream_windowed": _events_stream_windowed,
        "events_sessions": _events_sessions,
        "events_props": _events_props,
        "text_stats": _text_stats,
        "text_lang": _text_lang,
        "text_fingerprint": _text_fingerprint,
        "text_quantiles": _text_quantiles,
        "text_doc_freq": _text_doc_freq,
        "rel_join_agg": _rel_join_agg,
        "rel_join_region": _rel_join_region,
        "rel_join_part": _rel_join_part,
        "rel_moving_avg": _rel_moving_avg,
        "rel_semijoin": _rel_semijoin,
        "rel_conditional_agg": _rel_conditional_agg,
        "rel_antijoin": _rel_antijoin,
        "rel_distinct_count": _rel_distinct_count,
        "rel_correlated": _rel_correlated,
        "rel_rollup": _rel_rollup,
        "rel_setops": _rel_setops,
    }


# ---------------------------------------------------------------- oracle ----

def _sq(a: str, b: str) -> str:
    """Squared-L2 DuckDB SQL, bit-identical to the Spark fold."""
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * "
        f"(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), (x, y) -> x + y)"
    )


def _dist(a: str, b: str) -> str:
    return f"sqrt({_sq(a, b)})"


def _dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)"
    )


def _nrm(a: str) -> str:
    return (
        f"sqrt(list_reduce(list_transform({a}, "
        f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))"
    )


def _cos(a: str, b: str) -> str:
    return f"{_dot(a, b)} / ({_nrm(a)} * {_nrm(b)})"


_Q0 = "(SELECT embedding FROM embeddings WHERE vec_id = 0)"
_Q1 = "(SELECT embedding FROM embeddings WHERE vec_id = 1)"

# DuckDB fragments mirroring functions/text.py exactly
_TOKS = "string_split_regex(lower(trim(text)), '\\s+')"
_SW_EN = "['the','a','of','and','to','in','is','that','it','for']"
_SW = {
    "de": "['der','die','das','und','zu','in','ein','ist','nicht','von']",
    "en": _SW_EN,
    "es": "['el','la','de','y','que','en','un','es','se','no']",
    "fr": "['le','la','de','et','que','en','un','est','se','ne']",
}
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
# 3-gram token shingles, distinct — mirrors operators/dedup.py shingles(n=3)
_SHINGLES = (
    "list_distinct(list_transform(range(1, greatest(len(toks) - 2, 1) + 1), "
    "i -> array_to_string(toks[i:i+2], ' ')))"
)
_TOKHASH = "CAST(concat('0x', substr(md5({s}), 1, 15)) AS BIGINT)"


def _winnow_fp_cte() -> str:
    """Shared winnowing CTE chain (k=3-gram rolling hashes, window w=4)
    ending in ``wfp(doc_id, fp)`` — mirrors
    functions/text.winnow_fingerprints hash-for-hash; used by the
    text_winnow and dedup_winnow_overlap oracle twins."""
    return f"""toks AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            g3 AS (SELECT doc_id,
                     CASE WHEN len(toks) >= 3 THEN
                       list_transform(range(1, len(toks) - 2 + 1),
                                      i -> array_to_string(toks[i:i+2], ' '))
                     ELSE [] END AS grams FROM toks),
            ex AS (SELECT doc_id, unnest(grams) AS gram,
                          unnest(range(1, len(grams) + 1)) AS i FROM g3),
            h AS (SELECT doc_id, i, {_TOKHASH.format(s="gram")} AS h FROM ex),
            win AS (SELECT doc_id, i,
                      min(h) OVER (PARTITION BY doc_id ORDER BY i
                                   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
                      count(*) OVER (PARTITION BY doc_id) AS n
                    FROM h),
            wfp AS (SELECT DISTINCT doc_id, fp FROM win WHERE i <= n - 3)"""


def _jaccard_cte() -> str:
    """Shared CTE computing exact 3-gram jaccard pairs (mirrors
    ngram_jaccard_pairs: explode → equi-join → count / (na+nb-inter))."""
    return f"""
    toks AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    sh AS (SELECT doc_id, {_SHINGLES} AS sh FROM toks),
    ex AS (SELECT doc_id, len(sh) AS n,
           unnest(list_transform(sh, s -> {_TOKHASH.format(s='s')})) AS s FROM sh),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             count(*) AS inter, any_value(a.n) AS na, any_value(b.n) AS nb
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    jac AS (
      SELECT id_a, id_b,
             CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) AS jaccard
      FROM pairs)
    """


def _banded_sql_parts() -> tuple[str, str]:
    """Shared DuckDB CTE fragments for banded MinHash (num_hashes=32,
    bands=8, seed=42 — the ONE parameterization every minhash oracle row
    uses): the hs/sig/banded chain (appended after ``_jaccard_cte``) and
    the 8-band equality disjunction for a self-join aliased a/b."""
    coeffs = D._minhash_coeffs(32, 42)
    P, M = D.MINHASH_P, D.MINHASH_M
    mh_cols = ", ".join(
        f"list_aggregate(list_transform(hs, x -> ({a} * x + {b}) % {P}), 'min') AS mh{i}"
        for i, (a, b) in enumerate(coeffs)
    )
    band_cols = ", ".join(
        "concat_ws(',', " + ", ".join(f"mh{band * 4 + r}" for r in range(4)) + f") AS k{band}"
        for band in range(8)
    )
    band_match = " OR ".join(f"a.k{j} = b.k{j}" for j in range(8))
    chain = f"""
    hs AS (SELECT doc_id, list_transform(sh, s -> {_TOKHASH.format(s='s')} % {M}) AS hs FROM sh),
    sig AS (SELECT doc_id, {mh_cols} FROM hs),
    banded AS (SELECT doc_id, {band_cols} FROM sig)"""
    return chain, band_match


def _minhash_sql() -> str:
    """Banded MinHash LSH candidate pairs ∩ exact jaccard ≥ 0.6 — mirrors
    minhash_lsh_pairs(num_hashes=32, bands=8, seed=42) hash-for-hash."""
    chain, band_match = _banded_sql_parts()
    return f"""
    WITH {_jaccard_cte()},
    {chain},
    cands AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b ON a.doc_id < b.doc_id AND ({band_match}))
    SELECT c.id_a, c.id_b, round(j.jaccard, 4) AS jaccard
    FROM cands c JOIN jac j ON c.id_a = j.id_a AND c.id_b = j.id_b
    WHERE j.jaccard >= 0.6
    """


def _incremental_near_sql() -> str:
    """Survivor rule of incremental_dedup_near(threshold=0.6) over the
    % 5 corpus/delta split: near = band-collide AND exact jaccard >= 0.6;
    a delta doc drops iff it nears any corpus doc (either id order) or any
    SMALLER-id delta doc (near pairs carry id_a < id_b, so that is
    "appears as id_b of a delta-delta near pair")."""
    chain, band_match = _banded_sql_parts()
    return f"""
    WITH {_jaccard_cte()},
    {chain},
    cands AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b ON a.doc_id < b.doc_id AND ({band_match})),
    near AS (
      SELECT c.id_a, c.id_b FROM cands c
      JOIN jac j ON c.id_a = j.id_a AND c.id_b = j.id_b
      WHERE j.jaccard >= 0.6),
    dropped AS (
      SELECT d.doc_id FROM documents d WHERE d.doc_id % 5 = 0 AND (
        EXISTS (SELECT 1 FROM near p WHERE
          (p.id_a = d.doc_id AND p.id_b % 5 <> 0) OR
          (p.id_b = d.doc_id AND p.id_a % 5 <> 0)) OR
        EXISTS (SELECT 1 FROM near p WHERE
          p.id_b = d.doc_id AND p.id_a % 5 = 0)))
    SELECT doc_id, source FROM documents
    WHERE doc_id % 5 = 0 AND doc_id NOT IN (SELECT doc_id FROM dropped)
    ORDER BY doc_id
    """


def _simhash_sql() -> str:
    """16-bit simhash over distinct token hashes — mirrors dedup.simhash."""
    M = D.MINHASH_M
    terms = " + ".join(
        f"(CASE WHEN list_aggregate(list_transform(hs, "
        f"x -> ((x >> {j}) & 1) * 2 - 1), 'sum') > 0 THEN {2**j} ELSE 0 END)"
        for j in range(16)
    )
    return f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    hs AS (SELECT doc_id,
           list_distinct(list_transform(toks, t -> {_TOKHASH.format(s='t')} % {M})) AS hs
           FROM toks)
    SELECT doc_id, CAST({terms} AS BIGINT) AS simhash FROM hs
    """


def _lang_sql() -> str:
    score = {
        lang: f"len(list_filter(toks, x -> list_contains({sw}, x)))"
        for lang, sw in _SW.items()
    }
    gm = "greatest(" + ", ".join(f"s_{l}" for l in sorted(_SW)) + ")"
    cases = " ".join(
        f"WHEN s_{l} = gm AND gm > 0 THEN '{l}'" for l in sorted(_SW)
    )
    return f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    sc AS (SELECT doc_id,
      {", ".join(f"{expr} AS s_{l}" for l, expr in sorted(score.items()))}
      FROM toks),
    g AS (SELECT doc_id, s_de, s_en, s_es, s_fr, {gm} AS gm FROM sc)
    SELECT doc_id, CASE {cases} ELSE 'und' END AS lang_guess FROM g
    """


def _wav_oracle_sql() -> str:
    """DuckDB mirror of the WAV pipeline: signed int16 samples from the md5
    hex digest (4 hex chars each, big-endian, two's complement), mean/8."""
    terms = []
    for i in range(8):
        v = f"CAST(concat('0x', substr(h, {i * 4 + 1}, 4)) AS INTEGER)"
        terms.append(f"({v} - CASE WHEN {v} >= 32768 THEN 65536 ELSE 0 END)")
    mean = "(" + " + ".join(terms) + ") / 8.0"
    return f"""
    WITH s AS (SELECT doc_id, md5(text) AS h FROM documents)
    SELECT doc_id, 1 AS n_channels, 8000 AS sample_rate,
           CAST(8 AS BIGINT) AS n_frames, {mean} AS mean_pcm
    FROM s"""


def _frames_oracle_sql() -> str:
    """DuckDB mirror of the P6 frame-sampling pipeline: frame i (0..3) of
    each doc's synthetic video is one pixel whose R,G,B are md5 digest
    bytes 3i, 3i+1, 3i+2 — read straight out of the hex string."""

    def byte_at(p: int) -> str:
        return f"CAST(concat('0x', substr(h, {2 * p + 1}, 2)) AS INTEGER)"

    return f"""
    WITH s AS (SELECT doc_id, md5(text) AS h FROM documents),
         f AS (SELECT unnest(range(4)) AS i)
    SELECT doc_id,
           CAST(i * 1000 AS INT) AS frame_ts_ms,
           CAST(i AS INT) AS frame_index,
           1 AS frame_width, 1 AS frame_height,
           CASE i WHEN 0 THEN {byte_at(0)} WHEN 1 THEN {byte_at(3)}
                  WHEN 2 THEN {byte_at(6)} ELSE {byte_at(9)} END AS mean_r,
           CASE i WHEN 0 THEN {byte_at(1)} WHEN 1 THEN {byte_at(4)}
                  WHEN 2 THEN {byte_at(7)} ELSE {byte_at(10)} END AS mean_g,
           CASE i WHEN 0 THEN {byte_at(2)} WHEN 1 THEN {byte_at(5)}
                  WHEN 2 THEN {byte_at(8)} ELSE {byte_at(11)} END AS mean_b
    FROM s CROSS JOIN f"""


def oracle_sql() -> dict[str, str]:
    qlit = _Q0
    swr = (
        f"CAST(len(list_filter(toks, x -> list_contains({_SW_EN}, x))) AS DOUBLE)"
        " / CAST(len(toks) AS DOUBLE)"
    )
    pr = (
        "CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)"
        " / CAST(length(text) AS DOUBLE)"
    )
    ntok = "CAST(len(toks) AS BIGINT)"
    quality = (
        f"(CASE WHEN {ntok} >= 5 AND {ntok} <= 5000 THEN 1.0 ELSE 0.0 END) * 0.4"
        f" + least(({swr}) * 4.0, 1.0) * 0.4"
        f" + (1.0 - least(({pr}) * 10.0, 1.0)) * 0.2"
    )
    # --- quality_classifier: full diagonal-LDA fit replay (classifier.py).
    # Feature SQL mirrors quality_features() field-for-field (round 6);
    # every derived expression repeats the Python driver's left-to-right
    # IEEE double arithmetic exactly (see the module docstring's float
    # discipline) so weights, bias, and scores are bit-identical.
    _QC_FEATS = {
        "log_tokens": "round(ln(1.0 + CAST(len(toks) AS DOUBLE)), 6)",
        "avg_token_len": (
            "round(CAST(length(array_to_string(toks, '')) AS DOUBLE)"
            " / CAST(len(toks) AS DOUBLE), 6)"
        ),
        "stopword_ratio": (
            f"round(CAST(len(list_filter(toks, x -> list_contains({_SW_EN}, x)))"
            " AS DOUBLE) / CAST(len(toks) AS DOUBLE), 6)"
        ),
        "punct_ratio": (
            "round(CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))"
            " AS DOUBLE) / CAST(length(text) AS DOUBLE), 6)"
        ),
        "digit_ratio": (
            "round(CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))"
            " AS DOUBLE) / CAST(length(text) AS DOUBLE), 6)"
        ),
        "upper_ratio": (
            "round(CAST(length(regexp_replace(text, '[^A-Z]', '', 'g'))"
            " AS DOUBLE) / CAST(length(text) AS DOUBLE), 6)"
        ),
    }
    _qc_names = list(_QC_FEATS)
    _qc_feat_cols = ",\n              ".join(
        f"{e} AS {n}" for n, e in _QC_FEATS.items()
    )
    _qc_aggs = ",\n              ".join(
        f"round(sum({n}), 6) AS s1_{n}, round(sum({n}*{n}), 6) AS s2_{n}"
        for n in _qc_names
    )
    _qc_pivot = ",\n              ".join(
        f"(SELECT s1_{n} FROM qc_agg WHERE y) AS p1_{n},\n              "
        f"(SELECT s2_{n} FROM qc_agg WHERE y) AS p2_{n},\n              "
        f"(SELECT s1_{n} FROM qc_agg WHERE NOT y) AS q1_{n},\n              "
        f"(SELECT s2_{n} FROM qc_agg WHERE NOT y) AS q2_{n}"
        for n in _qc_names
    )
    # DuckDB lateral alias references keep each derivation a single
    # expression chain identical to fit_lda_quality's Python
    _qc_mdl = ",\n              ".join(
        f"p1_{n} / CAST(n1 AS DOUBLE) AS mu1_{n},\n              "
        f"q1_{n} / CAST(n0 AS DOUBLE) AS mu0_{n},\n              "
        f"p2_{n} / CAST(n1 AS DOUBLE) - mu1_{n} * mu1_{n} AS v1_{n},\n              "
        f"q2_{n} / CAST(n0 AS DOUBLE) - mu0_{n} * mu0_{n} AS v0_{n},\n              "
        f"(CAST(n1 AS DOUBLE) * v1_{n} + CAST(n0 AS DOUBLE) * v0_{n})"
        f" / CAST(n1 + n0 AS DOUBLE) AS vp_{n},\n              "
        f"(mu1_{n} - mu0_{n}) / (vp_{n} + 1e-6) AS w_{n}"
        for n in _qc_names
    )
    _qc_bias = "ln(CAST(n1 AS DOUBLE) / CAST(n0 AS DOUBLE))" + "".join(
        f" + (-0.5) * w_{n} * (mu1_{n} + mu0_{n})" for n in _qc_names
    )
    _qc_score = " + ".join(f"w_{n} * f.{n}" for n in _qc_names) + " + bias"
    _qc_sql = f"""
            WITH qc_feats AS (
              SELECT doc_id, lang,
              {_qc_feat_cols}
              FROM (SELECT doc_id, lang, text,
                           {_TOKS} AS toks
                    FROM documents
                    WHERE text IS NOT NULL AND length(trim(text)) > 0)),
            qc_agg AS (
              SELECT (lang = 'en') AS y, CAST(count(*) AS BIGINT) AS n,
              {_qc_aggs}
              FROM qc_feats GROUP BY 1),
            qc_p AS (
              SELECT (SELECT n FROM qc_agg WHERE y) AS n1,
                     (SELECT n FROM qc_agg WHERE NOT y) AS n0,
              {_qc_pivot}),
            qc_m AS (
              SELECT n1, n0,
              {_qc_mdl},
              {_qc_bias} AS bias
              FROM qc_p)
            SELECT d.doc_id,
                   round({_qc_score}, 6) AS quality_lr_score,
                   (round({_qc_score}, 6) > 0.0) AS quality_lr_pred
            FROM documents d
            LEFT JOIN qc_feats f USING (doc_id)
            CROSS JOIN qc_m
            ORDER BY d.doc_id"""
    oracles = {
        "knn_exact": f"""
            SELECT vec_id FROM embeddings
            ORDER BY {_dist("embedding", qlit)}, vec_id LIMIT {K}""",
        # binary shortlist: hamming = #(sign disagreements) ≡ bit_count of
        # the packed xor; shortlist cut (ham, vec_id), exact-L2 rerank cut
        "knn_binary": f"""
            WITH s AS (
              SELECT vec_id, embedding,
                     len(list_filter(list_zip(embedding, {qlit}),
                         p -> (CAST(p[1] AS DOUBLE) > 0)
                              <> (CAST(p[2] AS DOUBLE) > 0))) AS ham
              FROM embeddings
              ORDER BY ham, vec_id LIMIT {4 * K}
            )
            SELECT vec_id FROM s
            ORDER BY {_dist("embedding", qlit)}, vec_id LIMIT {K}""",
        "knn_filtered": f"""
            SELECT vec_id FROM embeddings WHERE label >= 2
            ORDER BY {_dist("embedding", qlit)}, vec_id LIMIT {K}""",
        "knn_distance": f"""
            SELECT vec_id, round({_dist("embedding", qlit)}, 4) AS distance
            FROM embeddings
            ORDER BY {_dist("embedding", qlit)}, vec_id LIMIT {K}""",
        "knn_ivf_exact": f"""
            SELECT vec_id FROM embeddings
            ORDER BY {_dist("embedding", qlit)}, vec_id LIMIT {K}""",
        "knn_pq": f"""
            SELECT vec_id FROM embeddings
            ORDER BY {_dist("embedding", qlit)}, vec_id LIMIT {K}""",
        # OPQ exactness envelope (rerank covers the table) ⇒ brute-force
        # top-k, same oracle as knn_pq; the rotation changes only the
        # (here fully-covered) shortlist
        "knn_opq": f"""
            SELECT vec_id FROM embeddings
            ORDER BY {_dist("embedding", qlit)}, vec_id LIMIT {K}""",
        # IVF-PQ exactness envelope (nprobe = n_clusters, rerank covers the
        # table) ⇒ brute-force top-k, same oracle as knn_pq
        "knn_ivfpq": f"""
            SELECT vec_id FROM embeddings
            ORDER BY {_dist("embedding", qlit)}, vec_id LIMIT {K}""",
        # SQ8 scalar quantization: codes = floor((x-mn)/sc + 0.5) - 128
        # (explicit floor(+0.5) — engine round() half-way modes differ),
        # distance over dequantized doubles, fold mirrors the Spark order
        "knn_quantized": f"""
            WITH base AS (SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                   FROM embeddings),
            m AS (SELECT vec_id, e,
                     list_aggregate(e, 'min') AS mn,
                     list_aggregate(e, 'max') AS mx FROM base),
            m2 AS (SELECT vec_id, e, mn,
                     CASE WHEN mx > mn THEN (mx - mn) / 255.0 ELSE 1.0 END AS sc
                   FROM m),
            c AS (SELECT vec_id, mn, sc,
                     list_transform(e, x -> floor((x - mn) / sc + 0.5) - 128) AS cd
                   FROM m2),
            d AS (SELECT vec_id,
                     sqrt(list_reduce(
                       list_transform(list_zip(cd, {qlit}), p ->
                         ((mn + (CAST(p[1] AS DOUBLE) + 128.0) * sc)
                           - CAST(p[2] AS DOUBLE)) *
                         ((mn + (CAST(p[1] AS DOUBLE) + 128.0) * sc)
                           - CAST(p[2] AS DOUBLE))),
                       (x, y) -> x + y)) AS qdist
                   FROM c)
            SELECT vec_id, round(qdist, 4) AS qdist FROM d
            ORDER BY round(qdist, 4), vec_id LIMIT {K}""",
        # appended index at nprobe = n_clusters ⇒ exact over the FULL table
        "knn_appended": f"""
            SELECT vec_id FROM embeddings
            ORDER BY {_dist("embedding", qlit)}, vec_id LIMIT {K}""",
        "knn_sql": f"""
            SELECT vec_id FROM embeddings
            ORDER BY {_dist("embedding", qlit)}, vec_id LIMIT {K}""",
        # knn_auto probes nprobe = n_clusters ⇒ exact ⇒ same answer as the
        # brute-force top-k (the WHERE vec_id >= 0 keeps every row)
        "knn_auto": f"""
            SELECT vec_id FROM embeddings WHERE vec_id >= 0
            ORDER BY {_dist("embedding", qlit)}, vec_id LIMIT {K}""",
        # knn_auto_pq: sidecar-routed IVF-PQ interception in the structural
        # exactness envelope (nprobe = n_clusters ⇒ rerank bumped to cover
        # the candidate set) ⇒ exactly the brute-force answer
        "knn_auto_pq": f"""
            SELECT vec_id FROM embeddings
            ORDER BY {_dist("embedding", qlit)}, vec_id LIMIT {K}""",
        # knn_auto_pq_fresh: same exactness envelope, but the route is
        # DISCOVERED from the persisted _pq_index/ registration by a
        # simulated-restart session that never registered it
        "knn_auto_pq_fresh": f"""
            SELECT vec_id FROM embeddings
            ORDER BY {_dist("embedding", qlit)}, vec_id LIMIT {K}""",
        # projected-distance interception shape — same values as the
        # knn_distance API twin (nprobe = n_clusters => exact)
        "knn_auto_distance": f"""
            SELECT vec_id, round({_dist("embedding", qlit)}, 4) AS distance
            FROM embeddings
            ORDER BY {_dist("embedding", qlit)}, vec_id LIMIT {K}""",
        # knn_auto_cosine probes all clusters ⇒ exactly the brute-force
        # cosine top-k (same row set as ann_cosine's oracle, ids only)
        "knn_auto_cosine": f"""
            SELECT vec_id FROM embeddings
            ORDER BY {_cos("embedding", _Q1)} DESC, vec_id LIMIT {K}""",
        # knn_ivf_approx: intentionally no oracle — approximate result,
        # recall-gated (reference stance: benches/query.rs:192-193)
        # knn_capped: nprobe = n_clusters + cap ≥ rows ⇒ exact filtered knn
        "knn_capped": f"""
            SELECT vec_id FROM embeddings WHERE label >= 2
            ORDER BY {_dist("embedding", qlit)}, vec_id LIMIT {K}""",
        "ann_cosine": f"""
            SELECT vec_id, round({_cos("embedding", _Q1)}, 4) AS cosine
            FROM embeddings
            ORDER BY {_cos("embedding", _Q1)} DESC, vec_id LIMIT {K}""",
        "ann_dot": f"""
            SELECT vec_id, round({_dot("embedding", _Q1)}, 4) AS dot
            FROM embeddings
            ORDER BY {_dot("embedding", _Q1)} DESC, vec_id LIMIT {K}""",
        "similarity_join": f"""
            WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
            scored AS (
              SELECT q.qid, c.vec_id, {_dist("c.embedding", "q.qv")} AS score
              FROM embeddings c CROSS JOIN q),
            ranked AS (
              SELECT qid, vec_id, score,
                     CAST(row_number() OVER (PARTITION BY qid ORDER BY score, vec_id) AS INT) AS rank
              FROM scored)
            SELECT qid, vec_id, round(score, 4) AS score, rank
            FROM ranked WHERE rank <= 3""",
        # similarity_join_ivf probes ALL clusters (nprobe = n_clusters) so
        # its answer is exactly the brute-force join — same oracle text.
        "similarity_join_ivf": f"""
            WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
            scored AS (
              SELECT q.qid, c.vec_id, {_dist("c.embedding", "q.qv")} AS score
              FROM embeddings c CROSS JOIN q),
            ranked AS (
              SELECT qid, vec_id, score,
                     CAST(row_number() OVER (PARTITION BY qid ORDER BY score, vec_id) AS INT) AS rank
              FROM scored)
            SELECT qid, vec_id, round(score, 4) AS score, rank
            FROM ranked WHERE rank <= 3""",
        # knn_batch is exact brute force over the same 5 queries — the
        # single-pass scores-array plan must equal the cross-join answer.
        "knn_batch": f"""
            WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
            scored AS (
              SELECT q.qid, c.vec_id, {_dist("c.embedding", "q.qv")} AS score
              FROM embeddings c CROSS JOIN q),
            ranked AS (
              SELECT qid, vec_id, score,
                     CAST(row_number() OVER (PARTITION BY qid ORDER BY score, vec_id) AS INT) AS rank
              FROM scored)
            SELECT qid, vec_id, round(score, 4) AS score, rank
            FROM ranked WHERE rank <= 3""",
        "rel_topk": """
            SELECT l_orderkey, l_extendedprice FROM lineitem
            WHERE l_quantity >= 30
            ORDER BY l_extendedprice DESC, l_orderkey LIMIT 100""",
        "rel_agg": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) AS sum_qty,
                   round(sum(l_extendedprice), 4) AS sum_base_price,
                   round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
                   CAST(count(*) AS BIGINT) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus""",
        "rel_join_agg": """
            SELECT o_orderkey,
                   round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
            FROM customer JOIN orders ON c_custkey = o_custkey
                          JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY o_orderkey
            ORDER BY revenue DESC, o_orderkey LIMIT 10""",
        "rel_join_region": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
            FROM region JOIN nation ON n_regionkey = r_regionkey
                        JOIN supplier ON s_nationkey = n_nationkey
                        JOIN customer ON c_nationkey = s_nationkey
                        JOIN orders ON o_custkey = c_custkey
                        JOIN lineitem ON l_orderkey = o_orderkey AND l_suppkey = s_suppkey
            WHERE r_name = 'ASIA'
            GROUP BY n_name""",
        "rel_window": """
            SELECT o_custkey, o_orderkey, rnk FROM (
              SELECT o_custkey, o_orderkey,
                     CAST(row_number() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rnk
              FROM orders) WHERE rnk <= 2""",
        "rel_join_part": """
            SELECT p_brand,
                   round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_size >= 30
            GROUP BY p_brand""",
        "rel_semijoin": """
            SELECT s_suppkey, s_name FROM supplier
            WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)""",
        "rel_conditional_agg": """
            SELECT o_orderstatus,
                   CAST(sum(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
                   CAST(sum(CASE WHEN o_totalprice > 200000 THEN 0 ELSE 1 END) AS BIGINT) AS n_low,
                   round(avg(o_totalprice), 4) AS avg_price
            FROM orders GROUP BY o_orderstatus""",
        "rel_antijoin": """
            SELECT c_custkey FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""",
        "rel_distinct_count": """
            SELECT c_mktsegment,
                   CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
                   round(avg(c_acctbal), 4) AS avg_bal
            FROM customer GROUP BY c_mktsegment""",
        "events_windowed": """
            SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS window_start,
                   event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2""",
        "events_stream_windowed": """
            SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS window_start,
                   event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2""",
        "events_sessions": """
            WITH o AS (SELECT user_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
            g AS (SELECT user_id, ts, sec,
                   CASE WHEN lag(sec) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                             OR sec - lag(sec) OVER (PARTITION BY user_id ORDER BY ts) >= 1800
                        THEN 1 ELSE 0 END AS ns
                  FROM o),
            s AS (SELECT user_id, sec,
                   CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
                  FROM g)
            SELECT user_id, session_id,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(max(sec) - min(sec) AS BIGINT) AS duration_s
            FROM s GROUP BY user_id, session_id""",
        # session_window merges events whose gap is STRICTLY below the
        # 30-min window (end-exclusive), so the islands oracle breaks on
        # gap >= 1800; session_start is the session's first event time.
        "events_stream_sessions": """
            WITH o AS (SELECT user_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
            g AS (SELECT user_id, ts, sec,
                   CASE WHEN lag(sec) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                             OR sec - lag(sec) OVER (PARTITION BY user_id ORDER BY ts) >= 1800
                        THEN 1 ELSE 0 END AS ns
                  FROM o),
            s AS (SELECT user_id, sec,
                   CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_ord
                  FROM g)
            SELECT user_id, min(sec) AS session_start,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM s GROUP BY user_id, session_ord""",
        "events_props": r"""
            SELECT event_id, k FROM (
              SELECT event_id,
                     TRY_CAST(regexp_extract(props, '"k"\s*:\s*(\d+)', 1) AS BIGINT) AS k
              FROM events) WHERE k >= 50""",
        # backward-inclusive as-of join ≡ DuckDB's native ASOF LEFT JOIN
        "events_asof": """
            WITH l AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type != 'purchase'),
                 r AS (SELECT user_id, ts, round(value, 2) AS last_purchase_value
                       FROM events WHERE event_type = 'purchase')
            SELECT l.event_id, r.last_purchase_value
            FROM l ASOF LEFT JOIN r
            ON l.user_id = r.user_id AND l.ts >= r.ts""",
        # banded range join: purchases × same-user view/click in the
        # strictly-preceding 24 h (half-open [ts-24h, ts)), counted per
        # purchase; microsecond-integer window arithmetic on both engines
        "events_range_join": """
            WITH p AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'purchase'),
                 v AS (SELECT user_id, ts, event_id AS prior_id FROM events
                       WHERE event_type IN ('view', 'click'))
            SELECT p.event_id, CAST(count(v.prior_id) AS BIGINT) AS n_prior
            FROM p LEFT JOIN v
              ON p.user_id = v.user_id
             AND epoch_us(v.ts) >= epoch_us(p.ts) - 86400000000
             AND epoch_us(v.ts) < epoch_us(p.ts)
            GROUP BY p.event_id ORDER BY p.event_id""",
        # LEFT-mode range join, un-aggregated: a NULL-bearing matched left
        # row must appear exactly once (the eqNullSafe anti-join fix) — a
        # duplicate changes the row count vs this plain LEFT JOIN
        "events_range_join_left": """
            WITH p AS (SELECT event_id, user_id, ts,
                         CASE WHEN value > 50 THEN round(value, 2) END AS big_val
                       FROM events WHERE event_type = 'purchase'),
                 c AS (SELECT user_id, ts AS ts2, event_id AS prior_id
                       FROM events WHERE event_type = 'click')
            SELECT p.event_id, p.big_val, c.prior_id
            FROM p LEFT JOIN c
              ON p.user_id = c.user_id
             AND epoch_us(c.ts2) >= epoch_us(p.ts) - 3600000000
             AND epoch_us(c.ts2) < epoch_us(p.ts)
            ORDER BY p.event_id, c.prior_id""",
        # z-order rewrite content-preservation gate: the Spark side queries
        # the REWRITTEN copy, the oracle queries the original files
        "layout_zorder": """
            SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
                   round(sum(l_extendedprice), 2) AS sum_price
            FROM lineitem
            WHERE l_quantity BETWEEN 10 AND 20
              AND l_extendedprice BETWEEN 10000 AND 30000
            GROUP BY l_returnflag ORDER BY l_returnflag""",
        # stream-stream join twin: the pair set is watermark-independent
        # for an inner join under availableNow (watermarks only bound
        # state), so the plain SQL join is an exact oracle
        "events_stream_join": """
            WITH p AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'purchase'),
                 c AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'click')
            SELECT p.event_id AS purchase_id, c.event_id AS click_id
            FROM p JOIN c
              ON p.user_id = c.user_id
             AND c.ts >= p.ts - INTERVAL 24 HOUR
             AND c.ts < p.ts""",
        # ordered funnel: greedy earliest-match per user; the iterated
        # min-ts construction is provably the same matcher as the Spark
        # side's sorted-fold for the unconstrained funnel
        "events_funnel": """
            WITH t1 AS (SELECT user_id, min(ts) AS ts1 FROM events
                        WHERE event_type = 'view' GROUP BY user_id),
                 t2 AS (SELECT e.user_id, min(e.ts) AS ts2 FROM events e
                        JOIN t1 USING (user_id)
                        WHERE e.event_type = 'click' AND e.ts > t1.ts1
                        GROUP BY e.user_id),
                 t3 AS (SELECT e.user_id, min(e.ts) AS ts3 FROM events e
                        JOIN t2 USING (user_id)
                        WHERE e.event_type = 'purchase' AND e.ts > t2.ts2
                        GROUP BY e.user_id)
            SELECT CAST(1 AS INTEGER) AS step, 'view' AS step_type,
                   CAST((SELECT count(*) FROM t1) AS BIGINT) AS n_users
            UNION ALL
            SELECT CAST(2 AS INTEGER), 'click',
                   CAST((SELECT count(*) FROM t2) AS BIGINT)
            UNION ALL
            SELECT CAST(3 AS INTEGER), 'purchase',
                   CAST((SELECT count(*) FROM t3) AS BIGINT)
            ORDER BY step""",
        # stream-static enrichment rollup; the streaming twin computes the
        # identical plan over readStream, so both share this oracle
        "events_enriched": """
            SELECT n_name, CAST(count(*) AS BIGINT) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM events
            JOIN customer ON user_id = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name""",
        # slowly-changing-dimension enrichment: the dim version effective at
        # each event's ts (point-in-time) ≡ DuckDB ASOF JOIN on eff_ts
        "events_scd_enriched": """
            WITH dim AS (
              SELECT n_nationkey, n_name || '#' || CAST(v AS VARCHAR) AS tier,
                     eff_ts
              FROM nation CROSS JOIN (VALUES
                (1, TIMESTAMP '2024-01-01 00:00:00'),
                (2, TIMESTAMP '2024-01-11 00:00:00'),
                (3, TIMESTAMP '2024-01-21 00:00:00')) ver(v, eff_ts)),
            ev AS (
              SELECT e.ts, e.value, c.c_nationkey FROM events e
              JOIN customer c ON e.user_id = c.c_custkey)
            SELECT tier, CAST(count(*) AS BIGINT) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM ev ASOF JOIN dim
              ON ev.c_nationkey = dim.n_nationkey AND ev.ts >= dim.eff_ts
            GROUP BY tier""",
        "rel_correlated": """
            SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            JOIN (SELECT l_partkey AS pk, 0.2 * avg(l_quantity) AS qty_limit
                  FROM lineitem GROUP BY l_partkey) a ON a.pk = l.l_partkey
            WHERE p.p_brand = 'Brand#23' AND l.l_quantity < a.qty_limit""",
        "rel_moving_avg": """
            SELECT o_custkey, o_orderkey,
                   round(avg(o_totalprice) OVER (
                     PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS avg_3
            FROM orders WHERE o_custkey < 100""",
        "rel_rollup": """
            SELECT l_returnflag, l_linestatus,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   round(sum(l_quantity), 4) AS sum_qty
            FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
        # salted join ≡ plain equi-join (the salt only re-shards the shuffle)
        "rel_skew_join": """
            SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
                   round(sum(o_totalprice), 4) AS total
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment""",
        "rel_setops": """
            SELECT 'both' AS tag, CAST(count(*) AS BIGINT) AS n FROM (
              SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
              INTERSECT
              SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
            UNION ALL
            SELECT 'only_building' AS tag, CAST(count(*) AS BIGINT) AS n FROM (
              SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
              EXCEPT
              SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')""",
        "events_stream_dedup": """
            SELECT DISTINCT user_id, event_type FROM events""",
        "events_stream_stats": """
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_events,
                   round(sum(value), 2) AS sum_value,
                   CAST(floor(epoch(min(ts))) AS BIGINT) AS first_ts,
                   CAST(floor(epoch(max(ts))) AS BIGINT) AS last_ts
            FROM events GROUP BY user_id""",
        "text_doc_freq": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            sh AS (SELECT doc_id, {_SHINGLES} AS sh FROM toks),
            ex AS (SELECT doc_id, unnest(sh) AS ngram FROM sh)
            SELECT ngram, CAST(count(*) AS BIGINT) AS df
            FROM ex GROUP BY ngram
            ORDER BY df DESC, ngram LIMIT 20""",
        "text_tfidf": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            ex AS (SELECT doc_id, unnest(toks) AS term FROM toks),
            exf AS (SELECT doc_id, term FROM ex WHERE term != ''),
            tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                   FROM exf GROUP BY doc_id, term),
            dfq AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df_t
                    FROM exf GROUP BY term),
            n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
            scored AS (
              SELECT tf.doc_id, tf.term, tf.tf,
                     CAST(tf.tf AS DOUBLE) *
                     (ln(CAST(n.n + 1 AS DOUBLE) / CAST(dfq.df_t + 1 AS DOUBLE)) + 1.0)
                     AS score
              FROM tf, dfq, n WHERE tf.term = dfq.term),
            ranked AS (
              SELECT doc_id, term, tf, score,
                     CAST(row_number() OVER (PARTITION BY doc_id
                          ORDER BY score DESC, term) AS INT) AS rank
              FROM scored)
            SELECT doc_id, term, tf, round(score, 4) AS score, rank
            FROM ranked WHERE rank <= 3""",
        "text_bm25": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            base AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM toks),
            ex AS (SELECT doc_id, dl, unnest(toks) AS term FROM base),
            m AS (SELECT doc_id, dl, term FROM ex
                  WHERE term IN ('spark', 'window', 'hash')),
            tf AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
                   FROM m GROUP BY doc_id, dl, term),
            dfq AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df_t
                    FROM m GROUP BY term),
            stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
                             CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
                      FROM base),
            scored AS (
              SELECT tf.doc_id,
                     ln(1.0 + (CAST(stats.n AS DOUBLE) - dfq.df_t + 0.5)
                              / (CAST(dfq.df_t AS DOUBLE) + 0.5))
                     * (CAST(tf.tf AS DOUBLE) * (1.2 + 1.0))
                       / (CAST(tf.tf AS DOUBLE)
                          + 1.2 * (1.0 - 0.75 + 0.75 * CAST(tf.dl AS DOUBLE) / stats.avgdl))
                     AS s
              FROM tf, dfq, stats WHERE tf.term = dfq.term)
            SELECT doc_id, round(sum(s), 4) AS score FROM scored
            GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 10""",
        # RRF fusion of the BM25 top-40 and cosine top-40 lists; contribs
        # are 1/(60+rank) doubles summed per doc (≤2 terms — commutative,
        # so fold order cannot diverge between engines)
        "hybrid_rrf": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            base AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM toks),
            ex AS (SELECT doc_id, dl, unnest(toks) AS term FROM base),
            m AS (SELECT doc_id, dl, term FROM ex
                  WHERE term IN ('spark', 'window', 'hash')),
            tf AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
                   FROM m GROUP BY doc_id, dl, term),
            dfq AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df_t
                    FROM m GROUP BY term),
            stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
                             CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
                      FROM base),
            scored AS (
              SELECT tf.doc_id,
                     ln(1.0 + (CAST(stats.n AS DOUBLE) - dfq.df_t + 0.5)
                              / (CAST(dfq.df_t AS DOUBLE) + 0.5))
                     * (CAST(tf.tf AS DOUBLE) * (1.2 + 1.0))
                       / (CAST(tf.tf AS DOUBLE)
                          + 1.2 * (1.0 - 0.75 + 0.75 * CAST(tf.dl AS DOUBLE) / stats.avgdl))
                     AS s
              FROM tf, dfq, stats WHERE tf.term = dfq.term),
            bscore AS (SELECT doc_id, round(sum(s), 4) AS score FROM scored
                       GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 40),
            lex AS (SELECT doc_id,
                           row_number() OVER (ORDER BY score DESC, doc_id) AS r
                    FROM bscore),
            ctop AS (SELECT vec_id, {_cos("embedding", _Q0)} AS c FROM embeddings
                     ORDER BY c DESC, vec_id LIMIT 40),
            sem AS (SELECT vec_id AS doc_id,
                           row_number() OVER (ORDER BY c DESC, vec_id) AS r
                    FROM ctop),
            u AS (SELECT doc_id, 1.0 / (60.0 + CAST(r AS DOUBLE)) AS contrib FROM lex
                  UNION ALL
                  SELECT doc_id, 1.0 / (60.0 + CAST(r AS DOUBLE)) FROM sem),
            f AS (SELECT doc_id, sum(contrib) AS s, CAST(count(*) AS INT) AS n_lists
                  FROM u GROUP BY doc_id)
            SELECT doc_id, round(s, 6) AS rrf_score, n_lists,
                   CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank
            FROM f ORDER BY s DESC, doc_id LIMIT {K}""",
        "text_repetition": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            g2 AS (SELECT doc_id,
                          CASE WHEN len(toks) >= 2 THEN
                            list_transform(range(1, len(toks) - 1 + 1),
                                           i -> array_to_string(toks[i:i+1], ' '))
                          ELSE [] END AS grams
                   FROM toks),
            ex AS (SELECT doc_id, unnest(grams) AS gram FROM g2),
            cnt AS (SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS c
                    FROM ex GROUP BY doc_id, gram),
            per AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS total,
                           CAST(count(*) AS BIGINT) AS dist,
                           CAST(max(c) AS BIGINT) AS top
                    FROM cnt GROUP BY doc_id)
            SELECT d.doc_id,
                   round(1.0 - CAST(dist AS DOUBLE) / CAST(total AS DOUBLE), 4)
                       AS dup_ngram_ratio,
                   round(CAST(top AS DOUBLE) / CAST(total AS DOUBLE), 4)
                       AS top_ngram_ratio
            FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id""",
        # PII scrub over deterministically-augmented docs: email scrubbed
        # FIRST, then url (same order as pq_vector_spark pii_scrub); counts
        # on the pre-scrub text. Patterns are the Java/RE2-portable subset.
        "text_pii": f"""
            WITH aug AS (SELECT doc_id,
                   text || ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com via https://ex.example/p/'
                        || CAST(doc_id AS VARCHAR) AS a
                 FROM documents)
            SELECT doc_id,
                   md5(regexp_replace(regexp_replace(a,
                         '{T.PII_PATTERNS["email"]}', '[PII]', 'g'),
                         '{T.PII_PATTERNS["url"]}', '[PII]', 'g')) AS scrub_md5,
                   CAST(len(regexp_extract_all(a, '{T.PII_PATTERNS["email"]}'))
                        AS BIGINT) AS n_emails,
                   CAST(len(regexp_extract_all(a, '{T.PII_PATTERNS["url"]}'))
                        AS BIGINT) AS n_urls
            FROM aug""",
        # corpus-MLE unigram log-prob, add-1 smoothing; avg rounded to 4
        # (absorbs sum-order drift, same convention as every agg row)
        "text_logprob": f"""
            WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
            vocab AS (SELECT term, CAST(count(*) AS BIGINT) AS c
                      FROM toks GROUP BY term),
            stats AS (SELECT CAST(sum(c) AS DOUBLE) AS n,
                             CAST(count(*) AS DOUBLE) AS v FROM vocab),
            per AS (SELECT t.doc_id,
                      round(avg(ln((CAST(c AS DOUBLE) + 1.0) / (n + 1.0 * v))), 4)
                          AS logprob,
                      CAST(count(*) AS BIGINT) AS n_tokens
                    FROM toks t JOIN vocab USING (term) CROSS JOIN stats
                    GROUP BY t.doc_id)
            SELECT d.doc_id, logprob, n_tokens
            FROM documents d LEFT JOIN per USING (doc_id)""",
        # BPE-ish pre-tokenizer counts: non-overlapping regex matches —
        # pattern restricted to Java/RE2-common semantics
        "text_tokens_bpe": f"""
            SELECT doc_id,
                   CAST(len({_TOKS}) AS BIGINT) AS n_ws_tokens,
                   CAST(len(regexp_extract_all(text,
                        '{T.BPE_SPLIT_PATTERN}')) AS BIGINT) AS n_bpe_tokens
            FROM documents""",
        # MOSS winnowing: 3-gram rolling hashes, min over each window of 4,
        # full windows only, distinct per doc (parallel unnest zips
        # gram/index lists)
        "text_winnow": f"""
            WITH {_winnow_fp_cte()}
            SELECT doc_id, fp FROM wfp""",
        "dedup_winnow_overlap": f"""
            WITH {_winnow_fp_cte()},
            pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     count(*) AS shared_fps
              FROM wfp a JOIN wfp b ON a.fp = b.fp AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id)
            SELECT id_a, id_b, shared_fps FROM pairs
            WHERE shared_fps >= 2 ORDER BY id_a, id_b""",
        # temperature-derived grouped token budgets: the oracle replays the
        # water-filling round (share ∝ pow(supply, 0.5), integer floors,
        # largest-remainder bonuses by fractional share with lang
        # tie-break) to the exact integers the driver computes, then the
        # per-group greedy prefix — identical cum<=budget window as
        # sample_budget_grouped. pow/floor/× are the same IEEE doubles on
        # both engines; budgets are integers, so the comparison can't sit
        # on a float boundary.
        "sample_budget_temperature": f"""
            WITH toks AS (SELECT doc_id, lang, text, n_chars, {_TOKS} AS toks
                          FROM documents),
            sc AS (SELECT doc_id, lang, round({quality}, 4) AS quality, n_chars
                   FROM toks),
            c AS (SELECT lang, CAST(sum(n_chars) AS DOUBLE) AS s
                  FROM documents GROUP BY lang),
            w AS (SELECT lang, pow(s, 0.5) AS pw FROM c),
            t AS (SELECT sum(pw ORDER BY lang) AS tot FROM w),
            i AS (SELECT lang, {TEMP_CHAR_BUDGET} * (pw / tot) AS ideal
                  FROM w, t),
            fl AS (SELECT lang, CAST(floor(ideal) AS BIGINT) AS base,
                          ideal - floor(ideal) AS frac FROM i),
            lv AS (SELECT {TEMP_CHAR_BUDGET} - sum(base) AS leftover FROM fl),
            bud AS (SELECT lang,
                           base + CASE WHEN row_number()
                                         OVER (ORDER BY frac DESC, lang)
                                       <= leftover THEN 1 ELSE 0 END AS budget
                    FROM fl, lv),
            r AS (SELECT doc_id, lang, quality, n_chars,
                         sum(n_chars) OVER (PARTITION BY lang
                             ORDER BY quality DESC, doc_id) AS cum
                  FROM sc)
            SELECT r.doc_id, r.lang, r.quality, CAST(r.n_chars AS BIGINT) AS chars
            FROM r JOIN bud USING (lang)
            WHERE r.cum <= bud.budget
            ORDER BY r.doc_id""",
        # epoch shuffle: the permutation key contract — every doc exactly
        # once, order key = 60-bit md5 of 'salt:epoch:key' (the same
        # _TOKHASH every sampler oracle replays)
        "epoch_shuffle": f"""
            SELECT doc_id,
                   {_TOKHASH.format(s="concat('bench:1:', CAST(doc_id AS VARCHAR))")}
                   AS epoch_ord,
                   TRUE AS audit_ok,
                   (SELECT count(*) FROM documents) AS audit_rows,
                   (SELECT count(DISTINCT doc_id) FROM documents)
                     AS audit_distinct_keys,
                   CAST(0 AS BIGINT) AS audit_mismatches
            FROM documents ORDER BY doc_id""",
        # temperature mixture: thresholds re-derived from the oracle's own
        # counts (q_i ∝ sqrt(n_i), c = min n_i/q_i, rate = min(c*q_i/n_i, 1),
        # floor(rate*1e6 + 0.5) — the integer threshold insulates the
        # comparison from last-ulp float divergence between engines)
        "sample_temperature": f"""
            WITH c AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n
                       FROM documents GROUP BY lang),
            q AS (SELECT lang, n,
                         pow(n, 0.5) / sum(pow(n, 0.5)) OVER () AS qi FROM c),
            s AS (SELECT min(n / qi) AS cc FROM q),
            r AS (SELECT lang,
                         CAST(floor(least(s.cc * qi / n, 1.0) * 1000000 + 0.5)
                              AS BIGINT) AS thr
                  FROM q, s)
            SELECT d.doc_id, d.lang FROM documents d JOIN r USING (lang)
            WHERE {_TOKHASH.format(s="concat('temp', CAST(doc_id AS VARCHAR))")}
                  % 1000000 < r.thr
            ORDER BY d.doc_id""",
        # token-budget curation ≡ the plain global greedy prefix (the Spark
        # side's bucketed two-phase plan must reproduce it exactly)
        "sample_budget": f"""
            WITH toks AS (SELECT doc_id, text, n_chars, {_TOKS} AS toks
                          FROM documents),
            sc AS (SELECT doc_id, round({quality}, 4) AS quality, n_chars
                   FROM toks),
            r AS (SELECT doc_id, quality, n_chars,
                         sum(n_chars) OVER (ORDER BY quality DESC, doc_id)
                             AS cum
                  FROM sc)
            SELECT doc_id, quality, CAST(n_chars AS BIGINT) AS chars
            FROM r WHERE cum <= {CHAR_BUDGET} ORDER BY doc_id""",
        # per-group greedy prefix: the window PARTITIONs BY lang and each
        # lang compares against its own budget (en 30k, default 12k)
        "sample_budget_grouped": f"""
            WITH toks AS (SELECT doc_id, lang, text, n_chars, {_TOKS} AS toks
                          FROM documents),
            sc AS (SELECT doc_id, lang, round({quality}, 4) AS quality, n_chars
                   FROM toks),
            r AS (SELECT doc_id, lang, quality, n_chars,
                         sum(n_chars) OVER (PARTITION BY lang
                             ORDER BY quality DESC, doc_id) AS cum
                  FROM sc)
            SELECT doc_id, lang, quality, CAST(n_chars AS BIGINT) AS chars
            FROM r
            WHERE cum <= CASE WHEN lang = 'en' THEN {GROUP_CHAR_BUDGETS["en"]}
                              ELSE {GROUP_DEFAULT_BUDGET} END
            ORDER BY doc_id""",
        # deterministic hash sampling ≡ the identical md5-bucket predicate
        "sample_hash": f"""
            SELECT doc_id, lang FROM documents
            WHERE {_TOKHASH.format(s="concat('bench', CAST(doc_id AS VARCHAR))")}
                  % 1000000 < 100000""",
        # priority sampling: pri = w / u with u = (hash+1)/2^60 — every
        # step an IEEE correctly-rounded cast/divide, so the draw replays
        # bit-for-bit (same CAST-then-divide order as the Spark side)
        "sample_weighted": f"""
            WITH pr AS (
              SELECT doc_id, lang,
                     CAST(n_chars AS DOUBLE) /
                     (CAST({_TOKHASH.format(s="concat('ps', CAST(doc_id AS VARCHAR))")}
                           + 1 AS DOUBLE) / 1152921504606846976.0) AS pri
              FROM documents
              WHERE n_chars IS NOT NULL AND CAST(n_chars AS DOUBLE) > 0),
            r AS (SELECT doc_id, lang,
                         row_number() OVER (PARTITION BY lang
                             ORDER BY pri DESC, doc_id) AS rn
                  FROM pr)
            SELECT doc_id, lang FROM r WHERE rn <= 10 ORDER BY doc_id""",
        # DSIR importance resampling (Xie et al. 2023): hashed uni+bigram
        # buckets (md5 % 4096), add-0.5-smoothed target/raw models, rounded
        # log weight, salted-hash Gumbel draw, top-200 — the full sampled
        # variant replayed end-to-end
        "sample_dsir": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            g AS (SELECT doc_id,
                    (CASE WHEN len(toks) >= 1 THEN toks
                          ELSE CAST([] AS VARCHAR[]) END)
                    || (CASE WHEN len(toks) >= 2 THEN
                          list_transform(range(1, len(toks)),
                                         i -> array_to_string(toks[i:i+1], ' '))
                        ELSE CAST([] AS VARCHAR[]) END) AS grams
                  FROM toks),
            ex AS (SELECT doc_id, gram
                   FROM (SELECT doc_id, unnest(grams) AS gram FROM g)
                   WHERE gram <> ''),
            ob AS (SELECT doc_id,
                          {_TOKHASH.format(s="gram")} % 4096 AS b
                   FROM ex),
            qt AS (SELECT b, CAST(count(*) AS BIGINT) AS nt FROM ob
                   WHERE doc_id % 50 = 7 GROUP BY b),
            qr AS (SELECT b, CAST(count(*) AS BIGINT) AS nr FROM ob
                   WHERE doc_id % 50 <> 7 GROUP BY b),
            tt AS (SELECT COALESCE(SUM(nt), 0) AS t FROM qt),
            tr AS (SELECT COALESCE(SUM(nr), 0) AS r FROM qr),
            -- r15 (ADVICE): the llr table is QUANTIZED to integer
            -- nano-units (floor(llr*1e9 + 0.5) — identical in Python on
            -- the Spark side), so the per-doc score is an EXACT bigint
            -- sum: no summation-order ulp risk on either engine (the r14
            -- float-sum form had a fixture doc 5e-11 from its round-6
            -- boundary). log_weight = s / 1e9, one IEEE division of the
            -- same integer on both engines.
            llr AS (SELECT COALESCE(qt.b, qr.b) AS b,
                      CAST(floor((ln((COALESCE(nt, 0) + 0.5)
                                     / (tt.t + 0.5 * 4096))
                                  - ln((COALESCE(nr, 0) + 0.5)
                                       / (tr.r + 0.5 * 4096))) * 1e9 + 0.5)
                           AS BIGINT) AS llr
                    FROM qt FULL OUTER JOIN qr ON qt.b = qr.b, tt, tr),
            w AS (SELECT ob.doc_id,
                         SUM(llr.llr) AS s
                  FROM ob JOIN llr USING (b)
                  WHERE ob.doc_id % 50 <> 7 GROUP BY ob.doc_id),
            -- r16 (ADVICE): gumbel_score is an exact nano-unit bigint sum
            -- like log_weight — the Gumbel term floor(-ln(-ln(u))*1e9+0.5)
            -- adds to the integer weight, then ONE /1e9. The r15 form
            -- rounded the float difference to 6 decimals, re-exposing the
            -- hash-attested column to the boundary-flip class the llr
            -- quantization killed. The floor margin is >=10 ulp over the
            -- entire 10^6-value u domain (pinned in test_dsir).
            sc AS (SELECT d.doc_id, CAST(w.s AS DOUBLE) / 1e9 AS log_weight,
                     CAST(w.s + CAST(floor(-ln(-ln(
                       ({_TOKHASH.format(s="concat('dsir', CAST(d.doc_id AS VARCHAR))")}
                        % 1000000 + 0.5) / 1000000.0)) * 1e9 + 0.5) AS BIGINT)
                       AS DOUBLE) / 1e9 AS gumbel_score
                   FROM documents d LEFT JOIN w ON d.doc_id = w.doc_id
                   WHERE d.doc_id % 50 <> 7),
            sel AS (SELECT * FROM sc
                    ORDER BY gumbel_score DESC NULLS LAST, doc_id LIMIT 200)
            SELECT doc_id, log_weight, gumbel_score FROM sel
            ORDER BY doc_id""",
        # CCNet terciles: smoothed-MLE logprob (the text_logprob CTE) cut
        # at per-language quantile_cont(1/3, 2/3); higher logprob = head;
        # boundary ties go DOWN (score <= threshold) on both engines
        "sample_ccnet": f"""
            WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
            vocab AS (SELECT term, CAST(count(*) AS BIGINT) AS c
                      FROM toks GROUP BY term),
            stats AS (SELECT CAST(sum(c) AS DOUBLE) AS n,
                             CAST(count(*) AS DOUBLE) AS v FROM vocab),
            per AS (SELECT t.doc_id,
                      round(avg(ln((CAST(c AS DOUBLE) + 1.0) / (n + 1.0 * v))), 4)
                          AS logprob
                    FROM toks t JOIN vocab USING (term) CROSS JOIN stats
                    GROUP BY t.doc_id),
            sc AS (SELECT d.doc_id, d.lang, per.logprob
                   FROM documents d JOIN per USING (doc_id)),
            thr AS (SELECT lang,
                      quantile_cont(logprob, CAST(1 AS DOUBLE)/3) AS t1,
                      quantile_cont(logprob, CAST(2 AS DOUBLE)/3) AS t2
                    FROM sc GROUP BY lang)
            SELECT sc.doc_id, sc.lang, sc.logprob,
                   CASE WHEN sc.logprob IS NULL THEN NULL
                        WHEN sc.logprob > thr.t2 THEN 'head'
                        WHEN sc.logprob > thr.t1 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM sc JOIN thr USING (lang)
            ORDER BY sc.doc_id""",
        # epoch repeat-factor mixture: copy index unrolled over VALUES,
        # bound i <= floor(f)+1, full copies i <= floor(f), fractional
        # copy gated by the salted md5 of (key, '#', i)
        "sample_repeat": f"""
            WITH f AS (SELECT doc_id, source,
                    CASE WHEN source = 'src0' THEN 2.5
                         WHEN source = 'src2' THEN 0.25
                         ELSE 1.0 END AS fac
                FROM documents),
            e(i) AS (VALUES (1), (2), (3))
            SELECT doc_id, source, CAST(i AS BIGINT) AS epoch
            FROM f CROSS JOIN e
            WHERE i <= floor(fac) + 1
              AND (i <= floor(fac)
                   OR CAST({_TOKHASH.format(
                       s="concat('rep', CAST(doc_id AS VARCHAR), '#', CAST(i AS VARCHAR))")}
                       % 1000000 AS DOUBLE)
                      < (fac - floor(fac)) * 1000000.0)
            ORDER BY doc_id, epoch""",
        "sample_mix": f"""
            SELECT doc_id, 'src0' AS mix_source FROM documents
            WHERE source = 'src0'
              AND {_TOKHASH.format(s="concat('src0', CAST(doc_id AS VARCHAR))")}
                  % 1000000 < 1000000
            UNION ALL
            SELECT doc_id, 'src1' AS mix_source FROM documents
            WHERE source = 'src1'
              AND {_TOKHASH.format(s="concat('src1', CAST(doc_id AS VARCHAR))")}
                  % 1000000 < 500000
            UNION ALL
            SELECT doc_id, 'src2' AS mix_source FROM documents
            WHERE source = 'src2'
              AND {_TOKHASH.format(s="concat('src2', CAST(doc_id AS VARCHAR))")}
                  % 1000000 < 250000""",
        # exact-k-per-stratum draw: identical md5 bucket ranking
        "sample_stratified": f"""
            WITH b AS (SELECT lang, doc_id, source,
                   {_TOKHASH.format(s="concat('strat', CAST(doc_id AS VARCHAR))")}
                       % 1000000 AS bk
                   FROM documents),
            r AS (SELECT lang, doc_id, source,
                         row_number() OVER (PARTITION BY lang
                                            ORDER BY bk, doc_id) AS rk
                  FROM b)
            SELECT lang, doc_id, source FROM r WHERE rk <= 7""",
        # eval-set n-gram contamination: distinct 3-gram shingle hashes,
        # corpus (% 50 <> 7) joined to eval (% 50 = 7), pairs with ≥2 shared
        # FULL bit-arithmetic replay of the Bloom path (operators/bloom.py)
        # — geometry (m, k from n_grams + fpp), double hashing
        # h_i = (g%m + i·((g>>17)|1)%m) % m, the word/bit build, and the
        # k-bit probe — so even genuine false positives replay exactly
        # (the gram hash is the 60-bit md5 prefix: always non-negative, so
        # signed BIGINT shifts/mods match numpy's uint64 arithmetic). The
        # threshold cut is min(3, ceil(0.5·min_eval_grams)); 0.5·int is
        # float-exact, so ceil replays bit-identically.
        "text_decontaminate_bloom": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            sh AS (SELECT doc_id, {_SHINGLES} AS sh FROM toks),
            ex AS (SELECT doc_id, len(sh) AS ng,
                          unnest(list_transform(sh, s -> {_TOKHASH.format(s='s')})) AS g
                   FROM sh),
            evg AS (SELECT DISTINCT g FROM ex WHERE doc_id % 50 = 7),
            geo AS (SELECT m, greatest(CAST(1 AS BIGINT),
                             least(CAST(16 AS BIGINT),
                                   CAST(round(CAST(m AS DOUBLE) / n * ln(2), 0)
                                        AS BIGINT))) AS k
                    FROM (SELECT n,
                            greatest(CAST(ceil(CAST(ceil(-n * ln(1e-6)
                                       / (ln(2) * ln(2))) AS BIGINT) / 32.0)
                                     AS BIGINT) * 32,
                                     CAST(64 AS BIGINT)) AS m
                          FROM (SELECT count(*) AS n FROM evg))),
            words AS (SELECT pos // 32 AS word,
                             bit_or(CAST(1 AS BIGINT)
                                    << CAST(pos % 32 AS INTEGER)) AS b
                      FROM (SELECT unnest(list_transform(range(0, k),
                              i -> ((g % m) + i * (((g >> 17) | 1) % m)) % m))
                              AS pos
                            FROM evg, geo)
                      GROUP BY 1),
            cpos AS (SELECT doc_id, g, unnest(list_transform(range(0, k),
                       i -> ((g % m) + i * (((g >> 17) | 1) % m)) % m)) AS pos
                     FROM ex, geo WHERE doc_id % 50 <> 7),
            gram_hit AS (SELECT doc_id, g,
                           bool_and(coalesce(
                             (w.b & (CAST(1 AS BIGINT)
                                     << CAST(pos % 32 AS INTEGER)))
                             = (CAST(1 AS BIGINT)
                                << CAST(pos % 32 AS INTEGER)), FALSE)) AS hit
                         FROM cpos LEFT JOIN words w ON w.word = pos // 32
                         GROUP BY doc_id, g),
            -- LEFT join back to the corpus doc set: a doc whose text is
            -- NULL never reaches ex (unnest of NULL emits no rows) but the
            -- Spark side keeps it as a 0-hit survivor — coalesce to 0 so a
            -- fixture refresh with NULL text cannot diverge the row
            hits AS (SELECT d.doc_id,
                            CAST(coalesce(sum(CASE WHEN hit THEN 1 ELSE 0
                                               END), 0)
                                 AS BIGINT) AS bloom_hits
                     FROM (SELECT doc_id FROM documents
                           WHERE doc_id % 50 <> 7) d
                     LEFT JOIN gram_hit USING (doc_id)
                     GROUP BY d.doc_id),
            mn AS (SELECT min(ng) AS mn
                   FROM (SELECT DISTINCT doc_id, ng FROM ex
                         WHERE doc_id % 50 = 7 AND ng >= 1)),
            cut AS (SELECT least(CAST(3 AS BIGINT),
                                 greatest(CAST(1 AS BIGINT),
                                          CAST(ceil(0.5 * mn) AS BIGINT))) AS c
                    FROM mn)
            SELECT doc_id, bloom_hits FROM hits, cut
            WHERE bloom_hits < cut.c ORDER BY doc_id""",
        "text_decontaminate": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            sh AS (SELECT doc_id, {_SHINGLES} AS sh FROM toks),
            ex AS (SELECT doc_id, len(sh) AS ng,
                          unnest(list_transform(sh, s -> {_TOKHASH.format(s='s')})) AS g
                   FROM sh),
            ev AS (SELECT doc_id AS eid, ng AS eng, g FROM ex WHERE doc_id % 50 = 7),
            co AS (SELECT doc_id, g FROM ex WHERE doc_id % 50 <> 7),
            j AS (SELECT co.doc_id, ev.eid, ev.eng,
                         CAST(count(*) AS BIGINT) AS shared
                  FROM co JOIN ev USING (g) GROUP BY 1, 2, 3)
            SELECT doc_id, eid AS eval_id, shared AS shared_grams,
                   CAST(eng AS BIGINT) AS eval_grams,
                   round(CAST(shared AS DOUBLE) / CAST(eng AS DOUBLE), 4)
                       AS overlap_frac
            FROM j WHERE shared >= 2""",
        # survivors of the fast-family (xxhash64) exact decontamination,
        # replayed via the PORTABLE md5 family: survivor sets are gram-
        # hash-family-independent absent a 60-bit collision (see the
        # entry docstring; 1M-doc parity asserted in bench scale_dedup)
        "text_decontaminate_fast": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            sh AS (SELECT doc_id, {_SHINGLES} AS sh FROM toks),
            ex AS (SELECT doc_id, len(sh) AS ng,
                          unnest(list_transform(sh, s -> {_TOKHASH.format(s='s')})) AS g
                   FROM sh),
            ev AS (SELECT doc_id AS eid, ng AS eng, g FROM ex WHERE doc_id % 50 = 7),
            co AS (SELECT doc_id, g FROM ex WHERE doc_id % 50 <> 7),
            j AS (SELECT co.doc_id, ev.eid, ev.eng,
                         CAST(count(*) AS BIGINT) AS shared
                  FROM co JOIN ev USING (g) GROUP BY 1, 2, 3),
            flagged AS (SELECT DISTINCT doc_id FROM j
                        WHERE shared >= 3
                           OR CAST(shared AS DOUBLE) / CAST(eng AS DOUBLE)
                              >= 0.5)
            SELECT d.doc_id, d.lang, d.source FROM documents d
            WHERE d.doc_id % 50 <> 7
              AND d.doc_id NOT IN (SELECT doc_id FROM flagged)
            ORDER BY d.doc_id""",
        # concatenate-and-cut packing: exclusive running token sum per
        # source (doc_id order), sequence ids = floor-div by the budget
        "pack_sequences": f"""
            WITH toks AS (SELECT doc_id, source,
                                 CAST(len({_TOKS}) AS BIGINT) AS n_tokens
                          FROM documents),
            w AS (SELECT doc_id, source, n_tokens,
                         CAST(sum(n_tokens) OVER (PARTITION BY source
                              ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                              - n_tokens AS BIGINT) AS start_offset
                  FROM toks)
            SELECT doc_id, source, n_tokens, start_offset,
                   CAST(floor(start_offset / 256) AS BIGINT) AS first_seq,
                   CAST(floor((start_offset + greatest(n_tokens, 1) - 1) / 256)
                        AS BIGINT) AS last_seq
            FROM w""",
        # CDC merge, last-writer-wins (version DESC, op DESC): base rows
        # with no change survive, winning upserts apply, deletes vanish
        "merge_upsert": """
            WITH base AS (SELECT c_custkey, c_name, c_nationkey, c_acctbal,
                                 c_mktsegment FROM customer),
            changes AS (
              SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
                     'D' AS op, 1 AS version FROM base WHERE c_custkey % 10 = 0
              UNION ALL
              SELECT c_custkey, 'UPD-' || CAST(c_custkey AS VARCHAR), c_nationkey,
                     round(c_acctbal + 100.0, 2), 'RETAIL', 'U', 2
              FROM base WHERE c_custkey % 10 = 1
              UNION ALL
              SELECT c_custkey, 'STALE', c_nationkey, 0.0, c_mktsegment, 'U', 1
              FROM base WHERE c_custkey % 10 = 1
              UNION ALL
              SELECT c_custkey + 1000000, 'NEW-' || CAST(c_custkey AS VARCHAR),
                     c_nationkey, 10.0, 'NEW', 'U', 1
              FROM base WHERE c_custkey % 10 = 3),
            w AS (SELECT *, row_number() OVER (PARTITION BY c_custkey
                           ORDER BY version DESC, (op = 'D') DESC, op DESC)
                       AS rk FROM changes),
            win AS (SELECT * FROM w WHERE rk = 1)
            SELECT c_custkey, c_name, c_nationkey,
                   round(c_acctbal, 2) AS c_acctbal, c_mktsegment
            FROM base WHERE c_custkey NOT IN (SELECT c_custkey FROM win)
            UNION ALL
            SELECT c_custkey, c_name, c_nationkey, round(c_acctbal, 2),
                   c_mktsegment
            FROM win WHERE op <> 'D'""",
        # map-side chunking: starts every 100 chars (120-char windows,
        # 20 overlap), 1-based substr on both engines
        "text_chunks": """
            WITH st AS (SELECT doc_id, text,
                               range(0, greatest(length(text) - 1, 0) + 1, 100)
                                   AS starts
                        FROM documents),
            ex AS (SELECT doc_id, text, unnest(starts) AS s,
                          generate_subscripts(starts, 1) AS i
                   FROM st)
            SELECT doc_id, CAST(i - 1 AS INT) AS chunk_id,
                   CAST(s AS BIGINT) AS chunk_start,
                   md5(substr(text, CAST(s AS INT) + 1, 120)) AS chunk_md5
            FROM ex""",
        # one-pass constraint suite; NULL rule result counts as violation
        "quality_checks": """
            WITH w AS (SELECT CAST(count(*) AS BIGINT) AS total,
                CAST(sum(CASE WHEN NOT coalesce(doc_id >= 0, FALSE)
                         THEN 1 ELSE 0 END) AS BIGINT) AS v_doc_id_nonneg,
                CAST(sum(CASE WHEN NOT coalesce(
                         lang IN ('en','de','es','fr','zh'), FALSE)
                         THEN 1 ELSE 0 END) AS BIGINT) AS v_lang_known,
                CAST(sum(CASE WHEN NOT coalesce(length(text) = n_chars, FALSE)
                         THEN 1 ELSE 0 END) AS BIGINT) AS v_n_chars_consistent,
                CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                    AS v_text_not_null
                FROM documents)
            SELECT rule, violations, total,
                   round(1.0 - CAST(violations AS DOUBLE)
                             / CAST(total AS DOUBLE), 6) AS pass_frac
            FROM (
              SELECT 'doc_id_nonneg' AS rule, v_doc_id_nonneg AS violations,
                     total FROM w
              UNION ALL SELECT 'lang_known', v_lang_known, total FROM w
              UNION ALL SELECT 'n_chars_consistent', v_n_chars_consistent,
                               total FROM w
              UNION ALL SELECT 'text_not_null', v_text_not_null, total FROM w
            )""",
        # incremental dedup: delta survivors (min id per fingerprint) whose
        # content is absent from the standing corpus
        # persisted exact-index probe: SAME survivor semantics as
        # dedup_incremental — the oracle IS the raw-corpus replay, which is
        # exactly the equivalence the row attests
        "dedup_incremental_indexed": f"""
            WITH fp AS (SELECT doc_id, source, md5({_NORM}) AS f FROM documents),
            delta AS (SELECT * FROM fp WHERE doc_id % 5 = 0),
            corpus AS (SELECT DISTINCT f FROM fp WHERE doc_id % 5 <> 0),
            surv AS (SELECT *, row_number() OVER (PARTITION BY f
                                                  ORDER BY doc_id) AS rn
                     FROM delta)
            SELECT doc_id, source FROM surv
            WHERE rn = 1 AND f NOT IN (SELECT f FROM corpus)""",
        "dedup_incremental": f"""
            WITH fp AS (SELECT doc_id, source, md5({_NORM}) AS f FROM documents),
            delta AS (SELECT * FROM fp WHERE doc_id % 5 = 0),
            corpus AS (SELECT DISTINCT f FROM fp WHERE doc_id % 5 <> 0),
            surv AS (SELECT *, row_number() OVER (PARTITION BY f
                                                  ORDER BY doc_id) AS rn
                     FROM delta)
            SELECT doc_id, source FROM surv
            WHERE rn = 1 AND f NOT IN (SELECT f FROM corpus)""",
        # per-label mean embedding, LONG format (scalar cells only — the
        # driver canonicalizer cannot hash array cells): positional unnest
        # → per-(label, dim) avg (rounded 4dp, the rel_agg ulp guard)
        "embedding_centroids": """
            WITH ex AS (SELECT label, unnest(embedding) AS x,
                               generate_subscripts(embedding, 1) AS i
                        FROM embeddings WHERE embedding IS NOT NULL)
            SELECT label, i - 1 AS dim_idx,
                   round(avg(CAST(x AS DOUBLE)), 4) AS mean,
                   CAST(count(*) AS BIGINT) AS n_vectors
            FROM ex GROUP BY label, i""",
        # per-source percent-rank calibration: (rank−1)/(n−1), ANSI tie
        # semantics — integer/integer math both engines
        "text_score_normalize": """
            SELECT doc_id, source,
                   round(percent_rank() OVER (PARTITION BY source
                                              ORDER BY n_chars), 6) AS score_qn
            FROM documents""",
        # importance sampling: keep iff bucket < floor(p·1e6 + 0.5), p =
        # the doc's own quality score (identical fragment as text_quality)
        "sample_importance": f"""
            WITH toks AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
            q AS (SELECT doc_id, {quality} AS p FROM toks)
            SELECT doc_id, round(p, 4) AS prob FROM q
            WHERE {_TOKHASH.format(s="concat('imp', CAST(doc_id AS VARCHAR))")}
                      % 1000000
                  < CAST(floor(least(greatest(p, 0.0), 1.0) * 1000000 + 0.5)
                         AS BIGINT)""",
        # one-pass column profile, min/max stringified (non-float columns
        # only — float formatting differs across engines)
        "quality_profile": """
            SELECT 'doc_id' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_nulls,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct,
                   CAST(min(doc_id) AS VARCHAR) AS min_value,
                   CAST(max(doc_id) AS VARCHAR) AS max_value
            FROM documents
            UNION ALL
            SELECT 'lang', CAST(count(*) AS BIGINT),
                   CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                   CAST(count(DISTINCT lang) AS BIGINT),
                   CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR)
            FROM documents
            UNION ALL
            SELECT 'source', CAST(count(*) AS BIGINT),
                   CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                   CAST(count(DISTINCT source) AS BIGINT),
                   CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
            FROM documents
            UNION ALL
            SELECT 'n_chars', CAST(count(*) AS BIGINT),
                   CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                   CAST(count(DISTINCT n_chars) AS BIGINT),
                   CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
            FROM documents""",
        # per-source duplication dashboard over content fingerprints
        "dedup_rates": f"""
            WITH fp AS (SELECT source, md5({_NORM}) AS f FROM documents)
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(DISTINCT f) AS BIGINT) AS n_distinct,
                   round(1.0 - CAST(count(DISTINCT f) AS DOUBLE)
                             / CAST(count(*) AS DOUBLE), 6) AS dup_rate
            FROM fp GROUP BY source""",
        # declared-vs-guessed language confusion (guess = text_lang's oracle)
        "text_lang_confusion": f"""
            SELECT d.lang AS declared, lg.lang_guess AS guessed,
                   CAST(count(*) AS BIGINT) AS n_docs
            FROM documents d JOIN ({_lang_sql()}) lg USING (doc_id)
            GROUP BY 1, 2""",
        # hourly heavy hitters: per-window counts then rank ≤ 3, ties by key
        "events_trending": """
            WITH c AS (SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT)
                              AS window_start,
                              event_type, CAST(count(*) AS BIGINT) AS n_events
                       FROM events GROUP BY 1, 2),
            r AS (SELECT *, CAST(row_number() OVER (PARTITION BY window_start
                           ORDER BY n_events DESC, event_type) AS INT) AS rank
                  FROM c)
            SELECT window_start, event_type, n_events, rank
            FROM r WHERE rank <= 3""",
        # per-label norm vitals: norms rounded to 4dp before aggregation
        # (both engines), exact quantile_cont over the rounded values
        "embedding_norms": f"""
            WITH n AS (SELECT label,
                              CASE WHEN embedding IS NULL THEN NULL
                                   ELSE round({_nrm("embedding")}, 4) END AS nv
                       FROM embeddings)
            SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
                   CAST(sum(CASE WHEN nv IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_null,
                   round(avg(nv), 4) AS mean_norm,
                   round(quantile_cont(nv, 0.5), 4) AS p50_norm,
                   round(quantile_cont(nv, 0.95), 4) AS p95_norm
            FROM n GROUP BY label""",
        # Markov transitions: lag over (ts, event_id)-ordered per-user
        # sequences, row-normalized counts
        "events_transitions": """
            WITH seq AS (SELECT user_id, event_type,
                                lag(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS prev
                         FROM events),
            pairs AS (SELECT prev AS from_type, event_type AS to_type,
                             CAST(count(*) AS BIGINT) AS n
                      FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
            tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS t
                    FROM pairs GROUP BY 1)
            SELECT p.from_type, p.to_type, p.n,
                   round(CAST(p.n AS DOUBLE) / CAST(t.t AS DOUBLE), 6) AS prob
            FROM pairs p JOIN tot t USING (from_type)""",
        # two-proportion z readout: distinct (unit, variant) exposure ∧
        # conversion, pooled SE; variant = user parity
        "events_abtest": """
            WITH ev AS (SELECT *, CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END
                               AS variant FROM events),
            exposed AS (SELECT DISTINCT variant AS v, user_id AS u FROM ev
                        WHERE event_type = 'view'),
            conv AS (SELECT DISTINCT variant AS v, user_id AS u FROM ev
                     WHERE event_type = 'purchase'),
            per AS (SELECT e.v, CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(CASE WHEN c.u IS NULL THEN 0 ELSE 1 END)
                                AS BIGINT) AS conv
                    FROM exposed e LEFT JOIN conv c ON e.v = c.v AND e.u = c.u
                    GROUP BY e.v)
            , pairs AS (
              SELECT a.v AS variant_a, b.v AS variant_b, a.n AS n_a, b.n AS n_b,
                     CAST(a.conv AS DOUBLE) / a.n AS pa,
                     CAST(b.conv AS DOUBLE) / b.n AS pb,
                     sqrt((CAST(a.conv + b.conv AS DOUBLE) / (a.n + b.n))
                          * (1.0 - CAST(a.conv + b.conv AS DOUBLE) / (a.n + b.n))
                          * (1.0 / a.n + 1.0 / b.n)) AS se
              FROM per a JOIN per b ON a.v < b.v)
            SELECT variant_a, variant_b, n_a, n_b,
                   round(pa, 6) AS rate_a, round(pb, 6) AS rate_b,
                   round(CASE WHEN se = 0.0 THEN 0.0
                         ELSE (pa - pb) / se END, 6) AS z,
                   abs(CASE WHEN se = 0.0 THEN 0.0
                       ELSE (pa - pb) / se END) >= 1.96 AS significant
            FROM pairs""",
        # weekly cohort retention: Monday-truncated weeks both engines,
        # offset = exact day-diff / 7 over distinct (user, week) activity
        "events_retention": """
            WITH act AS (SELECT DISTINCT user_id AS u,
                                CAST(date_trunc('week', ts) AS DATE) AS w
                         FROM events),
            first AS (SELECT u, min(w) AS cohort FROM act GROUP BY u)
            SELECT cohort AS cohort_week,
                   CAST(datediff('day', cohort, w) / 7 AS BIGINT) AS week_offset,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM act JOIN first USING (u)
            GROUP BY 1, 2""",
        # ColBERT-style MaxSim: 8×8-dim token-vector bags, score =
        # Σᵢ maxⱼ qᵢ·dⱼ; identical left-to-right double folds both sides
        "maxsim": f"""
            WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
            d AS (SELECT vec_id,
                         list_transform(range(0, 8),
                                        i -> embedding[i*8+1:i*8+8]) AS vecs
                  FROM embeddings WHERE embedding IS NOT NULL)
            SELECT d.vec_id, round(
              list_reduce(list_transform(range(0, 8), i ->
                 list_max(list_transform(d.vecs, dv ->
                    list_reduce(list_transform(list_zip(q.qe[i*8+1:i*8+8], dv),
                        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
                        (x, y) -> x + y)
                 ))
              ), (x, y) -> x + y), 4) AS maxsim
            FROM d, q ORDER BY maxsim DESC, vec_id LIMIT {K}""",
        # PSI drift: equal-width length buckets (w=100, clamped), shares =
        # count/total, contribution (p−q)·ln(p/q) with 1e-6 floor
        "corpus_drift": """
            WITH a AS (SELECT CAST(least(greatest(
                           floor(CAST(n_chars AS DOUBLE) / 100.0), 0), 9) AS INT)
                           AS bucket
                       FROM documents WHERE doc_id % 2 = 0 AND n_chars IS NOT NULL),
            b AS (SELECT CAST(least(greatest(
                      floor(CAST(n_chars AS DOUBLE) / 100.0), 0), 9) AS INT)
                      AS bucket
                  FROM documents WHERE doc_id % 2 = 1 AND n_chars IS NOT NULL),
            sa AS (SELECT bucket,
                          CAST(count(*) AS DOUBLE)
                              / (SELECT CAST(count(*) AS DOUBLE) FROM a) AS share_a
                   FROM a GROUP BY bucket),
            sb AS (SELECT bucket,
                          CAST(count(*) AS DOUBLE)
                              / (SELECT CAST(count(*) AS DOUBLE) FROM b) AS share_b
                   FROM b GROUP BY bucket),
            allb AS (SELECT CAST(unnest(range(0, 10)) AS INT) AS bucket),
            j AS (SELECT allb.bucket,
                         coalesce(sa.share_a, 0.0) AS share_a,
                         coalesce(sb.share_b, 0.0) AS share_b
                  FROM allb LEFT JOIN sa USING (bucket) LEFT JOIN sb USING (bucket))
            SELECT bucket, round(share_a, 6) AS share_a,
                   round(share_b, 6) AS share_b,
                   round((greatest(share_a, 1e-6) - greatest(share_b, 1e-6))
                         * ln(greatest(share_a, 1e-6) / greatest(share_b, 1e-6)), 6)
                       AS psi_contrib
            FROM j""",
        # farthest-from-centroid per label: centroid CTE (identical to
        # embedding_centroids) + exact L2 fold vs the rounded centroid
        "embedding_outliers": f"""
            WITH ex AS (SELECT label, unnest(embedding) AS x,
                               generate_subscripts(embedding, 1) AS i
                        FROM embeddings WHERE embedding IS NOT NULL),
            pd AS (SELECT label, i, round(avg(CAST(x AS DOUBLE)), 4) AS m
                   FROM ex GROUP BY label, i),
            cent AS (SELECT label, list(m ORDER BY i) AS c FROM pd GROUP BY label),
            d AS (SELECT e.label, e.vec_id,
                         round({_dist("e.embedding", "cent.c")}, 4) AS dist
                  FROM embeddings e JOIN cent USING (label)
                  WHERE e.embedding IS NOT NULL),
            r AS (SELECT *, row_number() OVER (PARTITION BY label
                           ORDER BY dist DESC, vec_id) AS rk FROM d)
            SELECT label, vec_id, dist FROM r WHERE rk <= 5""",
        "text_quantiles": """
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   round(quantile_cont(CAST(length(text) AS DOUBLE), 0.25), 4) AS q_25,
                   round(quantile_cont(CAST(length(text) AS DOUBLE), 0.5), 4) AS q_50,
                   round(quantile_cont(CAST(length(text) AS DOUBLE), 0.75), 4) AS q_75,
                   round(quantile_cont(CAST(length(text) AS DOUBLE), 0.9), 4) AS q_90
            FROM documents""",
        # duplicate-line fractions: group the RAW spans (the Spark side
        # md5-compresses them for the exchange — identical counts), same
        # blank-span exclusion, NULL for span-less docs via the left join
        "text_dup_spans": """
            WITH ex AS (SELECT doc_id,
                     unnest(list_filter(string_split(text, chr(10)),
                                        s -> trim(s) <> '')) AS sp
                   FROM documents),
            g AS (SELECT doc_id, sp, count(*) AS c, max(length(sp)) AS l
                  FROM ex GROUP BY doc_id, sp),
            per AS (SELECT doc_id, sum(c) AS tot,
                           sum(CASE WHEN c > 1 THEN c END) AS dup,
                           sum(c * l) AS totc,
                           sum(CASE WHEN c > 1 THEN c * l END) AS dupc
                    FROM g GROUP BY doc_id)
            SELECT d.doc_id,
                   round(coalesce(dup, 0) / CAST(tot AS DOUBLE), 4)
                     AS dup_span_frac,
                   round(coalesce(dupc, 0) / CAST(totc AS DOUBLE), 4)
                     AS dup_span_char_frac
            FROM documents d LEFT JOIN per USING (doc_id)
            ORDER BY d.doc_id""",
        # Gopher rule filters: every rule recomputed in SQL — same token
        # split, same int-derived double ratios, boolean output only
        "text_gopher": f"""
            WITH t AS (SELECT doc_id, text,
                     list_filter({_TOKS}, x -> x <> '') AS words,
                     string_split(text, chr(10)) AS lines
                   FROM documents),
            m AS (SELECT doc_id,
                     len(words) AS n,
                     CASE WHEN len(words) > 0 THEN
                       CAST(list_reduce(list_transform(words,
                              x -> length(x)), (a, b) -> a + b) AS DOUBLE)
                       / len(words) END AS mean_wl,
                     length(text) - length(replace(text, '#', '')) AS hashc,
                     (length(text) - length(replace(text, '...', ''))) / 3
                       + (length(text) - length(replace(text, '…', '')))
                       AS ellc,
                     len(list_filter(words,
                         x -> regexp_matches(x, '[a-z]'))) AS alpha,
                     len(list_intersect(list_distinct(words),
                         ['the','be','to','of','and','that','have','with']))
                       AS stop_hits,
                     len(lines) AS n_lines,
                     len(list_filter(lines, l ->
                         starts_with(ltrim(l), '•') OR
                         starts_with(ltrim(l), '-') OR
                         starts_with(ltrim(l), '*'))) AS bullets,
                     len(list_filter(lines, l ->
                         ends_with(rtrim(l), '...') OR
                         ends_with(rtrim(l), '…'))) AS ells
                   FROM t),
            fl AS (SELECT doc_id, CAST(n AS BIGINT) AS n_words,
                     (n >= 50 AND n <= 100000) AS words_ok,
                     (n > 0 AND mean_wl >= 3.0 AND mean_wl <= 10.0)
                       AS mean_word_len_ok,
                     (n > 0 AND (hashc + ellc) / n <= 0.1) AS symbol_ok,
                     (CAST(bullets AS DOUBLE) / n_lines <= 0.9) AS bullet_ok,
                     (CAST(ells AS DOUBLE) / n_lines <= 0.3) AS ellipsis_ok,
                     (n > 0 AND CAST(alpha AS DOUBLE) / n >= 0.8) AS alpha_ok,
                     (stop_hits >= 2) AS stop_ok
                   FROM m)
            SELECT doc_id, n_words, words_ok, mean_word_len_ok, symbol_ok,
                   bullet_ok, ellipsis_ok, alpha_ok, stop_ok,
                   (words_ok AND mean_word_len_ok AND symbol_ok AND bullet_ok
                    AND ellipsis_ok AND alpha_ok AND stop_ok) AS passes
            FROM fl ORDER BY doc_id""",
        # C4 cleaning rules: line survives iff terminal punctuation + >= 5
        # words + no 'javascript'; page flags on sentence-ender count of
        # the CLEANED text, 'lorem ipsum', '{{'. Cleaned text compared as
        # md5 (pipeline_curate convention).
        "text_c4": """
            WITH aug AS (SELECT doc_id,
                    text || '.' || chr(10) || 'short line.' || chr(10)
                    || 'this line mentions javascript and still has many words.'
                    || chr(10)
                    || CASE WHEN doc_id % 3 = 0 THEN
                         'Another full sentence with plenty of words to keep! And a third complete sentence right here to pass?'
                       ELSE 'no terminal punct line with many words here' END
                    || CASE WHEN doc_id % 5 = 0 THEN
                         chr(10) || 'lorem ipsum dolor sit amet today.'
                       ELSE '' END
                    || CASE WHEN doc_id % 7 = 0 THEN
                         chr(10) || 'some code { with braces } and words.'
                       ELSE '' END AS text
                  FROM documents),
            L AS (SELECT doc_id, text,
                         string_split(text, chr(10)) AS lines
                  FROM aug),
            k AS (SELECT doc_id, text, lines,
                    list_filter(lines, l ->
                      (ends_with(rtrim(l), '.') OR ends_with(rtrim(l), '!')
                       OR ends_with(rtrim(l), '?')
                       OR ends_with(rtrim(l), '"')
                       OR ends_with(rtrim(l), chr(8221))
                       OR ends_with(rtrim(l), chr(39)))
                      AND len(list_filter(
                            string_split_regex(trim(l), '\\s+'),
                            x -> x <> '')) >= 5
                      AND NOT contains(lower(l), 'javascript')) AS kept
                  FROM L),
            m AS (SELECT doc_id,
                    -- array_to_string([]) is NULL in DuckDB, '' in Spark
                    COALESCE(array_to_string(kept, chr(10)), '')
                      AS text_clean,
                    len(lines) AS n_lines, len(kept) AS n_kept,
                    length(COALESCE(array_to_string(kept, chr(10)), ''))
                      - length(replace(replace(replace(
                          COALESCE(array_to_string(kept, chr(10)), ''),
                          '.', ''), '!', ''), '?', '')) AS sentences,
                    NOT contains(lower(text), 'lorem ipsum')
                      AS no_lorem_ipsum,
                    NOT contains(text, '{') AS no_curly_brace
                  FROM k)
            SELECT doc_id, md5(text_clean) AS clean_md5,
                   CAST(n_lines AS BIGINT) AS n_lines,
                   CAST(n_kept AS BIGINT) AS n_kept,
                   CAST(sentences AS BIGINT) AS sentences,
                   sentences >= 3 AS sentences_ok,
                   no_lorem_ipsum, no_curly_brace,
                   (sentences >= 3 AND no_lorem_ipsum AND no_curly_brace
                    AND n_kept > 0) AS passes
            FROM m ORDER BY doc_id""",
        "text_stats": f"""
            WITH toks AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
            SELECT doc_id, CAST(length(text) AS BIGINT) AS chars,
                   CAST(len(toks) AS BIGINT) AS n_tokens
            FROM toks""",
        # composed curation pipeline: quality gate → per-fingerprint
        # survivor (smallest id) → email+url scrub → salted 50% sample
        # JSONL round trip is content-lossless, so the oracle is the
        # parquet table itself; the planted corrupt line count is the
        # literal 1 on both sides
        "pipeline_jsonl": """
            SELECT doc_id, lang, n_chars, md5(text) AS text_md5,
                   CAST(1 AS BIGINT) AS quarantined
            FROM documents ORDER BY doc_id""",
        "pipeline_curate": f"""
            WITH toks AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
            q AS (SELECT doc_id, text, {quality} AS qv FROM toks),
            kept AS (SELECT * FROM q WHERE qv >= 0.5),
            d AS (SELECT doc_id, text, qv,
                         row_number() OVER (PARTITION BY md5({_NORM})
                                            ORDER BY doc_id) AS rn
                  FROM kept),
            surv AS (SELECT doc_id, text, qv FROM d WHERE rn = 1),
            scrubbed AS (SELECT doc_id,
                   regexp_replace(regexp_replace(text,
                         '{T.PII_PATTERNS["email"]}', '[PII]', 'g'),
                         '{T.PII_PATTERNS["url"]}', '[PII]', 'g') AS text,
                   qv
                 FROM surv)
            SELECT doc_id, md5(text) AS text_md5, round(qv, 4) AS quality
            FROM scrubbed
            WHERE {_TOKHASH.format(s="concat('curate', CAST(doc_id AS VARCHAR))")}
                  % 1000000 < 500000
            ORDER BY doc_id""",
        "text_quality": f"""
            WITH toks AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
            SELECT doc_id,
                   round({swr}, 4) AS stopword_ratio,
                   round({pr}, 4) AS punct_ratio,
                   round({quality}, 4) AS quality
            FROM toks""",
        "quality_classifier": _qc_sql,
        "text_lang": _lang_sql(),
        "text_fingerprint": f"""
            SELECT doc_id, md5({_NORM}) AS fingerprint FROM documents""",
        "dedup_exact": f"""
            SELECT md5({_NORM}) AS fingerprint,
                   CAST(count(*) AS BIGINT) AS n_dups,
                   min(doc_id) AS keep_id
            FROM documents GROUP BY 1""",
        "dedup_jaccard": f"""
            WITH {_jaccard_cte()}
            SELECT id_a, id_b, round(jaccard, 4) AS jaccard
            FROM jac WHERE jaccard >= 0.6""",
        # dedup_resolve: connected components over the jaccard pair graph —
        # the recursive CTE reaches fixpoint on exactly the min-reachable-id
        # labels the Spark pointer-jumping loop converges to.
        "dedup_resolve": f"""
            WITH RECURSIVE {_jaccard_cte()},
            edges AS (
              SELECT id_a AS src, id_b AS dst FROM jac WHERE jaccard >= 0.6
              UNION
              SELECT id_b AS src, id_a AS dst FROM jac WHERE jaccard >= 0.6),
            reach(node, lbl) AS (
              SELECT src, src FROM edges
              UNION
              SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.node),
            cc AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node)
            SELECT d.doc_id,
                   coalesce(cc.component, d.doc_id) AS canonical_id,
                   coalesce(cc.component, d.doc_id) = d.doc_id AS is_canonical
            FROM documents d LEFT JOIN cc ON d.doc_id = cc.node""",
        # leakage-safe split: same recursive-CTE components as
        # dedup_resolve, then the salted-md5 bucket of the CANONICAL id
        # decides the side (holdout=0.1 of 1M buckets)
        "split_leakage": f"""
            WITH RECURSIVE {_jaccard_cte()},
            edges AS (
              SELECT id_a AS src, id_b AS dst FROM jac WHERE jaccard >= 0.6
              UNION
              SELECT id_b AS src, id_a AS dst FROM jac WHERE jaccard >= 0.6),
            reach(node, lbl) AS (
              SELECT src, src FROM edges
              UNION
              SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.node),
            cc AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node),
            canon AS (
              SELECT d.doc_id,
                     coalesce(cc.component, d.doc_id) AS canonical_id
              FROM documents d LEFT JOIN cc ON d.doc_id = cc.node)
            SELECT doc_id, canonical_id,
                   CASE WHEN {_TOKHASH.format(
                       s="concat('split', CAST(canonical_id AS VARCHAR))")}
                        % 1000000 < 100000
                        THEN 'holdout' ELSE 'train' END AS split
            FROM canon ORDER BY doc_id""",
        # SemDeDup envelope: all-pairs cosine >= 1 - eps (the SQL computes
        # 1.0 - 0.58 itself so the float threshold is bit-identical to the
        # Spark side's), recursive-CTE components, min-id canonical
        "dedup_semantic": f"""
            WITH RECURSIVE p AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b
              FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
              WHERE {_cos("a.embedding", "b.embedding")} >= (1.0 - 0.58)),
            edges AS (
              SELECT id_a AS src, id_b AS dst FROM p
              UNION
              SELECT id_b AS src, id_a AS dst FROM p),
            reach(node, lbl) AS (
              SELECT src, src FROM edges
              UNION
              SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.node),
            cc AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node)
            SELECT emb.vec_id,
                   coalesce(cc.component, emb.vec_id) AS canonical_id,
                   coalesce(cc.component, emb.vec_id) = emb.vec_id AS is_canonical
            FROM embeddings emb LEFT JOIN cc ON emb.vec_id = cc.node
            ORDER BY emb.vec_id""",
        # quality-keyed survivor: same components, canonical = max n_chars
        # (ties -> min id) elected by a window over the component members
        "dedup_resolve_best": f"""
            WITH RECURSIVE {_jaccard_cte()},
            edges AS (
              SELECT id_a AS src, id_b AS dst FROM jac WHERE jaccard >= 0.6
              UNION
              SELECT id_b AS src, id_a AS dst FROM jac WHERE jaccard >= 0.6),
            reach(node, lbl) AS (
              SELECT src, src FROM edges
              UNION
              SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.node),
            cc AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node),
            members AS (
              SELECT cc.node, cc.component, d.n_chars
              FROM cc JOIN documents d ON d.doc_id = cc.node),
            surv AS (
              SELECT component, node AS canonical FROM (
                SELECT component, node,
                       row_number() OVER (
                         PARTITION BY component
                         ORDER BY n_chars DESC NULLS LAST, node ASC) AS rn
                FROM members) WHERE rn = 1)
            SELECT d.doc_id,
                   coalesce(s.canonical, d.doc_id) AS canonical_id,
                   coalesce(s.canonical, d.doc_id) = d.doc_id AS is_canonical
            FROM documents d
            LEFT JOIN cc ON d.doc_id = cc.node
            LEFT JOIN surv s ON cc.component = s.component""",
        "dedup_minhash": _minhash_sql(),
        "dedup_incremental_near": _incremental_near_sql(),
        "dedup_paragraphs": """
    WITH base AS (SELECT d.doc_id, concat(d.text, chr(10), f.text) AS text
                  FROM documents d JOIN documents f ON d.doc_id % 29 = f.doc_id),
    ps AS (SELECT doc_id, string_split(text, chr(10)) AS ps FROM base),
    ex AS (SELECT doc_id, generate_subscripts(ps, 1) AS pos,
                  unnest(ps) AS para FROM ps),
    fp AS (SELECT doc_id, pos, para,
           CASE WHEN trim(regexp_replace(lower(para), '\\s+', ' ', 'g')) <> ''
                THEN md5(trim(regexp_replace(lower(para), '\\s+', ' ', 'g')))
           END AS f
           FROM ex),
    hot AS (SELECT f FROM fp WHERE f IS NOT NULL
            GROUP BY f HAVING count(DISTINCT doc_id) >= 3),
    kept AS (SELECT fp.doc_id, fp.pos, fp.para, (h.f IS NULL) AS keep
             FROM fp LEFT JOIN hot h ON fp.f = h.f),
    clean AS (SELECT doc_id,
              coalesce(string_agg(para, chr(10) ORDER BY pos)
                       FILTER (WHERE keep), '') AS text
              FROM kept GROUP BY doc_id)
    SELECT doc_id, text FROM clean ORDER BY doc_id
    """,
        "dedup_simhash": _simhash_sql(),
        "dedup_embedding": f"""
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round({_cos("a.embedding", "b.embedding")}, 4) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            ORDER BY {_cos("a.embedding", "b.embedding")} DESC, a.vec_id, b.vec_id
            LIMIT 20""",
        # bucketed near-dup with nprobe = n_clusters ⇒ exact all-pairs answer
        "dedup_embedding_bucketed": f"""
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round({_cos("a.embedding", "b.embedding")}, 4) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE {_cos("a.embedding", "b.embedding")} >= 0.42""",
        # REAL wav decode: payload samples are md5(text) as 8 big-endian
        # int16s — the oracle re-derives the signed samples from the hex
        # digest; the mean of 8 int16s is exact in every fp width involved
        "multimodal_features": _wav_oracle_sql(),
        "multimodal_frames": _frames_oracle_sql(),
    }
    # knn_batch_ivf probes ALL clusters ⇒ bit-identical to brute knn_batch
    # seeded JL projection: the oracle gets the IDENTICAL matrix literals
    # the Spark side derives from the same (dim, seed) — repr() round-trips
    # doubles exactly, and both engines fold x*w left-to-right in element
    # order, so every output matches to the bit before the shared round()
    from pq_vector_spark.functions.vector import random_projection_matrix

    _pm = random_projection_matrix(PROJECT_SRC_DIM, PROJECT_DIM, seed=PROJECT_SEED)

    def _proj_term(row):
        lits = ", ".join(repr(w) for w in row)
        return (
            f"list_reduce(list_transform(list_zip(embedding, [{lits}]), "
            "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)"
        )

    _proj_list = ", ".join(_proj_term(r) for r in _pm)
    oracles["embedding_project"] = f"""
        WITH p AS (SELECT vec_id, [{_proj_list}] AS pr FROM embeddings),
             u AS (SELECT unnest(range({PROJECT_DIM})) AS i)
        SELECT vec_id, CAST(u.i AS INT) AS dim, round(pr[u.i + 1], 4) AS val
        FROM p, u ORDER BY vec_id, dim"""

    oracles["knn_batch_ivf"] = oracles["knn_batch"]
    # streaming twin computes the same plan over readStream
    oracles["events_stream_enriched"] = oracles["events_enriched"]
    # ann_cosine_ivf probes ALL clusters ⇒ same row set as brute ann_cosine
    oracles["ann_cosine_ivf"] = oracles["ann_cosine"]
    return oracles
