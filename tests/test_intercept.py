"""Plan-level top-k interception tests (plans/intercept.py) — the PySpark
analogue of the reference's physical-optimizer rule firing on query shapes
the TEXTUAL matcher cannot see (CTEs, subselects, DataFrame API).
≙ reference rule guards: src/df_vector/physical.rs:134-177."""

import numpy as np
import pytest
from pyspark.sql import Observation
from pyspark.sql import functions as F

from pq_vector_spark.index.build import build_index
from pq_vector_spark.plans.intercept import try_intercept_topk
from pq_vector_spark.plans.sql import (
    _FN_EXPANSIONS,
    expand_vector_functions,
    pq_sql,
    register_indexed_table,
)
from pq_vector_spark.session import IndexBuildOptions, VectorTopKOptions

N_ROWS = 500
N_CLUSTERS = 8
VEC = "array(0.5, 0.5, 0.5, 0.5)"


@pytest.fixture(scope="module")
def icpt_table(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("icptidx")
    src = str(base / "src.parquet")
    out = str(base / "indexed")
    rng = np.random.default_rng(11)
    rows = [
        (int(i), [float(x) for x in rng.random(4, dtype=np.float32)])
        for i in range(N_ROWS)
    ]
    spark.createDataFrame(rows, "id INT, vec ARRAY<FLOAT>").write.mode(
        "overwrite"
    ).parquet(src)
    build_index(spark, src, out, column="vec", options=IndexBuildOptions(n_clusters=N_CLUSTERS))
    register_indexed_table(spark, "icpt_vectors", out)
    return {"src": src, "out": out}


def _brute(spark, sql):
    return [r["id"] for r in spark.sql(expand_vector_functions(sql)).collect()]


def test_cte_shape_intercepts_and_is_exact(spark, icpt_table):
    """The textual regex cannot match a CTE; the plan interceptor must, and
    with nprobe = n_clusters the answer equals brute force exactly."""
    q = (
        "WITH c AS (SELECT id, vec FROM icpt_vectors) "
        f"SELECT id FROM c ORDER BY array_distance(vec, {VEC}), id LIMIT 10"
    )
    raw = spark.sql(expand_vector_functions(q))
    hit = try_intercept_topk(spark, raw, options=VectorTopKOptions(nprobe=N_CLUSTERS))
    assert hit is not None
    assert hit.columns == ["id"]
    assert [r["id"] for r in hit.collect()] == _brute(spark, q)


def test_subquery_intercepts_through_pq_sql_with_metrics(spark, icpt_table):
    """pq_sql end-to-end on a subselect: interception fires (CollectMetrics
    in the plan proves the indexed path) and candidate_rows shows pruning."""
    q = (
        "SELECT * FROM (SELECT id, vec FROM icpt_vectors) t "
        f"ORDER BY array_distance(vec, {VEC}), id LIMIT 5"
    )
    obs = Observation("icpt_test_metrics")
    out = pq_sql(spark, q, options=VectorTopKOptions(nprobe=2), observation=obs)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "CollectMetrics" in plan  # only the indexed path attaches metrics
    rows = out.collect()
    assert len(rows) == 5
    m = obs.get
    assert 0 < m["candidate_rows"] < N_ROWS  # nprobe=2 of 8 clusters pruned
    assert m["files_scanned"] >= 1


def test_where_inside_cte_applies(spark, icpt_table):
    q = (
        "WITH c AS (SELECT id, vec FROM icpt_vectors WHERE id >= 100) "
        f"SELECT id FROM c ORDER BY array_distance(vec, {VEC}), id LIMIT 5"
    )
    raw = spark.sql(expand_vector_functions(q))
    hit = try_intercept_topk(spark, raw, options=VectorTopKOptions(nprobe=N_CLUSTERS))
    assert hit is not None
    got = [r["id"] for r in hit.collect()]
    assert got == _brute(spark, q)
    assert all(i >= 100 for i in got)


def test_filter_string_literal_containing_alias_dot(spark, icpt_table):
    """A WHERE clause whose STRING LITERAL contains '<alias>.' must reach
    the rebuilt scan verbatim: conditions are unqualified by rebuilding the
    expression tree (withQualifier on attribute nodes), never by regexing
    the SQL text — the old quote-blind regex corrupted such literals into
    silently-wrong filters. Interception must still fire, with metrics
    proving the pruned path executed."""
    q = (
        "WITH c AS (SELECT id, vec FROM icpt_vectors) "
        "SELECT id FROM c "
        "WHERE CAST(id AS STRING) != 'see c. below' AND id >= 250 "
        f"ORDER BY array_distance(vec, {VEC}), id LIMIT 10"
    )
    raw = spark.sql(expand_vector_functions(q))
    obs = Observation("icpt_alias_literal")
    hit = try_intercept_topk(
        spark, raw, options=VectorTopKOptions(nprobe=N_CLUSTERS), observation=obs
    )
    assert hit is not None
    got = [r["id"] for r in hit.collect()]
    assert got == _brute(spark, q)
    assert all(i >= 250 for i in got)
    assert obs.get["candidate_rows"] > 0  # indexed (pruned) path ran


def test_dataframe_api_intercepts(spark, icpt_table):
    """DataFrame-API query (F.expr HOF distance) over the registered view
    intercepts too — plan matching is representation-agnostic."""
    dist = _FN_EXPANSIONS["array_distance"].format(a="vec", b=VEC)
    df = spark.table("icpt_vectors").orderBy(F.expr(dist)).limit(7).select("id")
    hit = try_intercept_topk(spark, df, options=VectorTopKOptions(nprobe=N_CLUSTERS))
    assert hit is not None
    assert hit.columns == ["id"]
    assert len(hit.collect()) == 7


def test_squared_l2_sort_intercepts(spark, icpt_table):
    """ORDER BY squared_l2 (no sqrt) has the identical ordering — accepted."""
    q = (
        "WITH c AS (SELECT id, vec FROM icpt_vectors) "
        f"SELECT id FROM c ORDER BY squared_l2(vec, {VEC}), id LIMIT 5"
    )
    raw = spark.sql(expand_vector_functions(q))
    hit = try_intercept_topk(spark, raw, options=VectorTopKOptions(nprobe=N_CLUSTERS))
    assert hit is not None
    assert [r["id"] for r in hit.collect()] == _brute(spark, q)


def test_cosine_desc_intercepts_and_is_exact(spark, icpt_table):
    """ORDER BY cosine_similarity DESC — the extension metric — intercepts
    through the plan matcher and equals brute force at nprobe=all."""
    q = (
        "WITH c AS (SELECT id, vec FROM icpt_vectors) "
        f"SELECT id FROM c ORDER BY cosine_similarity(vec, {VEC}) DESC, id LIMIT 10"
    )
    raw = spark.sql(expand_vector_functions(q))
    hit = try_intercept_topk(spark, raw, options=VectorTopKOptions(nprobe=N_CLUSTERS))
    assert hit is not None
    assert [r["id"] for r in hit.collect()] == _brute(spark, q)


def test_cosine_asc_declines(spark, icpt_table):
    """Ascending cosine (farthest-first) is not a supported index shape."""
    q = (
        "WITH c AS (SELECT id, vec FROM icpt_vectors) "
        f"SELECT id FROM c ORDER BY cosine_similarity(vec, {VEC}) ASC, id LIMIT 5"
    )
    raw = spark.sql(expand_vector_functions(q))
    assert try_intercept_topk(spark, raw) is None


def test_desc_declines(spark, icpt_table):
    q = (
        "WITH c AS (SELECT id, vec FROM icpt_vectors) "
        f"SELECT id FROM c ORDER BY array_distance(vec, {VEC}) DESC LIMIT 5"
    )
    raw = spark.sql(expand_vector_functions(q))
    assert try_intercept_topk(spark, raw) is None


def test_non_indexed_relation_declines(spark, icpt_table):
    spark.read.parquet(icpt_table["src"]).createOrReplaceTempView("icpt_plain")
    q = (
        "WITH c AS (SELECT id, vec FROM icpt_plain) "
        f"SELECT id FROM c ORDER BY array_distance(vec, {VEC}), id LIMIT 5"
    )
    raw = spark.sql(expand_vector_functions(q))
    assert try_intercept_topk(spark, raw) is None


def test_non_attr_second_key_declines(spark, icpt_table):
    q = (
        "WITH c AS (SELECT id, vec FROM icpt_vectors) "
        f"SELECT id FROM c ORDER BY array_distance(vec, {VEC}), id + 1 LIMIT 5"
    )
    raw = spark.sql(expand_vector_functions(q))
    assert try_intercept_topk(spark, raw) is None


def test_aggregate_query_declines(spark, icpt_table):
    raw = spark.sql("SELECT count(*) AS n FROM icpt_vectors")
    assert try_intercept_topk(spark, raw) is None


def test_wrong_lambda_shape_declines(spark, icpt_table):
    """(x-y)*(y-x) renders the same SQL text as (x-y)*(x-y) but is NOT the
    L2 kernel — the exprId-level check must decline it."""
    evil = (
        f"sqrt(aggregate(zip_with(cast(vec as array<double>), cast({VEC} as array<double>),"
        " (x, y) -> (x - y) * (y - x)), cast(0.0 as double), (acc, x) -> acc + x))"
    )
    df = spark.table("icpt_vectors").orderBy(F.expr(evil)).limit(5).select("id")
    assert try_intercept_topk(spark, df) is None
