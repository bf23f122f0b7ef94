"""Vector utility tests (functions/vector.py): grouped centroids without
collect_list, L2 normalization edge cases."""

import math

import pytest
from pyspark.sql import functions as F

from pq_vector_spark.functions.vector import group_centroids, l2_normalize


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (0, [3.0, 2.0]),
            (1, [0.0, 4.0]),
            (1, None),  # null vector dropped
        ],
        ["label", "vec"],
    )


def test_group_centroids(vecs):
    out = {r["label"]: r for r in group_centroids(vecs, "label", "vec").collect()}
    assert out[0]["n_vectors"] == 2
    assert out[0]["centroid"] == [2.0, 1.0]
    assert out[1]["n_vectors"] == 1
    assert out[1]["centroid"] == [0.0, 4.0]


def test_group_centroids_rounding(spark):
    df = spark.createDataFrame([(0, [1.0]), (0, [2.0]), (0, [2.0])], ["label", "vec"])
    row = group_centroids(df, "label", "vec", decimals=2).collect()[0]
    assert row["centroid"] == [round(5.0 / 3.0, 2)]


def test_group_centroids_no_collect_list_of_vectors(vecs):
    """The OOM guard: the plan must aggregate exploded scalars, never
    collect vector lists per group (collect_list appears only over the
    (dim, mean) structs — size = dim, not rows)."""
    plan = (
        group_centroids(vecs, "label", "vec")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "posexplode" in plan.lower() or "generate" in plan.lower()


def test_l2_normalize(spark):
    df = spark.createDataFrame([(1, [3.0, 4.0])], ["id", "vec"])
    out = df.select(l2_normalize("vec").alias("n")).collect()[0]["n"]
    assert out == pytest.approx([0.6, 0.8])
    assert math.isclose(sum(x * x for x in out), 1.0)


def test_l2_normalize_zero_vector_yields_nulls(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0])], ["id", "vec"])
    out = df.select(l2_normalize("vec").alias("n")).collect()[0]["n"]
    assert out == [None, None]


def test_embedding_outliers(spark):
    from pq_vector_spark.functions.vector import embedding_outliers

    rows = [
        (0, 1, [0.0, 0.0]),
        (0, 2, [1.0, 0.0]),
        (0, 3, [10.0, 0.0]),  # the outlier of label 0
        (1, 4, [5.0, 5.0]),
        (1, 5, [5.0, 6.0]),
    ]
    df = spark.createDataFrame(rows, ["label", "vec_id", "vec"])
    out = embedding_outliers(df, "label", "vec", "vec_id", k=1)
    got = {r["label"]: r["vec_id"] for r in out.collect()}
    assert got[0] == 3
    assert got[1] in (4, 5)  # symmetric pair — tie broken by id → 4
    assert got[1] == 4


def test_embedding_outliers_k_and_guards(spark):
    import pytest as _pt

    from pq_vector_spark.functions.vector import embedding_outliers

    df = spark.createDataFrame([(0, 1, [0.0]), (0, 2, [1.0])], ["label", "vec_id", "vec"])
    assert embedding_outliers(df, "label", "vec", "vec_id", k=5).count() == 2
    with _pt.raises(ValueError, match="k must be positive"):
        embedding_outliers(df, "label", "vec", "vec_id", k=0)


def test_embedding_outliers_broadcast_plan(spark):
    """Centroids broadcast; no sort-merge join of the corpus."""
    from pq_vector_spark.functions.vector import embedding_outliers

    df = spark.createDataFrame([(0, 1, [0.0]), (0, 2, [1.0])], ["label", "vec_id", "vec"])
    plan = (
        embedding_outliers(df, "label", "vec", "vec_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_norm_stats(spark):
    from pq_vector_spark.functions.vector import norm_stats

    df = spark.createDataFrame(
        [(0, [3.0, 4.0]), (0, [6.0, 8.0]), (0, None), (1, [0.0, 0.0])],
        "label: int, vec: array<double>",
    )
    out = {r["label"]: r for r in norm_stats(df, "vec", "label").collect()}
    r0 = out[0]
    assert (r0["n_vectors"], r0["n_null"]) == (3, 1)
    assert r0["mean_norm"] == 7.5  # (5 + 10) / 2, nulls excluded from avg
    assert r0["p50_norm"] == 7.5
    assert out[1]["mean_norm"] == 0.0  # zero vector has norm 0, not null


def test_project_vectors_matches_numpy(spark):
    import numpy as np

    from pq_vector_spark.functions.vector import (
        project_vectors,
        random_projection_matrix,
    )

    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.random(16, dtype=np.float32)]) for i in range(40)]
    df = spark.createDataFrame(rows, "id: bigint, v: array<float>")
    m = random_projection_matrix(16, 4, seed=9)
    got = {
        r["id"]: r["projected"]
        for r in project_vectors(df, "v", m).select("id", "projected").collect()
    }
    M = np.asarray(m)
    for i, v in rows:
        want = M @ np.asarray(v, dtype=np.float64)
        assert np.allclose(got[i], want, atol=1e-9), i


def test_project_vectors_guards(spark):
    from pq_vector_spark.functions.vector import (
        project_vectors,
        random_projection_matrix,
    )

    df = spark.createDataFrame([(0, [1.0, 2.0])], "id: bigint, v: array<float>")
    with pytest.raises(ValueError):
        project_vectors(df, "v", [])
    with pytest.raises(ValueError):
        project_vectors(df, "v", [[1.0, 2.0], [1.0]])
    with pytest.raises(ValueError):
        random_projection_matrix(4, 0)
    with pytest.raises(ValueError):
        random_projection_matrix(4, 5)


def test_pca_components_capture_variance_order(spark):
    """Planted anisotropy: variance concentrated on axis 0, then axis 1 —
    PCA's first component must align with axis 0, and projecting onto k=2
    must reconstruct better than k=1."""
    import numpy as np

    from pq_vector_spark.functions.vector import pca_components, project_vectors

    rng = np.random.default_rng(11)
    base = rng.standard_normal((400, 6))
    base[:, 0] *= 10.0
    base[:, 1] *= 3.0
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(400)]
    df = spark.createDataFrame(rows, "id: bigint, v: array<float>")
    comps, mean = pca_components(df, "v", 2, seed=3)
    assert len(comps) == 2 and len(comps[0]) == 6 and len(mean) == 6
    # first component dominated by axis 0
    c0 = np.abs(np.asarray(comps[0]))
    assert c0[0] == max(c0)
    # projection runs end-to-end on the component matrix
    out = project_vectors(df, "v", comps).select("projected").first()["projected"]
    assert len(out) == 2


def test_projection_shrinks_bytes_keeps_neighbors_roughly(spark):
    """The ANN-reduction use case: project 64 -> 8 dims with a seeded JL
    matrix and check the true nearest neighbor of a query stays inside the
    projected top-20% — the qualitative JL guarantee at tiny scale."""
    import numpy as np

    from pq_vector_spark.functions.vector import (
        project_vectors,
        random_projection_matrix,
    )

    rng = np.random.default_rng(17)
    X = rng.standard_normal((300, 64)).astype(np.float32)
    X[7] = X[0] + 0.01 * rng.standard_normal(64).astype(np.float32)  # planted NN
    rows = [(int(i), [float(x) for x in X[i]]) for i in range(300)]
    df = spark.createDataFrame(rows, "id: bigint, v: array<float>")
    m = random_projection_matrix(64, 8, seed=23)
    proj = {r["id"]: np.asarray(r["projected"]) for r in project_vectors(df, "v", m).collect()}
    q = proj[0]
    ranked = sorted((np.sum((v - q) ** 2), i) for i, v in proj.items() if i != 0)
    top = [i for _, i in ranked[: max(1, len(ranked) // 5)]]
    assert 7 in top


def test_project_vectors_pandas_path_parity(spark):
    """The pandas matmul path must match the expression path to ~1 ulp
    (summation order differs: left-to-right fold vs BLAS gemm)."""
    import numpy as np

    from pq_vector_spark.functions.vector import (
        project_vectors,
        random_projection_matrix,
    )

    rng = np.random.default_rng(3)
    data = [(i, [float(v) for v in rng.standard_normal(32)]) for i in range(40)]
    df = spark.createDataFrame(data, ["id", "v"])
    m = random_projection_matrix(32, 16, seed=5)
    expr = {
        r["id"]: r["projected"]
        for r in project_vectors(df, "v", m, method="expression").collect()
    }
    pnd = {
        r["id"]: r["projected"]
        for r in project_vectors(df, "v", m, method="pandas").collect()
    }
    for i in expr:
        assert np.allclose(expr[i], pnd[i], rtol=1e-12, atol=1e-12)


def test_project_vectors_auto_selects_pandas_above_threshold(spark):
    """auto: >128 output dims takes the Arrow matmul (no per-dim fold
    expressions in the plan); <=128 stays on native expressions."""
    import numpy as np

    from pq_vector_spark.functions.vector import (
        project_vectors,
        random_projection_matrix,
    )

    rng = np.random.default_rng(4)
    df = spark.createDataFrame(
        [(0, [float(v) for v in rng.standard_normal(256)])], ["id", "v"]
    )
    wide = random_projection_matrix(256, 200, seed=6)
    plan_wide = (
        project_vectors(df, "v", wide)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan_wide or "pythonUDF" in plan_wide.lower()
    narrow = random_projection_matrix(256, 8, seed=6)
    plan_narrow = (
        project_vectors(df, "v", narrow)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "aggregate(" in plan_narrow and "pythonUDF" not in plan_narrow.lower()
    # and the wide result is numerically sane end-to-end
    out = project_vectors(df, "v", wide).select("projected").first()["projected"]
    want = np.asarray(wide, dtype=np.float64) @ np.asarray(
        [float(v) for v in df.first()["v"]], dtype=np.float64
    )
    assert np.allclose(out, want, rtol=1e-12, atol=1e-12)


def test_project_vectors_dim_mismatch_yields_null(spark):
    """ADVICE r8: a vector whose length differs from the matrix width (or a
    NULL vector) yields a NULL projection on BOTH paths — never silently
    NULL-padded arithmetic."""
    from pq_vector_spark.functions.vector import project_vectors

    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0, 4.0]), (1, [1.0, 2.0]), (2, None)],
        "id int, v array<double>",
    )
    m = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    for method in ("expression", "pandas"):
        got = {
            r["id"]: r["projected"]
            for r in project_vectors(df, "v", m, method=method).collect()
        }
        assert got[0] == [1.0, 2.0]
        assert got[1] is None and got[2] is None


def test_project_vectors_method_validated(spark):
    from pq_vector_spark.functions.vector import project_vectors

    df = spark.createDataFrame([(0, [1.0])], ["id", "v"])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="method"):
        project_vectors(df, "v", [[1.0]], method="gpu")
