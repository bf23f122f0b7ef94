"""Product-quantization (PQ/ADC) tests — deterministic training, map-side
encoding, LUT distances, and two-stage recall."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pq_vector_spark.index.pq import (
    CODES_COL,
    PQCodebook,
    adc_distance,
    encode_pq,
    pq_topk,
    train_pq,
)


def _clustered(n=400, dim=16, n_clusters=8, seed=7):
    rng = np.random.default_rng(seed)
    cents = rng.normal(0, 10, size=(n_clusters, dim))
    rows = cents[rng.integers(0, n_clusters, n)] + rng.normal(0, 0.5, (n, dim))
    return rows.astype(np.float32)


@pytest.fixture(scope="module")
def vec_df(spark):
    data = _clustered()
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(data)],
        "id: bigint, vec: array<float>",
    ).cache(), data


def test_train_deterministic(spark, vec_df):
    df, _ = vec_df
    cb1 = train_pq(df, "vec", m=4, nbits=4, seed=11)
    cb2 = train_pq(df, "vec", m=4, nbits=4, seed=11)
    assert np.array_equal(cb1.codebooks, cb2.codebooks)
    assert cb1.m == 4 and cb1.k == 16 and cb1.dsub == 4 and cb1.dim == 16


def test_train_validations(spark, vec_df):
    df, _ = vec_df
    with pytest.raises(ValueError, match="not divisible"):
        train_pq(df, "vec", m=5)
    with pytest.raises(ValueError, match="nbits"):
        train_pq(df, "vec", m=4, nbits=9)


def test_encode_shape_and_nulls(spark, vec_df):
    df, _ = vec_df
    cb = train_pq(df, "vec", m=4, nbits=4, seed=11)
    extra = spark.createDataFrame(
        [(9001, None), (9002, [1.0, 2.0])], "id: bigint, vec: array<float>"
    )
    enc = encode_pq(df.unionByName(extra), "vec", cb).collect()
    by_id = {r["id"]: r[CODES_COL] for r in enc}
    assert by_id[9001] is None  # null vector
    assert by_id[9002] is None  # wrong dim
    codes = [v for k, v in by_id.items() if k < 9000]
    assert all(len(c) == 4 for c in codes)
    assert all(0 <= x < 16 for c in codes for x in c)


def test_adc_approximates_exact(spark, vec_df):
    df, data = vec_df
    cb = train_pq(df, "vec", m=8, nbits=8, seed=11)
    q = [float(x) for x in data[0]]
    enc = encode_pq(df, "vec", cb)
    rows = enc.withColumn("adc", adc_distance(cb, q)).select("id", "adc").collect()
    exact = np.sqrt(((data - np.asarray(q, dtype=np.float32)) ** 2).sum(axis=1))
    adc = np.empty(len(rows))
    for r in rows:
        adc[r["id"]] = r["adc"]
    # ADC must correlate strongly with exact distance on clustered data
    corr = np.corrcoef(adc, exact)[0, 1]
    assert corr > 0.98
    # and the ADC-nearest row should be the query's own row
    assert int(np.argmin(adc)) == 0


def test_adc_null_codes(spark, vec_df):
    df, _ = vec_df
    cb = train_pq(df, "vec", m=4, nbits=4, seed=11)
    bad = spark.createDataFrame([(1, None)], f"id: bigint, {CODES_COL}: array<smallint>")
    [r] = bad.withColumn("adc", adc_distance(cb, [0.0] * 16)).collect()
    assert r["adc"] is None


def test_lookup_table_dim_check(spark, vec_df):
    df, _ = vec_df
    cb = train_pq(df, "vec", m=4, nbits=4, seed=11)
    with pytest.raises(ValueError, match="query dim"):
        cb.lookup_table([1.0, 2.0])


def test_pq_topk_recall(spark, vec_df):
    df, data = vec_df
    cb = train_pq(df, "vec", m=8, nbits=8, seed=11)
    q = [float(x) for x in data[17]]
    k = 10
    got = pq_topk(df, "vec", cb, q, k, rerank=4, tie_break="id")
    got_ids = {r["id"] for r in got.collect()}
    exact = np.sqrt(((data - np.asarray(q, dtype=np.float32)) ** 2).sum(axis=1))
    true_ids = set(np.argsort(exact, kind="stable")[:k].tolist())
    recall = len(got_ids & true_ids) / k
    assert recall >= 0.9
    # result schema: codes/adc internals dropped, original columns kept
    assert set(got.columns) == {"id", "vec"}


def test_pq_topk_precoded_keep_distance(spark, vec_df):
    df, data = vec_df
    cb = train_pq(df, "vec", m=8, nbits=8, seed=11)
    enc = encode_pq(df, "vec", cb).cache()
    q = [float(x) for x in data[3]]
    out = pq_topk(
        enc, "vec", cb, q, 5, rerank=8, codes_col=CODES_COL,
        tie_break="id", keep_distance=True,
    )
    rows = out.collect()
    assert len(rows) == 5
    # distances ascending and row 3 (the query itself) first at distance ~0
    ds = [r["_pq_distance"] for r in rows]
    assert ds == sorted(ds)
    assert rows[0]["id"] == 3 and ds[0] < 1e-3
    # pre-coded path keeps the caller's codes column
    assert CODES_COL in out.columns


def test_pq_topk_with_fetch(spark, vec_df):
    from pq_vector_spark.index.pq import pq_topk_with_fetch

    df, data = vec_df
    cb = train_pq(df, "vec", m=8, nbits=8, seed=11)
    codes = encode_pq(df, "vec", cb).select("id", CODES_COL).cache()
    q = [float(x) for x in data[42]]
    k = 10
    got = pq_topk_with_fetch(codes, df, "vec", "id", cb, q, k, rerank=4)
    got_ids = {r["id"] for r in got.collect()}
    exact = np.sqrt(((data - np.asarray(q, dtype=np.float32)) ** 2).sum(axis=1))
    true_ids = set(np.argsort(exact, kind="stable")[:k].tolist())
    assert len(got_ids & true_ids) / k >= 0.9
    assert set(got.columns) == {"id", "vec"}


def test_codebook_save_load(tmp_path, spark, vec_df):
    df, _ = vec_df
    cb = train_pq(df, "vec", m=4, nbits=4, seed=11)
    p = str(tmp_path / "pq_codebook")
    cb.save(p)
    back = PQCodebook.load(p)
    assert np.array_equal(back.codebooks, cb.codebooks)
    assert back.dim == cb.dim


@pytest.fixture(scope="module")
def ivfpq_setup(spark, vec_df, tmp_path_factory):
    """Indexed layout + codes sidecar over the clustered fixture."""
    from pq_vector_spark.index.build import build_index
    from pq_vector_spark.index.pq import encode_indexed
    from pq_vector_spark.session import IndexBuildOptions

    df, data = vec_df
    base = tmp_path_factory.mktemp("ivfpq")
    src = str(base / "src.parquet")
    idx = str(base / "indexed")
    codes = str(base / "codes")
    df.write.parquet(src)
    build_index(spark, src, idx, column="vec", options=IndexBuildOptions(n_clusters=8))
    cb = train_pq(df, "vec", m=4, nbits=6, seed=11)
    encode_indexed(spark, idx, codes, "vec", "id", cb)
    return idx, codes, cb, data


def test_ivfpq_exactness_envelope(spark, ivfpq_setup, vec_df):
    """nprobe = n_clusters + rerank covering the table ⇒ brute force."""
    from pq_vector_spark.index.pq import ivfpq_topk

    idx, codes, cb, data = ivfpq_setup
    q = [float(x) for x in data[3]]
    got = [
        r["id"]
        for r in ivfpq_topk(
            spark, idx, codes, "vec", "id", cb, q, 10, nprobe=8, rerank=40
        ).collect()
    ]
    d2 = ((data.astype(np.float64) - np.array(q)) ** 2).sum(axis=1)
    want = list(np.lexsort((np.arange(len(d2)), d2))[:10])
    assert got == [int(w) for w in want]


def test_ivfpq_recall_at_production_point(spark, ivfpq_setup, vec_df):
    """nprobe=4/8, rerank=4: the doubly-pruned path still recalls ≥0.8 on
    the clustered fixture (clusters well-separated by construction)."""
    from pq_vector_spark.index.pq import ivfpq_topk

    idx, codes, cb, data = ivfpq_setup
    q = [float(x) for x in data[7]]
    got = {
        r["id"]
        for r in ivfpq_topk(
            spark, idx, codes, "vec", "id", cb, q, 10, nprobe=4, rerank=4
        ).collect()
    }
    d2 = ((data.astype(np.float64) - np.array(q)) ** 2).sum(axis=1)
    want = set(int(i) for i in np.argsort(d2, kind="stable")[:10])
    assert len(got & want) >= 8


def test_ivfpq_codes_scan_is_pruned(spark, ivfpq_setup):
    """The probe's cluster IN filter must reach the CODES parquet scan as a
    pushed filter — the doubly-pruned contract."""
    from pq_vector_spark.index.pq import ivfpq_topk

    idx, codes, cb, _ = ivfpq_setup
    q = [0.0] * 16
    out = ivfpq_topk(spark, idx, codes, "vec", "id", cb, q, 5, nprobe=2, rerank=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(_pq_cluster_id" in plan.replace("\n", " ") or (
        "_pq_cluster_id" in plan and "PushedFilters" in plan
    )


def test_ivfpq_guards(spark, ivfpq_setup, tmp_path):
    from pq_vector_spark.index.pq import encode_indexed, ivfpq_topk

    idx, codes, cb, _ = ivfpq_setup
    with pytest.raises(ValueError, match="query dim"):
        ivfpq_topk(spark, idx, codes, "vec", "id", cb, [1.0], 5)
    plain = str(tmp_path / "plain.parquet")
    spark.createDataFrame([(1, [1.0] * 16)], "id: bigint, vec: array<float>").write.parquet(plain)
    with pytest.raises(ValueError, match="not an indexed layout"):
        encode_indexed(spark, plain, plain + "_x", "vec", "id", cb)


def test_ivfpq_observation_reports_candidates(spark, ivfpq_setup):
    """A23 metrics parity: the coarse prune's surviving code-row count is
    observable, and it is smaller than the table at nprobe < n_clusters."""
    from pyspark.sql import Observation

    from pq_vector_spark.index.pq import ivfpq_topk

    idx, codes, cb, data = ivfpq_setup
    obs = Observation("ivfpq_metrics")
    q = [float(x) for x in data[0]]
    ivfpq_topk(
        spark, idx, codes, "vec", "id", cb, q, 5, nprobe=2, rerank=2,
        observation=obs,
    ).collect()
    n = obs.get["candidate_rows"]
    assert 0 < n < len(data)


# ---- OPQ (rotated PQ, Ge et al. 2013 parametric variant) ----


def _correlated(n=400, dim=16, seed=3):
    """Strongly anisotropic, cross-correlated data: a few latent factors
    mixed across all dims — the case where raw-order subspace slicing
    wastes code entropy and the OPQ rotation pays."""
    rng = np.random.default_rng(seed)
    latents = rng.normal(0, 1, size=(n, 3))
    mix = rng.normal(0, 1, size=(3, dim)) * np.array([[20.0], [5.0], [1.0]])
    rows = latents @ mix + rng.normal(0, 0.1, (n, dim))
    return rows.astype(np.float32)


@pytest.fixture(scope="module")
def corr_df(spark):
    data = _correlated()
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(data)],
        "id: bigint, vec: array<float>",
    ).cache(), data


def test_opq_rotation_is_orthogonal(spark, corr_df):
    from pq_vector_spark.index.pq import opq_rotation

    _, data = corr_df
    r = opq_rotation(data, m=4).astype(np.float64)
    assert r.shape == (16, 16)
    assert np.allclose(r @ r.T, np.eye(16), atol=1e-5)
    # rotation preserves L2 distances (what makes the exact re-rank valid)
    d0 = np.linalg.norm(data[0] - data[1])
    d1 = np.linalg.norm(data[0] @ r - data[1] @ r)
    assert d1 == pytest.approx(d0, rel=1e-4)


def test_opq_deterministic_and_beats_pq_on_correlated(spark, corr_df):
    from pq_vector_spark.index.pq import train_opq

    df, data = corr_df
    cb1 = train_opq(df, "vec", m=4, nbits=4, seed=11)
    cb2 = train_opq(df, "vec", m=4, nbits=4, seed=11)
    assert np.array_equal(cb1.codebooks, cb2.codebooks)
    assert np.array_equal(cb1.rotation, cb2.rotation)

    pq = train_pq(df, "vec", m=4, nbits=4, seed=11)

    def mse(cb):
        x = data.astype(np.float64)
        if cb.rotation is not None:
            x = x @ cb.rotation.astype(np.float64)
        err = 0.0
        for j in range(cb.m):
            sub = x[:, j * cb.dsub : (j + 1) * cb.dsub]
            cents = cb.codebooks[j].astype(np.float64)
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            err += d2.min(axis=1).sum()
        return err / x.shape[0]

    assert mse(cb1) < mse(pq)


def test_opq_envelope_matches_brute_force(spark, corr_df):
    from pq_vector_spark.functions.distance import array_distance
    from pq_vector_spark.index.pq import train_opq

    df, data = corr_df
    cb = train_opq(df, "vec", m=4, nbits=4, seed=11)
    q = [float(x) for x in data[5]]
    got = [
        r["id"]
        for r in pq_topk(
            df, "vec", cb, q, 10, rerank=40, tie_break="id"
        ).collect()
    ]
    want = [
        r["id"]
        for r in df.orderBy(
            array_distance("vec", q).asc_nulls_last(), F.col("id").asc()
        )
        .limit(10)
        .collect()
    ]
    assert got == want


def test_opq_codebook_save_load_rotation(tmp_path, spark, corr_df):
    from pq_vector_spark.index.pq import train_opq

    df, _ = corr_df
    cb = train_opq(df, "vec", m=4, nbits=4, seed=11)
    p = str(tmp_path / "opq_cb")
    cb.save(p)
    back = PQCodebook.load(p)
    assert np.array_equal(back.codebooks, cb.codebooks)
    assert np.array_equal(back.rotation, cb.rotation)
    # plain PQ round-trips rotation=None
    pq = train_pq(df, "vec", m=4, nbits=4, seed=11)
    p2 = str(tmp_path / "pq_cb")
    pq.save(p2)
    assert PQCodebook.load(p2).rotation is None


def test_ivf_opq_composition_envelope(spark, vec_df, tmp_path_factory):
    """IVF × OPQ: the rotated codebook flows through encode_indexed and
    ivfpq_topk transparently (rotation applied in the encode UDF and the
    query LUT; the coarse quantizer and exact re-rank see raw vectors).
    Envelope (nprobe = n_clusters, full-cover rerank) ⇒ brute force."""
    from pq_vector_spark.index.build import build_index
    from pq_vector_spark.index.pq import encode_indexed, ivfpq_topk, train_opq
    from pq_vector_spark.session import IndexBuildOptions

    df, data = vec_df
    base = tmp_path_factory.mktemp("ivfopq")
    src = str(base / "src.parquet")
    idx = str(base / "indexed")
    codes = str(base / "codes")
    df.write.parquet(src)
    build_index(spark, src, idx, column="vec", options=IndexBuildOptions(n_clusters=8))
    cb = train_opq(df, "vec", m=4, nbits=6, seed=11)
    assert cb.rotation is not None
    encode_indexed(spark, idx, codes, "vec", "id", cb)
    q = [float(x) for x in data[3]]
    got = [
        r["id"]
        for r in ivfpq_topk(
            spark, idx, codes, "vec", "id", cb, q, 10, nprobe=8, rerank=40
        ).collect()
    ]
    d2 = ((data.astype(np.float64) - np.array(q)) ** 2).sum(axis=1)
    want = [int(i) for i in np.lexsort((np.arange(len(d2)), d2))[:10]]
    assert got == want
