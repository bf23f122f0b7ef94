"""k-means kernel parity tests (reference: src/ivf/index.rs:322-454)."""

import numpy as np

from pq_vector_spark.index.build import _sample_size, default_n_clusters
from pq_vector_spark.index.kmeans import (
    kmeans_pp_init,
    lloyd,
    nearest_centroids,
    train_kmeans,
)


def test_default_n_clusters():
    # ceil(sqrt(n)) ≙ src/ivf/index.rs:161-167
    assert default_n_clusters(1_000_000) == 1000
    assert default_n_clusters(1) == 1
    assert default_n_clusters(10) == 4


def test_sample_size_policy():
    # max(5%, n_clusters) cap 100k ≙ src/ivf/index.rs:172-174
    assert _sample_size(1_000_000, 1000, 100_000) == 50_000
    assert _sample_size(10_000_000, 1000, 100_000) == 100_000
    assert _sample_size(100, 50, 100_000) == 50


def test_train_deterministic():
    rng = np.random.default_rng(7)
    data = rng.random((500, 8), dtype=np.float32)
    c1 = train_kmeans(data, 10, seed=42)
    c2 = train_kmeans(data, 10, seed=42)
    np.testing.assert_array_equal(c1, c2)


def test_empty_cluster_becomes_zero_vector():
    # ≙ src/ivf/index.rs:436-453: zero-fill then divide only non-empty
    data = np.array([[0.0, 0.0], [0.1, 0.0], [10.0, 10.0]], dtype=np.float32)
    # 3 clusters, but force centroids so one gets no members after one step
    init = np.array([[0.0, 0.0], [10.0, 10.0], [100.0, 100.0]], dtype=np.float32)
    cents, assign = lloyd(data, init.copy(), max_iters=5)
    assert (cents[2] == 0.0).all()
    assert set(assign.tolist()) <= {0, 1, 2}


def test_kmeans_pp_uses_d2_weighting():
    rng = np.random.default_rng(0)
    # two tight blobs far apart: ++ init should pick one from each
    blob_a = rng.normal(0, 0.01, (100, 2)).astype(np.float32)
    blob_b = rng.normal(100, 0.01, (100, 2)).astype(np.float32)
    data = np.vstack([blob_a, blob_b])
    cents = kmeans_pp_init(data, 2, np.random.default_rng(42))
    spread = np.abs(cents[0] - cents[1]).max()
    assert spread > 50  # one centroid per blob


def test_nearest_centroids_clamps_nprobe():
    cents = np.eye(3, dtype=np.float32)
    got = nearest_centroids(np.array([1.0, 0.0, 0.0], dtype=np.float32), cents, 99)
    assert len(got) == 3
    assert got[0] == 0  # closest centroid first
