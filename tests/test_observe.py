"""Observability tests ≙ reference plan metrics (A23,
src/df_vector/index_exec.rs:283-300: files_scanned / candidate_rows)."""

import numpy as np
import pytest
from pyspark.sql import Observation

from pq_vector_spark.index.build import build_index
from pq_vector_spark.index.search import indexed_topk
from pq_vector_spark.session import IndexBuildOptions, VectorTopKOptions


@pytest.fixture(scope="module")
def obs_table(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("obsidx")
    src = str(base / "src.parquet")
    out = str(base / "indexed")
    rng = np.random.default_rng(3)
    rows = [(int(i), [float(x) for x in rng.random(4, dtype=np.float32)]) for i in range(1000)]
    spark.createDataFrame(rows, "id INT, vec ARRAY<FLOAT>").write.mode("overwrite").parquet(src)
    build_index(spark, src, out, column="vec", options=IndexBuildOptions(n_clusters=10))
    return out


def test_candidate_rows_observed(spark, obs_table):
    obs = Observation("pq_vector")
    out = indexed_topk(
        spark,
        obs_table,
        [0.5] * 4,
        5,
        options=VectorTopKOptions(nprobe=2),
        tie_break="id",
        observation=obs,
    )
    out.collect()
    got = obs.get
    # nprobe=2 of 10 clusters ⇒ a strict subset of the 1000 rows was scanned
    assert 0 < got["candidate_rows"] < 1000
    assert got["files_scanned"] >= 1


def test_full_probe_observes_all_rows(spark, obs_table):
    obs = Observation("pq_vector_full")
    out = indexed_topk(
        spark,
        obs_table,
        [0.5] * 4,
        5,
        options=VectorTopKOptions(nprobe=10),
        tie_break="id",
        observation=obs,
    )
    out.collect()
    assert obs.get["candidate_rows"] == 1000
