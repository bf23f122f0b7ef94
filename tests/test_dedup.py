"""Dedup operator tests: exact, Jaccard, MinHash-LSH, SimHash, embedding."""

import pytest
from pyspark.sql import functions as F

from pq_vector_spark.operators import dedup as D

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (2, "the quick brown fox jumps over a lazy dog"),  # near dup of 0
    (3, "completely different text about spark engines"),
    (4, "THE  Quick Brown Fox jumps over the lazy dog"),  # dup after normalize
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id INT, text STRING")


def test_exact_dedup_groups(docs):
    out = {r["keep_id"]: r["n_dups"] for r in D.exact_dedup(docs, "text", "doc_id").collect()}
    assert out[0] == 3  # 0, 1, 4 normalize to the same content
    assert out[2] == 1
    assert out[3] == 1


def test_jaccard_pairs_find_near_dup(docs):
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.3).collect()
    }
    assert out[(0, 1)] == 1.0
    # 0 vs 2 share 4 of 10 distinct 3-gram shingles → jaccard 0.4
    assert out[(0, 2)] == pytest.approx(0.4)
    assert all(not (a == 3 or b == 3) for a, b in out)  # distinct doc matches nothing


def test_minhash_candidates_contain_true_dups(docs):
    out = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_lsh_pairs(
            docs, "text", "doc_id", n=3, num_hashes=32, bands=8, threshold=0.5
        ).collect()
    }
    assert (0, 1) in out  # identical docs always collide in every band
    assert all(not (a == 3 or b == 3) for a, b in out)


def test_simhash_similar_docs_close(docs):
    sigs = {
        r["doc_id"]: r["sig"]
        for r in docs.select("doc_id", D.simhash("text", bits=16).alias("sig")).collect()
    }
    assert sigs[0] == sigs[1]  # identical text ⇒ identical signature
    ham_near = bin(sigs[0] ^ sigs[2]).count("1")
    ham_far = bin(sigs[0] ^ sigs[3]).count("1")
    assert ham_near < ham_far  # near-dup is closer in hamming space


def test_embedding_top_pairs(spark):
    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [1.0, 0.01]),  # nearly parallel to 0
            (2, [0.0, 1.0]),
        ],
        "vid INT, emb ARRAY<FLOAT>",
    )
    top = D.embedding_top_pairs(df, "emb", "vid", top=1).collect()[0]
    assert (top["id_a"], top["id_b"]) == (0, 1)
    assert top["cosine"] > 0.99


def test_embedding_near_dup_threshold(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.01]), (2, [0.0, 1.0])],
        "vid INT, emb ARRAY<FLOAT>",
    )
    out = D.embedding_near_dup(df, "emb", "vid", threshold=0.95).collect()
    assert len(out) == 1
