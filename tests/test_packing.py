"""Sequence-packing tests (operators/packing.py): concatenate-and-cut
invariants, determinism under re-partitioning, group independence, and
edge cases (zero-token docs, doc wider than the budget)."""

import pytest
from pyspark.sql import functions as F

from pq_vector_spark.operators.packing import pack_sequences, packing_stats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # (id, shard, tokens)
        (0, "a", 100),
        (1, "a", 100),
        (2, "a", 100),  # straddles the 256 cut (200..299)
        (3, "a", 0),  # empty doc
        (4, "a", 600),  # wider than one sequence
        (10, "b", 256),
        (11, "b", 1),
    ]
    return spark.createDataFrame(rows, ["doc_id", "shard", "tok"])


def _packed(docs):
    out = pack_sequences(
        docs, "tok", group_col="shard", order_col="doc_id", max_tokens=256
    )
    return {r["doc_id"]: (r["start_offset"], r["first_seq"], r["last_seq"]) for r in out.collect()}


def test_offsets_and_sequences(docs):
    p = _packed(docs)
    assert p[0] == (0, 0, 0)
    assert p[1] == (100, 0, 0)
    assert p[2] == (200, 0, 1)  # straddles the first cut
    assert p[3] == (300, 1, 1)  # empty doc occupies (degenerately) its position
    assert p[4] == (300, 1, 3)  # 300..899 spans sequences 1,2,3
    # group b starts its own stream at 0
    assert p[10] == (0, 0, 0)  # exactly fills sequence 0 (0..255)
    assert p[11] == (256, 1, 1)


def test_contiguity_invariant(docs):
    """start offsets within a group are the exclusive prefix sums — no
    gaps, no overlaps."""
    p = _packed(docs)
    assert p[1][0] == p[0][0] + 100
    assert p[2][0] == p[1][0] + 100


def test_deterministic_under_repartition(spark, docs):
    a = _packed(docs)
    b = _packed(docs.repartition(13))
    assert a == b


def test_bad_budget_rejected(docs):
    with pytest.raises(ValueError, match="max_tokens"):
        pack_sequences(docs, "tok", group_col="shard", order_col="doc_id", max_tokens=0)


def test_packing_stats(docs):
    st = {
        r["shard"]: (r["n_docs"], r["total_tokens"], r["n_sequences"])
        for r in packing_stats(docs, "tok", group_col="shard", max_tokens=256).collect()
    }
    assert st["a"] == (5, 900, 4)  # ceil(900/256) = 4
    assert st["b"] == (2, 257, 2)
