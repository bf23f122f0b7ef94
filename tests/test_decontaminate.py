"""Decontamination tests (operators/decontaminate.py): overlap counting
against a hand-computable fixture, threshold/min-gram flagging, the
broadcast plan shape, and survival of clean docs."""

import pytest
from pyspark.sql import functions as F

from pq_vector_spark.operators.decontaminate import (
    contamination_report,
    decontaminate,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            # doc 0 contains eval doc 100's full text → total contamination
            (0, "alpha beta gamma delta epsilon zeta"),
            # doc 1 shares one 3-gram window with eval 100
            (1, "alpha beta gamma nothing else here at all"),
            # doc 2 is clean
            (2, "completely unrelated words occupy this document"),
        ],
        ["doc_id", "text"],
    )


@pytest.fixture(scope="module")
def eval_set(spark):
    return spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], ["eid", "text"]
    )


def test_overlap_counts(spark, corpus, eval_set):
    rep = contamination_report(
        corpus, eval_set, "text", corpus_id="doc_id", eval_id="eid", n=3
    )
    rows = {r["doc_id"]: r for r in rep.collect()}
    # eval doc has 4 distinct 3-grams; doc 0 shares all 4
    assert rows[0]["shared_grams"] == 4
    assert rows[0]["eval_grams"] == 4
    assert rows[0]["overlap_frac"] == 1.0
    # doc 1 shares exactly the "alpha beta gamma" window
    assert rows[1]["shared_grams"] == 1
    assert rows[1]["overlap_frac"] == 0.25
    assert 2 not in rows


def test_min_grams_filter(corpus, eval_set):
    rep = contamination_report(
        corpus, eval_set, "text", corpus_id="doc_id", eval_id="eid", n=3, min_grams=2
    )
    ids = {r["doc_id"] for r in rep.collect()}
    assert ids == {0}


def test_decontaminate_drops_flagged(corpus, eval_set):
    out = decontaminate(
        corpus,
        eval_set,
        "text",
        corpus_id="doc_id",
        eval_id="eid",
        n=3,
        min_grams=4,
        threshold=1.1,  # only the min_grams arm fires
    )
    assert {r["doc_id"] for r in out.collect()} == {1, 2}


def test_decontaminate_threshold_arm(corpus, eval_set):
    out = decontaminate(
        corpus,
        eval_set,
        "text",
        corpus_id="doc_id",
        eval_id="eid",
        n=3,
        min_grams=10**9,  # only the fraction arm fires
        threshold=0.2,
    )
    # doc 0 (1.0) and doc 1 (0.25) both exceed 0.2
    assert {r["doc_id"] for r in out.collect()} == {2}


def test_corpus_never_shuffles_for_the_probe(corpus, eval_set):
    """100 TB contract: the gram match is a BroadcastHashJoin — the corpus
    side reaches the join without an Exchange."""
    rep = contamination_report(
        corpus, eval_set, "text", corpus_id="doc_id", eval_id="eid", n=3
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_fast_gram_hash_family(spark, corpus, eval_set):
    """gram_hash="fast" (xxhash64 on both sides — the at-scale probe):
    same flag decisions as the portable md5 family on this corpus, and
    unknown families raise."""
    kept_portable = {
        r["doc_id"]
        for r in decontaminate(
            corpus, eval_set, "text", eval_id="eid", n=3, min_grams=2
        ).collect()
    }
    kept_fast = {
        r["doc_id"]
        for r in decontaminate(
            corpus, eval_set, "text", eval_id="eid", n=3, min_grams=2,
            gram_hash="fast",
        ).collect()
    }
    assert kept_fast == kept_portable == {1, 2}
    with pytest.raises(ValueError, match="gram_hash"):
        decontaminate(corpus, eval_set, "text", eval_id="eid", gram_hash="md5")
