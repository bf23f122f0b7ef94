"""Bloom-filter decontamination (operators/bloom.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pq_vector_spark.operators.bloom import (
    _bloom_geometry,
    _positions,
    bloom_gram_hits,
    build_gram_bloom,
    decontaminate_bloom,
)
from pq_vector_spark.operators.decontaminate import decontaminate


@pytest.fixture(scope="module")
def corpora(spark):
    ev = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again today"),
            (2, "pack my box with five dozen liquor jugs right now friends"),
        ],
        "doc_id bigint, text string",
    )
    corpus = spark.createDataFrame(
        [
            # contains a full eval sentence → contaminated
            (10, "prefix words the quick brown fox jumps over the lazy dog again today suffix"),
            # clean prose, no eval overlap
            (11, "completely unrelated text about mountains rivers and weather patterns"),
            (12, "another clean document with plenty of its own original words here"),
            # partially overlapping but under the threshold
            (13, "the quick brown fox appears briefly here then something else entirely follows"),
            # no grams at all (too short for n=5)
            (14, "tiny doc"),
            (15, None),
        ],
        "doc_id bigint, text string",
    )
    return ev, corpus


def test_geometry_sane():
    m, k = _bloom_geometry(1000, 1e-3)
    assert m % 32 == 0 and m >= 1000 * 10  # ~14.4 bits/item at 1e-3
    assert 1 <= k <= 16
    with pytest.raises(ValueError, match="n_items"):
        _bloom_geometry(0, 0.01)
    with pytest.raises(ValueError, match="fpp"):
        _bloom_geometry(10, 1.5)


def test_positions_deterministic_and_in_range():
    g = np.array([123456789, 2**59, 7], dtype=np.int64)
    w1, m1 = _positions(g, 1024, 5)
    w2, m2 = _positions(g, 1024, 5)
    assert np.array_equal(w1, w2) and np.array_equal(m1, m2)
    assert w1.shape == (3, 5)
    assert (w1 >= 0).all() and (w1 < 1024 // 32).all()


def test_bloom_no_false_negatives_vs_exact(spark, corpora):
    ev, corpus = corpora
    bloom = build_gram_bloom(ev, "text", n=5, fpp=1e-3)
    assert bloom["n_grams"] > 0 and bloom["bits"].any()
    # min_grams-only comparison (threshold disabled on BOTH sides)
    exact_kept = {
        r["doc_id"]
        for r in decontaminate(
            corpus, ev, "text", n=5, min_grams=3, threshold=1.1
        ).collect()
    }
    bloom_kept = {
        r["doc_id"]
        for r in decontaminate_bloom(
            corpus, bloom, "text", min_grams=3, threshold=None
        ).collect()
    }
    # conservative: bloom never keeps a doc the exact operator drops
    assert bloom_kept <= exact_kept
    # and on this tiny filter there are no false positives either
    assert bloom_kept == exact_kept
    assert 10 not in bloom_kept and {11, 12, 13, 14, 15} <= bloom_kept
    # DEFAULT-vs-DEFAULT comparison (both rules active on both sides):
    # the superset guarantee the docstring actually promises
    exact_def = {
        r["doc_id"]
        for r in decontaminate(corpus, ev, "text", n=5, min_grams=3).collect()
    }
    bloom_def = {
        r["doc_id"]
        for r in decontaminate_bloom(corpus, bloom, "text", min_grams=3).collect()
    }
    assert bloom_def <= exact_def


def test_bloom_threshold_rule_covers_short_eval_docs(spark):
    """The r13 escape scenario (ADVICE medium): a short eval doc
    (< 2·min_grams distinct grams) fully contained in a corpus doc is
    dropped by the exact operator's overlap_frac rule but has too few
    shared grams for the min_grams rule. The smallest-eval-doc threshold
    analogue must drop it in the bloom path too."""
    ev = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again today"),
            # 6 tokens -> 2 distinct 5-grams: min_grams=3 alone can't fire
            (2, "secret canary string alpha beta gamma"),
        ],
        "doc_id bigint, text string",
    )
    corpus = spark.createDataFrame(
        [
            (20, "intro words secret canary string alpha beta gamma outro text"),
            (21, "totally unrelated clean document about rivers and mountains"),
        ],
        "doc_id bigint, text string",
    )
    bloom = build_gram_bloom(ev, "text", n=5, fpp=1e-3)
    assert bloom["min_eval_grams"] == 2
    exact_kept = {
        r["doc_id"]
        for r in decontaminate(corpus, ev, "text", n=5, min_grams=3).collect()
    }
    assert exact_kept == {21}  # threshold rule drops 20 (overlap_frac 1.0)
    bloom_kept = {
        r["doc_id"]
        for r in decontaminate_bloom(corpus, bloom, "text", min_grams=3).collect()
    }
    assert bloom_kept <= exact_kept  # the promised superset-of-drops
    assert bloom_kept == {21}
    # with the threshold rule disabled, the gap is EXPECTED and documented
    kept_no_thresh = {
        r["doc_id"]
        for r in decontaminate_bloom(
            corpus, bloom, "text", min_grams=3, threshold=None
        ).collect()
    }
    assert 20 in kept_no_thresh


def test_bloom_reserved_names_and_old_models(spark, corpora):
    ev, corpus = corpora
    bloom = build_gram_bloom(ev, "text", n=5, fpp=1e-2)
    clash = corpus.withColumn("_bloom_grams", F.lit(1))
    with pytest.raises(ValueError, match="_bloom_grams"):
        bloom_gram_hits(clash, bloom, "text", "h")
    with pytest.raises(ValueError, match="helper column"):
        bloom_gram_hits(corpus.withColumn("h", F.lit(1)), bloom, "text", "h")
    # a pre-r14 model dict (no min_eval_grams) can't serve the threshold
    # rule — loud error, with the explicit opt-out named
    old = {k: v for k, v in bloom.items() if k != "min_eval_grams"}
    with pytest.raises(ValueError, match="min_eval_grams"):
        decontaminate_bloom(corpus, old, "text")
    # but still works with the rule disabled
    assert decontaminate_bloom(corpus, old, "text", threshold=None).count() >= 0


def test_bloom_hits_counts_and_nulls(spark, corpora):
    ev, corpus = corpora
    bloom = build_gram_bloom(ev, "text", n=5, fpp=1e-3)
    hits = {
        r["doc_id"]: r["h"]
        for r in bloom_gram_hits(corpus, bloom, "text", "h")
        .select("doc_id", "h")
        .collect()
    }
    assert hits[10] == 7  # 11-token embedded run -> 7 shared 5-grams
    assert hits[11] == 0 and hits[12] == 0
    assert hits[14] == 0 and hits[15] == 0  # gram-less docs: zero, kept
    # hits_col audit form
    out = decontaminate_bloom(
        corpus, bloom, "text", min_grams=3, hits_col="bloom_hits"
    )
    assert "bloom_hits" in out.columns


def test_bloom_deterministic_rebuild(spark, corpora):
    ev, _ = corpora
    b1 = build_gram_bloom(ev, "text", n=5, fpp=1e-2)
    b2 = build_gram_bloom(ev, "text", n=5, fpp=1e-2)
    assert np.array_equal(b1["bits"], b2["bits"])
    assert (b1["m"], b1["k"], b1["n_grams"]) == (b2["m"], b2["k"], b2["n_grams"])


def test_bloom_validates(spark, corpora):
    ev, corpus = corpora
    bloom = build_gram_bloom(ev, "text", n=5, fpp=1e-2)
    with pytest.raises(ValueError, match="min_grams"):
        decontaminate_bloom(corpus, bloom, "text", min_grams=0)


def test_gram_barrier_survives_optimizer(spark, corpora):
    """The gram expression (split→shingle→md5 hash) must appear EXACTLY
    ONCE in the optimized plan, inside the inline-generator barrier, with
    the Arrow UDF consuming the generated ATTRIBUTE (r13 verdict #6): if
    Catalyst ever re-inlines generator outputs, the UDF argument would
    embed HOF lambdas again — a runtime INTERNAL_ERROR at best, a
    silent per-consumer re-evaluation at worst."""
    ev, corpus = corpora
    bloom = build_gram_bloom(ev, "text", n=5, fpp=1e-2)
    plan = (
        bloom_gram_hits(corpus, bloom, "text", "h")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("Generate inline") == 1
    assert plan.count("md5(") == 1  # the gram hash is computed once
    assert "ArrowEvalPython" in plan and "_bloom_grams" in plan


def test_fast_gram_hash_family(spark, corpora):
    """gram_hash="fast" (xxhash64, the at-scale probe family): same
    survivor behavior on an FP-free filter, the family is recorded in
    the model and the probe follows it automatically; unknown families
    raise. xxhash64 is SIGNED — the position math reinterprets it as
    uint64 identically on build and probe."""
    ev, corpus = corpora
    fast = build_gram_bloom(ev, "text", n=5, fpp=1e-3, gram_hash="fast")
    assert fast["gram_hash"] == "fast"
    portable = build_gram_bloom(ev, "text", n=5, fpp=1e-3)
    kept_fast = {
        r["doc_id"]
        for r in decontaminate_bloom(
            corpus, fast, "text", min_grams=3, threshold=None
        ).collect()
    }
    kept_portable = {
        r["doc_id"]
        for r in decontaminate_bloom(
            corpus, portable, "text", min_grams=3, threshold=None
        ).collect()
    }
    assert kept_fast == kept_portable == {11, 12, 13, 14, 15}
    # deterministic rebuild holds for the fast family too
    fast2 = build_gram_bloom(ev, "text", n=5, fpp=1e-3, gram_hash="fast")
    assert np.array_equal(fast["bits"], fast2["bits"])
    with pytest.raises(ValueError, match="gram_hash"):
        build_gram_bloom(ev, "text", gram_hash="md5")


def test_threshold_above_one_is_inert(spark, corpora):
    """threshold > 1 can never fire in the exact operator (overlap_frac
    <= 1), so the bloom analogue must not derive a cut from it — the
    r14 review caught it over-dropping docs the exact twin keeps."""
    ev, corpus = corpora
    bloom = build_gram_bloom(ev, "text", n=5, fpp=1e-3)
    kept_inert = {
        r["doc_id"]
        for r in decontaminate_bloom(
            corpus, bloom, "text", min_grams=3, threshold=1.1
        ).collect()
    }
    kept_none = {
        r["doc_id"]
        for r in decontaminate_bloom(
            corpus, bloom, "text", min_grams=3, threshold=None
        ).collect()
    }
    assert kept_inert == kept_none  # pure min_grams semantics either way
