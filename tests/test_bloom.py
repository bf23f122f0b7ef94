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
    # r15 (ADVICE medium): the derived cut is 1 (ceil(0.5·2)) and at
    # fpp=1e-3 that wrongly drops ~63% of clean 1000-gram docs — the
    # operator must refuse unless the caller explicitly opts in
    with pytest.raises(ValueError, match="allow_risky_cut"):
        decontaminate_bloom(corpus, bloom, "text", min_grams=3)
    bloom_kept = {
        r["doc_id"]
        for r in decontaminate_bloom(
            corpus, bloom, "text", min_grams=3, allow_risky_cut=True
        ).collect()
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


def test_build_caches_contract_identical_model(spark, corpora):
    """r15: with _caches the build persists the hashed per-doc gram
    arrays + the distinct gram set (three jobs otherwise re-hash the
    eval side) — the model must be bit-identical and the caches handed
    back for the caller to release."""
    ev, _ = corpora
    plain = build_gram_bloom(ev, "text", n=5, fpp=1e-3)
    caches: list = []
    cached = build_gram_bloom(ev, "text", n=5, fpp=1e-3, _caches=caches)
    for c in caches:
        c.unpersist()
    assert len(caches) == 2
    assert np.array_equal(plain["bits"], cached["bits"])
    assert {k: v for k, v in plain.items() if k != "bits"} == {
        k: v for k, v in cached.items() if k != "bits"
    }


def test_wrongful_drop_risk_values():
    """The severity statistic behind the r15 warn/raise policy: exact
    binomial tail P[Bin(1000, fpp) >= cut]."""
    from pq_vector_spark.operators.bloom import _wrongful_drop_risk

    # cut=1, fpp=1e-3: 1 - 0.999^1000 ~= 0.632 (the docstring's 63%)
    assert abs(_wrongful_drop_risk(1, 1e-3) - 0.6323) < 1e-3
    # monotone decreasing in cut; crosses the 1% raise line at cut 5
    risks = [_wrongful_drop_risk(c, 1e-3) for c in range(1, 7)]
    assert all(a > b for a, b in zip(risks, risks[1:]))
    assert risks[3] > 0.01 > risks[4]  # cut=4 raises, cut=5 warns
    # tiny fpp: cut=1 is ~1e-3 (warn, not raise); cut=2 below the warn line
    assert 1e-6 < _wrongful_drop_risk(1, 1e-6) < 0.01
    assert _wrongful_drop_risk(2, 1e-6) < 1e-6
    # a cut larger than the doc's gram count can never fire
    assert _wrongful_drop_risk(20, 1e-3, n_doc_grams=10) == 0.0


def test_threshold_warning_only_when_binding(spark, corpora, caplog):
    """r15 (ADVICE medium): a final cut equal to the caller's own
    min_grams must NOT warn — the r14 logic fired 'threshold derives cut
    3' on every driver attestation even though min_grams=3 was the
    binding value. And when the threshold DOES bind but the model's fpp
    keeps the wrongful-drop risk moderate (1e-6 < risk <= 1%), the
    operator warns with the computed number instead of raising."""
    import logging

    ev, corpus = corpora
    # min_eval_grams=7 -> derived cut ceil(0.5*7)=4 >= min_grams=3: the
    # threshold never binds, so nothing may fire even though the final
    # cut (3) is small
    bloom = build_gram_bloom(ev, "text", n=5, fpp=1e-3)
    with caplog.at_level(logging.WARNING, "pq_vector_spark.operators.bloom"):
        decontaminate_bloom(corpus, bloom, "text", min_grams=3).collect()
    assert not [r for r in caplog.records if "decontaminate_bloom" in r.message]

    # short eval doc (2 grams -> derived cut 1) at fpp=1e-6: risk ~1e-3
    # is in the warn band — logged with the number, no raise
    caplog.clear()
    short_ev = spark.createDataFrame(
        [(2, "secret canary string alpha beta gamma")],
        "doc_id bigint, text string",
    )
    small = build_gram_bloom(short_ev, "text", n=5, fpp=1e-6)
    assert small["min_eval_grams"] == 2
    with caplog.at_level(logging.WARNING, "pq_vector_spark.operators.bloom"):
        decontaminate_bloom(corpus, small, "text", min_grams=3).collect()
    warned = [r for r in caplog.records if "wrongful-drop" in r.message]
    assert len(warned) == 1 and "below min_grams=3" in warned[0].getMessage()


def test_oracle_sql_geometry_matches_python():
    """r15 (ADVICE low): the text_decontaminate_bloom oracle re-derives
    (m, k) in DuckDB SQL (ln/ceil/round). A 1-ulp libm difference at a
    ceil boundary, or Python's half-to-even vs DuckDB's half-away round
    at an exact .5 for k, would build a different filter and fail the
    attestation undiagnosably. Pin the two derivations equal across every
    n_grams the sf0.01/sf0.1 fixtures could produce (1..200k) at the
    oracle's fpp=1e-6."""
    import duckdb

    rows = duckdb.sql(
        """
        SELECT n, m,
               greatest(CAST(1 AS BIGINT),
                        least(CAST(16 AS BIGINT),
                              CAST(round(CAST(m AS DOUBLE) / n * ln(2), 0)
                                   AS BIGINT))) AS k
        FROM (SELECT n,
                greatest(CAST(ceil(CAST(ceil(-n * ln(1e-6)
                           / (ln(2) * ln(2))) AS BIGINT) / 32.0)
                         AS BIGINT) * 32,
                         CAST(64 AS BIGINT)) AS m
              FROM (SELECT unnest(range(1, 200001)) AS n))
        ORDER BY n
        """
    ).fetchall()
    bad = []
    for n, m_sql, k_sql in rows:
        m_py, k_py = _bloom_geometry(int(n), 1e-6)
        if (m_py, k_py) != (int(m_sql), int(k_sql)):
            bad.append((n, (m_sql, k_sql), (m_py, k_py)))
    assert not bad, f"geometry divergence at {bad[:5]} (+{len(bad)} total)"


def test_approx_sizing_one_less_pass_same_behavior(spark, corpora):
    """r16 (ordered by the r15 verdict): sizing="approx" folds the
    distinct-gram count into the min-eval job (approx_count_distinct at
    rsd 2% + 5% inflation) — the sizing estimate must bracket the exact
    count from above-ish (HLL error band), min_eval_grams must be
    IDENTICAL to the exact path's, and the filter must still catch every
    contaminated doc the exact-sized filter catches (a larger m only
    lowers fpp; false negatives are impossible in either)."""
    ev, corpus = corpora
    exact = build_gram_bloom(ev, "text", n=5, fpp=1e-3)
    approx = build_gram_bloom(ev, "text", n=5, fpp=1e-3, sizing="approx")
    assert exact["sizing"] == "exact" and approx["sizing"] == "approx"
    # HLL at rsd 2% on a ~20-gram set is near-exact; the 5% inflation
    # means the estimate can only land >= ceil-ish of the truth
    assert exact["n_grams"] <= approx["n_grams"] <= int(exact["n_grams"] * 1.2) + 2
    assert approx["min_eval_grams"] == exact["min_eval_grams"]
    kept_exact = {
        r["doc_id"]
        for r in decontaminate_bloom(
            corpus, exact, "text", min_grams=3, threshold=None
        ).collect()
    }
    kept_approx = {
        r["doc_id"]
        for r in decontaminate_bloom(
            corpus, approx, "text", min_grams=3, threshold=None
        ).collect()
    }
    assert kept_approx == kept_exact
    # explicit n_grams wins over either mode and records its provenance
    explicit = build_gram_bloom(
        ev, "text", n=5, fpp=1e-3, n_grams=64, sizing="approx"
    )
    assert explicit["sizing"] == "explicit" and explicit["n_grams"] == 64
    with pytest.raises(ValueError, match="sizing"):
        build_gram_bloom(ev, "text", sizing="hll")


def test_stats_records_wrongful_drop_risk(spark, corpora):
    """r16 (r15 verdict order #6): the optional _stats dict must carry
    hit_cut / threshold_bound / wrongful_drop_risk, with the risk EQUAL
    to _wrongful_drop_risk at the final cut and the model fpp — the same
    number the >1% gate raises on — for both the binding and
    non-binding threshold cases."""
    from pq_vector_spark.operators.bloom import _wrongful_drop_risk

    ev, corpus = corpora
    # non-binding: min_eval_grams=7 -> derived 4 >= min_grams=3
    bloom = build_gram_bloom(ev, "text", n=5, fpp=1e-3)
    stats: dict = {}
    decontaminate_bloom(
        corpus, bloom, "text", min_grams=3, _stats=stats
    ).collect()
    assert stats["hit_cut"] == 3 and stats["threshold_bound"] is False
    assert stats["wrongful_drop_risk"] == _wrongful_drop_risk(3, 1e-3)

    # binding: 2-gram eval doc -> derived cut 1 < min_grams=3; fpp=1e-6
    # keeps the risk in the warn band so no raise
    short_ev = spark.createDataFrame(
        [(2, "secret canary string alpha beta gamma")],
        "doc_id bigint, text string",
    )
    small = build_gram_bloom(short_ev, "text", n=5, fpp=1e-6)
    stats = {}
    decontaminate_bloom(
        corpus, small, "text", min_grams=3, _stats=stats
    ).collect()
    assert stats["hit_cut"] == 1 and stats["threshold_bound"] is True
    assert stats["wrongful_drop_risk"] == _wrongful_drop_risk(1, 1e-6)
    assert 1e-6 < stats["wrongful_drop_risk"] < 0.01
