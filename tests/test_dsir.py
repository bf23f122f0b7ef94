"""DSIR importance resampling (Xie et al. 2023): hashed-ngram models,
log importance weights, Gumbel-top-k selection."""

import pytest
from pyspark.sql import functions as F

from pq_vector_spark.operators.dsir import dsir_importance_weights, dsir_select

RAW = [
    (1, "the cat sat on the mat"),
    (2, "stock market prices rose sharply today"),
    (3, "a dog sat near the cat"),
    (4, "quarterly earnings beat expectations amid volatility"),
    (5, "   "),
    (6, None),
]
TARGET = [
    (0, "the cat sat quietly"),
    (1, "a cat and a dog sat together"),
]


@pytest.fixture(scope="module")
def corpora(spark):
    raw = spark.createDataFrame(RAW, "doc_id: bigint, text: string")
    target = spark.createDataFrame(TARGET, "tid: bigint, text: string")
    return raw, target


def test_weights_rank_by_target_resemblance(corpora):
    """Equal-length docs: the animal docs (target-like) must outweigh the
    finance docs; featureless docs score NULL (no signal), including
    NULL text."""
    raw, target = corpora
    w = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_importance_weights(
            raw, "text", "doc_id", target, smoothing=0.1
        ).collect()
    }
    assert w[1] > w[2] and w[1] > w[4]
    assert w[3] > w[2] and w[3] > w[4]
    assert w[5] is None and w[6] is None
    assert len(w) == 6  # every input row surfaces exactly once


def test_scoring_plan_has_no_corpus_exchange(corpora):
    """The r14 reformulation's load-bearing property: scoring sums the
    llr PER GRAM OCCURRENCE (Σ_b c_b·llr_b = Σ_g llr[b(g)]), so no
    (doc, bucket) count table exists and every aggregation map-side
    combines before its exchange — the plan must carry NO sort-merge
    join and exactly the bounded hash aggregations (the corpus explode
    feeds a broadcast join, never a corpus-keyed shuffle of gram rows)."""
    raw, target = corpora
    w = dsir_importance_weights(raw, "text", "doc_id", target)
    plan = w._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # the llr table rides a broadcast
    # exactly TWO shuffles: the per-doc sum (map-side combined to ~one
    # row per doc per partition) and the ids side of the NULL-reattach
    # left join — the r13 shape added a (doc, bucket) count exchange of
    # ~grams-per-corpus rows on top
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_weights_deterministic_across_partitioning(corpora):
    """Fate is a pure function of (text, models): a repartitioned input
    produces identical rounded weights — the engine's reproducibility
    contract applied to scoring."""
    raw, target = corpora
    a = sorted(dsir_importance_weights(raw, "text", "doc_id", target).collect())
    b = sorted(
        dsir_importance_weights(
            raw.repartition(7), "text", "doc_id", target
        ).collect()
    )
    assert a == b


def test_select_hard_and_gumbel(corpora):
    """Hard top-k keeps the best-resembling docs; the Gumbel variant is
    deterministic across calls (salted-hash noise, no RNG) and changes
    with the salt; NULL-weight docs rank last."""
    raw, target = corpora
    hard = [
        r["doc_id"]
        for r in dsir_select(
            raw, "text", "doc_id", target, 2, gumbel=False, smoothing=0.1
        ).collect()
    ]
    assert set(hard) == {1, 3}
    g1 = [
        r["doc_id"]
        for r in dsir_select(raw, "text", "doc_id", target, 3, smoothing=0.1).collect()
    ]
    g2 = [
        r["doc_id"]
        for r in dsir_select(raw, "text", "doc_id", target, 3, smoothing=0.1).collect()
    ]
    assert g1 == g2
    assert 5 not in g1[:2] and 6 not in g1[:2]  # NULLs never outrank scores
    # selecting everything returns featureless docs LAST
    full = [
        r["doc_id"]
        for r in dsir_select(raw, "text", "doc_id", target, 6, smoothing=0.1).collect()
    ]
    assert set(full[-2:]) == {5, 6}


def test_select_plans_bounded_heap_and_broadcast(corpora):
    """The llr table (buckets rows) broadcasts to the scoring join and the
    selection plans as TakeOrderedAndProject — no global sort, no
    shuffled pair table."""
    raw, target = corpora
    plan = (
        dsir_select(raw, "text", "doc_id", target, 2, gumbel=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_validation(corpora):
    raw, target = corpora
    with pytest.raises(ValueError, match="n_max"):
        dsir_importance_weights(raw, "text", "doc_id", target, n_max=0)
    with pytest.raises(ValueError, match="buckets"):
        dsir_importance_weights(raw, "text", "doc_id", target, buckets=1)
    with pytest.raises(ValueError, match="smoothing"):
        dsir_importance_weights(raw, "text", "doc_id", target, smoothing=0.0)
    with pytest.raises(ValueError, match="k must"):
        dsir_select(raw, "text", "doc_id", target, 0)


def test_bigrams_contribute(spark):
    """n_max=2 sees word ORDER that unigrams cannot: two docs with the
    same bag of words but different order get identical unigram-only
    weights and different bigram-inclusive weights."""
    raw = spark.createDataFrame(
        [(1, "new york city hall"), (2, "hall city york new")],
        "doc_id: bigint, text: string",
    )
    target = spark.createDataFrame(
        [(0, "welcome to new york city")], "tid: bigint, text: string"
    )
    uni = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_importance_weights(
            raw, "text", "doc_id", target, n_max=1
        ).collect()
    }
    bi = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_importance_weights(
            raw, "text", "doc_id", target, n_max=2
        ).collect()
    }
    assert uni[1] == uni[2]
    assert bi[1] > bi[2]  # "new york" / "york city" bigrams match the target


def test_target_only_contributes_bucket_totals(spark, corpora):
    """The target enters as a buckets-row model: splitting one target doc
    into two rows with the same concatenated text leaves every weight
    unchanged (no row-wise target join anywhere)."""
    raw, _ = corpora
    t1 = spark.createDataFrame(
        [(0, "the cat sat quietly a cat and a dog sat together")],
        "tid: bigint, text: string",
    )
    # same token stream split across rows — unigram totals identical,
    # bigram totals differ only at the seam ("quietly a"), so compare
    # with n_max=1
    t2 = spark.createDataFrame(
        [(0, "the cat sat quietly"), (1, "a cat and a dog sat together")],
        "tid: bigint, text: string",
    )
    w1 = sorted(
        dsir_importance_weights(raw, "text", "doc_id", t1, n_max=1).collect()
    )
    w2 = sorted(
        dsir_importance_weights(raw, "text", "doc_id", t2, n_max=1).collect()
    )
    assert w1 == w2


def test_weights_are_exact_nano_sums(corpora):
    """r15 (ADVICE low): the r14 float-sum scoring relied on no doc's
    true weight sitting within summation-order ulp error of a round-6
    boundary — and the sf0.01 attestation fixture measurably had one
    5e-11 away (a latent cross-engine flip). The fix quantizes the llr
    table to integer nano-units, making the per-doc score an exact
    bigint sum. Pin the contract: every returned log_weight is an exact
    multiple of 1e-9 (bit-equal to round(w·1e9)/1e9), so any engine that
    sums the same integers reproduces it bit-for-bit."""
    raw, target = corpora
    for r in dsir_importance_weights(raw, "text", "doc_id", target).collect():
        w = r["log_weight"]
        if w is not None:
            assert w == round(w * 1e9) / 1e9


@pytest.mark.skipif(
    not __import__("os").path.isdir("/root/testdata/sf0.01"),
    reason="attestation fixture not present",
)
def test_attestation_quantization_margin_at_sf001(spark):
    """r15 (ADVICE low): with nano-quantized llr sums, the ONLY remaining
    cross-engine float step in sample_dsir is the llr itself — DuckDB
    re-derives each bucket's ln-ratio and floors llr·1e9 + 0.5, so a
    1-ulp libm difference flips the integer only if that product sits
    within ~a-few-ulp of an integer. Pin the margin for the exact
    attestation fixture (sf0.01, the driver entry's params): every
    bucket's quantization input must sit > 50 ulp from its floor
    boundary. If a fixture refresh ever lands a bucket near one, THIS
    fails — not the driver gate, undiagnosably, rounds later."""
    import math

    from pq_vector_spark.operators.dsir import _bucket_model, _gram_buckets

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    target = docs.filter(F.col("doc_id") % 50 == 7)
    raw = docs.filter(F.col("doc_id") % 50 != 7)
    buckets, smoothing = 4096, 0.5

    ex = _gram_buckets(raw, "text", "doc_id", 2, buckets)
    tex = _gram_buckets(
        target.select(
            F.monotonically_increasing_id().alias("_tid"),
            F.col("text").alias("_ttext"),
        ),
        "_ttext",
        "_tid",
        2,
        buckets,
    )
    nt = {int(r["_b"]): int(r["_n"]) for r in _bucket_model(tex).collect()}
    nr = {int(r["_b"]): int(r["_n"]) for r in _bucket_model(ex).collect()}
    assert nt and nr, "fixture produced no model buckets"
    dt = float(sum(nt.values())) + smoothing * buckets
    dr = float(sum(nr.values())) + smoothing * buckets
    worst = (float("inf"), None)
    for b in set(nt) | set(nr):
        llr = math.log((nt.get(b, 0) + smoothing) / dt) - math.log(
            (nr.get(b, 0) + smoothing) / dr
        )
        x = llr * 1e9 + 0.5
        # distance to the nearest floor boundary (integer), in either
        # direction — the quantity a 1-ulp ln difference must cross
        margin = min(x - math.floor(x), math.floor(x) + 1.0 - x)
        ulp = math.ulp(x)
        if margin / ulp < worst[0]:
            worst = (margin / ulp, b)
    assert worst[0] > 50, (
        f"bucket {worst[1]}'s llr quantization input sits {worst[0]:.1f} "
        "ulp from a floor boundary — a 1-ulp cross-engine ln difference "
        "could flip the integer llr; re-seed or widen the quantum"
    )


def test_fast_bucket_hash_same_ranking_shape(corpora):
    """bucket_hash="fast" (xxhash64 — the at-scale featurization) keeps
    the estimator's ranking behavior on separable corpora even though
    bucket collisions differ from the portable md5 family."""
    raw, target = corpora
    w = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_importance_weights(
            raw, "text", "doc_id", target, smoothing=0.1, bucket_hash="fast"
        ).collect()
    }
    assert w[1] > w[2] and w[1] > w[4]
    assert w[3] > w[2] and w[3] > w[4]
    assert w[5] is None
    with pytest.raises(ValueError, match="bucket_hash"):
        dsir_importance_weights(raw, "text", "doc_id", target, bucket_hash="md5")


def test_gumbel_quantization_margin_entire_domain():
    """r16 (ADVICE): gumbel_score quantizes the Gumbel term with
    floor(-ln(-ln(u))·1e9 + 0.5). u = (h + 0.5)/1e6 has exactly 10^6
    possible values, so the floor-boundary margin can be pinned over the
    ENTIRE domain, fixture-free and always-on: measured minimum 10 ulp
    (at h=732149); a cross-engine libm difference of a few ulp on the two
    ln's can never flip any quantized Gumbel integer. Assert > 8 ulp to
    leave room for this host's own libm vs the measuring one."""
    import numpy as np

    h = np.arange(1_000_000, dtype=np.float64)
    x = -np.log(-np.log((h + 0.5) / 1e6)) * 1e9 + 0.5
    fl = np.floor(x)
    margin = np.minimum(x - fl, fl + 1.0 - x)
    assert (margin / np.spacing(np.abs(x))).min() > 8


def test_gumbel_score_is_exact_nano_sum(corpora, spark):
    """r16 (ADVICE): gumbel_score = (lw_nano + g_nano)/1e9 — an exact
    integer sum in nano-units, like log_weight itself, NOT a rounded
    float difference. Verify against an independent Python recomputation
    of both integers (the weight recovered via round(w·1e9), the Gumbel
    term floor-quantized from the salted-hash uniform), and that the
    round-trip recovery margin is comfortable."""
    import math

    from pq_vector_spark.operators.sampling import BUCKETS, hash_bucket

    raw, target = corpora
    rows = {
        r["doc_id"]: (r["log_weight"], r["gumbel_score"])
        for r in dsir_select(
            raw, "text", "doc_id", target, 6, smoothing=0.1
        ).collect()
    }
    hs = {
        r["doc_id"]: r["h"]
        for r in raw.select(
            "doc_id", hash_bucket("doc_id", "dsir").alias("h")
        ).collect()
    }
    checked = 0
    for doc_id, (lw, gs) in rows.items():
        if lw is None:
            assert gs is None
            continue
        # recovery margin: lw·1e9 sits well inside ±0.5 of its integer
        prod = lw * 1e9
        assert abs(prod - round(prod)) < 0.01
        lw_nano = round(prod)
        u = (hs[doc_id] + 0.5) / float(BUCKETS)
        g_nano = math.floor(-math.log(-math.log(u)) * 1e9 + 0.5)
        assert gs == (lw_nano + g_nano) / 1e9
        checked += 1
    assert checked >= 2


def test_synthetic_llr_quantization_margin(spark):
    """r16 (ADVICE): the fixture-gated sf0.01 margin test silently
    passes on a checkout without /root/testdata — this synthetic twin
    always runs. Same contract, tiny in-test corpus: every llr bucket's
    quantization input must sit far from its floor boundary, so a 1-ulp
    cross-engine ln difference cannot flip the integer llr the oracle
    re-derives."""
    import math

    from pq_vector_spark.operators.dsir import _bucket_model, _gram_buckets

    raw = spark.createDataFrame(
        [(i, f"synthetic margin doc {i} with shared words {i % 5}") for i in range(60)],
        "doc_id: bigint, text: string",
    )
    target = raw.filter(F.col("doc_id") % 10 == 3)
    buckets, smoothing = 256, 0.5
    ex = _gram_buckets(raw.filter(F.col("doc_id") % 10 != 3), "text", "doc_id", 2, buckets)
    tex = _gram_buckets(
        target.select(
            F.monotonically_increasing_id().alias("_tid"),
            F.col("text").alias("_ttext"),
        ),
        "_ttext", "_tid", 2, buckets,
    )
    nt = {int(r["_b"]): int(r["_n"]) for r in _bucket_model(tex).collect()}
    nr = {int(r["_b"]): int(r["_n"]) for r in _bucket_model(ex).collect()}
    assert nt and nr
    dt = float(sum(nt.values())) + smoothing * buckets
    dr = float(sum(nr.values())) + smoothing * buckets
    worst = float("inf")
    for b in set(nt) | set(nr):
        llr = math.log((nt.get(b, 0) + smoothing) / dt) - math.log(
            (nr.get(b, 0) + smoothing) / dr
        )
        x = llr * 1e9 + 0.5
        margin = min(x - math.floor(x), math.floor(x) + 1.0 - x)
        worst = min(worst, margin / math.ulp(x))
    assert worst > 50, f"synthetic llr margin degraded to {worst:.1f} ulp"
