"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169, NeurIPS): select raw-corpus documents whose hashed
n-gram statistics look like a TARGET corpus, by importance weights between
two bag-of-hashed-ngrams models.

This is the standard published technique for "give me 100B tokens that
look like Wikipedia+books" pretraining-data selection, and the natural
complement to this engine's quality filters (Gopher flags pass/fail on
ABSOLUTE rules; DSIR ranks by RESEMBLANCE to a target distribution):

1. featurize every document into hashed word n-gram counts
   (n = 1..``n_max``, ``buckets`` hash buckets — the paper's 10k default);
2. fit two unigram models over buckets — target ``p`` and raw ``q`` —
   with add-``smoothing`` (Laplace) mass so unseen buckets stay finite;
3. per document, ``log w(x) = Σ_b f_b(x) · (ln p_b − ln q_b)``;
4. keep the top ``k`` by ``log w + Gumbel noise`` (Gumbel-top-k sampling
   ≡ sampling without replacement ∝ softmax of the weights — the paper's
   sampled variant), or by raw weight (``gumbel=False``, deterministic
   hard selection).

Scale shape (100 TB): NO corpus-sized exchange anywhere. Both n-gram
models aggregate straight off the exploded gram occurrences to
``buckets`` rows (map-side combined — 10k–65k ints cross the wire), the
log-likelihood-ratio table BROADCASTS, and the per-doc weight is
Σ_gram llr[bucket(gram)] — a broadcast join + one per-doc sum whose
exchange carries ≤ one row per doc per partition. Gram text never
shuffles. Selection is a bounded top-k heap (TakeOrderedAndProject).
The target corpus only ever contributes a ``buckets``-row model — it can
be any size and is never joined row-wise against the raw corpus.

Engine-replayable: bucketing is the portable md5 hash
(``functions/text.token_hash`` — DuckDB computes the identical value),
the models are int-count arithmetic, and the log-likelihood-ratio table
is QUANTIZED to integer nano-units (``floor(llr·1e9 + 0.5)``) before it
is broadcast — so the per-doc score is an EXACT bigint sum, identical
under any summation order, partitioning, or engine, and ``log_weight``
(the sum divided back by 1e9) is bit-deterministic without any final
rounding. The r14 float-sum form rounded to 6 decimals instead, and a
measured sf0.01 doc sat 5e-11 from a rounding boundary — inside
cross-engine summation-order error, a latent attestation flip
(tests/test_dsir.py pins the quantization margins that remain). The
Gumbel draw uses the engine's salted-hash-uniform (``hash_bucket``), so
even the sampled variant is a pure function of (id, salt).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pq_vector_spark.functions.text import _token_ngrams_upto, gram_hash_fn
from pq_vector_spark.operators.sampling import BUCKETS, hash_bucket


def _gram_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_max: int,
    buckets: int,
    bucket_hash: str = "portable",
) -> DataFrame:
    """(id, bucket): one row per hashed word n-gram OCCURRENCE — the
    shared pre-aggregation featurizer. Deliberately NOT aggregated to
    (id, bucket, count): every consumer reduces it with a map-side
    combine whose exchange is tiny (≤ ``buckets`` rows for the models,
    ≤ one row per doc per partition for scoring), whereas a (doc,
    bucket) intermediate shuffles ~grams-per-corpus rows — measured as
    the dominant cost of the r13 formulation at 1M docs. Gram text
    never reaches any exchange (int keys only). Tokenization runs ONCE
    per doc (``_token_ngrams_upto`` slides every window size over one
    bound token array — r15; the per-n ``tokens()`` re-split was the
    residual featurization cost at 1M docs)."""
    from pq_vector_spark.parallel import ensure_compute_parallelism

    # spread the slim (id, text) projection before the tokenize+hash
    # explode (r16, guide §2.5): a single-row-group source otherwise runs
    # the whole featurization — the operator's dominant CPU — in ONE
    # task; no-op whenever the scan is already cores-wide. The keyless
    # exchange is RoundRobinPartitioning, so the scale contract ("no
    # corpus-sized hash exchange") is untouched.
    base = ensure_compute_parallelism(
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_txt"))
    )
    grams = _token_ngrams_upto("_txt", n_max)
    h = gram_hash_fn(bucket_hash, param="bucket_hash")(F.col("_g"))
    return (
        base.select(F.col("_id"), F.explode(grams).alias("_g"))
        # a whitespace-only document tokenizes to [""] — that is "no
        # features", not a feature (mirrors gopher/quality word filters)
        .filter(F.col("_g") != "")
        .select("_id", F.pmod(h, F.lit(buckets)).alias("_b"))
    )


def _bucket_model(ex: DataFrame) -> DataFrame:
    """(bucket, cnt): corpus-level hashed-ngram counts straight off the
    occurrence frame — ``buckets`` rows, bounded at any corpus size, the
    exchange map-side combined to the same bound."""
    return ex.groupBy("_b").agg(F.count(F.lit(1)).cast("bigint").alias("_n"))


def dsir_importance_weights(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target: DataFrame,
    target_text_col: Optional[str] = None,
    *,
    n_max: int = 2,
    buckets: int = 10_000,
    smoothing: float = 0.5,
    bucket_hash: str = "portable",
    _attach_to: Optional[DataFrame] = None,
) -> DataFrame:
    """Per-document DSIR log importance weight vs ``target``: returns
    (``id_col``, ``log_weight``) with ``log_weight`` quantized to 1e-9
    (the llr table is integer nano-units, so the per-doc sum is exact
    bigint arithmetic — bit-deterministic across partitionings and
    engines; no float rounding anywhere). A document with no tokens has
    no features and scores NULL
    (no signal — ``dsir_select`` ranks it LAST; log weights are not
    normalized, so any fixed number would rank it arbitrarily among real
    scores). ``target`` needs only a text column (``target_text_col``
    defaults to ``text_col``).

    The raw model ``q`` is fit on ``df`` itself (the paper's estimator:
    importance weights between target and raw feature distributions).
    Both models live in ONE ``buckets``-row broadcast table carrying
    ``ln p_b − ln q_b``; scoring is a broadcast join + per-doc sum.

    ``bucket_hash``: ``"portable"`` (default) buckets by the md5-based
    ``token_hash`` an external engine replays bit-for-bit — the oracle
    path; ``"fast"`` buckets by JVM ``xxhash64`` (~3× cheaper on the
    featurization, the dominant cost at corpus scale). The two produce
    slightly different bucket collisions and therefore slightly
    different weights — same estimator, different hash family; pick one
    per pipeline and stay with it.

    Deliberately NO ``_caches`` contract here (unlike the dedup
    operators): the r14 reformulation left nothing worth caching — the
    only frame consumed twice is the pre-aggregation gram explode, and
    persisting ~grams-per-corpus int pairs measured SLOWER than
    re-exploding (82 vs 79 s fast / 90 vs 86 s portable at 1M docs:
    the cache write+read of ~10^9 rows exceeds one compute-bound,
    shuffle-free explode). Also measured-and-rejected (r15): in-doc
    run-length encoding (sort_array + RLE so md5 runs once per DISTINCT
    gram per doc, exact by integer count·llr) — the per-doc string sort
    cost MORE than the duplicate-gram md5 it saved (87.6 → 113.2 s
    portable / 80.5 → 100.2 s fast at 1M docs). The residual portable
    cost is the md5 family itself; ``bucket_hash="fast"`` is the
    at-scale answer.

    FAMILY STANCE (r16, retiring the r14 "portable ≲80 s" target with
    numbers): ``"fast"`` is the at-scale featurization family —
    pipelines at corpus scale should use it, full stop. ``"portable"``
    exists so an independent engine can replay the attestation
    bit-for-bit, and its ~9% premium over fast (87.6 vs 80.5 s
    standalone at 1M docs) IS the md5: no cheaper hash is shared by
    both engines, so the premium is the price of replayability, paid
    on attestation runs only.
    """
    if n_max < 1:
        raise ValueError(f"n_max must be >= 1, got {n_max}")
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    if bucket_hash not in ("portable", "fast"):
        raise ValueError(f"bucket_hash must be portable|fast, got {bucket_hash!r}")
    ex = _gram_buckets(df, text_col, id_col, n_max, buckets, bucket_hash)
    # the target model only needs bucket TOTALS — synthesize a row id so
    # the shared featurizer applies, it aggregates away immediately
    tex = _gram_buckets(
        target.select(
            F.monotonically_increasing_id().alias("_tid"),
            F.col(target_text_col or text_col).alias("_ttext"),
        ),
        "_ttext",
        "_tid",
        n_max,
        buckets,
        bucket_hash,
    )
    # Both models COLLECT to the driver — ≤ ``buckets`` rows each is this
    # operator's designed bounded driver state (10k–65k ints). Scoring
    # exploits Σ_b c_b·llr_b = Σ_gram llr[bucket(gram)]: summing the llr
    # PER GRAM OCCURRENCE needs no (doc, bucket) count table at all, so
    # the only corpus-sized exchange of the r13 formulation (the
    # ~grams-per-corpus (doc, bucket) shuffle, paid TWICE) disappears —
    # every aggregation here map-side combines to ≤buckets or ≤docs rows
    # before its exchange (measured 122 s → the r14 number in
    # scale_dedup.dsir_* at 1M docs).
    import math

    # r16 (guide §2.6): the two model fits are independent full passes —
    # submit both from driver threads so the raw-corpus pass back-fills
    # executors freed by the (usually smaller) target pass's tail instead
    # of waiting for it; same two jobs, overlapped wall-clock.
    #
    # Concurrency contract (r17, verdict #7): these threads run PLAIN
    # .collect() actions on plans built before the spawn — they never set
    # or read session SQL confs, so they cannot observe the lock-scoped
    # conf window of parallel.bounded_take (which is additionally
    # serialized under parallel._TAKE_LOCK). Any future driver-thread
    # work that touches session conf must take that lock.
    from concurrent.futures import ThreadPoolExecutor

    def _fit(frame):
        return {int(r["_b"]): int(r["_n"]) for r in _bucket_model(frame).collect()}

    with ThreadPoolExecutor(max_workers=2) as _pool:
        _ft, _fr = _pool.submit(_fit, tex), _pool.submit(_fit, ex)
        nt, nr = _ft.result(), _fr.result()
    tot_t, tot_r = sum(nt.values()), sum(nr.values())
    s = float(smoothing)
    dt, dr = float(tot_t) + s * buckets, float(tot_r) + s * buckets
    # nano-quantized llr (r15, ADVICE): floor(llr·1e9 + 0.5) as BIGINT.
    # The per-doc score becomes an EXACT integer sum — order-independent,
    # so Spark's partition-dependent aggregation order and DuckDB's
    # sequential one produce the identical value by construction (the r14
    # float sum relied on no doc landing within summation-ulp of a
    # round-6 boundary, and the sf0.01 fixture had one 5e-11 away). The
    # cross-engine float steps left in the DSIR family are this llr and
    # dsir_select's Gumbel term (quantized the same way in r16, ADVICE) —
    # both are pure per-value ln's, replayable, with floor-boundary
    # margins pinned in tests.
    llr_rows = [
        (
            b,
            int(
                math.floor(
                    (
                        math.log((nt.get(b, 0) + s) / dt)
                        - math.log((nr.get(b, 0) + s) / dr)
                    )
                    * 1e9
                    + 0.5
                )
            ),
        )
        for b in sorted(set(nt) | set(nr))
    ]
    spark = df.sparkSession
    from pq_vector_spark.parallel import local_plan_df

    llr_tbl = local_plan_df(spark, llr_rows, "_b: int, _llr: bigint")
    scored = (
        ex.join(F.broadcast(llr_tbl), "_b")
        .groupBy("_id")
        .agg(F.sum(F.col("_llr")).alias("_lw"))
    )
    if _attach_to is not None:
        # dsir_select's private fast path (r16): attach the nano sum to
        # the caller's frame with ONE left join instead of the public
        # contract's ids-frame join followed by the caller's own
        # df ⋈ weights join — same rows for unique ids (the family
        # assumption), one fewer corpus-keyed join at any scale.
        return _attach_to.join(
            scored.withColumnRenamed("_id", id_col), id_col, "left"
        ).withColumn(
            "log_weight", F.col("_lw").cast("double") / F.lit(1e9)
        ).drop("_lw")
    ids = df.select(F.col(id_col).alias("_id"))
    return (
        ids.join(scored, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            (F.col("_lw").cast("double") / F.lit(1e9)).alias("log_weight"),
        )
    )


def dsir_select(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target: DataFrame,
    k: int,
    target_text_col: Optional[str] = None,
    *,
    n_max: int = 2,
    buckets: int = 10_000,
    smoothing: float = 0.5,
    bucket_hash: str = "portable",
    gumbel: bool = True,
    salt: str = "dsir",
) -> DataFrame:
    """Top-``k`` DSIR selection: ``df``'s rows + ``log_weight`` (+
    ``gumbel_score`` when sampling), ranked by ``log_weight + Gumbel``
    (``gumbel=True``, the paper's importance RESAMPLING — softmax-
    proportional sampling without replacement via Gumbel-top-k) or by
    raw ``log_weight`` (hard top-k). The Gumbel draw is the engine's
    deterministic salted-hash uniform — ``-ln(-ln((h + 0.5)/1e6))`` — so
    the selection is reproducible across runs, partitionings, and
    engines (``hash_sample``'s portability contract applied to noise).

    ``gumbel_score`` is EXACT integer arithmetic in nano-units (r16,
    ADVICE): the Gumbel term is quantized ``floor(g · 1e9 + 0.5)`` and
    added to the weight's exact nano integer — recovered bit-for-bit via
    ``round(log_weight · 1e9)``; the nano sum stays far below 2^53, so
    the divide-then-recover round-trips exactly — then ONE division by
    1e9. The r15 form rounded the float difference ``log_weight −
    ln(−ln(u))`` to 6 decimals, leaving the hash-attested column exposed
    to the same round-boundary flip class the llr nano-quantization
    eliminated. Cross-engine float steps are now exactly two — the llr
    and the Gumbel ``ln`` pair — both quantized, with boundary margins
    pinned by tests (the Gumbel one over its entire 10^6-value domain).

    Ties break by id. Selection plans as a bounded top-k heap; for k in
    the hundreds of millions, rank once with
    :func:`dsir_importance_weights` and cut at a quantile threshold
    instead of a global heap."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    out = dsir_importance_weights(
        df, text_col, id_col, target, target_text_col,
        n_max=n_max, buckets=buckets, smoothing=smoothing,
        bucket_hash=bucket_hash, _attach_to=df,
    )
    if gumbel:
        u = (hash_bucket(id_col, salt).cast("double") + F.lit(0.5)) / F.lit(
            float(BUCKETS)
        )
        # exact nano-unit integer sum (r16, ADVICE): quantize the Gumbel
        # term like the llr table, recover the weight's exact nano
        # integer, add as bigints, divide ONCE — no float difference to
        # round, so no round-6 boundary for summation/libm ulp to flip.
        # round(log_weight·1e9) recovers the scoring sum's bigint exactly
        # (|lw_nano| ≪ 2^53 keeps the /1e9·1e9 round-trip error < 0.5);
        # the Gumbel quantization margin is ≥10 ulp over the ENTIRE
        # 10^6-value u domain (pinned in test_dsir).
        g_nano = F.floor(-F.log(-F.log(u)) * F.lit(1e9) + F.lit(0.5)).cast(
            "bigint"
        )
        lw_nano = F.round(F.col("log_weight") * F.lit(1e9)).cast("bigint")
        out = out.withColumn(
            "gumbel_score", (lw_nano + g_nano).cast("double") / F.lit(1e9)
        )
        order = [F.col("gumbel_score").desc_nulls_last(), F.col(id_col).asc()]
    else:
        order = [F.col("log_weight").desc_nulls_last(), F.col(id_col).asc()]
    return out.orderBy(*order).limit(k)
