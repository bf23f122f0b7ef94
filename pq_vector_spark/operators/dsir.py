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

Scale shape (100 TB): featurization is one explode + ONE (doc, bucket)
hash aggregation — the only corpus-sized shuffle, keyed by (id, int)
pairs, never gram text. Both n-gram models aggregate to ``buckets`` rows
(bounded — 10k–65k), so the log-likelihood-ratio table BROADCASTS to the
scoring join; the per-doc weight is then one more map-side-combined
aggregation. Selection is a bounded top-k heap (TakeOrderedAndProject).
The target corpus only ever contributes a ``buckets``-row model — it can
be any size and is never joined row-wise against the raw corpus.

Engine-replayable: bucketing is the portable md5 hash
(``functions/text.token_hash`` — DuckDB computes the identical value),
the models are int-count arithmetic, and the returned ``log_weight``
rounds to 6 decimals so a DuckDB oracle reproduces ranking and values
despite last-ulp ``ln``/summation differences between engines. The
Gumbel draw uses the engine's salted-hash-uniform (``hash_bucket``), so
even the sampled variant is a pure function of (id, salt).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pq_vector_spark.functions.text import _token_ngrams, token_hash
from pq_vector_spark.operators.sampling import BUCKETS, hash_bucket


def _doc_bucket_counts(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_max: int,
    buckets: int,
    bucket_hash: str = "portable",
) -> DataFrame:
    """(id, bucket, cnt): hashed word n-gram counts per document —
    explode n = 1..n_max grams, hash-bucket each, ONE map-side-combined
    aggregation. Gram text never reaches the exchange (int keys only)."""
    grams = _token_ngrams(text_col, 1)
    for n in range(2, n_max + 1):
        grams = F.concat(grams, _token_ngrams(text_col, n))
    if bucket_hash == "portable":
        h = token_hash(F.col("_g"))
    else:
        h = F.xxhash64(F.col("_g"))
    ex = (
        df.select(F.col(id_col).alias("_id"), F.explode(grams).alias("_g"))
        # a whitespace-only document tokenizes to [""] — that is "no
        # features", not a feature (mirrors gopher/quality word filters)
        .filter(F.col("_g") != "")
        .select("_id", F.pmod(h, F.lit(buckets)).alias("_b"))
    )
    return ex.groupBy("_id", "_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )


def _bucket_model(feat: DataFrame) -> DataFrame:
    """(bucket, cnt): corpus-level hashed-ngram counts — ``buckets`` rows,
    bounded at any corpus size."""
    return feat.groupBy("_b").agg(F.sum("_c").cast("bigint").alias("_n"))


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
    _caches: Optional[list] = None,
) -> DataFrame:
    """Per-document DSIR log importance weight vs ``target``: returns
    (``id_col``, ``log_weight``) with ``log_weight`` rounded to 6
    decimals. A document with no tokens has no features and scores NULL
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

    Pass ``_caches`` (the engine's unpersist-after-action contract: a
    list the CALLER unpersists after its action) to persist the raw
    corpus's featurized frame across its two consumers — the raw-model
    fit and the scoring join. Featurization dominates the operator's
    cost at corpus scale, so this roughly halves it; without ``_caches``
    the corpus is featurized twice and nothing survives the action.
    """
    if n_max < 1:
        raise ValueError(f"n_max must be >= 1, got {n_max}")
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    if bucket_hash not in ("portable", "fast"):
        raise ValueError(f"bucket_hash must be portable|fast, got {bucket_hash!r}")
    feat = _doc_bucket_counts(df, text_col, id_col, n_max, buckets, bucket_hash)
    # Persist ONLY under the _caches contract (same trade as
    # operators/dedup.py): feat has exactly two consumers — the raw-model
    # collect below (which materializes the cache) and the scoring join —
    # and featurization is the dominant cost, so the persist halves the
    # operator; an unconditional persist would leak a corpus-sized frame
    # for callers that never unpersist.
    if _caches is not None:
        from pyspark import StorageLevel

        feat = feat.persist(StorageLevel.MEMORY_AND_DISK)
        _caches.append(feat)
    # the target model only needs bucket TOTALS — synthesize a row id so
    # the shared featurizer applies, it aggregates away immediately
    tfeat = _doc_bucket_counts(
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
    # operator's designed bounded driver state (10k–65k ints), and
    # building the llr table as a literal frame means the raw corpus is
    # featurized at most TWICE (model fit + scoring; ONCE under _caches)
    # instead of the 3–4 lazy re-evaluations the all-lazy formulation
    # paid (one per action that referenced the model subtree — measured
    # at ~2× the operator's wall time at sf0.1).
    import math

    nt = {int(r["_b"]): int(r["_n"]) for r in _bucket_model(tfeat).collect()}
    nr = {int(r["_b"]): int(r["_n"]) for r in _bucket_model(feat).collect()}
    tot_t, tot_r = sum(nt.values()), sum(nr.values())
    s = float(smoothing)
    dt, dr = float(tot_t) + s * buckets, float(tot_r) + s * buckets
    llr_rows = [
        (b, math.log((nt.get(b, 0) + s) / dt) - math.log((nr.get(b, 0) + s) / dr))
        for b in sorted(set(nt) | set(nr))
    ]
    spark = df.sparkSession
    llr_tbl = spark.createDataFrame(llr_rows, "_b: int, _llr: double")
    scored = (
        feat.join(F.broadcast(llr_tbl), "_b")
        .groupBy("_id")
        .agg(F.sum(F.col("_c").cast("double") * F.col("_llr")).alias("_lw"))
    )
    ids = df.select(F.col(id_col).alias("_id"))
    return (
        ids.join(scored, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.round(F.col("_lw"), 6).alias("log_weight"),
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
    _caches: Optional[list] = None,
) -> DataFrame:
    """Top-``k`` DSIR selection: ``df``'s rows + ``log_weight`` (+
    ``gumbel_score`` when sampling), ranked by ``log_weight + Gumbel``
    (``gumbel=True``, the paper's importance RESAMPLING — softmax-
    proportional sampling without replacement via Gumbel-top-k) or by
    raw ``log_weight`` (hard top-k). The Gumbel draw is the engine's
    deterministic salted-hash uniform — ``-ln(-ln((h + 0.5)/1e6))`` — so
    the selection is reproducible across runs, partitionings, and
    engines (``hash_sample``'s portability contract applied to noise).
    Ties break by id. Selection plans as a bounded top-k heap; for k in
    the hundreds of millions, rank once with
    :func:`dsir_importance_weights` and cut at a quantile threshold
    instead of a global heap. ``_caches`` passes through to the weight
    computation (persist-the-featurized-frame contract — see
    :func:`dsir_importance_weights`)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = dsir_importance_weights(
        df, text_col, id_col, target, target_text_col,
        n_max=n_max, buckets=buckets, smoothing=smoothing,
        bucket_hash=bucket_hash, _caches=_caches,
    )
    out = df.join(w, id_col)
    if gumbel:
        u = (hash_bucket(id_col, salt).cast("double") + F.lit(0.5)) / F.lit(
            float(BUCKETS)
        )
        out = out.withColumn(
            "gumbel_score",
            F.round(F.col("log_weight") - F.log(-F.log(u)), 6),
        )
        order = [F.col("gumbel_score").desc_nulls_last(), F.col(id_col).asc()]
    else:
        order = [F.col("log_weight").desc_nulls_last(), F.col(id_col).asc()]
    return out.orderBy(*order).limit(k)
