"""Bloom-filter decontamination — the beyond-broadcast scale path.

``operators/decontaminate.py`` broadcast-joins the eval set's distinct
gram-hash table into the corpus scan. That is the right plan while the
eval side is benchmark-sized (10^3..10^6 grams). Modern decontamination
lists grow far past that — full eval-suite unions, canary strings,
memorization probes: 10^8+ distinct grams — and a hash-JOIN table of
that many 8-byte keys costs GBs per executor. A Bloom filter holds the
same membership at ~14.4 bits ≈ 1.8 BYTES/gram (fpp 1e-3): the
10^8-gram list is a ~180 MB closure instead of a multi-GB join build.
MEASURED at exactly 10^8 grams (r15 bench, scale_bloom_huge): the
filter is 239.6 MB at fpp 1e-4 and probes a 1M-doc corpus in ~119 s
with zero wrongful drops, while the exact broadcast path dies at the
build-side collect (serialized keys alone exceed Spark's default 1 GiB
driver result cap) before any hash table is built.

Semantics are CONSERVATIVE by construction: Bloom false positives can
only OVER-count a document's eval-gram hits, never under-count, so a
document ``decontaminate`` flags is ALWAYS flagged here too — for BOTH
of its rules. The ``min_grams`` rule maps directly (hits ≥ shared
grams). The ``overlap_frac >= threshold`` rule has no per-eval-doc
analogue inside a merged filter, so it is over-approximated through the
SMALLEST eval document: ``decontaminate`` can only threshold-flag a
corpus doc that shares ≥ ceil(threshold·E) grams with some eval doc of
E grams, and E ≥ min_eval_grams (recorded at build time), so dropping
at ``hits ≥ ceil(threshold·min_eval_grams)`` is a strict superset of
the exact rule. A clean document is wrongly dropped only when enough of
its distinct grams all false-positive (probability ≤
C(G, t)·fpp^t, negligible at default settings) or when the
smallest-eval-doc bound fires for a larger eval doc. The trade is
explicitly one-sided, which is what you want for decontamination
(recall over precision).

Determinism: gram hashing is the engine's portable md5-derived
``token_hash`` by default (``gram_hash="fast"`` swaps in JVM xxhash64
for the at-scale probe — the hash family is recorded in the model and
enforced at probe time); bit positions use double hashing
h_i = (h1 + i·h2) mod m with h1 = g mod m, h2 = ((g >> 17) | 1) mod m
(h2 odd, m a multiple of 32 ⇒ h2 ≠ 0) — no RNG anywhere, so the same
(eval set, fpp) always builds the identical filter on any cluster.

Scale shape:
- **Build**: one map-side gram pass over the EVAL side, per-batch sparse
  (word, bits) contributions from a vectorized Arrow kernel, ONE
  ``groupBy(word).bit_or`` shuffle of int pairs, and the driver collects
  at most m/32 words — the filter's own size, which the driver must hold
  anyway to broadcast it.
- **Probe**: pure map over the corpus — distinct grams per doc (native
  shingles), one vectorized pandas UDF testing k bits per gram against
  the broadcast word array, keep docs with hits < ``min_grams``. The
  corpus never shuffles and never joins.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pq_vector_spark.functions.text import gram_hash_fn
from pq_vector_spark.operators.dedup import shingles

_WORD = 32  # bits per bloom word (int32-safe shifts on every engine)


def _bloom_geometry(n_items: int, fpp: float) -> tuple[int, int]:
    """Standard optimal sizing: m = -n ln p / (ln 2)^2 bits (rounded up to
    whole 32-bit words), k = (m/n) ln 2 hash functions (clamped 1..16)."""
    if n_items <= 0:
        raise ValueError(f"n_items must be positive, got {n_items}")
    if not (0.0 < fpp < 1.0):
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m = int(math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2)))
    m = max(((m + _WORD - 1) // _WORD) * _WORD, 2 * _WORD)
    k = max(1, min(16, round(m / n_items * math.log(2))))
    return m, k


def _positions(g: np.ndarray, m: int, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(word index, bit mask) arrays, k entries per gram — vectorized
    double hashing over uint64 gram hashes."""
    g = g.astype(np.uint64)
    h1 = g % np.uint64(m)
    h2 = ((g >> np.uint64(17)) | np.uint64(1)) % np.uint64(m)
    i = np.arange(k, dtype=np.uint64)
    pos = (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)
    word = (pos // np.uint64(_WORD)).astype(np.int64)
    bit = (pos % np.uint64(_WORD)).astype(np.int64)
    return word, np.left_shift(np.int64(1), bit)




def build_gram_bloom(
    eval_df: DataFrame,
    text_col: str = "text",
    *,
    n: int = 5,
    fpp: float = 1e-3,
    n_grams: Optional[int] = None,
    sizing: str = "exact",
    gram_hash: str = "portable",
    _caches: Optional[list] = None,
) -> dict:
    """Build the eval-set gram Bloom filter. ``n_grams`` (the sizing count)
    defaults to one count job over the distinct gram hashes; pass it when
    the cardinality is already known to skip that pass. Returns the model
    dict consumed by :func:`decontaminate_bloom` — ``bits`` is a
    ``uint32`` word array small enough to ride a task closure (~14.4 bits
    ≈ 1.8 bytes/gram at the default fpp; ~180 MB for a 10^8-gram list).

    ``sizing`` (r16, ordered by the r15 verdict): ``"exact"`` (default —
    the attested family) counts the distinct grams with one exact count
    job; ``"approx"`` folds sizing INTO the min-eval aggregation —
    ``approx_count_distinct`` (rsd 2%) over the exploded grams in the
    same job that takes the per-doc minimum, then inflates the estimate
    by a 5% safety factor (≥2σ at rsd 2%, so the realized fpp can only
    land BELOW target by a hair, never meaningfully above). That removes
    one of the three full shingle+hash passes outright — the exact
    distinct-count job the r15 verdict named as the 10^8-build lever —
    without the documented 10^8 cache-instability trade. An explicit
    ``n_grams`` wins over either mode (zero sizing jobs). The filter
    GEOMETRY differs from exact sizing (m derives from the inflated
    estimate), so bit-level attestation stays on the exact family.

    ``gram_hash``: ``"portable"`` (default) hashes grams with the
    md5-based ``token_hash`` an external engine replays bit-for-bit —
    the oracle family; ``"fast"`` hashes with JVM ``xxhash64`` (the md5
    is most of the probe's per-gram cost at corpus scale — the same
    trade as DSIR's ``bucket_hash``). The choice is RECORDED in the
    model and the probe enforces it, so a filter built with one family
    can never be probed with the other. xxhash64 is signed — the
    position math reinterprets it as uint64, identically on build and
    probe, so determinism is unaffected.

    The model also records ``min_eval_grams`` — the distinct-gram count of
    the SMALLEST eval document with ≥1 gram — which
    :func:`decontaminate_bloom` uses to over-approximate the exact
    operator's ``overlap_frac`` rule (one extra eval-bounded agg job).

    ``_caches`` (optional list — the repo's caller-released persist
    contract): the build runs THREE jobs over the eval side (min-eval
    agg, sizing count, sparse word build), and without a cache each one
    re-shingles and re-hashes every gram — at 10^8 grams that is two
    redundant full md5 passes plus a re-shuffled distinct, the dominant
    share of the r15-measured 1134 s build. With ``_caches`` the hashed
    per-doc gram arrays and the distinct gram set are persisted
    DISK_ONLY (the saving is md5 CPU, not I/O; a memory-level copy
    measurably OOM'd an 8 GB heap at 10^8 grams) and appended for the
    caller to unpersist after the model is built. Measured at 10^7
    grams: 40.4 → 20.0 s, bits identical. At 10^8 on a SINGLE 8 GB-heap
    box even the disk-level cache destabilized the word build — use the
    uncached 3-pass shape there unless executors have real headroom.
    Benchmark-sized eval sets don't need it."""
    if sizing not in ("exact", "approx"):
        raise ValueError(
            f"sizing must be 'exact' or 'approx', got {sizing!r}"
        )
    sizing_used = "explicit" if n_grams is not None else sizing
    hf = gram_hash_fn(gram_hash)
    # the gram array rides the module's inline-generator barrier: as a
    # plain projection Catalyst collapses it into every consumer and the
    # shingle+hash expression re-evaluates per element (measured 43 s vs
    # 0.9 s for the distinct-gram pass over a 1k-doc eval slice of the 1M
    # bench fixture); generator outputs are attributes it cannot re-inline
    per_doc = eval_df.select(shingles(text_col, n).alias("_sh")).select(
        F.inline(
            F.array(
                F.struct(
                    F.array_distinct(
                        F.transform("_sh", lambda s: hf(s))
                    ).alias("_gs")
                )
            )
        )
    )
    if _caches is not None:
        from pyspark.storagelevel import StorageLevel

        # DISK_ONLY, deliberately: the saving is md5 CPU, not I/O, and at
        # 10^8 grams a MEMORY_AND_DISK copy of the gram arrays competed
        # with execution memory and OOM'd an 8 GB heap (measured r15);
        # local-disk reads of ~1 GB are noise next to two full re-hash
        # passes.
        per_doc = per_doc.persist(StorageLevel.DISK_ONLY)
        _caches.append(per_doc)
    if n_grams is None and sizing == "approx":
        # ONE job yields both planning numbers: explode drops zero-gram
        # docs (so the >= 1 filter is implicit) and the min over the
        # per-gram-repeated _ng equals the per-doc minimum; the HLL
        # sketch aggregates map-side — no distinct exchange, and the
        # separate exact sizing pass (a second full shingle+hash scan
        # when uncached) disappears entirely.
        row = (
            per_doc.select(
                F.size("_gs").alias("_ng"), F.explode("_gs").alias("_g")
            )
            .agg(
                F.min("_ng").alias("mn"),
                F.approx_count_distinct("_g", 0.02).alias("cnt"),
            )
            .collect()[0]
        )
        min_eval = row["mn"]
        # 5% inflation ≈ 2.5σ at rsd 2%: geometry can only end a hair
        # LARGER than exact sizing would pick — realized fpp ≤ target
        n_grams = max(int(math.ceil(int(row["cnt"]) * 1.05)), 1)
    else:
        min_eval = (
            per_doc.select(F.size("_gs").alias("_ng"))
            .filter(F.col("_ng") >= 1)
            .agg(F.min("_ng").alias("mn"))
            .collect()[0]["mn"]
        )
    grams = per_doc.select(F.explode("_gs").alias("_g")).distinct()
    if _caches is not None:
        from pyspark.storagelevel import StorageLevel

        grams = grams.persist(StorageLevel.DISK_ONLY)
        _caches.append(grams)
    if n_grams is None:
        n_grams = grams.count()
    m, k = _bloom_geometry(max(int(n_grams), 1), fpp)
    n_words = m // _WORD

    def _emit(batches):
        for pdf in batches:
            g = pdf["_g"].to_numpy(dtype=np.int64)
            if len(g) == 0:
                continue
            word, mask = _positions(g, m, k)
            arr = np.zeros(n_words, dtype=np.int64)
            np.bitwise_or.at(arr, word.ravel(), mask.ravel())
            nz = np.nonzero(arr)[0]
            yield pd.DataFrame({"w": nz, "b": arr[nz]})

    # Arrow toPandas, not collect(): at 10^7+ grams the word table is
    # millions of rows and a Python Row loop dominates the build; the
    # vectorized assignment is the same driver-bounded state (the filter
    # itself) minus the per-row object churn.
    sparse = (
        grams.mapInPandas(_emit, "w long, b long")
        .groupBy("w")
        .agg(F.bit_or("b").alias("b"))
        .toPandas()
    )
    bits = np.zeros(n_words, dtype=np.int64)
    if len(sparse):
        bits[sparse["w"].to_numpy(dtype=np.int64)] = sparse["b"].to_numpy(
            dtype=np.int64
        )
    return {
        "bits": bits.astype(np.uint32),
        "m": m,
        "k": k,
        "n": int(n),
        "fpp": float(fpp),
        "n_grams": int(n_grams),
        # None ⇔ the eval set has no doc with a single gram (degenerate)
        "min_eval_grams": int(min_eval) if min_eval is not None else None,
        "gram_hash": gram_hash,
        # provenance of the sizing count: "exact" | "approx" | "explicit"
        "sizing": sizing_used,
    }


def bloom_gram_hits(
    corpus: DataFrame,
    bloom: dict,
    text_col: str = "text",
    hits_col: str = "bloom_hits",
) -> DataFrame:
    """``corpus`` + ``hits_col``: per-document count of distinct grams
    whose k Bloom bits are ALL set (over-approximates the true eval-gram
    hit count, never under). Docs too short for a single gram count 0.

    The gram array is materialized as its own (native) projection before
    the Arrow kernel sees it — Spark cannot evaluate a pandas UDF whose
    argument embeds higher-order-function lambdas directly."""
    for reserved in ("_bloom_grams", hits_col):
        if reserved in corpus.columns:
            raise ValueError(
                f"input column collides with helper column {reserved!r}; "
                "rename it before calling bloom_gram_hits"
            )
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(np.ascontiguousarray(bloom["bits"]))
    m, k = int(bloom["m"]), int(bloom["k"])

    @F.pandas_udf("bigint")
    def _hits(grams: pd.Series) -> pd.Series:
        bits = bc.value.astype(np.int64)
        arrs = grams.to_numpy()
        lens = np.fromiter(
            (len(a) if a is not None else 0 for a in arrs), dtype=np.int64
        )
        out = np.zeros(len(arrs), dtype=np.int64)
        total = int(lens.sum())
        if total:
            flat = np.concatenate(
                [np.asarray(a, dtype=np.int64) for a in arrs if a is not None and len(a)]
            )
            word, mask = _positions(flat, m, k)
            hit = ((bits[word] & mask) == mask).all(axis=1)
            bounds = np.cumsum(lens)[:-1]
            out = np.add.reduceat(
                np.concatenate([hit.astype(np.int64), [0]]),
                np.concatenate([[0], bounds]),
            )[: len(arrs)]
            out = np.where(lens == 0, 0, out)
        return pd.Series(out)

    hf = gram_hash_fn(bloom.get("gram_hash", "portable"))
    gram_arr = F.transform(shingles(text_col, int(bloom["n"])), lambda s: hf(s))
    # inline-generator barrier (the classifier.py trick): a plain
    # withColumn collapses back into the UDF argument and Spark refuses
    # to evaluate a pandas UDF over an embedded lambda expression —
    # generator outputs are attributes Catalyst cannot re-inline
    grams_attr = corpus.select(
        "*", F.inline(F.array(F.struct(gram_arr.alias("_bloom_grams"))))
    )
    return grams_attr.withColumn(hits_col, _hits(F.col("_bloom_grams"))).drop(
        "_bloom_grams"
    )


def _wrongful_drop_risk(cut: int, fpp: float, n_doc_grams: int = 1000) -> float:
    """Probability a CLEAN document with ``n_doc_grams`` distinct grams is
    wrongly dropped at hit cut ``cut``: P[Binomial(G, fpp) ≥ cut], each
    gram false-positiving independently at ~``fpp``. Computed as the exact
    complementary CDF (G ≤ a few thousand keeps this trivial); G defaults
    to 1000 — a round mid-size document, the scale the docstring's 63%-at-
    cut-1 example uses — so the number is a comparable severity statistic,
    not a per-document guarantee."""
    if cut > n_doc_grams:
        return 0.0
    q = 1.0 - fpp
    # P[X >= cut] = 1 - sum_{i<cut} C(G,i) p^i q^(G-i), summed in log space
    # is unnecessary: fpp ≤ 1e-3 and cut ≤ 16 keep every term finite
    acc = 0.0
    term = q ** n_doc_grams  # i = 0
    acc += term
    for i in range(1, cut):
        term *= (n_doc_grams - i + 1) / i * (fpp / q)
        acc += term
    return max(0.0, min(1.0, 1.0 - acc))


def decontaminate_bloom(
    corpus: DataFrame,
    bloom: dict,
    text_col: str = "text",
    *,
    min_grams: int = 8,
    threshold: Optional[float] = 0.5,
    hits_col: Optional[str] = None,
    allow_risky_cut: bool = False,
    _stats: Optional[dict] = None,
) -> DataFrame:
    """Drop corpus docs flagged by the Bloom analogue of BOTH
    :func:`~pq_vector_spark.operators.decontaminate.decontaminate` rules:

    - ``min_grams``: drop at ≥ ``min_grams`` Bloom gram hits (direct
      analogue — false positives only ADD hits).
    - ``threshold``: the exact operator also drops any doc whose shared
      grams cover ≥ ``threshold`` of SOME eval doc's grams. A merged
      filter cannot attribute hits to one eval doc, so this is
      over-approximated via the smallest eval document: the exact rule
      can only fire at ≥ ceil(threshold · min_eval_grams) shared grams,
      so we drop at that many hits. ``threshold > 1`` disables the rule
      (overlap_frac ≤ 1, so the exact rule can never fire — applying a
      cut there would over-drop docs the exact operator keeps). Pass
      ``threshold=None`` to disable explicitly.

      **Short-eval-doc caveat**: a tiny eval doc makes the derived cut
      tiny, and at a small cut Bloom false positives stop being
      negligible — the wrongful-drop probability of a clean G-gram doc
      is P[Binomial(G, fpp) ≥ cut], which at cut=1 and fpp=1e-3 wipes
      out ~63% of clean 1000-gram docs. Whenever the threshold rule
      actually LOWERS the cut below ``min_grams`` (only then — a small
      ``min_grams`` is the caller's own explicit choice and never
      warned about), the risk is computed at the model's recorded
      ``fpp`` for a nominal 1000-gram document and acted on by
      severity: risk > 1% RAISES (the configuration silently destroys
      a visible fraction of the clean corpus — rebuild with a smaller
      ``fpp``, drop the short eval doc, pass ``threshold=None``, or
      opt in explicitly with ``allow_risky_cut=True``); risk > 1e-6
      logs a WARNING carrying the computed number; below that the
      derived cut is as safe as the filter itself and nothing fires.

    Superset guarantee: with both rules active (the defaults, matching
    ``decontaminate``'s defaults), everything the exact operator drops is
    dropped here too. The reverse differs by Bloom false positives plus
    the smallest-eval-doc coarsening — both one-sided toward dropping
    more, never letting contamination escape. Pass ``hits_col`` to keep
    the hit count on the survivors (audit/threshold-tuning).

    .. versionchanged:: r14
       ``threshold`` defaults to 0.5 (previously the rule was off): the
       default now mirrors ``decontaminate``'s and restores the
       documented strict-superset guarantee for BOTH exact rules. An
       r13 caller upgrading with default arguments drops MORE docs —
       exactly the docs the exact operator's coverage rule flags.
    .. versionchanged:: r15
       the small-cut warning fires only when ``threshold`` is the
       binding rule, scales with the computed wrongful-drop risk, and
       becomes a hard error above 1% risk unless ``allow_risky_cut``.
    .. versionchanged:: r16
       optional ``_stats`` dict records the planning numbers —
       ``hit_cut`` (the final cut), ``threshold_bound`` (whether the
       threshold rule lowered it), and ``wrongful_drop_risk``
       (:func:`_wrongful_drop_risk` at the final cut and the model's
       fpp, the same number the >1% gate raises on) — so pipelines can
       budget wrongful-drop rates instead of parsing logs."""
    if min_grams < 1:
        raise ValueError(f"min_grams must be >= 1, got {min_grams}")
    cut = int(min_grams)
    threshold_bound = False
    if threshold is not None:
        if not (0.0 < threshold):
            raise ValueError(f"threshold must be positive, got {threshold}")
        mn = bloom.get("min_eval_grams")
        if mn is None:
            raise ValueError(
                "threshold rule requires min_eval_grams in the bloom model "
                "(rebuild with this version's build_gram_bloom), and an "
                "eval set with at least one gram-bearing document; pass "
                "threshold=None for pure min_grams semantics"
            )
        if threshold <= 1.0:
            # smallest integer hit count the exact rule could fire at;
            # the -1e-9 guards float round-up past an exactly-integral
            # product (conservative = never a LARGER cut than exact
            # needs). threshold > 1 means overlap_frac can never reach
            # it — the exact rule is inert, so no cut applies.
            derived = max(1, math.ceil(float(threshold) * int(mn) - 1e-9))
            # r15 (ADVICE): act only when the threshold rule BINDS —
            # derived < min_grams. A final cut equal to the caller's own
            # min_grams is their explicit choice, and warning about it
            # misattributes the cut to the threshold (the r14 driver
            # entry logged exactly that on every attestation run).
            if derived < cut:
                cut = derived
                threshold_bound = True
                risk = _wrongful_drop_risk(
                    cut, float(bloom.get("fpp", 1e-3))
                )
                if risk > 0.01 and not allow_risky_cut:
                    raise ValueError(
                        f"decontaminate_bloom: threshold={threshold} with "
                        f"min_eval_grams={int(mn)} derives a hit cut of "
                        f"{cut}, and at the model's fpp="
                        f"{bloom.get('fpp')} that wrongly drops ≈"
                        f"{risk:.1%} of clean 1000-gram docs. Rebuild "
                        "with a smaller fpp, drop the short eval doc, "
                        "pass threshold=None, or opt in with "
                        "allow_risky_cut=True."
                    )
                if risk > 1e-6:
                    import logging

                    logging.getLogger(
                        "pq_vector_spark.operators.bloom"
                    ).warning(
                        "decontaminate_bloom: threshold=%s with "
                        "min_eval_grams=%d lowers the hit cut to %d "
                        "(below min_grams=%d) — wrongful-drop prob ≈ "
                        "%.2e per clean 1000-gram doc at the model's "
                        "fpp=%s. Rebuild with a smaller fpp, drop the "
                        "short eval doc, or pass threshold=None.",
                        threshold,
                        int(mn),
                        cut,
                        int(min_grams),
                        risk,
                        bloom.get("fpp"),
                    )
    if _stats is not None:
        # when the threshold bound the cut this recomputation returns
        # EXACTLY the risk the >1%/1e-6 gates acted on (same cut, same
        # fpp, same nominal 1000-gram doc); when it didn't, it is the
        # risk of the caller's own min_grams cut — either way the number
        # a pipeline budgets against, machine-readable instead of logged
        _stats.update(
            hit_cut=int(cut),
            threshold_bound=threshold_bound,
            wrongful_drop_risk=_wrongful_drop_risk(
                int(cut), float(bloom.get("fpp", 1e-3))
            ),
        )
    keep = hits_col is not None
    hc = hits_col or "_bloom_hits"
    if hc in corpus.columns:
        raise ValueError(f"input column collides with hits column {hc!r}")
    out = bloom_gram_hits(corpus, bloom, text_col, hc).filter(
        F.col(hc) < F.lit(cut)
    )
    return out if keep else out.drop(hc)
