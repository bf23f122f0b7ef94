"""Model-based quality classification (linear, closed-form).

The model-based half of a web-curation stack: the rule filters
(``functions/text.py``: Gopher, C4) are the first pass, and a TRAINED
linear classifier over cheap text features is the second — the role
fastText models play in CCNet (Wenzek et al. 2020) and the quality
classifiers in GPT-3/PaLM/FineWeb-Edu data work. This engine's variant
is a diagonal-covariance Fisher LDA (equivalently Gaussian Naive Bayes
with pooled per-feature variance): the fit is CLOSED-FORM — one
aggregation computing per-class counts and per-feature (sum, sum-of-
squares) — so it is deterministic, needs no iterative optimizer, and an
external SQL engine can replay the entire fit + scoring bit-for-bit
(the same stance as ``operators/dsir.py``'s hashed-n-gram models).

Scale shape (100 TB):

- **Fit** is ONE map-side-combined aggregation over the labeled frame
  (13 aggregate columns, 2 output rows) — a single pass, no shuffle of
  anything but partial aggregates. Fit on the full corpus or any
  labeled sample; the driver holds only the 2-row summary.
- **Scoring** is pure whole-stage codegen: the trained weights become
  literals in a native expression (no UDF, no join, no shuffle), so the
  score costs the same as any other projected column at any scale.

Float discipline (the DuckDB-oracle contract): features are rounded to
6 decimals ENGINE-SIDE (collapsing last-ulp ``ln`` differences between
JVM and libm); fit sums are rounded to 6 engine-side; every derived
quantity (means, variances, weights, bias) is then pure IEEE-754 binary64
arithmetic from identical inputs — bit-identical between the Python
driver and a SQL replay — and the final score is rounded to 6
engine-side again.

Reference parity note: the reference engine (Rust, pq-vector) has no
classifier surface; this module is part of the training-data-pipeline
extension mandated by the build brief.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pq_vector_spark.functions.text import DEFAULT_STOPWORDS

# Fixed feature order — the fit, the scorer, and any SQL replay must all
# agree on it (weights are positional).
QUALITY_FEATURE_NAMES = [
    "log_tokens",      # ln(1 + token count): prose has body
    "avg_token_len",   # mean token length: gibberish skews long/short
    "stopword_ratio",  # function-word density: natural language marker
    "punct_ratio",     # non-alphanumeric density: markup/boilerplate
    "digit_ratio",     # digit density: tables/serial dumps
    "upper_ratio",     # uppercase density: shouting/headers
]


def _col(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def quality_features(col, stopwords: Optional[Sequence[str]] = None) -> Column:
    """The 6 classifier features as a struct of doubles, each rounded to
    6 decimals. NULL (whole struct) when the text is NULL or blank — a
    blank doc has no feature support and must not enter the fit.

    Every field is int/int or libm-on-int arithmetic an external SQL
    engine reproduces exactly; the let-binding via ``transform(array(...))``
    evaluates the token split once (the ``quality_score`` trick)."""
    c = _col(col)
    sw = list(stopwords or DEFAULT_STOPWORDS)

    def _feats(t: Column) -> Column:
        n = F.size(t).cast("bigint")
        n_chars = F.length(c).cast("bigint")
        tok_chars = F.length(F.array_join(t, "")).cast("bigint")
        sw_hits = F.size(F.filter(t, lambda x: x.isin(sw))).cast("bigint")
        punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", "")).cast("bigint")
        digit = F.length(F.regexp_replace(c, r"[^0-9]", "")).cast("bigint")
        upper = F.length(F.regexp_replace(c, r"[^A-Z]", "")).cast("bigint")
        return F.struct(
            F.round(F.log(F.lit(1.0) + n.cast("double")), 6).alias("log_tokens"),
            F.round(tok_chars.cast("double") / n.cast("double"), 6).alias(
                "avg_token_len"
            ),
            F.round(sw_hits.cast("double") / n.cast("double"), 6).alias(
                "stopword_ratio"
            ),
            F.round(punct.cast("double") / n_chars.cast("double"), 6).alias(
                "punct_ratio"
            ),
            F.round(digit.cast("double") / n_chars.cast("double"), 6).alias(
                "digit_ratio"
            ),
            F.round(upper.cast("double") / n_chars.cast("double"), 6).alias(
                "upper_ratio"
            ),
        )

    t = F.split(F.lower(F.trim(c)), r"\s+")
    gated = F.when(
        c.isNotNull() & (F.length(F.trim(c)) > 0),
        F.transform(F.array(t), _feats)[0],
    )
    return gated


def fit_lda_quality(
    df: DataFrame,
    text_col: str,
    label_col,
    *,
    stopwords: Optional[Sequence[str]] = None,
    var_floor: float = 1e-6,
) -> dict:
    """Fit the diagonal-LDA quality model: ``label_col`` (boolean-castable;
    True = high quality) supplies weak labels — e.g. a gold reference
    corpus unioned with random web text, the fastText recipe.

    ONE aggregation computes per-class ``n`` and per-feature
    ``round(sum(f), 6)`` / ``round(sum(f*f), 6)``; everything after is
    driver-side closed form::

        mu_ci  = s1_ci / n_c
        var_ci = s2_ci / n_c - mu_ci^2          (population variance)
        varp_i = (n1*var1_i + n0*var0_i) / (n1 + n0)   (pooled)
        w_i    = (mu1_i - mu0_i) / (varp_i + var_floor)
        b      = ln(n1/n0) - 0.5 * sum_i w_i * (mu1_i + mu0_i)

    Returns the model dict consumed by ``lda_quality_score`` /
    ``classify_quality``. Raises if either class is empty or any feature
    is entirely NULL."""
    y = _col(label_col).cast("boolean")
    # F.inline is the evaluation barrier: the feature struct becomes
    # GENERATOR OUTPUT ATTRIBUTES, so the 13 aggregates below read stored
    # values instead of Catalyst inlining the (expensive) feature tree
    # into every aggregate via CollapseProject/SimplifyExtractValueOps —
    # measured 6× the whole tree per row without it (155 s → 87 s at 1M
    # docs, one tree per row being ~84 µs of regex-heavy feature work). A gated-NULL struct inlines to a row of NULL fields (not a
    # dropped row), so the field-level filter below is equivalent to the
    # old struct-level one: log_tokens is non-NULL iff the gate passed.
    # (r16: a conditional pre-feature spread was applied here and then
    # REVERTED on risk review — the fit sums are rounded DOUBLE sums, so
    # their low bits depend on partition count/summation order; the
    # engine↔oracle attestation holds because the fixture scan's
    # partitioning is stable, and a spread keyed to defaultParallelism
    # would re-roll those bits with the host's core count. The ~0.3 s it
    # saved is not worth coupling a hash-attested fit to CPU count. The
    # int/bigint-sum operators (jaccard, DSIR, winnow) keep their
    # spreads — their results are order-independent by construction.)
    feats = df.select(
        y.alias("_y"),
        F.inline(F.array(quality_features(text_col, stopwords=stopwords))),
    ).filter(F.col("_y").isNotNull() & F.col("log_tokens").isNotNull())
    aggs = [F.count(F.lit(1)).alias("n")]
    for name in QUALITY_FEATURE_NAMES:
        aggs.append(F.round(F.sum(F.col(name)), 6).alias(f"s1_{name}"))
        aggs.append(
            F.round(F.sum(F.col(name) * F.col(name)), 6).alias(f"s2_{name}")
        )
    rows = {r["_y"]: r.asDict() for r in feats.groupBy("_y").agg(*aggs).collect()}
    if True not in rows or False not in rows:
        raise ValueError(
            "fit_lda_quality: both classes must be non-empty "
            f"(got labels {sorted(rows)})"
        )
    pos, neg = rows[True], rows[False]
    n1, n0 = int(pos["n"]), int(neg["n"])

    weights, mu1s, mu0s, varps = [], [], [], []
    for name in QUALITY_FEATURE_NAMES:
        if pos[f"s1_{name}"] is None or neg[f"s1_{name}"] is None:
            raise ValueError(f"fit_lda_quality: feature {name} is all-NULL")
        mu1 = pos[f"s1_{name}"] / n1
        mu0 = neg[f"s1_{name}"] / n0
        var1 = pos[f"s2_{name}"] / n1 - mu1 * mu1
        var0 = neg[f"s2_{name}"] / n0 - mu0 * mu0
        varp = (n1 * var1 + n0 * var0) / (n1 + n0)
        w = (mu1 - mu0) / (varp + var_floor)
        weights.append(w)
        mu1s.append(mu1)
        mu0s.append(mu0)
        varps.append(varp)
    b = math.log(n1 / n0)
    for i in range(len(QUALITY_FEATURE_NAMES)):
        b = b + (-0.5) * weights[i] * (mu1s[i] + mu0s[i])
    return {
        "feature_names": list(QUALITY_FEATURE_NAMES),
        "weights": weights,
        "bias": b,
        "n_pos": n1,
        "n_neg": n0,
        "means_pos": mu1s,
        "means_neg": mu0s,
        "pooled_var": varps,
        "var_floor": float(var_floor),
        "stopwords": list(stopwords or DEFAULT_STOPWORDS),
    }


def lda_quality_score(col, model: dict) -> Column:
    """Score = ``round(w · f + b, 6)`` with the trained weights as
    literals — pure codegen, left-to-right accumulation in the fixed
    feature order (the order a SQL replay must follow). NULL text →
    NULL score.

    The feature struct is LET-BOUND through a lambda variable (the
    ``quality_score`` trick): ``SimplifyExtractValueOps`` cannot rewrite
    a field access on a lambda variable back into the full feature tree,
    so one reference of this Column costs ONE feature evaluation, not
    six. (Each separate reference of the returned Column still pays one
    tree — ``classify_quality`` adds the inline barrier so even that
    happens once per row.)"""
    f = quality_features(col, stopwords=model.get("stopwords"))
    names = list(model["feature_names"])
    ws = [float(w) for w in model["weights"]]
    bias = float(model["bias"])

    def _score(s: Column) -> Column:
        acc = None
        for name, w in zip(names, ws):
            term = F.lit(w) * s[name]
            acc = term if acc is None else acc + term
        return acc + F.lit(bias)

    return F.round(F.transform(F.array(f), _score)[0], 6)


def classify_quality(
    df: DataFrame,
    text_col: str,
    model: dict,
    *,
    threshold: float = 0.0,
    score_col: str = "quality_lr_score",
    pred_col: str = "quality_lr_pred",
) -> DataFrame:
    """Attach the linear quality score and the boolean prediction
    (``score > threshold``). Filter ``pred_col`` downstream to keep the
    classifier-approved slice — zero shuffle at any scale.

    The score rides through an ``F.inline`` generator barrier so it is
    evaluated ONCE per row no matter how many downstream expressions
    reference it (the prediction, filters, projections): generator
    outputs are attributes Catalyst cannot re-inline. Without the
    barrier, every reference re-evaluated the full feature tree —
    measured ~11× per row through a score+pred+filter chain (930 s for
    1M docs; 84 s with it — one feature evaluation per row)."""
    if score_col in df.columns or pred_col in df.columns:
        raise ValueError(
            f"input columns collide with output names "
            f"({score_col!r}/{pred_col!r}); rename them first"
        )
    s = lda_quality_score(text_col, model)
    out = df.select("*", F.inline(F.array(F.struct(s.alias(score_col)))))
    sc = F.col(score_col)
    return out.withColumn(
        pred_col, F.when(sc.isNotNull(), sc > F.lit(float(threshold)))
    )
