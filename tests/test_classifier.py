"""Diagonal-LDA quality classifier (operators/classifier.py)."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pq_vector_spark.operators.classifier import (
    QUALITY_FEATURE_NAMES,
    classify_quality,
    fit_lda_quality,
    lda_quality_score,
    quality_features,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # "good" prose: stopword-rich, moderate tokens
        Row(i=1, text="the cat sat on the mat and it is that good for all", y=True),
        Row(i=2, text="a day in the life of a cat that is happy for it", y=True),
        Row(i=3, text="it is the best of times and it is the worst of times", y=True),
        # "bad": no stopwords, noisy
        Row(i=4, text="zzz qqq 12345 !!!! #### xxxx yyyy", y=False),
        Row(i=5, text="BUY NOW CLICK HERE 100% FREE $$$", y=False),
        Row(i=6, text="lorem dolor amet 777 888 999 !!", y=False),
        # degenerate rows: excluded from fit, NULL score
        Row(i=7, text=None, y=True),
        Row(i=8, text="   ", y=False),
    ]
    return spark.createDataFrame(rows)


def test_features_null_gate(spark, docs):
    out = docs.select("i", quality_features("text").alias("f")).collect()
    by_i = {r["i"]: r["f"] for r in out}
    assert by_i[7] is None and by_i[8] is None
    f1 = by_i[1].asDict()
    assert set(f1) == set(QUALITY_FEATURE_NAMES)
    # 13 tokens -> ln(14)
    assert f1["log_tokens"] == round(math.log(14.0), 6)
    assert 0 < f1["stopword_ratio"] <= 1
    # uppercase-heavy spam row
    assert by_i[5].asDict()["upper_ratio"] > 0.5


def test_fit_and_separation(spark, docs):
    model = fit_lda_quality(docs, "text", "y")
    assert model["n_pos"] == 3 and model["n_neg"] == 3
    assert len(model["weights"]) == len(QUALITY_FEATURE_NAMES)
    # stopword density must push positive
    assert model["weights"][QUALITY_FEATURE_NAMES.index("stopword_ratio")] > 0
    scored = classify_quality(docs, "text", model).collect()
    by_i = {r["i"]: r for r in scored}
    # perfect separation on this toy set
    for i in (1, 2, 3):
        assert by_i[i]["quality_lr_pred"] is True
    for i in (4, 5, 6):
        assert by_i[i]["quality_lr_pred"] is False
    assert by_i[7]["quality_lr_score"] is None
    assert by_i[7]["quality_lr_pred"] is None


def test_score_is_linear_in_features(spark, docs):
    """score == round(w . f + b, 6) recomputed row-side in Python."""
    model = fit_lda_quality(docs, "text", "y")
    rows = docs.select(
        "i",
        quality_features("text").alias("f"),
        lda_quality_score("text", model).alias("s"),
    ).collect()
    for r in rows:
        if r["f"] is None:
            assert r["s"] is None
            continue
        f = r["f"].asDict()
        acc = 0.0
        for name, w in zip(model["feature_names"], model["weights"]):
            acc += w * f[name]
        acc += model["bias"]
        assert r["s"] == pytest.approx(acc, abs=1e-6)


def test_single_class_raises(spark, docs):
    with pytest.raises(ValueError, match="both classes"):
        fit_lda_quality(docs.filter(F.col("y")), "text", "y")


def test_zero_variance_feature_is_harmless(spark):
    """Constant features get var_floor-bounded (not inf/NaN) weights."""
    rows = [
        Row(i=k, text="the and of is it plain text", y=True) for k in range(3)
    ] + [Row(i=k + 10, text="qqq zzz xxx", y=False) for k in range(3)]
    df = spark.createDataFrame(rows)
    model = fit_lda_quality(df, "text", "y")
    assert all(math.isfinite(w) for w in model["weights"])
    assert math.isfinite(model["bias"])


def test_scoring_plan_is_shuffle_free(spark, docs):
    """Scoring is a pure projection: no Exchange, no Python UDF — the
    literal-weight linear expression stays in whole-stage codegen."""
    model = fit_lda_quality(docs, "text", "y")
    plan = (
        classify_quality(docs, "text", model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
