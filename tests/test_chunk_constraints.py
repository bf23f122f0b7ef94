"""Chunking + constraint-check tests (operators/chunk.py,
operators/constraints.py)."""

import pytest
from pyspark.sql import functions as F

from pq_vector_spark.operators.chunk import chunk_documents
from pq_vector_spark.operators.constraints import check_constraints, check_unique


# ------------------------------------------------------------- chunking ----


def test_chunk_windows_and_overlap(spark):
    df = spark.createDataFrame([(1, "abcdefghij")], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, "text", "doc_id", chunk_chars=4, overlap=1).collect(),
        key=lambda r: r["chunk_id"],
    )
    # starts every 3 chars: 0,3,6,9; windows of 4
    assert [(r["chunk_start"], r["chunk_text"]) for r in rows] == [
        (0, "abcd"),
        (3, "defg"),
        (6, "ghij"),
        (9, "j"),
    ]
    assert [r["chunk_id"] for r in rows] == [0, 1, 2, 3]


def test_chunk_short_empty_null_docs(spark):
    df = spark.createDataFrame(
        [(1, "ab"), (2, ""), (3, None)], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in chunk_documents(df, "text", "doc_id").collect()}
    # every doc yields exactly one chunk — no silent row drops
    assert set(rows) == {1, 2, 3}
    assert rows[1]["chunk_text"] == "ab"
    assert rows[2]["chunk_text"] == ""
    assert rows[3]["chunk_text"] is None


def test_chunk_reconstruction(spark):
    """Zero-overlap chunks concatenate back to the original text."""
    text = "the quick brown fox jumps over the lazy dog" * 3
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, "text", "doc_id", chunk_chars=7, overlap=0).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert "".join(r["chunk_text"] for r in rows) == text


def test_chunk_guards(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="chunk_chars"):
        chunk_documents(df, "text", "doc_id", chunk_chars=0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, "text", "doc_id", chunk_chars=5, overlap=5)


def test_chunk_plan_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "hello world")], ["doc_id", "text"])
    plan = (
        chunk_documents(df, "text", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


# ----------------------------------------------------------- constraints ----


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (0, "good", "en"),
            (1, None, "en"),  # null text
            (2, "ok", "xx"),  # unknown lang
            (-3, "neg", "en"),  # negative id
        ],
        ["doc_id", "text", "lang"],
    )


def test_check_constraints_counts(docs):
    rules = {
        "text_not_null": F.col("text").isNotNull(),
        "lang_known": F.col("lang").isin("en", "de"),
        "id_nonneg": F.col("doc_id") >= 0,
    }
    out = {r["rule"]: r for r in check_constraints(docs, rules).collect()}
    assert out["text_not_null"]["violations"] == 1
    assert out["lang_known"]["violations"] == 1
    assert out["id_nonneg"]["violations"] == 1
    assert all(r["total"] == 4 for r in out.values())
    assert out["id_nonneg"]["pass_frac"] == 0.75


def test_null_rule_result_is_violation(spark):
    """NULL comparisons (SQL three-valued logic) count as violations —
    unknown is not a pass."""
    df = spark.createDataFrame([(1, None)], "id INT, v DOUBLE")
    out = check_constraints(df, {"v_positive": F.col("v") > 0}).collect()[0]
    assert out["violations"] == 1


def test_check_constraints_single_pass(docs):
    """All rules fold into ONE aggregate — no per-rule jobs, no Exchange of
    data rows (only the 1-row partial agg exchange)."""
    rules = {
        "a": F.col("doc_id") >= 0,
        "b": F.col("text").isNotNull(),
        "c": F.col("lang") == "en",
    }
    plan = (
        check_constraints(docs, rules)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("HashAggregate") <= 4  # partial+final, not per-rule


def test_check_constraints_empty_rules_rejected(docs):
    with pytest.raises(ValueError, match="rules"):
        check_constraints(docs, {})


def test_check_unique(spark):
    df = spark.createDataFrame([(1,), (2,), (2,), (3,), (3,), (3,)], ["k"])
    row = check_unique(df, ["k"]).collect()[0]
    assert (row["n_rows"], row["n_distinct"], row["duplicates"]) == (6, 3, 3)


# ---------------------------------------------------------------- drift ----


def test_bucketize_edges(spark):
    from pq_vector_spark.operators.drift import bucketize

    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (99.9,), (100.0,), (999.0,), (5000.0,)], ["x"]
    )
    got = [r["b"] for r in df.select(bucketize("x", 0, 1000, 10).alias("b")).collect()]
    # clamped below/above; exact edge goes to the next bucket
    assert got == [0, 0, 0, 1, 9, 9]


def test_psi_identical_distributions_is_zero(spark):
    from pq_vector_spark.operators.drift import psi

    df = spark.createDataFrame([(float(i % 100),) for i in range(1000)], ["x"])
    assert psi(df, df, "x", lo=0, hi=100, bins=10) == 0.0


def test_psi_detects_shift(spark):
    from pq_vector_spark.operators.drift import distribution_drift, psi

    a = spark.createDataFrame([(float(i % 100),) for i in range(1000)], ["x"])
    b = spark.createDataFrame([(float(i % 100) + 50,) for i in range(1000)], ["x"])
    val = psi(a, b, "x", lo=0, hi=100, bins=10)
    assert val > 0.2  # the standard "investigate" threshold
    # every bucket present in the drift table, missing mass eps-floored
    rows = distribution_drift(a, b, "x", lo=0, hi=100, bins=10).collect()
    assert sorted(r["bucket"] for r in rows) == list(range(10))
    assert all(r["share_a"] is not None and r["share_b"] is not None for r in rows)


def test_drift_guards(spark):
    from pq_vector_spark.operators.drift import bucketize

    import pytest as _pt

    with _pt.raises(ValueError, match="hi > lo"):
        bucketize("x", 10, 10, 5)


# ------------------------------------------------------- normalization ----


def test_quantile_normalize_goldens(spark):
    from pq_vector_spark.operators.normalize import quantile_normalize

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "a", 30), (4, "b", 5), (5, "b", 5)],
        ["doc_id", "src", "score"],
    )
    got = {
        r["doc_id"]: r["score_qn"]
        for r in quantile_normalize(df, "score", group_col="src").collect()
    }
    assert got[1] == 0.0 and got[2] == 0.5 and got[3] == 1.0
    # ties share a rank; both b rows are rank 1 of 2 → 0.0
    assert got[4] == 0.0 and got[5] == 0.0


def test_quantile_normalize_calibrates_across_scales(spark):
    """Two sources with disjoint score ranges map onto the same [0,1]
    scale — the cross-source threshold property."""
    from pq_vector_spark.operators.normalize import quantile_normalize

    rows = [(i, "small", i) for i in range(100)] + [
        (1000 + i, "big", 100000 + i) for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "src", "score"])
    out = quantile_normalize(df, "score", group_col="src")
    top = out.filter(F.col("score_qn") >= 0.9)
    by_src = {r["src"]: r["n"] for r in top.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert by_src["small"] == by_src["big"]  # same share survives per source


def test_profile_columns(spark):
    from pq_vector_spark.operators.constraints import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "c")], "id INT, name STRING"
    )
    out = {r["column"]: r for r in profile_columns(df, ["id", "name"]).collect()}
    rid = out["id"]
    assert (rid["n_rows"], rid["n_nulls"], rid["n_distinct"]) == (3, 0, 2)
    assert (rid["min_value"], rid["max_value"]) == ("1", "2")
    rn = out["name"]
    assert (rn["n_nulls"], rn["n_distinct"]) == (1, 2)
    assert (rn["min_value"], rn["max_value"]) == ("a", "c")
    with pytest.raises(ValueError, match="cols"):
        profile_columns(df, [])
