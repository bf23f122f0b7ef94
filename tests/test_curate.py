"""Curation-pipeline composition tests."""

from pyspark.sql import functions as F

from pq_vector_spark.operators.curate import curate_corpus

GOOD = (
    "the quick brown fox jumps over the lazy dog and then the fox rests "
    "for a while in the sun with a friend"
)


def _docs(spark):
    rows = [
        (1, GOOD),
        (2, GOOD),                      # exact duplicate → survivor is id 1
        (3, "The  Quick brown fox jumps over the lazy dog and then the fox rests "
            "for a while in the sun with a friend"),  # same after normalize? (case+ws)
        (4, "%%% ### !!! @@@"),          # junk → quality gate drops
        (5, "reach me at bob@example.com for the quick brown details and "
            "then the fox rests for a while in the sun with a friend ok"),
    ]
    return spark.createDataFrame(rows, "doc_id: bigint, text: string")


def test_pipeline_stages(spark):
    out = {r["doc_id"]: r for r in curate_corpus(
        _docs(spark), "text", "doc_id", min_quality=0.3
    ).collect()}
    # dup of 1 collapsed to the smallest id; junk dropped
    assert 2 not in out
    assert 4 not in out
    assert 1 in out and 5 in out
    # normalization: doc 3 differs from doc 1 only by case/whitespace →
    # same fingerprint → collapsed into doc 1
    assert 3 not in out
    # PII scrubbed
    assert "[PII]" in out[5]["text"] and "bob@example.com" not in out[5]["text"]
    # quality column present and in range
    assert 0.0 <= out[1]["quality"] <= 1.0


def test_sampling_is_deterministic(spark):
    docs = _docs(spark)
    a = curate_corpus(docs, "text", "doc_id", min_quality=0.0, sample_rate=0.5)
    b = curate_corpus(docs, "text", "doc_id", min_quality=0.0, sample_rate=0.5)
    assert sorted(r["doc_id"] for r in a.collect()) == sorted(
        r["doc_id"] for r in b.collect()
    )
    full = curate_corpus(docs, "text", "doc_id", min_quality=0.0, sample_rate=1.0)
    assert full.count() >= a.count()


def test_one_shuffle_plan(spark):
    # the pipeline's only exchange is the dedup window's hash partitioning
    out = curate_corpus(_docs(spark), "text", "doc_id", min_quality=0.3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
