"""JSONL ingestion with corrupt-record quarantine (sources/jsonl.py)."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pq_vector_spark.sources.jsonl import (
    read_jsonl,
    read_jsonl_inferred,
    write_jsonl,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


@pytest.fixture()
def jsonl_dir(tmp_path):
    p = tmp_path / "in"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"doc_id": 1, "text": "alpha"}\n'
        '{"doc_id": 2, "text": "beta"}\n'
        "this line is not json at all\n"
        '{"doc_id": 3, "text": "gamma"}\n'
        '{"doc_id": 4 "text": "missing comma"}\n'
    )
    return str(p)


def test_read_jsonl_splits_good_and_quarantine(spark, jsonl_dir):
    good, bad = read_jsonl(spark, jsonl_dir, SCHEMA)
    rows = {r["doc_id"]: r["text"] for r in good.collect()}
    assert rows == {1: "alpha", 2: "beta", 3: "gamma"}
    assert good.columns == ["doc_id", "text"]
    bad_lines = [r["_corrupt_record"] for r in bad.collect()]
    assert len(bad_lines) == 2
    assert any("not json" in l for l in bad_lines)
    assert any("missing comma" in l for l in bad_lines)


def test_read_jsonl_requires_schema(spark, jsonl_dir):
    with pytest.raises(ValueError, match="explicit schema"):
        read_jsonl(spark, jsonl_dir, None)
    clash = T.StructType([T.StructField("_corrupt_record", T.StringType())])
    with pytest.raises(ValueError, match="corrupt column"):
        read_jsonl(spark, jsonl_dir, clash)


def test_jsonl_round_trip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "doc_id bigint, text string"
    )
    out = str(tmp_path / "out_jsonl")
    write_jsonl(df, out)
    good, bad = read_jsonl(spark, out, SCHEMA)
    assert bad.count() == 0
    got = {(r["doc_id"], r["text"]) for r in good.collect()}
    # JSON writers omit null fields; the read surfaces them as NULL again
    assert got == {(1, "a"), (2, "b"), (3, None)}


def test_read_jsonl_inferred(spark, jsonl_dir):
    df = read_jsonl_inferred(spark, jsonl_dir)
    assert "_corrupt_record" in df.columns or set(df.columns) >= {"doc_id"}


def test_parse_barrier_survives_optimizer(spark, jsonl_dir):
    """The from_json parse must appear EXACTLY ONCE in each frame's
    optimized plan, inside the inline-generator barrier (r13 verdict #6):
    if a Spark upgrade ever teaches Catalyst to re-inline generator
    outputs, every downstream consumer would re-parse each line — this
    fails loudly instead of silently multiplying the parse cost."""
    good, quar = read_jsonl(spark, str(jsonl_dir), SCHEMA)
    for frame in (good, quar):
        plan = frame._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("from_json(") == 1
        assert plan.count("Generate inline") == 1
