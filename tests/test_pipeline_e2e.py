"""End-to-end curation pipeline over the r13 surface: JSONL ingestion →
rule + classifier gates → exact dedup → leakage-safe split → epoch
repetition → sequence packing. Each stage is oracle- or unit-attested on
its own; this test pins that they COMPOSE (schemas line up, NULL/edge
rows survive every hop, determinism holds through the whole chain)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pq_vector_spark.functions.text import gopher_quality_flags
from pq_vector_spark.operators.classifier import (
    classify_quality,
    fit_lda_quality,
)
from pq_vector_spark.operators.dedup import exact_dedup, ngram_jaccard_pairs
from pq_vector_spark.operators.packing import pack_sequences
from pq_vector_spark.operators.sampling import leakage_safe_split, repeat_mix
from pq_vector_spark.sources.jsonl import read_jsonl, write_jsonl

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

PROSE = [
    "the cat sat on the mat and it is that good for all of us to see",
    "a day in the life of a cat that is happy for it and the rest of us",
    "it is the best of times and it is the worst of times for all the cats",
    "the quick brown fox jumps over the lazy dog and it is a fine day for it",
]
JUNK = "zzz qqq 12345 !!!! #### xxxx yyyy wwww vvvv uuuu tttt ssss rrrr qq zz"


def test_full_curation_chain(spark, tmp_path):
    # --- land a corpus as JSONL: prose, junk, an exact dup, a corrupt line
    rows = [(i + 1, t) for i, t in enumerate(PROSE)]
    rows += [(50, JUNK), (51, PROSE[0])]  # junk + exact dup of doc 1
    src = spark.createDataFrame(rows, SCHEMA)
    jdir = str(tmp_path / "landing")
    write_jsonl(src, jdir)
    import os

    with open(os.path.join(jdir, "zz-bad.json"), "w") as f:
        f.write("{broken json line\n")

    good, quarantined = read_jsonl(spark, jdir, SCHEMA)
    assert quarantined.count() == 1
    assert good.count() == 6

    # --- gates: Gopher word-count rule + trained classifier
    fit = spark.createDataFrame(
        [(100 + i, t, True) for i, t in enumerate(PROSE)]
        + [(200 + i, JUNK, False) for i in range(4)],
        "doc_id bigint, text string, y boolean",
    )
    model = fit_lda_quality(fit, "text", "y")
    gated = (
        classify_quality(good, "text", model)
        .filter(F.col("quality_lr_pred"))
        .filter(gopher_quality_flags("text", min_words=5)["words_ok"])
        .select("doc_id", "text")
    )
    gids = {r["doc_id"] for r in gated.collect()}
    assert 50 not in gids and {1, 2, 3, 4, 51} <= gids

    # --- exact dedup: doc 51 collapses into doc 1
    keep = exact_dedup(gated, "text", "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    survivors = gated.join(keep, "doc_id")
    sids = {r["doc_id"] for r in survivors.collect()}
    assert sids == {1, 2, 3, 4}

    # --- leakage-safe split over near-dup components
    pairs = ngram_jaccard_pairs(survivors, "text", "doc_id", n=3, threshold=0.6)
    split = leakage_safe_split(survivors, "doc_id", pairs, holdout=0.3, salt="e2e")
    assert {r["split"] for r in split.collect()} <= {"train", "holdout"}
    train = split.filter(F.col("split") == "train").select("doc_id", "text")

    # --- epoch repetition (2x) + packing into 32-token sequences
    repeated = repeat_mix(train, "doc_id", 2.0, salt="e2e")
    assert repeated.count() == 2 * train.count()
    with_tokens = repeated.withColumn("n_tok", F.size(F.split("text", r"\s+")))
    packed = pack_sequences(
        with_tokens,
        "n_tok",
        group_col="epoch",
        order_col="doc_id",
        max_tokens=32,
    )
    out = packed.collect()
    assert len(out) == repeated.count()
    # offsets restart per epoch and are cumulative within one
    per_epoch = {}
    for r in sorted(out, key=lambda r: (r["epoch"], r["doc_id"])):
        per_epoch.setdefault(r["epoch"], []).append(r)
    for ep, rs in per_epoch.items():
        assert rs[0]["start_offset"] == 0
        acc = 0
        for r in rs:
            assert r["start_offset"] == acc
            acc += r["n_tok"]

    # --- whole chain is deterministic
    again = {
        (r["doc_id"], r["epoch"], r["start_offset"])
        for r in pack_sequences(
            repeat_mix(train.repartition(5), "doc_id", 2.0, salt="e2e")
            .withColumn("n_tok", F.size(F.split("text", r"\s+"))),
            "n_tok",
            group_col="epoch",
            order_col="doc_id",
            max_tokens=32,
        ).collect()
    }
    first = {(r["doc_id"], r["epoch"], r["start_offset"]) for r in out}
    assert first == again
