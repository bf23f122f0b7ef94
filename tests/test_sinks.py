"""Training-shard sink tests (sources/sinks.py): balanced range shards,
within-shard ordering, manifest, guards."""

import pytest
from pyspark.sql import functions as F

from pq_vector_spark.sources.sinks import shard_manifest, write_training_shards


@pytest.fixture(scope="module")
def corpus(spark):
    # skewed shard key: quality clustered at two modes — range partitioning
    # must still balance counts
    return spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        (F.when(F.col("id") % 4 == 0, F.col("id") % 97)
          .otherwise(900 + F.col("id") % 53)).cast("double").alias("quality"),
        F.concat(F.lit("d"), F.col("id").cast("string")).alias("text"),
    )


def test_write_shards_balanced_and_sorted(spark, corpus, tmp_path):
    out = str(tmp_path / "shards")
    write_training_shards(
        corpus, out, shard_col="quality", sort_cols=["quality", "doc_id"], n_shards=8
    )
    man = {r["file"]: r["n_rows"] for r in shard_manifest(spark, out).collect()}
    assert len(man) == 8
    sizes = sorted(man.values())
    assert sizes[0] > 0 and sizes[-1] / sizes[0] < 3  # balanced under skew

    # within-file: quality ascending; across the range partitioner, every
    # row of a higher-boundary file >= every row of a lower one
    rows = (
        spark.read.parquet(out)
        .select(F.input_file_name().alias("f"), "quality", "doc_id")
        .collect()
    )
    per_file = {}
    for r in rows:
        per_file.setdefault(r["f"], []).append((r["quality"], r["doc_id"]))
    ranges = []
    for f, vals in per_file.items():
        assert vals == sorted(vals), f"shard {f} not sorted"
        ranges.append((min(v[0] for v in vals), max(v[0] for v in vals)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, "shard quality ranges overlap"
    # nothing lost
    assert sum(man.values()) == 4000


def test_write_shards_max_records_per_file(spark, corpus, tmp_path):
    out = str(tmp_path / "capped")
    write_training_shards(
        corpus, out, shard_col="doc_id", n_shards=4, max_records_per_file=300
    )
    man = shard_manifest(spark, out).collect()
    assert all(r["n_rows"] <= 300 for r in man)
    assert sum(r["n_rows"] for r in man) == 4000


def test_write_shards_guards(spark, corpus, tmp_path):
    with pytest.raises(ValueError, match="n_shards"):
        write_training_shards(corpus, str(tmp_path / "x"), shard_col="quality", n_shards=0)
    with pytest.raises(ValueError, match="missing"):
        write_training_shards(corpus, str(tmp_path / "y"), shard_col="nope")


def test_write_epoch_shards_deterministic_global_shuffle(spark, tmp_path):
    """Epoch shuffling: reading shards in file order + rows in stored
    order replays a deterministic pseudo-random permutation — identical
    across re-writes of the same epoch, different between epochs, globally
    ordered across shard boundaries, and carrying exactly the input rows."""
    from pq_vector_spark.sources.sinks import write_epoch_shards

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id: bigint, text: string"
    )

    def replay(path):
        # a REAL loader's view: files in name order, rows in STORED order
        # (pyarrow preserves physical row order) — this is what verifies
        # the within-shard sort actually happened at write time
        import glob

        import pyarrow.parquet as pq

        out = []
        for f in sorted(glob.glob(f"{path}/part-*.parquet")):
            out.extend(pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist())
        return out

    p0a, p0b, p1 = (str(tmp_path / n) for n in ("e0a", "e0b", "e1"))
    write_epoch_shards(df, p0a, key_col="doc_id", epoch=0, n_shards=3)
    write_epoch_shards(df.repartition(7), p0b, key_col="doc_id", epoch=0, n_shards=3)
    write_epoch_shards(df, p1, key_col="doc_id", epoch=1, n_shards=3)

    seq0a, seq0b, seq1 = replay(p0a), replay(p0b), replay(p1)
    assert sorted(seq0a) == list(range(200))  # exactly the input rows
    assert seq0a == seq0b  # reproducible across runs and partitionings
    assert seq0a != seq1  # epochs are independent permutations
    assert seq0a != list(range(200))  # actually shuffled

    # the permutation is GLOBAL: the full sequence equals the corpus
    # sorted by the order key alone (shards are range-ordered, so
    # file-order concatenation IS h-ascending order)
    by_h = [
        r["doc_id"]
        for r in spark.read.parquet(p0a)
        .orderBy("_epoch_ord", "doc_id")
        .collect()
    ]
    assert seq0a == by_h

    with pytest.raises(ValueError, match="_epoch_ord"):
        write_epoch_shards(
            df.withColumn("_epoch_ord", F.lit(1)), str(tmp_path / "bad"),
            key_col="doc_id",
        )
    # NULL keys fail LOUDLY instead of parking un-shuffled rows up front
    withnull = df.unionByName(
        spark.createDataFrame([(None, "ghost")], "doc_id: bigint, text: string")
    )
    with pytest.raises(Exception, match="NULL 'doc_id'"):
        write_epoch_shards(withnull, str(tmp_path / "bad2"), key_col="doc_id")


def test_verify_epoch_shards_audit(spark, tmp_path):
    """Loader-side epoch audit (r12): a clean epoch verifies; wrong
    (salt, epoch) parameters, a doubled shard, and a row-count mismatch
    each fail with the specific counter that caught them."""
    import glob
    import shutil

    from pq_vector_spark.sources.sinks import verify_epoch_shards, write_epoch_shards

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(150)], "doc_id: bigint, text: string"
    )
    p = str(tmp_path / "ve1")
    write_epoch_shards(df, p, key_col="doc_id", epoch=3, salt="s", n_shards=3)
    good = verify_epoch_shards(
        spark, p, key_col="doc_id", epoch=3, salt="s", expected_rows=150
    )
    assert good == {
        "ok": True, "rows": 150, "distinct_keys": 150, "ord_mismatches": 0
    }
    # wrong epoch: every stored order key disagrees with the re-derivation
    wrong = verify_epoch_shards(spark, p, key_col="doc_id", epoch=4, salt="s")
    assert not wrong["ok"] and wrong["ord_mismatches"] == 150
    # doubled shard (a partially-retried write): duplicate keys caught
    part = sorted(glob.glob(f"{p}/part-*.parquet"))[0]
    shutil.copy2(part, part.replace("part-", "part-copy-"))
    doubled = verify_epoch_shards(spark, p, key_col="doc_id", epoch=3, salt="s")
    assert not doubled["ok"] and doubled["distinct_keys"] < doubled["rows"]
    # row-count expectation
    assert not verify_epoch_shards(
        spark, p, key_col="doc_id", epoch=3, salt="s", expected_rows=150
    )["ok"]
    plain = str(tmp_path / "plain.parquet")
    df.write.parquet(plain)
    with pytest.raises(ValueError, match="_epoch_ord"):
        verify_epoch_shards(spark, plain, key_col="doc_id")
