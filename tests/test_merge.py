"""CDC merge/upsert tests (operators/merge.py): last-writer-wins
semantics, delete/insert/update paths, guards, and the broadcast plan
shape that keeps the base un-shuffled."""

import pytest
from pyspark.sql import functions as F

from pq_vector_spark.operators.merge import latest_changes, merge_upsert


@pytest.fixture(scope="module")
def base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        ["id", "name", "bal"],
    )


def _changes(spark, rows):
    return spark.createDataFrame(rows, ["id", "name", "bal", "op", "version"])


def test_update_insert_delete(spark, base):
    ch = _changes(
        spark,
        [
            (2, "b2", 21.0, "U", 1),  # update
            (3, None, 0.0, "D", 1),  # delete
            (9, "new", 90.0, "U", 1),  # insert
        ],
    )
    out = {r["id"]: (r["name"], r["bal"]) for r in merge_upsert(base, ch, ["id"], "version").collect()}
    assert out == {
        1: ("a", 10.0),
        2: ("b2", 21.0),
        4: ("d", 40.0),
        9: ("new", 90.0),
    }


def test_last_writer_wins(spark, base):
    ch = _changes(
        spark,
        [
            (2, "stale", 0.0, "U", 1),
            (2, "winner", 99.0, "U", 5),
            (2, "mid", 50.0, "U", 3),
        ],
    )
    out = {r["id"]: r["name"] for r in merge_upsert(base, ch, ["id"], "version").collect()}
    assert out[2] == "winner"


def test_delete_then_higher_version_upsert_resurrects(spark, base):
    """The winning change is applied regardless of earlier deletes."""
    ch = _changes(spark, [(3, None, 0.0, "D", 1), (3, "back", 31.0, "U", 2)])
    out = {r["id"]: r["name"] for r in merge_upsert(base, ch, ["id"], "version").collect()}
    assert out[3] == "back"


def test_delete_outranks_upsert_at_same_version(spark, base):
    """Tie on version → delete-first tie-break: the delete wins (the
    conservative reading of a conflicting feed)."""
    ch = _changes(spark, [(3, "dup", 0.0, "U", 7), (3, None, 0.0, "D", 7)])
    w = latest_changes(ch, ["id"], "version")
    assert w.collect()[0]["op"] == "D"
    ids = {r["id"] for r in merge_upsert(base, ch, ["id"], "version").collect()}
    assert 3 not in ids


def test_schema_is_base_schema(spark, base):
    ch = _changes(spark, [(2, "b2", 21.0, "U", 1)])
    out = merge_upsert(base, ch, ["id"], "version")
    assert out.columns == base.columns


def test_missing_payload_column_rejected(spark, base):
    bad = spark.createDataFrame([(2, "x", "U", 1)], ["id", "name", "op", "version"])
    with pytest.raises(ValueError, match="payload"):
        merge_upsert(base, bad, ["id"], "version")


def test_missing_version_column_rejected(spark, base):
    bad = spark.createDataFrame([(2, "x", 1.0, "U")], ["id", "name", "bal", "op"])
    with pytest.raises(ValueError, match="missing required"):
        merge_upsert(base, bad, ["id"], "version")


def test_base_side_is_broadcast_anti_join(spark, base):
    """The 100 TB contract: the base never shuffles — the touched-key set
    rides a BroadcastHashJoin LeftAnti."""
    ch = _changes(spark, [(2, "b2", 21.0, "U", 1)])
    plan = merge_upsert(base, ch, ["id"], "version")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_fallback_to_sort_merge_above_broadcast_cap(spark, base):
    """r7 regression: a changeset above broadcast_max_rows must NOT force a
    broadcast (a quarter-billion takedown keys would OOM executors) — the
    touched-key anti-join falls back to a shuffled join, and the result is
    identical to the broadcast path."""
    ch = _changes(
        spark,
        [
            (2, "b2", 21.0, "U", 1),
            (3, None, 0.0, "D", 1),
            (9, "new", 90.0, "U", 1),
        ],
    )
    # AQE would re-plan the tiny shuffled side back into a broadcast at
    # runtime (by design); disable it for the plan-shape assertion only
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out_fb = merge_upsert(
            base, ch, ["id"], "version", broadcast_max_rows=2
        )
        plan = out_fb._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        got = {r["id"]: (r["name"], r["bal"]) for r in out_fb.collect()}
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    want = {
        r["id"]: (r["name"], r["bal"])
        for r in merge_upsert(base, ch, ["id"], "version", broadcast=True).collect()
    }
    assert got == want == {
        1: ("a", 10.0),
        2: ("b2", 21.0),
        4: ("d", 40.0),
        9: ("new", 90.0),
    }


def test_forced_broadcast_skips_probe_job(spark, base):
    """broadcast=True must not run the auto-sizing probe job (foreachBatch
    callers pin it to avoid a count per micro-batch): assert no extra job
    between construction and the single collect."""
    ch = _changes(spark, [(2, "b2", 21.0, "U", 1)])
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    df = merge_upsert(base, ch, ["id"], "version", broadcast=True)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before  # plan construction launched zero jobs
    assert df.count() == 4


def test_auto_probe_counts_distinct_keys_not_rows(spark, base):
    """r8 verdict #4: a changeset with more ROWS than the broadcast cap but
    few DISTINCT keys must still take the broadcast path — the probe sizes
    what is actually broadcast (the touched-key set)."""
    # 6 rows, only 2 distinct keys; cap of 3 would reject a raw row count
    ch = _changes(
        spark,
        [
            (2, "b1", 21.0, "U", 1),
            (2, "b2", 22.0, "U", 2),
            (2, "b3", 23.0, "U", 3),
            (3, "c1", 31.0, "U", 1),
            (3, "c2", 32.0, "U", 2),
            (3, "c3", 33.0, "U", 3),
        ],
    )
    out = merge_upsert(base, ch, ["id"], "version", broadcast_max_rows=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    got = {r["id"]: (r["name"], r["bal"]) for r in out.collect()}
    assert got == {
        1: ("a", 10.0),
        2: ("b3", 23.0),
        3: ("c3", 33.0),
        4: ("d", 40.0),
    }
