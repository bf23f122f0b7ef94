"""Event-stream operators: tumbling-window aggregation, sessionization,
and JSON property extraction — each with a batch form (oracle-checkable)
and a Structured Streaming form (watermarks + windowed state).

The reference has no streaming surface (SURVEY.md §2 'explicitly absent');
these are north-star extensions. Scale notes: windowed aggregation shuffles
on (window, key) with map-side partial aggregation; sessionization uses
``session_window`` (streaming) / a lag+cumsum window (batch) partitioned by
user — both scale with per-user event counts, not total volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _watermarkable(df: DataFrame, ts_col: str) -> DataFrame:
    """``withWatermark`` rejects TIMESTAMP_NTZ event time
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE — Spark 4 infers NTZ for parquet
    ``timestamp[us]`` without UTC adjustment). Sessions here pin the tz to
    UTC, so casting NTZ → TIMESTAMP is value-preserving. No-op otherwise."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def tumbling_agg(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window_duration: str = "1 hour",
) -> DataFrame:
    """Per-(window, key) count + sum over tumbling windows.

    Batch form. Output window start as epoch seconds (bigint) so external
    engines hash-match without timestamp-precision hazards.
    """
    w = F.window(F.col(ts_col), window_duration)
    return (
        events.groupBy(w.alias("_w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("_w.start")).cast("bigint").alias("window_start"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def streaming_tumbling_agg(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming form: watermark bounds state; late events beyond the
    watermark are dropped; output mode 'update'/'append' chosen by caller."""
    stream = _watermarkable(stream, ts_col)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("_w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("_w.start")).cast("bigint").alias("window_start"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Batch sessionization: a session breaks when the gap to the previous
    event of the same user reaches ``gap_minutes`` (``>=``, end-EXCLUSIVE —
    the same boundary rule as ``session_window``, so batch and streaming
    agree for events landing exactly on the gap boundary).

    lag → gap flag → running sum = session ordinal (classic islands trick,
    identical semantics to DuckDB window SQL → oracle-checkable). Output one
    row per session: (user_id, session_id, n_events, duration_s).
    """
    w_user = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(
        F.lag(ts_col).over(w_user)
    )
    flagged = events.withColumn(
        "_new_session",
        F.when(gap.isNull() | (gap >= gap_minutes * 60), F.lit(1)).otherwise(F.lit(0)),
    )
    with_sess = flagged.withColumn(
        "session_id",
        F.sum("_new_session").over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("bigint"),
    )
    return (
        with_sess.groupBy(user_col, "session_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            (
                F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
            ).cast("bigint").alias("duration_s"),
        )
    )


def streaming_sessionize(
    stream: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming form via the built-in ``session_window`` (gap-based session
    state managed by Spark; watermark evicts closed sessions). Sessions
    merge only while gaps are STRICTLY below ``gap_minutes`` (end-exclusive)
    — the batch form above uses the same ``>=`` break rule."""
    stream = _watermarkable(stream, ts_col)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), f"{gap_minutes} minutes").alias("_sw"),
            F.col(user_col),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            user_col,
            F.unix_timestamp(F.col("_sw.start")).cast("bigint").alias("session_start"),
            "n_events",
        )
    )


def extract_prop(events: DataFrame, prop: str, out_col: str) -> DataFrame:
    """Pull an integer property out of the JSON ``props`` column using a
    regexp (portable across engines, unlike engine-specific JSON paths)."""
    raw = F.regexp_extract(F.col("props"), rf'"{prop}"\s*:\s*(\d+)', 1)
    # regexp_extract yields '' on no-match; ANSI mode would throw on
    # ''::BIGINT, so null it out first (≙ the oracle's TRY_CAST).
    return events.withColumn(
        out_col, F.when(raw == "", None).otherwise(raw).cast("bigint")
    )


def enrich_join(
    events: DataFrame,
    dim: DataFrame,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Stream-static (or batch-batch) enrichment join: attach dimension
    attributes to an event stream. The static side carries an explicit
    ``broadcast`` hint — the canonical 100 TB shape: the unbounded stream
    NEVER shuffles for the join; each executor holds the (small) dimension
    table and enriches its partitions map-side. Works identically on a
    batch DataFrame (the batch twin the oracle checks) and on a
    ``readStream`` source (Structured Streaming supports stream-static
    inner/left joins natively, no watermark required for the join itself).
    """
    return events.join(F.broadcast(dim), F.col(left_key) == F.col(right_key), how)


def scd_intervalize(
    dim: DataFrame,
    key: str,
    eff_col: str,
    end_col: str = "_pq_scd_end",
) -> DataFrame:
    """Turn a slowly-changing dimension keyed by effective-timestamp
    versions into half-open validity intervals: each version's end is the
    next version's effective time (NULL for the current version). Static
    batch computation (tiny window over the dim), done ONCE before the
    stream starts."""
    w = Window.partitionBy(key).orderBy(F.col(eff_col).asc())
    return dim.withColumn(end_col, F.lead(eff_col).over(w))


def scd_enrich(
    events: DataFrame,
    dim: DataFrame,
    left_key: str,
    right_key: str,
    eff_col: str,
    ts_col: str = "ts",
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment against a SLOWLY-CHANGING dimension:
    each event joins the dim version effective AT ITS OWN TIMESTAMP
    (point-in-time correctness), not a static snapshot.

    The dim is intervalized (``scd_intervalize``) and broadcast; events
    join on key equality + half-open interval containment
    ``eff <= ts < end``. Structured Streaming supports stream-static
    inner/left joins with arbitrary range predicates, so the SAME code
    enriches a ``readStream`` source — the 100 TB shape: the unbounded
    stream never shuffles, every executor probes its broadcast interval
    copy map-side. The batch twin of this semantics is
    ``operators.asof.asof_join`` (union-window carry), which the oracle
    checks against DuckDB's native ASOF JOIN.
    """
    end_col = "_pq_scd_end"
    intervals = scd_intervalize(dim, right_key, eff_col, end_col)
    ts = events[ts_col]
    cond = (
        (events[left_key] == intervals[right_key])
        & (ts >= intervals[eff_col])
        & (intervals[end_col].isNull() | (ts < intervals[end_col]))
    )
    out = events.join(F.broadcast(intervals), cond, how)
    return out.drop(intervals[right_key]).drop(intervals[eff_col]).drop(
        intervals[end_col]
    )


def streaming_dedup(
    stream: DataFrame,
    key_cols: list[str],
    within_watermark: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact deduplication on ``key_cols`` — the streaming
    counterpart of ``operators.dedup.exact_dedup`` for continuous ingest.

    ``within_watermark`` set (e.g. "2 hours") bounds state via
    ``dropDuplicatesWithinWatermark`` — the 100 TB/day production path:
    duplicates arriving within the watermark horizon are suppressed, state
    is evicted beyond it. Unset, plain ``dropDuplicates`` keeps full-history
    key state — exact at any horizon (what the oracle checks) but state
    grows with distinct keys; use only on bounded replays.

    The kept row per key is arrival-dependent; project the key columns for
    deterministic output (the distinct key set is identical either way).
    """
    if within_watermark is not None:
        stream = _watermarkable(stream, ts_col)
        return stream.withWatermark(ts_col, within_watermark).dropDuplicatesWithinWatermark(
            key_cols
        )
    return stream.dropDuplicates(key_cols)


def stream_stream_window_join(
    events: DataFrame,
    *,
    left_type: str = "purchase",
    right_type: str = "click",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    window: str = "24 hours",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join: each ``left_type`` event pairs with the
    same user's ``right_type`` events in the strictly-preceding ``window``
    (half-open — the batch twin is operators/rangejoin.py's banded join).

    Both sides derive from ONE source stream, each branch with its own
    watermark; the time-range condition on the two event-time columns is
    what lets Structured Streaming bound join state (rows older than
    watermark + window are evicted — without the range condition the join
    would need unbounded state). Works on a batch DataFrame too (watermarks
    skipped) — the same plan both modes, like the other twins here.

    Output: (left id, right id) pairs as (``{left_type}_id``,
    ``{right_type}_id``).
    """
    base = _watermarkable(events, ts_col)
    left = base.filter(F.col(type_col) == left_type).select(
        F.col(id_col).alias("_lid"),
        F.col(user_col).alias("_lu"),
        F.col(ts_col).alias("_lts"),
    )
    right = base.filter(F.col(type_col) == right_type).select(
        F.col(id_col).alias("_rid"),
        F.col(user_col).alias("_ru"),
        F.col(ts_col).alias("_rts"),
    )
    if left.isStreaming:
        left = left.withWatermark("_lts", watermark)
    if right.isStreaming:
        right = right.withWatermark("_rts", watermark)
    cond = (
        (F.col("_lu") == F.col("_ru"))
        & (F.col("_rts") >= F.col("_lts") - F.expr(f"INTERVAL {window}"))
        & (F.col("_rts") < F.col("_lts"))
    )
    return left.join(right, cond, "inner").select(
        F.col("_lid").alias(f"{left_type}_id"),
        F.col("_rid").alias(f"{right_type}_id"),
    )


def trending(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_duration: str = "1 hour",
    k: int = 3,
) -> DataFrame:
    """Windowed heavy hitters: the top-``k`` keys per tumbling window by
    event count — the "what's trending each hour" rollup.

    Batch form: one (window, key) partial-agg shuffle, then a per-window
    rank that Spark's WindowGroupLimit prunes map-side (each task keeps
    its local k per window before the exchange). Ties break by key
    ascending for engine-identical output. The streaming twin is the
    standard pattern: ``streaming_tumbling_agg`` feeds a foreachBatch (or
    complete-mode sink) that ranks — windowed rank itself is not a
    streaming operator, the per-window counts are.
    """
    w = F.window(_watermarkable(events, ts_col)[ts_col], window_duration)
    counts = (
        events.groupBy(w.alias("_w"), F.col(key_col))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            F.unix_timestamp(F.col("_w.start")).cast("bigint").alias("window_start"),
            key_col,
            "n_events",
        )
    )
    rank_w = Window.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col(key_col).asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(rank_w).cast("int"))
        .filter(F.col("rank") <= F.lit(int(k)))
    )
