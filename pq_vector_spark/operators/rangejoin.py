"""Banded time-range join — equi-key join where the right row must fall in
a time window relative to the left row (``rt ∈ [lt+lower, lt+upper)``).

The naive expression (equi-join on key + range predicate) makes Spark
produce a per-key cross product filtered afterwards: with a 100 TB events
table and hot keys that is quadratic blowup, the classic interval-join
trap (the same trap the as-of join avoids with its union trick,
operators/asof.py). Flink's interval join and KDB's window join solve it by
**banding**: quantize time into buckets the width of the window, join on
(key, bucket) where each LEFT row explodes into only the ⌈W/W⌉+1 = 2
buckets its window can touch, then apply the exact range predicate
post-join.

Scale shape: one shuffle per side keyed on (key, bucket) — a hot key's
rows spread across its time buckets, so a single dominant entity no longer
serializes into one reducer (the banding IS the salt); each joined group
holds only rows within ~2 window-widths of each other, so the post-filter
amplification is bounded by local density, not key cardinality.

Built entirely from native expressions (sequence/explode/join/filter) —
whole-stage codegen, no Python workers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "_rj_bucket"
_LT = "_rj_lt"
_RT = "_rj_rt"
_LID = "_rj_lid"


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    lower: float,
    upper: float,
    *,
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``right`` to each ``left`` row when
    ``right_ts ∈ [left_ts + lower, left_ts + upper)`` (seconds, half-open —
    the streaming-window convention) and the equi-keys match.

    ``how`` ∈ {"inner", "left"}; "left" keeps windowless left rows with
    NULL right columns (for count-style aggregations downstream).
    Timestamps are compared at microsecond precision via ``unix_micros``
    (exact integer arithmetic — no float epoch rounding).

    Output: all left columns + all right columns (caller disambiguates
    names beforehand; overlapping names raise).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if upper <= lower:
        raise ValueError("upper must be > lower (half-open [lower, upper))")
    keys = [on] if isinstance(on, str) else list(on)
    overlap = (set(left.columns) & set(right.columns)) - set(keys)
    if overlap:
        raise ValueError(
            f"overlapping non-key columns {sorted(overlap)}; rename before joining"
        )

    lo_us = int(round(lower * 1_000_000))
    up_us = int(round(upper * 1_000_000))
    w_us = max(up_us - lo_us, 1)

    lt = F.unix_micros(F.col(left_ts).cast("timestamp"))
    rt = F.unix_micros(F.col(right_ts).cast("timestamp"))

    # each left row's window [lt+lo, lt+up) spans at most 2 width-W buckets
    l = left.withColumn(_LT, lt).withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor((F.col(_LT) + F.lit(lo_us)) / F.lit(w_us)),
                F.floor((F.col(_LT) + F.lit(up_us) - F.lit(1)) / F.lit(w_us)),
            )
        ),
    )
    r = right.withColumn(_RT, rt).withColumn(
        _BUCKET, F.floor(F.col(_RT) / F.lit(w_us))
    )

    cond = (
        (F.col(_RT) >= F.col(_LT) + F.lit(lo_us))
        & (F.col(_RT) < F.col(_LT) + F.lit(up_us))
    )
    joined = l.join(r, keys + [_BUCKET], "inner").filter(cond)

    if how == "left":
        # left rows whose window matched nothing come back with NULL right
        # columns — derived via an anti-join on the matched rows' CONTENT
        # ID, not by re-running the range probe. The id is
        # md5(to_json(struct(all left columns), ignoreNullFields=false)):
        # null fields are SERIALIZED (to_json's default drops them, under
        # which a map column's {"k": null} and {} would collide — two
        # distinct left rows sharing an id could suppress a genuinely
        # unmatched row from the null-padded branch). Type constraint:
        # to_json must support every left column's type (it covers all
        # standard Spark SQL types; exotic UDTs would fail at analysis —
        # rename/drop them before a left range join). Computed map-side
        # from row content it is (a) identical across the two plan branches
        # (unlike monotonically_increasing_id, which shifts with partition
        # layout), (b) NULL-safe by construction — a matched left row
        # carrying a NULL payload hashes the same in both branches, so it
        # can never be re-emitted as a duplicate null-padded row — and
        # (c) 16 bytes, so the matched-distinct + anti-join shuffles ids,
        # never full left rows. Content-identical left rows share an id;
        # multiplicity is preserved (each copy either all-match or
        # all-miss, and the anti-join keeps every missing copy).
        right_cols = [c for c in right.columns if c not in keys]
        lid = F.md5(
            F.to_json(
                F.struct(*[F.col(c) for c in left.columns]),
                {"ignoreNullFields": "false"},
            )
        )
        matched_ids = (
            l.withColumn(_LID, lid)
            .join(r, keys + [_BUCKET], "inner")
            .filter(cond)
            .select(_LID)
            .distinct()
        )
        missing = (
            left.withColumn(_LID, lid)
            .join(matched_ids, _LID, "left_anti")
            .drop(_LID)
        )
        for c in right_cols:
            missing = missing.withColumn(
                c, F.lit(None).cast(dict(right.dtypes)[c])
            )
        out_cols = left.columns + right_cols
        return joined.select(*out_cols).unionByName(missing.select(*out_cols))
    return joined.drop(_BUCKET, _LT, _RT)
