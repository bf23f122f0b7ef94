"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the escape hatch for stateful semantics the built-in windowed aggregations
can't express (north-star extension; the reference has no streaming
surface at all, SURVEY.md §2 'explicitly absent').

Demonstrated here as incrementally-maintained per-key corpus statistics:
arbitrary Python state per key, updated per Arrow batch, emitted per
microbatch. Scale notes: state lives in the state store partitioned by
key (same shuffle as a groupBy); per-key state here is four scalars, so
state size grows with distinct keys only, never with event volume.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame


def _grow_partials(partials: list, x: float) -> list:
    """Shewchuk grow-expansion step (the kernel inside ``math.fsum`` /
    the classic 'msum' recipe): merge ``x`` into a list of non-overlapping
    doubles whose exact mathematical sum equals the running total. Exact —
    no rounding ever — so accumulation order cannot change the result."""
    out = []
    for y in partials:
        if abs(x) < abs(y):
            x, y = y, x
        hi = x + y
        lo = y - (hi - x)
        if lo:
            out.append(lo)
        x = hi
    out.append(x)
    return out


def _add_batch(partials: list, values) -> list:
    """Fold a whole batch of doubles into the exact-partials accumulator
    with VECTORIZED error-free distillation instead of a per-row Python
    loop (the per-event `_grow_partials` walk was the one row-at-a-time
    hot spot flagged in review).

    Each sweep pairs the values and applies TwoSum (an error-free
    transformation: a + b == s + err EXACTLY in float64), keeping the
    multiset's exact mathematical sum invariant while roughly halving its
    size; when every error term vanishes the remnant's floats sum exactly
    to the true total. The remnant (a handful of floats) then runs through
    the sequential Shewchuk grow to reach the canonical non-overlapping
    form the state schema stores. Non-finite inputs (inf/NaN) fall back to
    the sequential path so their IEEE propagation matches the old
    behavior bit-for-bit.
    """
    vals = np.asarray(values, dtype=np.float64)
    v = np.concatenate([np.asarray(partials, dtype=np.float64), vals])
    if v.size == 0:
        return []

    def _sequential():
        out = list(partials)
        for x in vals:
            out = _grow_partials(out, float(x))
        return out

    if not np.all(np.isfinite(v)):
        return _sequential()
    sweeps = 0
    while v.size > 8 and sweeps < 200:
        if v.size % 2:
            v = np.append(v, 0.0)
        a, b = v[0::2], v[1::2]
        s = a + b
        bv = s - a
        err = (a - (s - bv)) + (b - bv)
        v = np.concatenate([s[s != 0.0], err[err != 0.0]])
        if not np.all(np.isfinite(v)):
            # TwoSum pairing can overflow transiently (a + b = ±inf with
            # finite inputs near DBL_MAX), after which err is NaN and
            # further sweeps fold garbage — and the vectorized pairing hits
            # overflows the sequential order would not. Redo the whole fold
            # sequentially on the ORIGINAL inputs so IEEE propagation
            # matches the pre-vectorized behavior exactly.
            return _sequential()
        if v.size == 0:
            return []
        sweeps += 1
    out: list = []
    for x in v:
        out = _grow_partials(out, float(x))
    return out


def streaming_user_stats(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-user running (n_events, sum_value, first_ts, last_ts) maintained
    in custom group state and re-emitted each microbatch.

    The float accumulator keeps Shewchuk EXACT PARTIALS (the non-overlapping
    expansion ``math.fsum`` builds internally) in the state itself, not one
    already-rounded double — so the running total is EXACT across
    microbatches and the emitted ``sum_value`` is the correctly-rounded sum
    of every value seen, independent of arrival order or batch boundaries
    (a requirement for oracle parity: the batch oracle sums in a different
    order than microbatch arrival). The partials list stays tiny (one entry
    per distinct magnitude scale, a handful in practice).

    Output (per microbatch, 'update' semantics — the latest row per key
    wins): (user_id, n_events, sum_value, first_ts, last_ts) with
    timestamps as epoch seconds.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        f"{user_col} BIGINT, n_events BIGINT, sum_value DOUBLE, "
        "first_ts BIGINT, last_ts BIGINT"
    )
    state_schema = "n BIGINT, partials ARRAY<DOUBLE>, mn BIGINT, mx BIGINT"

    def fn(key, pdf_iter, state):
        if state.exists:
            n, partials, mn, mx = state.get
            partials = list(partials or [])
        else:
            n, partials, mn, mx = 0, [], None, None
        for pdf in pdf_iter:
            n += len(pdf)
            # one vectorized exact fold per Arrow batch (no per-row Python)
            partials = _add_batch(partials, pdf[value_col].to_numpy())
            ts = (pdf[ts_col].astype("int64") // 1_000_000_000).to_numpy()
            if len(ts):
                lo, hi = int(ts.min()), int(ts.max())
                mn = lo if mn is None else min(mn, lo)
                mx = hi if mx is None else max(mx, hi)
        state.update((n, partials, mn, mx))
        # fsum over non-overlapping partials = the correctly-rounded total
        s = math.fsum(partials)
        yield pd.DataFrame(
            {
                user_col: [key[0]],
                "n_events": [n],
                "sum_value": [s],
                "first_ts": [mn],
                "last_ts": [mx],
            }
        )

    return stream.groupBy(user_col).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
