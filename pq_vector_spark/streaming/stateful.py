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

from pyspark.sql import DataFrame


def streaming_user_stats(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-user running (n_events, sum_value, first_ts, last_ts) maintained
    in custom group state and re-emitted each microbatch.

    The float accumulator uses ``math.fsum`` over the running compensated
    state + batch values — exact to the final double, so totals are
    arrival-order-independent (a requirement for oracle parity: the batch
    oracle sums in a different order than microbatch arrival).

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
    state_schema = "n BIGINT, s DOUBLE, mn BIGINT, mx BIGINT"

    def fn(key, pdf_iter, state):
        if state.exists:
            n, s, mn, mx = state.get
        else:
            n, s, mn, mx = 0, 0.0, None, None
        vals = [s]
        for pdf in pdf_iter:
            n += len(pdf)
            vals.extend(float(v) for v in pdf[value_col])
            ts = (pdf[ts_col].astype("int64") // 1_000_000_000).to_numpy()
            if len(ts):
                lo, hi = int(ts.min()), int(ts.max())
                mn = lo if mn is None else min(mn, lo)
                mx = hi if mx is None else max(mx, hi)
        s = math.fsum(vals)
        state.update((n, s, mn, mx))
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
