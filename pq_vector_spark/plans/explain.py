"""Plan rendering with the vector path's operator counters — the PySpark
analogue of the reference printing its metrics inside the rendered plan
tree (reference: src/df_vector/exec.rs:302-331 renders candidate/file
counters per node; benches/query.rs:461-478 prints the annotated tree).

Spark's ``Observation`` collects the same counters (candidate_rows,
files_scanned — attached by ``index/search.py:indexed_topk``) but only as a
detached dict; ``explain_vector`` re-unites them with the plan text, inline
on the ``CollectMetrics`` node that produced them.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame


def observed_metrics(observation, df: Optional[DataFrame] = None, execute: bool = True):
    """The observation's metrics as a plain dict, without blocking.

    ``Observation.get`` blocks forever when the observed plan never ran, so
    probe the JVM side (``getOrEmpty``) first; when the plan has not
    executed and ``df`` is supplied with ``execute=True``, drive it with a
    ``count()`` and read the now-available metrics. Returns ``{}`` when the
    metrics are unavailable and execution is declined.
    """
    try:
        m = observation._jo.getOrEmpty()
        if m.size() > 0:
            out = {}
            it = m.iterator()
            while it.hasNext():
                t = it.next()
                out[t._1()] = t._2()
            return out
    except Exception:
        pass  # not executed yet (JVM raises on the absent row)
    if df is not None and execute:
        df.count()
        return dict(observation.get)
    return {}


def vector_route(df: DataFrame) -> str:
    """Which physical route a (possibly intercepted) top-k DataFrame took:

    - ``"ivf-pq"`` — the codes-sidecar route (cluster prune × ADC scan ×
      exact re-rank): the optimized plan scans a ``pq_codes`` relation;
    - ``"ivf"`` — the raw IVF probe (CollectMetrics over the pruned scan);
    - ``"brute-force"`` — no interception artifacts; the original plan.

    Plan-text probe only — never executes anything. Pair with
    ``pq_vector_spark.last_decline_reason()`` when the answer is
    brute-force to learn WHICH guard declined (at 100 TB a silent
    fall-through to brute force is a 20× cost surprise).
    """
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # the probe's signature is the pushed cluster predicate (a Filter line
    # naming the cluster column) — NOT the column's mere presence (a plain
    # scan of an indexed table lists it in the relation schema) and NOT a
    # CollectMetrics node (any user-attached Observation adds one to a
    # brute-force plan the interceptor declined)
    cluster_filtered = any(
        "Filter" in line and "_pq_cluster_id" in line
        for line in plan.splitlines()
    )
    if not cluster_filtered:
        return "brute-force"
    return "ivf-pq" if "pq_codes" in plan else "ivf"


def explain_vector(
    df: DataFrame,
    observation,
    mode: str = "formatted",
    execute: bool = True,
) -> str:
    """Render ``df``'s plan with the vector-path counters shown inline on
    the ``CollectMetrics`` node (and summarized in a header), mirroring the
    reference's metric-annotated plan tree. Executes the plan (one
    ``count()``) only if the observation has not been collected yet and
    ``execute`` is True. The header names the route taken (``vector_route``)
    and, for brute-force plans, this thread's last interception decline
    reason when one is recorded.
    """
    jqe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    plan = jqe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )
    route = vector_route(df)
    header = [f"== Vector Route ==\n{route}"]
    if route == "brute-force":
        from pq_vector_spark.plans.intercept import last_decline_reason

        reason = last_decline_reason()
        if reason:
            header.append(f"last_decline_reason: {reason}")
    metrics = observed_metrics(observation, df, execute)
    if not metrics:
        return "\n".join(header) + "\n" + plan + "\n== Vector Metrics ==\n(not executed)\n"
    inline = ", ".join(f"{k}={metrics[k]}" for k in sorted(metrics))
    lines = header + [""]
    for line in plan.splitlines():
        if "CollectMetrics" in line:
            line = f"{line}   [{inline}]"
        lines.append(line)
    lines += ["", "== Vector Metrics =="]
    lines += [f"{k} = {metrics[k]}" for k in sorted(metrics)]
    return "\n".join(lines) + "\n"
