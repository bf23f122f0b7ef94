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
    ``execute`` is True.
    """
    jqe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    plan = jqe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )
    metrics = observed_metrics(observation, df, execute)
    if not metrics:
        return plan + "\n== Vector Metrics ==\n(not executed)\n"
    inline = ", ".join(f"{k}={metrics[k]}" for k in sorted(metrics))
    lines = []
    for line in plan.splitlines():
        if "CollectMetrics" in line:
            line = f"{line}   [{inline}]"
        lines.append(line)
    lines += ["", "== Vector Metrics =="]
    lines += [f"{k} = {metrics[k]}" for k in sorted(metrics)]
    return "\n".join(lines) + "\n"
