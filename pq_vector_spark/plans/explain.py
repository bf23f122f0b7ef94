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


def _cls(jnode) -> str:
    return jnode.getClass().getSimpleName()


def _expr_has_cluster_probe(jexpr, cluster_col: str) -> bool:
    """Does this expression tree contain the interceptor's pushed cluster
    predicate — ``cluster_col IN (int literals)`` (Catalyst may rewrite it
    to ``InSet``, or to ``=``/OR-of-``=`` for tiny probe sets)? Matching
    the PREDICATE SHAPE, not any filter that merely names the column,
    keeps a user's own unrelated filter over the cluster column (e.g. a
    range scan) from being misreported as an interception (ADVICE r8)."""

    def attr_named(e) -> bool:
        while _cls(e) in ("Cast", "AnsiCast", "TryCast"):
            e = e.children().apply(0)
        return _cls(e) == "AttributeReference" and e.name() == cluster_col

    def is_probe(e) -> bool:
        c = _cls(e)
        if c == "In":
            ch = e.children()
            if ch.size() < 2 or not attr_named(ch.apply(0)):
                return False
            return all(_cls(ch.apply(i)) == "Literal" for i in range(1, ch.size()))
        if c == "InSet":
            return attr_named(e.child())
        if c == "EqualTo":
            l, r = e.children().apply(0), e.children().apply(1)
            return (attr_named(l) and _cls(r) == "Literal") or (
                attr_named(r) and _cls(l) == "Literal"
            )
        if c == "Or":
            return is_probe(e.children().apply(0)) and is_probe(e.children().apply(1))
        return False

    # the probe may ride a conjunction (Catalyst adds isnotnull etc.)
    def walk(e) -> bool:
        if is_probe(e):
            return True
        if _cls(e) == "And":
            return walk(e.children().apply(0)) or walk(e.children().apply(1))
        return False

    return walk(jexpr)


def _leaf_columns_below(jnode) -> set:
    """Union of output attribute names of every leaf relation in the
    subtree — tells a cluster-probe Filter's scan apart (codes table
    carries ``pq_codes``; the raw layout does not)."""
    out = set()
    stack = [jnode]
    while stack:
        n = stack.pop()
        ch = n.children()
        if ch.size() == 0:
            try:
                attrs = n.output()
                for i in range(attrs.size()):
                    out.add(attrs.apply(i).name())
            except Exception:
                pass
        else:
            stack.extend(ch.apply(i) for i in range(ch.size()))
    return out


def vector_route(df: DataFrame) -> str:
    """Which physical route a (possibly intercepted) top-k DataFrame took:

    - ``"ivf-pq"`` — the codes-sidecar route (cluster prune × ADC scan ×
      exact re-rank): a cluster-probe Filter over a relation carrying the
      ``pq_codes`` column;
    - ``"ivf"`` — the raw IVF probe (cluster-probe Filter over the raw
      indexed layout);
    - ``"brute-force"`` — no interception artifacts; the original plan.

    Implemented as a py4j TREE WALK over the optimized logical plan (the
    same transport the interceptor itself uses) — matching the probe's
    ``IN``/``InSet``/OR-of-equals predicate shape on the cluster column,
    never plan-text strings (a rendered-format change across Spark
    versions, or a column NAME appearing inside an unrelated string
    literal, cannot flip the answer). Never executes anything. Pair with
    ``pq_vector_spark.last_decline_reason()`` when the answer is
    brute-force to learn WHICH guard declined (at 100 TB a silent
    fall-through to brute force is a 20× cost surprise).
    """
    from pq_vector_spark.index.build import CLUSTER_COL
    from pq_vector_spark.index.pq import CODES_COL

    try:
        plan = df._jdf.queryExecution().optimizedPlan()
    except Exception:
        return "brute-force"
    saw_ivf = False
    stack = [plan]
    while stack:
        node = stack.pop()
        try:
            if _cls(node) == "Filter" and _expr_has_cluster_probe(
                node.condition(), CLUSTER_COL
            ):
                if CODES_COL in _leaf_columns_below(node):
                    return "ivf-pq"
                saw_ivf = True
            ch = node.children()
            stack.extend(ch.apply(i) for i in range(ch.size()))
            # subquery-holding nodes (joins with broadcast subtrees) are
            # covered by children(); CTE/Subquery wrappers too
        except Exception:
            continue
    return "ivf" if saw_ivf else "brute-force"


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
