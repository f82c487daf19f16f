"""Execution profiler: per-operator output-row counts from Spark's
own SQL metrics, plus blow-up detection — the "where does my data
explode" diagnostic that pairs with `plan_lint` (pre-flight) as the
post-flight check.

At 100 TB the difference between a healthy and a doomed job is
usually ONE operator whose output cardinality is a multiple of its
input (an under-constrained join, an explode over an unexpectedly
long array, a skew-amplified window). The Spark UI shows this per
stage; `profile_execution` surfaces it programmatically so a pipeline
can assert on it in CI or after a canary run at small SF — the same
numbers, no UI scraping.

Implementation notes (the parts that are easy to get wrong):
* The plan must be executed THROUGH the profiled QueryExecution —
  a sink write executes a cloned plan and leaves these nodes' metrics
  at zero.
* Under AQE the executed plan materializes as nested QueryStage
  wrappers whose child hangs off ``.plan()``, not ``.children()``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class OpMetric:
    depth: int
    operator: str
    rows: int | None  # None: operator publishes no numOutputRows


def _num_output_rows(node) -> int | None:
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        if kv._1() == "numOutputRows":
            return kv._2().value()
    return None


def _children(node):
    if "QueryStage" in node.nodeName():
        return [node.plan()]
    ch = node.children()
    return [ch.apply(i) for i in range(ch.length())]


def profile_execution(df: DataFrame) -> list[OpMetric]:
    """Execute ``df``'s plan and return the operator tree (root
    first, depth-annotated) with each operator's numOutputRows.
    Executes via the DataFrame's own QueryExecution so the metrics
    land on the inspected nodes; the rows never reach the driver
    (RDD-level count, no collect)."""
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan()
    plan.execute().count()
    root = (
        plan.executedPlan()
        if plan.nodeName().startswith("AdaptiveSparkPlan")
        else plan
    )
    out: list[OpMetric] = []

    def walk(node, depth):
        out.append(OpMetric(depth, node.nodeName(), _num_output_rows(node)))
        for c in _children(node):
            walk(c, depth + 1)

    walk(root, 0)
    return out


def explosion_points(
    profile: list[OpMetric], factor: float = 4.0
) -> list[str]:
    """Flag operators whose output is ≥ ``factor`` × the rows of
    their nearest metric-publishing descendant — the join/explode
    blow-up signature. Returns human-readable findings."""
    findings: list[str] = []
    for i, op in enumerate(profile):
        if op.rows is None:
            continue
        # nearest deeper node with a metric = this operator's input side
        for nxt in profile[i + 1:]:
            if nxt.depth <= op.depth:
                break
            if nxt.rows is not None:
                if nxt.rows > 0 and op.rows >= factor * nxt.rows:
                    findings.append(
                        f"{op.operator}: {op.rows} rows out from "
                        f"{nxt.rows} in ({op.rows / nxt.rows:.1f}x) — "
                        "join fan-out / explode blow-up?"
                    )
                break
    return findings
