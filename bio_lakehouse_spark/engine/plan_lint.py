"""Plan linter: the suite's physical-plan hygiene rules
(tests/test_plan_quality.py) packaged as a reusable pre-flight check
a pipeline can run on any DataFrame BEFORE paying for the job.

At 100 TB a bad plan isn't slow, it's unrunnable — a cartesian or a
row-at-a-time Python UDF on the fact table is the difference between
minutes and never finishing. CI plan tests catch regressions in OUR
queries; `lint_plan` gives the same guardrails to user-composed ones:

    problems = lint_plan(df)
    if any(p.startswith("ERROR") for p in problems): raise ...

Checks (string-level over the executed plan, by design — it works on
any Spark without private APIs):
  ERROR  CartesianProduct              (shuffle cartesian: never OK)
  ERROR  BroadcastNestedLoopJoin       (unless allow_bnlj — legit only
                                        for bounded broadcast scorers)
  ERROR  BatchEvalPython               (row-at-a-time Python UDF; use
                                        Arrow/pandas UDFs or built-ins)
  WARN   filter present but no pushed  (a Filter node above a parquet
         filters on a parquet scan      scan whose PushedFilters is
                                        empty — opaque predicate?)
  WARN   exchange count > threshold    (shuffle-heavy plan; check for
                                        missed broadcast/bucketing)
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def _formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def lint_plan(
    df: DataFrame,
    allow_bnlj: bool = False,
    max_exchanges: int = 8,
) -> list[str]:
    """Return a list of "ERROR: ..."/"WARN: ..." strings (empty =
    clean). Pure plan inspection — nothing is executed."""
    plan = _formatted_plan(df)
    problems: list[str] = []

    if "CartesianProduct" in plan:
        problems.append(
            "ERROR: CartesianProduct — shuffle cartesian join; add an "
            "equi-key or broadcast a bounded side"
        )
    if "BroadcastNestedLoopJoin" in plan and not allow_bnlj:
        problems.append(
            "ERROR: BroadcastNestedLoopJoin — non-equi join against a "
            "broadcast side; legitimate only for bounded scorer/one-row-"
            "stat joins (pass allow_bnlj=True after reviewing)"
        )
    if "BatchEvalPython" in plan:
        problems.append(
            "ERROR: BatchEvalPython — row-at-a-time Python UDF in the "
            "plan; use pyspark.sql.functions or an Arrow pandas UDF"
        )

    # Formatted plans print PushedFilters only when something was
    # pushed; a filtering plan over parquet with NO non-empty
    # PushedFilters anywhere means every predicate stayed above the
    # scan (opaque UDF/cast-wrapped key) and the scan reads everything.
    if "Scan parquet" in plan and "Filter" in plan:
        if not re.search(r"PushedFilters: \[[^\]]", plan):
            problems.append(
                "WARN: plan filters above a parquet scan but no filter "
                "was pushed down (PushedFilters empty/absent) — a "
                "predicate may be hidden behind an opaque expression "
                "(UDF/cast) and the scan reads everything"
            )

    n_exchanges = plan.count("Exchange")
    if n_exchanges > max_exchanges:
        problems.append(
            f"WARN: {n_exchanges} Exchange operators (> {max_exchanges})"
            " — shuffle-heavy plan; look for missed broadcasts, repeated"
            " groupings, or an uncheckpointed reused subplan"
        )
    return problems
