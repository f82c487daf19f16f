"""Join operators (SURVEY.md §2.3 J1-J7).

The reference's joins are all daily-key equi-joins: a FULL OUTER chain
with a COALESCE-accumulated key building the gold rollup
(ref models/gold/gold_daily_rollup.sql:91-153) and next-day self-joins
(ref models/analytics/sleep_performance_prediction.sql:25-33).

Scale notes: Spark's named-column join (``on=[key]``) coalesces the
key exactly like the reference's manual ``COALESCE(r.date, s.date,
...)`` chain. Small sides should be broadcast — callers pass
``broadcast_small=True`` or wrap dims in ``F.broadcast`` themselves;
fact-fact joins shuffle on the key and AQE handles skew.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def coalesce_outer_chain(
    dfs: Sequence[DataFrame],
    on: Sequence[str],
    how: str = "full_outer",
) -> DataFrame:
    """Chain-join N frames on shared key columns, coalescing the key.

    Replacement for the reference's manual key accumulation
    (gold_daily_rollup.sql:145-153): Spark's named-column join already
    emits a single coalesced key column per join, so chaining it is
    semantically identical — including rows present in only one source
    (SURVEY.md §7.4.2).
    """
    return reduce(lambda a, b: a.join(b, on=list(on), how=how), dfs)


def next_day_self_join(
    df: DataFrame,
    date_col: str,
    days: int = 1,
    left_alias: str = "a",
    right_alias: str = "b",
) -> DataFrame:
    """As-of(+N days) self-join: pair each row with the row ``days``
    later (J3). Prefer :func:`bio_lakehouse_spark.operators.windows
    .lead_col` when both sides are the same table — the reference
    itself switched to LEAD (workout_recovery_windows.sql:25-29); this
    exists for the cases where the two sides differ."""
    left = df.alias(left_alias)
    right = df.alias(right_alias)
    cond = F.col(f"{right_alias}.{date_col}") == F.date_add(
        F.col(f"{left_alias}.{date_col}"), days
    )
    return left.join(right, cond, "inner")


def join_enrich(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Left-enrichment join (J5) with the dim broadcast by default —
    at 100 TB the fact side never shuffles for a small dim."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(d, on=list(on), how=how)


def anti(df: DataFrame, other: DataFrame, on: Sequence[str]) -> DataFrame:
    """``LEFT ANTI`` — rows of ``df`` with no match (J6)."""
    return df.join(other, on=list(on), how="left_anti")


def semi(df: DataFrame, other: DataFrame, on: Sequence[str]) -> DataFrame:
    """``LEFT SEMI`` — rows of ``df`` with at least one match (J6)."""
    return df.join(other, on=list(on), how="left_semi")
