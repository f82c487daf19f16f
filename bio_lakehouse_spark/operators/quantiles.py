"""Mergeable fixed-bin histogram quantile sketch (A13 scale path).

The reference computes quantiles exactly (pandas ``quantile``,
insights_engine/insights/correlation_discovery.py:473) — fine at 2k
rows, impossible at 100 TB. The production-scale alternatives are
rank sketches (t-digest/KLL, whose compaction is randomized and
engine-private) or a fixed-bin histogram. We ship the histogram as
the ORACLE-VERIFIABLE scale path: every step (bin assignment, count,
cumulative rank walk, linear interpolation) is deterministic and
ANSI-SQL-expressible, so DuckDB reproduces the estimate bit-for-bit
— same property the HLL/KMV sketches in this repo exploit.

Scale shape: pass 1 is a per-group 3-scalar aggregate (min/max/
count); pass 2 groups rows into ≤ ``nbins`` cells per group, so only
``nbins`` counts per group cross the exchange regardless of input
size — the sketch IS the shuffle bound. The quantile walk then runs
on ≤ ``nbins`` rows per group (a window over a fixed-size frame —
its per-partition sort is a constant, not a function of data size).
Error is bounded by one bin width of the group's value range;
callers pick ``nbins`` for the error they need. Bins merge trivially
(cellwise add), so the same layout serves partial/merge aggregation
and incremental maintenance.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def histogram_quantiles(
    df: DataFrame,
    col: str | Column,
    probs: Sequence[float],
    nbins: int = 256,
    by: Sequence[str] = (),
) -> DataFrame:
    """Estimate quantiles of ``col`` from an equi-width histogram.

    Returns one row per (group ×) probability: ``(*by, prob, est)``.
    Assumes the column has at least one non-null value per group.
    A degenerate range (max == min) collapses to one bin and every
    probability estimates the constant; ``prob=0.0`` returns the
    first non-empty bin's left edge (both were silent holes before
    r10: zero-width division null-binned every row, and the
    containing-bin filter ``cum - cnt < 0`` can never hold).
    """
    c = F.col(col) if isinstance(col, str) else col
    by = list(by)
    stats = df.groupBy(*by).agg(
        F.min(c).alias("mn"), F.max(c).alias("mx"), F.count(c).alias("n")
    )
    width = (F.col("mx") - F.col("mn")) / F.lit(float(nbins))
    # Nulls must not reach the histogram: n = count(c) already
    # excludes them, so a nulls-first bin would inflate `cum` and
    # bias every quantile low (and the degenerate-range otherwise(0)
    # branch would route them into bin 0). Same isNotNull discipline
    # as the r10 hll_registers/kmv_sketch fix.
    nonnull = df.filter(c.isNotNull())
    binned = (
        nonnull.select(*by, c.alias("_v")).join(F.broadcast(stats), on=by)
        if by
        else nonnull.select(c.alias("_v")).crossJoin(F.broadcast(stats))
    )
    # mn/mx/n ride along as (group-constant) grouping keys so the
    # stats pass isn't recomputed when the quantile walk needs them
    # later — two scans total: one for stats, one for binning.
    hist = (
        binned.select(
            *by,
            F.when(
                F.col("mx") > F.col("mn"),
                F.least(
                    F.floor((F.col("_v") - F.col("mn")) / width),
                    F.lit(nbins - 1),
                ),
            )
            .otherwise(F.lit(0))
            .alias("bin"),
            "mn",
            "mx",
            "n",
        )
        .groupBy(*by, "bin", "mn", "mx", "n")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # ≤ nbins rows per group from here on — the window sorts a
    # constant-size frame by construction, not a scale hazard.
    cum = hist.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.partitionBy(*by)
            .orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    probs_df = F.broadcast(
        df.sparkSession.createDataFrame(
            [(float(p),) for p in probs], "prob double"
        )
    )
    target = F.col("prob") * F.col("n")
    # The containing bin: first cum ≥ target while the previous
    # cumulative (cum − cnt) is still short of it. prob=0 (target=0)
    # satisfies no `cum−cnt < 0` anywhere — route it to the FIRST
    # non-empty bin (the only one with cum == cnt; empty bins never
    # appear in `hist`), where the interpolation term is 0 and the
    # estimate is that bin's left edge.
    return (
        cum.crossJoin(probs_df)
        .filter(
            (F.col("cum") >= target)
            & (
                ((F.col("cum") - F.col("cnt")) < target)
                | ((target <= 0) & (F.col("cum") == F.col("cnt")))
            )
        )
        .select(
            *by,
            "prob",
            F.round(
                F.col("mn")
                + width
                * (
                    F.col("bin")
                    + (target - (F.col("cum") - F.col("cnt"))) / F.col("cnt")
                ),
                6,
            ).alias("est"),
        )
    )
