"""Aggregation operators (SURVEY.md §2.4 A1-A13).

Daily/weekly rollups, conditional aggregates, last-of-day dedupe
aggregation, correlation aggregates, exact percentiles. All built-in
aggregates → map-side partial aggregation for free; `collect_set`
results are always ``array_sort``-ed before joining because set order
is nondeterministic across partitions (SURVEY.md §7.4.5).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sorted_set_join(col: str | Column, sep: str = ",") -> Column:
    """``array_join(array_sort(collect_set(x)), sep)`` — the reference's
    comma-joined category sets (ref stg_peloton_workouts.sql:9-11,
    glue/mfp_normalizer.py:129), sorted for deterministic output."""
    return F.array_join(F.array_sort(F.collect_set(col)), sep)


def last_of_group(col: str | Column) -> Column:
    """``F.last(x, ignorenulls=True)`` aggregate — last reading of the
    day wins (A3, ref glue/readiness_aggregator_ARCHIVED.py:113-158).
    Order-sensitive: callers must pre-sort within groups or use the
    ROW_NUMBER variant (windows.dedupe_latest) for determinism."""
    return F.last(col, ignorenulls=True)


def conditional_avg(cond: Column, value: Column | str) -> Column:
    """``AVG(CASE WHEN cond THEN value END)`` (A5)."""
    v = F.col(value) if isinstance(value, str) else value
    return F.avg(F.when(cond, v))


def conditional_count(cond: Column) -> Column:
    """``COUNT(CASE WHEN cond THEN 1 END)`` (A5)."""
    return F.count(F.when(cond, F.lit(1)))


def percentile_exact(col: str | Column, p: float) -> Column:
    """Exact linear-interpolation percentile (Presto
    ``PERCENTILE_CONT`` / pandas ``quantile``, A13). Exact beats
    ``percentile_approx`` for oracle parity; swap to approx at the
    100 TB tier where a t-digest is the right trade."""
    c = F.col(col) if isinstance(col, str) else col
    return F.percentile(c, F.lit(p))


def grouped_descriptive_stats(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Per-group mean/median/std/n (A10, ref insights/workout_recovery
    .py:86-97) — median is the exact 0.5 percentile."""
    return df.groupBy(*group_cols).agg(
        F.avg(value_col).alias("mean"),
        percentile_exact(value_col, 0.5).alias("median"),
        F.stddev(value_col).alias("std"),
        F.count(value_col).alias("n"),
    )


def dense_ids(
    df,
    order_cols,
    id_name: str = "dense_id",
    num_partitions: int | None = None,
    assume_unique: bool = False,
):
    """Contiguous 0-based ids in global ``order_cols`` order WITHOUT a
    single-partition window — the standard partition-offset technique
    for numbering a corpus at scale.

    A bare ``row_number() OVER (ORDER BY ...)`` collapses all data
    into ONE task; this instead (1) range-partitions by the order
    key, (2) ranks within each partition, (3) computes per-partition
    row counts — a |partitions|-row frame — and broadcasts their
    running offsets back: id = partition_offset + local_rank − 1.

    The ids equal the global rank as long as ``order_cols`` is a
    TOTAL order (ties would make ranks depend on the sampled range
    boundaries — callers must include a tiebreaker column; this is
    asserted cheaply by requiring key uniqueness within a partition).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    cols = list(order_cols)
    parted = (
        df.repartitionByRange(num_partitions, *cols)
        if num_partitions
        else df.repartitionByRange(*cols)
    )
    with_pid = parted.withColumn("__pid", F.spark_partition_id())
    wlocal = Window.partitionBy("__pid").orderBy(*cols)
    ranked = with_pid.withColumn("__rk", F.row_number().over(wlocal))
    # uniqueness guard: a duplicated total-order key makes global
    # ranks boundary-dependent — fail loudly instead. The guard is a
    # full extra aggregation job over the input; callers whose key
    # PROVABLY ends in a primary key (e.g. ntile_rank's
    # (total_value, user_id)) pass assume_unique=True to skip it at
    # scale.
    if not assume_unique:
        dup = (
            ranked.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("__c"))
            .filter(F.col("__c") > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise ValueError(
                "dense_ids: order_cols is not a total order (duplicate"
                " keys); add a tiebreaker column"
            )
    counts = ranked.groupBy("__pid").agg(F.max("__rk").alias("__n"))
    woff = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__n").over(woff), F.lit(0))
    ).select("__pid", "__off")
    return (
        ranked.join(F.broadcast(offsets), "__pid")
        .withColumn(id_name, (F.col("__off") + F.col("__rk") - 1))
        .drop("__pid", "__rk", "__off")
    )
