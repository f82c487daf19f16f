"""Continuous aggregate (merge-on-read rollup) — the Timescale
continuous-aggregate / lambda-architecture pattern on plain parquet.

A daily rollup table is materialized once for SEALED days (older than
the watermark); queries read the materialized slice and compute only
the fresh tail (days >= watermark) from raw events, unioned at read
time. Materialized cost is amortized across queries; the per-query
raw scan is bounded by the tail window regardless of history size —
at 100 TB the tail is the only part that ever touches raw data, and
the sealed slice is a partition-pruned parquet read.

The reference's daily gold rebuild (glue/dbt_gold_refresh.py:64-99
drops and recreates everything daily) is the degenerate form of this:
watermark = -infinity, rebuild everything. `sources/sinks.
refresh_partitions` is the write-side increment; this module is the
read-side merge.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def materialize_sealed_rollup(
    events: DataFrame,
    rollup_path: str,
    agg: Callable[[DataFrame], DataFrame],
    day_col: str,
    watermark_day: str,
) -> None:
    """Write the rollup of all days strictly before ``watermark_day``,
    partitioned by day so later reads prune."""
    sealed = agg(events.filter(F.col(day_col) < F.lit(watermark_day)))
    sealed.write.mode("overwrite").partitionBy(day_col).parquet(
        rollup_path
    )


def continuous_daily_rollup(
    spark: SparkSession,
    events: DataFrame,
    rollup_path: str,
    agg: Callable[[DataFrame], DataFrame],
    day_col: str,
    watermark_day: str,
) -> DataFrame:
    """Merge-on-read: materialized sealed days ∪ freshly-computed
    tail. The union is by name (the materialized table's partition
    column moves to the end on read); both sides share the aggregate
    definition so the result is IDENTICAL to a full recompute —
    asserted by the unit test."""
    sealed = spark.read.parquet(rollup_path).filter(
        F.col(day_col) < F.lit(watermark_day)
    )
    fresh = agg(events.filter(F.col(day_col) >= F.lit(watermark_day)))
    return sealed.unionByName(fresh)
