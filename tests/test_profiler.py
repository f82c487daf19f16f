"""profile_execution reads real SQL metrics; explosion_points flags
fan-out operators and stays quiet on reducing plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from bio_lakehouse_spark.engine.profiler import (
    explosion_points,
    profile_execution,
)


def test_profile_reads_scan_and_agg_rows(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_orderstatus")
        .count()
    )
    prof = profile_execution(df)
    by_op = {}
    for m in prof:
        if m.rows is not None:
            by_op.setdefault(m.operator.split()[0], []).append(m.rows)
    scan_rows = max(by_op.get("Scan", [0]))
    filt_rows = max(by_op.get("Filter", [0]))
    agg_rows = min(by_op.get("HashAggregate", [10**9]))
    assert scan_rows > 0
    assert 0 < filt_rows < scan_rows  # predicate really reduced rows
    assert agg_rows <= 3  # few order statuses
    # reducing plan → no blow-up findings
    assert explosion_points(prof) == []


def test_explosion_points_flag_explode(spark):
    df = spark.range(100).select(
        F.explode(F.sequence(F.lit(1), F.lit(50))).alias("x")
    )
    prof = profile_execution(df)
    findings = explosion_points(prof, factor=4.0)
    assert findings, [ (m.operator, m.rows) for m in prof ]
    assert any("blow-up" in f for f in findings)
