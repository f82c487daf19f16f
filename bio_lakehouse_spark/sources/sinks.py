"""Sinks (S12-S15): partitioned parquet, CTAS tables, append-only logs.

The reference's Silver writers are ``write.mode("overwrite")
.partitionBy("year","month").parquet(...)`` (oura_normalizer.py:295);
Gold is drop-and-CTAS through Athena (dbt_gold_refresh.py:64-99). Here
both are native Spark writes; the audit/query logs (DynamoDB/SQLite in
the reference) become append-only parquet tables.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """S12: Hive-layout partitioned parquet overwrite. Partition
    columns become directories (``year=.../month=...``) so date-
    filtered reads prune files without touching footers."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Scan a partitioned dataset written by the sink above. Partition
    values stay strings (partitionColumnTypeInference is off in the
    session factory — same discipline as the reference)."""
    return spark.read.parquet(path)


def create_table_as(
    spark: SparkSession,
    name: str,
    select: DataFrame | str,
    path: str,
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """S13: CTAS — materialize a query as a parquet-backed catalog
    table at an explicit location, replacing any previous version
    (the reference's DROP + clear-prefix + CTAS collapses to one
    atomic-enough overwrite; a real deployment would use Delta/Iceberg
    for true ACID replace)."""
    df = spark.sql(select) if isinstance(select, str) else select
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    writer = df.write.mode("overwrite").option("path", path).format("parquet")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.saveAsTable(name)
    return spark.table(name)


def append_log(
    spark: SparkSession, path: str, rows: list[dict], schema: str
) -> None:
    """S14/S15: append-only log table (ingestion audit / query log).
    One small parquet file per append — compaction is a maintenance
    job at scale, exactly like any streaming sink."""
    spark.createDataFrame(rows, schema=schema).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def refresh_partitions(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
) -> None:
    """Incremental partition refresh — the scaling fix the reference
    flags for its full-rebuild gold (ref README.md:627: "incremental
    merge noted as the scaling fix"; dbt_gold_refresh.py rebuilds all
    3 tables daily).

    With ``partitionOverwriteMode=dynamic``, an overwrite replaces
    ONLY the partitions present in ``df`` — recompute yesterday's
    (year, month) slice and write it, leaving history untouched. On
    Delta/Iceberg this becomes a true MERGE; on plain parquet, dynamic
    partition overwrite is the transactional-enough equivalent (each
    partition swap is atomic at the directory level)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def write_bucketed_table(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    bucket_col: str,
    n_buckets: int,
    path: str,
    sort_col: str | None = None,
) -> DataFrame:
    """Bucketed catalog table: rows hash-distributed into
    ``n_buckets`` files by ``bucket_col`` at WRITE time. Two tables
    bucketed the same way join with ZERO exchange — the shuffle was
    paid once at write and amortizes over every subsequent join
    (SURVEY §7: "bucketing for co-located joins"). The scale recipe
    for fact-fact joins repeated across a pipeline."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    writer = (
        df.write.mode("overwrite")
        .option("path", path)
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(name)
    return spark.table(name)
