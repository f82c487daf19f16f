"""Pluggable table format behind the sink API — Delta Lake when the
runtime has it, the repo's versioned-parquet layer otherwise.

SURVEY §1.4/§7.1 names "Delta or Iceberg" as the storage design
decision; the reference's gold lifecycle is drop-and-CTAS through
Athena (ref glue/dbt_gold_refresh.py:64-99). This module keeps ONE
call-site API for the lakehouse write patterns (snapshot commit /
time travel / MERGE / schema-evolution append / compaction / vacuum)
and swaps the implementation:

* ``DeltaBackend`` — real Delta Lake (ACID log, snapshot isolation,
  S3-safe commits). Selected automatically when the ``delta-spark``
  package AND its JVM classes are on the session. This is what every
  100 TB deployment should run: the rename-CAS fallback is documented
  unsafe on S3 (SCALE.md §5).
* ``ParquetBackend`` — the repo's versioned-parquet layer
  (``sources.sinks``: rename-CAS snapshots, WAP merge, per-partition
  compaction). Functionally equivalent on a POSIX filesystem; the
  default in this sandbox, where no Delta jars exist.

The backends are behavior-compatible on purpose: a test suite written
against ``resolve_backend(spark)`` passes under either (the Delta
half auto-skips where delta-spark is absent — tests/test_table_format
marks them ``importorskip``).
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


def delta_available(spark: SparkSession) -> bool:
    """True iff the delta-spark Python package is importable AND its
    JVM side is loaded in this session (both are required — the
    pip package without the jar fails at write time, not import)."""
    try:
        import delta  # noqa: F401
    except ImportError:
        return False
    try:
        jvm = spark._jvm  # noqa: SLF001 — capability probe
        jvm.java.lang.Class.forName("io.delta.tables.DeltaTable")
        return True
    except Exception:  # noqa: BLE001 — any JVM probe failure → absent
        return False


@dataclass
class CommitInfo:
    version: int
    rows: int


class ParquetBackend:
    """Versioned-parquet implementation — delegates to sources.sinks.

    name == "parquet"; snapshot versions are 1-based (the rename-CAS
    layer claims v1 first)."""

    name = "parquet"

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark

    def write_snapshot(self, df: DataFrame, path: str) -> CommitInfo:
        from bio_lakehouse_spark.sources.sinks import versioned_write

        out = versioned_write(df, path)
        return CommitInfo(version=out["version"], rows=out["rows"])

    def read(self, path: str, version: int | None = None) -> DataFrame:
        from bio_lakehouse_spark.sources.sinks import read_versioned

        return read_versioned(self.spark, path, version)

    def merge(
        self,
        path: str,
        updates: DataFrame,
        key_cols: Sequence[str],
        partition_cols: Sequence[str] = (),
    ) -> None:
        from bio_lakehouse_spark.sources.sinks import merge_upsert

        merge_upsert(self.spark, path, updates, key_cols, partition_cols)

    def read_merged(self, path: str) -> DataFrame:
        return self.spark.read.parquet(path)

    def append_evolved(self, path: str, df: DataFrame) -> None:
        from bio_lakehouse_spark.sources.sinks import (
            append_with_schema_evolution,
        )

        append_with_schema_evolution(self.spark, path, df)

    def read_evolved(self, path: str) -> DataFrame:
        from bio_lakehouse_spark.sources.sinks import read_evolved

        return read_evolved(self.spark, path)

    def compact(
        self, path: str, partition_cols: Sequence[str],
        target_file_bytes: int = 128 * 1024 * 1024,
    ) -> int:
        """OPTIMIZE analog for the versioned-snapshot layout: rewrite
        the LATEST snapshot's files at target size as a NEW immutable
        version (same reader-visible contract as Delta's
        executeCompaction — data unchanged, file count reduced; like
        Delta, compaction lands as its own commit). Returns 1 if a
        compacted version was committed, 0 if already compact.
        ``partition_cols`` is unused here — snapshots in this backend
        are unpartitioned; hive-partitioned TABLES compact through
        sources.sinks.compact_partitions instead."""
        import math
        from pathlib import Path

        from bio_lakehouse_spark.sources.sinks import versioned_write

        root = Path(path)
        ptr = root / "_latest"
        if not ptr.exists():
            return 0
        vdir = root / f"v{int(ptr.read_text().strip())}"
        files = [
            f for f in vdir.iterdir()
            if f.name.endswith(".parquet")
            and not f.name.startswith(("_", "."))
        ]
        total = sum(f.stat().st_size for f in files)
        n_target = max(1, math.ceil(total / target_file_bytes))
        if len(files) <= n_target:
            return 0
        df = self.read(path).repartition(n_target)
        # versioned_write's stage step reads the source version fully
        # before any rename; versions are immutable → no read race.
        versioned_write(df, path)
        return 1

    def vacuum(self, path: str, keep_last: int = 2) -> list[int]:
        from bio_lakehouse_spark.sources.sinks import vacuum_versions

        return vacuum_versions(path, keep_last=keep_last)


class DeltaBackend:
    """Delta Lake implementation of the same surface.

    Every operation maps to the public delta-spark API (delta.io
    docs): snapshot commit = ``format("delta").mode("overwrite")``
    (one atomic log entry), time travel = ``versionAsOf``, merge =
    ``DeltaTable.merge().whenMatchedUpdateAll().whenNotMatchedInsertAll``,
    schema evolution = ``option("mergeSchema", "true")`` append,
    compaction = ``optimize().executeCompaction()``, vacuum =
    ``vacuum(retention)``. Delta versions are 0-based; ``versions()``
    normalizes what callers need."""

    name = "delta"

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark

    def _table(self, path: str):
        from delta.tables import DeltaTable

        return DeltaTable.forPath(self.spark, path)

    def write_snapshot(self, df: DataFrame, path: str) -> CommitInfo:
        df.write.format("delta").mode("overwrite").option(
            "overwriteSchema", "true"
        ).save(path)
        hist = (
            self._table(path)
            .history(1)
            .select("version")
            .collect()
        )
        version = int(hist[0]["version"])
        rows = self.spark.read.format("delta").load(path).count()
        return CommitInfo(version=version, rows=rows)

    def read(self, path: str, version: int | None = None) -> DataFrame:
        reader = self.spark.read.format("delta")
        if version is not None:
            reader = reader.option("versionAsOf", version)
        return reader.load(path)

    def merge(
        self,
        path: str,
        updates: DataFrame,
        key_cols: Sequence[str],
        partition_cols: Sequence[str] = (),
    ) -> None:
        from delta.tables import DeltaTable

        if not DeltaTable.isDeltaTable(self.spark, path):
            writer = updates.write.format("delta").mode("overwrite")
            if partition_cols:
                writer = writer.partitionBy(*partition_cols)
            writer.save(path)
            return
        cond = " AND ".join(f"t.{k} = u.{k}" for k in key_cols)
        (
            self._table(path)
            .alias("t")
            .merge(updates.alias("u"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )

    def read_merged(self, path: str) -> DataFrame:
        return self.spark.read.format("delta").load(path)

    def append_evolved(self, path: str, df: DataFrame) -> None:
        df.write.format("delta").mode("append").option(
            "mergeSchema", "true"
        ).save(path)

    def read_evolved(self, path: str) -> DataFrame:
        return self.spark.read.format("delta").load(path)

    def compact(
        self, path: str, partition_cols: Sequence[str],
        target_file_bytes: int = 128 * 1024 * 1024,
    ) -> int:
        self.spark.conf.set(
            "spark.databricks.delta.optimize.maxFileSize",
            str(target_file_bytes),
        )
        self._table(path).optimize().executeCompaction()
        return 1

    def vacuum(self, path: str, keep_last: int = 2) -> list[int]:
        # Delta retention is time-based, not count-based; 0-hour
        # retention requires the safety check off (test posture only —
        # production keeps the default 7 days).
        self.spark.conf.set(
            "spark.databricks.delta.retentionDurationCheck.enabled",
            "false",
        )
        self._table(path).vacuum(0)
        return []


def iceberg_available(spark: SparkSession) -> bool:
    """True iff an Iceberg catalog is configured on this session AND
    the Iceberg runtime jar is loaded. Iceberg (unlike Delta) is
    catalog-addressed — a path-only write needs a configured catalog
    (``spark.sql.catalog.<name>`` = SparkCatalog/SparkSessionCatalog),
    so both halves are required."""
    try:
        jvm = spark._jvm  # noqa: SLF001 — capability probe
        jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
    except Exception:  # noqa: BLE001 — any JVM probe failure → absent
        return False
    try:
        confs = spark.conf
        return any(
            k.startswith("spark.sql.catalog.")
            and "iceberg" in str(confs.get(k, "")).lower()
            for k in _catalog_conf_keys(spark)
        )
    except Exception:  # noqa: BLE001
        return False


def _catalog_conf_keys(spark: SparkSession) -> list[str]:
    try:
        jconf = spark.sparkContext.getConf().getAll()
        return [k for k, _ in jconf if k.startswith("spark.sql.catalog.")]
    except Exception:  # noqa: BLE001
        return []


class IcebergBackend:
    """Apache Iceberg implementation of the same surface, addressed
    through a configured catalog (``catalog`` arg, default
    "iceberg"): snapshot commit = ``writeTo(...).createOrReplace()``,
    time travel = ``VERSION AS OF`` (snapshot id), merge = SQL
    ``MERGE INTO``, schema evolution = ``mergeSchema`` append via
    ``writeTo(...).option("merge-schema","true").append()``,
    compaction = the ``rewrite_data_files`` procedure, vacuum =
    ``expire_snapshots``. Tables are named, not pathed — ``path``
    arguments are treated as table identifiers under the catalog
    (dots already qualified pass through)."""

    name = "iceberg"

    def __init__(self, spark: SparkSession, catalog: str = "iceberg"):
        self.spark = spark
        self.catalog = catalog

    def _ident(self, path: str) -> str:
        if "." in path:
            return path
        safe = "".join(ch if ch.isalnum() else "_" for ch in path.strip("/"))
        return f"{self.catalog}.db.t_{safe[-80:]}"

    def write_snapshot(self, df: DataFrame, path: str) -> CommitInfo:
        ident = self._ident(path)
        df.writeTo(ident).using("iceberg").createOrReplace()
        snap = self.spark.sql(
            f"SELECT snapshot_id FROM {ident}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).collect()[0][0]
        rows = self.spark.table(ident).count()
        return CommitInfo(version=int(snap), rows=rows)

    def read(self, path: str, version: int | None = None) -> DataFrame:
        ident = self._ident(path)
        if version is None:
            return self.spark.table(ident)
        return self.spark.read.option("snapshot-id", version).table(ident)

    def merge(
        self,
        path: str,
        updates: DataFrame,
        key_cols: Sequence[str],
        partition_cols: Sequence[str] = (),
    ) -> None:
        ident = self._ident(path)
        if not self.spark.catalog.tableExists(ident):
            w = updates.writeTo(ident).using("iceberg")
            if partition_cols:
                from pyspark.sql import functions as F

                w = w.partitionedBy(
                    *[F.col(c) for c in partition_cols]
                )
            w.create()
            return
        updates.createOrReplaceTempView("__merge_updates")
        cond = " AND ".join(f"t.{k} = u.{k}" for k in key_cols)
        self.spark.sql(
            f"MERGE INTO {ident} t USING __merge_updates u ON {cond} "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )

    def read_merged(self, path: str) -> DataFrame:
        return self.spark.table(self._ident(path))

    def append_evolved(self, path: str, df: DataFrame) -> None:
        ident = self._ident(path)
        if not self.spark.catalog.tableExists(ident):
            df.writeTo(ident).using("iceberg").create()
            return
        df.writeTo(ident).option("merge-schema", "true").append()

    def read_evolved(self, path: str) -> DataFrame:
        return self.spark.table(self._ident(path))

    def compact(
        self, path: str, partition_cols: Sequence[str],
        target_file_bytes: int = 128 * 1024 * 1024,
    ) -> int:
        self.spark.sql(
            f"CALL {self.catalog}.system.rewrite_data_files("
            f"table => '{self._ident(path)}', "
            f"options => map('target-file-size-bytes', "
            f"'{target_file_bytes}'))"
        )
        return 1

    def vacuum(self, path: str, keep_last: int = 2) -> list[int]:
        self.spark.sql(
            f"CALL {self.catalog}.system.expire_snapshots("
            f"table => '{self._ident(path)}', retain_last => {keep_last})"
        )
        return []


def resolve_backend(
    spark: SparkSession, prefer: str | None = None
) -> ParquetBackend | DeltaBackend | IcebergBackend:
    """Pick the table format: ``prefer`` ("delta" | "iceberg" |
    "parquet") overrides; default is Delta, then Iceberg, when
    available, else parquet."""
    if prefer == "parquet":
        return ParquetBackend(spark)
    if prefer == "delta":
        if not delta_available(spark):
            raise RuntimeError(
                "delta backend requested but delta-spark is not on "
                "this session"
            )
        return DeltaBackend(spark)
    if prefer == "iceberg":
        if not iceberg_available(spark):
            raise RuntimeError(
                "iceberg backend requested but no iceberg runtime/"
                "catalog on this session"
            )
        return IcebergBackend(spark)
    if delta_available(spark):
        return DeltaBackend(spark)
    if iceberg_available(spark):
        return IcebergBackend(spark)
    return ParquetBackend(spark)
