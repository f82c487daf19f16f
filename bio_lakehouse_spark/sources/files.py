"""File-selection helpers (S5/S6) and recursive scans.

- ``latest_file``: the reference's Peloton source ships FULL exports,
  so only the newest file should ever be read (superseding older ones)
  — ref glue/peloton_normalizer.py:55-72 (sort by LastModified).
- ``recursive_csv``: recursiveFileLookup with partition inference off
  so directory names can never shadow data columns — ref
  glue/healthkit_normalizer.py:50-59 and the partition-inference-off
  discipline at oura_normalizer.py:31-33.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def list_files(root: str | Path, pattern: str = "*") -> list[str]:
    """Recursive deterministic listing (sorted by path)."""
    return sorted(str(p) for p in Path(root).rglob(pattern) if p.is_file())


def latest_file(root: str | Path, pattern: str = "*") -> str:
    """Newest matching file by (mtime, path) — the full-export-
    supersedes-history rule (S6). Path tie-break keeps it
    deterministic when mtimes collide."""
    files = [Path(p) for p in list_files(root, pattern)]
    if not files:
        raise FileNotFoundError(f"no files matching {pattern} under {root}")
    return str(max(files, key=lambda p: (p.stat().st_mtime, str(p))))


def recursive_csv(
    spark: SparkSession,
    root: str | Path,
    schema: StructType | None = None,
    sep: str = ",",
) -> DataFrame:
    """Recursive CSV scan (S5): recursiveFileLookup disables partition
    discovery entirely, so a path like ``.../day=3/x.csv`` cannot
    inject a ``day`` column that shadows the data's own."""
    reader = (
        spark.read.option("header", "true")
        .option("sep", sep)
        .option("recursiveFileLookup", "true")
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "false")
    return reader.csv(str(root))
