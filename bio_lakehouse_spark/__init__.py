"""bio_lakehouse_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference lakehouse (NomadNome/bio-lakehouse,
surveyed in SURVEY.md) as an idiomatic Spark DataFrame/SQL engine,
extended with the operators a large-scale training-data pipeline
needs (dedup, similarity search, text analysis, multimodal columns).

Layout
------
- ``session``    — SparkSession factory tuned for AQE + local[32] tests
- ``functions``  — scalar expression helpers (safe dates, banding, maps)
- ``operators``  — relational/window/stat operators (SURVEY.md §2)
- ``io``         — sources and sinks (CSV header-group scan, JSON
  flatten, partitioned parquet, logs, result cache)
- ``silver``     — the four bronze→silver normalizers
- ``gold``       — gold_daily_rollup / feature table / recovery windows
- ``views``      — the analytics views as Spark SQL
- ``sql``        — query facade (cache + safety gate + schema DDL)
- ``streaming``  — Structured Streaming ingest and stateful ops
- ``suite``      — the driver-facing query registry with DuckDB oracles
"""

__version__ = "0.1.0"
