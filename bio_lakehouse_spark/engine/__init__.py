"""Query-engine facade: SQL execution with cache, gate, log, schema
introspection (SURVEY.md §2.1 S8/S9/S15, §2.2 P9)."""

from bio_lakehouse_spark.engine.facade import QueryEngine, UnsafeSqlError

__all__ = ["QueryEngine", "UnsafeSqlError"]
