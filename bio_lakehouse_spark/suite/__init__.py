"""Driver-facing query suite.

``REGISTRY`` maps query name → :class:`QuerySpec` (Spark callable +
DuckDB oracle SQL + SURVEY.md §2 operator ids). ``__spark_entry__``
re-exports it; importing this package pulls in every query module so
the registry is fully populated.
"""

from bio_lakehouse_spark.suite.registry import REGISTRY, QuerySpec, load

# Import for registration side effects — order is the SURVEY.md §2 order.
from bio_lakehouse_spark.suite import relational  # noqa: F401
from bio_lakehouse_spark.suite import tpch_queries  # noqa: F401
from bio_lakehouse_spark.suite import window_queries  # noqa: F401
from bio_lakehouse_spark.suite import scalar_queries  # noqa: F401
from bio_lakehouse_spark.suite import stats_queries  # noqa: F401
from bio_lakehouse_spark.suite import text_queries  # noqa: F401
from bio_lakehouse_spark.suite import similarity_queries  # noqa: F401
from bio_lakehouse_spark.suite import sketch_queries  # noqa: F401
from bio_lakehouse_spark.suite import quantile_queries  # noqa: F401
from bio_lakehouse_spark.suite import sampling_queries  # noqa: F401
from bio_lakehouse_spark.suite import pipeline_queries  # noqa: F401
from bio_lakehouse_spark.suite import hypothesis_queries  # noqa: F401
from bio_lakehouse_spark.suite import graph_queries  # noqa: F401

# after hypothesis_queries: reuses its registered batch oracle
from bio_lakehouse_spark.suite import streaming_queries  # noqa: F401

__all__ = ["REGISTRY", "QuerySpec", "load"]
