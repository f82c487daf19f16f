"""Date expression helpers.

The reference stores daily keys as VARCHAR in two formats
(``YYYY-MM-DD`` and ``YYYY-MM-DD HH:MM:SS``) and every robust query
wraps them in a tolerant parse
(ref: insights_engine/prompts/nl_to_sql_system.txt:8-11,
models/features/feature_readiness_daily.sql:81-84). ``safe_date`` is
that idiom as a single Spark expression; the Presto→Spark dialect
edges (``day_of_week`` Monday=1, ``date_trunc('week')``) live here too
so view ports stay mechanical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def safe_date(col: Column | str) -> Column:
    """Tolerant varchar→date: ``COALESCE(TRY(CAST(d AS date)),
    TRY(date_parse(d, '%Y-%m-%d %H:%i:%s')))`` re-expressed with Spark
    null-on-failure parsers. Returns NULL (never raises) on garbage.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd")).cast("date"),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd HH:mm:ss")).cast("date"),
    )


def day_of_week_iso(col: Column | str) -> Column:
    """ISO day-of-week, Monday=1..Sunday=7 (Presto ``day_of_week``).

    Spark's ``dayofweek`` is Sunday=1; the reference's feature table
    uses the ISO convention, so shift here once instead of in every
    port (SURVEY.md §7.4.4).
    """
    c = F.col(col) if isinstance(col, str) else col
    return ((F.dayofweek(c) + 5) % 7 + 1).cast("int")


def week_start(col: Column | str) -> Column:
    """Monday-based week truncation (Presto ``date_trunc('week', d)``).

    Spark's ``date_trunc('week', ...)`` is also Monday-based, so this is
    a thin named wrapper that returns DateType for group keys.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.date_trunc("week", c).cast("date")
