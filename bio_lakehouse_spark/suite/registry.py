"""Query registry: name → (Spark callable, DuckDB oracle SQL).

Contract (see repo ``__spark_entry__.py``): each Spark callable takes
``(spark, sf_dir)`` and returns a DataFrame; the oracle is ANSI SQL
DuckDB runs against the same parquet registered as views. The driver
compares row count + schema + an order-insensitive value hash, sorting
columns by name — so BOTH sides alias every computed column to the
same name, and every float column is rounded (6 decimals) on both
sides so summation-order differences between engines can't flip the
hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    survey: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None = None, survey: tuple[str, ...] = ()
):
    """Decorator registering a suite query."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(
            fn=fn, oracle=oracle, survey=survey, doc=(fn.__doc__ or "").strip()
        )
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Parquet scan of a driver test table (S7).

    ``events.ts`` is TIMESTAMP(NANOS) parquet, which Spark's reader
    rejects; with ``spark.sql.legacy.parquet.nanosAsLong`` it arrives
    as epoch-nanos long and is converted to a microsecond timestamp
    here (truncation — exactly what DuckDB does natively). The conf
    is set here at runtime so externally-created sessions (the
    driver's) work too.
    """
    # UTC pins CAST(ts AS DATE)/date_trunc to the oracle's (naive)
    # semantics regardless of who built the session.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if table == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    if table == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        # integer `div`, not `/`: float division loses µs precision at
        # 1e18-scale nanos.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
