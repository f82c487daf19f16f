"""One-pass column profiling — the Deequ/dbt-tests-style data-quality
summary a pipeline runs on every ingest: per column, row count, null
count, exact distinct count, min/max, completeness.

Shape matters at 100 TB: ALL columns profile in ONE aggregation over
ONE scan (Catalyst fuses the per-column aggregates into a single
partial+final pair; the distinct counts add their expand internally
but still share the scan). The wide single-row result is then
unpivoted driver-cheaply with ``stack`` — never one query per column,
which would be N full scans.

Min/max are stringified so heterogeneous column types share one
output schema (the profile TABLE is the product). Numeric columns
with engine-dependent float formatting should be profiled via a
decimal cast by the caller.

Reference parity: the reference validates schemas structurally
(bio/schemas.validate_required_columns mirrors its
ingestion_trigger drift checks); value-level profiling is the
beyond-reference data-quality layer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: dict[str, Column] | list[str]
) -> DataFrame:
    """Profile the given columns (list of names, or {name: expr} to
    profile derived/casted expressions). Returns one row per column:
    (column_name, n_rows, n_nulls, n_distinct, min_val, max_val,
    completeness).

    Physical shape (r9): TWO column-pruned aggregation passes, not
    one. min/max over string-typed columns put an immutable string
    in the aggregation buffer, which HashAggregate cannot hold — and
    when those aggregates were fused with the multi-distinct rewrite,
    Spark planned a SortAggregate that SORTED the whole
    (n_distinct_cols+1)× Expand of the table (measured 4.2 s at
    sf0.1). Split apart: counts + exact distincts stay one
    HashAggregate over the Expand (string grouping KEYS are fine —
    only buffers must be mutable), and min/max run in a separate
    GLOBAL aggregate, which needs no sort at all even as
    SortAggregate (no grouping keys). 4.2 → 1.0 s warm, and at
    100 TB the removed sort of the expanded table is the difference
    between a scan-bound profile and a shuffle-spill job."""
    if not isinstance(cols, dict):
        cols = {c: F.col(c) for c in cols}
    if not cols:
        # zero columns → zero profile rows (one row per column is the
        # contract); the r9 two-pass split made the old fall-through
        # an invalid zero-expression aggregate, so return explicitly
        return df.sparkSession.createDataFrame(
            [],
            "column_name string, n_rows bigint, n_nulls bigint,"
            " n_distinct bigint, min_val string, max_val string,"
            " completeness double",
        )
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    mm_aggs: list[Column] = []
    for name, expr in cols.items():
        aggs += [
            F.count(expr).alias(f"__nn_{name}"),
            F.countDistinct(expr).alias(f"__nd_{name}"),
        ]
        mm_aggs += [
            F.min(expr).cast("string").alias(f"__mn_{name}"),
            F.max(expr).cast("string").alias(f"__mx_{name}"),
        ]
    row = df.agg(*aggs).crossJoin(F.broadcast(df.agg(*mm_aggs)))
    per_col = [
        F.struct(
            F.lit(name).alias("column_name"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{name}")).alias("n_nulls"),
            F.col(f"__nd_{name}").alias("n_distinct"),
            F.col(f"__mn_{name}").alias("min_val"),
            F.col(f"__mx_{name}").alias("max_val"),
            # try_divide: an EMPTY frame has __n = 0 and the raw
            # division aborts the profile under ANSI mode (r11 ANSI
            # audit) — completeness of a rowless table is NULL.
            F.round(
                F.try_divide(
                    F.col(f"__nn_{name}"), F.col("__n").cast("double")
                ),
                6,
            ).alias("completeness"),
        )
        for name in cols
    ]
    return row.select(
        F.explode(F.array(*per_col)).alias("p")
    ).select("p.*")


def check_constraints(
    df: DataFrame, rules: "Sequence[tuple[str, str]]"
) -> DataFrame:
    """Deequ-style constraint verification: evaluate every rule in
    ONE aggregation over ONE scan (the companion gate to
    ``profile_columns`` — profile describes, this one enforces).

    ``rules`` is a sequence of (name, predicate_sql) pairs; a rule
    passes when the predicate holds on EVERY row. Returns one row per
    rule: (constraint, n_rows, n_violations, passed). Uniqueness-type
    rules can't be row predicates — express them against a window-free
    aggregate upstream or use ``profile_columns``'s distinct counts.

    Scale shape: all rules compile to conditional counts inside a
    single partial-aggregated global aggregate — the scan cost is one
    pass regardless of rule count, and the exchange carries one row
    per partition.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, pred in rules:
        aggs.append(
            F.count(F.when(~F.expr(pred), 1)).alias(f"__v_{name}")
        )
    row = df.agg(*aggs)
    out = None
    for name, _pred in rules:
        one = row.select(
            F.lit(name).alias("constraint"),
            F.col("__n").alias("n_rows"),
            F.col(f"__v_{name}").alias("n_violations"),
            (F.col(f"__v_{name}") == 0).alias("passed"),
        )
        out = one if out is None else out.unionAll(one)
    return out


def key_skew_profile(df, cols):
    """Partition-key skew diagnostics for each candidate key column:
    the numbers that decide between a plain hash shuffle, AQE skew
    splitting, and explicit salting (operators/skew.py) BEFORE the
    job runs at scale.

    Per column: distinct-key count, max and mean per-key frequency,
    skew_ratio = max/mean (a ratio near 1 → uniform; ≫1 → the
    biggest key dominates a reducer), normalized Shannon entropy
    (1 = uniform), and the Gini coefficient of the frequency
    distribution (0 = uniform, →1 = one key owns everything).

    Each column costs ONE groupBy over the facts (map-side combined);
    every other statistic is windows/aggregates over the small
    per-key frequency frame. Gini uses the rank formulation
    G = 2·Σ(i·fᵢ)/(n·Σf) − (n+1)/n over ascending-frequency ranks —
    invariant under tie order, so engines can't disagree on ties.
    """
    from pyspark.sql import Window

    out = None
    for c in cols:
        freq = df.groupBy(F.col(c).alias("k")).agg(
            F.count(F.lit(1)).alias("f")
        )
        w = Window.orderBy("f")
        ranked = freq.select(
            "f",
            F.row_number().over(w).alias("i"),
            F.sum("f").over(Window.partitionBy()).alias("tot"),
        )
        p = F.col("f") / F.col("tot")
        prof = ranked.agg(
            F.lit(c).alias("key_col"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("f").alias("max_freq"),
            F.avg("f").alias("mean_freq"),
            (F.max("f") / F.avg("f")).alias("skew_ratio"),
            # try_divide (r12 degenerate sweep): a column with ONE
            # distinct key has log(n_keys)=0 — normalized entropy is
            # undefined for a single-category column → NULL, not a
            # job abort (the r11 profiling fix covered empty frames
            # but not the single-key log).
            F.try_divide(
                -F.sum(p * F.log(p)),
                F.log(F.count(F.lit(1)).cast("double")),
            ).alias("entropy_norm"),
            (
                2.0 * F.sum(F.col("i") * F.col("f"))
                / (F.count(F.lit(1)) * F.sum("f"))
                - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1))
            ).alias("gini"),
        )
        out = prof if out is None else out.unionAll(prof)
    return out
