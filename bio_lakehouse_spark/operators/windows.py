"""Window operators (SURVEY.md §2.5 W1-W12).

The analytical heart of the reference: rolling averages/sums over
``ROWS BETWEEN k PRECEDING AND CURRENT ROW`` frames, LAG deltas, LEAD
targets, excluding-current-row baselines, forward-fill, ROW_NUMBER
dedupe, and two EMA semantics (a flat rolling-AVG approximation used
by its SQL layer, ref feature_readiness_daily.sql:70-78, and the true
``ewm`` used by its Python layer, ref insights/training_load.py:21-23).

All helpers accept ``partition_by`` so the identical code partitions
by entity at scale instead of forcing a single-partition global sort.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def _window(
    order_by: str | Column,
    partition_by: Sequence[str | Column] = (),
) -> WindowSpec:
    w = Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    return w.orderBy(order_by)


def global_row_number(
    df: DataFrame,
    order_cols: Sequence[str | Column],
    rank_name: str = "i",
    num_partitions: int | None = None,
    assume_unique: bool = False,
) -> DataFrame:
    """1-based global ROW_NUMBER in ``order_cols`` order WITHOUT a
    single-partition sort — the shared scale path for every
    rank-formula query (Gini rank sums, Hill order statistics, NTILE
    positions, Lorenz/cumulative-share curves).

    Delegates to ``aggregates.dense_ids`` (range-partition by the
    sort key → per-partition row_number → broadcast the
    |partitions|-row running offsets back): identical output to
    ``row_number() OVER (ORDER BY ...)`` whenever ``order_cols`` is a
    total order, but the big frame is only ever sorted WITHIN range
    partitions — no one-task global sort to become the straggler at
    100× entity counts. Descending keys: pass the negated column
    (range partitioning needs an ascending sort expression).

    ``assume_unique=True`` skips the total-order guard when the key
    provably ends in a primary key (see dense_ids).
    """
    from bio_lakehouse_spark.operators.aggregates import dense_ids

    out = dense_ids(
        df,
        order_cols,
        id_name=rank_name,
        num_partitions=num_partitions,
        assume_unique=assume_unique,
    )
    return out.withColumn(rank_name, F.col(rank_name) + 1)


def rolling_col(
    agg: str,
    col: str | Column,
    order_by: str | Column,
    preceding: int,
    following: int = 0,
    partition_by: Sequence[str | Column] = (),
) -> Column:
    """``agg(col) OVER (... ROWS BETWEEN preceding PRECEDING AND
    following FOLLOWING)`` — W2/W3/W6 in one helper.

    ``preceding``/``following`` are row offsets (6 → "6 PRECEDING");
    pass ``following=-1`` for excluding-current-row baselines
    (``BETWEEN k PRECEDING AND 1 PRECEDING``, W6,
    ref feature_readiness_daily.sql:91-92).
    """
    fn = getattr(F, agg)
    w = _window(order_by, partition_by).rowsBetween(-preceding, following)
    return fn(col).over(w)


def rolling_corr(
    x: str | Column,
    y: str | Column,
    order_by: str | Column,
    preceding: int,
    partition_by: Sequence[str | Column] = (),
) -> Column:
    """14-day rolling Pearson r (ref experiments/analyzer.py:366-375).

    Expressed as try_divide(covar, sd·sd) rather than F.corr: under
    ANSI mode (Spark 4 default) corr RAISES DIVIDE_BY_ZERO whenever a
    frame holds ≥2 rows of a constant series — on real data a flat
    fortnight in either metric would kill the whole job (r11 ANSI
    audit). NULL for the undefined frame matches both single-row-frame
    corr and the SQL oracles' CORR."""
    w = _window(order_by, partition_by).rowsBetween(-preceding, 0)
    return F.try_divide(
        F.covar_samp(x, y).over(w),
        F.stddev_samp(x).over(w) * F.stddev_samp(y).over(w),
    )


def lag_delta(
    col: str | Column,
    order_by: str | Column,
    offset: int = 1,
    partition_by: Sequence[str | Column] = (),
) -> Column:
    """Day-over-day delta ``x - LAG(x, offset)`` (W4)."""
    c = F.col(col) if isinstance(col, str) else col
    return c - F.lag(c, offset).over(_window(order_by, partition_by))


def lead_col(
    col: str | Column,
    order_by: str | Column,
    offset: int = 1,
    partition_by: Sequence[str | Column] = (),
) -> Column:
    """``LEAD(x, offset)`` next-day target (W5) — the reference's own
    preferred form of the next-day self-join (workout_recovery_windows
    .sql:25-29)."""
    return F.lead(col, offset).over(_window(order_by, partition_by))


def forward_fill(
    col: str | Column,
    order_by: str | Column,
    partition_by: Sequence[str | Column] = (),
) -> Column:
    """``LAST(x, ignorenulls) OVER (ROWS UNBOUNDED PRECEDING)`` (W1/W8,
    ref glue/bio_etl_utils.py:163-189)."""
    w = _window(order_by, partition_by).rowsBetween(Window.unboundedPreceding, 0)
    return F.last(col, ignorenulls=True).over(w)


def dedupe_latest(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
) -> DataFrame:
    """ROW_NUMBER dedupe: keep first row per key under ``order_by``
    (W7, ref gold_daily_rollup.sql:43-51)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def ema_rolling_approx(
    col: str | Column,
    order_by: str | Column,
    span: int,
    partition_by: Sequence[str | Column] = (),
) -> Column:
    """The reference's SQL-layer EMA *approximation*: a flat rolling
    average over ``span`` rows (ref feature_readiness_daily.sql:70-78;
    taught to its NL layer at prompts/nl_to_sql_system.txt:29). Kept
    as distinct semantics from :func:`ema_exact` — both ship in the
    reference (SURVEY.md §7.4.3)."""
    return rolling_col("avg", col, order_by, span - 1, 0, partition_by)


def ema_exact(
    df: DataFrame,
    value_col: str,
    order_col: str,
    span: int,
    out_col: str,
    partition_by: Sequence[str] = (),
    method: str = "recurrence",
) -> DataFrame:
    """True pandas-``ewm(span, adjust=False)`` EMA (ref
    insights/training_load.py:21-23) as a grouped Arrow-batched op.

    Spark has no native EMA window; the recurrence is sequential per
    series, so we ship each series (one entity's ordered rows — small
    by construction: it's a per-entity daily time series) to a single
    ``applyInPandas`` group. With ``partition_by`` set, this scales
    horizontally across entities; without it, it degrades to one group
    (matching the reference's single-user scope).

    ``method="recurrence"`` is pandas ``ewm`` (O(n), production path);
    ``method="closed_form"`` evaluates the unrolled weighted sum
    ema_t = (1-a)^t·x₀ + a·Σ(1-a)^(t-i)·xᵢ left-to-right — same value
    to ~1e-12, but bit-reproducible by any engine that evaluates the
    same expression (the DuckDB oracle does exactly this).
    """
    import math

    from pyspark.sql import types as T

    alpha = 2.0 / (span + 1.0)
    # copy, don't .add(): StructType.add mutates the DataFrame's own
    # schema object in place.
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.DoubleType())]
    )
    group_cols = list(partition_by) if partition_by else []

    def _ema(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        if method == "recurrence":
            pdf[out_col] = pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        else:
            xs = pdf[value_col].to_list()
            n = len(xs)
            # math.pow(1-a, k) cached by exponent: the same IEEE
            # value the oracle's POWER() produces, computed once per
            # k instead of O(n²) times (this was 60%+ of the query's
            # bench time). The left-to-right addition order is
            # UNCHANGED — that order is the bit-reproducibility
            # contract with the oracle's LIST_SUM fold.
            powers = [math.pow(1 - alpha, k) for k in range(n)]
            ax = [x * alpha for x in xs]
            out = []
            for t in range(n):
                acc = 0.0
                acc += xs[0] * powers[t]
                for i in range(1, t + 1):
                    acc += ax[i] * powers[t - i]
                out.append(acc)
            pdf[out_col] = out
        return pdf

    if group_cols:
        # NOT applyInPandas: with many small series (1500 users ×
        # ~27 days at sf0.1) the per-group Arrow round-trip dominates
        # (measured 3.2 s for ~0.1 s of math). Instead co-locate each
        # entity's rows with repartition + in-partition sort, then
        # one mapInPandas call per PARTITION runs a pandas groupby
        # over ~|entities|/|partitions| series — identical per-series
        # arithmetic, two orders of magnitude fewer Python/Arrow
        # boundaries. Batches of one partition are concatenated first
        # because Arrow may split an entity across record batches.
        spark = df.sparkSession
        n_parts = max(1, spark.sparkContext.defaultParallelism)

        def _part(batches):
            pdfs = list(batches)
            if not pdfs:
                return
            pdf = pd.concat(pdfs, ignore_index=True)
            yield pdf.groupby(
                group_cols, sort=False, group_keys=False
            )[list(pdf.columns)].apply(_ema)

        return (
            df.repartition(n_parts, *group_cols)
            .sortWithinPartitions(*group_cols, order_col)
            .mapInPandas(_part, schema=schema)
        )
    return df.withColumn("__g", F.lit(1)).groupBy("__g").applyInPandas(
        lambda pdf: _ema(pdf).drop(columns="__g"), schema=schema
    )


def interpolate_linear(
    df: DataFrame,
    time_col: str,
    value_col: str,
    partition_by: Sequence[str] = (),
) -> DataFrame:
    """Linear interpolation of NULL gaps in a (daily) series — the
    Timescale ``interpolate()`` / pandas ``interpolate`` analog, and
    ``forward_fill``'s two-sided sibling (W1/W8 family).

    For each NULL row, the bracketing non-null values come from two
    frame-bounded window passes (last-ignorenulls looking back,
    first-ignorenulls looking forward — both on the series' ONE
    partitioned ordering, so the engine sorts once per partition and
    both windows reuse it) and the fill is the exact linear blend by
    date distance. Boundary NULLs (before the first / after the last
    observation) stay NULL — interpolation, not extrapolation.
    Partition-key-parameterized like every window helper here: at
    scale each entity's series interpolates independently."""
    part = list(partition_by)
    wb = (
        Window.partitionBy(*part)
        .orderBy(time_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(*part)
        .orderBy(time_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    v = F.col(value_col)
    t_obs = F.when(v.isNotNull(), F.col(time_col))
    prev_v = F.last(v, ignorenulls=True).over(wb)
    prev_t = F.last(t_obs, ignorenulls=True).over(wb)
    next_v = F.first(v, ignorenulls=True).over(wf)
    next_t = F.first(t_obs, ignorenulls=True).over(wf)
    frac = F.datediff(F.col(time_col), prev_t).cast("double") / F.datediff(
        next_t, prev_t
    )
    filled = F.when(v.isNotNull(), v).when(
        prev_v.isNotNull() & next_v.isNotNull(),
        prev_v + (next_v - prev_v) * frac,
    )
    return df.withColumn(f"{value_col}_interp", filled)
