"""Statistical operators (SURVEY.md §2.9 ST1-ST16).

The reference computes these in pandas/scipy on collected results; in
this engine they are Spark aggregates wherever a closed form exists
(Pearson + OLS + t-stat, Spearman via average ranks, Mann-Whitney U
with normal approximation, z-score anomalies, trend slopes, the
Bayesian Normal-Normal update, DiD) so they distribute. scipy is used
only behind Arrow-batched ``applyInPandas`` for the handful of
quantities with no closed form (exact p-values from t/U
distributions, LOWESS), and those paths degrade gracefully when scipy
is absent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pearson_ols(
    df: DataFrame,
    x: str,
    y: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Pearson r + OLS slope/intercept/stderr/t-stat, closed form
    (ST1, ref insights/sleep_readiness.py:58-82 — scipy.pearsonr /
    linregress re-expressed as distributed aggregates).

    slope = cov(x,y)/var(x); intercept = ȳ − slope·x̄;
    t = r·sqrt((n−2)/(1−r²)); stderr = slope/t.
    """
    gb = df.filter(F.col(x).isNotNull() & F.col(y).isNotNull()).groupBy(
        *group_cols
    )
    agg = gb.agg(
        F.count(F.lit(1)).alias("n"),
        F.corr(x, y).alias("r"),
        F.covar_samp(x, y).alias("_cov"),
        F.var_samp(x).alias("_varx"),
        F.avg(x).alias("_mx"),
        F.avg(y).alias("_my"),
    )
    slope = F.col("_cov") / F.col("_varx")
    intercept = F.col("_my") - slope * F.col("_mx")
    t_stat = F.col("r") * F.sqrt(
        (F.col("n") - 2) / (1 - F.col("r") * F.col("r"))
    )
    return agg.select(
        *group_cols,
        "n",
        "r",
        slope.alias("slope"),
        intercept.alias("intercept"),
        t_stat.alias("t_stat"),
        (slope / t_stat).alias("stderr"),
    )


def _avg_rank(col: str, partition_by: Sequence[str] = ()) -> Column:
    """Average (fractional) rank with ties — matches
    ``scipy.stats.rankdata`` / pandas ``rank(method='average')``.

    avg_rank(v) = count(x < v) + (count(x = v) + 1) / 2, computed as
    rank() + (tie_count − 1)/2 via two windows.
    """
    w = Window.partitionBy(*partition_by).orderBy(col)
    tie = Window.partitionBy(*partition_by, col)
    return F.rank().over(w) + (F.count(F.lit(1)).over(tie) - 1) / 2.0


def spearman(
    df: DataFrame,
    x: str,
    y: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Spearman ρ = Pearson r of average ranks — exact under ties
    (ST2, ref insights/timing_correlation.py:102). Distributed: two
    rank windows + one corr aggregate; no pandas."""
    d = df.filter(F.col(x).isNotNull() & F.col(y).isNotNull())
    d = d.withColumn("_rx", _avg_rank(x, group_cols)).withColumn(
        "_ry", _avg_rank(y, group_cols)
    )
    return d.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.corr("_rx", "_ry").alias("rho"),
    )


def mann_whitney_u(
    df: DataFrame,
    value: str,
    group: str,
    group_a,
    group_b,
    by: Sequence[str] = (),
) -> DataFrame:
    """Mann-Whitney U with tie-corrected normal approximation (ST3,
    ref insights/workout_recovery.py:98-110).

    U1 = R1 − n1(n1+1)/2 over pooled average ranks; z uses the
    tie-correction term Σ(t³−t). Closed-form distributed version of
    what the reference does with ``scipy.stats.mannwhitneyu``; the
    normal approximation is the standard large-sample form (scipy's
    ``method='asymptotic'`` without continuity correction).
    """
    d = df.filter(F.col(group).isin([group_a, group_b])).filter(
        F.col(value).isNotNull()
    )
    d = d.withColumn("_r", _avg_rank(value, by))
    ties = d.groupBy(*by, value).agg(F.count(F.lit(1)).alias("_t"))
    tie_term = ties.groupBy(*by).agg(
        F.sum(F.pow("_t", 3) - F.col("_t")).alias("_tie_sum")
    )
    agg = d.groupBy(*by).agg(
        F.sum(F.when(F.col(group) == group_a, F.col("_r"))).alias("_r1"),
        F.count(F.when(F.col(group) == group_a, 1)).alias("n1"),
        F.count(F.when(F.col(group) == group_b, 1)).alias("n2"),
    )
    if by:
        agg = agg.join(tie_term, on=list(by))
    else:
        agg = agg.crossJoin(tie_term)
    n1, n2 = F.col("n1"), F.col("n2")
    n = n1 + n2
    u1 = F.col("_r1") - n1 * (n1 + 1) / 2
    mu = n1 * n2 / 2
    sigma = F.sqrt(
        (n1 * n2 / 12.0)
        * ((n + 1) - F.col("_tie_sum") / (n * (n - 1)))
    )
    z = (u1 - mu) / sigma
    return agg.select(
        *by,
        "n1",
        "n2",
        u1.alias("u1"),
        z.alias("z"),
    )


def zscore_anomalies(
    df: DataFrame,
    value: str,
    threshold_sigmas: float = 1.5,
    by: Sequence[str] = (),
) -> DataFrame:
    """Flag rows below mean − k·σ (ST6, ref insights/anomaly_detection
    .py:40-85): global (or per-entity) stats aggregated once, then
    broadcast back over the rows — no self-shuffle of the fact side."""
    stats = df.groupBy(*by).agg(
        F.avg(value).alias("_mean"), F.stddev(value).alias("_std")
    )
    joined = (
        df.join(F.broadcast(stats), on=list(by))
        if by
        else df.crossJoin(F.broadcast(stats))
    )
    deviation = (F.col(value) - F.col("_mean")) / F.col("_std")
    return (
        joined.filter(
            F.col(value) < F.col("_mean") - threshold_sigmas * F.col("_std")
        )
        .withColumn("deviation_sigmas", deviation)
        .drop("_mean", "_std")
    )


def trend_slope(
    df: DataFrame,
    x: str,
    y: str,
    group_cols: Sequence[str] = (),
    stable_band: float = 0.3,
) -> DataFrame:
    """OLS slope classified improving/stable/declining (ST7, ref
    insights/readiness_trend.py:43-64) via the native ``regr_slope``
    aggregate."""
    agg = df.groupBy(*group_cols).agg(
        F.regr_slope(F.col(y), F.col(x)).alias("slope"),
        F.regr_intercept(F.col(y), F.col(x)).alias("intercept"),
        F.regr_count(F.col(y), F.col(x)).alias("n"),
    )
    label = (
        F.when(F.col("slope") > stable_band, "improving")
        .when(F.col("slope") < -stable_band, "declining")
        .otherwise("stable")
    )
    return agg.withColumn("trend", label)


def bayesian_effect(
    df: DataFrame,
    value: str,
    period: str,
    pre_label: str = "pre",
    post_label: str = "post",
) -> DataFrame:
    """Normal-Normal conjugate update (ST10, ref experiments/analyzer
    .py:105-171): weakly informative prior = N(pre_mean, pre_std²)
    (the FULL pre variance, not the standard error — the reference's
    choice, so a well-sampled post period dominates); likelihood =
    post mean with var σ₁²/n₁; posterior effect + 95% CI + Cohen's d
    (measured on the posterior effect, per the reference). Pure closed
    form over two groups' (mean, std, n) — one aggregate, driver-free.
    """
    agg = df.groupBy().pivot(period, [pre_label, post_label]).agg(
        F.avg(value).alias("mean"),
        F.stddev(value).alias("std"),
        F.count(value).alias("n"),
    )
    pre_m, pre_s, pre_n = (
        F.col(f"{pre_label}_mean"),
        F.col(f"{pre_label}_std"),
        F.col(f"{pre_label}_n"),
    )
    post_m, post_s, post_n = (
        F.col(f"{post_label}_mean"),
        F.col(f"{post_label}_std"),
        F.col(f"{post_label}_n"),
    )
    prior_var = pre_s * pre_s
    like_var = (post_s * post_s) / post_n
    post_var = 1 / (1 / prior_var + 1 / like_var)
    post_mean = post_var * (pre_m / prior_var + post_m / like_var)
    effect = post_mean - pre_m
    ci = 1.96 * F.sqrt(post_var)
    pooled = F.sqrt(
        ((pre_n - 1) * pre_s * pre_s + (post_n - 1) * post_s * post_s)
        / (pre_n + post_n - 2)
    )
    return agg.select(
        effect.alias("effect"),
        (effect - ci).alias("ci_low"),
        (effect + ci).alias("ci_high"),
        (effect / pooled).alias("cohens_d"),
        pre_n.alias("n_pre"),
        post_n.alias("n_post"),
    )


def seasonal_decompose(
    df: DataFrame,
    entity_col: str,
    date_col: str,
    value_col: str,
    period: int = 7,
) -> DataFrame:
    """Additive seasonal decomposition (STL-lite) of per-entity daily
    series: observed = trend + seasonal + residual, with trend = the
    centered ``period``-row rolling mean, seasonal = the per-phase
    mean detrended residual re-centered to sum 0 over a period (the
    classical-decomposition construction), residual = what's left.
    Phase is pure date arithmetic (days since epoch mod period), so
    every engine agrees on weekday alignment without dialect-specific
    DOW numbering.

    Scale shape: one window partitioned BY ENTITY (series
    parallelism = entity count; no global sort), one tiny per-(entity,
    phase) aggregate broadcast back. Health-data seasonality (weekday
    effects in readiness/training load) is the reference's analytics
    domain; this gives its views a decomposition primitive.
    """
    w7 = (
        Window.partitionBy(entity_col)
        .orderBy(date_col)
        .rowsBetween(-(period // 2), period // 2)
    )
    base = df.select(
        entity_col,
        date_col,
        F.col(value_col).alias("observed"),
    ).withColumn("trend", F.avg("observed").over(w7))
    phase = (
        F.datediff(F.col(date_col), F.to_date(F.lit("1970-01-05"))) % period
    ).alias("phase")  # 1970-01-05 is a Monday: phase 0 = Monday
    detr = base.withColumn("phase", phase).withColumn(
        "detr", F.col("observed") - F.col("trend")
    )
    smeans = detr.groupBy(entity_col, "phase").agg(
        F.avg("detr").alias("s_raw")
    )
    scentered = smeans.withColumn(
        "seasonal",
        F.col("s_raw")
        - F.avg("s_raw").over(Window.partitionBy(entity_col)),
    ).select(entity_col, "phase", "seasonal")
    return (
        detr.join(F.broadcast(scentered), on=[entity_col, "phase"])
        .select(
            entity_col,
            date_col,
            "observed",
            "trend",
            "seasonal",
            (F.col("observed") - F.col("trend") - F.col("seasonal")).alias(
                "residual"
            ),
        )
    )
