"""Histogram-based decision-tree split finding (LightGBM-style).

The reference's model zoo (insights_engine/models/zoo.py) fits
sklearn tree ensembles driver-side; the distributed primitive
underneath every tree learner is *best-split search*, and the
scalable formulation is the histogram method (Ke et al., LightGBM,
NeurIPS'17; same idea in XGBoost's approx mode): bin each feature
into B fixed buckets, build per-(feature, bin) label histograms in
ONE scan (a map-side-combinable groupBy whose shuffle is bounded by
F×B rows regardless of input size), then score every candidate
boundary with a cumulative window over that tiny histogram table.
No per-candidate rescans, no sort of the raw data — the exact shape
that survives 100 TB.

Gain is Gini impurity reduction for a binary label; thresholds are
bin upper edges on a [min, max] equi-width grid. Both the binning
expression and the gain arithmetic are written as the same
expression tree the DuckDB oracle uses, so the differential harness
certifies the full pipeline bit-for-bit (after the suite's standard
round-6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def histogram_split_gains(
    df: DataFrame,
    features: dict[str, Column],
    label: Column,
    nbins: int = 32,
) -> DataFrame:
    """Score every candidate split for every feature in one pass.

    Returns one row per (feature, boundary) with columns
    ``feature, bin, threshold, gain, left_n, right_n`` — boundaries
    with an empty side are excluded (no information), as is the top
    bin (splitting above the max sends everything left).

    Shape: scan → 1-row min/max stats frame broadcast back onto the
    scan (one-row-stat crossJoin) → stack to (feature, bin, y) →
    groupBy(feature, bin) with map-side partial aggregation — the
    ONLY shuffle, ≤ len(features)·nbins rows — → windows over the
    histogram (tiny by construction).
    """
    feats = list(features.items())
    base = df.select(
        label.cast("int").alias("y"),
        *[c.cast("double").alias(f"x_{i}") for i, (_, c) in enumerate(feats)],
    )
    stats = base.agg(
        *[F.min(f"x_{i}").alias(f"lo_{i}") for i in range(len(feats))],
        *[F.max(f"x_{i}").alias(f"hi_{i}") for i in range(len(feats))],
    )
    joined = base.crossJoin(F.broadcast(stats))
    # Equi-width bin id; LEAST pins x == max into the top bin. The
    # expression tree ((x - lo) * B / (hi - lo)) is mirrored verbatim
    # in the oracle so the doubles agree bitwise.
    stack_args = []
    for i, (name, _) in enumerate(feats):
        bin_expr = (
            f"least({nbins - 1}, cast(floor((x_{i} - lo_{i}) * {nbins}.0 "
            f"/ nullif(hi_{i} - lo_{i}, 0.0)) as int))"
        )
        stack_args += [f"'{name}'", bin_expr, f"lo_{i}", f"hi_{i}"]
    binned = joined.select(
        F.expr(
            f"stack({len(feats)}, {', '.join(stack_args)}) "
            "as (feature, bin, lo, hi)"
        ),
        "y",
    )
    hist = binned.groupBy("feature", "bin").agg(
        F.first("lo").alias("lo"),
        F.first("hi").alias("hi"),
        F.count(F.lit(1)).alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    cum = Window.partitionBy("feature").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy("feature")
    scored = (
        hist.withColumn("left_n", F.sum("n").over(cum))
        .withColumn("left_pos", F.sum("pos").over(cum))
        .withColumn("tot_n", F.sum("n").over(tot))
        .withColumn("tot_pos", F.sum("pos").over(tot))
        .withColumn("max_bin", F.max("bin").over(tot))
        .where(
            (F.col("bin") < F.col("max_bin"))
            & (F.col("left_n") > 0)
            & (F.col("left_n") < F.col("tot_n"))
        )
    )
    return scored.select(
        "feature",
        "bin",
        F.expr(
            f"lo + (bin + 1) * (hi - lo) / {nbins}.0"
        ).alias("threshold"),
        F.expr(_GINI_GAIN_SQL).alias("gain"),
        "left_n",
        (F.col("tot_n") - F.col("left_n")).alias("right_n"),
    )


# The one shared gain expression (Spark SQL ≡ DuckDB SQL on these
# columns): Gini(parent) − wL·Gini(left) − wR·Gini(right), with p·p
# instead of pow(p, 2) so both engines emit the same multiply.
_GINI_GAIN_SQL = (
    "(1.0"
    " - (tot_pos / cast(tot_n as double)) * (tot_pos / cast(tot_n as double))"
    " - (1.0 - tot_pos / cast(tot_n as double))"
    " * (1.0 - tot_pos / cast(tot_n as double)))"
    " - (left_n / cast(tot_n as double)) * (1.0"
    " - (left_pos / cast(left_n as double)) * (left_pos / cast(left_n as double))"
    " - (1.0 - left_pos / cast(left_n as double))"
    " * (1.0 - left_pos / cast(left_n as double)))"
    " - ((tot_n - left_n) / cast(tot_n as double)) * (1.0"
    " - ((tot_pos - left_pos) / cast(tot_n - left_n as double))"
    " * ((tot_pos - left_pos) / cast(tot_n - left_n as double))"
    " - (1.0 - (tot_pos - left_pos) / cast(tot_n - left_n as double))"
    " * (1.0 - (tot_pos - left_pos) / cast(tot_n - left_n as double)))"
)


def best_splits(gains: DataFrame) -> DataFrame:
    """Per-feature argmax over the scored boundaries.

    Ties (after the suite's round-6) break to the LOWER bin so the
    pick is engine-independent: max(struct(rounded gain, −bin))
    — a sort-free partial-aggregable argmax (same pattern as label
    propagation's max(struct) selection).
    """
    pick = F.max(
        F.struct(
            F.round("gain", 6).alias("g"),
            (-F.col("bin")).alias("nb"),
            F.col("threshold").alias("threshold"),
            F.col("gain").alias("gain"),
            F.col("left_n").alias("left_n"),
            F.col("right_n").alias("right_n"),
        )
    ).alias("best")
    return gains.groupBy("feature").agg(pick).select(
        "feature",
        F.round("best.threshold", 6).alias("threshold"),
        F.round("best.gain", 6).alias("gain"),
        F.col("best.left_n").alias("left_n"),
        F.col("best.right_n").alias("right_n"),
    )


def gbdt_two_round(
    df: DataFrame,
    features: dict[str, Column],
    target: Column,
    nbins: int = 32,
    lr: float = 0.5,
) -> DataFrame:
    """Two unrolled rounds of gradient-boosted stumps (squared loss)
    — the distributed-GBM primitive under the reference's driver-side
    model zoo, in the histogram shape that scales (same skeleton as
    ``histogram_split_gains``): per round, ONE scan computes
    residuals against the broadcast model-so-far and bins them
    (shuffle ≤ F×B rows of (n, Σe) sums), cumulative windows over the
    tiny histogram score every boundary by variance reduction
    S_L²/n_L + S_R²/n_R − S²/n, a global rank window over the ≤F×B
    gains frame picks the cross-feature best, and the leaf values
    γ = mean residual ride forward as a ONE-ROW broadcast frame into
    the next round's residual expression. Fixed rounds/bins unroll
    into SQL, so the full boosting trajectory — splits, leaf values,
    per-round train RMSE — is oracle-certifiable.

    Returns 2 rows: (round, feature, threshold, gamma_l, gamma_r,
    gain, rmse_after), unrounded.
    """
    feats = list(features.items())
    assert len(feats) == 2, "two-feature audit form"
    (n0, c0), (n1, c1) = feats
    base = df.select(
        target.cast("double").alias("y"),
        c0.cast("double").alias("x_0"),
        c1.cast("double").alias("x_1"),
    )
    stats = base.agg(
        F.min("x_0").alias("lo_0"),
        F.max("x_0").alias("hi_0"),
        F.min("x_1").alias("lo_1"),
        F.max("x_1").alias("hi_1"),
        F.avg("y").alias("f0"),
    )

    def bin_expr(i: int) -> str:
        return (
            f"least({nbins - 1}, cast(floor((x_{i} - lo_{i}) * {nbins}.0"
            f" / nullif(hi_{i} - lo_{i}, 0.0)) as int))"
        )

    def delta_expr(feat: str, thr: str, gl: str, gr: str) -> str:
        """Leaf-value lookup for a chosen (feature, threshold)."""
        return (
            f"(case when {feat} = '{n0}' then"
            f" (case when x_0 <= {thr} then {gl} else {gr} end)"
            f" else (case when x_1 <= {thr} then {gl} else {gr} end) end)"
        )

    wcum = Window.partitionBy("feature").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wtot = Window.partitionBy("feature")
    wpick = Window.orderBy(
        F.round("gain", 6).desc(), F.col("feature").asc(), F.col("bin").asc()
    )

    def best_split(joined: DataFrame, resid_sql: str) -> DataFrame:
        stack_args = []
        for i, (name, _) in enumerate(feats):
            stack_args += [f"'{name}'", bin_expr(i), f"lo_{i}", f"hi_{i}"]
        binned = joined.select(
            F.expr(
                f"stack(2, {', '.join(stack_args)})"
                " as (feature, bin, lo, hi)"
            ),
            F.expr(resid_sql).alias("e"),
        )
        hist = binned.groupBy("feature", "bin").agg(
            F.first("lo").alias("lo"),
            F.first("hi").alias("hi"),
            F.count(F.lit(1)).alias("n_b"),
            F.sum("e").alias("s_b"),
        )
        scored = (
            hist.withColumn("nl", F.sum("n_b").over(wcum))
            .withColumn("sl", F.sum("s_b").over(wcum))
            .withColumn("n", F.sum("n_b").over(wtot))
            .withColumn("s", F.sum("s_b").over(wtot))
            .withColumn("max_bin", F.max("bin").over(wtot))
            .where(
                (F.col("bin") < F.col("max_bin"))
                & (F.col("nl") > 0)
                & (F.col("nl") < F.col("n"))
            )
            .select(
                "feature",
                "bin",
                F.expr(f"lo + (bin + 1) * (hi - lo) / {nbins}.0").alias(
                    "threshold"
                ),
                F.expr(
                    "sl * sl / cast(nl as double)"
                    " + (s - sl) * (s - sl) / cast(n - nl as double)"
                    " - s * s / cast(n as double)"
                ).alias("gain"),
                F.expr("sl / cast(nl as double)").alias("gamma_l"),
                F.expr("(s - sl) / cast(n - nl as double)").alias(
                    "gamma_r"
                ),
            )
        )
        return (
            scored.withColumn("rn", F.row_number().over(wpick))
            .where(F.col("rn") == 1)
            .drop("rn", "bin")
        )

    j1 = base.crossJoin(F.broadcast(stats))
    best1 = best_split(j1, "y - f0")
    b1 = F.broadcast(
        best1.select(
            F.col("feature").alias("feat1"),
            F.col("threshold").alias("thr1"),
            F.col("gamma_l").alias("gl1"),
            F.col("gamma_r").alias("gr1"),
            F.col("gain").alias("gain1"),
        )
    )
    d1 = delta_expr("feat1", "thr1", "gl1", "gr1")
    j2 = j1.crossJoin(b1)
    rmse1 = j2.agg(
        F.sqrt(
            F.avg(
                F.expr(f"(y - (f0 + {lr} * {d1}))"
                       f" * (y - (f0 + {lr} * {d1}))")
            )
        ).alias("rmse_after")
    )
    best2 = best_split(j2, f"y - (f0 + {lr} * {d1})")
    b2 = F.broadcast(
        best2.select(
            F.col("feature").alias("feat2"),
            F.col("threshold").alias("thr2"),
            F.col("gamma_l").alias("gl2"),
            F.col("gamma_r").alias("gr2"),
            F.col("gain").alias("gain2"),
        )
    )
    d2 = delta_expr("feat2", "thr2", "gl2", "gr2")
    rmse2 = j2.crossJoin(b2).agg(
        F.sqrt(
            F.avg(
                F.expr(
                    f"(y - (f0 + {lr} * {d1} + {lr} * {d2}))"
                    f" * (y - (f0 + {lr} * {d1} + {lr} * {d2}))"
                )
            )
        ).alias("rmse_after")
    )
    r1 = (
        best1.withColumn("round", F.lit(1))
        .crossJoin(F.broadcast(rmse1))
    )
    r2 = (
        best2.withColumn("round", F.lit(2))
        .crossJoin(F.broadcast(rmse2))
    )
    return r1.unionByName(r2).select(
        "round", "feature", "threshold", "gamma_l", "gamma_r", "gain",
        "rmse_after",
    )
