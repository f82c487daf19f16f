"""Histogram split finding (operators/trees.py): brute-force parity
on a controlled frame + the bounded-shuffle plan contract."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bio_lakehouse_spark.operators.trees import (
    best_splits,
    histogram_split_gains,
)


def _brute_force_best(rows, nbins):
    """Reference implementation: bin in Python, score every boundary."""
    xs = [r[0] for r in rows]
    ys = [r[1] for r in rows]
    lo, hi = min(xs), max(xs)
    bins = [
        min(nbins - 1, int(math.floor((x - lo) * nbins / (hi - lo))))
        for x in xs
    ]
    hist = {}
    for b, y in zip(bins, ys):
        n, p = hist.get(b, (0, 0))
        hist[b] = (n + 1, p + y)
    order = sorted(hist)
    tot_n = sum(n for n, _ in hist.values())
    tot_pos = sum(p for _, p in hist.values())

    def gini(pos, n):
        p = pos / n
        return 1.0 - p * p - (1.0 - p) * (1.0 - p)

    parent = gini(tot_pos, tot_n)
    best = None
    left_n = left_pos = 0
    for b in order[:-1]:
        n, p = hist[b]
        left_n += n
        left_pos += p
        if left_n == 0 or left_n == tot_n:
            continue
        g = (
            parent
            - (left_n / tot_n) * gini(left_pos, left_n)
            - ((tot_n - left_n) / tot_n)
            * gini(tot_pos - left_pos, tot_n - left_n)
        )
        key = (round(g, 6), -b)
        if best is None or key > best[0]:
            best = (key, lo + (b + 1) * (hi - lo) / nbins, g, left_n)
    return best  # ((gain_r6, -bin), threshold, gain, left_n)


def test_matches_brute_force(spark):
    # A frame with a known sharp split (x < 50 → mostly 1) plus noise
    # rows so several boundaries compete.
    rows = [(float(i % 100), 1 if (i % 100) < 50 else (i % 7 == 0) * 1)
            for i in range(1000)]
    df = spark.createDataFrame(rows, "x double, y int")
    out = best_splits(
        histogram_split_gains(df, {"x": F.col("x")}, F.col("y") == 1, 16)
    ).collect()
    assert len(out) == 1
    got = out[0]
    _, thr, gain, left_n = _brute_force_best(rows, 16)
    assert got["feature"] == "x"
    assert abs(got["threshold"] - thr) < 1e-6
    assert abs(got["gain"] - round(gain, 6)) < 1e-6
    assert got["left_n"] == left_n
    assert got["left_n"] + got["right_n"] == len(rows)


def test_constant_feature_yields_no_split(spark):
    # hi == lo → every bin id is NULL (nullif guard); the groupBy
    # produces one NULL-bin row which the boundary filter drops, so a
    # constant column contributes zero candidate rows, not a crash.
    df = spark.createDataFrame(
        [(1.0, i % 2) for i in range(10)], "x double, y int"
    )
    gains = histogram_split_gains(df, {"x": F.col("x")}, F.col("y") == 1, 8)
    assert gains.count() == 0


def test_shuffle_is_histogram_bounded(spark):
    """The groupBy output — the only data-sized exchange — carries
    (feature, bin) keys, so the shuffled row count is ≤ F×B no matter
    the input size. Assert the plan aggregates BEFORE the exchange
    (partial_count / partial_sum on the map side)."""
    df = spark.range(10_000).select(
        (F.col("id") % 97).cast("double").alias("x"),
        (F.col("id") % 3 == 0).cast("int").alias("y"),
    )
    gains = histogram_split_gains(df, {"x": F.col("x")}, F.col("y") == 1, 32)
    plan = gains._jdf.queryExecution().executedPlan().toString()
    # map-side partial aggregation on the scan side of the exchange
    assert "partial_count" in plan or "partial count" in plan.lower()
    # exactly two shuffles, both histogram-keyed and histogram-sized:
    # the (feature, bin) aggregation and the (feature) window — the
    # raw data is never exchanged
    assert plan.count("Exchange hashpartitioning(feature") == 2
    assert plan.count("Exchange hashpartitioning") == 2


def test_gbdt_two_rounds_reduce_rmse_and_match_bruteforce(spark):
    """On a frame where y is piecewise in x, round 1 must find the
    true breakpoint, leaf values must match the brute-force mean
    residuals, and train RMSE must fall monotonically."""
    import math

    from bio_lakehouse_spark.operators.trees import gbdt_two_round

    rows = []
    for i in range(2000):
        x0 = float(i % 100)
        x1 = float((i * 7) % 10)
        y = (10.0 if x0 < 50 else 40.0) + 2.0 * x1 + math.sin(i * 0.37)
        rows.append((y, x0, x1))
    df = spark.createDataFrame(rows, "y double, x0 double, x1 double")
    out = {
        r["round"]: r
        for r in gbdt_two_round(
            df,
            {"a": df["x0"], "b": df["x1"]},
            target=df["y"],
            nbins=10,
            lr=1.0,  # full step: round 1 absorbs the x0 step entirely,
            # so round 2 must move to the x1 slope (at lr=0.5 half the
            # step survives and legitimately wins again)
        ).collect()
    }
    r1, r2 = out[1], out[2]
    # the dominant structure is the x0 step at 50 → bin boundary 50.0
    # (lo=0, hi=99, B=10 → boundary 5 edges at 49.5... nearest edge)
    assert r1["feature"] == "a"
    assert 40.0 <= r1["threshold"] <= 60.0
    assert r1["gamma_l"] < 0 < r1["gamma_r"]
    # residual structure after round 1 is the x1 slope → round 2
    # picks feature b
    assert r2["feature"] == "b"
    base_rmse = float(
        df.selectExpr("stddev_pop(y) as r").first()["r"]
    )
    assert r1["rmse_after"] < base_rmse
    assert r2["rmse_after"] < r1["rmse_after"]
