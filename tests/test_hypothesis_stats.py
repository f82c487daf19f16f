"""Brute-force NumPy cross-checks for the hypothesis-test / robust /
time-series operators (suite/hypothesis_queries.py) — independent of
the DuckDB oracles, these pin the math itself."""

from __future__ import annotations

import math

import numpy as np
import pytest

from bio_lakehouse_spark.operators.stats import (
    acf,
    chi_square_independence,
    cusum_changepoint,
    ks_two_sample,
    mad_anomalies,
    normal_sf_approx,
    theil_sen,
    welch_t,
)

RNG = np.random.default_rng(42)


@pytest.fixture(scope="module")
def two_groups(spark):
    rows = [("a", float(v)) for v in RNG.normal(10, 3, 80)] + [
        ("b", float(v)) for v in RNG.normal(12, 5, 60)
    ]
    return spark.createDataFrame(rows, "g string, v double")


def test_welch_t_matches_numpy(two_groups):
    out = welch_t(two_groups, "v", "g", "a", "b").collect()[0]
    pdf = two_groups.toPandas()
    x = pdf[pdf.g == "a"].v.to_numpy()
    y = pdf[pdf.g == "b"].v.to_numpy()
    vx, vy = x.var(ddof=1), y.var(ddof=1)
    se2 = vx / len(x) + vy / len(y)
    t = (x.mean() - y.mean()) / math.sqrt(se2)
    dof = se2**2 / (
        (vx / len(x)) ** 2 / (len(x) - 1) + (vy / len(y)) ** 2 / (len(y) - 1)
    )
    assert out["n1"] == len(x) and out["n2"] == len(y)
    assert out["t_stat"] == pytest.approx(t, rel=1e-9)
    assert out["welch_df"] == pytest.approx(dof, rel=1e-9)


def test_ks_two_sample_matches_bruteforce(two_groups):
    out = ks_two_sample(two_groups, "v", "g", "a", "b").collect()[0]
    pdf = two_groups.toPandas()
    x = np.sort(pdf[pdf.g == "a"].v.to_numpy())
    y = np.sort(pdf[pdf.g == "b"].v.to_numpy())
    grid = np.concatenate([x, y])
    f1 = np.searchsorted(x, grid, side="right") / len(x)
    f2 = np.searchsorted(y, grid, side="right") / len(y)
    assert out["ks_d"] == pytest.approx(np.abs(f1 - f2).max(), abs=1e-12)


def test_chi_square_matches_bruteforce(spark):
    rows = [("r1", "c1")] * 30 + [("r1", "c2")] * 10 + [("r2", "c1")] * 15 + [
        ("r2", "c2")
    ] * 25
    df = spark.createDataFrame(rows, "r string, c string")
    out = chi_square_independence(df, "r", "c").collect()[0]
    obs = np.array([[30, 10], [15, 25]], dtype=float)
    exp = obs.sum(1)[:, None] * obs.sum(0)[None, :] / obs.sum()
    chi2 = ((obs - exp) ** 2 / exp).sum()
    assert out["chi2"] == pytest.approx(chi2, rel=1e-12)
    assert out["dof"] == 1
    assert out["n"] == 80


def test_mad_anomalies_matches_numpy(spark):
    vals = list(RNG.normal(50, 5, 200)) + [500.0, -400.0, 900.0]
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    out = mad_anomalies(df, "v").collect()[0]
    arr = np.array(vals)
    med = np.median(arr)
    mad = np.median(np.abs(arr - med))
    n_anom = int((np.abs(arr - med) > 3 * 1.4826 * mad).sum())
    assert out["median"] == pytest.approx(med, rel=1e-12)
    assert out["mad"] == pytest.approx(mad, rel=1e-12)
    assert out["n_anomalies"] == n_anom >= 3  # at least the 3 injected


def test_acf_matches_numpy(spark):
    x = RNG.normal(0, 1, 60).cumsum()  # random walk → strong lag-1
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(x)], "t int, v double"
    )
    out = {r["lag"]: r["acf"] for r in acf(df, "t", "v", max_lag=3).collect()}
    d = x - x.mean()
    ss = (d * d).sum()
    for k in (1, 2, 3):
        rk = (d[k:] * d[:-k]).sum() / ss
        assert out[k] == pytest.approx(rk, rel=1e-9), k
    assert out[1] > 0.8  # random walk sanity


def test_cusum_finds_injected_shift(spark):
    x = np.concatenate([RNG.normal(0, 1, 40), RNG.normal(4, 1, 40)])
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(x)], "t int, v double"
    )
    out = cusum_changepoint(df, "t", "v").collect()[0]
    d = x - x.mean()
    s = np.abs(d.cumsum())
    assert out["cp"] == int(s.argmax())
    assert out["max_abs_s"] == pytest.approx(s.max(), rel=1e-9)
    assert 35 <= out["cp"] <= 42  # the true break is at index 39/40


def test_theil_sen_matches_bruteforce_and_robust(spark):
    xs = np.arange(20, dtype=float)
    ys = 2.0 * xs + 1.0
    ys[3], ys[11] = 500.0, -300.0  # gross outliers
    df = spark.createDataFrame(
        [("u", float(a), float(b)) for a, b in zip(xs, ys)],
        "e string, x double, y double",
    )
    out = theil_sen(df, "e", "x", "y").collect()[0]
    slopes = [
        (ys[j] - ys[i]) / (xs[j] - xs[i])
        for i in range(len(xs))
        for j in range(i + 1, len(xs))
    ]
    assert out["n_pairs"] == len(slopes)
    # DISCRETE lower median (sorted element ceil(n/2), 1-based) — the
    # bit-exact cross-engine contract; within half a slope-gap of
    # numpy's interpolated median
    import math

    discrete = sorted(slopes)[math.ceil(len(slopes) / 2) - 1]
    assert out["sen_slope"] == pytest.approx(discrete, rel=1e-12)
    assert out["sen_slope"] == pytest.approx(2.0, abs=0.05)  # outlier-proof


def test_theil_sen_max_points_guard(spark):
    df = spark.createDataFrame(
        [("u", float(i), float(i)) for i in range(30)],
        "e string, x double, y double",
    )
    with pytest.raises(Exception, match="max_points"):
        theil_sen(df, "e", "x", "y", max_points=10).collect()


def test_normal_sf_approx_vs_erfc(spark):
    zs = [0.0, 0.5, 1.0, 1.645, 1.96, 2.575, 3.0, 4.0]
    df = spark.createDataFrame([(z,) for z in zs], "z double")
    from pyspark.sql import functions as F

    got = {
        r["z"]: r["sf"]
        for r in df.select(
            "z", normal_sf_approx(F.col("z")).alias("sf")
        ).collect()
    }
    for z in zs:
        exact = 0.5 * math.erfc(z / math.sqrt(2))
        assert got[z] == pytest.approx(exact, abs=7.5e-8), z


def test_bh_flags_match_reference_procedure(spark, sf_dir):
    from bio_lakehouse_spark.suite.hypothesis_queries import (
        _BH_Q,
        bh_fdr_discovery,
    )

    rows = bh_fdr_discovery(spark, sf_dir).collect()
    ps = [r["p"] for r in rows]  # already rank-ordered
    m = len(ps)
    kmax = max(
        (i + 1 for i, p in enumerate(ps) if p <= _BH_Q * (i + 1) / m),
        default=0,
    )
    for i, r in enumerate(rows):
        assert r["significant"] == (1 if i + 1 <= kmax else 0)


def test_holt_linear_matches_python_recursion(spark):
    from bio_lakehouse_spark.operators.stats import holt_linear

    x = list(RNG.normal(100, 10, 25).cumsum())
    df = spark.createDataFrame(
        [("u", i, float(v)) for i, v in enumerate(x)],
        "e string, t int, v double",
    )
    out = holt_linear(df, "e", "t", "v", alpha=0.5, beta=0.25, horizon=7)
    row = out.collect()[0]
    l, b = x[0], x[1] - x[0]
    for v in x[2:]:
        nl = 0.5 * v + 0.5 * (l + b)
        b = 0.25 * (nl - l) + 0.75 * b
        l = nl
    assert row["n_obs"] == len(x)
    assert row["level"] == pytest.approx(l, rel=1e-12)
    assert row["trend"] == pytest.approx(b, rel=1e-12)
    assert row["forecast"] == pytest.approx(l + 7 * b, rel=1e-12)


def test_holt_linear_drops_single_point_series(spark):
    from bio_lakehouse_spark.operators.stats import holt_linear

    df = spark.createDataFrame(
        [("a", 0, 1.0), ("b", 0, 1.0), ("b", 1, 2.0)],
        "e string, t int, v double",
    )
    rows = holt_linear(df, "e", "t", "v").collect()
    assert {r["e"] for r in rows} == {"b"}


def test_walk_forward_ridge_sql_matches_numpy(spark, sf_dir):
    """The Cramer's-rule per-fold ridge in walk_forward_cv_daily must
    reproduce numerics.walk_forward_cv(model='ridge') — same folds,
    same normal equations (alpha=1, unpenalized intercept) — on the
    SAME rounded daily feature table the query uses."""
    import numpy as np
    from pyspark.sql import functions as F

    from bio_lakehouse_spark.products.numerics import walk_forward_cv
    from bio_lakehouse_spark.suite.registry import REGISTRY, load

    sdf = REGISTRY["walk_forward_cv_daily"].fn(spark, sf_dir).toPandas()
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("date"))
        .agg(
            F.round(F.sum("value"), 6).alias("total_value"),
            F.count(F.lit(1)).cast("double").alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .orderBy("date")
        .toPandas()
    )
    y = daily["total_value"].shift(-1).to_numpy(dtype=float)[:-1]
    X = daily[["total_value", "n_events", "avg_value"]].to_numpy(
        dtype=float
    )[:-1]
    res = walk_forward_cv(X, y, min_train=10, test_window=5)
    # numpy loop emits a final short fold the SQL contract drops when
    # t > n-2 never fires; compare the common prefix fold-by-fold.
    folds = res["folds"][: len(sdf)]
    assert len(sdf) == len(folds) and len(folds) >= 2
    for row, fold in zip(sdf.sort_values("fold").itertuples(), folds):
        assert row.train_n == fold["train_n"]
        assert row.test_n == fold["test_n"]
        assert abs(row.ridge_mae - fold["mae"]) < 1e-4, (
            row.fold, row.ridge_mae, fold["mae"])
        assert abs(row.naive_mae - fold["naive_mae"]) < 1e-4


def test_msprt_always_valid_p_is_monotone_and_detects_effect(spark):
    """The always-valid p-value must be non-increasing in time and
    ∈ (0, 1]; with a large persistent effect it must end far below
    a null-effect trajectory's."""
    import math

    from bio_lakehouse_spark.operators.stats import msprt_two_sample

    def daily_frame(effect):
        rows = []
        for t in range(40):
            # deterministic pseudo-noise, mean 10 vs 10+effect
            nx, ny = 50, 50
            noise = math.sin(t * 1.7) * 2.0
            mx, my = 10.0 + effect + noise, 10.0 + noise
            sx, sy = nx * mx, ny * my
            # per-arm squared sums with unit sample variance
            sxx = nx * (mx * mx + 1.0)
            syy = ny * (my * my + 1.0)
            rows.append((f"2024-01-{t+1:02d}" if t < 31 else
                         f"2024-02-{t-30:02d}", nx, sx, sxx, ny, sy, syy))
        df = spark.createDataFrame(
            rows,
            "date string, nx long, sx double, sxx double,"
            " ny long, sy double, syy double",
        )
        return df.selectExpr("cast(date as date) as date", "nx", "sx",
                             "sxx", "ny", "sy", "syy")

    with_effect = [
        r["p_always_valid"]
        for r in msprt_two_sample(daily_frame(2.0)).orderBy("date").collect()
    ]
    null = [
        r["p_always_valid"]
        for r in msprt_two_sample(daily_frame(0.0)).orderBy("date").collect()
    ]
    for seq in (with_effect, null):
        assert all(0.0 < p <= 1.0 for p in seq)
        assert all(a >= b for a, b in zip(seq, seq[1:]))  # monotone ↓
    assert with_effect[-1] < 1e-6  # strong effect → tiny p
    assert null[-1] > 0.05  # no effect → never "significant"


def test_cox_ph_newton_matches_numpy(spark):
    """2-step Newton Cox fit vs a direct numpy implementation of the
    Breslow partial-likelihood score/information on a small frame."""
    import numpy as np

    from bio_lakehouse_spark.operators.stats import cox_ph_newton

    rng = np.random.default_rng(5)
    n = 200
    x = rng.normal(size=n)
    # true hazard increases with x → shorter durations for high x
    t = np.ceil(rng.exponential(scale=np.exp(-0.8 * x)) * 30).astype(int) + 1
    ev = (rng.random(n) < 0.7).astype(int)
    df = spark.createDataFrame(
        [(int(tt), int(e), float(xx)) for tt, e, xx in zip(t, ev, x)],
        "t int, ev int, x double",
    )
    got = cox_ph_newton(df, steps=2).first()

    def score_info(beta):
        u = i = 0.0
        for td in sorted(set(t[ev == 1])):
            risk = t >= td
            w = np.exp(beta * x[risk])
            s0, s1 = w.sum(), (x[risk] * w).sum()
            s2 = (x[risk] ** 2 * w).sum()
            d = int(((t == td) & (ev == 1)).sum())
            sx = x[(t == td) & (ev == 1)].sum()
            u += sx - d * s1 / s0
            i += d * (s2 / s0 - (s1 / s0) ** 2)
        return u, i

    beta = 0.0
    for _ in range(2):
        u, i = score_info(beta)
        beta += u / i
    u, i = score_info(beta)
    assert got["beta"] == pytest.approx(beta, rel=1e-9)
    assert got["score_u"] == pytest.approx(u, abs=1e-6)
    assert got["se"] == pytest.approx(1.0 / np.sqrt(i), rel=1e-9)
    assert got["n_events"] == int(ev.sum())
    # scale = exp(−0.8x): high x → short durations → positive hazard β
    assert got["beta"] > 0.3


def test_isotonic_fit_properties(spark):
    """The minimax isotonic fit must (1) be nondecreasing in the
    order, (2) preserve the weighted mean, (3) reproduce known PAV
    poolings exactly, (4) be idempotent on already-monotone input."""
    from bio_lakehouse_spark.operators.stats import isotonic_fit_ordered

    # classic PAV example: violator (3, 1) pools to 2, then stays
    rows = [(1, 1.0, 1.0), (2, 1.0, 3.0), (3, 1.0, 1.0), (4, 1.0, 4.0)]
    df = spark.createDataFrame(rows, ["t", "w", "y"])
    got = {
        r["t"]: r["y_fit"]
        for r in isotonic_fit_ordered(df, "t", "y", "w").collect()
    }
    assert got == {1: 1.0, 2: 2.0, 3: 2.0, 4: 4.0}

    # weighted pooling: (3 w=1, 1 w=3) pools to 1.5
    rows = [(1, 1.0, 0.0), (2, 1.0, 3.0), (3, 3.0, 1.0)]
    df = spark.createDataFrame(rows, ["t", "w", "y"])
    out = isotonic_fit_ordered(df, "t", "y", "w").orderBy("t").collect()
    fits = [r["y_fit"] for r in out]
    assert fits == [0.0, 1.5, 1.5]
    assert all(a <= b + 1e-12 for a, b in zip(fits, fits[1:]))
    assert abs(
        sum(r["w"] * r["y_fit"] for r in out)
        - sum(r["w"] * r["y"] for r in out)
    ) < 1e-9

    # idempotence on monotone input
    rows = [(i, 2.0, float(i)) for i in range(1, 7)]
    df = spark.createDataFrame(rows, ["t", "w", "y"])
    out = isotonic_fit_ordered(df, "t", "y", "w").orderBy("t").collect()
    assert [r["y_fit"] for r in out] == [float(i) for i in range(1, 7)]
