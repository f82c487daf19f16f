"""Driver-side numerics the reference delegates to scipy/statsmodels/
sklearn — re-implemented on numpy (none of those libs ship in this
environment, and the inputs are always small collected series).

- ``linregress``: slope/intercept/r/two-sided p/stderr (ST1 — scipy
  .stats.linregress parity; p via a numerically integrated t CDF).
- ``lowess``: tricube-weighted local linear smoother (ST8 — statsmodels
  lowess(frac) parity in shape; ref insights/timing_correlation.py:
  185-205 falls back to a linear fit exactly like we do for tiny n).
- ``mutual_information``: equal-width-binned MI estimate (ST13 — the
  sklearn ``mutual_info_regression`` role in feature selection; a
  histogram estimator is deterministic and dependency-free).
- ``ridge_closed_form`` + ``walk_forward_cv``: expanding-window CV with
  a naive 7-day-average baseline and MAE/RMSE/R² (ST14 — ref
  models/readiness_predictor/train.py:95-464's harness with ridge in
  place of the GBM zoo).

All functions take/return plain numpy arrays — the Spark side's job is
producing the small feature tables these consume.
"""

from __future__ import annotations

import math

import numpy as np


def _t_sf(t: float, df: int) -> float:
    """Survival function of Student's t via Simpson-integrated pdf —
    good to ~1e-8 for the df ranges insight stats see."""
    if df <= 0 or not math.isfinite(t):
        return float("nan")
    # Integrate pdf from 0 to |t|; sf = 0.5 - integral.
    a = math.lgamma((df + 1) / 2) - math.lgamma(df / 2) - 0.5 * math.log(
        df * math.pi
    )
    norm = math.exp(a)

    def pdf(x: float) -> float:
        return norm * (1 + x * x / df) ** (-(df + 1) / 2)

    hi = abs(t)
    n = 2000
    xs = np.linspace(0.0, hi, n + 1)
    ys = np.array([pdf(x) for x in xs])
    integral = float(np.trapz(ys, xs))
    return max(0.0, 0.5 - integral)


def linregress(x: np.ndarray, y: np.ndarray) -> dict:
    """scipy.stats.linregress parity: slope, intercept, r, two-sided
    p-value, stderr."""
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    n = len(x)
    if n < 3:
        return {"slope": 0.0, "intercept": float(y.mean()) if n else 0.0,
                "r": 0.0, "p": 1.0, "stderr": 0.0, "n": n}
    mx, my = x.mean(), y.mean()
    cov = ((x - mx) * (y - my)).sum() / (n - 1)
    vx = ((x - mx) ** 2).sum() / (n - 1)
    vy = ((y - my) ** 2).sum() / (n - 1)
    slope = cov / vx if vx > 0 else 0.0
    intercept = my - slope * mx
    r = cov / math.sqrt(vx * vy) if vx > 0 and vy > 0 else 0.0
    r = max(-1.0, min(1.0, r))
    if abs(r) == 1.0:
        p, stderr = 0.0, 0.0
    else:
        t = r * math.sqrt((n - 2) / (1 - r * r))
        p = 2 * _t_sf(abs(t), n - 2)
        stderr = slope / t if t != 0 else float("nan")
    return {"slope": float(slope), "intercept": float(intercept),
            "r": float(r), "p": float(p), "stderr": float(stderr), "n": n}


def lowess(
    x: np.ndarray, y: np.ndarray, frac: float = 0.6
) -> np.ndarray:
    """Tricube-weighted local linear smoother evaluated at each x
    (one iteration, no robustness pass — matching the reference's
    usage). Returns fitted values aligned to the sorted-x order of the
    input positions."""
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    n = len(x)
    if n < 5:
        reg = linregress(x, y)
        return reg["slope"] * x + reg["intercept"]
    k = max(2, int(math.ceil(frac * n)))
    fitted = np.empty(n)
    for i in range(n):
        d = np.abs(x - x[i])
        idx = np.argsort(d)[:k]
        dmax = d[idx].max()
        w = (1 - (d[idx] / (dmax if dmax > 0 else 1.0)) ** 3) ** 3
        w = np.clip(w, 0, None)
        xw, yw = x[idx], y[idx]
        sw = w.sum()
        mx = (w * xw).sum() / sw
        my = (w * yw).sum() / sw
        vx = (w * (xw - mx) ** 2).sum()
        if vx > 0:
            b = (w * (xw - mx) * (yw - my)).sum() / vx
            fitted[i] = my + b * (x[i] - mx)
        else:
            fitted[i] = my
    return fitted


def mutual_information(
    x: np.ndarray, y: np.ndarray, bins: int = 8
) -> float:
    """Histogram MI estimate in nats — deterministic stand-in for
    mutual_info_regression in the corr-filtered top-k selection."""
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    mask = np.isfinite(x) & np.isfinite(y)
    x, y = x[mask], y[mask]
    if len(x) < 4:
        return 0.0
    joint, _, _ = np.histogram2d(x, y, bins=bins)
    p = joint / joint.sum()
    px = p.sum(axis=1, keepdims=True)
    py = p.sum(axis=0, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        terms = p * np.log(p / (px * py))
    return float(np.nansum(terms))


def select_features(
    X: np.ndarray,
    y: np.ndarray,
    names: list[str],
    corr_threshold: float = 0.85,
    top_k: int = 10,
    exclude: tuple[str, ...] = (),
) -> list[str]:
    """ST13 (ref models/readiness_predictor/feature_selection.py:21-158):
    rank by MI against the target, drop one of each pairwise-|r|>0.85
    pair keeping the higher-MI member, exclude leaky names, take top-k.
    """
    keep = [i for i, n in enumerate(names) if n not in exclude]
    mi = {i: mutual_information(X[:, i], y) for i in keep}
    order = sorted(keep, key=lambda i: -mi[i])
    chosen: list[int] = []
    for i in order:
        ok = True
        for j in chosen:
            xi, xj = X[:, i], X[:, j]
            mask = np.isfinite(xi) & np.isfinite(xj)
            if mask.sum() >= 3:
                r = np.corrcoef(xi[mask], xj[mask])[0, 1]
                if np.isfinite(r) and abs(r) > corr_threshold:
                    ok = False
                    break
        if ok:
            chosen.append(i)
        if len(chosen) >= top_k:
            break
    return [names[i] for i in chosen]


def ridge_closed_form(
    X: np.ndarray, y: np.ndarray, alpha: float = 1.0
) -> np.ndarray:
    """(XᵀX + αI)⁻¹ Xᵀy with an intercept column appended (the
    intercept itself is not penalized)."""
    Xb = np.column_stack([X, np.ones(len(X))])
    reg = alpha * np.eye(Xb.shape[1])
    reg[-1, -1] = 0.0
    return np.linalg.solve(Xb.T @ Xb + reg, Xb.T @ y)


def _tree_fit(
    X: np.ndarray,
    residual: np.ndarray,
    max_depth: int,
    min_samples_leaf: int,
    importances: np.ndarray,
) -> dict:
    """Greedy variance-reduction regression tree (the GBM base
    learner). Accumulates each split's weighted SSE decrease into
    ``importances[feature]`` — sklearn's impurity-based importance."""
    n = len(residual)
    node = {"value": float(residual.mean())}
    if max_depth == 0 or n < 2 * min_samples_leaf:
        return node
    sse = float(((residual - residual.mean()) ** 2).sum())
    best = None
    for f in range(X.shape[1]):
        order = np.argsort(X[:, f], kind="stable")
        xs, rs = X[order, f], residual[order]
        csum = np.cumsum(rs)
        csq = np.cumsum(rs**2)
        total, total_sq = csum[-1], csq[-1]
        for i in range(min_samples_leaf, n - min_samples_leaf + 1):
            if xs[i - 1] == xs[min(i, n - 1)]:
                continue  # can't split between equal values
            ls, lsq = csum[i - 1], csq[i - 1]
            rs_, rsq = total - ls, total_sq - lsq
            child_sse = (lsq - ls**2 / i) + (rsq - rs_**2 / (n - i))
            gain = sse - child_sse
            if best is None or gain > best[0] + 1e-12:
                thresh = (xs[i - 1] + xs[i]) / 2.0
                best = (gain, f, thresh)
    if best is None or best[0] <= 1e-12:
        return node
    gain, f, thresh = best
    importances[f] += gain
    left = X[:, f] <= thresh
    node.update(
        feature=int(f),
        threshold=float(thresh),
        left=_tree_fit(X[left], residual[left], max_depth - 1,
                       min_samples_leaf, importances),
        right=_tree_fit(X[~left], residual[~left], max_depth - 1,
                        min_samples_leaf, importances),
    )
    return node


def _tree_predict(node: dict, X: np.ndarray) -> np.ndarray:
    out = np.full(len(X), node["value"])
    if "feature" in node:
        left = X[:, node["feature"]] <= node["threshold"]
        if left.any():
            out[left] = _tree_predict(node["left"], X[left])
        if (~left).any():
            out[~left] = _tree_predict(node["right"], X[~left])
    return out


def gbm_fit(
    X: np.ndarray,
    y: np.ndarray,
    n_estimators: int = 50,
    learning_rate: float = 0.1,
    max_depth: int = 2,
    min_samples_leaf: int = 10,
) -> dict:
    """Least-squares gradient boosting with shallow trees +
    impurity-based feature importances — the numpy stand-in for the
    reference's GradientBoostingRegressor (ref models/
    readiness_predictor/train.py:95-464; sklearn is not in this
    container). Deterministic: no subsampling, stable sorts."""
    X = np.asarray(X, dtype=float)
    y = np.asarray(y, dtype=float)
    f0 = float(y.mean())
    pred = np.full(len(y), f0)
    trees: list[dict] = []
    importances = np.zeros(X.shape[1])
    for _ in range(n_estimators):
        tree = _tree_fit(X, y - pred, max_depth, min_samples_leaf,
                         importances)
        pred = pred + learning_rate * _tree_predict(tree, X)
        trees.append(tree)
    total = importances.sum()
    return {
        "f0": f0,
        "learning_rate": learning_rate,
        "trees": trees,
        "importances": (importances / total if total > 0
                        else importances).tolist(),
    }


def gbm_predict(model: dict, X: np.ndarray) -> np.ndarray:
    X = np.asarray(X, dtype=float)
    pred = np.full(len(X), model["f0"])
    for tree in model["trees"]:
        pred = pred + model["learning_rate"] * _tree_predict(tree, X)
    return pred


def elastic_net_cd(
    X: np.ndarray,
    y: np.ndarray,
    alpha: float = 0.1,
    l1_ratio: float = 0.5,
    n_iters: int = 300,
) -> np.ndarray:
    """ElasticNet via cyclic coordinate descent on standardized
    features (sklearn's objective: 1/(2n)·SSE + α·l1_ratio·|w| +
    α(1−l1_ratio)/2·w²). Returns coefficients on the ORIGINAL scale
    with the intercept last, so ``X @ w[:-1] + w[-1]`` predicts."""
    X = np.asarray(X, dtype=float)
    y = np.asarray(y, dtype=float)
    n, d = X.shape
    mx, sx = X.mean(axis=0), X.std(axis=0)
    sx = np.where(sx > 0, sx, 1.0)
    Xs = (X - mx) / sx
    my = y.mean()
    ys = y - my
    w = np.zeros(d)
    l1 = alpha * l1_ratio
    l2 = alpha * (1 - l1_ratio)
    col_sq = (Xs**2).sum(axis=0) / n
    resid = ys - Xs @ w
    for _ in range(n_iters):
        for j in range(d):
            rho = (Xs[:, j] @ (resid + Xs[:, j] * w[j])) / n
            wj = np.sign(rho) * max(abs(rho) - l1, 0.0) / (
                col_sq[j] + l2
            )
            resid += Xs[:, j] * (w[j] - wj)
            w[j] = wj
    w_orig = w / sx
    intercept = my - float(mx @ w_orig)
    return np.append(w_orig, intercept)


def _fit_predict(
    model: str, Xtr: np.ndarray, ytr: np.ndarray, Xte: np.ndarray,
    alpha: float,
) -> np.ndarray:
    if model == "ridge":
        w = ridge_closed_form(Xtr, ytr, alpha)
        return Xte @ w[:-1] + w[-1]
    if model == "elastic_net":
        w = elastic_net_cd(Xtr, ytr, alpha=max(alpha, 1e-6) * 0.1)
        return Xte @ w[:-1] + w[-1]
    if model == "gbm":
        m = gbm_fit(Xtr, ytr)
        return gbm_predict(m, Xte)
    raise ValueError(f"unknown model {model!r}")


def walk_forward_cv(
    X: np.ndarray,
    y: np.ndarray,
    min_train: int = 30,
    test_window: int = 7,
    alpha: float = 1.0,
    model: str = "ridge",
) -> dict:
    """ST14: expanding-window CV — train on [0, t), test on the next
    ``test_window`` rows, slide; plus the naive 7-day-mean baseline the
    reference benchmarks against (train.py: naive MAE 4.7 vs model
    4.65). ``model`` ∈ {ridge, elastic_net, gbm} — the reference's
    model zoo minus sklearn. Returns per-fold and aggregate
    MAE/RMSE/R²."""
    n = len(y)
    folds = []
    preds, actuals, naives = [], [], []
    t = min_train
    while t + 1 <= n - 1:
        end = min(t + test_window, n)
        # impute train-column means for NaNs (fit-time statistics only)
        Xtr, ytr = X[:t], y[:t]
        col_mean = np.nanmean(Xtr, axis=0)
        col_mean = np.where(np.isfinite(col_mean), col_mean, 0.0)
        Xtr = np.where(np.isfinite(Xtr), Xtr, col_mean)
        Xte = np.where(np.isfinite(X[t:end]), X[t:end], col_mean)
        p = _fit_predict(model, Xtr, ytr, Xte, alpha)
        naive = np.full(end - t, y[max(0, t - 7): t].mean())
        folds.append(
            {
                "train_n": t,
                "test_n": end - t,
                "mae": float(np.abs(p - y[t:end]).mean()),
                "naive_mae": float(np.abs(naive - y[t:end]).mean()),
            }
        )
        preds.extend(p)
        actuals.extend(y[t:end])
        naives.extend(naive)
        t = end
    preds = np.array(preds)
    actuals = np.array(actuals)
    naives = np.array(naives)
    if len(preds) == 0:
        # n_folds was missing here (r12 degenerate sweep): a series
        # shorter than min_train produced zero folds and model_zoo_cv
        # KeyError'd on the aggregate keys instead of reporting an
        # untrainable model.
        return {"folds": [], "mae": None, "rmse": None, "r2": None,
                "naive_mae": None, "n_folds": 0}
    ss_res = ((actuals - preds) ** 2).sum()
    ss_tot = ((actuals - actuals.mean()) ** 2).sum()
    return {
        "folds": folds,
        "mae": float(np.abs(preds - actuals).mean()),
        "rmse": float(np.sqrt(((preds - actuals) ** 2).mean())),
        "r2": float(1 - ss_res / ss_tot) if ss_tot > 0 else None,
        "naive_mae": float(np.abs(naives - actuals).mean()),
        "n_folds": len(folds),
    }


def model_zoo_cv(
    X: np.ndarray,
    y: np.ndarray,
    feature_names: list[str],
    min_train: int = 30,
    test_window: int = 7,
) -> dict:
    """The reference trainer's comparison table (ref models/
    readiness_predictor/train.py:95-464): naive 7-day-mean baseline +
    Ridge + ElasticNet + GBM under the same walk-forward folds, plus
    GBM feature importances from a full-data fit. Returns
    {models: {name: {mae, rmse, r2, naive_mae, n_folds}},
     best_model, importances: [(feature, weight) desc]}."""
    results = {}
    for name in ("ridge", "elastic_net", "gbm"):
        res = walk_forward_cv(
            X, y, min_train=min_train, test_window=test_window, model=name
        )
        results[name] = {
            k: res[k] for k in ("mae", "rmse", "r2", "naive_mae", "n_folds")
        }
    scored = {k: v["mae"] for k, v in results.items()
              if v["mae"] is not None}
    best = min(scored, key=scored.get) if scored else None
    col_mean = np.nanmean(np.asarray(X, dtype=float), axis=0)
    col_mean = np.where(np.isfinite(col_mean), col_mean, 0.0)
    Xi = np.where(np.isfinite(X), X, col_mean)
    model = gbm_fit(Xi, np.asarray(y, dtype=float))
    imp = sorted(
        zip(feature_names, model["importances"]), key=lambda t: -t[1]
    )
    return {"models": results, "best_model": best, "importances": imp}
