"""Correlation-discovery scanner (ST4/ST5 — ref
insights_engine/insights/correlation_discovery.py:253-536).

All metric pairs × lags 0..max_lags-1 Spearman-scanned with Bonferroni
correction, trivial-pair exclusion, strength bands and
confidence = |ρ|·(1−p_corrected); plus the 75th-percentile threshold
scan (trigger ≥ q75 vs below → next-day outcome delta, Mann-Whitney).

Spark prunes and collects the daily metric frame (daily grain — tiny
by construction even when the raw data is 100 TB; the multi-entity
version runs this same scan per entity via ``applyInPandas``); the
pair loop is numpy on the driver, exactly the reference's split.
Persistence is an append-only parquet table instead of S3 JSON.
"""

from __future__ import annotations

import itertools
import math
from dataclasses import asdict, dataclass

import numpy as np
import pandas as pd

from bio_lakehouse_spark.products.numerics import _t_sf

TRIVIAL_PAIRS = {
    frozenset(p)
    for p in [
        ("readiness_score", "combined_wellness_score"),
        ("sleep_score", "combined_wellness_score"),
        ("total_output_kj", "peloton_calories"),
        ("total_workout_minutes", "peloton_calories"),
        ("active_calories", "steps"),
        ("daily_calories", "protein_g"),
        ("daily_calories", "carbs_g"),
        ("daily_calories", "fat_g"),
    ]
}

TRIGGER_METRICS = [
    "total_output_kj", "steps", "active_calories", "daily_calories",
    "protein_g", "total_workout_minutes", "deep_sleep_score",
    "total_sleep_score",
]
OUTCOME_METRICS = [
    "readiness_score", "sleep_score", "hrv_ms", "resting_heart_rate_bpm",
    "combined_wellness_score",
]


@dataclass
class CorrelationFinding:
    metric_a: str
    metric_b: str
    lag: int
    rho: float
    p_value: float
    p_corrected: float
    n_samples: int
    strength: str
    confidence: float


@dataclass
class ThresholdFinding:
    trigger_metric: str
    outcome_metric: str
    threshold: float
    mean_above: float
    mean_below: float
    delta: float
    p_value: float
    n_above: int
    n_below: int
    confidence: float


def classify_strength(rho: float) -> str:
    r = abs(rho)
    if r >= 0.7:
        return "very_strong"
    if r >= 0.5:
        return "strong"
    if r >= 0.3:
        return "moderate"
    return "weak"


def _avg_rank(v: np.ndarray) -> np.ndarray:
    order = np.argsort(v, kind="mergesort")
    ranks = np.empty(len(v), dtype=float)
    sv = v[order]
    i = 0
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    return ranks


def spearman_np(a: np.ndarray, b: np.ndarray) -> tuple[float, float]:
    """ρ + two-sided p (t approximation — scipy's default)."""
    ra, rb = _avg_rank(a), _avg_rank(b)
    ra = ra - ra.mean()
    rb = rb - rb.mean()
    denom = math.sqrt((ra**2).sum() * (rb**2).sum())
    if denom == 0:
        return float("nan"), 1.0
    rho = float((ra * rb).sum() / denom)
    n = len(a)
    if abs(rho) >= 1.0:
        return rho, 0.0
    t = rho * math.sqrt((n - 2) / (1 - rho * rho))
    return rho, 2 * _t_sf(abs(t), n - 2)


def mann_whitney_np(a: np.ndarray, b: np.ndarray) -> tuple[float, float]:
    """U1 + two-sided p via tie-corrected normal approximation."""
    pooled = np.concatenate([a, b])
    ranks = _avg_rank(pooled)
    n1, n2 = len(a), len(b)
    r1 = ranks[:n1].sum()
    u1 = r1 - n1 * (n1 + 1) / 2
    mu = n1 * n2 / 2
    _, counts = np.unique(pooled, return_counts=True)
    tie = (counts**3 - counts).sum()
    n = n1 + n2
    sigma2 = (n1 * n2 / 12) * ((n + 1) - tie / (n * (n - 1)))
    if sigma2 <= 0:
        return float(u1), 1.0
    z = (u1 - mu) / math.sqrt(sigma2)
    return float(u1), math.erfc(abs(z) / math.sqrt(2))


def scan_correlations(
    df: pd.DataFrame,
    metrics: list[str],
    max_lags: int = 3,
    min_samples: int = 14,
    min_rho: float = 0.3,
    trivial: set[frozenset] = TRIVIAL_PAIRS,
) -> list[CorrelationFinding]:
    valid = [
        c for c in metrics
        if c in df.columns and df[c].notna().sum() >= min_samples
    ]
    pairs = [
        (a, b)
        for a, b in itertools.combinations(valid, 2)
        if frozenset({a, b}) not in trivial
    ]
    num_tests = max(len(pairs) * max_lags, 1)
    findings = []
    for a, b in pairs:
        for lag in range(max_lags):
            av = df[a].to_numpy(dtype=float)
            bv = df[b].to_numpy(dtype=float)
            if lag:
                av, bv = av[:-lag], bv[lag:]
            mask = np.isfinite(av) & np.isfinite(bv)
            ac, bc = av[mask], bv[mask]
            if len(ac) < min_samples or ac.std() == 0 or bc.std() == 0:
                continue
            rho, p = spearman_np(ac, bc)
            if math.isnan(rho):
                continue
            p_corr = min(p * num_tests, 1.0)
            if abs(rho) < min_rho or p_corr >= 0.05:
                continue
            findings.append(
                CorrelationFinding(
                    metric_a=a, metric_b=b, lag=lag, rho=rho, p_value=p,
                    p_corrected=p_corr, n_samples=len(ac),
                    strength=classify_strength(rho),
                    confidence=abs(rho) * (1 - p_corr),
                )
            )
    findings.sort(key=lambda f: -f.confidence)
    return findings


def scan_thresholds(
    df: pd.DataFrame,
    triggers: list[str] = TRIGGER_METRICS,
    outcomes: list[str] = OUTCOME_METRICS,
    min_samples: int = 5,
    min_delta: float = 1.0,
) -> list[ThresholdFinding]:
    findings = []
    trig = [c for c in triggers if c in df.columns]
    outc = [c for c in outcomes if c in df.columns]
    for t in trig:
        thresh = df[t].quantile(0.75)
        if pd.isna(thresh) or thresh == 0:
            continue
        for o in outc:
            if t == o:
                continue
            tv = df[t].to_numpy(dtype=float)[:-1]
            ov = df[o].to_numpy(dtype=float)[1:]
            mask = np.isfinite(tv) & np.isfinite(ov)
            tc, oc = tv[mask], ov[mask]
            above = oc[tc >= thresh]
            below = oc[tc < thresh]
            if len(above) < min_samples or len(below) < min_samples:
                continue
            delta = float(above.mean() - below.mean())
            if abs(delta) < min_delta:
                continue
            _, p = mann_whitney_np(above, below)
            findings.append(
                ThresholdFinding(
                    trigger_metric=t, outcome_metric=o,
                    threshold=float(thresh),
                    mean_above=float(above.mean()),
                    mean_below=float(below.mean()),
                    delta=delta, p_value=p,
                    n_above=len(above), n_below=len(below),
                    confidence=abs(delta) / max(abs(below.mean()), 1)
                    * (1 - p),
                )
            )
    findings.sort(key=lambda f: -f.confidence)
    return findings


def discover(
    gold_df,
    metrics: list[str],
    max_lags: int = 3,
    run_date: str | None = None,
    persist_path: str | None = None,
) -> dict:
    """Full scan over a gold DataFrame: Spark prunes columns + orders
    by date, the scan runs on the collected frame, and the result
    optionally appends to a parquet discovery-runs table."""
    from pyspark.sql import functions as F

    cols = ["date"] + [c for c in metrics if c in gold_df.columns]
    pdf = gold_df.select(cols).orderBy("date").toPandas()
    corr = scan_correlations(pdf, metrics, max_lags=max_lags)
    thr = scan_thresholds(pdf)
    result = {
        "run_date": run_date or (str(pdf["date"].max()) if len(pdf) else ""),
        "total_rows": len(pdf),
        "pairs_tested": len(corr),
        "correlations": [asdict(c) for c in corr],
        "thresholds": [asdict(t) for t in thr],
    }
    if persist_path:
        import json

        spark = gold_df.sparkSession
        spark.createDataFrame(
            [
                {
                    "run_date": result["run_date"],
                    "total_rows": result["total_rows"],
                    "payload": json.dumps(result),
                }
            ],
            schema="run_date string, total_rows long, payload string",
        ).coalesce(1).write.mode("append").parquet(persist_path)
    return result


DISCOVERY_ROW_SCHEMA = (
    "user_id long, metric_a string, metric_b string, lag int, "
    "rho double, p_corrected double, n_samples int, strength string, "
    "confidence double"
)


def discover_per_entity(
    daily_metrics,
    metrics: list[str],
    entity_col: str = "user_id",
    max_lags: int = 3,
    min_samples: int = 14,
    min_rho: float = 0.3,
):
    """The 100 TB form of the discovery scan: the SAME numpy pair scan
    (`scan_correlations`) runs inside an Arrow-batched
    ``applyInPandas`` group per entity — each entity's daily frame is
    small by construction, every entity scans in parallel across
    executors, and nothing is ever collected to the driver.

    ``daily_metrics``: one row per (entity, date) with the metric
    columns; returns one row per surviving (entity, pair, lag).
    """
    import pandas as pd

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        uid = pdf[entity_col].iloc[0]
        pdf = pdf.sort_values("date")
        found = scan_correlations(
            pdf, metrics, max_lags=max_lags, min_samples=min_samples,
            min_rho=min_rho, trivial=set(),
        )
        return pd.DataFrame(
            [
                {
                    "user_id": uid,
                    "metric_a": f.metric_a,
                    "metric_b": f.metric_b,
                    "lag": f.lag,
                    "rho": f.rho,
                    "p_corrected": f.p_corrected,
                    "n_samples": f.n_samples,
                    "strength": f.strength,
                    "confidence": f.confidence,
                }
                for f in found
            ],
            columns=[
                "user_id", "metric_a", "metric_b", "lag", "rho",
                "p_corrected", "n_samples", "strength", "confidence",
            ],
        )

    return daily_metrics.groupBy(entity_col).applyInPandas(
        scan, schema=DISCOVERY_ROW_SCHEMA
    )
