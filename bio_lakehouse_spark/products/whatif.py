"""What-If readiness simulator (ST12 — ref insights/what_if.py:84-553).

Model building runs as Spark queries over the engine's own views
(sleep_performance_prediction, workout_type_optimization,
dashboard_30day, overtraining_risk, training_load_daily); the
simulation itself is scalar arithmetic on those small lookup tables,
so it stays on the driver — same split as the reference, with Spark
replacing Athena.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bio_lakehouse_spark.products.numerics import linregress

ENERGY_THRESHOLDS = {
    "peak": {"readiness": 85, "sleep": 88},
    "high": {"readiness": 85, "sleep": 80},
    "moderate": {"readiness": 70, "sleep": 65},
    "low": {"readiness": 50},
}

WORKOUT_TSS_ESTIMATES = {
    "cycling": {"low": 35, "moderate": 65, "high": 110},
    "strength": {"low": 25, "moderate": 50, "high": 80},
    "cycling_and_strength": {"low": 50, "moderate": 90, "high": 150},
    "rest": {"low": 0, "moderate": 0, "high": 0},
}


@dataclass
class Scenario:
    sleep_score: int
    workout_type: str
    workout_intensity: str = "moderate"
    consecutive_workout_days: int = 0


@dataclass
class DayPlan:
    day_offset: int
    sleep_score: int
    workout_type: str
    workout_intensity: str = "moderate"


@dataclass
class SimulationResult:
    predicted_readiness: float
    confidence_range: tuple[float, float]
    energy_state: str
    overtraining_risk: str
    comparison_to_baseline: float
    recommendation: str = ""
    supporting: dict = field(default_factory=dict)


def sleep_bucket_key(sleep_score: float) -> str:
    if sleep_score >= 88:
        return "Excellent (88+)"
    if sleep_score >= 75:
        return "Good (75-87)"
    if sleep_score >= 60:
        return "Fair (60-74)"
    return "Poor (<60)"


def overtraining_penalty(consecutive_days: int) -> float:
    """Escalating penalty schedule: free through day 2, −2/day to 4,
    −3/day to 6, −2/day beyond a −10 base after."""
    if consecutive_days <= 2:
        return 0.0
    if consecutive_days <= 4:
        return -2.0 * (consecutive_days - 2)
    if consecutive_days <= 6:
        return -4.0 - 3.0 * (consecutive_days - 4)
    return -10.0 - 2.0 * (consecutive_days - 6)


def classify_energy(readiness: float, sleep_score: float) -> str:
    t = ENERGY_THRESHOLDS
    if readiness >= t["peak"]["readiness"] and sleep_score >= t["peak"]["sleep"]:
        return "peak"
    if readiness >= t["high"]["readiness"] and sleep_score >= t["high"]["sleep"]:
        return "high"
    if (readiness >= t["moderate"]["readiness"]
            and sleep_score >= t["moderate"]["sleep"]):
        return "moderate"
    if readiness >= t["low"]["readiness"]:
        return "low"
    return "recovery_needed"


def classify_streak_risk(consecutive_days: int) -> str:
    if consecutive_days <= 3:
        return "low"
    if consecutive_days <= 5:
        return "moderate"
    return "high"


def estimate_tss(workout_type: str, intensity: str) -> float:
    """TSS lookup (ref what_if.py:436-443): ``rest`` OR intensity
    ``none`` is 0 regardless of type — a planned cycling day with
    intensity 'none' is a skipped workout, not a moderate ride."""
    wtype = workout_type.lower()
    inten = intensity.lower()
    if wtype == "rest" or inten == "none":
        return 0.0
    est = WORKOUT_TSS_ESTIMATES.get(wtype, {})
    return float(est.get(inten, est.get("moderate", 0)))


def make_recommendation(energy_state: str, overtraining_risk: str) -> str:
    """Deterministic coaching line per (energy, risk) cell
    (ref what_if.py:385-416)."""
    if overtraining_risk == "high":
        return (
            "Your consecutive workout streak suggests high overtraining "
            "risk. A rest day or light recovery session is strongly "
            "recommended."
        )
    if energy_state in ("recovery_needed", "low"):
        return (
            "Predicted energy is low. Consider a rest day or light "
            "activity to allow recovery before pushing harder."
        )
    if energy_state == "peak":
        return (
            "Conditions look ideal for a high-intensity session. "
            "This is a great day to push your limits."
        )
    if energy_state == "high":
        return (
            "Good conditions for a solid workout. Moderate-to-high "
            "intensity should be well-tolerated."
        )
    if overtraining_risk == "moderate":
        return (
            "You're in a moderate training streak. Consider alternating "
            "intensity or adding a recovery day soon."
        )
    return (
        "Moderate energy predicted. A moderate workout should be fine, "
        "but listen to your body."
    )


def summarize_plan(projections: list[dict]) -> str:
    """Natural-language multi-day summary (ref what_if.py:525-553):
    trend from first→last prediction (±3 band), low-energy day
    callouts, CTL movement."""
    if not projections:
        return "No days planned."
    first = projections[0]["predicted_readiness"]
    last = projections[-1]["predicted_readiness"]
    trend = "stays steady"
    if last > first + 3:
        trend = "trends upward"
    elif last < first - 3:
        trend = "trends downward"
    low = [
        p for p in projections
        if p["energy_state"] in ("low", "recovery_needed")
    ]
    low_warning = ""
    if low:
        names = ", ".join(f"day +{p['day_offset']}" for p in low)
        low_warning = f" Low energy on {names} — consider rest."
    return (
        f"Over the {len(projections)}-day plan, readiness {trend} from "
        f"{first:.0f} to {last:.0f}.{low_warning} "
        f"CTL moves {projections[0]['projected_ctl']:.0f} → "
        f"{projections[-1]['projected_ctl']:.0f}."
    )


class WhatIfSimulator:
    """Builds its lookup tables from view DataFrames once, then answers
    arbitrarily many scenarios without touching the cluster."""

    def __init__(
        self,
        sleep_prediction: DataFrame,
        workout_type_opt: DataFrame,
        dashboard: DataFrame,
        training_load: DataFrame,
    ) -> None:
        pairs = (
            sleep_prediction.filter(
                F.col("prev_night_sleep").isNotNull()
                & F.col("next_day_readiness").isNotNull()
            )
            .select("prev_night_sleep", "sleep_quality", "next_day_readiness")
            .toPandas()
        )
        import numpy as np

        if len(pairs) >= 5:
            self.regression = linregress(
                pairs["prev_night_sleep"].to_numpy(dtype=float),
                pairs["next_day_readiness"].to_numpy(dtype=float),
            )
            self.regression["valid"] = True
            self.regression["n"] = len(pairs)
        else:
            self.regression = {
                "valid": False, "slope": 0.0, "intercept": 0.0,
                "n": len(pairs),
            }
        self.sleep_buckets = {
            str(q): {
                "mean": round(float(g["next_day_readiness"].mean()), 1),
                "std": round(float(g["next_day_readiness"].std()), 1)
                if len(g) > 1 else 10.0,
                "n": len(g),
            }
            for q, g in pairs.groupby("sleep_quality")
        }

        # Workout-type effects: sample-weighted mean readiness per type.
        wt = (
            workout_type_opt.filter(F.col("avg_readiness_in_bucket").isNotNull())
            .groupBy(F.lower("workout_type").alias("wtype"))
            .agg(
                (
                    F.sum(F.col("avg_readiness_in_bucket") * F.col("sample_days"))
                    / F.sum("sample_days")
                ).alias("mean_readiness")
            )
            .toPandas()
        )
        self.workout_effects = {
            r["wtype"]: round(float(r["mean_readiness"]), 1)
            for _, r in wt.iterrows()
        }

        base = dashboard.filter(F.col("readiness_score").isNotNull())
        row = base.agg(
            F.round(F.avg("readiness_score"), 1).alias("mean_readiness"),
            F.round(F.avg("sleep_score"), 1).alias("mean_sleep"),
            F.count(F.lit(1)).alias("total_days"),
        ).collect()[0]
        latest = (
            base.filter(F.col("readiness_7day_avg").isNotNull())
            .orderBy(F.desc("date"))
            .limit(1)
            .collect()
        )
        self.baseline = {
            "mean_readiness": float(row["mean_readiness"] or 75.0),
            "mean_sleep": float(row["mean_sleep"] or 75.0),
            "avg_readiness_7d": round(
                float(latest[0]["readiness_7day_avg"])
                if latest else float(row["mean_readiness"] or 75.0), 1
            ),
            "total_days": int(row["total_days"]),
        }

        # Seed CTL/ATL from the TSS history via the true EMA recurrence
        # (the exact-ewm semantics, W10 — insights parity).
        tss = [
            float(r["tss"])
            for r in training_load.filter(F.col("tss").isNotNull())
            .orderBy("date")
            .select("tss")
            .collect()
        ]
        ctl = atl = 0.0
        for v in tss:
            ctl += (v - ctl) * (2.0 / 43)
            atl += (v - atl) * (2.0 / 8)
        self.starting_loads = {"ctl": round(ctl, 1), "atl": round(atl, 1)}

    # ------------------------------------------------------------------
    def workout_delta(self, workout_type: str) -> float:
        wtype = workout_type.lower()
        if wtype in ("rest", "rest day"):
            rest = self.workout_effects.get("rest day",
                                            self.workout_effects.get("rest"))
            if rest is not None:
                return rest - self.baseline["mean_readiness"]
            return 1.5
        if wtype in self.workout_effects:
            return self.workout_effects[wtype] - self.baseline["mean_readiness"]
        return -2.0

    def simulate(self, s: Scenario) -> SimulationResult:
        if self.regression["valid"]:
            base = (self.regression["slope"] * s.sleep_score
                    + self.regression["intercept"])
        else:
            base = self.baseline["mean_readiness"]
        delta = self.workout_delta(s.workout_type)
        penalty = overtraining_penalty(s.consecutive_workout_days)
        predicted = max(0.0, min(100.0, base + delta + penalty))
        bucket = self.sleep_buckets.get(sleep_bucket_key(s.sleep_score), {})
        std = bucket.get("std", 10.0)
        energy = classify_energy(predicted, s.sleep_score)
        risk = classify_streak_risk(s.consecutive_workout_days)
        return SimulationResult(
            predicted_readiness=round(predicted, 1),
            confidence_range=(round(predicted - std, 1),
                              round(predicted + std, 1)),
            energy_state=energy,
            overtraining_risk=risk,
            recommendation=make_recommendation(energy, risk),
            comparison_to_baseline=round(
                predicted - self.baseline["avg_readiness_7d"], 1
            ),
            supporting={
                "regression_n": self.regression.get("n", 0),
                "workout_delta": round(delta, 1),
                "overtraining_penalty": round(penalty, 1),
                "sleep_bucket": sleep_bucket_key(s.sleep_score),
            },
        )

    def simulate_multi_day(
        self, plans: list[DayPlan], starting_streak: int = 0
    ) -> list[dict]:
        """Cascading projection: streaks accumulate, CTL/ATL propagate
        via the EMA recurrence, confidence widens 5% per day offset."""
        ctl, atl = self.starting_loads["ctl"], self.starting_loads["atl"]
        consecutive = starting_streak
        out = []
        for plan in sorted(plans, key=lambda p: p.day_offset):
            is_workout = (plan.workout_type.lower() != "rest"
                          and plan.workout_intensity.lower() != "none")
            consecutive = consecutive + 1 if is_workout else 0
            res = self.simulate(
                Scenario(plan.sleep_score, plan.workout_type,
                         plan.workout_intensity, consecutive)
            )
            tss = estimate_tss(plan.workout_type, plan.workout_intensity)
            ctl += (tss - ctl) * (2.0 / 43)
            atl += (tss - atl) * (2.0 / 8)
            lo, hi = res.confidence_range
            spread = (hi - lo) / 2 * (1 + 0.05 * plan.day_offset)
            out.append(
                {
                    "day_offset": plan.day_offset,
                    "predicted_readiness": res.predicted_readiness,
                    "confidence_range": (
                        round(max(0.0, res.predicted_readiness - spread), 1),
                        round(min(100.0, res.predicted_readiness + spread), 1),
                    ),
                    "energy_state": res.energy_state,
                    "overtraining_risk": res.overtraining_risk,
                    "recommendation": res.recommendation,
                    "consecutive_workout_days": consecutive,
                    "estimated_tss": round(tss, 0),
                    "projected_ctl": round(ctl, 1),
                    "projected_atl": round(atl, 1),
                    "projected_tsb": round(ctl - atl, 1),
                }
            )
        return out
