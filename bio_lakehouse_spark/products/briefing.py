"""Morning briefing — latest-row metrics + deltas + recommendation
(ref lambda/morning_briefing/handler.py:137-255, energy guidance
79-134, publish 305-341).

The reference's daily Lambda runs four Athena queries (latest gold
row, energy state, workout recommendation, last-7 TSS), assembles
numbered bullets with a staleness guard, and publishes to SNS. Here
the same four reads run as DataFrame queries over the existing views
(`bio.views.energy_state` / `workout_recommendations` /
`training_load_daily`) — each is an ORDER BY date DESC LIMIT 1/7,
which Spark executes as a TakeOrdered over the date column, no full
sort — and the sink is a text file / returned string instead of SNS.
``as_of`` pins "today" so the staleness check is deterministic in
tests and backfills.
"""

from __future__ import annotations

from datetime import date as _date
from datetime import timedelta
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _safe_float(value, default=None):
    if value is None:
        return default
    try:
        return float(value)
    except (ValueError, TypeError):
        return default


def energy_guidance(e: dict) -> str:
    """Dynamic state guidance with actual numbers (ref handler.py:
    79-134): trend deltas at the ±5 band, 3-day streak context,
    state-specific recommendation."""
    state = e.get("energy_state", "unknown")
    readiness = _safe_float(e.get("readiness_score"))
    sleep = _safe_float(e.get("sleep_score"))
    hrv_bal = _safe_float(e.get("hrv_balance"))
    r_delta = _safe_float(e.get("readiness_delta"), 0)
    s_delta = _safe_float(e.get("sleep_delta"), 0)
    r_3day = _safe_float(e.get("readiness_3day_avg"))

    trend_parts = []
    if r_delta >= 5:
        trend_parts.append(f"readiness up {r_delta:+.0f}")
    elif r_delta <= -5:
        trend_parts.append(f"readiness down {r_delta:+.0f}")
    if s_delta >= 5:
        trend_parts.append(f"sleep up {s_delta:+.0f}")
    elif s_delta <= -5:
        trend_parts.append(f"sleep down {s_delta:+.0f}")
    trend = f" ({', '.join(trend_parts)} vs yesterday)" if trend_parts else ""

    streak = ""
    if r_3day is not None and readiness is not None:
        if r_3day >= 85 and readiness >= 85:
            streak = " You've been consistently high — ride the wave."
        elif r_3day < 65:
            streak = " Multiple low days — prioritize recovery."

    # Vitals string from whatever scores are present — a row can carry
    # an energy_state with a null readiness/sleep score (partial
    # sources), and '{:.0f}'.format(None) raises.
    vital_parts = []
    if readiness is not None:
        vital_parts.append(f"Readiness {readiness:.0f}")
    if sleep is not None:
        vital_parts.append(f"sleep {sleep:.0f}")
    vitals = ", ".join(vital_parts) or f"Energy {state}"

    if state == "peak":
        base = vitals
        if hrv_bal is not None:
            base += f", HRV balance {hrv_bal:.0f}"
        base += (
            f".{trend} All systems go — push hard today "
            f"(HIIT, heavy lifts, sprints)."
        )
        return base + streak
    if state == "high":
        return (
            f"{vitals}.{trend}"
            " Strong day — great for hard cycling, bootcamp, or deep "
            "focus work." + streak
        )
    if state == "moderate":
        return (
            f"{vitals}.{trend}"
            " Solid but not peak — good for endurance rides, strength "
            "training, or steady work." + streak
        )
    if state == "low":
        return (
            f"{vitals}.{trend}"
            " Keep it light — yoga, stretching, or an easy walk."
            + streak
        )
    base = f"Readiness {readiness:.0f}" if readiness else "Low recovery"
    if sleep is not None:
        base += f", sleep {sleep:.0f}"
    base += f".{trend} Rest day recommended — gentle meditation or total rest."
    return base + streak


def _latest(df: DataFrame, n: int = 1) -> list[dict]:
    """ORDER BY date DESC LIMIT n — plans as TakeOrdered (top-k heap
    per partition + driver merge of n rows), never a global sort."""
    return [r.asDict() for r in df.orderBy(F.desc("date")).limit(n).collect()]


def build_briefing(
    gold: DataFrame,
    as_of: str | None = None,
    discovery_runs: DataFrame | None = None,
    max_stale_days: int = 1,
) -> tuple[str, list[str]]:
    """Assemble the morning bullets (ref handler.py:137-255).

    Returns (latest_gold_date, bullets). If the newest gold row is
    more than ``max_stale_days`` behind ``as_of``, returns the
    stale-data alert instead of a normal briefing — the reference's
    freshness guard (handler.py:190-200).
    """
    from bio_lakehouse_spark.bio import views as V

    latest_rows = _latest(
        gold.filter(F.col("readiness_score").isNotNull()).select(
            "date", "readiness_score", "sleep_score",
            "resting_heart_rate_bpm", "hrv_ms", "had_workout",
            "combined_wellness_score",
        )
    )
    if not latest_rows:
        return "?", ["No gold data available."]
    latest_date = str(latest_rows[0]["date"])

    today = _date.fromisoformat(as_of) if as_of else _date.today()
    stale_cutoff = (today - timedelta(days=max_stale_days)).isoformat()
    if latest_date < stale_cutoff:
        days_behind = (today - _date.fromisoformat(latest_date)).days
        return latest_date, [
            f"DATA STALE — Gold data is {days_behind} day(s) behind "
            f"(latest: {latest_date}).",
            "Action needed: export HealthKit + Peloton and run the "
            "daily ingestion pipeline.",
        ]

    bullets: list[str] = []

    # Bullet 1: readiness + sleep with vitals.
    r = latest_rows[0]
    readiness = _safe_float(r["readiness_score"])
    sleep = _safe_float(r["sleep_score"])
    rhr = _safe_float(r["resting_heart_rate_bpm"])
    hrv = _safe_float(r["hrv_ms"])
    parts = []
    if readiness is not None:
        parts.append(f"Readiness {readiness:.0f}")
    if sleep is not None:
        parts.append(f"Sleep {sleep:.0f}")
    if parts:
        vitals = []
        if rhr is not None:
            vitals.append(f"RHR {rhr:.0f}")
        if hrv is not None:
            vitals.append(f"HRV {hrv:.0f}")
        vitals_str = f" ({', '.join(vitals)})" if vitals else ""
        bullets.append(f"{' | '.join(parts)}{vitals_str}")

    # Bullet 2: energy state + dynamic guidance.
    energy_rows = _latest(V.energy_state(gold))
    if energy_rows:
        e = energy_rows[0]
        state_display = str(e.get("energy_state", "unknown")).replace(
            "_", " "
        ).title()
        bullets.append(f"Energy: {state_display} -- {energy_guidance(e)}")

    # Bullet 3: workout recommendation.
    workout_rows = _latest(V.workout_recommendations(gold))
    if workout_rows:
        bullets.append(
            "Workout: "
            + str(workout_rows[0].get("recommendation_text",
                                      "No recommendation available."))
        )

    # Bullet 4: training-load context (yesterday TSS + 7-day avg).
    training_rows = _latest(V.training_load_daily(gold), n=7)
    if len(training_rows) >= 3:
        tss_values = [_safe_float(t.get("tss"), 0.0) for t in training_rows]
        avg_7d = sum(tss_values) / len(tss_values)
        if tss_values[0] > 0:
            bullets.append(
                f"Yesterday's TSS: {tss_values[0]:.0f} | "
                f"7-day avg: {avg_7d:.0f}"
            )

    # Bullet 5: latest correlation discovery, if a runs table is
    # provided and the newest run is < 8 days old (ref handler.py:
    # 258-302 reads the same payload from S3).
    if discovery_runs is not None:
        disc = _latest_discovery(discovery_runs, today)
        if disc:
            bullets.append(f"Discovery: {disc}")

    return latest_date, bullets


def _latest_discovery(runs: DataFrame, today: _date) -> str | None:
    import json

    rows = [
        r.asDict()
        for r in runs.orderBy(F.desc("run_date")).limit(1).collect()
    ]
    if not rows:
        return None
    try:
        run_date = _date.fromisoformat(str(rows[0]["run_date"])[:10])
    except ValueError:
        return None
    if (today - run_date).days > 7:
        return None
    payload = json.loads(rows[0]["payload"])
    corr = payload.get("correlations") or []
    if not corr:
        return None
    top = corr[0]
    lag_txt = f" with a {top['lag']}-day lag" if top.get("lag") else ""
    return (
        f"{top['metric_a']} ↔ {top['metric_b']}{lag_txt} "
        f"(ρ={top['rho']:.2f}, {top['strength']})"
    )


def render_briefing(latest_date: str, bullets: list[str],
                    as_of: str | None = None) -> str:
    """Plain-text render (ref handler.py:305-341 SNS body)."""
    is_stale = any("DATA STALE" in b for b in bullets)
    header = (
        "STALE DATA — Action Needed" if is_stale else "Morning Briefing"
    )
    lines = [
        header + (f" ({as_of})" if as_of else ""),
        "Good morning! Here's your bio-optimization briefing.",
        f"(Latest data: {latest_date})",
        "",
    ]
    lines += [f"{i}. {b}" for i, b in enumerate(bullets, 1)]
    lines += ["", "---", "Bio Lakehouse Morning Briefing",
              "Data: Oura Ring + Peloton + Apple Health"]
    return "\n".join(lines)


def publish_briefing(text: str, path: str | Path) -> str:
    """File-sink publish — the container's stand-in for the SNS topic
    (S18 alert-sink analog)."""
    out = Path(path)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(text, encoding="utf-8")
    return str(out)
