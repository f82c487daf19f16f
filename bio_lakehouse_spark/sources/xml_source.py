"""HealthKit export.xml streaming parser (S10 — ref
scripts/parse_healthkit_export.py).

The reference streams a 2 GB+ XML with lxml and emits four
Hive-partitioned CSV trees that the Spark normalizers then consume —
an out-of-engine feeder. This port uses stdlib
``xml.etree.ElementTree.iterparse`` (lxml isn't in this container;
iterparse is the same constant-memory pattern), keeps the HK-type →
metric maps, the per-day aggregation policies (last / mean / sum),
unit conversions (kg→lb, km→mi), the ``since`` incremental filter, and
the same four output contracts the fixtures/normalizers use.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from collections import defaultdict
from pathlib import Path

VITAL_TYPES = {
    "HKQuantityTypeIdentifierRestingHeartRate": "resting_heart_rate_bpm",
    "HKQuantityTypeIdentifierHeartRateVariabilitySDNN": "hrv_ms",
    "HKQuantityTypeIdentifierVO2Max": "vo2_max",
    "HKQuantityTypeIdentifierOxygenSaturation": "blood_oxygen_pct",
    "HKQuantityTypeIdentifierRespiratoryRate": "respiratory_rate",
}

BODY_TYPES = {
    "HKQuantityTypeIdentifierBodyMass": "weight_lbs",
    "HKQuantityTypeIdentifierBodyFatPercentage": "body_fat_pct",
    "HKQuantityTypeIdentifierBodyMassIndex": "bmi",
    "HKQuantityTypeIdentifierLeanBodyMass": "lean_body_mass_lbs",
}

# last = final reading of the day wins; mean = average of all readings.
VITAL_AGGREGATION = {
    "resting_heart_rate_bpm": "last",
    "hrv_ms": "last",
    "vo2_max": "last",
    "blood_oxygen_pct": "mean",
    "respiratory_rate": "mean",
}

KG_TO_LBS = 2.20462
KM_TO_MI = 0.621371


def normalize_workout_type(hk_type: str) -> str:
    """HKWorkoutActivityTypeFunctionalStrengthTraining →
    functional_strength_training."""
    if not hk_type:
        return "unknown"
    name = hk_type.replace("HKWorkoutActivityType", "")
    return re.sub(r"(?<=[a-z0-9])(?=[A-Z])", "_", name).lower()


def _day(date_str: str | None) -> str | None:
    return date_str[:10] if date_str else None


def _conv(value: float, unit: str | None) -> float:
    if unit == "kg":
        return value * KG_TO_LBS
    if unit == "km":
        return value * KM_TO_MI
    if unit == "%":  # HK stores oxygen saturation as 0-1 fraction
        return value
    return value


def parse_export(
    xml_path: str | Path, since: str | None = None
) -> dict[str, list[dict]]:
    """Single streaming pass over export.xml → four row lists keyed
    ``daily_vitals | workouts | body | mindfulness``. Elements are
    cleared as consumed so memory stays flat regardless of file size.
    """
    vitals: dict[str, dict[str, list[float]]] = defaultdict(
        lambda: defaultdict(list)
    )
    body: dict[str, dict[str, list[float]]] = defaultdict(
        lambda: defaultdict(list)
    )
    workouts: list[dict] = []
    mindful: dict[str, dict[str, float]] = defaultdict(
        lambda: {"duration_minutes": 0.0, "session_count": 0}
    )

    for _, elem in ET.iterparse(str(xml_path), events=("end",)):
        tag = elem.tag
        if tag == "Record":
            rtype = elem.get("type")
            day = _day(elem.get("startDate"))
            if day is None or (since and day < since):
                elem.clear()
                continue
            try:
                value = float(elem.get("value"))
            except (TypeError, ValueError):
                elem.clear()
                continue
            unit = elem.get("unit")
            if rtype in VITAL_TYPES:
                metric = VITAL_TYPES[rtype]
                if metric == "blood_oxygen_pct" and value <= 1.0:
                    value *= 100.0
                vitals[day][metric].append(value)
            elif rtype in BODY_TYPES:
                body[day][BODY_TYPES[rtype]].append(_conv(value, unit))
            elif rtype == "HKCategoryTypeIdentifierMindfulSession":
                pass  # mindful sessions are Category records without value
        elif tag == "Workout":
            day = _day(elem.get("startDate"))
            if day is not None and not (since and day < since):
                wtype = normalize_workout_type(
                    elem.get("workoutActivityType", "")
                )
                dur = elem.get("duration")
                dist = elem.get("totalDistance")
                cal = elem.get("totalEnergyBurned")
                dist_unit = elem.get("totalDistanceUnit")
                if wtype == "mind_and_body" or wtype == "mindfulness":
                    m = mindful[day]
                    m["duration_minutes"] += float(dur or 0)
                    m["session_count"] += 1
                else:
                    workouts.append(
                        {
                            "date": day,
                            "start_time": elem.get("startDate"),
                            "end_time": elem.get("endDate"),
                            "workout_type": wtype,
                            "duration_minutes": float(dur) if dur else None,
                            "calories_burned": int(float(cal)) if cal else None,
                            "avg_heart_rate": None,
                            "distance_mi": _conv(float(dist), dist_unit)
                            if dist else None,
                            "source_app": elem.get("sourceName", ""),
                        }
                    )
        elem.clear()

    vit_rows = []
    for day in sorted(vitals):
        row: dict = {"date": day}
        for metric, policy in VITAL_AGGREGATION.items():
            vals = vitals[day].get(metric)
            if not vals:
                row[metric] = None
            elif policy == "last":
                row[metric] = vals[-1]
            else:
                row[metric] = sum(vals) / len(vals)
        vit_rows.append(row)
    body_rows = []
    for day in sorted(body):
        row = {"date": day, "device_name": "healthkit"}
        for metric in ("weight_lbs", "body_fat_pct", "bmi",
                       "lean_body_mass_lbs"):
            vals = body[day].get(metric)
            row[metric] = vals[-1] if vals else None
        body_rows.append(row)
    mind_rows = [
        {"date": day, **vals} for day, vals in sorted(mindful.items())
    ]
    return {
        "daily_vitals": vit_rows,
        "workouts": workouts,
        "body": body_rows,
        "mindfulness": mind_rows,
    }


def write_bronze_csvs(
    parsed: dict[str, list[dict]], bronze_root: str | Path
) -> dict[str, int]:
    """Emit the four Hive-partitioned CSV trees
    (``healthkit/<sub>/year=YYYY/month=MM/data.csv``) in the exact
    layout the HealthKit normalizer scans."""
    headers = {
        "daily_vitals": ["date", "resting_heart_rate_bpm", "hrv_ms",
                         "vo2_max", "blood_oxygen_pct", "respiratory_rate"],
        "workouts": ["date", "start_time", "end_time", "workout_type",
                     "duration_minutes", "calories_burned", "avg_heart_rate",
                     "distance_mi", "source_app"],
        "body": ["date", "weight_lbs", "body_fat_pct", "bmi",
                 "lean_body_mass_lbs", "device_name"],
        "mindfulness": ["date", "duration_minutes", "session_count"],
    }
    counts = {}
    for sub, rows in parsed.items():
        by_month: dict[str, list[dict]] = defaultdict(list)
        for r in rows:
            by_month[r["date"][:7]].append(r)
        for month, mrows in by_month.items():
            y, m = month.split("-")
            out = (Path(bronze_root) / f"healthkit/{sub}/year={y}/month={m}"
                   / "data.csv")
            out.parent.mkdir(parents=True, exist_ok=True)
            hdr = headers[sub]
            lines = [",".join(hdr)]
            for r in mrows:
                lines.append(
                    ",".join("" if r.get(c) is None else str(r.get(c))
                             for c in hdr)
                )
            out.write_text("\n".join(lines) + "\n", encoding="utf-8")
        counts[sub] = len(rows)
    return counts
