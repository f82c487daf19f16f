"""HealthKit export.xml streaming parser (S10 — ref
scripts/parse_healthkit_export.py).

The reference streams a 2 GB+ XML with lxml and emits four
Hive-partitioned CSV trees that the Spark normalizers then consume —
an out-of-engine feeder. This port uses stdlib
``xml.etree.ElementTree.iterparse`` (lxml isn't in this container;
iterparse is the same constant-memory pattern) and keeps the
reference's full semantics (parse_healthkit_export.py:306-446):

* HK-type → metric maps incl. BMR + standing height
  (BODY_TYPES, ref :64-72);
* per-day aggregation policies last / mean (ref :75-80) with the
  reference's rounding (vitals 2 dp, SpO2 fraction→pct at 1 dp,
  body 1 dp, mindfulness duration 1 dp — ref :224-296);
* mindfulness minutes from MindfulSession **Record** start→end
  timestamps (ref :360-368 — these are Category records with NO
  ``value`` attribute, so the duration comes from the interval);
* workout enrichment from WorkoutStatistics children: avg heart rate
  + ActiveEnergyBurned fallback (ref :370-430), Peloton source
  filter (ref :395-397), km→mi with unknown units assumed km
  (ref :409-417), ISO-8601 start/end times (ref :112-126);
* the ``since`` incremental date filter and the same four output
  contracts (daily_vitals | workouts | body | mindfulness) in the
  reference's year=/month=/day= CSV layout (ref :457-491).
"""

from __future__ import annotations

import csv
import re
import xml.etree.ElementTree as ET
from collections import defaultdict
from datetime import datetime
from pathlib import Path

VITAL_TYPES = {
    "HKQuantityTypeIdentifierRestingHeartRate": "resting_heart_rate_bpm",
    "HKQuantityTypeIdentifierHeartRateVariabilitySDNN": "hrv_ms",
    "HKQuantityTypeIdentifierVO2Max": "vo2_max",
    "HKQuantityTypeIdentifierOxygenSaturation": "blood_oxygen_pct",
    "HKQuantityTypeIdentifierRespiratoryRate": "respiratory_rate",
}

# Short field names; unit conversion happens at aggregation time on
# the last-of-day (value, unit) pair, exactly like the reference
# accumulator (parse_healthkit_export.py:183-190, 224-281).
BODY_TYPES = {
    "HKQuantityTypeIdentifierBodyMass": "weight",
    "HKQuantityTypeIdentifierBodyFatPercentage": "body_fat_pct",
    "HKQuantityTypeIdentifierBodyMassIndex": "bmi",
    "HKQuantityTypeIdentifierLeanBodyMass": "lean_body_mass",
    "HKQuantityTypeIdentifierBasalEnergyBurned": "bmr",
    "HKQuantityTypeIdentifierAppleStandingHeight": "height",
}

MINDFUL_TYPE = "HKCategoryTypeIdentifierMindfulSession"

# last = final reading of the day wins; mean = average of all readings.
VITAL_AGGREGATION = {
    "resting_heart_rate_bpm": "last",
    "hrv_ms": "last",
    "vo2_max": "last",
    "blood_oxygen_pct": "mean",
    "respiratory_rate": "mean",
}

DAILY_VITALS_HEADERS = [
    "date", "resting_heart_rate_bpm", "hrv_ms", "vo2_max",
    "blood_oxygen_pct", "respiratory_rate",
]
WORKOUTS_HEADERS = [
    "date", "start_time", "end_time", "workout_type", "duration_minutes",
    "calories_burned", "avg_heart_rate", "distance_mi", "source_app",
]
BODY_HEADERS = [
    "date", "weight_lbs", "body_fat_pct", "bmi", "lean_body_mass_lbs",
    "bmr", "height_in", "device_name",
]
MINDFULNESS_HEADERS = ["date", "duration_minutes", "session_count"]

KG_TO_LBS = 2.20462
KM_TO_MI = 0.621371

# Children of <Workout> that must survive until the parent's end event
# so the avg-HR / calories findall can see them (ref :379-381).
_WORKOUT_CHILD_TAGS = {
    "WorkoutStatistics", "MetadataEntry", "WorkoutEvent", "WorkoutRoute",
}


def normalize_workout_type(hk_type: str) -> str:
    """HKWorkoutActivityTypeFunctionalStrengthTraining →
    functional_strength_training."""
    if not hk_type:
        return "unknown"
    name = hk_type.replace("HKWorkoutActivityType", "")
    return re.sub(r"(?<=[a-z0-9])(?=[A-Z])", "_", name).lower()


def _day(date_str: str | None) -> str | None:
    return date_str[:10] if date_str else None


def _safe_float(val) -> float | None:
    if val is None or val == "":
        return None
    try:
        return float(val)
    except (TypeError, ValueError):
        return None


def _safe_int(val) -> int | None:
    f = _safe_float(val)
    return None if f is None else int(round(f))


def _iso_datetime(date_str: str | None) -> str | None:
    """'2025-11-25 08:30:00 -0500' → '2025-11-25T08:30:00-05:00'
    (ref parse_datetime_iso, :112-126)."""
    if not date_str:
        return None
    parts = date_str.strip().split(" ")
    if len(parts) >= 2:
        offset = parts[2] if len(parts) > 2 else "+0000"
        if len(offset) >= 5:
            offset = offset[:3] + ":" + offset[3:]
        return f"{parts[0]}T{parts[1]}{offset}"
    return date_str


def _interval_minutes(start: str | None, end: str | None) -> float | None:
    """MindfulSession duration from the record's timestamps
    (ref :361-368; Category records carry no ``value``)."""
    if not start or not end:
        return None
    try:
        s = datetime.strptime(start[:19], "%Y-%m-%d %H:%M:%S")
        e = datetime.strptime(end[:19], "%Y-%m-%d %H:%M:%S")
    except ValueError:
        return None
    return (e - s).total_seconds() / 60.0


def parse_export(
    xml_path: str | Path, since: str | None = None
) -> dict[str, list[dict]]:
    """Single streaming pass over export.xml → four row lists keyed
    ``daily_vitals | workouts | body | mindfulness``. Elements are
    cleared as consumed so memory stays flat regardless of file size
    (Workout children are kept alive until the parent's end event —
    the avg-HR extraction needs them)."""
    vitals: dict[str, dict[str, list[float]]] = defaultdict(
        lambda: defaultdict(list)
    )
    # date → field → (value, unit); last-of-day wins by overwrite,
    # device_name = last non-bmr sourceName (ref add_body :183-190)
    body: dict[str, dict] = defaultdict(dict)
    workouts: list[dict] = []
    mindful: dict[str, dict[str, float]] = defaultdict(
        lambda: {"duration_minutes": 0.0, "session_count": 0}
    )

    for _, elem in ET.iterparse(str(xml_path), events=("end",)):
        tag = elem.tag
        if tag in _WORKOUT_CHILD_TAGS:
            continue  # don't clear: parent Workout reads them
        if tag == "Record":
            rtype = elem.get("type")
            day = _day(elem.get("startDate"))
            if day is None or (since and day < since):
                elem.clear()
                continue
            if rtype in VITAL_TYPES:
                value = _safe_float(elem.get("value"))
                if value is not None:
                    vitals[day][VITAL_TYPES[rtype]].append(value)
            elif rtype in BODY_TYPES:
                value = _safe_float(elem.get("value"))
                if value is not None:
                    field = BODY_TYPES[rtype]
                    body[day][field] = (value, elem.get("unit") or "")
                    src = elem.get("sourceName")
                    if src and field != "bmr":
                        body[day]["_device_name"] = src
            elif rtype == MINDFUL_TYPE:
                dur = _interval_minutes(
                    elem.get("startDate"), elem.get("endDate")
                )
                if dur is not None:
                    m = mindful[day]
                    m["duration_minutes"] += dur
                    m["session_count"] += 1
        elif tag == "Workout":
            day = _day(elem.get("startDate"))
            src = elem.get("sourceName", "")
            if (
                day is not None
                and not (since and day < since)
                and "peloton" not in src.lower()  # ref :395-397
            ):
                dur = _safe_float(elem.get("duration"))
                cal = _safe_float(elem.get("totalEnergyBurned"))
                dist = _safe_float(elem.get("totalDistance"))
                dist_unit = elem.get("totalDistanceUnit", "")
                dist_mi = None
                if dist is not None:
                    # unknown unit assumed km, like the reference
                    dist_mi = round(
                        dist if dist_unit == "mi" else dist * KM_TO_MI, 2
                    )
                # avg HR + calories fallback from WorkoutStatistics
                avg_hr = None
                stats_cal = None
                for stat in elem.findall(".//WorkoutStatistics"):
                    st = stat.get("type")
                    if st == "HKQuantityTypeIdentifierHeartRate":
                        avg_hr = _safe_int(stat.get("average"))
                    elif st == "HKQuantityTypeIdentifierActiveEnergyBurned":
                        stats_cal = _safe_float(stat.get("sum"))
                final_cal = cal if cal else stats_cal
                workouts.append(
                    {
                        "date": day,
                        "start_time": _iso_datetime(elem.get("startDate")),
                        "end_time": _iso_datetime(elem.get("endDate")),
                        "workout_type": normalize_workout_type(
                            elem.get("workoutActivityType", "")
                        ),
                        "duration_minutes": round(dur, 1) if dur else None,
                        "calories_burned": _safe_int(final_cal)
                        if final_cal else None,
                        "avg_heart_rate": avg_hr if avg_hr else None,
                        "distance_mi": dist_mi if dist_mi else None,
                        "source_app": src,
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
                continue
            val = vals[-1] if policy == "last" else sum(vals) / len(vals)
            # SpO2 stored as 0-1 fraction → pct, on the AGGREGATE
            # (ref aggregate_vitals :210-222)
            if metric == "blood_oxygen_pct" and val <= 1.0:
                row[metric] = round(val * 100, 1)
            else:
                row[metric] = round(val, 2)
        vit_rows.append(row)

    body_rows = []
    for day in sorted(body):
        data = body[day]
        row = {"date": day}
        for field, out, lbs in (
            ("weight", "weight_lbs", True),
            ("lean_body_mass", "lean_body_mass_lbs", True),
        ):
            if field in data:
                val, unit = data[field]
                row[out] = round(
                    val * KG_TO_LBS if unit == "kg" else val, 1
                )
            else:
                row[out] = None
        if "body_fat_pct" in data:
            val, _u = data["body_fat_pct"]
            row["body_fat_pct"] = round(
                val * 100 if val <= 1.0 else val, 1
            )
        else:
            row["body_fat_pct"] = None
        row["bmi"] = round(data["bmi"][0], 1) if "bmi" in data else None
        row["bmr"] = round(data["bmr"][0], 0) if "bmr" in data else None
        if "height" in data:
            val, unit = data["height"]
            if unit == "m":
                row["height_in"] = round(val * 39.3701, 1)
            elif unit == "in":
                row["height_in"] = round(val, 1)
            else:  # cm, or unknown assumed cm (ref :265-275)
                row["height_in"] = round(val / 2.54, 1)
        else:
            row["height_in"] = None
        row["device_name"] = data.get("_device_name", "")
        body_rows.append(row)

    mind_rows = [
        {
            "date": day,
            "duration_minutes": round(vals["duration_minutes"], 1),
            "session_count": vals["session_count"],
        }
        for day, vals in sorted(mindful.items())
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
    """Emit the four Hive-partitioned CSV trees in the reference's
    layout (``healthkit/<sub>/year=YYYY/month=MM/day=DD/<sub>.csv``,
    ref write_partitioned_csv :457-491). csv.DictWriter so embedded
    commas/quotes in sourceName fields are quoted, not corrupted; the
    HealthKit normalizer scans the tree recursively so partition depth
    is transparent to it (bio/silver.py:_hk_read)."""
    headers = {
        "daily_vitals": DAILY_VITALS_HEADERS,
        "workouts": WORKOUTS_HEADERS,
        "body": BODY_HEADERS,
        "mindfulness": MINDFULNESS_HEADERS,
    }
    counts = {}
    for sub, rows in parsed.items():
        by_day: dict[str, list[dict]] = defaultdict(list)
        for r in rows:
            d = r.get("date") or ""
            if len(d) >= 10:
                by_day[d].append(r)
        for d, drows in by_day.items():
            y, m, dd = d[:4], d[5:7], d[8:10]
            out = (
                Path(bronze_root)
                / f"healthkit/{sub}/year={y}/month={m}/day={dd}"
                / f"{sub}.csv"
            )
            out.parent.mkdir(parents=True, exist_ok=True)
            with open(out, "w", newline="", encoding="utf-8") as fh:
                w = csv.DictWriter(fh, fieldnames=headers[sub])
                w.writeheader()
                w.writerows(drows)
        counts[sub] = len(rows)
    return counts
