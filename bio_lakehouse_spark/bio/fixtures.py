"""Deterministic bronze fixture generator (FIXTURES.md).

Synthesizes the reference's Bronze layer on the local filesystem:
~150 daily rows per Oura type as CSV in two header orders plus a JSON
variant with nested ``contributors`` / ``met.items`` (exercising the
header-group union, the JSON flatten, and CSV+JSON dedup), two Peloton
full exports with Title-Case headers (latest-file selection), four
HealthKit CSV trees under nested date dirs (recursive lookup,
duplicate dates, sparse metrics, Peloton-sourced rows for the
exclusion filter), and meal-level MFP CSVs with overlapping exports.

Everything derives from ``numpy.random.RandomState(seed)`` — same seed,
same bytes — so golden tests are stable.
"""

from __future__ import annotations

import json
from datetime import date, timedelta
from pathlib import Path

import numpy as np

N_DAYS = 150
START = date(2025, 6, 1)

_PELOTON_DISCIPLINES = [
    "Cycling", "Strength", "Yoga", "Stretching", "Meditation", "Bootcamp"
]
_HK_TYPES = [
    "hiking", "running", "functional_strength_training", "yoga",
    "walking", "pilates", "high_intensity_interval_training", "rock_climbing"
]
_MEALS = ["Breakfast", "Lunch", "Dinner", "Snacks"]


def _days() -> list[date]:
    return [START + timedelta(days=i) for i in range(N_DAYS)]


def _maybe(rng: np.random.RandomState, value, p_null: float = 0.1):
    return "" if rng.rand() < p_null else value


def _write_csv(path: Path, header: list[str], rows: list[list], sep=","):
    path.parent.mkdir(parents=True, exist_ok=True)
    lines = [sep.join(header)]
    for r in rows:
        lines.append(sep.join("" if v is None else str(v) for v in r))
    path.write_text("\n".join(lines) + "\n", encoding="utf-8")


class _DegenerateRandomState:
    """Duck-typed np.random.RandomState that returns the LOWER bound
    of every draw (r12 degenerate bio sweep): every day gets the same
    score, the same workout count, the same macros — constant series,
    zero variances, minimum-cardinality everything — while the bronze
    tree layout stays byte-identical in shape to the realistic
    fixture. rand() returns 1.0 so the _maybe null-injection never
    fires (constant NON-null is the harsher input for corr/variance
    paths; all-null is covered by the empty/NULL unit pins)."""

    def rand(self):
        # 0.3 threads the generator's probability gates: the
        # optional-CONTENT gates (mindfulness < 0.4, snacks < 0.5)
        # fire every day so no bronze file ends up missing, while
        # the null-injection / duplicate-reading / skip-day gates
        # (< 0.08 … < 0.2) stay off — constant non-null series.
        return 0.3

    def randint(self, lo, hi=None):
        return lo if hi is not None else 0

    def uniform(self, lo, hi=None, size=None):
        if size is not None:
            return np.full(int(size), float(lo))
        return float(lo)

    def choice(self, seq):
        # Last element, not first: the per-day workout/meal COUNT
        # draws lead with zeros, and a constant 0 would leave whole
        # bronze files unwritten (empty SOURCE = config error, a
        # different test). Constant-but-present is the degenerate
        # input under test.
        return seq[-1]


def generate_bronze(
    root: str | Path, seed: int = 42, degenerate: bool = False
) -> Path:
    """Write the full bronze tree under ``root``; idempotent via a
    _DONE sentinel. Returns the root path. ``degenerate=True`` swaps
    the RNG for the constant shim above — same layout, maximally
    degenerate values."""
    root = Path(root)
    done = root / "_DONE"
    if done.exists():
        return root
    rng = (
        _DegenerateRandomState() if degenerate
        else np.random.RandomState(seed)
    )
    days = _days()

    # ---- Oura readiness / sleep / activity --------------------------------
    readiness_rows = []
    sleep_rows = []
    activity_rows = []
    activity_json = []
    for i, d in enumerate(days):
        ds = d.isoformat()
        # readiness: score null ~8% (forward-fill target)
        score = "" if rng.rand() < 0.08 else int(rng.randint(55, 96))
        contr = [int(rng.randint(40, 101)) for _ in range(9)]
        readiness_rows.append(
            [f"r-{i:04d}", ds, score,
             round(rng.uniform(-1.5, 1.5), 2), round(rng.uniform(-1, 1), 2),
             f"{ds}T08:01:00+00:00", *contr]
        )
        sleep_rows.append(
            [f"s-{i:04d}", ds, int(rng.randint(50, 99)),
             f"{ds}T07:40:00+00:00",
             *[int(rng.randint(40, 101)) for _ in range(7)]]
        )
        met_items = [round(float(v), 1) for v in rng.uniform(0.9, 9.0, size=int(rng.randint(3, 8)))]
        act = {
            "id": f"a-{i:04d}", "day": ds, "score": int(rng.randint(40, 100)),
            "timestamp": f"{ds}T04:00:00+00:00",
            "active_calories": int(rng.randint(100, 1200)),
            "steps": int(rng.randint(1000, 25000)),
            "high_activity_time": int(rng.randint(0, 3600)),
            "medium_activity_time": int(rng.randint(0, 7200)),
            "low_activity_time": int(rng.randint(0, 14400)),
            "sedentary_time": int(rng.randint(10000, 40000)),
            "total_calories": int(rng.randint(1800, 3500)),
        }
        if i % 2 == 0:
            # half the days arrive as CSV rows (met stats precomputed by
            # the ingestion Lambda)
            activity_rows.append(
                [act["id"], act["day"], act["score"], act["timestamp"],
                 act["active_calories"], act["steps"],
                 act["high_activity_time"], act["medium_activity_time"],
                 act["low_activity_time"], act["sedentary_time"],
                 act["total_calories"], 60,
                 round(sum(met_items) / len(met_items), 2), max(met_items),
                 len(met_items)]
            )
        else:
            # the other half as API JSON with the nested met object
            activity_json.append(
                {**{k: act[k] for k in (
                    "id", "day", "score", "timestamp", "active_calories",
                    "steps", "high_activity_time", "medium_activity_time",
                    "low_activity_time", "sedentary_time", "total_calories")},
                 "met": {"interval": 60, "items": met_items},
                 "contributors": None}
            )

    from bio_lakehouse_spark.bio.schemas import (
        OURA_READINESS_COLUMNS,
        OURA_SLEEP_COLUMNS,
        OURA_ACTIVITY_COLUMNS,
    )

    half = len(readiness_rows) // 2
    # File 1: contract column order. File 2: alphabetical order (the
    # bulk-upload layout) — same columns, different positions.
    _write_csv(root / "oura/readiness/part1.csv",
               OURA_READINESS_COLUMNS, readiness_rows[:half])
    alpha = sorted(OURA_READINESS_COLUMNS)
    idx = [OURA_READINESS_COLUMNS.index(c) for c in alpha]
    _write_csv(root / "oura/readiness/bulk_alpha.csv",
               alpha, [[r[j] for j in idx] for r in readiness_rows[half:]])
    # Corrupt rows + duplicate ids (dedup path): re-append two rows of
    # part1 plus garbage days.
    dup_rows = [readiness_rows[0], readiness_rows[1],
                ["r-bad1", "test", 80, 0.1, 0.1, "x", *[50] * 9],
                ["r-bad2", "not-a-date", 70, 0.0, 0.0, "x", *[50] * 9]]
    _write_csv(root / "oura/readiness/retry_dupes.csv",
               OURA_READINESS_COLUMNS, dup_rows)

    # Sleep: semicolon-delimited variant for the sniffing path.
    _write_csv(root / "oura/sleep/part1.csv", OURA_SLEEP_COLUMNS,
               sleep_rows[:half], sep=";")
    _write_csv(root / "oura/sleep/part2.csv", OURA_SLEEP_COLUMNS,
               sleep_rows[half:], sep=";")

    _write_csv(root / "oura/activity/csv_days.csv", OURA_ACTIVITY_COLUMNS,
               activity_rows)
    (root / "oura/activity").mkdir(parents=True, exist_ok=True)
    (root / "oura/activity/api_days.json").write_text(
        json.dumps(activity_json), encoding="utf-8"
    )

    # ---- Peloton ----------------------------------------------------------
    header = ["Workout Timestamp", "Live/On-Demand", "Instructor Name",
              "Length (minutes)", "Fitness Discipline", "Type", "Title",
              "Class Timestamp", "Total Output", "Avg. Watts",
              "Avg. Resistance", "Avg. Cadence (RPM)", "Avg. Speed (mph)",
              "Distance (mi)", "Calories Burned", "Avg. Heartrate",
              "Avg. Incline", "Avg. Pace (min/mi)"]
    workouts = []
    for d in days:
        for _ in range(int(rng.choice([0, 0, 1, 1, 2, 3]))):
            disc = _PELOTON_DISCIPLINES[int(rng.randint(len(_PELOTON_DISCIPLINES)))]
            hh = int(rng.randint(5, 21))
            is_cycle = disc == "Cycling"
            workouts.append([
                f"{d.isoformat()} {hh:02d}:{int(rng.randint(60)):02d} (-05)",
                "On Demand", "Alex Instructor", int(rng.choice([10, 20, 30, 45, 60])),
                disc, "Class", f"{disc} Class",
                f"{d.isoformat()} {hh:02d}:00 (-05)",
                int(rng.randint(50, 600)) if is_cycle else "",
                int(rng.randint(80, 260)) if is_cycle else "",
                f"{int(rng.randint(25, 70))}%" if is_cycle else "",
                int(rng.randint(60, 110)) if is_cycle else "",
                round(rng.uniform(14, 22), 2) if is_cycle else "",
                round(rng.uniform(3, 18), 2) if is_cycle else "",
                int(rng.randint(80, 700)),
                _maybe(rng, int(rng.randint(90, 186)), 0.15),
                "", "",
            ])
    # Older export = first 60% of rows; newest = all rows (superset).
    cut = int(len(workouts) * 0.6)
    _write_csv(root / "peloton/workouts/KnownasNoma_workouts_2025-08.csv",
               header, workouts[:cut])
    _write_csv(root / "peloton/workouts/KnownasNoma_workouts_2025-11.csv",
               header, workouts)
    import os
    old = root / "peloton/workouts/KnownasNoma_workouts_2025-08.csv"
    st = old.stat()
    os.utime(old, (st.st_atime - 1000, st.st_mtime - 1000))

    # ---- HealthKit --------------------------------------------------------
    vit_rows, body_rows, mind_rows, hkw_rows = [], [], [], []
    for i, d in enumerate(days):
        ds = d.isoformat()
        vit_rows.append([
            ds, round(rng.uniform(45, 75), 1), round(rng.uniform(20, 120), 1),
            round(rng.uniform(35, 52), 1) if i % 7 == 0 else "",  # sparse vo2
            _maybe(rng, round(rng.uniform(94, 100), 1)),
            round(rng.uniform(12, 20), 1),
        ])
        if rng.rand() < 0.15:  # duplicate-date second reading
            vit_rows.append([
                ds, round(rng.uniform(45, 75), 1),
                round(rng.uniform(20, 120), 1), "", "",
                round(rng.uniform(12, 20), 1),
            ])
        if i % 3 == 0:  # sparse body data
            body_rows.append([
                ds, round(rng.uniform(150, 200), 1),
                _maybe(rng, round(rng.uniform(12, 25), 1)),
                round(rng.uniform(21, 27), 1),
                _maybe(rng, round(rng.uniform(120, 160), 1)),
                "SmartScale",
            ])
        if rng.rand() < 0.4:
            mind_rows.append([ds, round(rng.uniform(5, 40), 1),
                              int(rng.randint(1, 4))])
        for _ in range(int(rng.choice([0, 0, 0, 1, 1, 2]))):
            typ = _HK_TYPES[int(rng.randint(len(_HK_TYPES)))]
            src = "Peloton" if rng.rand() < 0.15 else "Apple Watch"
            hkw_rows.append([
                ds, f"{ds}T{int(rng.randint(6, 20)):02d}:00:00",
                f"{ds}T{int(rng.randint(20, 23)):02d}:00:00", typ,
                round(rng.uniform(15, 90), 1), int(rng.randint(80, 600)),
                _maybe(rng, int(rng.randint(90, 175)), 0.2),
                round(rng.uniform(0, 8), 2), src,
            ])

    # Nested per-month dirs to exercise recursiveFileLookup; headers in
    # the parser's output contract (scripts/parse_healthkit_export.py).
    def _split_by_month(rows):
        by_m: dict[str, list] = {}
        for r in rows:
            by_m.setdefault(r[0][:7], []).append(r)
        return by_m

    for sub, hdr, rows in [
        ("daily_vitals", ["date", "resting_heart_rate_bpm", "hrv_ms",
                          "vo2_max", "blood_oxygen_pct", "respiratory_rate"],
         vit_rows),
        ("workouts", ["date", "start_time", "end_time", "workout_type",
                      "duration_minutes", "calories_burned", "avg_heart_rate",
                      "distance_mi", "source_app"], hkw_rows),
        ("body", ["date", "weight_lbs", "body_fat_pct", "bmi",
                  "lean_body_mass_lbs", "device_name"], body_rows),
        ("mindfulness", ["date", "duration_minutes", "session_count"],
         mind_rows),
    ]:
        for month, mrows in _split_by_month(rows).items():
            y, m = month.split("-")
            _write_csv(root / f"healthkit/{sub}/year={y}/month={m}/data.csv",
                       hdr, mrows)

    # ---- MFP nutrition ----------------------------------------------------
    mfp_header = ["Date", "Meal", "Calories", "Fat (g)", "Saturated Fat",
                  "Polyunsaturated Fat", "Monounsaturated Fat", "Trans Fat",
                  "Cholesterol", "Sodium (mg)", "Potassium",
                  "Carbohydrates (g)", "Fiber", "Sugar", "Protein (g)"]
    meal_rows = []
    for d in days:
        if rng.rand() < 0.1:
            continue  # unlogged day
        for meal in _MEALS:
            if meal == "Snacks" and rng.rand() < 0.5:
                continue
            cal = round(rng.uniform(150, 900), 1)
            meal_rows.append([
                d.isoformat(), meal, cal,
                round(rng.uniform(3, 40), 1), round(rng.uniform(1, 15), 1),
                round(rng.uniform(0, 10), 1), round(rng.uniform(0, 15), 1),
                round(rng.uniform(0, 2), 1), round(rng.uniform(0, 300), 1),
                round(rng.uniform(50, 1500), 1), round(rng.uniform(100, 900), 1),
                round(rng.uniform(10, 120), 1), round(rng.uniform(0, 15), 1),
                round(rng.uniform(0, 60), 1), round(rng.uniform(5, 70), 1),
            ])
    cut = int(len(meal_rows) * 0.7)
    # Overlapping exports: weeks 1-N in one file, last 60% again in another.
    _write_csv(root / "mfp/nutrition/export_a.csv", mfp_header,
               meal_rows[:cut])
    _write_csv(root / "mfp/nutrition/export_b.csv", mfp_header,
               meal_rows[int(len(meal_rows) * 0.4):])

    done.touch()
    return root
