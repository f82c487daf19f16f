"""REST API source (S11 — ref lambda/oura_api_ingest/handler.py:78-175
and csv_transformer.py:12-115).

The Oura v2 ingestion as a landing-zone feeder: a client interface
(injectable — a deterministic fake here, a real HTTP client in
production) fetching the daily endpoints with retry, JSON records
transformed to CSV rows in the exact bronze column order, one CSV per
(endpoint, day) written into the landing path the normalizers scan.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable
from pathlib import Path

from bio_lakehouse_spark.bio.schemas import OURA_COLUMNS

ENDPOINTS = {
    "readiness": "daily_readiness",
    "sleep": "daily_sleep",
    "activity": "daily_activity",
}

# (client interface) fetch(endpoint, start_date, end_date) -> list[dict]
FetchFn = Callable[[str, str, str], list[dict]]


def fetch_with_retry(
    fetch: FetchFn,
    endpoint: str,
    start: str,
    end: str,
    retries: int = 3,
    backoff_s: float = 0.1,
) -> list[dict]:
    """Retry wrapper (the Lambda's 3-attempt loop)."""
    last: Exception | None = None
    for attempt in range(retries):
        try:
            return fetch(endpoint, start, end)
        except Exception as e:  # noqa: BLE001
            last = e
            time.sleep(backoff_s * (2**attempt))
    raise RuntimeError(f"fetch {endpoint} failed after {retries} tries: {last}")


def flatten_record(record: dict, data_type: str) -> dict[str, str]:
    """JSON record → flat string row in the bronze column contract:
    ``contributors.*`` → prefixed columns; activity ``met.items`` →
    interval/avg/max/count summary (ref csv_transformer.py:45-71)."""
    cols = OURA_COLUMNS[data_type]
    flat: dict[str, str] = {}
    for c in cols:
        if c in record and record[c] is not None:
            flat[c] = str(record[c])
    for key, value in (record.get("contributors") or {}).items():
        name = f"contributors_{key}"
        if name in cols and value is not None:
            flat[name] = str(value)
    if data_type == "activity":
        met = record.get("met") or {}
        items = met.get("items") if isinstance(met, dict) else None
        if items:
            flat["met_interval"] = str(met.get("interval", ""))
            flat["met_avg"] = str(round(sum(items) / len(items), 2))
            flat["met_max"] = str(max(items))
            flat["met_count"] = str(len(items))
    return {c: flat.get(c, "") for c in cols}


def rows_to_csv(rows: list[dict], cols: list[str]) -> str:
    lines = [",".join(cols)]
    for r in rows:
        lines.append(",".join(r.get(c, "") for c in cols))
    return "\n".join(lines) + "\n"


def ingest(
    fetch: FetchFn,
    landing_root: str | Path,
    start: str,
    end: str,
) -> dict[str, int]:
    """Fetch every endpoint, write per-day CSVs into
    ``oura/<type>/year=YYYY/month=MM/day=DD/data.csv`` — the landing
    layout the ingestion trigger watches."""
    counts: dict[str, int] = {}
    for data_type in ENDPOINTS:
        records = fetch_with_retry(fetch, data_type, start, end)
        by_day: dict[str, list[dict]] = {}
        for rec in records:
            flat = flatten_record(rec, data_type)
            if flat.get("day"):
                by_day.setdefault(flat["day"], []).append(flat)
        for day, rows in by_day.items():
            y, m, d = day.split("-")
            out = (
                Path(landing_root)
                / f"oura/{data_type}/year={y}/month={m}/day={d}/data.csv"
            )
            out.parent.mkdir(parents=True, exist_ok=True)
            out.write_text(
                rows_to_csv(rows, OURA_COLUMNS[data_type]), encoding="utf-8"
            )
        counts[data_type] = len(records)
    return counts


def fake_oura_client(seed: int = 7) -> FetchFn:
    """Deterministic offline stand-in for the Oura v2 API."""
    import numpy as np

    def fetch(endpoint: str, start: str, end: str) -> list[dict]:
        from datetime import date, timedelta

        rng = np.random.RandomState(
            seed + sum(ord(c) for c in endpoint)
        )
        d0 = date.fromisoformat(start)
        d1 = date.fromisoformat(end)
        out = []
        i = 0
        while d0 + timedelta(days=i) <= d1:
            day = (d0 + timedelta(days=i)).isoformat()
            rec: dict = {
                "id": f"{endpoint}-{day}",
                "day": day,
                "score": int(rng.randint(50, 100)),
                "timestamp": f"{day}T08:00:00+00:00",
            }
            if endpoint == "readiness":
                rec["temperature_deviation"] = round(rng.uniform(-1, 1), 2)
                rec["contributors"] = {
                    "hrv_balance": int(rng.randint(40, 100)),
                    "resting_heart_rate": int(rng.randint(40, 100)),
                }
            elif endpoint == "sleep":
                rec["contributors"] = {
                    "deep_sleep": int(rng.randint(40, 100)),
                    "rem_sleep": int(rng.randint(40, 100)),
                }
            else:
                rec["active_calories"] = int(rng.randint(100, 1200))
                rec["steps"] = int(rng.randint(1000, 25000))
                rec["met"] = {
                    "interval": 60,
                    "items": [round(float(v), 1)
                              for v in rng.uniform(1, 9, size=5)],
                }
            out.append(rec)
            i += 1
        return out

    return fetch


def parse_json_payload(payload: str) -> list[dict]:
    """Accept both a single object and an array (the bronze JSON
    tolerance — ref oura_normalizer.py:186-220)."""
    data = json.loads(payload)
    return data if isinstance(data, list) else [data]
