"""REST API source (S11 — ref lambda/oura_api_ingest/handler.py:78-135,
oura_client.py:21-71 and csv_transformer.py:12-115).

The Oura v2 ingestion as a landing-zone feeder: a client interface
(injectable — a deterministic fake here, a real HTTP client in
production) fetching the daily endpoints, JSON records transformed to
CSV rows in the exact bronze column order, one CSV per
(endpoint, day) written into the landing path the normalizers scan.
Kept from the reference: next_token pagination (oura_client.py:38-70),
per-type fault isolation with a status record per endpoint
(handler.py:78-135 — an auth failure on one endpoint must not block
the others), the auth-error class distinction (401 → ValueError), the
per-day grouping on the RAW record's ``day`` with start_date as the
fallback (handler.py:96-100), and the ``daily<type>.csv`` file names
(handler.py:40-45).
"""

from __future__ import annotations

import csv
import io
import json
import re
import time
from collections.abc import Callable
from pathlib import Path

# valid YYYY-MM-DD partition key (anything else → start-date fallback)
_DAY_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")

from bio_lakehouse_spark.bio.schemas import OURA_COLUMNS

ENDPOINTS = {
    "readiness": "daily_readiness",
    "sleep": "daily_sleep",
    "activity": "daily_activity",
}

# ref handler.py FILE_NAME_MAP:40-45
FILE_NAMES = {
    "readiness": "dailyreadiness.csv",
    "sleep": "dailysleep.csv",
    "activity": "dailyactivity.csv",
}

# (client interface) fetch(endpoint, start_date, end_date) -> list[dict]
FetchFn = Callable[[str, str, str], list[dict]]
# (paged client) fetch_page(endpoint, start, end, next_token)
#   -> (records, next_token|None) — the raw Oura v2 page shape
PageFetchFn = Callable[[str, str, str, str | None], tuple[list[dict], str | None]]


def fetch_with_retry(
    fetch: FetchFn,
    endpoint: str,
    start: str,
    end: str,
    retries: int = 3,
    backoff_s: float = 0.1,
) -> list[dict]:
    """Transient-failure retry wrapper with exponential backoff (an
    ops hardening this port adds around the injectable client; the
    reference defers a 429 to the next scheduled Lambda run —
    oura_client.py:61-63 — which a batch engine has no 'next run'
    for). Auth errors (ValueError, the reference's 401 class) are
    NOT retried — a bad token does not heal between attempts."""
    last: Exception | None = None
    for attempt in range(retries):
        try:
            return fetch(endpoint, start, end)
        except ValueError:
            raise  # 401-class: permanent, surface immediately
        except Exception as e:  # noqa: BLE001
            last = e
            time.sleep(backoff_s * (2**attempt))
    raise RuntimeError(f"fetch {endpoint} failed after {retries} tries: {last}")


def paginate(fetch_page: PageFetchFn, endpoint: str, start: str, end: str) -> list[dict]:
    """Follow ``next_token`` until exhausted (ref oura_client.py:38-70):
    the v2 API caps page size, so a month of activity data spans
    several pages; losing the loop silently truncates the bronze."""
    out: list[dict] = []
    token: str | None = None
    while True:
        records, token = fetch_page(endpoint, start, end, token)
        out.extend(records)
        if not token:
            return out


def flatten_record(record: dict, data_type: str) -> dict[str, str]:
    """JSON record → flat row in the bronze column contract:
    ``contributors.*`` → prefixed columns; activity ``met.items`` →
    interval/avg/max/count summary (ref csv_transformer.py:45-95)."""
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
    """csv.DictWriter like the reference (csv_transformer.py:98-115)
    so embedded commas/quotes are quoted, not column-shifted."""
    buf = io.StringIO()
    w = csv.DictWriter(buf, fieldnames=cols)
    w.writeheader()
    w.writerows(rows)
    return buf.getvalue()


def process_date_range(
    fetch: FetchFn,
    landing_root: str | Path,
    start: str,
    end: str,
) -> list[dict]:
    """Fetch every endpoint and land per-day CSVs, one status record
    per endpoint (ref handler.py:78-135). Each data type is processed
    independently so a partial failure doesn't block other types:
    auth errors (ValueError) record ``auth_error``, anything else
    ``error``, empty fetches ``no_data``."""
    results: list[dict] = []
    for data_type in ENDPOINTS:
        try:
            records = fetch_with_retry(fetch, data_type, start, end)
            if not records:
                results.append(
                    {"type": data_type, "status": "no_data", "records": 0}
                )
                continue
            # group on the RAW record's day, start_date fallback
            # (ref handler.py:96-100). `or start` (not setdefault's
            # absent-key fallback alone) so an explicit "day": null
            # can't put a None key in the map and crash the whole
            # endpoint mid-write; a malformed day string falls back
            # too, instead of producing a junk partition path.
            by_day: dict[str, list[dict]] = {}
            for rec in records:
                day_key = rec.get("day") or start
                if not _DAY_RE.match(str(day_key)):
                    day_key = start
                by_day.setdefault(str(day_key), []).append(rec)
            uploaded = 0
            for day, drows in by_day.items():
                y, m, d = day.split("-")
                out = (
                    Path(landing_root)
                    / f"oura/{data_type}/year={y}/month={m}/day={d}"
                    / FILE_NAMES[data_type]
                )
                out.parent.mkdir(parents=True, exist_ok=True)
                flat = [flatten_record(r, data_type) for r in drows]
                out.write_text(
                    rows_to_csv(flat, OURA_COLUMNS[data_type]),
                    encoding="utf-8",
                )
                uploaded += len(drows)
            results.append(
                {"type": data_type, "status": "success", "records": uploaded}
            )
        except ValueError as e:
            results.append(
                {"type": data_type, "status": "auth_error", "error": str(e)}
            )
        except Exception as e:  # noqa: BLE001
            results.append(
                {"type": data_type, "status": "error", "error": str(e)}
            )
    return results


def ingest(
    fetch: FetchFn,
    landing_root: str | Path,
    start: str,
    end: str,
) -> dict[str, int]:
    """Record-count view of :func:`process_date_range` (failed or
    empty endpoints count 0 — the per-type statuses carry the why)."""
    return {
        r["type"]: r.get("records", 0)
        for r in process_date_range(fetch, landing_root, start, end)
    }


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
