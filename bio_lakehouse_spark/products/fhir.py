"""FHIR R4 export (S16 — ref insights_engine/fhir/bundle_builder.py:
98-222 and glue/bio_etl_utils.py:318-424).

Gold rows → LOINC-coded Observation resources + a Patient resource,
assembled into a transaction Bundle with deterministic UUIDv5 ids
(idempotent re-exports produce identical resources). The metric
extraction is a Spark projection; the JSON assembly is a row
``transform`` on the (small) collected result — same split as the
reference.
"""

from __future__ import annotations

import uuid
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FHIR_NAMESPACE = uuid.UUID("6ba7b810-9dad-11d1-80b4-00c04fd430c8")

LOINC_CODES = {
    "heart_rate": "8867-4",
    "steps": "55423-8",
    "hrv": "80404-7",
    "vo2_max": "60842-2",
    "body_weight": "29463-7",
    "blood_oxygen": "2708-6",
}

LOINC_DISPLAY = {
    "heart_rate": "Heart rate",
    "steps": "Number of steps in 24 hour Measured",
    "hrv": "R-R interval.standard deviation (Heart rate variability)",
    "vo2_max": "Oxygen consumption (VO2 max)",
    "body_weight": "Body weight",
    "blood_oxygen": "Oxygen saturation in Arterial blood by Pulse oximetry",
}

UCUM_UNITS = {
    "heart_rate": "/min",
    "steps": "/d",
    "hrv": "ms",
    "vo2_max": "mL/kg/min",
    "body_weight": "[lb_av]",
    "blood_oxygen": "%",
}

METRIC_CATEGORY = {
    "heart_rate": "vital-signs",
    "steps": "activity",
    "hrv": "vital-signs",
    "vo2_max": "vital-signs",
    "body_weight": "vital-signs",
    "blood_oxygen": "vital-signs",
}

# gold column → FHIR metric key
GOLD_METRIC_COLUMNS = {
    "resting_heart_rate_bpm": "heart_rate",
    "steps": "steps",
    "hrv_ms": "hrv",
    "vo2_max": "vo2_max",
    "weight_lbs": "body_weight",
    "blood_oxygen_pct": "blood_oxygen",
}

REQUIRED_FIELDS = [
    "resourceType", "id", "status", "category", "code", "subject",
    "effectiveDateTime", "valueQuantity",
]


def deterministic_fhir_id(source: str, metric_type: str, date: str) -> str:
    """UUIDv5 over source:metric:date — idempotent reruns, same ids."""
    return str(uuid.uuid5(FHIR_NAMESPACE, f"{source}:{metric_type}:{date}"))


def observation_rows(gold: DataFrame, source: str = "bio-lakehouse") -> DataFrame:
    """Melt gold metric columns into (date, metric, value) observation
    rows — the distributed half of the export. Uses stack(), one pass,
    no UDFs."""
    pairs = ", ".join(
        f"'{metric}', CAST({col} AS DOUBLE)"
        for col, metric in GOLD_METRIC_COLUMNS.items()
    )
    n = len(GOLD_METRIC_COLUMNS)
    return (
        gold.select(
            "date",
            F.expr(f"stack({n}, {pairs}) AS (metric, value)"),
        )
        .filter(F.col("value").isNotNull() & F.col("date").isNotNull())
        .withColumn("source", F.lit(source))
    )


def build_observation(
    metric: str, date: str, value: float, patient_id: str,
    source: str = "bio-lakehouse",
) -> dict[str, Any]:
    cat = METRIC_CATEGORY[metric]
    return {
        "resourceType": "Observation",
        "id": deterministic_fhir_id(source, metric, date),
        "status": "final",
        "category": [
            {
                "coding": [
                    {
                        "system": "http://terminology.hl7.org/CodeSystem/observation-category",
                        "code": cat,
                        "display": "Vital Signs" if cat == "vital-signs" else "Activity",
                    }
                ]
            }
        ],
        "code": {
            "coding": [
                {
                    "system": "http://loinc.org",
                    "code": LOINC_CODES[metric],
                    "display": LOINC_DISPLAY[metric],
                }
            ],
            "text": LOINC_DISPLAY[metric],
        },
        "subject": {"reference": f"Patient/{patient_id}"},
        "effectiveDateTime": date,
        "valueQuantity": {
            "value": round(float(value), 2),
            "unit": UCUM_UNITS[metric],
            "system": "http://unitsofmeasure.org",
            "code": UCUM_UNITS[metric],
        },
    }


def validate_observation(obs: dict) -> bool:
    missing = [f for f in REQUIRED_FIELDS if obs.get(f) is None]
    if missing:
        raise ValueError(f"FHIR Observation missing required fields: {missing}")
    return True


def build_bundle(
    gold: DataFrame, patient_name: str = "Bio Lakehouse User",
    source: str = "bio-lakehouse",
) -> dict[str, Any]:
    """Transaction Bundle: one Patient + one Observation per
    (date, metric) with non-null value."""
    patient_id = deterministic_fhir_id(source, "patient", patient_name)
    patient = {
        "resourceType": "Patient",
        "id": patient_id,
        "name": [{"text": patient_name}],
    }
    rows = observation_rows(gold, source).collect()
    entries: list[dict] = [
        {"resource": patient, "request": {"method": "PUT",
                                          "url": f"Patient/{patient_id}"}}
    ]
    for r in rows:
        obs = build_observation(
            r["metric"], r["date"], r["value"], patient_id, source
        )
        validate_observation(obs)
        entries.append(
            {
                "resource": obs,
                "request": {"method": "PUT",
                            "url": f"Observation/{obs['id']}"},
            }
        )
    return {
        "resourceType": "Bundle",
        "type": "transaction",
        "entry": entries,
    }
