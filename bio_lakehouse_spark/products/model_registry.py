"""Model registry + inference — parity for the reference's MLflow /
joblib persistence layer (ref models/readiness_predictor/
mlflow_config.py:1-60: SQLite-backed tracking, best-run lookup by
tag; predict.py:26-60: registry-first load with joblib fallback,
latest-features inference).

Spark-first re-expression:

* Models persist as IMMUTABLE versioned JSON records under
  ``<root>/<name>/v<N>/model.json`` — the same rename-CAS claim the
  versioned parquet sink uses (``sources/sinks.versioned_write``), so
  two racing trainers never overwrite each other and a crash never
  leaves a torn record. ``_latest`` is an atomically-replaced pointer
  file. On Delta/Iceberg deployments the record row goes in a table;
  the API doesn't change.
* ``best_model`` replays MLflow's get_best_model_uri semantics:
  scan all versions, pick the best PRIMARY METRIC (min or max),
  ties to the newest version.
* Inference is JVM-side: a linear model (the zoo's ridge/naive —
  products/numerics.ridge_closed_form layout, coefficients then
  intercept LAST) scores as one Column expression — coefficients
  fold into the plan as literals, so batch prediction at 100 TB is a
  scan-level projection, never a Python UDF. Non-linear zoo members
  (GBM) stay driver-side like the reference's sklearn — their
  records persist here all the same.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Sequence
from dataclasses import asdict, dataclass, field
from pathlib import Path

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class ModelRecord:
    name: str
    version: int
    feature_cols: list[str]
    coefficients: list[float]  # len == len(feature_cols) + 1 (intercept LAST)
    params: dict = field(default_factory=dict)
    metrics: dict = field(default_factory=dict)
    tags: dict = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(asdict(self), indent=1, sort_keys=True)

    @staticmethod
    def from_json(text: str) -> "ModelRecord":
        return ModelRecord(**json.loads(text))


def _model_dir(root: str | Path, name: str) -> Path:
    return Path(root) / name


def _versions(d: Path) -> list[int]:
    if not d.is_dir():
        return []
    return sorted(
        int(p.name[1:])
        for p in d.iterdir()
        if p.is_dir() and p.name.startswith("v") and p.name[1:].isdigit()
    )


def save_model(
    root: str | Path,
    name: str,
    feature_cols: Sequence[str],
    coefficients: Sequence[float],
    params: dict | None = None,
    metrics: dict | None = None,
    tags: dict | None = None,
    max_attempts: int = 16,
) -> ModelRecord:
    """Persist a trained model as the next immutable version.

    The version claim is a rename-CAS (rename onto an existing dir
    fails → exactly one of two racing writers owns v<N>, the loser
    retries at N+1), then ``_latest`` is swapped atomically. Raises
    ValueError if coefficient count != len(feature_cols) + 1."""
    if len(coefficients) != len(feature_cols) + 1:
        raise ValueError(
            f"need {len(feature_cols) + 1} coefficients "
            f"(features + intercept last), got {len(coefficients)}"
        )
    d = _model_dir(root, name)
    d.mkdir(parents=True, exist_ok=True)
    token = uuid.uuid4().hex[:12]
    stage = d / f".__stage__{token}"
    stage.mkdir()
    claimed = None
    for _ in range(max_attempts):
        nxt = (_versions(d)[-1] + 1) if _versions(d) else 1
        rec = ModelRecord(
            name=name,
            version=nxt,
            feature_cols=list(feature_cols),
            coefficients=[float(c) for c in coefficients],
            params=dict(params or {}),
            metrics=dict(metrics or {}),
            tags=dict(tags or {}),
        )
        (stage / "model.json").write_text(rec.to_json(), encoding="utf-8")
        try:
            os.rename(stage, d / f"v{nxt}")  # CAS: fails if taken
            claimed = rec
            break
        except OSError:
            continue
    if claimed is None:
        import shutil

        shutil.rmtree(stage, ignore_errors=True)
        raise RuntimeError(
            f"save_model: lost the version race {max_attempts} times"
        )
    # Monotonic pointer publish (ADVICE r6): two racing writers claim
    # v<N> and v<N+1>; if the v<N> writer's os.replace lands LAST,
    # _latest would point BACKWARD at an older version. Instead of
    # publishing "my" version, every writer publishes the HIGHEST
    # committed version directory and loops until the pointer reflects
    # it — whichever writer acts last leaves _latest at the max, and
    # any interleaving that briefly regresses the pointer is repaired
    # by the still-running writer's next iteration (version dirs are
    # immutable and fully written before their rename, so pointing at
    # a rival's newer version is always safe).
    ptr = d / "_latest"
    tmp = d / f"_latest.{token}"
    while True:
        vs = _versions(d)
        target = vs[-1] if vs else claimed.version
        try:
            current = int(ptr.read_text().strip())
        except (FileNotFoundError, ValueError):
            current = 0
        if current >= target:
            break
        tmp.write_text(str(target))
        os.replace(tmp, ptr)
    return claimed


def load_model(
    root: str | Path, name: str, version: int | None = None
) -> ModelRecord:
    """Load the ``_latest``-pointed version (default) or a pinned
    one. Raises FileNotFoundError rather than reading debris."""
    d = _model_dir(root, name)
    if version is None:
        ptr = d / "_latest"
        if not ptr.exists():
            raise FileNotFoundError(f"no published model under {d}")
        version = int(ptr.read_text().strip())
    rec_path = d / f"v{version}" / "model.json"
    if not rec_path.exists():
        raise FileNotFoundError(f"model version {version} not found in {d}")
    return ModelRecord.from_json(rec_path.read_text(encoding="utf-8"))


def best_model(
    root: str | Path,
    name: str,
    metric: str,
    mode: str = "min",
) -> ModelRecord:
    """The registry-side of the reference's get_best_model_uri: best
    ``metric`` across ALL versions (mode "min" for losses, "max" for
    scores); ties go to the newest version. Versions missing the
    metric are skipped; raises LookupError if none carry it."""
    d = _model_dir(root, name)
    candidates: list[tuple[float, int, ModelRecord]] = []
    for v in _versions(d):
        rec = load_model(root, name, version=v)
        if metric in rec.metrics:
            candidates.append((float(rec.metrics[metric]), v, rec))
    if not candidates:
        raise LookupError(f"no version of {name} carries metric {metric!r}")
    sign = 1.0 if mode == "min" else -1.0
    candidates.sort(key=lambda t: (sign * t[0], -t[1]))
    return candidates[0][2]


def score_expr(model: ModelRecord) -> Column:
    """Linear-model score as ONE Column expression: coefficients are
    plan literals, so inference is scan-level projection (whole-stage
    codegen) — the 100 TB path, vs the reference's driver-side
    ``model.predict`` on a one-row frame."""
    expr: Column = F.lit(float(model.coefficients[-1]))
    for c, b in zip(model.feature_cols, model.coefficients[:-1]):
        expr = expr + F.coalesce(F.col(c), F.lit(0.0)) * F.lit(float(b))
    return expr


def predict_df(
    df: DataFrame, model: ModelRecord, out_col: str = "prediction"
) -> DataFrame:
    """Batch inference: append the model's score column. Missing
    feature values score as 0 contribution (the reference's feature
    frame is already imputed; the coalesce is defense)."""
    missing = [c for c in model.feature_cols if c not in df.columns]
    if missing:
        raise ValueError(f"feature columns absent from frame: {missing}")
    return df.withColumn(out_col, score_expr(model))


def vacuum_models(
    root: str | Path,
    name: str,
    keep_last: int = 5,
    stage_max_age_sec: float = 3600.0,
) -> list[int]:
    """Drop all but the newest ``keep_last`` versions, never the
    ``_latest``-pointed one. Returns removed version numbers.

    Stage-dir cleanup is AGE-GATED (ADVICE r6): a ``.__stage__*``
    directory younger than ``stage_max_age_sec`` may belong to a
    writer mid-``save_model`` — deleting it would fail that writer's
    rename-CAS. Only stale debris (crashed runs) is swept; a live
    save completes in seconds, so the default 1-hour gate is
    conservative by orders of magnitude."""
    import shutil
    import time

    d = _model_dir(root, name)
    ptr = d / "_latest"
    pinned = int(ptr.read_text().strip()) if ptr.exists() else None
    vs = _versions(d)
    keep = set(vs[-keep_last:])
    if pinned is not None:
        keep.add(pinned)
    removed = []
    for v in vs:
        if v not in keep:
            shutil.rmtree(d / f"v{v}", ignore_errors=True)
            removed.append(v)
    now = time.time()
    for junk in d.glob(".__stage__*"):
        try:
            age = now - junk.stat().st_mtime
        except OSError:
            continue  # vanished: its writer just renamed it — live
        if age > stage_max_age_sec:
            shutil.rmtree(junk, ignore_errors=True)
    return removed
