"""Model registry + JVM-side inference (ref models/readiness_predictor/
mlflow_config.py best-run lookup + predict.py registry-first load):
versioned CAS persistence, latest/best selection, Column-expression
scoring that matches the numpy ridge exactly."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bio_lakehouse_spark.products.model_registry import (
    best_model,
    load_model,
    predict_df,
    save_model,
    vacuum_models,
)


def test_save_load_versions_and_latest(tmp_path):
    r1 = save_model(tmp_path, "readiness", ["a", "b"], [1.0, 2.0, 0.5],
                    metrics={"mae": 3.0})
    r2 = save_model(tmp_path, "readiness", ["a", "b"], [1.1, 1.9, 0.4],
                    metrics={"mae": 2.0})
    assert (r1.version, r2.version) == (1, 2)
    assert load_model(tmp_path, "readiness").version == 2  # _latest
    assert load_model(tmp_path, "readiness", version=1).coefficients == [
        1.0, 2.0, 0.5,
    ]
    with pytest.raises(FileNotFoundError):
        load_model(tmp_path, "readiness", version=9)
    with pytest.raises(FileNotFoundError):
        load_model(tmp_path, "nope")


def test_coefficient_arity_is_checked(tmp_path):
    with pytest.raises(ValueError):
        save_model(tmp_path, "m", ["a", "b"], [1.0, 2.0])  # no intercept


def test_best_model_by_metric(tmp_path):
    save_model(tmp_path, "m", ["x"], [1.0, 0.0], metrics={"mae": 5.0})
    save_model(tmp_path, "m", ["x"], [2.0, 0.0], metrics={"mae": 2.0})
    save_model(tmp_path, "m", ["x"], [3.0, 0.0], metrics={"mae": 2.0})
    save_model(tmp_path, "m", ["x"], [4.0, 0.0], metrics={"r2": 0.9})
    best = best_model(tmp_path, "m", "mae", mode="min")
    # tie on mae=2.0 → newest wins
    assert best.version == 3
    assert best_model(tmp_path, "m", "r2", mode="max").version == 4
    with pytest.raises(LookupError):
        best_model(tmp_path, "m", "rmse")


def test_predict_matches_numpy_ridge(spark, tmp_path):
    """End-to-end: fit ridge_closed_form on a feature frame, persist,
    reload, score via the Column expression — predictions must equal
    the numpy dot product to float precision, and the plan must stay
    UDF-free (pure projection)."""
    from bio_lakehouse_spark.products.numerics import ridge_closed_form

    rng = np.random.RandomState(7)
    X = rng.rand(50, 3)
    y = X @ np.array([2.0, -1.0, 0.5]) + 3.0 + rng.rand(50) * 0.01
    w = ridge_closed_form(X, y, alpha=1.0)  # 3 coefs + intercept last

    rec = save_model(
        tmp_path, "ridge", ["f1", "f2", "f3"], list(w),
        params={"alpha": 1.0}, metrics={"mae": 0.1},
    )
    loaded = load_model(tmp_path, "ridge")
    assert loaded.coefficients == pytest.approx(list(w))

    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in X],
        "f1 double, f2 double, f3 double",
    )
    out = predict_df(df, loaded).toPandas()
    expect = np.column_stack([X, np.ones(len(X))]) @ w
    got = np.sort(out["prediction"].to_numpy())
    assert np.allclose(np.sort(expect), got, atol=1e-9)

    # scan-level inference: no python workers in the plan
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        predict_df(df, loaded).explain("formatted")
    plan = buf.getvalue()
    assert "Eval" not in plan and "Arrow" not in plan  # no UDF nodes

    with pytest.raises(ValueError):
        predict_df(df.drop("f3"), loaded)


def test_vacuum_keeps_latest_pointer(tmp_path):
    for i in range(6):
        save_model(tmp_path, "m", ["x"], [float(i), 0.0])
    removed = vacuum_models(tmp_path, "m", keep_last=2)
    assert removed == [1, 2, 3, 4]
    assert load_model(tmp_path, "m").version == 6
    assert load_model(tmp_path, "m", version=5).version == 5


def test_latest_pointer_is_monotonic(tmp_path):
    """A slow writer finishing AFTER a newer version has published
    must not point _latest backward (ADVICE r6): simulate the race
    outcome by pre-seeding a stale pointer, then publishing — the
    pointer must land on the max committed version, and a save that
    finds a higher version already committed must not regress it."""
    save_model(tmp_path, "m", ["x"], [1.0, 0.0])
    save_model(tmp_path, "m", ["x"], [2.0, 0.0])
    d = tmp_path / "m"
    # stale pointer (as if the v1 writer's replace landed last)
    (d / "_latest").write_text("1")
    # the next save repairs and then advances: pointer == max version
    rec = save_model(tmp_path, "m", ["x"], [3.0, 0.0])
    assert rec.version == 3
    assert int((d / "_latest").read_text()) == 3


def test_vacuum_age_gates_stage_dirs(tmp_path):
    """vacuum_models must not delete a live writer's staging dir
    (young), only crashed-run debris (old)."""
    import os as _os
    import time as _time

    save_model(tmp_path, "m", ["x"], [1.0, 0.0])
    d = tmp_path / "m"
    live = d / ".__stage__live0000"
    dead = d / ".__stage__dead0000"
    live.mkdir()
    dead.mkdir()
    old = _time.time() - 7200
    _os.utime(dead, (old, old))
    vacuum_models(tmp_path, "m", keep_last=5)
    assert live.is_dir(), "live staging dir deleted from under a writer"
    assert not dead.exists(), "stale stage debris survived vacuum"


@pytest.mark.heavy  # 132 s end-to-end train
def test_train_publish_predict_on_fixture_gold(spark, tmp_path):
    """Full reference lifecycle (train.py fit → mlflow_config best-run
    registry → predict.py latest-features inference) on the fixture
    feature table: fit the closed-form ridge, publish with its
    walk-forward MAE, load the BEST run back, and score the most
    recent feature row JVM-side."""
    import pyspark.sql.functions as F

    from bio_lakehouse_spark.bio.fixtures import generate_bronze
    from bio_lakehouse_spark.bio.gold import build_gold
    from bio_lakehouse_spark.bio.silver import run_silver
    from bio_lakehouse_spark.products import numerics

    bio_root = tmp_path / "bio"
    generate_bronze(bio_root / "bronze")
    run_silver(spark, str(bio_root / "bronze"), str(bio_root / "silver"))
    feat = (
        build_gold(spark, f"{bio_root}/silver")["feature_readiness_daily"]
        .filter(F.col("next_day_readiness").isNotNull())
        .orderBy("date")
    )
    names = ["readiness_score", "sleep_score", "tss"]
    pdf = feat.select(*names, "next_day_readiness", "date").toPandas()
    X = pdf[names].to_numpy(dtype=float)
    y = pdf["next_day_readiness"].to_numpy(dtype=float)
    w = numerics.ridge_closed_form(X, y, alpha=1.0)
    cv = numerics.walk_forward_cv(X, y, min_train=60, test_window=14,
                                  model="ridge")
    save_model(tmp_path / "reg", "readiness", names, list(w),
               params={"alpha": 1.0}, metrics={"mae": cv["mae"]})
    # a worse dummy run must NOT win best-by-mae
    save_model(tmp_path / "reg", "readiness", names,
               [0.0] * (len(names) + 1),
               metrics={"mae": cv["mae"] + 100})
    best = best_model(tmp_path / "reg", "readiness", "mae", mode="min")
    assert best.version == 1
    scored = predict_df(
        feat.select("date", *names), best, out_col="predicted_next"
    )
    latest = scored.orderBy(F.desc("date")).limit(1).collect()[0]
    row = pdf.iloc[-1]
    expect = float(
        sum(row[n] * c for n, c in zip(names, best.coefficients[:-1]))
        + best.coefficients[-1]
    )
    assert latest["predicted_next"] == pytest.approx(expect, rel=1e-9)
